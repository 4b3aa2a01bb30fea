"""Structured Streaming front-end for the extraction pipeline."""
