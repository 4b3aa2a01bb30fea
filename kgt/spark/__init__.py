"""Distributed pipeline: reassembly → parse → link → materialize."""
