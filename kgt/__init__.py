"""kgt — PySpark-native knowledge-graph construction engine.

From-scratch re-expression of ruby-rdf/rdf-turtle's capabilities
(Turtle-grammar-faithful triple extraction, term semantics, serialization)
as a vectorized, partitioned Spark dataflow over transcript tables, plus
the KG-construction operators the north rule requires (entity linking,
canonicalization, skolemization, materialization, lineage).

Layout:
    kgt.turtle   — Spark-free Turtle tokenizer / parser / writer core
                   (batch-in, batch-out; runs inside mapInPandas)
    kgt.spark    — the distributed pipeline (reassembly, parse, link,
                   skolemize, materialize, lineage/metrics)
    kgt.textops  — training-data-pipeline operators (dedup, similarity,
                   quality, multimodal plumbing)
"""

__version__ = "0.1.0"
