"""PySpark-native web-scale main-content extraction engine.

From-scratch re-expression of adbertram/powerpoint_context_extractor's
per-document extraction dataflow as an idiomatic Spark pipeline over
Common-Crawl-style page tables (see SURVEY.md). Not a port: the
reference tells us WHAT to compute (deterministic document-order
traversal, block extraction, keyed stream joins, ordered sink); the HOW
here is DataFrame/Catalyst + Arrow-batched pandas UDF kernels.
"""

__version__ = "0.1.0"
