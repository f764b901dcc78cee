"""docling-core-spark: a PySpark-native document extraction + chunking engine.

A from-scratch re-expression of docling-core's document pipeline
(reference: /root/reference, docling-core v2.45.0) as Spark DataFrame
transforms + vectorized pandas/Arrow UDFs over span arrays:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Core ideas
----------
* Each row is one interleaved text+media document, encoded as a flat
  pre-order span sequence (see ``model/spans.py`` for the kind grammar).
* Per-document tree logic (reconstruction, traversal, serialization,
  chunking) runs inside Arrow-batched pandas UDFs - never row-at-a-time
  Python UDFs.
* Cross-document relational work (dedup, joins, stats) is plain
  DataFrame/SQL so Catalyst can optimize it.

This package contains NO code copied from the reference; semantics were
re-derived from its public behavior (file:line citations in docstrings
point at the behavior being reproduced, for parity review).
"""

__version__ = "0.1.0"
