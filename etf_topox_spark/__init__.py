"""etf_topox_spark — a from-scratch PySpark-native spatial-join + tiling +
topology-validation engine with the query/data-processing capabilities of
``interactive-instruments/etf-topox`` (see SURVEY.md), re-architected for
Spark's distributed execution model.

The reference is a single-JVM BaseX/XQuery extension building an in-memory
half-edge topology store (SURVEY.md §1.1, §3.1); this engine expresses the
same semantics as DataFrame plans + vectorized Arrow kernels partitioned by
spatial cell, per the north rule in BASELINE.json:14.

Package map
-----------
- ``session``      SparkSession factory tuned for the local[32] sandbox
- ``registry``     query/oracle registry backing ``__spark_entry__.py``
- ``sources``      parquet/synthetic sources (images, surface mosaics)
- ``functions``    cell index (Morton/Hilbert), coord hashing, image codecs
- ``operators``    relational sweep, spatial joins, topology validation,
                   dedup/similarity/text analysis
- ``streaming``    structured-streaming surface (watermarks, sessions, state)
- ``plans``        lineage / checkpoint-resume helpers
"""

__version__ = "0.1.0"
