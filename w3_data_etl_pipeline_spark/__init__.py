"""PySpark-native CDC / incremental-ingest analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference ETL pipeline (SandSide/w3-data-etl-pipeline): W3C log
ingestion, vectorized enrichment, star-schema dimension/fact builds,
plus the generalization mandated by the north rule — a change-data-
capture engine (change stream -> per-microbatch max-LSN dedup ->
MERGE into a snapshot-versioned lake table with additive schema
evolution, exactly-once commits, checkpoint resume, and per-partition
lineage/metrics) and the large-scale training-data operators
(dedup families, similarity search, text analysis).

Everything here is DataFrame/Catalyst-first; Python only ever runs as
Arrow-vectorized pandas UDFs, never per-row.
"""

__version__ = "0.1.0"
