"""chunker_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of CyberShadow/chunker (content-defined
chunking on a rolling Rabin fingerprint) as a distributed, Spark-first
engine: change-event logs are tailed with Structured Streaming, applied
as exactly-once MERGE upserts into a partitioned lake table, and every
file row carries a chunk manifest whose boundaries and cut fingerprints
match the reference bit-for-bit (golden vectors at
/root/reference/src/chunker/package.d:336-439).

Layout:
  kernel/     byte-exact chunking: Go-rand fixtures, GF(2) polynomial
              algebra, scalar oracle, vectorized numpy kernel
  functions/  Spark column functions and pandas UDFs (manifest, text,
              similarity)
  cdc/        the ingest engine: event schema + generator, lake format,
              merge semantics, streaming pipeline, replay oracle
  ops/        large-scale training-data operators (dedup, ANN,
              multimodal plumbing)
"""

__version__ = "0.1.0"
