"""Training-data pipeline function library (Spark-first, JVM-side).

Beyond the reference's CDC operator surface, a 100 TB ingest engine
needs the standard large-scale training-data operations: dedup (exact
and fuzzy), similarity search over embeddings, text analysis, and
multimodal column plumbing. Everything here is built from
``pyspark.sql.functions`` (whole-stage codegen) — Python only appears
in Arrow-batched pandas UDFs for the genuinely non-relational kernels.
"""
