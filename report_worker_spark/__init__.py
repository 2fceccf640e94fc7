"""report_worker_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the Bot-detector/report-worker reference (a Kafka →
validate/transform → MySQL star-schema streaming ETL worker), built
Spark-first: DataFrame/SQL declarative plans optimized by Catalyst,
Structured Streaming for the ingest path, and vectorized (Arrow)
Pandas UDFs only where built-ins cannot express the semantics.

Layout
------
- ``session``    : tuned SparkSession builders (local test + cluster notes)
- ``schemas``    : StructType single-source-of-truth (wire, dim, star)
- ``transforms`` : pure DataFrame→DataFrame column transforms (SURVEY §2 P/F)
- ``star``       : dedup + anti-join + surrogate-key relational core (J/A)
- ``sources``    : kafka / jdbc / files / synthetic generator (S)
- ``streaming``  : readStream pipeline + foreachBatch upsert + DLQ (ST)
- ``functions``  : LLM-data-pipeline ops — text analysis, dedup
                   (exact/minhash/simhash/jaccard), similarity search,
                   multimodal column plumbing
- ``plans``      : named query catalog wired into __spark_entry__
"""

__version__ = "0.1.0"
