"""vena_etl_tool_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the pipeline-orchestration surface of
Baretank/vena-etl-tool (reference: /root/reference, surveyed in SURVEY.md) plus
the full relational / streaming / LLM-data-pipeline operator surface mandated
by SURVEY.md §2 Part B.

Architecture: everything is declared through the DataFrame / Spark SQL API so
Catalyst owns physical planning (predicate pushdown, column pruning, join
selection, AQE). Python UDFs appear only where built-ins genuinely cannot
express the semantics, and then always as Arrow-batched pandas UDFs.

Subpackages
-----------
- ``session``    SparkSession factory tuned for local testing and cluster scale
- ``catalog``    typed loaders for the fixture tables (TESTDATA.md)
- ``registry``   the query registry backing ``__spark_entry__.py``
- ``operators``  relational + LLM-pipeline operators (SURVEY.md §2 Part B)
- ``streaming``  Structured Streaming operators (§B.9)
- ``pipeline``   the reference's own orchestration surface (§2 Part A):
                 specs/templates, ingest+quarantine, jobs, audit logs, CLI
"""

__version__ = "0.1.0"
