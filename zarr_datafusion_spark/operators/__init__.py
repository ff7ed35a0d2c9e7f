"""Operator modules.

* ``relational`` — the Tier B SQL surface the reference exercises via
  DataFusion (SURVEY.md §2), expressed Spark-first.
* ``dedup`` / ``similarity`` / ``textstats`` / ``multimodal`` —
  beyond-reference large-scale training-data-pipeline operators.

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, duckdb_sql]`` consumed by ``__spark_entry__.py``.
"""
