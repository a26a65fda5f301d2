"""nova_pulsar_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the query and data-processing
capabilities of the reference system (``AWLSEN/nova-pulsar``, a
file-based plan-queue orchestrator — see SURVEY.md) as idiomatic
Spark:

- a batch relational surface (DataFrame/SQL, Catalyst-optimized),
  every operator oracle-checked against DuckDB;
- a queue/plan domain (schemas, priority scheduler, lifecycle state
  machine, pulse rollup) modeled on the reference's semantics
  (SURVEY.md §1-§3);
- a Structured Streaming pub/sub layer (file-source topics,
  stateful lifecycle, watermarked windows);
- LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale.

All public query entry points are registered in
:mod:`nova_pulsar_spark.registry` and surfaced through the driver
contract ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
