"""tinymapreduce_spark — a brand-new PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
(lvl200beginner/TinyMapreduce, a Go MapReduce/Raft/KV lab solution — see
SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, plus the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB corpus pipeline needs.

Design stance (SURVEY.md §7.0):
- DataFrame/SQL first; Catalyst owns optimization; Tungsten owns execution.
- No consensus / RPC / scheduler code — Spark's driver + shuffle + task
  retry + commit protocol replace the reference's coordinator/Raft machinery
  (SURVEY.md §3.1, §4.2).
- Every operator is a composable function ``(SparkSession, sf_dir) -> DataFrame``
  registered in ``__spark_entry__.py::queries()`` with a DuckDB oracle.
- UDFs only where built-ins can't express the semantics, and then always
  Arrow-batched (pandas) — never row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"
