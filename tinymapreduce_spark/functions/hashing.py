"""Key-hashing expressions.

The reference has two key hashes:
- FNV-1a mod R for shuffle bucketing (``/root/reference/src/mr/worker.go:38-42``)
  — NOT reproduced: Spark's HashPartitioning (Murmur3) is
  output-equivalent because no reference test observes partition-file
  layout (outputs are unioned before compare,
  ``/root/reference/src/main/test-mr.sh:93``; SURVEY.md §2.2 D2).
- ``key2shard``: first byte of key mod 10
  (``/root/reference/src/shardkv/client.go:22-29``) — reproduced exactly,
  as a Catalyst expression, because shard routing IS query-visible
  semantics (SURVEY.md §2.4 K5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NSHARDS = 10  # /root/reference/src/shardctrler/common.go:21


def h60(col: Column | str) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as a positive
    bigint. md5 + hex->int conversion behave identically in Spark
    (``conv``) and DuckDB (``('0x'||substr(..))::BIGINT``), so operators
    built on this family are exactly reproducible by the SQL oracle —
    unlike xxhash64, which only Spark implements. 60 bits keep the
    collision probability over 2^40 distinct keys at ~2^-41 per pair
    while avoiding BIGINT sign issues. DuckDB spelling: H60_SQL_TMPL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# .format(expr=<varchar sql expression>) -> the identical DuckDB hash
H60_SQL_TMPL = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def key2shard(col: Column | str, nshards: int = NSHARDS) -> Column:
    """shard = int(key[0]) % NShards; '' hashes to shard 0 like Go's
    zero-length-string guard (`if len(key) > 0`)."""
    c = F.col(col) if isinstance(col, str) else col
    first = F.when(F.length(c) > 0, F.ascii(F.substring(c, 1, 1))).otherwise(F.lit(0))
    return F.pmod(first, F.lit(nshards))
