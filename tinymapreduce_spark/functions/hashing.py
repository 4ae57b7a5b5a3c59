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


def key2shard(col: Column | str, nshards: int = NSHARDS) -> Column:
    """shard = int(key[0]) % NShards; '' hashes to shard 0 like Go's
    zero-length-string guard (`if len(key) > 0`)."""
    c = F.col(col) if isinstance(col, str) else col
    first = F.when(F.length(c) > 0, F.ascii(F.substring(c, 1, 1))).otherwise(F.lit(0))
    return F.pmod(first, F.lit(nshards))
