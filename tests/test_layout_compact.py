"""Compaction must reduce file counts to the byte-target and preserve
content exactly (row count + content hash)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from tinymapreduce_spark.plans import layout


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir):
    out = layout.compact_small_files(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir))
    frag = os.path.join(layout.SCRATCH, f"docs_fragmented_{tag}")
    comp = os.path.join(layout.SCRATCH, f"docs_compacted_{tag}")
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_comp = len([f for f in os.listdir(comp) if f.endswith(".parquet")])
    assert n_frag == 64
    assert n_comp < n_frag  # at testdata scale: 1-2 files

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compacted = spark.read.parquet(comp)
    def digest(df):
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("doc_id", "text")).alias("h"),
        ).collect()[0]
    b, c = digest(base), digest(compacted)
    assert (b["n"], b["h"]) == (c["n"], c["h"])
    assert out.count() > 0
