"""Semantic invariants of the sequence-packing tier
(``operators/packing.py``) beyond the DuckDB hash parity that
``test_oracle_parity.py`` already enforces: next-fit bin discipline,
whole-document conservation, and curriculum batch monotonicity."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tinymapreduce_spark.functions.text import tokens
from tinymapreduce_spark.operators import packing
from tinymapreduce_spark.sources.loaders import load_table


class TestPackNextfitBins:
    def _frames(self, spark, sf_dir):
        bins = packing.pack_nextfit_bins(spark, sf_dir).toPandas()
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", F.size(tokens("text")).alias("t"))
            .toPandas()
        )
        return bins, docs

    def test_conservation_and_capacity(self, spark, sf_dir):
        bins, docs = self._frames(spark, sf_dir)
        # every document lands in exactly one bin, tokens conserved
        assert bins["n_docs"].sum() == len(docs)
        assert bins["bin_tokens"].sum() == docs["t"].sum()
        # a bin only exceeds capacity when it holds a single oversize doc
        over = bins[bins["bin_tokens"] > packing.PACK_CAP]
        assert (over["n_docs"] == 1).all()

    def test_bin_ids_consecutive_per_shard(self, spark, sf_dir):
        bins, _ = self._frames(spark, sf_dir)
        for _, grp in bins.groupby("shard"):
            assert sorted(grp["bin_id"]) == list(range(1, len(grp) + 1))
            # doc_id ranges of consecutive bins never interleave
            g = grp.sort_values("bin_id")
            assert (g["first_doc"] <= g["last_doc"]).all()
            assert (g["last_doc"].shift(1).dropna() < g["first_doc"].iloc[1:]).all()

    def test_nextfit_greedy_no_early_close(self, spark, sf_dir):
        """Next-fit property: a new bin opens only because the first doc
        of that bin did NOT fit in the previous bin's remaining space."""
        bins, docs = self._frames(spark, sf_dir)
        tok = dict(zip(docs["doc_id"], docs["t"]))
        for _, grp in bins.groupby("shard"):
            g = grp.sort_values("bin_id").reset_index(drop=True)
            for i in range(1, len(g)):
                prev_fill = g.loc[i - 1, "bin_tokens"]
                first_next = tok[g.loc[i, "first_doc"]]
                assert prev_fill + first_next > packing.PACK_CAP


class TestStreamPackNextfit:
    def test_stream_equals_batch(self, spark, sf_dir):
        """The sentinel flush closes every real bin, so the appended
        streaming output IS the batch packing — and a second invocation
        (fresh query + checkpoint over the cached feed) reproduces it."""
        from tinymapreduce_spark.streaming.state import stream_pack_nextfit

        batch = packing.pack_nextfit_bins(spark, sf_dir).toPandas()
        s1 = stream_pack_nextfit(spark, sf_dir).toPandas()
        s2 = stream_pack_nextfit(spark, sf_dir).toPandas()
        assert s1.equals(batch)
        assert s2.equals(batch)
        # no sentinel artifacts leak into the output
        assert (s1["first_doc"] < 1 << 40).all()
        assert (s1["last_doc"] < 1 << 40).all()


class _StubState:
    """Minimal GroupState stand-in for driving _pack_apply directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_stream_kernel_sorts_across_chunks():
    """A micro-batch's rows can arrive as several Arrow chunks in
    partition order; the fold must sort across ALL of them, not within
    each — two interleaved chunks must pack like one sorted frame."""
    from tinymapreduce_spark.streaming.state import _pack_apply

    def run(chunks):
        st = _StubState()
        out = list(_pack_apply((3,), iter(chunks), st))
        return (
            pd.concat(out, ignore_index=True) if out else pd.DataFrame()
        ), st._v

    rows = pd.DataFrame(
        {"doc_id": range(10), "t": [200, 60, 200, 60, 200, 60, 200, 60, 200, 60]}
    )
    whole, st1 = run([rows])
    split, st2 = run([rows.iloc[1::2], rows.iloc[0::2]])  # interleaved arrival
    assert whole.equals(split)
    assert st1 == st2


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.integers(min_value=0, max_value=3 * packing.PACK_CAP), max_size=60)
)
def test_pack_shard_matches_model(toks):
    """The Arrow kernel vs an independently-written model: assign each
    doc a bin id first (plain scan), aggregate with pandas groupby —
    same answer for arbitrary token counts incl. zero-length and
    oversize docs."""
    pdf = pd.DataFrame(
        {"shard": 3, "doc_id": range(len(toks)), "t": pd.array(toks, dtype="int64")}
    )
    got = packing._pack_shard(pdf.sample(frac=1, random_state=7))  # order-insensitive

    bin_ids, bin_id, fill = [], 0, None
    for t in toks:
        if fill is None or fill + t > packing.PACK_CAP:
            bin_id, fill = bin_id + 1, t
        else:
            fill += t
        bin_ids.append(bin_id)
    model = pdf.assign(bin_id=pd.array(bin_ids, dtype="int64"))
    expect = (
        model.groupby("bin_id")
        .agg(
            n_docs=("doc_id", "size"),
            bin_tokens=("t", "sum"),
            first_doc=("doc_id", "min"),
            last_doc=("doc_id", "max"),
        )
        .reset_index()
    )
    assert len(got) == len(expect)
    for col in ("n_docs", "bin_tokens", "first_doc", "last_doc"):
        assert list(got[col]) == list(expect[col]), col


class TestLengthCurriculum:
    def test_batch_shape_and_waste(self, spark, sf_dir):
        out = packing.length_curriculum(spark, sf_dir).toPandas()
        assert (out["n_docs"] <= packing.BATCH_SIZE).all()
        assert (out["padding_waste"] >= 0).all()
        assert (
            out["padding_waste"] == out["max_tok"] * out["n_docs"] - out["sum_tok"]
        ).all()
        # only the final batch of a shard may be ragged
        for _, grp in out.groupby("shard"):
            g = grp.sort_values("batch")
            assert (g["n_docs"].iloc[:-1] == packing.BATCH_SIZE).all()

    def test_batches_are_length_sorted(self, spark, sf_dir):
        """Within a shard, batch b's longest doc is never longer than
        batch b+1's shortest — the property padding-aware batching buys."""
        out = packing.length_curriculum(spark, sf_dir).toPandas()
        for _, grp in out.groupby("shard"):
            g = grp.sort_values("batch")
            assert (g["max_tok"].iloc[:-1].values <= g["min_tok"].iloc[1:].values).all()

    def test_curriculum_beats_arrival_order_padding(self, spark, sf_dir):
        """The point of the operator: length-grouped batches waste fewer
        pad tokens than batching in doc_id arrival order."""
        docs = (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                F.pmod("doc_id", F.lit(packing.CURRICULUM_SHARDS)).alias("shard"),
                F.size(tokens("text")).alias("t"),
            )
            .toPandas()
        )
        naive = 0
        for _, grp in docs.groupby("shard"):
            g = grp.sort_values("doc_id").reset_index(drop=True)
            for s in range(0, len(g), packing.BATCH_SIZE):
                b = g.iloc[s : s + packing.BATCH_SIZE]
                naive += int(b["t"].max()) * len(b) - int(b["t"].sum())
        curated = packing.length_curriculum(spark, sf_dir).toPandas()
        assert curated["padding_waste"].sum() < naive
