"""Golden-corpus parity against the reference's own committed output.

The reference ships its real input corpus (``/root/reference/src/main/
pg-*.txt``, 8 Project Gutenberg books, 3.3 MB) and the word-count output
its engine produced and verified (``src/main/mymrout``, 22,107 lines —
``src/main/test-mr.sh:93-103`` diffs ``sort mr-out* | grep .`` against the
course's correct output, and ``mymrout``/``mymroutcc`` are byte-identical,
so the committed file IS the verified golden).

These tests run the SAME computation on the SAME files through both the
declarative word_count plan and the generic MR shim, then byte-compare
against the golden after the same sort — proving tokenizer parity between
Go's ``unicode.IsLetter`` split (``src/mrapps/wc.go:23``) and this repo's
``[^A-Za-z]+`` regex on the real corpus (the corpus is pure ASCII, where
the two are equivalent; test_corpus_is_ascii pins that precondition).
"""

from __future__ import annotations

import glob

import pytest

from tinymapreduce_spark.operators.mapreduce import run_mapreduce, wc_map, wc_reduce
from tinymapreduce_spark.operators.reference_queries import (
    inverted_index_df,
    word_count_df,
)
from tinymapreduce_spark.sources.textfiles import read_whole_text_files

REF_MAIN = "/root/reference/src/main"
PG_GLOB = f"{REF_MAIN}/pg-*.txt"
GOLDEN = f"{REF_MAIN}/mymrout"


def golden_lines() -> list[str]:
    with open(GOLDEN, encoding="utf-8") as f:
        # test-mr.sh pipes through `grep .` — drop empty lines.
        return [ln for ln in f.read().splitlines() if ln]


@pytest.fixture(scope="module")
def corpus(spark):
    return read_whole_text_files(spark, PG_GLOB).cache()


def test_corpus_is_ascii():
    """Precondition for [^A-Za-z]+ ≡ unicode.IsLetter: the golden corpus
    contains no non-ASCII characters (so there are no non-ASCII letters
    for Go to keep that the regex would split on)."""
    for path in sorted(glob.glob(PG_GLOB)):
        data = open(path, "rb").read()
        assert max(data) < 0x80, f"non-ASCII byte in {path}"


def test_word_count_matches_reference_golden(corpus):
    """Declarative Q1 over the real pg-*.txt == committed mymrout,
    byte-for-byte after the reference's own sort protocol
    (``test-mr.sh:93``: C-locale line sort)."""
    rows = word_count_df(corpus).collect()
    mine = sorted(f"{r['word']} {r['cnt']}" for r in rows)
    assert mine == golden_lines()


def test_mr_shim_matches_reference_golden(corpus):
    """The generic (mapf, reducef) shim running the reference wc app
    verbatim over the real corpus == committed mymrout. Covers the whole
    D1-D5 path (mapInPandas → shuffle → grouped applyInPandas)."""
    rows = run_mapreduce(corpus, wc_map, wc_reduce).collect()
    mine = sorted(f"{r['key']} {r['value']}" for r in rows)
    assert mine == golden_lines()


def test_indexer_matches_sequential_oracle(corpus):
    """Inverted index (``src/mrapps/indexer.go:20-39``) over the real
    files vs a freshly computed sequential oracle (mrsequential.go's
    one-process semantics re-done in pure Python)."""
    import re

    per_word_docs: dict[str, set[str]] = {}
    for path in sorted(glob.glob(PG_GLOB)):
        name = path.rsplit("/", 1)[-1]
        words = {w for w in re.split(r"[^A-Za-z]+", open(path, encoding="utf-8").read()) if w}
        for w in words:
            per_word_docs.setdefault(w, set()).add(name)
    expected = {
        w: (len(docs), ",".join(sorted(docs))) for w, docs in per_word_docs.items()
    }

    rows = inverted_index_df(corpus).collect()
    actual = {r["word"]: (r["n_docs"], r["doc_list"]) for r in rows}
    assert actual == expected


def test_crash_app_matches_sequential_oracle(corpus):
    """The crash/nocrash app (``src/mrapps/nocrash.go:26-47``: per file
    emit (a, filename), (b, len(filename)), (c, len(contents)),
    (d, "xyzzy"); reduce = sort + space-join) through the generic MR
    shim over the real pg-*.txt == the sequential one-process oracle
    computed in pure Python. This is the app the reference's crash test
    uses as its golden (``test-mr.sh:275-322``); Spark's task retry
    plays the crash-tolerance role (tests/test_partitioning.py)."""

    def crash_map(filename: str, contents: str):
        return [
            ("a", filename),
            ("b", str(len(filename))),
            ("c", str(len(contents))),
            ("d", "xyzzy"),
        ]

    def crash_reduce(key: str, values: list[str]) -> str:
        return " ".join(sorted(values))

    rows = run_mapreduce(corpus, crash_map, crash_reduce).collect()
    mine = {r["key"]: r["value"] for r in rows}

    oracle: dict[str, list[str]] = {"a": [], "b": [], "c": [], "d": []}
    for r in corpus.collect():
        oracle["a"].append(r["filename"])
        oracle["b"].append(str(len(r["filename"])))
        oracle["c"].append(str(len(r["contents"])))
        oracle["d"].append("xyzzy")
    want = {k: " ".join(sorted(v)) for k, v in oracle.items()}
    assert mine == want
