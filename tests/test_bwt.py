"""Burrows-Wheeler family: forward/inverse, MTF, RUNA/RUNB zero-run
coding — the block-sorting compression family."""

from __future__ import annotations

import random

import pytest

from tinymapreduce_spark.functions.bwt import (
    bwt_forward,
    bwt_inverse,
    mtf_decode,
    mtf_encode,
    rle0_decode,
    rle0_encode,
)


def test_published_vector():
    """The canonical 'banana' example: last column 'nnbaaa', row 3."""
    assert bwt_forward("banana") == ("nnbaaa", 3)
    assert bwt_inverse("nnbaaa", 3) == "banana"


def test_random_roundtrips_with_full_pipeline():
    rnd = random.Random(11)
    for t in range(120):
        n = rnd.randrange(0, 400)
        alpha = "".join(chr(97 + i) for i in range(rnd.randrange(1, 9)))
        s = "".join(rnd.choice(alpha) for _ in range(n))
        last, p = bwt_forward(s)
        assert sorted(last) == sorted(s)  # a permutation
        assert bwt_inverse(last, p) == s, t
        ab = sorted(set(s))
        codes = mtf_encode(last, ab)
        assert mtf_decode(codes, ab) == last
        assert rle0_decode(rle0_encode(codes)) == codes


def test_periodic_tie_break():
    """Equal rotations (periodic strings) exercise the index
    tie-break; the inverse must still reproduce the input."""
    for s in ["aaaa", "abab" * 25, "xyxyxy", "zz", ""]:
        last, p = bwt_forward(s)
        assert bwt_inverse(last, p) == s


def test_unicode_safe():
    s = "héllo wörld ünïcode 中文 " * 8
    last, p = bwt_forward(s)
    assert bwt_inverse(last, p) == s


def test_locality_concentration():
    """The point of the transform: MTF zeros after BWT vastly exceed
    MTF zeros on raw text (same-context characters cluster)."""
    text = "the quick brown fox jumps over the lazy dog. " * 30
    ab = sorted(set(text))
    z_bwt = mtf_encode(bwt_forward(text)[0], ab).count(0)
    z_raw = mtf_encode(text, ab).count(0)
    assert z_bwt > 2 * max(1, z_raw)


def test_runab_bijective_counting():
    """RUNA/RUNB digits are bijective base 2: run lengths 1..8 map to
    A, B, AA, BA, AB, BB, AAA, BAA (little-endian digits)."""
    for z, digits in [(1, [0]), (2, [1]), (3, [0, 0]), (4, [1, 0]),
                      (5, [0, 1]), (6, [1, 1]), (7, [0, 0, 0]),
                      (8, [1, 0, 0])]:
        got = rle0_encode([0] * z)
        assert got == digits, z
        assert rle0_decode(got) == [0] * z


def test_defects_raise():
    with pytest.raises(ValueError, match="primary"):
        bwt_inverse("ab", 5)
    with pytest.raises(ValueError, match="alphabet"):
        mtf_decode([3], ["a", "b"])


def test_kneser_ney_sql_matches_independent_recompute(duck):
    """The KN oracle SQL (which the driver uses as ground truth) must
    agree with a from-scratch Python recomputation of the interpolated
    KN algebra — counts, continuation/backoff terms and the exact
    rational encoding. An error in either the SQL or the formula
    derivation would diverge here."""
    import collections
    import re

    from tinymapreduce_spark.operators.textstats import KN_LM_SQL, KN_MIN_COUNT

    df = duck.execute(KN_LM_SQL).df()
    texts = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    bg: collections.Counter = collections.Counter()
    for _, t in texts:
        toks = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    ctx_tot: collections.Counter = collections.Counter()
    n1s: collections.Counter = collections.Counter()
    n1p: collections.Counter = collections.Counter()
    for (a, b), c in bg.items():
        ctx_tot[a] += c
        n1s[a] += 1
        n1p[b] += 1
    btot = len(bg)
    want = {
        (a, b): (c, max(4 * c - 3, 0) * btot + 3 * n1s[a] * n1p[b],
                 4 * ctx_tot[a] * btot)
        for (a, b), c in bg.items() if c >= KN_MIN_COUNT
    }
    got = {(r.w1, r.w2): (r.bigram_count, r.p_num, r.p_den)
           for r in df.itertuples()}
    assert got == want

    # probability-mass sanity: for the heaviest context, the seen-
    # successor mass must stay <= 1 (the continuation remainder covers
    # the unseen vocabulary)
    from fractions import Fraction

    a = max(ctx_tot, key=lambda k: ctx_tot[k])
    s = sum(
        (Fraction(max(4 * c - 3, 0) * btot + 3 * n1s[a] * n1p[b],
                  4 * ctx_tot[a] * btot)
         for (x, b), c in bg.items() if x == a),
        Fraction(0),
    )
    assert 0 < s <= 1


def test_kn_trigram_sql_matches_independent_recompute(duck):
    """Two-layer recursive KN: the trigram oracle must reproduce a
    from-scratch recompute that builds the UNGATED bigram layer first
    and discounts the trigram layer into it."""
    import collections
    import re

    from tinymapreduce_spark.operators.textstats import (
        KN_MIN_COUNT, KN_TRIGRAM_SQL)

    df = duck.execute(KN_TRIGRAM_SQL).df()
    texts = duck.execute("SELECT text FROM documents").fetchall()
    bg: collections.Counter = collections.Counter()
    tg: collections.Counter = collections.Counter()
    for (t,) in texts:
        toks = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tg[(a, b, c)] += 1
    ctx2: collections.Counter = collections.Counter()
    n1s2: collections.Counter = collections.Counter()
    n1p2: collections.Counter = collections.Counter()
    for (a, b), c in bg.items():
        ctx2[a] += c
        n1s2[a] += 1
        n1p2[b] += 1
    btot = len(bg)
    p2 = {
        (a, b): (max(4 * c - 3, 0) * btot + 3 * n1s2[a] * n1p2[b],
                 4 * ctx2[a] * btot)
        for (a, b), c in bg.items()
    }
    ctx3: collections.Counter = collections.Counter()
    n1s3: collections.Counter = collections.Counter()
    for (a, b, c), n in tg.items():
        ctx3[(a, b)] += n
        n1s3[(a, b)] += 1
    want = {}
    for (a, b, c), n in tg.items():
        if n >= KN_MIN_COUNT:
            n2, d2 = p2[(b, c)]
            want[(a, b, c)] = (
                n,
                max(4 * n - 3, 0) * d2 + 3 * n1s3[(a, b)] * n2,
                4 * ctx3[(a, b)] * d2,
            )
    got = {(r.w1, r.w2, r.w3): (r.trigram_count, r.p3_num, r.p3_den)
           for r in df.itertuples()}
    assert got == want


def test_corpus_merkle_sql_matches_independent_fold(duck):
    """The 16-level unrolled Merkle oracle must agree with a direct
    Python fold (pairwise md5, unpaired promoted unchanged), and the
    extra levels past the root must be no-ops."""
    import hashlib
    import math

    from tinymapreduce_spark.operators.curation import CORPUS_MERKLE_SQL

    df = duck.execute(CORPUS_MERKLE_SQL).df()
    rows = duck.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    level = [
        hashlib.md5(
            f"{d}:{hashlib.md5(t.encode()).hexdigest()}".encode()
        ).hexdigest()
        for d, t in rows
    ]
    h = 0
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level), 2):
            if i + 1 < len(level):
                nxt.append(hashlib.md5(
                    (level[i] + level[i + 1]).encode()).hexdigest())
            else:
                nxt.append(level[i])
        level = nxt
        h += 1
    assert df.iloc[0]["root_md5"] == level[0]
    assert int(df.iloc[0]["n_leaves"]) == len(rows)
    assert int(df.iloc[0]["height"]) == h == math.ceil(math.log2(len(rows)))


def test_pca_power_converges_to_top_eigenvector(duck):
    """The integer power iteration's SQL oracle must (a) match a
    from-scratch Python recompute exactly and (b) align with the float
    eigensolver's top eigenvector (cosine > 0.999) — convergence, not
    just determinism."""
    import math

    import numpy as np

    from tinymapreduce_spark.operators.similarity import (
        EMBEDDING_PCA_SQL, PCA_ITERS, PCA_SCALE, PCA_SDIV_BITS,
        PCA_VDIV_BITS, _tdiv)

    duck.execute(
        "CREATE VIEW IF NOT EXISTS embeddings_v AS SELECT * FROM embeddings"
    )
    df = duck.execute(EMBEDDING_PCA_SQL).df().sort_values("dim")
    rows = duck.execute("SELECT embedding FROM embeddings").fetchall()
    qa = np.array(
        [[math.floor(x * PCA_SCALE) for x in e] for (e,) in rows],
        dtype=np.int64,
    )
    n, d = qa.shape
    si = qa.sum(axis=0)
    sxy = qa.T @ qa
    S = [[int(n) * int(sxy[i][j]) - int(si[i]) * int(si[j])
          for j in range(d)] for i in range(d)]
    smax = max(abs(v) for row in S for v in row)
    sdiv = max(1, smax >> PCA_SDIV_BITS)
    Sp = [[_tdiv(v, sdiv) for v in row] for row in S]
    v = [1] * d
    for _ in range(PCA_ITERS):
        u = [sum(Sp[i][j] * v[j] for j in range(d)) for i in range(d)]
        udiv = max(1, max(abs(x) for x in u) >> PCA_VDIV_BITS)
        v = [_tdiv(x, udiv) for x in u]
    assert dict(zip(df["dim"], df["component"])) == {
        i: v[i] for i in range(d)
    }
    X = qa.astype(float)
    Xc = X - X.mean(axis=0)
    top = np.linalg.eigh(Xc.T @ Xc)[1][:, -1]
    vv = np.array(v, dtype=float)
    cos = abs(top @ vv) / (np.linalg.norm(top) * np.linalg.norm(vv))
    assert cos > 0.999


def test_random_projection_sql_matches_independent_recompute(duck):
    """The JL projection's md5-derived sign matrix and integer matmul,
    recomputed from scratch; plus the JL property itself — projected
    pairwise distances stay within a generous distortion band."""
    import hashlib
    import math

    import numpy as np

    from tinymapreduce_spark.operators.similarity import (
        EMBEDDING_RP_SQL, PCA_SCALE, RP_OUT_DIMS)

    df = duck.execute(EMBEDDING_RP_SQL).df()
    rows = duck.execute("SELECT vec_id, embedding FROM embeddings").fetchall()

    def sign(i, k):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        return 1 if (int(hx[k // 4], 16) >> (k % 4)) & 1 else -1

    want = {}
    for vid, e in rows:
        q = [math.floor(x * PCA_SCALE) for x in e]
        for k in range(RP_OUT_DIMS):
            want[(vid, k)] = sum(q[i] * sign(i, k) for i in range(64))
    got = {(r.vec_id, r.k): r.coord for r in df.itertuples()}
    assert got == want

    Q = np.array([[math.floor(x * PCA_SCALE) for x in e]
                  for _, e in rows], dtype=float)
    R = np.array([[sign(i, k) for k in range(RP_OUT_DIMS)]
                  for i in range(64)], dtype=float)
    P = Q @ R / math.sqrt(RP_OUT_DIMS)
    rng_pairs = [(0, 1), (2, 9), (10, 40), (5, 77), (33, 99)]
    for a, b in rng_pairs:
        d0 = np.linalg.norm(Q[a] - Q[b])
        d1 = np.linalg.norm(P[a] - P[b])
        assert 0.5 < d1 / d0 < 1.6, (a, b, d1 / d0)
