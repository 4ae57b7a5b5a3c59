"""Full-text retrieval scoring over the ``documents`` corpus — BM25
top-k, the IR-side sibling of the similarity/ANN tier (north-star
surface; the reference's closest analog is the inverted-index MR app,
``/root/reference/src/mrapps/indexer.go``, which builds the index this
operator would query).

Scale shape: the corpus-side statistics (tf, df, doclen) are one
tokenize + two narrow groupBys — the same partial+final aggregation
shape as word count; the query side is a literal handful of terms that
BROADCASTS to the tf relation, so scoring touches only the posting rows
of the query terms (|docs matching| rows, never the corpus). Top-k per
query is a window rank over the scored postings — at 100 TB you'd feed
this from a materialized (term, doc, tf) posting table, which is
exactly the ``tf`` relation here.

Determinism (cross-engine exactness): every BM25 component is kept as
exact integers for as long as possible — k1 = 6/5 and b = 3/4 are
rational, so the per-term fraction reduces to
``22*tf*L / (10*L*tf + 3*L + 9*dl*N)`` over exact counts (L = total
corpus tokens, N = docs, dl = doc length). The only floats are: one
``ln`` for idf (rounded to 9 dp immediately — both engines' libm agree
far beyond that), one division of exact integers, one multiply, and a
left-fold sum in sorted-term order (``F.aggregate`` / DuckDB
``list_reduce`` over ``list(... ORDER BY term)`` — identical fold
order, identical IEEE result). BM25_SQL replays all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tinymapreduce_spark.functions.text import tokens
from tinymapreduce_spark.sources.loaders import documents_for_cpu

# (query_id, terms) — vocabulary drawn from the synthetic corpus
BM25_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["hash", "join"]),
    (2, ["window", "agg", "stream"]),
    (3, ["slow", "scan", "filter"]),
]
BM25_TOPK = 10
# k1 = _K1_NUM/_K1_DEN = 1.2, b = 3/4 — kept rational so the score
# denominator stays integer (see module docstring)
_K1_NUM, _K1_DEN = 6, 5


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BM25_TOPK`` documents per query under BM25 (Robertson/
    Sparck Jones; Lucene's +1-inside-the-log idf variant, which stays
    positive even for terms in over half the corpus — this synthetic
    vocabulary is small, so every term is that common).

    Output: (query_id, doc_id, score) — score rounded to 6 dp, ranking
    done on (rounded score desc, doc_id asc) so the k-cut is exact in
    both engines.
    """
    docs = documents_for_cpu(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    # ONE corpus pass: per-doc length AND the tf of every query term (a
    # handful of literal conditional sums) come out of a single groupBy —
    # the plan tokenizes the corpus exactly once, and everything after
    # runs on n_docs-sized rows.
    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(all_terms)
        ],
    ).localCheckpoint(eager=True)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )

    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id int, term string",
    )
    tf = (
        per_doc.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"), F.col(f"tf_{i}").alias("tf")
                        )
                        for i, t in enumerate(all_terms)
                    ]
                )
            ).alias("e"),
        )
        .select("doc_id", "e.term", "e.tf")
        .where(F.col("tf") > 0)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = per_doc.select("doc_id", "dl")

    # idf = ln(1 + (N - df + 1/2)/(df + 1/2)) = ln(1 + (2N-2df+1)/(2df+1)),
    # rounded at once — the only transcendental in the whole score
    idf = (
        df_t.crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (2 * F.col("n_docs") - 2 * F.col("df") + 1)
                    / (2 * F.col("df") + 1)
                ),
                9,
            ).alias("idf"),
        )
    )

    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "term",
            (
                F.col("idf")
                * (
                    (22 * F.col("tf") * F.col("total_len"))
                    / (
                        10 * F.col("total_len") * F.col("tf")
                        + 3 * F.col("total_len")
                        + 9 * F.col("dl") * F.col("n_docs")
                    )
                )
            ).alias("s"),
        )
    )
    per_doc = (
        scored.groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "s"))).alias("ts"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.aggregate("ts", F.lit(0.0), lambda acc, x: acc + x["s"]), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BM25_TOPK)
        .select("query_id", "doc_id", "score")
    )


def _bm25_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
    )
    return f"""
WITH qterms(query_id, term) AS (VALUES {qvals}),
tok AS MATERIALIZED (
  SELECT doc_id, UNNEST(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')) AS term
  FROM documents
), dl AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS MATERIALIZED (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl
), tf AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
), df_t AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term,
         ROUND(ln(1.0 + CAST(2 * s.n_docs - 2 * df + 1 AS DOUBLE) / (2 * df + 1)), 9) AS idf
  FROM df_t CROSS JOIN stats s
), scored AS (
  SELECT q.query_id, tf.doc_id, tf.term,
         idf.idf * ((22 * tf.tf * s.total_len)
                    / CAST(10 * s.total_len * tf.tf + 3 * s.total_len
                           + 9 * dl.dl * s.n_docs AS DOUBLE)) AS s
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN idf ON q.term = idf.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
), per_doc AS (
  SELECT query_id, doc_id,
         ROUND(list_reduce(list_prepend(0.0, list(s ORDER BY term)), (a, b) -> a + b), 6) AS score
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, score
FROM (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
  FROM per_doc
)
WHERE rk <= {BM25_TOPK}
"""


BM25_SQL = _bm25_sql()
