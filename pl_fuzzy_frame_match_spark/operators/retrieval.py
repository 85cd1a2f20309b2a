"""Keyword retrieval (Okapi BM25) and reciprocal-rank fusion — the
text half of a hybrid search stack, next to the embedding half in
`operators/similarity`.

A training-data pipeline needs keyword retrieval in several places
the embedding index cannot cover: decontamination lookups ("find
training documents containing these benchmark phrases"), targeted
corpus audits, and the sparse arm of hybrid retrieval. BM25
(Robertson et al., TREC-3) is the standard scoring function; RRF
(Cormack et al., SIGIR 2009) is the standard way to fuse its ranking
with a dense (cosine) ranking without score calibration.

Determinism contract (same rules as the sketch family): scores are
pure arithmetic over (tf, df, N, doc_len, avgdl) — every input an
integer aggregate — and rankings cut on (rounded score, id), so the
top-k boundary can never flip across engines or summation orders.
Scale shape: the term explode filters to the query's terms BEFORE
any shuffle (a handful of rows per matching document), df/avgdl are
one tiny broadcast aggregate, and the final top-k is a TakeOrdered —
no global sort, nothing quadratic.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under Okapi BM25
    (Lucene's non-negative idf form):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        score   = sum_t idf(t) * tf * (k1 + 1)
                          / (tf + k1 * (1 - b + b * dl / avgdl))

    Output: (id_col, bm25, rank) with bm25 rounded to 6 dp and rank
    cut on (rounded score desc, id asc) — deterministic."""
    from ..functions.text import token_count, tokens

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    base = docs.where(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("__toks"),
        token_count(F.col(text_col)).cast("double").alias("__dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        base.select(id_col, "__dl", F.explode("__toks").alias("__t"))
        .where(F.col("__t").isin(list(terms)))
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    df_t = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(df_t), "__t")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                idf
                * F.col("__tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("__tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                    )
                )
            ).alias("__s"),
        )
    )
    from pyspark.sql import Window

    scored = per_term.groupBy(id_col).agg(
        F.round(F.sum("__s"), 6).alias("bm25")
    )
    ranked = scored.orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    # the window runs on the already-cut k rows (TakeOrdered above),
    # so the single-partition sort touches k rows, not the corpus
    return ranked.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str,
    k: int = 10,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists (each ``(id_col, rank)``
    with ranks 1-based): score = sum over lists of 1 / (rrf_k + rank),
    items absent from a list contribute 0. Output: (id_col,
    rrf_score, rank) — top ``k`` on (rounded score desc, id asc)."""
    if not rankings:
        raise ValueError("need at least one ranking")
    parts = None
    for r in rankings:
        contrib = r.select(
            id_col,
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))).alias("__c"),
        )
        parts = contrib if parts is None else parts.unionByName(contrib)
    fused = parts.groupBy(id_col).agg(
        F.round(F.sum("__c"), 6).alias("rrf_score")
    )
    from pyspark.sql import Window

    top = fused.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


def bm25_idf(n: int, df: int) -> float:
    """Reference scalar idf (tests / documentation)."""
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))
