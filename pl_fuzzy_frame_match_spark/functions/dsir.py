"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023) over hashed n-gram features.

The data-selection stage of a pretraining pipeline: given a RAW pool
and a (much smaller) TARGET corpus that exemplifies the desired
distribution, estimate per-document importance weights
``log p_target(x) - log p_raw(x)`` under a bag-of-hashed-n-grams
model, then select documents by Gumbel top-k — a single pass that
provably samples from the importance-weighted distribution (the
Gumbel-max trick).

Spark-first shape, engine-portable math:

- features: word unigrams + bigrams WITH multiplicity
  (:func:`..functions.text.word_ngrams_all` — bag counts are the
  model), hashed into ``buckets`` slots via the md5-u32 idiom the
  sampling family already uses (``functions/sampling.py:shard_of``),
  so DuckDB replays every hash exactly;
- fit: two gram-count aggregations (one shuffle each, map-side
  partial) + two scalar totals; the model is a ``buckets``-row frame
  (add-one smoothing over the full bucket universe) — BROADCAST
  everywhere it is used, never shuffled;
- weights: explode grams -> broadcast-join the model -> one
  ``groupBy(doc)`` sum. The only full shuffle is keyed on the
  document id — the same cardinality as the input;
- selection: ``log_w + Gumbel(md5-u32(doc_id))`` and a TakeOrdered
  top-k (per-partition heads, no global sort). Deterministic: the
  Gumbel draw is pure integer-hash arithmetic, so runs, engines, and
  partitionings agree on the selected set.

At 100 TB: fitting touches each corpus once (the target corpus is
small by definition); scoring is map-only per doc plus the one
doc-keyed shuffle; the model never exceeds ``buckets`` rows. No
driver-side iteration anywhere.

The reference (a fuzzy string matcher) has no data-selection surface;
this extends the training-data family (`functions/sampling.py`).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_ngrams_all

# DSIR's published setup hashes into 10k buckets; 4096 keeps the
# broadcast model tiny while leaving collisions rare at test scale.
DSIR_BUCKETS = 4096


def _md5_u32(col: Column) -> Column:
    """First 32 bits of md5 as a bigint — the engine-portable uniform
    hash shared with the sampling family."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def gram_bucket(gram: Column, buckets: int = DSIR_BUCKETS) -> Column:
    """Hashed-n-gram feature slot of one gram string."""
    return (_md5_u32(gram) % F.lit(buckets)).cast("int")


def _doc_buckets(
    df: DataFrame, text_col: str, id_col: str | None, buckets: int
) -> DataFrame:
    """(id?, bucket) — one row per gram occurrence (unigrams +
    bigrams, multiplicity kept). Empty/whitespace-only docs emit no
    rows, matching the SQL oracle's unnest."""
    from ..operators.dedup import _fanout

    grams = F.concat(
        word_ngrams_all(F.col(text_col), 1),
        word_ngrams_all(F.col(text_col), 2),
    )
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(grams).alias("g")
    ]
    # fan out the (single-file, 1-partition at bench scale) docs scan
    # before the gram explode + per-gram md5 — otherwise the whole
    # tokenize/hash pass runs as ONE task fused into the scan stage
    # (measured 1.27 s serial inside docs_dsir_select); no-op at real
    # scale (guide §2.5, same class as the span-family fanout)
    out = _fanout(df.select(*(([id_col] if id_col else []) + [text_col]))).select(*cols)
    keep = ([id_col] if id_col else []) + [
        gram_bucket(F.col("g"), buckets).alias("bucket")
    ]
    return out.select(*keep)


def dsir_bucket_model(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Fit the hashed-n-gram importance model: one row per bucket in
    ``[0, buckets)`` with ``log_ratio = ln p_target(b) - ln p_raw(b)``
    under add-one smoothing — so buckets unseen in either corpus get
    a finite, engine-reproducible ratio. Two corpus passes total."""
    spark = raw.sparkSession
    # eager checkpoints: the totals collect below and the model
    # output both read these (<= buckets)-row frames; without the
    # materialization each reference re-runs its corpus pass
    rc = (
        _doc_buckets(raw, text_col, None, buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("rcnt"))
        .localCheckpoint(eager=True)
    )
    tc = (
        _doc_buckets(target, text_col, None, buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tcnt"))
        .localCheckpoint(eager=True)
    )
    # scalar totals as literals: the model must not carry a lineage
    # dependency on two more aggregations every time it is joined
    rtot = rc.agg(F.sum("rcnt")).collect()[0][0] or 0
    ttot = tc.agg(F.sum("tcnt")).collect()[0][0] or 0
    universe = spark.range(buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    return (
        universe.join(rc, "bucket", "left")
        .join(tc, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("tcnt"), F.lit(0)) + F.lit(1.0))
                    / F.lit(float(ttot + buckets))
                )
                - F.log(
                    (F.coalesce(F.col("rcnt"), F.lit(0)) + F.lit(1.0))
                    / F.lit(float(rtot + buckets))
                )
            ).alias("log_ratio"),
        )
    )


def dsir_bucket_model_flagged(
    df: DataFrame,
    target_flag: Column,
    text_col: str,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Single-pass fit for the common case where the target corpus is
    a SUBSET of the raw pool selected by a predicate (e.g.
    ``lang == 'en'``): one gram explode with the flag carried along,
    one bucket-keyed aggregation computing raw and target counts
    together — half the corpus passes of :func:`dsir_bucket_model`,
    identical model (equivalence-tested)."""
    from ..operators.dedup import _fanout

    spark = df.sparkSession
    flagged = _fanout(
        df.select(
            target_flag.cast("boolean").alias("__t"), F.col(text_col)
        )
    )
    grams = F.concat(
        word_ngrams_all(F.col(text_col), 1),
        word_ngrams_all(F.col(text_col), 2),
    )
    # fanout above: the gram explode + md5 otherwise fuses into the
    # 1-partition scan stage and runs serial (guide §2.5)
    gb = flagged.select(
        "__t", F.explode(grams).alias("g")
    ).select("__t", gram_bucket(F.col("g"), buckets).alias("bucket"))
    # checkpoint the (<= buckets)-row count frame BEFORE the totals
    # collect: both the totals and the model output read it, and
    # without the materialization each would re-run the corpus pass
    counts = gb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rcnt"),
        F.count_if(F.col("__t")).alias("tcnt"),
    ).localCheckpoint(eager=True)
    totals = counts.agg(F.sum("rcnt"), F.sum("tcnt")).collect()[0]
    rtot = totals[0] or 0
    ttot = totals[1] or 0
    universe = spark.range(buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    return (
        universe.join(counts, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("tcnt"), F.lit(0)) + F.lit(1.0))
                    / F.lit(float(ttot + buckets))
                )
                - F.log(
                    (F.coalesce(F.col("rcnt"), F.lit(0)) + F.lit(1.0))
                    / F.lit(float(rtot + buckets))
                )
            ).alias("log_ratio"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, dsir_logw): per-document log importance weight — the sum
    of its grams' bucket log-ratios. Docs with no grams (null or
    whitespace-only text) emit no row. One doc-keyed shuffle; the
    model side is broadcast."""
    gb = _doc_buckets(df, text_col, id_col, buckets)
    return (
        gb.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.sum("log_ratio").alias("dsir_logw"))
    )


# Java regex \S is ASCII ([^ \t\n\x0b\f\r]); Python str.split() would
# also split on Unicode whitespace and diverge from tokens() on e.g.
# non-breaking spaces
_TOKEN_RE = re.compile(r"[^ \t\n\x0b\f\r]+")


def dsir_score_udf(model, buckets: int = DSIR_BUCKETS):
    """Arrow-batched per-row scorer over a FROZEN model — the
    streaming/serving shape (`streaming/stream_ops.stream_dsir_score`).
    One document's weight depends only on its own grams, so no
    explode/join/groupBy is needed: the (<= buckets)-row model rides
    in the UDF closure as a dict, Python md5 reproduces the
    engine-portable md5-u32 bucket hash exactly (Spark md5 hashes
    UTF-8 bytes), and a per-batch gram cache amortizes hashing across
    repeated grams. Returns null for gram-less docs (the batch path
    emits no row — callers filter)."""
    from pyspark.sql.functions import pandas_udf

    if isinstance(model, DataFrame):
        lookup = {r["bucket"]: r["log_ratio"] for r in model.collect()}
    else:
        lookup = dict(model)

    def _bucket(g: str) -> int:
        return (
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
            % buckets
        )

    @pandas_udf("double")
    def score(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def look(g):
            v = cache.get(g)
            if v is None:
                v = lookup.get(_bucket(g), 0.0)
                cache[g] = v
            return v

        def run(t):
            if t is None:
                return None
            words = _TOKEN_RE.findall(str(t).lower())
            if not words:
                return None
            total = 0.0
            for g in words:
                total += look(g)
            for a, b in zip(words, words[1:]):
                total += look(a + " " + b)
            return total

        return texts.map(run)

    return score


def dsir_gumbel_key(id_col: Column, logw: Column) -> Column:
    """Gumbel-max selection key: ``logw - ln(-ln(u))`` with
    ``u = (md5_u32(id) + 0.5) / 2^32`` — a deterministic uniform draw
    per id, identical across engines (the Gumbel-top-k trick samples
    k docs proportionally to exp(logw) without replacement)."""
    u = (_md5_u32(id_col.cast("string")) + F.lit(0.5)) / F.lit(
        4294967296.0
    )
    return logw - F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Gumbel top-k importance resampling: (id, dsir_logw, sel_key)
    for the k selected documents. TakeOrdered top-k — no global
    sort."""
    w = dsir_log_weights(df, model, text_col, id_col, buckets)
    keyed = w.select(
        id_col,
        "dsir_logw",
        dsir_gumbel_key(F.col(id_col), F.col("dsir_logw")).alias(
            "sel_key"
        ),
    )
    return keyed.orderBy(
        F.desc("sel_key"), F.asc(id_col)
    ).limit(k)
