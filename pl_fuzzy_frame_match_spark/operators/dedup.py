"""Deduplication operators for 100 TB-scale document corpora.

Five strategies, cheapest first:

- **exact**: md5-groupBy. One shuffle on the 32-char digest (never on
  the document body — at scale the shuffle payload matters).
- **ngram-Jaccard**: exact word-n-gram Jaccard over candidate pairs.
- **MinHash + LSH**: shingle -> pure-SQL MinHash banding join;
  the scale path for all-pairs near-dup (candidates ~ linear, not
  quadratic).
- **SimHash**: 64-bit fingerprint; banding on 16-bit chunks turns
  hamming-<=k search into 4 equi-joins + a popcount filter
  (``bit_count(a ^ b)``) — all JVM-side after the fingerprint UDF.
- **embedding cosine**: near-dup by semantic similarity.

Each returns a DataFrame of duplicate pairs (or groups) — composable
with an anti-join to produce the deduplicated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    jaccard_similarity,
    md5_fingerprint,
    simhash64,
    word_shingles,
)

# broadcast the per-doc shingle frame into the verification join while
# it fits an executor (~1M docs x ~50 8-byte hashed shingles = ~400 MB
# upper bound; typical corpora are far under). Past that the join
# shuffles on the candidate ids — still linear.
BROADCAST_DOC_LIMIT = 1_000_000


def _fanout(df: DataFrame) -> DataFrame:
    """Ensure at least 2x defaultParallelism partitions before a
    compute-heavy projection (shingling, simhash). Two problems on
    small/single-file scans, both measured at bench scale:

    1. The scan itself arrives in 1 partition (file < 128 MB), so a
       fused ``scan -> project`` stage runs the heavy expressions on
       one core.
    2. ``repartition(n).select(heavy)`` does NOT fix it: Catalyst
       collapses the projection BELOW the round-robin exchange, so the
       heavy expressions still evaluate in the single-partition scan
       stage (measured 1.0-2.9 s vs 0.15 s for 5K docs). The eager
       localCheckpoint here is a PLAN BARRIER that pins the exchange
       output before any downstream projection can sink through it.

    At real scale the scan already has >= 2x cores partitions and this
    is a no-op — no shuffle, no checkpoint, no cost."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism * 2
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n).localCheckpoint(eager=True)


def _hashed_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, sorted array<long> of hashed word-n-gram shingles). Exact
    Jaccard over the hashed sets equals Jaccard over the string sets
    (64-bit collisions are ~2^-64 per vocabulary pair — negligible),
    and long-array intersection beats string-array intersection by the
    string-compare cost."""
    return df.select(
        F.col(id_col),
        F.array_sort(
            F.transform(
                word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
            )
        ).alias("__shh"),
    ).filter(F.size("__shh") > 0)


def _verify_exact_jaccard(
    cand: DataFrame,
    hashed: DataFrame,
    id_col: str,
    n_docs: int,
    sim_col: str,
) -> DataFrame:
    """Attach hashed shingle sets to candidate (left_id, right_id) rows
    and compute exact Jaccard similarity as ``sim_col``. Broadcasts the
    doc frame when it fits (the candidate side is the big one)."""
    lsh = hashed.select(
        F.col(id_col).alias("left_id"), F.col("__shh").alias("__lsh")
    )
    rsh = hashed.select(
        F.col(id_col).alias("right_id"), F.col("__shh").alias("__rsh")
    )
    if 0 < n_docs <= BROADCAST_DOC_LIMIT:
        lsh, rsh = F.broadcast(lsh), F.broadcast(rsh)
        # with both sides broadcast the verify is map-only over cand —
        # but AQE coalesces the candidate join output to a handful of
        # partitions (measured 1 at bench scale), serializing the
        # per-pair array_intersect. Candidates are 2-long rows, so the
        # redistribution is far cheaper than the compute it unlocks
        # (0.96 s -> 0.31 s on 106K pairs).
        cand = cand.repartition(
            cand.sparkSession.sparkContext.defaultParallelism
        )
    inter = F.size(F.array_intersect(F.col("__lsh"), F.col("__rsh")))
    union = F.size("__lsh") + F.size("__rsh") - inter
    return (
        cand.join(lsh, on="left_id", how="inner")
        .join(rsh, on="right_id", how="inner")
        .select(
            "left_id",
            "right_id",
            (inter.cast("double") / union).alias(sim_col),
        )
    )


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct content fingerprint: representative id
    (min), copy count. Shuffles 16-byte digests, not documents."""
    return (
        df.select(F.col(id_col), md5_fingerprint(F.col(text_col)).alias("__fp"))
        .groupBy("__fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, F.col("__fp").alias("fingerprint"), "n_copies")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deduplicated corpus: keep the min-id row per distinct content.
    Window-free formulation (join back on (fingerprint, min_id)) so the
    heavy side never sorts."""
    keep = exact_dedup_groups(df, text_col, id_col).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n: int = 2,
) -> DataFrame:
    """All-pairs exact word-n-gram Jaccard >= threshold (i < j).

    This is the EXACT (quadratic) formulation — the correctness oracle
    for the MinHash path. At 100 TB you run :func:`minhash_dedup_pairs`
    instead; this one is for bounded inputs (a blocking key upstream,
    or validation samples)."""
    shingled = df.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("__sh")
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    pairs = (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"), "inner")
        .select(
            F.col(f"a.{id_col}").alias("left_id"),
            F.col(f"b.{id_col}").alias("right_id"),
            jaccard_similarity(F.col("a.__sh"), F.col("b.__sh")).alias(
                "jaccard_sim"
            ),
        )
        .filter(F.col("jaccard_sim") >= F.lit(threshold))
    )
    return pairs


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n: int = 2,
) -> DataFrame:
    """EXACT word-n-gram Jaccard >= threshold pairs (i < j) without a
    quadratic stage — the scale-safe replacement for
    :func:`ngram_jaccard_pairs` with identical results.

    Prefix filtering (Chaudhuri et al.'s SSJoin / AllPairs): order every
    doc's shingles by global document frequency ascending (rarest
    first); for Jaccard >= t a pair must share >= ceil(t*|A|) shingles,
    so the first ``|A| - ceil(t*|A|) + 1`` shingles of each side must
    intersect. Candidate generation is therefore an equi-join on
    *prefix* shingles only — and because prefixes hold the RAREST
    shingles, join groups per key are small (frequent stopword bigrams
    never become join keys), which kills both the cartesian blowup and
    the skew problem in one move. Survivors are verified with the exact
    Jaccard on the full shingle arrays.

    Plan shape: explode -> df-count -> window rank per doc ->
    equi-join on shingle -> distinct -> verify join. All shuffles are
    hash-partitioned equi-joins/aggregations on linear row counts.
    """
    from pyspark.sql import Window

    # localCheckpoint, not persist(): the returned frame is lazy so
    # this function can never unpersist; checkpoint blocks release via
    # the ContextCleaner when the frame is collected (VERDICT r4 #6)
    hashed = _hashed_shingles(
        _fanout(df), text_col, id_col, n
    ).localCheckpoint(eager=True)
    n_docs = hashed.count()
    tok = hashed.select(
        F.col(id_col),
        F.size("__shh").alias("__n"),
        F.explode("__shh").alias("__tok"),
    )
    dfreq = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy(F.col("__df").asc(), F.col("__tok").asc())
    prefix_len = F.col("__n") - F.ceil(F.lit(float(threshold)) * F.col("__n")) + 1
    prefix = (
        tok.join(dfreq, on="__tok", how="inner")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= prefix_len)
        .select(id_col, "__n", "__tok")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # AllPairs length filter: J(A,B) <= min|.|/max|.|, so a pair can
    # only reach the threshold when sizes are within a factor 1/t
    cand = (
        a.join(
            b,
            (F.col("a.__tok") == F.col("b.__tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(F.col("a.__n"), F.col("b.__n"))
                >= F.lit(float(threshold))
                * F.greatest(F.col("a.__n"), F.col("b.__n"))
            ),
            "inner",
        )
        .select(
            F.col(f"a.{id_col}").alias("left_id"),
            F.col(f"b.{id_col}").alias("right_id"),
        )
        .distinct()
    )
    return _verify_exact_jaccard(
        cand, hashed, id_col, n_docs, "jaccard_sim"
    ).filter(F.col("jaccard_sim") >= F.lit(threshold))


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_distance: float = 0.7,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
) -> DataFrame:
    """Approximate near-dup pairs via pure-SQL MinHash LSH banding over
    word shingles (the linear-candidate scale path; whole-stage codegen,
    no ML sparse-vector UDFs). Candidate pairs come from ``bands``
    equi-joins on band keys; survivors are verified with the EXACT
    n-gram Jaccard (shingle arrays re-attached by id — candidates after
    banding are ~linear, so the verification join is cheap). Returns
    (left_id, right_id, jaccard_dist), i < j, deduplicated."""
    from ..functions.minhash import banded_buckets

    # localCheckpoint (eager), not persist(): lazy returns mean no
    # unpersist point exists; checkpoint blocks release with the frame
    # (VERDICT r4 #6). shingled feeds BOTH hashed and banded; hashed
    # feeds both sides of the verification join. _fanout (not a fused
    # repartition) so the shingling can't sink below the exchange into
    # the single-partition scan stage.
    shingled = (
        _fanout(df)
        .select(F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__sh"))
        .filter(F.size("__sh") > 0)
        .localCheckpoint(eager=True)
    )
    # hashed is a cheap map over the CHECKPOINTED shingled frame — no
    # checkpoint of its own (each verify-side broadcast build re-maps
    # from blocks); row count equals shingled's (1:1 projection)
    hashed = shingled.select(
        F.col(id_col),
        F.array_sort(
            F.transform(F.col("__sh"), lambda s: F.xxhash64(s))
        ).alias("__shh"),
    )
    n_docs = shingled.count()
    banded = (
        banded_buckets(shingled, [id_col], F.col("__sh"), num_hashes, bands)
        .select(id_col, "band", "band_key")
        # materialize ONCE: both sides of the self-join read this frame,
        # and a lazy persist races (the join's two stages each compute
        # the signatures before either populates the cache) — measured
        # as two full signature passes at bench scale
        .localCheckpoint(eager=True)
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(
            F.col(f"a.{id_col}").alias("left_id"),
            F.col(f"b.{id_col}").alias("right_id"),
        )
        .distinct()
    )
    out = _verify_exact_jaccard(cand, hashed, id_col, n_docs, "__sim")
    return out.select(
        "left_id",
        "right_id",
        (F.lit(1.0) - F.col("__sim")).alias("jaccard_dist"),
    ).filter(F.col("jaccard_dist") <= F.lit(jaccard_distance))


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= ``max_hamming``.

    Pigeonhole banding: with 4 bands of 16 bits, any pair within
    hamming distance 3 agrees exactly on >= 1 band — so candidate
    generation is ``bands`` equi-joins (shuffle on a 16-bit key), then
    an exact ``bit_count(a ^ b)`` filter. No quadratic stage.
    """
    # eager localCheckpoint: both the banded explode and the exact
    # bit_count verify read this frame; persist() here leaked cache
    # storage across calls (VERDICT r4 #6)
    sh = _fanout(df).select(
        F.col(id_col), simhash64(F.col(text_col)).alias("__simhash")
    ).localCheckpoint(eager=True)
    return hamming_band_pairs(sh, id_col, "__simhash", max_hamming, bands)


def hamming_band_pairs(
    hashed: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    bands: int,
) -> DataFrame:
    """Shared Hamming-banding stage over any 64-bit hash column:
    pigeonhole candidate generation (``bands`` equi-joins on a
    ``64/bands``-bit key — any pair within Hamming ``bands - 1``
    agrees exactly on >= 1 band, so recall is COMPLETE up to that
    distance) then the exact ``bit_count(a ^ b)`` verify. Used by the
    text SimHash path (:func:`simhash_dedup_pairs`) and the image
    dhash/phash path (`operators/imagehash.image_near_dup_pairs`).
    ``hashed`` should be materialized by the caller (both join sides
    read it). Returns (left_id, right_id, hamming), i < j, deduped."""
    band_width = 64 // bands
    banded = hashed.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col(hash_col), i * band_width
                        ).bitwiseAND(F.lit((1 << band_width) - 1)).alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("__band"),
    ).select(id_col, hash_col, "__band.band", "__band.key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(
            F.col(f"a.{id_col}").alias("left_id"),
            F.col(f"b.{id_col}").alias("right_id"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["left_id", "right_id"])
    )


def hamming_band_probe(
    probe: DataFrame,
    idx: DataFrame,
    id_col: str,
    probe_hash_col: str,
    index_id_col: str = "index_id",
    index_hash_col: str = "dhash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Asymmetric twin of :func:`hamming_band_pairs` — probe a (small)
    batch of hashed rows against a (large) durable hash index: both
    sides explode to ``bands`` pigeonhole band keys, equi-join on
    (band, key), exact ``bit_count`` verify. Complete recall at
    ``max_hamming <= bands - 1``. Probe cost tracks the BATCH size;
    the corpus is only ever read as its ~16-byte/item hash index. The
    CDC-ingest shape shared by the image, audio, and (frame-level)
    video families (VERDICT r6 #4). Returns (id, index_id, hamming)."""
    band_width = 64 // bands

    def keys(col):
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col(col), i * band_width)
                    .bitwiseAND(F.lit((1 << band_width) - 1))
                    .alias("key"),
                )
                for i in range(bands)
            ]
        )

    pb = probe.select(
        F.col(id_col),
        F.col(probe_hash_col).alias("__ph"),
        F.explode(keys(probe_hash_col)).alias("__b"),
    ).select(id_col, "__ph", "__b.band", "__b.key")
    ib = idx.select(
        F.col(index_id_col).alias("__iid"),
        F.col(index_hash_col).alias("__ih"),
        F.explode(keys(index_hash_col)).alias("__b"),
    ).select("__iid", "__ih", "__b.band", "__b.key")
    return (
        pb.join(ib, on=["band", "key"], how="inner")
        .withColumn(
            "hamming",
            F.bit_count(F.col("__ph").bitwiseXOR(F.col("__ih"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(id_col, F.col("__iid").alias("index_id"), "hamming")
        .dropDuplicates([id_col, "index_id"])
    )


def embedding_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs (left_id < right_id) by embedding cosine
    similarity >= threshold — exact all-pairs via the BLAS block kernel:
    the corpus is broadcast as a row-normalized numpy matrix and each
    Arrow batch of rows scores against it with one GEMM, emitting only
    surviving pairs. No quadratic row-level join ever materializes.

    ``n_blocks`` is PLANNER-CHOSEN by default (``None``): one cheap
    count x dim aggregate decides broadcast (fits one executor) vs
    :func:`blocked_embedding_dedup_pairs`, the fully distributed
    block-GEMM path (identical results, no driver collect / broadcast
    bound — a 100x corpus switches instead of OOMing the broadcast).
    Pass an explicit int to pin the strategy."""
    if n_blocks is None:
        from ..plans.planner import choose_vector_blocks, vector_corpus_stats

        n_rows, dim = vector_corpus_stats(df, vec_col)
        n_blocks = choose_vector_blocks(n_rows, dim)
    if n_blocks > 1:
        return blocked_embedding_dedup_pairs(
            df, vec_col, id_col, threshold, n_blocks
        )
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ..functions.vectors import normalized_matrix

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(normalized_matrix(df, vec_col, id_col))
    schema = StructType(
        [
            StructField("left_id", LongType()),
            StructField("right_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def scan(batches):
        corpus_ids, corpus_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            sims = (q / qn) @ corpus_mat.T
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            # i < j orientation: keep each unordered pair exactly once
            keep = (sims >= threshold) & (qids[:, None] < corpus_ids[None, :])
            rows, cols = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "left_id": qids[rows],
                    "right_id": corpus_ids[cols],
                    "cosine_sim": sims[rows, cols],
                }
            )

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col, vec_col)
        .repartition(n_parts)
        .mapInPandas(scan, schema)
    )


def blocked_embedding_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_blocks: int = 4,
) -> DataFrame:
    """Distributed exact all-pairs cosine >= threshold (left < right):
    the corpus packs into ``n_blocks`` single-row matrix blocks, the
    upper-triangle block pairs (bid_a <= bid_b) cross-join —
    n(n+1)/2 rows, each one GEMM — and each pair emits surviving
    (min_id, max_id) rows. Identical results to
    :func:`embedding_dedup_pairs` (equivalence-tested); no driver
    collect, no broadcast, shuffle ~ n_blocks copies of the packed
    corpus."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ..functions.vectors import pack_vector_blocks

    packed = pack_vector_blocks(df, vec_col, id_col, n_blocks)
    a = packed.select(
        F.col("bid").alias("__abid"),
        F.col("ids").alias("__aids"),
        F.col("vecs").alias("__avecs"),
    )
    b = packed.select(
        F.col("bid").alias("__bbid"),
        F.col("ids").alias("__bids"),
        F.col("vecs").alias("__bvecs"),
    )
    pairs = a.crossJoin(b).filter(F.col("__abid") <= F.col("__bbid"))
    schema = StructType(
        [
            StructField("left_id", LongType()),
            StructField("right_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                aids = np.asarray(row["__aids"], dtype=np.int64)
                bids = np.asarray(row["__bids"], dtype=np.int64)
                am = np.array(list(row["__avecs"]), dtype=np.float64)
                bm = np.array(list(row["__bvecs"]), dtype=np.float64)
                for m in (am, bm):
                    n = np.linalg.norm(m, axis=1, keepdims=True)
                    n[n == 0.0] = 1.0
                    m /= n
                sims = am @ bm.T
                # each unordered pair exactly once: the diagonal block
                # holds both orientations, so keep strict id order; a
                # cross block pair holds disjoint id sets, so order by
                # id after the fact.
                keep = (sims >= threshold) & (aids[:, None] < bids[None, :])
                rows_i, cols_j = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "left_id": aids[rows_i],
                        "right_id": bids[cols_j],
                        "cosine_sim": sims[rows_i, cols_j],
                    }
                )
                if int(row["__abid"]) != int(row["__bbid"]):
                    keep = (sims >= threshold) & (
                        aids[:, None] > bids[None, :]
                    )
                    rows_i, cols_j = np.nonzero(keep)
                    yield pd.DataFrame(
                        {
                            "left_id": bids[cols_j],
                            "right_id": aids[rows_i],
                            "cosine_sim": sims[rows_i, cols_j],
                        }
                    )

    return pairs.mapInPandas(scan, schema)


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    n: int = 3,
) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs by n-gram set containment:
    C(A, B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| — the measure
    for "document A is substantially contained in B" (news-wire
    reposts, quote-heavy pages, boilerplate-wrapped copies) that
    symmetric Jaccard misses when |B| >> |A|. Emits every ORDERED pair
    (doc_a != doc_b) with containment >= threshold.

    Scale plan (the standard inverted-index word-count shape):
    distinct shingles hashed to int64 -> self equi-join on the shingle
    hash (shingles with document frequency 1 produce no pairs and cost
    nothing beyond the shuffle; both sides co-partition on the hash)
    -> groupBy(doc_a, doc_b) count = |A ∩ B| with map-side partial
    aggregation -> broadcast-join the per-doc set sizes. The
    threshold test is INTEGER arithmetic (inter * denom_scale >=
    size_a * num_scale), so no float comparison can flip a pair
    cross-engine; containment itself is emitted rounded for display.
    Skew note: a corpus-scale hot shingle (boilerplate sentence) fans
    out quadratically in the equi-join — upstream boilerplate
    stripping (`boilerplate_fractions`) or a document-frequency cap is
    the mitigation, and `prefix_filter_jaccard_pairs` shows the
    prefix-filter variant that applies probe-side for containment.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1000)
    from ..functions.text import widen_narrow_scan

    sh = (
        widen_narrow_scan(df)
        .filter(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("__doc"),
            F.explode(word_shingles(F.col(text_col), n)).alias("__g"),
        )
        .select("__doc", F.xxhash64("__g").alias("__h"))
    )
    sizes = sh.groupBy("__doc").agg(F.count(F.lit(1)).alias("__sz"))
    a = sh.select(F.col("__doc").alias("doc_a"), "__h")
    b = sh.select(F.col("__doc").alias("doc_b"), "__h")
    inter = (
        a.join(b, on="__h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        inter.join(
            # no broadcast HINT: sizes has one row per document, which
            # is corpus-proportional — AQE broadcasts it at runtime
            # while it is small and falls back to a shuffled hash join
            # past that, instead of OOMing on a forced broadcast
            sizes.select(F.col("__doc").alias("doc_a"),
                         F.col("__sz").alias("__sza")),
            on="doc_a",
        )
        .filter(
            F.col("__inter") * F.lit(frac.denominator)
            >= F.col("__sza") * F.lit(frac.numerator)
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("__inter") / F.col("__sza"), 6).alias("containment"),
        )
    )
    return out


def prefix_filter_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    n: int = 3,
) -> DataFrame:
    """EXACT containment pairs (same contract/result as
    :func:`containment_pairs`) without the full inverted-index
    self-join — the 100 TB formulation.

    Probe-side prefix filtering: containment C(A,B) >= t requires
    sharing at least ``ceil(t*|A|)`` of A's shingles, so with A's
    shingles ordered by global document frequency ascending, the first
    ``|A| - ceil(t*|A|) + 1`` (rarest) shingles must hit B. Candidate
    generation joins only A's PREFIX shingles against B's full shingle
    set — prefixes hold the rarest shingles, so join groups stay small
    even when a boilerplate shingle is corpus-frequent (the hot key
    never becomes a probe key; it can still appear on the B side, but
    each B occurrence meets only the few docs whose PREFIX contains
    it). All thresholds are integer arithmetic (``required = (num*|A|
    + denom - 1) // denom``) so no float rounding can shrink a prefix
    and silently drop a true pair. Survivors verify with the exact
    intersection over full hashed-shingle arrays."""
    from fractions import Fraction

    from pyspark.sql import Window

    frac = Fraction(threshold).limit_denominator(1000)
    num, den = frac.numerator, frac.denominator
    # same null contract as containment_pairs and the SQL oracle:
    # null text/id rows are rejected BEFORE shingling — otherwise the
    # empty-fallback shingle {""} would pair every null-text doc with
    # every empty doc at containment 1.0 (caught by
    # test_round3_ops_null_and_empty_inputs)
    clean = df.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    )
    # localCheckpoint, not persist(): the returned frame is lazy so this
    # function can never unpersist, and cacheManager-pinned storage
    # would accumulate across calls in a long session (ADVICE r3).
    # Checkpoint blocks are released by the ContextCleaner as soon as
    # the result frame is garbage-collected.
    hashed = _hashed_shingles(
        _fanout(clean), text_col, id_col, n
    ).localCheckpoint(eager=True)
    n_docs = hashed.count()  # metadata-cheap over checkpoint blocks
    tok = hashed.select(
        F.col(id_col),
        F.size("__shh").alias("__n"),
        F.explode("__shh").alias("__tok"),
    )
    # no broadcast HINT on dfreq: the distinct-shingle count is
    # corpus-vocabulary-proportional, so AQE broadcasts it at runtime
    # while it is small and falls back to a shuffled hash join past
    # the advisory threshold instead of OOMing on a forced broadcast
    dfreq = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("__df").asc(), F.col("__tok").asc()
    )
    required = F.floor((F.col("__n") * num + den - 1) / den)
    prefix = (
        tok.join(dfreq, on="__tok", how="inner")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__n") - required + 1)
        .select(F.col(id_col).alias("doc_a"), "__tok")
    )
    full = tok.select(F.col(id_col).alias("doc_b"), "__tok")
    # NO distinct() on candidates (VERDICT r4 #2): the verify filter is
    # idempotent per pair, so duplicate candidates (a pair sharing >1
    # prefix shingle) just re-verify — far cheaper than shuffling the
    # full candidate volume for a ~5% dedup; the tiny post-threshold
    # output dedups at the end instead. The explicit repartition undoes
    # AQE's coalescing of the token-join output (measured 4 partitions
    # at bench scale — the per-pair array_intersect verify needs the
    # cores, not 4 tasks of 250K pairs each).
    cand = (
        prefix.join(full, on="__tok")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    ha = hashed.select(
        F.col(id_col).alias("doc_a"),
        F.col("__shh").alias("__sha"),
        F.size("__shh").alias("__sza"),
    )
    hb = hashed.select(
        F.col(id_col).alias("doc_b"), F.col("__shh").alias("__shb")
    )
    if n_docs <= BROADCAST_DOC_LIMIT:
        # candidate side is the big one: verification becomes map-only
        ha, hb = F.broadcast(ha), F.broadcast(hb)
    inter = F.size(F.array_intersect("__sha", "__shb"))
    return (
        cand.join(ha, on="doc_a")
        .join(hb, on="doc_b")
        .withColumn("__inter", inter)
        .filter(F.col("__inter") * den >= F.col("__sza") * num)
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("__inter") / F.col("__sza"), 6).alias(
                "containment"
            ),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def build_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
) -> None:
    """Persist a NEAR-dup index for incremental dedup: band keys
    (``bands`` int64 rows per doc) and the hashed shingle arrays (for
    exact verification) as two parquet tables. The near-dup analogue
    of the persistable Bloom bitset (`operators/bloom.py`) — a daily
    ingest probes new batches against the accumulated index instead of
    re-scanning the whole seen corpus."""
    bands_df, shingles_df = minhash_index_frames(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    bands_df.write.mode("overwrite").parquet(f"{path}/bands")
    shingles_df.write.mode("overwrite").parquet(f"{path}/shingles")


def minhash_index_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
):
    """(bands, shingles) frames of the durable near-dup index for a
    document frame — shared by the one-shot :func:`build_minhash_index`
    (overwrite) and the streaming ``foreachBatch`` maintainer
    (append per microbatch)."""
    from ..functions.minhash import banded_buckets
    from ..functions.text import widen_narrow_scan

    clean = widen_narrow_scan(df).filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    )
    shingled = clean.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    bands_df = banded_buckets(
        shingled, [id_col], F.col("__sh"), num_hashes, bands
    ).select(id_col, "band", "band_key")
    shingles_df = shingled.select(
        F.col(id_col),
        F.array_sort(
            F.transform(F.col("__sh"), lambda s: F.xxhash64(s))
        ).alias("__shh"),
    )
    return bands_df, shingles_df


def incremental_near_dup_pairs(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    jaccard_distance: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and a persisted
    :func:`build_minhash_index`: batch band keys equi-join the stored
    band table (shuffle keyed on one int64 — the stored side is never
    re-shingled), survivors verify with exact Jaccard against the
    stored shingle arrays. Returns (batch_id, index_id, jaccard_dist).

    Same banding guarantee as `minhash_dedup_pairs`; the incremental
    cost is proportional to the BATCH size plus matched buckets, not
    the corpus."""
    from ..functions.minhash import banded_buckets
    from ..functions.text import widen_narrow_scan

    spark = batch.sparkSession
    clean = widen_narrow_scan(batch).filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    )
    shingled = clean.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    new_bands = (
        banded_buckets(shingled, [id_col], F.col("__sh"), num_hashes, bands)
        .select(F.col(id_col).alias("batch_id"), "band", "band_key")
        .localCheckpoint(eager=True)
    )
    idx_bands = spark.read.parquet(f"{path}/bands").select(
        F.col(id_col).alias("index_id"), "band", "band_key"
    )
    cand = (
        new_bands.join(idx_bands, on=["band", "band_key"])
        .select("batch_id", "index_id")
        .distinct()
    )
    new_sh = shingled.select(
        F.col(id_col).alias("batch_id"),
        F.array_sort(
            F.transform(F.col("__sh"), lambda s: F.xxhash64(s))
        ).alias("__bsh"),
    )
    idx_sh = spark.read.parquet(f"{path}/shingles").select(
        F.col(id_col).alias("index_id"), F.col("__shh").alias("__ish")
    )
    inter = F.size(F.array_intersect(F.col("__bsh"), F.col("__ish")))
    union = F.size("__bsh") + F.size("__ish") - inter
    return (
        cand.join(new_sh, on="batch_id")
        .join(idx_sh, on="index_id")
        .select(
            "batch_id",
            "index_id",
            (F.lit(1.0) - inter.cast("double") / union).alias("jaccard_dist"),
        )
        .filter(F.col("jaccard_dist") <= F.lit(jaccard_distance))
    )


def semantic_cluster_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 8,
) -> DataFrame:
    """Assign every vector to its most-similar centroid (cosine), with
    centroids taken DETERMINISTICALLY as the first ``n_clusters`` rows
    by id — a bounded ``orderBy(id).limit(k)`` exactly like the IVF
    sampler, so the assignment is reproducible and SQL-replayable (no
    random k-means init). Ties break to the smaller centroid id.

    Physical shape: the k x dim centroid matrix broadcasts (k is a
    parameter, never SF-proportional); assignment is one Arrow-batched
    GEMM per partition — map-only, no shuffle, the corpus never
    collects."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    # null embeddings can't cluster (and would raise in the executor
    # GEMM); a null id can't be a centroid (nulls sort FIRST under
    # orderBy, so it would land in the first-k sample). Reject both up
    # front — rows with either null are dropped from the assignment,
    # matching the kmeans twin's contract (ADVICE r4 + r5 review).
    df = df.where(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    # a single-file embeddings scan arrives in 1 partition, so the
    # assignment GEMM + the downstream per-row norm fold ran serially
    # into the pair stage's checkpoint (round-12 profile: a 2.2 s
    # single-task stage). Fan out first — no-op at real scale.
    if not df.isStreaming:
        df = _fanout(df)
    cent = (
        df.select(id_col, vec_col)
        .orderBy(F.col(id_col))
        .limit(n_clusters)
        .collect()
    )
    cids = np.array([r[0] for r in cent], dtype=np.int64)
    cmat = np.array([list(map(float, r[1])) for r in cent], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1)
    cn[cn == 0.0] = 1.0
    bc = spark.sparkContext.broadcast((cids, cmat, cn))

    schema = StructType(
        list(df.schema.fields) + [StructField("cluster", LongType())]
    )

    def assign(batches):
        ids, cm, cnorm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            # SAME formula/order as DuckDB's list_cosine_similarity
            # (unnormalized dot / (|a| * |b|)) so near-tied centroid
            # argmax can't flip vs the SQL oracle on rounding order
            # (ADVICE r4; was (q/|q|) @ (c/|c|) before)
            sims = (q @ cm.T) / (qn * cnorm[None, :])
            # argmax returns the FIRST max; centroid rows are ordered
            # by ascending id, so ties resolve to the smaller id
            pdf = pdf.copy()
            pdf["cluster"] = ids[np.argmax(sims, axis=1)]
            yield pdf

    return df.mapInPandas(assign, schema)


# rows per cluster above which the within-cluster self-join salts —
# the semantic-dedup analogue of BANDED_BUCKET_CAP: a skewed corpus
# (most vectors in one cluster) must not funnel its n^2/k pair volume
# through ONE shuffle key / one reducer (VERDICT r4 #3)
SEMANTIC_CLUSTER_CAP = 4096


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_clusters: int = 8,
    cluster_cap: int = SEMANTIC_CLUSTER_CAP,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus by nearest centroid, then
    search for cosine >= threshold pairs ONLY within each cluster —
    the pair volume drops from n^2 to ~n^2/k while catching the
    overwhelming share of semantic duplicates (near-dups co-locate by
    construction: two vectors at cosine ~1 have near-identical
    centroid similarities; misses are only pairs straddling a centroid
    boundary, the documented SemDeDup trade).

    Plan: map-only assignment (:func:`semantic_cluster_assign`), then
    a self EQUI-join on the cluster id (hash join, never a cartesian)
    with the exact cosine computed in Catalyst (``zip_with`` +
    ``aggregate`` — sequential fold, engine-reproducible) and an
    ``id < id`` orientation. At 100 TB the equi-join shuffles each
    cluster to one reducer set; a SKEWED corpus (one cluster holding
    most of the mass — first-k centroids on clumpy embeddings make
    this likely) is bounded by ``cluster_cap``: per-cluster sizes are
    counted with one cheap aggregate (k rows out), and any cluster
    above the cap SALTS its self-join — the probe side hashes into
    ``ceil(size/cap)`` salt buckets, the build side replicates across
    them, so each (cluster, salt) shuffle key carries at most ~cap
    build rows instead of the whole cluster. Output rows are
    IDENTICAL to the unsalted join (each pair meets on exactly one
    salt); only the shuffle-key fan-out changes — mirroring the
    ``BANDED_BUCKET_CAP`` guard on the MinHash path. First-k
    centroids are a DETERMINISM compromise (SQL-replayable routing),
    not a quality choice — swap in ``pyspark.ml`` k-means|| with a
    fixed seed when oracle replay isn't required.

    The threshold compares the ROUND(cos, 6) value — the same
    quantization the output column carries and the SQL oracle filters
    on — so a pair landing within float ulps of the threshold cannot
    be admitted by one engine and rejected by the other (ADVICE r4).
    """
    return _within_cluster_pairs(
        semantic_cluster_assign(df, vec_col, id_col, n_clusters),
        vec_col,
        id_col,
        threshold,
        cluster_cap,
    )


def _within_cluster_pairs(
    assigned_df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    cluster_cap: int,
) -> DataFrame:
    """Shared pair-search stage of the semantic-dedup family: given a
    frame with a ``cluster`` column, self-equi-join within clusters
    (salted above ``cluster_cap``), exact Catalyst cosine, threshold
    on the round-6 value. Used by both the deterministic first-k
    assignment (:func:`semantic_dedup_pairs`, SQL-replayable) and the
    k-means|| assignment (:func:`semantic_dedup_pairs_kmeans`)."""
    _sq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x * x
    )
    assigned = assigned_df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "__e"
        ),
        "cluster",
    ).withColumn(
        # norm per ROW, before the join: the HOF folds evaluate
        # interpreted (outside codegen), so folding sqrt(sum sq) once
        # per row instead of twice per PAIR cuts the join-side work to
        # the single dot fold — identical float ops/values, the pair
        # expression still divides dot by (na * nb)
        "__norm",
        F.sqrt(_sq(F.col("__e"))),
    )
    # both join sides AND the size count read this frame: checkpoint
    # once (eager) instead of recomputing the assignment 3x; the
    # blocks release with the frame (ContextCleaner)
    assigned = assigned.localCheckpoint(eager=True)
    sizes = assigned.groupBy("cluster").count().collect()  # <= k rows
    splits = {
        int(r["cluster"]): -(-int(r["count"]) // int(cluster_cap))
        for r in sizes
        if int(r["count"]) > int(cluster_cap)
    }
    dot = F.aggregate(
        F.zip_with("__ea", "__eb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("__na") * F.col("__nb"))
    if splits:
        smap = F.create_map(
            *[F.lit(x) for kv in splits.items() for x in kv]
        )
        n_salt = F.coalesce(smap[F.col("cluster")], F.lit(1))
        a = assigned.select(
            F.col(id_col).alias("left_id"),
            F.col("__e").alias("__ea"),
            F.col("__norm").alias("__na"),
            "cluster",
            F.pmod(F.xxhash64(F.col(id_col)), n_salt).cast("int").alias(
                "__salt"
            ),
        )
        b = assigned.select(
            F.col(id_col).alias("right_id"),
            F.col("__e").alias("__eb"),
            F.col("__norm").alias("__nb"),
            "cluster",
            F.explode(
                F.sequence(F.lit(0), n_salt.cast("int") - F.lit(1))
            ).alias("__salt"),
        )
        joined = a.join(b, on=["cluster", "__salt"])
    else:
        a = assigned.select(
            F.col(id_col).alias("left_id"),
            F.col("__e").alias("__ea"),
            F.col("__norm").alias("__na"),
            "cluster",
        )
        b = assigned.select(
            F.col(id_col).alias("right_id"),
            F.col("__e").alias("__eb"),
            F.col("__norm").alias("__nb"),
            "cluster",
        )
        joined = a.join(b, on="cluster")
    return (
        joined.filter(F.col("left_id") < F.col("right_id"))
        .withColumn("cosine_sim", F.round(cos, 6))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .select("cluster", "left_id", "right_id", "cosine_sim")
    )


def semantic_dedup_keep(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_clusters: int = 8,
) -> DataFrame:
    """The SemDeDup KEEP set: connected components over the
    within-cluster near-dup pairs, keeping the minimum id of each
    duplicate group (singletons keep themselves). Returns
    (id, component) for every row plus a ``kept`` flag — the
    downstream filter for a deduplicated training corpus."""
    from .graph import connected_components

    pairs = semantic_dedup_pairs(
        df, vec_col, id_col, threshold, n_clusters
    ).select(F.col("left_id"), F.col("right_id"))
    cc = connected_components(pairs)  # (node, component) for dup nodes
    ids = df.select(F.col(id_col).alias("node"))
    labeled = ids.join(cc, on="node", how="left").select(
        F.col("node").alias(id_col),
        F.coalesce("component", "node").alias("component"),
    )
    return labeled.withColumn(
        "kept", (F.col(id_col) == F.col("component")).cast("int")
    )


def semantic_dedup_pairs_kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_clusters: int = 8,
    seed: int = 42,
    cluster_cap: int = SEMANTIC_CLUSTER_CAP,
) -> DataFrame:
    """SemDeDup with REAL k-means|| clustering (``pyspark.ml``,
    fixed-seed — deterministic across runs but not SQL-replayable, so
    this variant is quality-gated by tests instead of a DuckDB
    oracle): better-balanced clusters than the first-k-rows centroids
    of :func:`semantic_dedup_pairs`, hence fewer boundary misses on
    clumpy corpora — the production-quality assignment the SemDeDup
    paper assumes. Same within-cluster exact-cosine pair search,
    same ``cluster_cap`` skew salt, identical output contract
    (cluster, left_id, right_id, cosine_sim), always a SUBSET of the
    brute-force cosine pairs.

    Plan: k-means|| fit is Spark ML's distributed Lloyd iterations
    (bounded rounds over the corpus, centroids driver-side — k x dim
    only); transform is a map-only assignment; everything downstream
    is the shared equi-join stage."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(id_col, vec_col).where(
        F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()
    ).withColumn(
        "__feat", array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
    )
    km = KMeans(
        k=n_clusters,
        seed=seed,
        featuresCol="__feat",
        predictionCol="cluster",
    )
    model = km.fit(feat)
    assigned = model.transform(feat).select(
        id_col, vec_col, F.col("cluster").cast("long").alias("cluster")
    )
    return _within_cluster_pairs(
        assigned, vec_col, id_col, threshold, cluster_cap
    )


# Crossover for leakage_safe_split's default near-dup edge source
# (VERDICT r5 #2, O4-style planner bound). Prefix filtering keeps
# ~(1-t)*|set|+1 tokens per doc in the join index — at the split's
# default t=0.2 that indexes ~80% of every doc's shingles, so the
# exact candidate join degenerates toward all-pairs-with-shared-vocab
# exactly on large corpora. Measured at sf0.1 (5,000 docs): exact
# 33.2 s vs banded 5.0 s with 4998/5000 identical routing (PLANS.md
# r5), so past this many documents the default edge source switches
# to MinHash-banded candidates whose survivors are STILL verified
# with the exact Jaccard (precision exact; recall is the banding
# probability, gated by test_leakage_split_banded_agreement).
LEAKAGE_EXACT_DOC_CAP = 2_000


def leakage_safe_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    test_rate: float = 0.2,
    threshold: float = 0.2,
    shingle_n: int = 2,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Train/eval split where near-duplicate documents can NEVER
    straddle the boundary — the benchmark-decontamination split a
    pretraining pipeline needs (a test doc whose near-dup sits in
    train is leakage the plain per-row split can't prevent).

    Composition of exact building blocks: near-dup pairs via the
    prefix-filtered exact Jaccard join, transitive closure via
    distributed connected components, then the WHOLE component is
    routed by one deterministic md5 draw on its min-id label
    (`functions/sampling.rate_predicate` — reproducible across
    engines/runs/partitionings; singletons route by their own id).
    Adds (component, split) to every row. All stages are the
    linear-shuffle formulations; nothing quadratic, nothing driver-
    side past the bounded component labels.

    The near-dup edge source is PLANNER-CHOSEN (VERDICT r5 #2): below
    ``LEAKAGE_EXACT_DOC_CAP`` documents the EXACT prefix-filtered join
    builds the edges (oracle-replayable, and cheap while prefix
    indexes stay small); above it, MinHash-BANDED candidates with the
    exact Jaccard verify on survivors — every stage linear in the
    corpus, so the composed pipeline is scale-safe by DEFAULT rather
    than via this escape hatch. ``pairs`` still overrides both (any
    (left_id, right_id) frame; the split logic downstream is
    unchanged)."""
    from ..functions.sampling import rate_predicate
    from .graph import connected_components

    clean = df.where(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    )
    if pairs is None:
        if clean.count() <= LEAKAGE_EXACT_DOC_CAP:
            pairs = prefix_filter_jaccard_pairs(
                clean, text_col, id_col, threshold, shingle_n
            )
        else:
            pairs = minhash_dedup_pairs(
                clean,
                text_col,
                id_col,
                jaccard_distance=1.0 - threshold,
                shingle_n=shingle_n,
            )
    pairs = pairs.select("left_id", "right_id")
    cc = connected_components(pairs).withColumnRenamed("node", id_col)
    labeled = clean.join(cc, on=id_col, how="left").withColumn(
        "component", F.coalesce("component", F.col(id_col))
    )
    return labeled.withColumn(
        "split",
        F.when(
            rate_predicate(F.col("component"), test_rate), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def embedding_contamination_hits(
    corpus: DataFrame,
    bench: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Corpus vectors whose NEAREST benchmark vector clears
    ``threshold`` cosine — the embedding-space twin of the n-gram
    contamination check (`functions/text.contamination_fractions`):
    a paraphrased benchmark rewrite shares no 13-gram but still sits
    next to the original in embedding space. Returns
    ``(id_col, bench_sim)`` with the round-6 max similarity (max, not
    argmax, so the result is engine-portable with no tie order).

    Scale: reuses the similarity family's planner-chosen GEMM
    (`operators/similarity.brute_force_topk`) — benchmark sets are
    small by nature, so the bench matrix broadcasts and the corpus is
    scored map-only, one Arrow batch at a time; nothing quadratic,
    no corpus shuffle."""
    from .similarity import brute_force_topk

    hits = brute_force_topk(corpus, bench, vec_col, id_col, k=1)
    return (
        hits.select(
            F.col("query_id").alias(id_col),
            F.round(F.col("cosine_sim"), 6).alias("bench_sim"),
        )
        .where(F.col("bench_sim") >= F.lit(threshold))
    )


def embedding_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """The corpus with every benchmark-near vector REMOVED — semantic
    decontamination before training. Anti-join against the (small)
    hit set; the corpus frame itself is never shuffled."""
    hits = embedding_contamination_hits(
        corpus, bench, vec_col, id_col, threshold
    ).select(id_col)
    return corpus.join(hits, on=id_col, how="left_anti")
