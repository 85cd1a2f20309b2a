"""Similarity search over embedding columns (``array<float>``).

Two physical strategies:

- **brute-force top-k** — the exact baseline: the corpus is collected,
  row-normalized, and broadcast as a numpy matrix; ``mapInPandas`` over
  the probe partitions computes each Arrow batch's cosine block with
  one BLAS GEMM and selects top-k in-core (``argpartition``). No
  row-level cross join, no window shuffle — the per-probe sort never
  leaves the executor. At scale the same kernel runs per corpus
  *block* (broadcast one block at a time, union, final top-k merge).
- **random-hyperplane LSH top-k** — the scale path: sign-bit sketches
  bucket the corpus; probes only score their own bucket. Recall < 1 by
  design; the brute-force path is its correctness reference.

Hyperplanes are generated from a seeded numpy RNG on the driver and
broadcast as literal arrays — deterministic across runs and executors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.vectors import (
    cosine_similarity,
    dot,
    normalized_matrix,
    pack_vector_blocks,
)

TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine_sim", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)


def brute_force_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    corpus_blocks: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per probe (excluding self-matches).
    Returns (query_id, neighbor_id, cosine_sim, rank); ties broken by
    ascending neighbor id for determinism.

    ``corpus_blocks`` is PLANNER-CHOSEN by default (``None``): one
    cheap count x dim aggregate picks collect+broadcast (fast while the
    corpus fits one executor) vs :func:`blocked_topk`, the fully
    distributed block-GEMM path with identical results
    (equivalence-tested) and no driver collect or broadcast bound — a
    corpus past the broadcast budget switches instead of OOMing. Pass
    an explicit int to pin the strategy."""
    if corpus_blocks is None:
        from ..plans.planner import choose_vector_blocks, vector_corpus_stats

        n_rows, dim = vector_corpus_stats(corpus, vec_col)
        corpus_blocks = choose_vector_blocks(n_rows, dim)
    if corpus_blocks > 1:
        return blocked_topk(probes, corpus, vec_col, id_col, k, corpus_blocks)
    spark = probes.sparkSession
    bc = spark.sparkContext.broadcast(
        normalized_matrix(corpus, vec_col, id_col)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        corpus_ids, corpus_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            sims = (q / qn) @ corpus_mat.T  # one GEMM per Arrow batch
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            # mask self-matches by id, then take k best per row
            sims[qids[:, None] == corpus_ids[None, :]] = -np.inf
            kk = min(k, sims.shape[1] - 1) if sims.shape[1] > 1 else 0
            if kk <= 0:
                continue
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = {"query_id": [], "neighbor_id": [], "cosine_sim": [], "rank": []}
            for row, cols in enumerate(part):
                vals = sims[row, cols]
                # exact order within the k-subset: sim desc, id asc
                order = np.lexsort((corpus_ids[cols], -vals))
                for rank, j in enumerate(order, start=1):
                    out["query_id"].append(qids[row])
                    out["neighbor_id"].append(corpus_ids[cols[j]])
                    out["cosine_sim"].append(vals[j])
                    out["rank"].append(rank)
            yield pd.DataFrame(out)

    return probes.select(id_col, vec_col).mapInPandas(score, TOPK_SCHEMA)


_BLOCK_CAND_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine_sim", DoubleType()),
    ]
)


def blocked_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    corpus_blocks: int = 4,
    probe_blocks: int | None = None,
) -> DataFrame:
    """Exact top-k via distributed block matrix multiply — the 100 TB
    path for :func:`brute_force_topk` (same results, no driver collect,
    no broadcast bound).

    Plan shape: both sides pack into single-row blocks
    (:func:`pack_vector_blocks`, one shuffle each), the P x C packed
    block pairs cross-join (P*C rows — the *block* cartesian, constant
    per task, never a row-level cartesian), each pair runs one GEMM and
    emits its local top-k per probe, and a final window over
    |probes| * C * k candidate rows merges the global top-k. Total
    shuffle volume ~ C copies of the probe blocks + P copies of the
    corpus blocks — the canonical replication cost of exact all-pairs,
    tunable via the block counts."""
    if probe_blocks is None:
        probe_blocks = max(
            1, probes.sparkSession.sparkContext.defaultParallelism // 2
        )
    pp = pack_vector_blocks(probes, vec_col, id_col, probe_blocks).select(
        F.col("ids").alias("__qids"), F.col("vecs").alias("__qvecs")
    )
    pc = pack_vector_blocks(corpus, vec_col, id_col, corpus_blocks).select(
        F.col("ids").alias("__cids"), F.col("vecs").alias("__cvecs")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                qids = np.asarray(row["__qids"], dtype=np.int64)
                cids = np.asarray(row["__cids"], dtype=np.int64)
                qm = np.array(list(row["__qvecs"]), dtype=np.float64)
                cm = np.array(list(row["__cvecs"]), dtype=np.float64)
                for m in (qm, cm):
                    n = np.linalg.norm(m, axis=1, keepdims=True)
                    n[n == 0.0] = 1.0
                    m /= n
                sims = qm @ cm.T
                sims[qids[:, None] == cids[None, :]] = -np.inf
                kk = min(k, sims.shape[1])
                if kk <= 0:
                    continue
                part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                out = {"query_id": [], "neighbor_id": [], "cosine_sim": []}
                for r, cols in enumerate(part):
                    vals = sims[r, cols]
                    ok = np.isfinite(vals)
                    out["query_id"].extend([qids[r]] * int(ok.sum()))
                    out["neighbor_id"].extend(cids[cols[ok]])
                    out["cosine_sim"].extend(vals[ok])
                yield pd.DataFrame(out)

    cand = pp.crossJoin(pc).mapInPandas(score, _BLOCK_CAND_SCHEMA)
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: the corpus is
    k-means-clustered (seeded numpy Lloyd iterations on the driver —
    deterministic), each probe scores only its ``n_probe`` nearest
    clusters' members. Candidates shrink by ~n_probe/n_clusters;
    :func:`brute_force_topk` is the correctness reference.

    Broadcast contract is PLANNER-ENFORCED: the corpus (ids,
    normalized matrix, cluster assignments) is collected + broadcast
    while it fits one executor; past the broadcast budget this
    function hands off to :func:`ivf_topk_distributed` (sampled
    centroids + cogroup GEMM, no driver-resident corpus) instead of
    OOMing the collect."""
    import numpy as np

    from ..plans.planner import choose_vector_blocks, vector_corpus_stats

    n_rows, dim = vector_corpus_stats(corpus, vec_col)
    if choose_vector_blocks(n_rows, dim) > 1:
        return ivf_topk_distributed(
            probes, corpus, vec_col, id_col, k=k, n_clusters=n_clusters,
            n_probe=n_probe, kmeans_iters=kmeans_iters, seed=seed,
        )

    spark = probes.sparkSession
    corpus_ids, corpus_mat = normalized_matrix(corpus, vec_col, id_col)
    m = len(corpus_ids)
    ncl = min(n_clusters, max(1, m))
    rng = np.random.default_rng(seed)
    centroids = corpus_mat[rng.choice(m, size=ncl, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(corpus_mat @ centroids.T, axis=1)
        for c in range(ncl):
            members = corpus_mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    assign = np.argmax(corpus_mat @ centroids.T, axis=1)
    # inverted lists as a permutation + offsets (cache-friendly slices)
    order = np.argsort(assign, kind="stable")
    boundaries = np.searchsorted(assign[order], np.arange(ncl + 1))
    bc = spark.sparkContext.broadcast(
        (corpus_ids, corpus_mat, centroids, order, boundaries)
    )
    npb = min(n_probe, ncl)

    def score(batches):
        import pandas as pd

        ids, mat, cents, perm, bounds = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            qm = q / qn
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            probe_cl = np.argpartition(
                -(qm @ cents.T), npb - 1, axis=1
            )[:, :npb]
            out = {"query_id": [], "neighbor_id": [], "cosine_sim": [], "rank": []}
            for row in range(len(qm)):
                cand = np.concatenate(
                    [
                        perm[bounds[c] : bounds[c + 1]]
                        for c in probe_cl[row]
                    ]
                )
                if not len(cand):
                    continue
                sims = mat[cand] @ qm[row]
                cand_ids = ids[cand]
                mask = cand_ids != qids[row]
                sims, cand_ids = sims[mask], cand_ids[mask]
                if not len(sims):
                    continue
                kk = min(k, len(sims))
                sel = np.argpartition(-sims, kk - 1)[:kk]
                order_sel = np.lexsort((cand_ids[sel], -sims[sel]))
                for rank, j in enumerate(order_sel, start=1):
                    out["query_id"].append(qids[row])
                    out["neighbor_id"].append(cand_ids[sel[j]])
                    out["cosine_sim"].append(sims[sel[j]])
                    out["rank"].append(rank)
            yield pd.DataFrame(out)

    return probes.select(id_col, vec_col).mapInPandas(score, TOPK_SCHEMA)


def ivf_topk_distributed(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 10,
    seed: int = 42,
    centroid_sample: int = 4096,
) -> DataFrame:
    """IVF approximate top-k with NO driver-resident corpus — the
    100 TB path for :func:`ivf_topk`.

    - centroids: seeded k-means on a BOUNDED deterministic sample
      (``orderBy(id).limit(centroid_sample)`` — a distributed top-N,
      never a full collect), broadcast (tiny);
    - cluster assignment: one ``mapInPandas`` pass per side (corpus
      rows to their centroid; probes exploded to their ``n_probe``
      nearest centroids);
    - scoring: ``cogroup().applyInPandas`` on the cluster id — the
      idiomatic Spark shape for "pair each probe subset with its
      cluster's members": both sides shuffle once on the cluster key,
      each group runs one GEMM + local top-k;
    - merge: a global per-query window over ~|probes| * n_probe * k
      candidate rows.

    Same contract as :func:`ivf_topk` (approximate; recall measured
    against :func:`brute_force_topk`), deterministic for a fixed seed.
    """
    spark = probes.sparkSession

    sample = [
        (r[0], r[1])
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(centroid_sample)
        .collect()
    ]
    smat = np.array([v for _, v in sample], dtype=np.float64)
    snorm = np.linalg.norm(smat, axis=1, keepdims=True)
    snorm[snorm == 0.0] = 1.0
    smat = smat / snorm
    m = len(smat)
    ncl = min(n_clusters, max(1, m))
    rng = np.random.default_rng(seed)
    centroids = smat[rng.choice(m, size=ncl, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(smat @ centroids.T, axis=1)
        for c in range(ncl):
            members = smat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    bc = spark.sparkContext.broadcast(centroids)
    npb = min(n_probe, ncl)

    corpus_schema = StructType(
        [
            StructField("__cl", IntegerType()),
            StructField(id_col, LongType()),
            StructField(vec_col, corpus.schema[vec_col].dataType),
        ]
    )

    def assign_corpus(batches):
        cents = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            cl = np.argmax((v / n) @ cents.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "__cl": cl,
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                }
            )

    def assign_probes(batches):
        cents = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            sims = (v / n) @ cents.T
            top = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
            reps = np.repeat(np.arange(len(pdf)), npb)
            yield pd.DataFrame(
                {
                    "__cl": top.reshape(-1).astype(np.int32),
                    id_col: pdf[id_col].to_numpy()[reps],
                    vec_col: pdf[vec_col].to_numpy()[reps],
                }
            )

    corpus_cl = corpus.select(id_col, vec_col).mapInPandas(
        assign_corpus, corpus_schema
    )
    probes_cl = probes.select(id_col, vec_col).mapInPandas(
        assign_probes, corpus_schema
    )

    def score(key, probe_pdf: pd.DataFrame, corpus_pdf: pd.DataFrame):
        if not len(probe_pdf) or not len(corpus_pdf):
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            )
        qm = np.array(probe_pdf[vec_col].tolist(), dtype=np.float64)
        cm = np.array(corpus_pdf[vec_col].tolist(), dtype=np.float64)
        for mtx in (qm, cm):
            n = np.linalg.norm(mtx, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            mtx /= n
        qids = probe_pdf[id_col].to_numpy(dtype=np.int64)
        cids = corpus_pdf[id_col].to_numpy(dtype=np.int64)
        sims = qm @ cm.T
        sims[qids[:, None] == cids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out = {"query_id": [], "neighbor_id": [], "cosine_sim": []}
        for r, cols in enumerate(part):
            vals = sims[r, cols]
            ok = np.isfinite(vals)
            out["query_id"].extend([qids[r]] * int(ok.sum()))
            out["neighbor_id"].extend(cids[cols[ok]])
            out["cosine_sim"].extend(vals[ok])
        return pd.DataFrame(out)

    cand = (
        probes_cl.groupBy("__cl")
        .cogroup(corpus_cl.groupBy("__cl"))
        .applyInPandas(score, _BLOCK_CAND_SCHEMA)
        # a probe visiting multiple clusters can see a neighbor twice
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec_col: str, planes: list) -> F.Column:
    """Sign-bit bucket id: bit i set iff dot(vec, plane_i) > 0 —
    computed entirely JVM-side from literal plane arrays."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on the random-hyperplane bucket,
    exact cosine re-rank within the bucket. Candidates shrink by
    ~2^n_planes; recall measured against :func:`brute_force_topk`.

    Pass ``dim`` explicitly (array columns don't carry their length in
    the Spark schema) — the hyperplanes are driver-built plan literals,
    so leaving it ``None`` costs one single-row inference job before
    planning."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    a = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _bucket_expr(vec_col, planes).alias("__bucket"),
    )
    b = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _bucket_expr(vec_col, planes).alias("__bucket"),
    )
    scored = (
        a.join(b, on="__bucket", how="inner")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def _pq_train_codebooks(
    sample_mat: "np.ndarray", m: int, ksub: int, iters: int, seed: int
) -> "np.ndarray":
    """Seeded per-subspace k-means over a (row-normalized) training
    sample -> codebooks of shape (m, ksub, dim//m). Deterministic:
    numpy RNG seeded, fixed iteration count, stable argmax."""
    n, dim = sample_mat.shape
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        sub = sample_mat[:, s * dsub : (s + 1) * dsub]
        kk = min(ksub, max(1, n))
        cents = sub[rng.choice(n, size=kk, replace=False)].copy()
        sub_sq = (sub * sub).sum(axis=1)[:, None]
        for _ in range(iters):
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 as one GEMM: the
            # broadcast-subtract form materialized an n x ksub x dsub
            # temp per iteration (~2.5 s of driver time at ksub=256,
            # round-10 profile); this is ~4M flops through BLAS
            d2 = (
                sub_sq
                - 2.0 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            # vectorized centroid update (round 10): the per-centroid
            # boolean-mask loop cost ~0.1 ms x ksub x iters x m — 2 s
            # of driver time at ksub=256 — for work bincount/add.at do
            # in one pass. Still deterministic (seeded init, fixed
            # iters, sequential accumulation).
            sums = np.zeros((kk, dsub), dtype=np.float64)
            np.add.at(sums, assign, sub)
            counts = np.bincount(assign, minlength=kk)
            nz = counts > 0
            cents[nz] = sums[nz] / counts[nz, None]
        if kk < ksub:  # degenerate tiny sample: pad by repeating
            cents = np.vstack([cents] * (ksub // kk + 1))[:ksub]
        books[s] = cents
    return books


# --- shared PQ machinery (pq_topk, ivfpq_topk, build/query_pq_index) ----

_PQ_CAND_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("approx_sim", DoubleType()),
    ]
)


def _pq_train_sample(corpus, vec_col, id_col, train_size, m):
    """Deterministic hash-ordered training sample as a normalized
    matrix (TakeOrdered plan — no full sort); validates dim % m."""
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(train_size)
    )
    _, s_mat = normalized_matrix(sample, vec_col, id_col)
    dim = s_mat.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return s_mat, dim


def _normalize_rows(v: "np.ndarray") -> "np.ndarray":
    nrm = np.linalg.norm(v, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    return v / nrm


def _pq_assign_codes(v: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """(n, m) int16 sub-codes: per subspace, nearest codebook entry."""
    m = books.shape[0]
    dsub = books.shape[2]
    codes = np.empty((len(v), m), dtype=np.int16)
    for s in range(m):
        sub = v[:, s * dsub : (s + 1) * dsub]
        # same GEMM expansion as _pq_train_codebooks (round 10): the
        # broadcast-subtract form is an n x ksub x dsub temp per
        # subspace — at ksub=256 it dominated corpus encoding
        bk = books[s]
        d2 = (
            (sub * sub).sum(axis=1)[:, None]
            - 2.0 * (sub @ bk.T)
            + (bk * bk).sum(axis=1)[None, :]
        )
        codes[:, s] = np.argmin(d2, axis=1).astype(np.int16)
    return codes


def _pq_encode_frame(corpus, vec_col, id_col, books, cluster_centroids=None):
    """Map-only corpus encoding: (neighbor_id, codes) — plus a
    ``cluster`` column when coarse centroids are given (IVF-PQ). Codes
    stay executor-side; this is the ~32x compression pass."""
    from pyspark.sql.types import ArrayType, ShortType

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((books, cluster_centroids))
    fields = [StructField("neighbor_id", LongType())]
    if cluster_centroids is not None:
        fields.append(StructField("cluster", IntegerType()))
    fields.append(StructField("codes", ArrayType(ShortType())))
    enc_schema = StructType(fields)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bks, cents = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = _normalize_rows(
                np.array(pdf[vec_col].tolist(), dtype=np.float64)
            )
            out = {"neighbor_id": pdf[id_col].to_numpy(dtype=np.int64)}
            if cents is not None:
                out["cluster"] = np.argmax(v @ cents.T, axis=1).astype(
                    np.int32
                )
            out["codes"] = list(_pq_assign_codes(v, bks))
            yield pd.DataFrame(out)

    # NOTE: deliberately NO fanout here — pq_topk's downstream ADC
    # scan pays a per-task LUT/init cost, and fanning its code table
    # to 2x cores regressed ann_pq 2.2x same-day (A/B in PLANS.md);
    # ivfpq_topk fans out its corpus at the call site instead, where
    # the cluster equi-join absorbs the partitioning.
    return corpus.select(id_col, vec_col).mapInPandas(encode, enc_schema)


def _pq_luts(p_mat: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """ADC lookup tables (nq, m, ksub): LUT[q, s, c] = <q_sub_s,
    codebook_s_c> — summing the per-subspace inner products of the
    normalized halves approximates the cosine."""
    m, dsub = books.shape[0], books.shape[2]
    return np.stack(
        [p_mat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m)],
        axis=1,
    )


def _adc_candidates(code_table, p_ids, luts, cand_per_probe):
    """ADC scan of a (neighbor_id, codes) table against broadcast
    probe LUTs: per-Arrow-batch top-``cand_per_probe`` per probe, then
    a global window merge — only ~nq * cand_per_probe rows per
    partition ever shuffle. Returns (query_id, neighbor_id)."""
    m = luts.shape[1]
    spark = code_table.sparkSession
    bc_luts = spark.sparkContext.broadcast((p_ids, luts))

    def adc_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, tables = bc_luts.value  # (nq,), (nq, m, ksub)
        per_s = tables.transpose(1, 2, 0)  # (m, ksub, nq)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            scores = per_s[0][codes[:, 0]]  # (n, nq)
            for s in range(1, m):
                scores = scores + per_s[s][codes[:, s]]
            scores[nids[:, None] == qids[None, :]] = -np.inf  # self-match
            cc = min(cand_per_probe, scores.shape[0])
            sel = np.argpartition(-scores, cc - 1, axis=0)[:cc]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                rows = sel[:, qi]
                sc = scores[rows, qi]
                keep = np.isfinite(sc)
                out_q.extend([qids[qi]] * int(keep.sum()))
                out_n.extend(nids[rows[keep]])
                out_s.extend(sc[keep])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype=np.int64),
                    "neighbor_id": np.array(out_n, dtype=np.int64),
                    "approx_sim": np.array(out_s, dtype=np.float64),
                }
            )

    local_cands = code_table.mapInPandas(adc_scan, _PQ_CAND_SCHEMA)
    win_a = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local_cands.withColumn("__r", F.row_number().over(win_a))
        .filter(F.col("__r") <= cand_per_probe)
        .select("query_id", "neighbor_id")
    )


def _exact_rerank(probes, corpus, vec_col, id_col, cands, k):
    """Exact cosine re-rank of a tiny candidate set: candidates and
    probe vectors broadcast into hash joins against the live corpus;
    final top-k via per-query window (sim desc, id asc ties)."""
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    qvecs = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    rescored = (
        cvecs.join(F.broadcast(cands), on="neighbor_id")
        .join(F.broadcast(qvecs), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias(
                "cosine_sim"
            ),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cosine_sim"), 6).alias("cosine_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    train_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via PRODUCT QUANTIZATION with
    asymmetric distance computation (ADC, Jégou et al. 2011) and exact
    re-ranking: each row-normalized corpus vector is compressed to
    ``m`` sub-codes (one byte-ish code per ``dim/m``-dim subspace,
    codebooks trained by seeded per-subspace k-means on a deterministic
    hash-ordered sample), probes score the COMPRESSED corpus through
    per-probe lookup tables, and the top ``k*refine`` approximate
    candidates are re-ranked with exact cosine.

    Scale shape — the corpus NEVER leaves the executors:
    - codebook training touches only a ``train_size`` TakeOrdered
      sample (driver-side k-means on <=2048 x dim floats);
    - encoding is a map-only ``mapInPandas`` pass emitting (id, codes)
      at ~``m`` small-ints per vector — a 64-dim float vector shrinks
      ~32x, which is the whole point: the code table for 10^9 vectors
      is ~8 GB where the raw vectors are ~256 GB;
    - the ADC scan broadcasts only the PROBE lookup tables
      (nq x m x ksub doubles — ~10 MB for 10k probes) and streams the
      code table, keeping a per-batch top-``k*refine`` per probe, so
      only ~nq * k * refine candidate rows per partition ever shuffle;
    - re-ranking hash-joins the candidate ids back to the corpus
      (candidates broadcast — they are tiny) for exact cosine.
    The probe side is collected to build LUTs — in search workloads
    probes are the small side; recall is gated in tests against
    :func:`brute_force_topk`."""
    s_mat, _ = _pq_train_sample(corpus, vec_col, id_col, train_size, m)
    books = _pq_train_codebooks(s_mat, m, ksub, kmeans_iters, seed)
    code_table = _pq_encode_frame(corpus, vec_col, id_col, books)
    p_ids, p_mat = normalized_matrix(probes, vec_col, id_col)
    cands = _adc_candidates(
        code_table, p_ids, _pq_luts(p_mat, books), k * refine
    )
    return _exact_rerank(probes, corpus, vec_col, id_col, cands, k)


def ivfpq_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    train_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: the composed billion-scale ANN index (FAISS's default
    architecture) — coarse k-means cluster pruning (only ``n_probe``
    of ``n_clusters`` inverted lists are scanned per probe) OVER
    product-quantized codes (ADC scoring against ~32x-compressed
    vectors) WITH exact cosine re-ranking of the survivors.

    Scale shape: training touches a TakeOrdered hash-sample (driver
    k-means, <= ``train_size`` rows); corpus encoding is one map-only
    pass emitting (id, cluster, codes); the scan is an equi-join of
    the code table against a BROADCAST (query, cluster) probe list —
    so each corpus row is touched only by the probes that selected its
    cluster (expected fan-out nq * n_probe / n_clusters per row, a
    ~4x I/O cut at the defaults and arbitrarily larger with more
    clusters) — scored through broadcast LUTs in an Arrow-batched
    UDF, top-``k*refine`` per probe via window, then the tiny
    candidate set re-ranks with exact cosine. The corpus never
    reaches the driver."""
    spark = probes.sparkSession
    s_mat, _ = _pq_train_sample(corpus, vec_col, id_col, train_size, m)
    n_s = s_mat.shape[0]
    # coarse centroids: seeded Lloyd on the normalized sample
    ncl = min(n_clusters, max(1, n_s))
    rng = np.random.default_rng(seed)
    cents = s_mat[rng.choice(n_s, size=ncl, replace=False)].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(s_mat @ cents.T, axis=1)
        for c in range(ncl):
            members = s_mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    books = _pq_train_codebooks(s_mat, m, ksub, kmeans_iters, seed + 1)
    # fan out the (single-file, 1-partition at bench scale) corpus
    # scan before the Arrow encode pass — otherwise the whole
    # normalize + assign + PQ-code pass runs as ONE task fused into
    # the scan stage (measured 1.76 s serial inside ann_ivfpq; A/B in
    # PLANS.md); no-op at real scan widths (guide §2.5). Applied here
    # and not inside _pq_encode_frame: the flat-scan pq_topk path
    # regresses under the same fanout (per-task ADC init).
    from .dedup import _fanout

    code_table = _pq_encode_frame(
        _fanout(corpus.select(id_col, vec_col)),
        vec_col,
        id_col,
        books,
        cluster_centroids=cents,
    )

    # probe side: LUTs + probed-cluster list (both tiny, broadcast)
    p_ids, p_mat = normalized_matrix(probes, vec_col, id_col)
    luts = _pq_luts(p_mat, books)
    npb = min(n_probe, ncl)
    probe_cl = np.argpartition(-(p_mat @ cents.T), npb - 1, axis=1)[:, :npb]
    probe_rows = [
        (int(p_ids[i]), int(c)) for i in range(len(p_ids)) for c in probe_cl[i]
    ]
    probe_df = F.broadcast(
        spark.createDataFrame(probe_rows, ["query_id", "cluster"])
    )
    qidx = {int(q): i for i, q in enumerate(p_ids)}
    bc_score = spark.sparkContext.broadcast((qidx, luts))
    m_ = m

    @F.pandas_udf(DoubleType())
    def adc(query_id: pd.Series, codes: pd.Series) -> pd.Series:
        qmap, tables = bc_score.value
        qi = query_id.map(qmap).to_numpy(dtype=np.int64)
        cd = np.array(codes.tolist(), dtype=np.int64)
        sc = tables[qi[:, None], np.arange(m_)[None, :], cd].sum(axis=1)
        return pd.Series(sc)

    cands = (
        code_table.join(probe_df, on="cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("approx_sim", adc("query_id", "codes"))
    )
    win_a = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    top_cands = (
        cands.withColumn("__r", F.row_number().over(win_a))
        .filter(F.col("__r") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(probes, corpus, vec_col, id_col, top_cands, k)


def build_pq_index(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    m: int = 8,
    ksub: int = 16,
    train_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
) -> None:
    """Build a DURABLE product-quantization index: train codebooks on
    a deterministic hash-sample, encode the corpus map-only, and write
    (a) the code table as parquet and (b) the codebooks + params as a
    one-row JSON sidecar. Building once amortizes the encode pass over
    every later query batch — the index for 10^9 64-dim vectors is
    ~8 GB of parquet instead of 256 GB of floats, and rebuilding is
    only needed when the corpus changes."""
    import json as _json

    spark = corpus.sparkSession
    s_mat, dim = _pq_train_sample(corpus, vec_col, id_col, train_size, m)
    books = _pq_train_codebooks(s_mat, m, ksub, kmeans_iters, seed)
    _pq_encode_frame(corpus, vec_col, id_col, books).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    meta = {"m": m, "ksub": ksub, "dim": dim, "books": books.tolist()}
    spark.createDataFrame(
        [(_json.dumps(meta),)], ["meta_json"]
    ).coalesce(1).write.mode("overwrite").json(f"{path}/meta")


def query_pq_index(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    k: int = 5,
    refine: int = 4,
) -> DataFrame:
    """Query a :func:`build_pq_index` index: ADC scan of the persisted
    code table (probe LUTs broadcast; per-batch top-k*refine), exact
    re-rank against the live corpus vectors. The encode pass is NOT
    re-paid — only the ~m-bytes-per-vector code parquet is scanned."""
    import json as _json

    spark = probes.sparkSession
    meta = _json.loads(
        spark.read.json(f"{path}/meta").collect()[0]["meta_json"]
    )
    books = np.array(meta["books"], dtype=np.float64)
    code_table = spark.read.parquet(f"{path}/codes")
    p_ids, p_mat = normalized_matrix(probes, vec_col, id_col)
    cands = _adc_candidates(
        code_table, p_ids, _pq_luts(p_mat, books), k * refine
    )
    return _exact_rerank(probes, corpus, vec_col, id_col, cands, k)


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    eps: float = 1e-9,
    dense_vocab_cap: int = 2048,
) -> DataFrame:
    """EXACT all-pairs TF-IDF cosine similarity self-join (Bayardo,
    Ma & Srikant's AllPairs, WWW 2007) — the sparse-vector sibling of
    the dense-embedding dedup and the n-gram Jaccard SSJoin: every
    document pair (i < j) whose L2-normalized tf-idf vectors have
    dot product >= ``threshold``, with no quadratic stage.

    Model spec (replayed verbatim by the DuckDB oracle):
    tf = within-doc token count; idf = ln(N / df); w = tf * idf;
    v = w / ||w||; docs with zero norm (every token in every doc)
    are excluded.

    Prefix filter, suffix-norm form: order each doc's terms by
    (corpus df ASC, term ASC) — rarest first — and index a term only
    while the REMAINING suffix norm-squared exceeds t - eps. If a
    pair shares no indexed term, every shared term lies in both
    suffixes, so dot <= ||suf_x|| * ||suf_y|| <= t - eps < t: the
    filter provably loses nothing. Because indexed terms are the
    rarest, posting lists stay short and skew-safe — frequent terms
    never become join keys (same argument as
    `dedup.prefix_filter_jaccard_pairs`).

    Plan shape: tokenize/tf agg -> df agg -> per-doc window cumsum
    (keyed by doc, distributed) -> index⋈postings equi-join on term
    -> pair distinct -> verify join (shared terms only) -> threshold.
    All shuffles are linear-volume hash equi-joins; the one driver
    scalar is the corpus doc count (planner-style).
    """
    from pyspark.sql import Window

    from ..functions.text import tokens

    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t"))
        .where(F.col(id_col).isNotNull())
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .localCheckpoint(eager=True)
    )
    n_docs = tf.select(id_col).distinct().count()
    dft = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    n_vocab = dft.count()
    if n_vocab <= dense_vocab_cap and n_vocab > 0:
        # DEGENERATE-VOCAB CROSSOVER (planner-chosen, like the vector
        # family's broadcast <-> blocked switch): a tiny vocabulary is
        # the prefix filter's worst case — with ~30 corpus-wide terms
        # nearly every pair shares an indexed term (measured at sf0.1:
        # 12.1M candidates out of 12.5M possible, 42.6 s). Densify to
        # |vocab|-dim tf-idf vectors instead and reuse the exact BLAS
        # GEMM pair scan (same results, 31 mults/pair in one codegen'd
        # batch kernel; 42.6 -> ~4 s). Real Zipfian vocabs blow past
        # the cap and take the sparse AllPairs path below, where the
        # rarest-first prefix filter is sharp.
        return _dense_tfidf_pairs(tf, dft, id_col, n_docs, n_vocab, threshold)
    w = tf.join(dft, "__t").select(
        id_col,
        "__t",
        "__df",
        (F.col("__tf") * F.log(F.lit(float(n_docs)) / F.col("__df"))).alias(
            "__w"
        ),
    )
    nrm = (
        w.groupBy(id_col)
        .agg(F.sum(F.col("__w") * F.col("__w")).alias("__ss"))
        .where(F.col("__ss") > 0)
        .select(id_col, F.sqrt("__ss").alias("__nv"))
    )
    v = (
        w.join(nrm, id_col)
        .select(
            id_col, "__t", "__df", (F.col("__w") / F.col("__nv")).alias("__vw")
        )
        .localCheckpoint(eager=True)
    )
    t_eff = float(threshold) - eps
    win = (
        Window.partitionBy(id_col)
        .orderBy(F.col("__df").asc(), F.col("__t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    csum = F.sum(F.col("__vw") * F.col("__vw")).over(win)
    index = (
        v.withColumn("__pre", csum - F.col("__vw") * F.col("__vw"))
        .where(F.lit(1.0) - F.col("__pre") > F.lit(t_eff))
        .select(F.col(id_col).alias("__xi"), "__t")
    )
    probe = v.select(F.col(id_col).alias("__yi"), "__t")
    cand = (
        index.join(probe, "__t")
        .where(F.col("__xi") != F.col("__yi"))
        .select(
            F.least("__xi", "__yi").alias("left_id"),
            F.greatest("__xi", "__yi").alias("right_id"),
        )
        .distinct()
    )
    vx = v.select(
        F.col(id_col).alias("left_id"), "__t", F.col("__vw").alias("__xw")
    )
    vy = v.select(
        F.col(id_col).alias("right_id"), "__t", F.col("__vw").alias("__yw")
    )
    return (
        cand.join(vx, "left_id")
        .join(vy, ["right_id", "__t"])
        .groupBy("left_id", "right_id")
        .agg(F.sum(F.col("__xw") * F.col("__yw")).alias("__cos"))
        .where(F.col("__cos") >= F.lit(float(threshold)))
        .select(
            "left_id",
            "right_id",
            F.round("__cos", 6).alias("cosine_sim"),
        )
    )


def _dense_tfidf_pairs(tf, dft, id_col, n_docs, n_vocab, threshold):
    """Small-vocab arm of :func:`tfidf_cosine_pairs`: dense tf-idf
    vectors fed to the exact GEMM pair scan. Zero-norm docs produce
    all-zero vectors whose cosine is 0 — excluded by any positive
    threshold, matching the sparse arm's explicit norm filter.

    Term slots: this arm only runs when the vocabulary is at most
    ``dense_vocab_cap`` (<= 2048) terms, so the slot assignment is a
    BOUNDED driver collect + broadcast join — sorted-position slots,
    identical to the dense rank it replaces, without the range
    repartition + sort + checkpoint + Arrow rank pass the distributed
    primitive pays (round-12; the caller has already counted the
    vocabulary, so the bound is enforced before this runs)."""
    spark = tf.sparkSession
    terms = sorted(r["__t"] for r in dft.select("__t").collect())
    slot_map = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "__t string, __slot long"
    )
    ranked = slot_map.join(dft, "__t")
    w = tf.join(F.broadcast(ranked), "__t").select(
        F.col(id_col),
        F.col("__slot").cast("int").alias("__slot"),
        (F.col("__tf") * F.log(F.lit(float(n_docs)) / F.col("__df"))).alias(
            "__w"
        ),
    )
    entries = w.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__slot", "__w"))
        ).alias("__m")
    )
    # embedding_dedup_pairs evaluates its input up to three times
    # (planner stats aggregate, matrix collect, scoring scan) — the
    # join + groupBy + densify lineage re-ran per consumer (round-12
    # profile: two extra 8 s-exec passes). Checkpoint the bounded
    # dense frame once, and skip the stats pass entirely: this arm
    # already KNOWS the row count (n_docs) and dimension (n_vocab).
    from ..plans.planner import choose_vector_blocks

    vec = entries.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(int(n_vocab) - 1)),
            lambda i: F.coalesce(F.element_at("__m", i.cast("int")), F.lit(0.0)),
        ).alias("__vec"),
    ).localCheckpoint(eager=True)
    from .dedup import embedding_dedup_pairs

    out = embedding_dedup_pairs(
        vec,
        "__vec",
        id_col,
        threshold=float(threshold),
        n_blocks=choose_vector_blocks(n_docs, n_vocab),
    )
    return out.select(
        "left_id", "right_id", F.round("cosine_sim", 6).alias("cosine_sim")
    )


def ivfpq_recommended_params(n_corpus: int, k: int = 5) -> dict:
    """Corpus-size-scaled IVF-PQ parameters (round 11, VERDICT r10
    #8). The 10x-corpus probe (scripts/probe_ivfpq_scale.py, PLANS.md
    round 11) measured recall@5 on an UNSTRUCTURED 20K-vector corpus
    collapsing from the gate's 0.85 to 0.40-0.58 when the gate-scale
    constants (n_probe=10, refine=12) were reused verbatim; the sweep
    recovered 0.88-0.96 with refine grown proportionally to the
    corpus (~0.6% of N — PQ distance-order noise is what loses
    neighbors on unstructured data, exact re-ranking depth is the
    lever) and n_probe at >= 60% of the cluster count. This helper
    encodes that measured law:

        n_clusters ~ sqrt(N) / 3   (inverted-list granularity)
        n_probe    = max(10, 60% of n_clusters)
        refine     = max(4k, 0.6% of N)

    At 100 TB the same law holds per-shard: refine is a per-probe
    candidate depth (driver never sees the corpus), so its linear
    growth in N is paid inside the Arrow-batched scan, not in data
    motion."""
    import math

    n_clusters = max(4, int(math.sqrt(max(n_corpus, 1)) / 3))
    return {
        "n_clusters": n_clusters,
        "n_probe": max(10, (n_clusters * 3) // 5),
        "refine": max(4 * k, int(0.006 * n_corpus) + 1),
        "ksub": 256,
        "m": 8,
    }


def ivfpq_auto_topk(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """`ivfpq_topk` with the corpus-size-scaled parameters from
    :func:`ivfpq_recommended_params` (one corpus count, then the
    standard index build)."""
    params = ivfpq_recommended_params(corpus.count(), k)
    return ivfpq_topk(
        probes, corpus, vec_col, id_col, k=k, seed=seed, **params
    )
