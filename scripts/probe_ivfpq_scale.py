"""IVF-PQ recall + latency at a 10x corpus (VERDICT r10 #8).

The 0.85 recall gate passed at the sf0.01 probe scale (500 vectors)
and the bench corpus (2,000). This probe re-measures recall@5 and
probe wall on a 10x corpus that PRESERVES the gate corpus's
adversarial regime — near-unstructured 64-dim vectors: reps 1..9 are
column-wise independent permutations of the base matrix (identical
marginal distribution per dimension, correlations destroyed, no
near-duplicate crutch; md5-seeded, so the corpus is deterministic).
Measured at the gate parameterization and a sqrt(N)-scaled cluster
count. (A near-duplicate 5%-noise amplification was measured first
and rejected: every probe's replicas dominate its top-5 and recall
reads a trivial 1.0.)

Run: python scripts/probe_ivfpq_scale.py
One JSON line per configuration; paste into PLANS.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 10
K = 5
N_PROBES = 50


def amplified_corpus(spark):
    base = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
    )
    mats = []
    ids = []
    base_mat = np.stack(base["embedding"].to_numpy())
    scale = 0.05 * float(np.abs(base_mat).mean())
    n, d = base_mat.shape
    del scale
    for rep in range(REPS):
        if rep == 0:
            mats.append(base_mat)
        else:
            # fresh unstructured vectors with the SAME per-dimension
            # marginals: independently permute each column
            # (md5-seeded -> deterministic across runs/machines)
            seed = int.from_bytes(
                hashlib.md5(f"ivfpq:{rep}".encode()).digest()[:4], "big"
            )
            rng = np.random.default_rng(seed)
            shuf = np.empty_like(base_mat)
            for j in range(d):
                shuf[:, j] = base_mat[rng.permutation(n), j]
            mats.append(shuf)
        ids.append(base["vec_id"].to_numpy() + rep * 1_000_000)
    mat = np.concatenate(mats).astype(np.float32)
    vid = np.concatenate(ids)
    pdf = pd.DataFrame(
        {"vec_id": vid, "embedding": [r for r in mat]}
    )
    return spark.createDataFrame(pdf)


def measure(spark, corpus, n_vectors, n_clusters):
    from pyspark.sql import functions as F

    from pl_fuzzy_frame_match_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    probes = corpus.filter(F.col("vec_id") < N_PROBES)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            probes, corpus, "embedding", "vec_id", k=K
        ).collect()
    }
    t0 = time.perf_counter()
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            probes, corpus, "embedding", "vec_id", k=K,
            n_clusters=n_clusters, n_probe=10, m=8, ksub=256, refine=12,
        ).collect()
    }
    wall = time.perf_counter() - t0
    return {
        "corpus": n_vectors,
        "n_clusters": n_clusters,
        "recall_at_5": round(len(exact & got) / len(exact), 4),
        "ivfpq_wall_sec": round(wall, 2),
    }


def main() -> None:
    from pl_fuzzy_frame_match_spark.session import get_spark

    spark = get_spark("probe_ivfpq_scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    big = amplified_corpus(spark).localCheckpoint(eager=True)
    n_big = big.count()
    # gate parameterization at the base corpus, then the 10x corpus at
    # both the same clustering and the sqrt(N)-scaled one
    print(json.dumps(measure(spark, base, n_base, 16)), flush=True)
    print(json.dumps(measure(spark, big, n_big, 16)), flush=True)
    print(json.dumps(measure(spark, big, n_big, 50)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
