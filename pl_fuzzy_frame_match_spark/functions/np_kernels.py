"""Batch-vectorized (numpy) string-distance kernels.

The per-row Python DP kernels in :mod:`py_kernels` are exact but pay
interpreter cost per character pair — the round's biggest throughput
gap vs the reference's Rust plugin kernels
(/root/reference/pl_fuzzy_frame_match/process.py:46-50). These
implementations process a whole Arrow batch of string pairs as padded
uint32 codepoint matrices: Python-level loops run only over *character
positions* (bounded by the longest string in the batch), every
per-pair operation is a numpy array op over the batch dimension. For
typical fuzzy-name workloads (10-40 chars) that turns ~O(rows * len^2)
interpreted steps into ~O(len^2) vector ops of width ``rows``.

Semantics are pinned to :mod:`py_kernels` (property-tested for exact
equality) — same normalization, same tie handling, same null contract
(nulls handled by the caller).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

# Padding sentinel: above the unicode codepoint range, never equal to a
# real character — padded positions can't produce spurious matches.
_PAD = np.uint32(0x7FFFFFFF)


def codepoint_matrix(strings: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    """Encode a batch of strings as a padded (N, Lmax) uint32 codepoint
    matrix + a length vector. One ``str.join`` + one UTF-32 encode for
    the whole batch — no per-character Python."""
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    lmax = int(lens.max()) if n else 0
    mat = np.full((n, max(lmax, 1)), _PAD, dtype=np.uint32)
    if lmax:
        flat = np.frombuffer(
            "".join(strings).encode("utf-32-le"), dtype=np.uint32
        )
        mask = np.arange(lmax)[None, :] < lens[:, None]
        if mat.shape[1] > lmax:
            mat[:, :lmax][mask] = flat
        else:
            mat[mask] = flat
    return mat, lens


def jaro_batch(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    """Jaro similarity for N string pairs, vectorized over the batch.

    Greedy window matching identical to :func:`py_kernels.jaro_sim`:
    the (i, j) double loop runs over character positions (python), the
    candidate test + flag updates are batch-wide numpy ops.
    """
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A, la = codepoint_matrix(a)
    B, lb = codepoint_matrix(b)
    l1max, l2max = A.shape[1], B.shape[1]

    window = np.maximum(la, lb) // 2 - 1
    np.clip(window, 0, None, out=window)

    m1 = np.zeros((n, l1max), dtype=bool)
    m2 = np.zeros((n, l2max), dtype=bool)
    for i in range(l1max):
        active = la > i
        if not active.any():
            break
        lo = np.maximum(0, i - window)
        hi = np.minimum(lb, i + window + 1)
        found = ~active
        ci = A[:, i]
        jlo, jhi = int(lo.min()), int(hi.max())
        for j in range(jlo, min(jhi, l2max)):
            cand = (
                ~found
                & (j >= lo)
                & (j < hi)
                & ~m2[:, j]
                & (B[:, j] == ci)
            )
            if cand.any():
                m2[cand, j] = True
                m1[cand, i] = True
                found |= cand

    matches = m1.sum(axis=1)

    # Transpositions: gather matched chars of each side in index order
    # into slot-aligned matrices, then count positionwise mismatches.
    kmax = int(matches.max()) if n else 0
    t = np.zeros(n, dtype=np.int64)
    if kmax:
        M1 = np.full((n, kmax), _PAD, dtype=np.uint32)
        M2 = np.full((n, kmax), _PAD, dtype=np.uint32)
        slot1 = np.cumsum(m1, axis=1) - 1
        slot2 = np.cumsum(m2, axis=1) - 1
        r1, c1 = np.nonzero(m1)
        M1[r1, slot1[r1, c1]] = A[r1, c1]
        r2, c2 = np.nonzero(m2)
        M2[r2, slot2[r2, c2]] = B[r2, c2]
        t = ((M1 != M2) & (np.arange(kmax)[None, :] < matches[:, None])).sum(
            axis=1
        ) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        mf = matches.astype(np.float64)
        sim = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    sim = np.where(matches == 0, 0.0, sim)
    # exact equality (incl. both-empty) -> 1.0, one-side-empty -> 0.0,
    # matching py_kernels' short-circuits. Equal-length pairs fit inside
    # the common matrix width (la == lb <= min(l1max, l2max)), so the
    # truncated comparison is exact.
    w = min(l1max, l2max)
    eq = (la == lb) & (A[:, :w] == B[:, :w]).all(axis=1)
    sim = np.where(eq, 1.0, sim)
    sim = np.where((la == 0) ^ (lb == 0), 0.0, sim)
    return sim


def jaro_winkler_batch(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    """Jaro-Winkler: prefix boost p=0.1, prefix <= 4, only when
    jaro > 0.7 (same constants as py_kernels / DuckDB)."""
    j = jaro_batch(a, b)
    if len(j) == 0:
        return j
    A, la = codepoint_matrix(a)
    B, lb = codepoint_matrix(b)
    pmax = min(4, A.shape[1], B.shape[1])
    if pmax == 0:
        return j
    eq = A[:, :pmax] == B[:, :pmax]
    # prefix length = index of first mismatch (cumprod of equality)
    prefix = np.cumprod(eq, axis=1).sum(axis=1)
    boosted = j + prefix * 0.1 * (1.0 - j)
    return np.where(j > 0.7, boosted, j)


def hamming_norm_batch(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    """Normalized Hamming with implicit padding — positionwise
    mismatches + length difference, over max length (py_kernels
    semantics)."""
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A, la = codepoint_matrix(a)
    B, lb = codepoint_matrix(b)
    lmin = min(A.shape[1], B.shape[1])
    common = np.minimum(la, lb)
    pos = np.arange(lmin)[None, :]
    mism = ((A[:, :lmin] != B[:, :lmin]) & (pos < common[:, None])).sum(axis=1)
    m = np.maximum(la, lb)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = (mism + np.abs(la - lb)) / m
    return np.where(m == 0, 0.0, d)


def indel_norm_batch(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    """Normalized indel distance (l1 + l2 - 2*LCS) / (l1 + l2),
    vectorized over the batch with a rowwise LCS DP: the i-loop runs in
    Python, the j-recurrence ``cur[j] = max(cur[j-1], prev[j])`` is
    resolved with a running maximum (``np.maximum.accumulate``) over a
    candidate row, which keeps every step a batch-wide vector op."""
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A, la = codepoint_matrix(a)
    B, lb = codepoint_matrix(b)
    l1max, l2max = A.shape[1], B.shape[1]

    prev = np.zeros((n, l2max + 1), dtype=np.int32)
    for i in range(l1max):
        active = la > i
        if not active.any():
            break
        # candidate from the diagonal: prev[j-1] + (A[i] == B[j-1])
        eq = (B == A[:, i][:, None]) & active[:, None]
        cand = prev[:, :-1] + eq.astype(np.int32)
        cur = np.maximum(prev[:, 1:], cand)
        # cur[j] = max(cur[j], cur[j-1]) — LCS rows are non-decreasing,
        # so the j-1 dependency collapses to a running max.
        np.maximum.accumulate(cur, axis=1, out=cur)
        prev[:, 1:] = np.where(active[:, None], cur, prev[:, 1:])

    # LCS(s1, s2) = prev[lb] (the DP row is over full padded width; take
    # each pair's own length position)
    lcs = prev[np.arange(n), lb]
    tot = la + lb
    with np.errstate(divide="ignore", invalid="ignore"):
        d = (tot - 2 * lcs) / tot
    return np.where(tot == 0, 0.0, d)


# metric -> batch kernel over (list[str], list[str]) -> np.ndarray
BATCH_DISTANCE = {
    "jaro": lambda a, b: 1.0 - jaro_batch(a, b),
    "jaro_winkler": lambda a, b: 1.0 - jaro_winkler_batch(a, b),
    "hamming": hamming_norm_batch,
    "indel": indel_norm_batch,
}
