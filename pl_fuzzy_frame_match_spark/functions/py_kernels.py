"""Pure-Python string-distance kernels (normalized to [0, 1]).

Semantics mirror the reference's Rust plugin ``polars-distance``
(/root/reference/pl_fuzzy_frame_match/process.py:46-50): every kernel
returns a normalized *distance*; the engine flips to similarity with
``1 - d``. Numeric definitions are pinned against DuckDB's
levenshtein / jaro_similarity / jaro_winkler_similarity /
damerau_levenshtein / hamming so the correctness oracle can replay them
in SQL, and against the reference's golden floats (e.g. jaro_winkler
0.88 for "apple inc." / "apple incorporated").

These run inside Arrow-batched pandas UDFs on executors — no Spark
imports here so they stay unit-testable and cheaply picklable.
"""

from __future__ import annotations


def levenshtein_dist(s1: str, s2: str) -> int:
    """Unnormalized Levenshtein edit distance (iterative two-row DP)."""
    if s1 == s2:
        return 0
    l1, l2 = len(s1), len(s2)
    if l1 == 0:
        return l2
    if l2 == 0:
        return l1
    if l1 > l2:
        s1, s2, l1, l2 = s2, s1, l2, l1
    prev = list(range(l1 + 1))
    for j in range(1, l2 + 1):
        c2 = s2[j - 1]
        cur = [j] + [0] * l1
        for i in range(1, l1 + 1):
            cost = 0 if s1[i - 1] == c2 else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev = cur
    return prev[l1]


def levenshtein_norm(s1: str, s2: str) -> float:
    m = max(len(s1), len(s2))
    return levenshtein_dist(s1, s2) / m if m else 0.0


def jaro_sim(s1: str, s2: str) -> float:
    """Standard Jaro similarity (matches DuckDB jaro_similarity for
    non-empty inputs; two equal strings -> 1.0)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched chars in order
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler_sim(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity: prefix boost p=0.1, prefix <= 4, applied
    only when jaro > 0.7 (the classic boost threshold — DuckDB and the
    reference's golden values both use it)."""
    j = jaro_sim(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def damerau_levenshtein_dist(s1: str, s2: str) -> int:
    """Full (unrestricted) Damerau-Levenshtein distance — matches DuckDB
    damerau_levenshtein ('ca'->'abc' == 2, not OSA's 3)."""
    if s1 == s2:
        return 0
    l1, l2 = len(s1), len(s2)
    if l1 == 0:
        return l2
    if l2 == 0:
        return l1
    maxdist = l1 + l2
    last = {}
    # d has a border row/col at index 0 holding maxdist
    d = [[0] * (l2 + 2) for _ in range(l1 + 2)]
    d[0][0] = maxdist
    for i in range(l1 + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(l2 + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, l1 + 1):
        db = 0
        for j in range(1, l2 + 1):
            k = last.get(s2[j - 1], 0)
            m = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,          # substitute
                d[i + 1][j] + 1,         # insert
                d[i][j + 1] + 1,         # delete
                d[k][m] + (i - k - 1) + 1 + (j - m - 1),  # transpose
            )
        last[s1[i - 1]] = i
    return d[l1 + 1][l2 + 1]


def damerau_levenshtein_norm(s1: str, s2: str) -> float:
    m = max(len(s1), len(s2))
    return damerau_levenshtein_dist(s1, s2) / m if m else 0.0


def hamming_norm(s1: str, s2: str) -> float:
    """Normalized Hamming distance with implicit padding: positionwise
    mismatches plus the length difference, over max length. Equal-length
    inputs match DuckDB ``hamming(a,b)/length(a)``."""
    l1, l2 = len(s1), len(s2)
    m = max(l1, l2)
    if m == 0:
        return 0.0
    mism = sum(1 for a, b in zip(s1, s2) if a != b)
    return (mism + abs(l1 - l2)) / m


def _lcs_len(s1: str, s2: str) -> int:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0
    if l1 < l2:
        s1, s2, l1, l2 = s2, s1, l2, l1
    prev = [0] * (l2 + 1)
    for i in range(1, l1 + 1):
        c1 = s1[i - 1]
        cur = [0] * (l2 + 1)
        for j in range(1, l2 + 1):
            if c1 == s2[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return prev[l2]


def indel_norm(s1: str, s2: str) -> float:
    """Normalized insertion/deletion distance:
    (l1 + l2 - 2*LCS) / (l1 + l2) — rapidfuzz Indel.normalized_distance."""
    tot = len(s1) + len(s2)
    if tot == 0:
        return 0.0
    return (tot - 2 * _lcs_len(s1, s2)) / tot


# metric name -> normalized distance fn, for the pandas-UDF path
NORMALIZED_DISTANCE = {
    "levenshtein": levenshtein_norm,
    "jaro": lambda a, b: 1.0 - jaro_sim(a, b),
    "jaro_winkler": lambda a, b: 1.0 - jaro_winkler_sim(a, b),
    "hamming": hamming_norm,
    "damerau_levenshtein": damerau_levenshtein_norm,
    "indel": indel_norm,
}
