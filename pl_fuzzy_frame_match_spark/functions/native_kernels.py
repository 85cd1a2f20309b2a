"""Optional native (C, ctypes) batch string-distance kernels.

The reference delegates its hot scoring loop to Rust plugin kernels
(/root/reference/pl_fuzzy_frame_match/process.py:46-50 via
``polars-distance``). The Spark engine's equivalent FFI boundary is an
Arrow-batched pandas UDF; inside it, this module provides C kernels
compiled on first use with the system compiler (``cc``), called
through ``ctypes`` on flat uint32 codepoint buffers. When no toolchain
is available the engine transparently falls back to the numpy batch
kernels (:mod:`np_kernels`) and per-row Python (:mod:`py_kernels`) —
same pinned semantics, property-tested for exact equality.

Per-pair costs (25-char fuzzy-name workload): ~0.3-1 us native vs
~10 us numpy-batch vs ~15 us per-row Python — the native path brings
the non-levenshtein metrics within the same order as Spark's codegen'd
``levenshtein``.

The compiled .so is cached per source-hash in the process temp dir and
published with an atomic rename, so concurrent Python workers (32 on
local[32]; one compile per node on a cluster) never observe a partial
file.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---------- jaro / jaro-winkler ---------- */

static double jaro_one(const uint32_t *s1, int64_t l1,
                       const uint32_t *s2, int64_t l2,
                       uint8_t *f1, uint8_t *f2) {
    if (l1 == l2 && (l1 == 0 || memcmp(s1, s2, (size_t)l1 * 4) == 0))
        return 1.0;
    if (l1 == 0 || l2 == 0) return 0.0;
    int64_t maxl = l1 > l2 ? l1 : l2;
    int64_t window = maxl / 2 - 1;
    if (window < 0) window = 0;
    memset(f1, 0, (size_t)l1);
    memset(f2, 0, (size_t)l2);
    int64_t matches = 0;
    for (int64_t i = 0; i < l1; i++) {
        int64_t lo = i > window ? i - window : 0;
        int64_t hi = i + window + 1;
        if (hi > l2) hi = l2;
        for (int64_t j = lo; j < hi; j++) {
            if (!f2[j] && s2[j] == s1[i]) {
                f1[i] = 1; f2[j] = 1; matches++;
                break;
            }
        }
    }
    if (!matches) return 0.0;
    int64_t t = 0, j = 0;
    for (int64_t i = 0; i < l1; i++) {
        if (f1[i]) {
            while (!f2[j]) j++;
            if (s1[i] != s2[j]) t++;
            j++;
        }
    }
    t /= 2;
    double m = (double)matches;
    return (m / l1 + m / l2 + (m - t) / m) / 3.0;
}

static double jw_one(const uint32_t *s1, int64_t l1,
                     const uint32_t *s2, int64_t l2,
                     uint8_t *f1, uint8_t *f2) {
    double j = jaro_one(s1, l1, s2, l2, f1, f2);
    if (j <= 0.7) return j;
    int64_t pmax = l1 < l2 ? l1 : l2;
    if (pmax > 4) pmax = 4;
    int64_t prefix = 0;
    for (int64_t i = 0; i < pmax && s1[i] == s2[i]; i++) prefix++;
    return j + prefix * 0.1 * (1.0 - j);
}

/* ---------- damerau-levenshtein (full / unrestricted) ---------- */

/* open-addressing map: codepoint -> last row index in s1 */
typedef struct { uint32_t key; int64_t val; uint8_t used; } da_slot;

static int64_t da_get(da_slot *map, uint64_t mask, uint32_t key) {
    uint64_t h = ((uint64_t)key * 2654435761u) & mask;
    while (map[h].used) {
        if (map[h].key == key) return map[h].val;
        h = (h + 1) & mask;
    }
    return 0;
}

static void da_put(da_slot *map, uint64_t mask, uint32_t key, int64_t val) {
    uint64_t h = ((uint64_t)key * 2654435761u) & mask;
    while (map[h].used && map[h].key != key) h = (h + 1) & mask;
    map[h].key = key; map[h].val = val; map[h].used = 1;
}

static int64_t dl_one(const uint32_t *s1, int64_t l1,
                      const uint32_t *s2, int64_t l2,
                      int64_t *d, int64_t stride,
                      da_slot *map, uint64_t mask) {
    if (l1 == l2 && (l1 == 0 || memcmp(s1, s2, (size_t)l1 * 4) == 0))
        return 0;
    if (l1 == 0) return l2;
    if (l2 == 0) return l1;
    int64_t maxdist = l1 + l2;
    memset(map, 0, (size_t)(mask + 1) * sizeof(da_slot));
    /* d is (l1+2) x (l2+2), row-major with the given stride */
    d[0] = maxdist;
    for (int64_t i = 0; i <= l1; i++) {
        d[(i + 1) * stride + 0] = maxdist;
        d[(i + 1) * stride + 1] = i;
    }
    for (int64_t j = 0; j <= l2; j++) {
        d[0 * stride + j + 1] = maxdist;
        d[1 * stride + j + 1] = j;
    }
    for (int64_t i = 1; i <= l1; i++) {
        int64_t db = 0;
        for (int64_t j = 1; j <= l2; j++) {
            int64_t k = da_get(map, mask, s2[j - 1]);
            int64_t m = db;
            int64_t cost = 1;
            if (s1[i - 1] == s2[j - 1]) { cost = 0; db = j; }
            int64_t sub = d[i * stride + j] + cost;
            int64_t ins = d[(i + 1) * stride + j] + 1;
            int64_t del = d[i * stride + j + 1] + 1;
            int64_t tra = d[k * stride + m] + (i - k - 1) + 1 + (j - m - 1);
            int64_t best = sub;
            if (ins < best) best = ins;
            if (del < best) best = del;
            if (tra < best) best = tra;
            d[(i + 1) * stride + j + 1] = best;
        }
        da_put(map, mask, s1[i - 1], i);
    }
    return d[(l1 + 1) * stride + l2 + 1];
}

/* ---------- indel (LCS) ---------- */

static int64_t lcs_one(const uint32_t *s1, int64_t l1,
                       const uint32_t *s2, int64_t l2,
                       int64_t *prev, int64_t *cur) {
    if (l1 == 0 || l2 == 0) return 0;
    memset(prev, 0, (size_t)(l2 + 1) * sizeof(int64_t));
    for (int64_t i = 1; i <= l1; i++) {
        uint32_t c1 = s1[i - 1];
        cur[0] = 0;
        for (int64_t j = 1; j <= l2; j++) {
            if (c1 == s2[j - 1])
                cur[j] = prev[j - 1] + 1;
            else
                cur[j] = cur[j - 1] >= prev[j] ? cur[j - 1] : prev[j];
        }
        int64_t *tmp = prev; prev = cur; cur = tmp;
    }
    /* after the swap, 'prev' holds the last computed row */
    return prev[l2];
}

/* ---------- banded levenshtein ---------- */

static int64_t lev_banded(const uint32_t *s1, int64_t l1,
                          const uint32_t *s2, int64_t l2,
                          int64_t cap, int64_t *prev, int64_t *cur) {
    /* normalized-threshold pruning: returns the exact distance when
       <= cap, else -1. Two-row DP with an early exit when a whole row
       exceeds the cap. */
    if (l1 > l2) {
        const uint32_t *ts = s1; s1 = s2; s2 = ts;
        int64_t tl = l1; l1 = l2; l2 = tl;
    }
    if (l2 - l1 > cap) return -1;
    if (l1 == 0) return l2 <= cap ? l2 : -1;
    for (int64_t i = 0; i <= l1; i++) prev[i] = i;
    for (int64_t j = 1; j <= l2; j++) {
        uint32_t c2 = s2[j - 1];
        cur[0] = j;
        int64_t rowmin = j;
        for (int64_t i = 1; i <= l1; i++) {
            int64_t cost = s1[i - 1] == c2 ? 0 : 1;
            int64_t v = prev[i - 1] + cost;
            if (prev[i] + 1 < v) v = prev[i] + 1;
            if (cur[i - 1] + 1 < v) v = cur[i - 1] + 1;
            cur[i] = v;
            if (v < rowmin) rowmin = v;
        }
        if (rowmin > cap) return -1;
        int64_t *t = prev; prev = cur; cur = t;
    }
    return prev[l1] <= cap ? prev[l1] : -1;
}

/* ---------- Myers bit-parallel levenshtein ----------
   Myers (JACM 1999) in Hyyro's (2001) formulation: exact edit distance
   of a pattern of length <= 64 against a text, one word-op block per
   text char — no per-cell branches, ~2-3x the banded DP on the 18-25
   char fuzzy-name workload, and the dominant cost of the fused sketch
   scan's rescore stage. Returns the distance when <= cap, else -1
   (Ukkonen cut-off: the running score can drop by at most 1 per
   remaining text char). */

typedef struct { uint32_t key; uint32_t gen; uint64_t mask; } peq_slot;
#define PEQ_SLOTS 256
#define PEQ_MASK  (PEQ_SLOTS - 1)

static int64_t lev_myers(const uint32_t *s1, int64_t l1,
                         const uint32_t *s2, int64_t l2,
                         int64_t cap, peq_slot *peq, uint32_t gen) {
    /* caller guarantees 0 < l1 <= 64, l1 <= l2, l2 - l1 <= cap */
    for (int64_t i = 0; i < l1; i++) {
        uint32_t c = s1[i];
        size_t p = (size_t)((c * 0x9E3779B1u) & PEQ_MASK);
        while (peq[p].gen == gen && peq[p].key != c) p = (p + 1) & PEQ_MASK;
        if (peq[p].gen != gen) {
            peq[p].gen = gen; peq[p].key = c; peq[p].mask = 0;
        }
        peq[p].mask |= 1ULL << i;
    }
    uint64_t Pv = ~0ULL, Mv = 0;
    int64_t score = l1;
    uint64_t high = 1ULL << (l1 - 1);
    for (int64_t j = 0; j < l2; j++) {
        uint32_t c = s2[j];
        size_t p = (size_t)((c * 0x9E3779B1u) & PEQ_MASK);
        uint64_t Eq = 0;
        while (peq[p].gen == gen) {
            if (peq[p].key == c) { Eq = peq[p].mask; break; }
            p = (p + 1) & PEQ_MASK;
        }
        uint64_t Xv = Eq | Mv;
        uint64_t Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq;
        uint64_t Ph = Mv | ~(Xh | Pv);
        uint64_t Mh = Pv & Xh;
        if (Ph & high) score++;
        else if (Mh & high) score--;
        Ph = (Ph << 1) | 1ULL;
        Mh <<= 1;
        Pv = Mh | ~(Xv | Ph);
        Mv = Ph & Xv;
        if (score - (l2 - 1 - j) > cap) return -1;
    }
    return score <= cap ? score : -1;
}

/* dispatch: Myers when the shorter side fits one word, banded DP
   otherwise. gen-stamped Peq table means no per-call memset; the
   caller owns the generation counter and zeroes the table once. */
static int64_t lev_dist(const uint32_t *s1, int64_t l1,
                        const uint32_t *s2, int64_t l2,
                        int64_t cap, int64_t *prev, int64_t *cur,
                        peq_slot *peq, uint32_t *gen) {
    if (l1 > l2) {
        const uint32_t *ts = s1; s1 = s2; s2 = ts;
        int64_t tl = l1; l1 = l2; l2 = tl;
    }
    if (l2 - l1 > cap) return -1;
    if (l1 == 0) return l2 <= cap ? l2 : -1;
    if (l1 <= 64) {
        if (++(*gen) == 0) {            /* uint32 wrap: hard reset */
            memset(peq, 0, sizeof(peq_slot) * PEQ_SLOTS);
            *gen = 1;
        }
        return lev_myers(s1, l1, s2, l2, cap, peq, *gen);
    }
    return lev_banded(s1, l1, s2, l2, cap, prev, cur);
}

/* ---------- batch drivers ----------
   inputs: flat utf-32 codepoint buffers + (n+1) offset arrays.
   out: normalized DISTANCE in [0,1] (engine flips to similarity). */

static int64_t max_len(const int64_t *off, int64_t n) {
    int64_t m = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t l = off[i + 1] - off[i];
        if (l > m) m = l;
    }
    return m;
}

int batch_jaro(const uint32_t *fa, const int64_t *oa,
               const uint32_t *fb, const int64_t *ob,
               int64_t n, int winkler, double *out) {
    int64_t m1 = max_len(oa, n), m2 = max_len(ob, n);
    uint8_t *f1 = malloc((size_t)(m1 > 0 ? m1 : 1));
    uint8_t *f2 = malloc((size_t)(m2 > 0 ? m2 : 1));
    if (!f1 || !f2) { free(f1); free(f2); return -1; }
    for (int64_t i = 0; i < n; i++) {
        const uint32_t *s1 = fa + oa[i];
        const uint32_t *s2 = fb + ob[i];
        int64_t l1 = oa[i + 1] - oa[i], l2 = ob[i + 1] - ob[i];
        double s = winkler ? jw_one(s1, l1, s2, l2, f1, f2)
                           : jaro_one(s1, l1, s2, l2, f1, f2);
        out[i] = 1.0 - s;
    }
    free(f1); free(f2);
    return 0;
}

int batch_damerau(const uint32_t *fa, const int64_t *oa,
                  const uint32_t *fb, const int64_t *ob,
                  int64_t n, double *out) {
    int64_t m1 = max_len(oa, n), m2 = max_len(ob, n);
    int64_t stride = m2 + 2;
    int64_t *d = malloc((size_t)(m1 + 2) * (size_t)stride * sizeof(int64_t));
    uint64_t cap = 8;
    while (cap < (uint64_t)(2 * (m1 + m2) + 4)) cap <<= 1;
    da_slot *map = malloc((size_t)cap * sizeof(da_slot));
    if (!d || !map) { free(d); free(map); return -1; }
    for (int64_t i = 0; i < n; i++) {
        const uint32_t *s1 = fa + oa[i];
        const uint32_t *s2 = fb + ob[i];
        int64_t l1 = oa[i + 1] - oa[i], l2 = ob[i + 1] - ob[i];
        int64_t dist = dl_one(s1, l1, s2, l2, d, stride, map, cap - 1);
        int64_t ml = l1 > l2 ? l1 : l2;
        out[i] = ml ? (double)dist / (double)ml : 0.0;
    }
    free(d); free(map);
    return 0;
}

int batch_indel(const uint32_t *fa, const int64_t *oa,
                const uint32_t *fb, const int64_t *ob,
                int64_t n, double *out) {
    int64_t m2 = max_len(ob, n);
    int64_t *prev = malloc((size_t)(m2 + 1) * sizeof(int64_t));
    int64_t *cur = malloc((size_t)(m2 + 1) * sizeof(int64_t));
    if (!prev || !cur) { free(prev); free(cur); return -1; }
    for (int64_t i = 0; i < n; i++) {
        const uint32_t *s1 = fa + oa[i];
        const uint32_t *s2 = fb + ob[i];
        int64_t l1 = oa[i + 1] - oa[i], l2 = ob[i + 1] - ob[i];
        int64_t tot = l1 + l2;
        if (!tot) { out[i] = 0.0; continue; }
        int64_t lcs = lcs_one(s1, l1, s2, l2, prev, cur);
        out[i] = (double)(tot - 2 * lcs) / (double)tot;
    }
    free(prev); free(cur);
    return 0;
}

int batch_levenshtein(const uint32_t *fa, const int64_t *oa,
                      const uint32_t *fb, const int64_t *ob,
                      int64_t n, double bound, double *out) {
    /* normalized distance with per-pair cap floor(bound * maxlen);
       pairs past the cap emit 2.0 (reject sentinel — matches the
       JVM banded-levenshtein mapping in functions/kernels.py). */
    int64_t m1 = max_len(oa, n), m2 = max_len(ob, n);
    int64_t w = (m1 > m2 ? m1 : m2) + 1;
    int64_t *prev = malloc((size_t)w * sizeof(int64_t));
    int64_t *cur = malloc((size_t)w * sizeof(int64_t));
    peq_slot peq[PEQ_SLOTS];
    uint32_t gen = 0;
    memset(peq, 0, sizeof(peq));
    if (!prev || !cur) { free(prev); free(cur); return -1; }
    for (int64_t i = 0; i < n; i++) {
        const uint32_t *s1 = fa + oa[i];
        const uint32_t *s2 = fb + ob[i];
        int64_t l1 = oa[i + 1] - oa[i], l2 = ob[i + 1] - ob[i];
        int64_t ml = l1 > l2 ? l1 : l2;
        if (!ml) { out[i] = 0.0; continue; }
        int64_t cap = (int64_t)(bound * (double)ml);
        if (cap >= ml) cap = ml;
        int64_t d = lev_dist(s1, l1, s2, l2, cap, prev, cur, peq, &gen);
        out[i] = d < 0 ? 2.0 : (double)d / (double)ml;
    }
    free(prev); free(cur);
    return 0;
}

/* ---------- fused SimHash sketch scan + top-N + rescore ----------
   For each left sketch: XOR+popcount against every right sketch
   (right side is nr*8 bytes — cache-resident for any broadcastable
   side), keep hamming <= max_ham candidates, select the top_n
   smallest by (hamming << 21 | j) (j ascending = key-rank order,
   matching the numpy path bit for bit), rescore each survivor with
   banded levenshtein on the lowercased strings, emit pairs with
   normalized distance <= bound. Returns the number of emitted pairs,
   or -1 on allocation failure / output overflow (caller re-chunks). */

typedef struct { uint32_t key; int64_t j; } scan_cand;

/* metric ids: 0 levenshtein (banded), 1 jaro, 2 jaro_winkler,
   3 damerau_levenshtein, 4 indel, 5 hamming */
int64_t sketch_scan_score(const uint64_t *lsk, int64_t nl,
                          const uint64_t *rsk, int64_t nr,
                          int64_t max_ham, int64_t top_n, int metric,
                          const uint32_t *lflat, const int64_t *loff,
                          const uint32_t *rflat, const int64_t *roff,
                          double bound,
                          int64_t max_out,
                          int64_t *out_li, int32_t *out_rj, double *out_d) {
    scan_cand *cand = malloc((size_t)(nr > 0 ? nr : 1) * sizeof(scan_cand));
    scan_cand *cand2 = malloc((size_t)(nr > 0 ? nr : 1) * sizeof(scan_cand));
    int64_t lmax = max_len(loff, nl), rmax = max_len(roff, nr);
    int64_t w = (lmax > rmax ? lmax : rmax) + 2;
    int64_t *prev = malloc((size_t)w * sizeof(int64_t));
    int64_t *cur = malloc((size_t)w * sizeof(int64_t));
    peq_slot peq[PEQ_SLOTS];
    uint32_t gen = 0;
    memset(peq, 0, sizeof(peq));
    uint8_t *f1 = NULL, *f2 = NULL;
    int64_t *dmat = NULL;
    da_slot *map = NULL;
    uint64_t mapmask = 0;
    int64_t stride = rmax + 2;
    if (metric == 1 || metric == 2) {
        f1 = malloc((size_t)(lmax > 0 ? lmax : 1));
        f2 = malloc((size_t)(rmax > 0 ? rmax : 1));
        if (!f1 || !f2) goto fail;
    } else if (metric == 3) {
        dmat = malloc((size_t)(lmax + 2) * (size_t)stride * sizeof(int64_t));
        uint64_t cap2 = 8;
        while (cap2 < (uint64_t)(2 * (lmax + rmax) + 4)) cap2 <<= 1;
        map = malloc((size_t)cap2 * sizeof(da_slot));
        mapmask = cap2 - 1;
        if (!dmat || !map) goto fail;
    }
    if (!cand || !cand2 || !prev || !cur) goto fail;
    int64_t out_n = 0;
    for (int64_t i = 0; i < nl; i++) {
        uint64_t s = lsk[i];
        int64_t nc = 0;
        for (int64_t j = 0; j < nr; j++) {
            uint64_t x = s ^ rsk[j];
            int64_t h = __builtin_popcountll(x);
            if (h <= max_ham) {
                cand[nc].key = ((uint32_t)h << 21) | (uint32_t)j;
                cand[nc].j = j;
                nc++;
            }
        }
        if (nc > top_n) {
            /* counting selection on the <=65 hamming buckets: same
               (h asc, j asc) order the old (h<<21|j) qsort produced —
               per-bucket order is scan order = j ascending — at
               O(nc + 65) instead of O(nc log nc). On dense sketch
               neighborhoods (structured key families pass ~10-50% of
               the right side) the qsort dominated the whole scan. */
            int64_t hist[66];
            memset(hist, 0, sizeof(hist));
            for (int64_t c = 0; c < nc; c++)
                hist[(cand[c].key >> 21) + 1]++;
            for (int64_t h = 1; h <= 65; h++) hist[h] += hist[h - 1];
            for (int64_t c = 0; c < nc; c++) {
                int64_t h = cand[c].key >> 21;
                cand2[hist[h]++] = cand[c];
            }
            scan_cand *t = cand; cand = cand2; cand2 = t;
            nc = top_n;
        }
        const uint32_t *s1 = lflat + loff[i];
        int64_t l1 = loff[i + 1] - loff[i];
        for (int64_t c = 0; c < nc; c++) {
            int64_t j = cand[c].j;
            const uint32_t *s2 = rflat + roff[j];
            int64_t l2 = roff[j + 1] - roff[j];
            int64_t ml = l1 > l2 ? l1 : l2;
            double d;
            if (!ml) {
                d = 0.0;
            } else if (metric == 0) {
                int64_t capb = (int64_t)(bound * (double)ml);
                if (capb >= ml) capb = ml;
                int64_t dist = lev_dist(s1, l1, s2, l2, capb, prev, cur,
                                        peq, &gen);
                if (dist < 0) continue;
                d = (double)dist / (double)ml;
            } else if (metric == 1) {
                d = 1.0 - jaro_one(s1, l1, s2, l2, f1, f2);
            } else if (metric == 2) {
                d = 1.0 - jw_one(s1, l1, s2, l2, f1, f2);
            } else if (metric == 3) {
                d = (double)dl_one(s1, l1, s2, l2, dmat, stride, map, mapmask)
                    / (double)ml;
            } else if (metric == 4) {
                int64_t tot = l1 + l2;
                d = (double)(tot - 2 * lcs_one(s1, l1, s2, l2, prev, cur))
                    / (double)tot;
            } else {
                int64_t lmin = l1 < l2 ? l1 : l2;
                int64_t mism = 0;
                for (int64_t t = 0; t < lmin; t++)
                    if (s1[t] != s2[t]) mism++;
                d = (double)(mism + (ml - lmin)) / (double)ml;
            }
            if (d <= bound) {
                if (out_n >= max_out) goto fail;
                out_li[out_n] = i;
                out_rj[out_n] = (int32_t)j;
                out_d[out_n] = d;
                out_n++;
            }
        }
    }
    free(cand); free(cand2); free(prev); free(cur);
    free(f1); free(f2); free(dmat); free(map);
    return out_n;
fail:
    free(cand); free(cand2); free(prev); free(cur);
    free(f1); free(f2); free(dmat); free(map);
    return -1;
}

int batch_hamming(const uint32_t *fa, const int64_t *oa,
                  const uint32_t *fb, const int64_t *ob,
                  int64_t n, double *out) {
    for (int64_t i = 0; i < n; i++) {
        const uint32_t *s1 = fa + oa[i];
        const uint32_t *s2 = fb + ob[i];
        int64_t l1 = oa[i + 1] - oa[i], l2 = ob[i + 1] - ob[i];
        int64_t lmin = l1 < l2 ? l1 : l2;
        int64_t lmax = l1 > l2 ? l1 : l2;
        if (!lmax) { out[i] = 0.0; continue; }
        int64_t mism = 0;
        for (int64_t k = 0; k < lmin; k++)
            if (s1[k] != s2[k]) mism++;
        out[i] = (double)(mism + (lmax - lmin)) / (double)lmax;
    }
    return 0;
}
"""

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


# Flag tiers, best first. -march=native matters enormously for the
# sketch scan: without it __builtin_popcountll lowers to a ~15-op SWAR
# sequence and the XOR+popcount loop stays scalar (measured 42M
# pairs/s/core); with it the compiler emits hardware POPCNT and
# auto-vectorizes the scan. Per-NODE compile + cache means native is
# safe on heterogeneous clusters (each node builds for its own ISA);
# the plain tier is the fallback for compilers that reject -march.
_CFLAG_TIERS = (
    ["-O3", "-march=native", "-funroll-loops"],
    ["-O3"],
)


def _compile() -> Optional[ctypes.CDLL]:
    src_hash = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "plffm_native")
    so_path = os.path.join(cache_dir, f"kernels_{src_hash}_v2.so")
    if not os.path.exists(so_path):
        os.makedirs(cache_dir, exist_ok=True)
        c_path = os.path.join(cache_dir, f"kernels_{src_hash}.c")
        with open(c_path, "w") as fh:
            fh.write(_C_SOURCE)
        tmp_so = so_path + f".tmp.{os.getpid()}"
        last_err: Optional[Exception] = None
        for flags in _CFLAG_TIERS:
            try:
                subprocess.run(
                    ["cc", *flags, "-shared", "-fPIC", "-o", tmp_so, c_path],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                last_err = None
                break
            except Exception as exc:  # try the next flag tier
                last_err = exc
        if last_err is not None:
            raise last_err
        os.rename(tmp_so, so_path)  # atomic publish for concurrent workers
    lib = ctypes.CDLL(so_path)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.batch_jaro.argtypes = [
        u32p, i64p, u32p, i64p, ctypes.c_int64, ctypes.c_int, f64p
    ]
    lib.batch_levenshtein.argtypes = [
        u32p, i64p, u32p, i64p, ctypes.c_int64, ctypes.c_double, f64p
    ]
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.sketch_scan_score.argtypes = [
        u64p, ctypes.c_int64, u64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        u32p, i64p, u32p, i64p,
        ctypes.c_double, ctypes.c_int64,
        i64p, i32p, f64p,
    ]
    lib.sketch_scan_score.restype = ctypes.c_int64
    for fn in (lib.batch_damerau, lib.batch_indel, lib.batch_hamming):
        fn.argtypes = [u32p, i64p, u32p, i64p, ctypes.c_int64, f64p]
    for fn in (
        lib.batch_jaro, lib.batch_damerau, lib.batch_indel,
        lib.batch_hamming, lib.batch_levenshtein,
    ):
        fn.restype = ctypes.c_int
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _compile()
        except Exception:
            _LIB = None
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def _flatten(strings: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    if total:
        flat = np.frombuffer(
            "".join(strings).encode("utf-32-le"), dtype=np.uint32
        )
    else:
        flat = np.zeros(1, dtype=np.uint32)
    return flat, off


def _run(fn_name: str, a: Sequence[str], b: Sequence[str], *extra) -> np.ndarray:
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native kernels unavailable")
    n = len(a)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    fa, oa = _flatten(a)
    fb, ob = _flatten(b)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    rc = getattr(lib, fn_name)(
        fa.ctypes.data_as(u32p),
        oa.ctypes.data_as(i64p),
        fb.ctypes.data_as(u32p),
        ob.ctypes.data_as(i64p),
        ctypes.c_int64(n),
        *extra,
        out.ctypes.data_as(f64p),
    )
    if rc != 0:
        raise MemoryError("native kernel allocation failed")
    return out


# metric -> batch distance over (list[str], list[str]) -> np.ndarray
NATIVE_DISTANCE = {
    "jaro": lambda a, b: _run("batch_jaro", a, b, ctypes.c_int(0)),
    "jaro_winkler": lambda a, b: _run("batch_jaro", a, b, ctypes.c_int(1)),
    "damerau_levenshtein": lambda a, b: _run("batch_damerau", a, b),
    "indel": lambda a, b: _run("batch_indel", a, b),
    "hamming": lambda a, b: _run("batch_hamming", a, b),
}


def batch_levenshtein_bounded(a, b, bound: float) -> "np.ndarray":
    """Normalized levenshtein distance with per-pair banded cap
    ``floor(bound * maxlen)``; pairs past the cap return 2.0 (reject
    sentinel, same mapping as the JVM banded path in kernels.py)."""
    return _run("batch_levenshtein", a, b, ctypes.c_double(float(bound)))


_METRIC_IDS = {
    "levenshtein": 0,
    "jaro": 1,
    "jaro_winkler": 2,
    "damerau_levenshtein": 3,
    "indel": 4,
    "hamming": 5,
}


def sketch_scan_score(
    lsk: "np.ndarray",
    rsk: "np.ndarray",
    l_strs,
    r_flat: "np.ndarray",
    r_off: "np.ndarray",
    max_hamming: int,
    top_n: int,
    metric: str,
    bound: float,
):
    """Fused C sketch scan: XOR+popcount every (left, right) sketch
    pair, per-left top-N by (hamming, right rank), exact-metric rescore
    on the lowercased strings, threshold filter — one pass, no numpy
    temporaries, right side cache-resident. Returns
    (left_row_idx int64, right_rank int32, distance float64) arrays for
    the survivors only. ``r_flat``/``r_off`` come from
    :func:`flatten_strings` so the right side flattens once per task."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native kernels unavailable")
    nl, nr = len(lsk), len(rsk)
    out_cap = max(nl * min(top_n, nr), 1)
    out_li = np.empty(out_cap, dtype=np.int64)
    out_rj = np.empty(out_cap, dtype=np.int32)
    out_d = np.empty(out_cap, dtype=np.float64)
    if nl == 0 or nr == 0:
        return out_li[:0], out_rj[:0], out_d[:0]
    lflat, loff = _flatten(l_strs)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    rc = lib.sketch_scan_score(
        np.ascontiguousarray(lsk, dtype=np.uint64).ctypes.data_as(u64p),
        ctypes.c_int64(nl),
        np.ascontiguousarray(rsk, dtype=np.uint64).ctypes.data_as(u64p),
        ctypes.c_int64(nr),
        ctypes.c_int64(max_hamming),
        ctypes.c_int64(top_n),
        ctypes.c_int(_METRIC_IDS[metric]),
        lflat.ctypes.data_as(u32p),
        loff.ctypes.data_as(i64p),
        r_flat.ctypes.data_as(u32p),
        r_off.ctypes.data_as(i64p),
        ctypes.c_double(float(bound)),
        ctypes.c_int64(out_cap),
        out_li.ctypes.data_as(i64p),
        out_rj.ctypes.data_as(i32p),
        out_d.ctypes.data_as(f64p),
    )
    if rc < 0:
        raise MemoryError("sketch_scan_score failed")
    n = int(rc)
    return out_li[:n], out_rj[:n], out_d[:n]


def flatten_strings(strings):
    """Public alias of the UTF-32 flattener for callers that prepare a
    side once and reuse it across kernel calls."""
    return _flatten(strings)


def native_bounded_distance(metric: str, a, b, bound: float) -> "np.ndarray":
    """Normalized distance for any metric with a caller-side bound:
    levenshtein uses the banded C kernel (early exit past the cap,
    rejects as 2.0 > bound); other metrics compute exactly — the
    caller's ``<= bound`` filter applies either way."""
    if metric == "levenshtein":
        return batch_levenshtein_bounded(a, b, bound)
    return NATIVE_DISTANCE[metric](a, b)
