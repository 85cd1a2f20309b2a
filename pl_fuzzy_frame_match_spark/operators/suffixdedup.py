"""Exact duplicated-substring detection — prefix-doubling ranks
(suffix-array machinery, Lee et al. 2022 "Deduplicating Training Data
Makes Language Models Better" §4.1 exact-substring dedup).

`functions/text.py`'s span family finds duplicated k-TOKEN windows via
int64 gram hashes — collision-free in practice but not by
construction, and it shuffles the hashed grams. This module finds
duplicated length-L CHARACTER substrings EXACTLY (string equality, no
hashes anywhere) without ever shuffling substrings:

1. one ``posexplode`` turns the corpus into (doc, off, gram) rows;
2. ``global_group_id`` replaces each base gram by a distinct integer
   id — after this round NO string leaves an executor. Since every
   downstream consumer compares ids by EQUALITY only, this is a
   sort-free distinct-map + broadcast join-back, not a global sort
   (``global_dense_rank`` remains the primitive for order-needing
   callers like sorted-neighborhood blocking);
3. prefix doubling (Manber-Myers): rounds only until the window
   width w satisfies 2w >= L — each round is an integer equi-join on
   (doc, off + w) plus a group id of the (id, next_id) pair, and
   id_{2w}[i] identifies the substring of length 2w at i, exactly;
4. two-level combination: the length-L substring at i is identified
   by (rank_w[i], rank_w[i + L - w]) whenever the two width-w windows
   overlap or touch (the sparse-table O(1) comparison trick), so a
   groupBy on that INT PAIR finds every duplicated length-L substring
   corpus-wide — and the last doubling round a full suffix-array
   build would run is never needed.

Scale shape: every shuffle after step 2 carries fixed-width integers
regardless of L — at L = 1000 the naive L-gram groupBy ships ~1 KB
per position, this ships 16 bytes; and the rank levels are shared by
every L, so sweeping window sizes reuses the doubling work. The
oracle CAN take the naive route (DuckDB groups the substrings
themselves), which is exactly what makes the integer path
hash-checkable end to end.

``global_dense_rank`` is the reusable primitive: a total-order dense
rank with NO single-task window — repartitionByRange puts equal keys
in one partition (range boundaries are key values), a per-partition
distinct-count pass sizes the offsets, and an Arrow-batched
``mapInPandas`` assigns local dense ranks + the partition's offset.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# legacy explicit partition count for the range-partitioned rank sort;
# the default is now ADAPTIVE (num_partitions=None): the range exchange
# is emitted without an explicit N so AQE coalesces it to the advisory
# partition size — a 20k-row node table collapses to 1 task instead of
# 64 fixed-cost ones, while a 5M-position span frame on a cluster keeps
# spark.sql.shuffle.partitions-scale parallelism (guide §2.2; the rank
# VALUES are partition-independent by construction, so the output is
# identical for any partitioning)
RANK_PARTITIONS = 64


def global_dense_rank(
    df: DataFrame,
    key_cols: Sequence[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    dense: bool = True,
) -> DataFrame:
    """Append a global rank (0-based, ties share a rank) over
    ``key_cols`` ascending — without ``Window.orderBy`` (whose
    no-partition form is a single-task bottleneck). Three steps, all
    distributed: range-repartition + local sort (equal keys cannot
    straddle a range boundary), one tiny per-partition count
    aggregation collected to the driver (one row per partition), and
    a map-only pass adding a local rank + the partition's offset.

    ``dense=True`` gives the exact ``dense_rank() - 1`` contract
    (offsets from per-partition DISTINCT counts). ``dense=False``
    gives ordinal-of-run-start ranks — equal keys still share one
    rank and ranks still order like the keys, but with gaps; offsets
    come from plain per-partition ROW counts, whose aggregation is a
    64-row map-side-combined shuffle instead of a distinct-hash pass.
    Consumers that only need equality/order (the prefix-doubling
    loop) use the cheap form."""
    keys = list(key_cols)
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions is not None
        else df.repartitionByRange(*keys)
    )
    parts = (
        ranged.sortWithinPartitions(*keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg = (
        F.countDistinct(*keys) if dense else F.count(F.lit(1))
    ).alias("__n")
    counts = parts.groupBy("__pid").agg(agg).collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__n"]
    out_schema = parts.drop("__pid").schema.add(rank_col, "long")
    cols = [f.name for f in out_schema.fields]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive sorted within the partition; dense: rank =
        # number of key CHANGES so far; ordinal: rank = row index of
        # the current run's first row — both plus the global offset.
        # Fully VECTORIZED (shift-compare + cumsum/cummax): the
        # row-at-a-time loop was the bottleneck at 5M+ positions.
        import numpy as np

        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0].reset_index(drop=True)
        )
        base = offsets[int(pdf["__pid"].iloc[0])]
        kdf = pdf[keys]
        change = (kdf != kdf.shift()).any(axis=1).to_numpy()
        change[0] = True
        if dense:
            local = np.cumsum(change) - 1
        else:
            idx = np.arange(len(pdf), dtype=np.int64)
            local = np.maximum.accumulate(np.where(change, idx, 0))
        out = pdf.drop(columns=["__pid"])
        out[rank_col] = base + local
        yield out[cols]

    return parts.mapInPandas(assign, out_schema)


# distinct-key maps at or below this row count broadcast-join back to
# the input (map-side, zero shuffle of the big frame); above it the
# join falls back to a hash shuffle on the keys — still no range
# sampling, no global order, no driver offsets
GROUP_ID_BROADCAST_ROWS = 4_000_000


def global_group_id(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str = "gid",
    broadcast_rows: int = GROUP_ID_BROADCAST_ROWS,
) -> DataFrame:
    """Append an arbitrary-but-consistent distinct id (>= 0) per key
    combination — the EQUALITY-ONLY sibling of ``global_dense_rank``
    for consumers that never compare ranks by order (the
    prefix-doubling span family groups and joins on rank EQUALITY
    only; round-12 profile showed the range-sort rank pass was 60% of
    the L=16 flagship's wall).

    No range sampling, no global sort, no driver offsets: one hash
    aggregation builds the distinct key -> id map (ids from
    ``monotonically_increasing_id`` over the distinct frame, pinned
    by an eager ``localCheckpoint`` so every consumer of the output
    sees ONE assignment), then the input joins the map back —
    broadcast (map-side, no shuffle of ``df``) when the map has at
    most ``broadcast_rows`` rows, hash join on the keys otherwise."""
    keys = list(key_cols)
    mapping = (
        df.select(*keys)
        .distinct()
        .withColumn(id_col, F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    small = mapping.count() <= broadcast_rows
    return df.join(F.broadcast(mapping) if small else mapping, keys)


def duplicated_char_spans(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    span_len: int = 16,
) -> DataFrame:
    """Per-document exact duplicated-substring stats at character
    granularity: for every length-``span_len`` window start, is the
    EXACT substring repeated anywhere in the corpus (``n_dup_starts``)
    and does it also appear in a DIFFERENT document
    (``n_cross_starts``)? Lowercased text, no tokenization, no
    hashing — collision-free by construction. Returns
    (id, n_starts, n_dup_starts, n_cross_starts) for docs with at
    least one full window."""
    marked = _window_start_flags(docs, text_col, id_col, span_len)
    return marked.groupBy(F.col("doc").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_starts"),
        F.sum("is_dup").cast("long").alias("n_dup_starts"),
        F.sum("is_cross").cast("long").alias("n_cross_starts"),
    )


def _window_start_flags(
    docs: DataFrame, text_col: str, id_col: str, span_len: int
) -> DataFrame:
    """(doc, off, is_dup, is_cross) per full length-``span_len``
    window start — the shared core of the stats and removal ops:
    base-gram rank, prefix doubling, two-level combine, group
    marking."""
    if span_len < 2:
        raise ValueError("span_len must be >= 2")
    # fan out the docs scan BEFORE the position explode: a small
    # single-file corpus arrives in 1 partition, so the explode, the
    # pos checkpoint, and every shuffle FROM that 1-partition
    # checkpoint ran as serial 1-task stages (round-12 profile: 1.67 s
    # checkpoint + two 0.8 s 18 MB map stages, all on one core). At
    # real scale the scan already has enough partitions and this is a
    # no-op (the `_fanout` contract).
    from .dedup import _fanout

    docs = _fanout(docs.select(id_col, text_col))
    t = F.lower(F.col(text_col))
    # base rank over multi-char grams when the span allows (each
    # doubling round skipped is one global rank pass saved). Near the
    # doc end substring() returns the SHORT tail, which can only
    # equal other short tails of the same content+length — the same
    # end semantics as the -1 padding in the doubling rounds, and
    # irrelevant to full-window starts.
    # widest base gram that still never exceeds the two-window cover:
    # an 8-char key shuffles like one long and, at span_len <= 16,
    # removes EVERY doubling round (the L=16 flagship goes from two
    # global rank passes to one — A/B in PLANS.md round 9 session B)
    base_w = 8 if span_len >= 8 else 4 if span_len >= 4 else 1
    # length guard: Spark's sequence(0, -1) would yield a DESCENDING
    # [0, -1] for empty text, not an empty array
    pos = docs.select(
        F.col(id_col).alias("doc"), t.alias("__t")
    ).where(F.length("__t") > 0).select(
        "doc",
        F.explode(
            F.sequence(F.lit(0), F.length("__t") - 1)
        ).alias("off"),
        F.col("__t"),
    ).select(
        "doc",
        "off",
        F.substring(
            F.col("__t"), F.col("off") + 1, F.lit(base_w)
        ).alias("g"),
    )
    # empty-text docs emit no rows (sequence(0, -1) is empty).
    # Every consumer downstream compares ranks by EQUALITY only
    # (pair-building is offset arithmetic; the combine groups and
    # joins on the id pair), so the base "rank" is a sort-free
    # global_group_id: distinct-gram map + broadcast join-back
    # instead of the range-sampled global sort (round-12 profile:
    # the sort pass was ~60% of the L=16 flagship; A/B in PLANS.md).
    # The explode is checkpointed once so the distinct branch and the
    # join-back branch share one materialization.
    pos = pos.localCheckpoint(eager=True)
    cur = global_group_id(pos, ["g"], "r").select("doc", "off", "r")
    width = base_w
    # prefix doubling only until 2*width >= span_len: the two-level
    # combine (r_w[i], r_w[i + L - w]) covers length L whenever the
    # two width-w windows overlap or touch, so the last doubling
    # round the full suffix-array construction would run is never
    # needed here — one fewer global rank pass (measured ~3 s at
    # sf0.1, PLANS.md). Each round's re-rank is again equality-only,
    # so it uses the same sort-free group-id assignment; the pair
    # frame is checkpointed per round to keep every round's plan
    # shallow (the established per-round hygiene).
    while width * 2 < span_len:
        nxt = cur.select(
            F.col("doc"),
            (F.col("off") - F.lit(width)).alias("off"),
            F.col("r").alias("r2"),
        )
        pair = cur.join(nxt, ["doc", "off"], "left").select(
            "doc", "off", "r", F.coalesce("r2", F.lit(-1)).alias("r2")
        ).localCheckpoint(eager=True)
        cur = global_group_id(pair, ["r", "r2"], "nr").select(
            "doc", "off", F.col("nr").alias("r")
        )
        width *= 2
    # two-level combine: length-L key = (rank_w[i], rank_w[i + L - w])
    shift = span_len - width
    if shift > 0:
        tail = cur.select(
            F.col("doc"),
            (F.col("off") - F.lit(shift)).alias("off"),
            F.col("r").alias("rt"),
        )
        keyed = cur.join(tail, ["doc", "off"], "inner").select(
            "doc", "off", "r", "rt"
        )
    else:
        keyed = cur.select("doc", "off", "r", F.col("r").alias("rt"))
    # only true window STARTS (a full L fits): off <= len - L; the
    # inner joins above already guarantee off + L - 1 is in range
    # when shift > 0; for shift == 0 (L a power of two) the doubling
    # left-joins padded with -1, so drop starts whose key contains a
    # -1-derived rank by re-checking reachability via doc length
    lens = docs.select(
        F.col(id_col).alias("doc"),
        F.length(F.lower(F.col(text_col))).alias("__len"),
    )
    keyed = keyed.join(lens, "doc").where(
        F.col("off") <= F.col("__len") - F.lit(span_len)
    )
    groups = keyed.groupBy("r", "rt").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("doc").alias("dmin"),
        F.max("doc").alias("dmax"),
    )
    return keyed.join(groups, ["r", "rt"]).select(
        "doc",
        "off",
        (F.col("cnt") > 1).cast("int").alias("is_dup"),
        ((F.col("cnt") > 1) & (F.col("dmin") != F.col("dmax")))
        .cast("int")
        .alias("is_cross"),
    )


def remove_duplicated_char_spans(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    span_len: int = 16,
) -> DataFrame:
    """The REMOVAL form (Lee et al. 2022 exact-substring dedup, the
    delete step): cut every character covered by a CROSS-DOCUMENT
    duplicated length-``span_len`` window and emit
    (id, n_chars, n_removed, cleaned_md5) — counts plus a fingerprint
    of the cleaned text, value-checkable cross-engine without moving
    document bodies (the same output contract as the token-level
    `functions/text.py:remove_duplicate_spans`). Duplicate detection
    is the exact rank machinery — no hashes; coverage runs as a
    Catalyst higher-order filter over each doc's sorted dup-start
    array (one per-doc collect_list, no extra shuffle)."""
    flags = _window_start_flags(docs, text_col, id_col, span_len)
    starts = (
        flags.where(F.col("is_cross") == 1)
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list("off")).alias("__starts"))
    )
    base = docs.select(
        F.col(id_col),
        F.lower(F.col(text_col)).alias("__t"),
    ).where(F.col(id_col).isNotNull() & (F.length("__t") > 0))
    joined = base.join(
        starts, base[id_col] == starts["doc"], "left"
    ).select(
        F.col(id_col),
        "__t",
        F.coalesce(F.col("__starts"), F.array().cast("array<int>")).alias(
            "__starts"
        ),
    )
    chars = F.split(F.col("__t"), "")
    kept = F.filter(
        chars,
        lambda c, pos: ~F.exists(
            F.col("__starts"),
            lambda s: (s <= pos) & (pos < s + F.lit(span_len)),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.length("__t").cast("long").alias("n_chars"),
        (F.length("__t") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.concat_ws("", kept)).alias("cleaned_md5"),
    )


def duplicated_char_spans_sweep(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    span_lens: Sequence[int],
) -> DataFrame:
    """Per-document exact duplicated-substring stats for SEVERAL
    window lengths in one pass — the sweep a dedup-tuning run does
    (pick L by looking at the dup-fraction curve). The doubling
    levels are built ONCE up to the largest width any L needs; each
    L then reads its two ranks off an existing level
    (w with L/2 <= w <= L always exists among the power-of-two
    levels), so adding another L costs one combine join + one
    groupBy, never another rank pass — the shared-levels property the
    module docstring claims, exercised. Output:
    (span_len, id, n_starts, n_dup_starts, n_cross_starts)."""
    lens_sorted = sorted(set(int(x) for x in span_lens))
    if not lens_sorted or lens_sorted[0] < 4:
        raise ValueError("span_lens must all be >= 4")
    lmax = lens_sorted[-1]
    t = F.lower(F.col(text_col))
    lmin = min(lens_sorted)
    base_w = 8 if lmin >= 8 else 4 if lmin >= 4 else 1
    pos = docs.select(
        F.col(id_col).alias("doc"), t.alias("__t")
    ).where(F.length("__t") > 0).select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.length("__t") - 1)).alias("off"),
        F.col("__t"),
    ).select(
        "doc",
        "off",
        F.substring(F.col("__t"), F.col("off") + 1, F.lit(base_w)).alias("g"),
    )
    levels = {}
    # equality-only consumers, same as _window_start_flags: sort-free
    # group ids, explode checkpointed once (round-12 A/B in PLANS.md)
    pos = pos.localCheckpoint(eager=True)
    cur = global_group_id(pos, ["g"], "r").select("doc", "off", "r")
    levels[base_w] = cur
    width = base_w
    while width * 2 < lmax:
        nxt = cur.select(
            F.col("doc"),
            (F.col("off") - F.lit(width)).alias("off"),
            F.col("r").alias("r2"),
        )
        pair = cur.join(nxt, ["doc", "off"], "left").select(
            "doc", "off", "r", F.coalesce("r2", F.lit(-1)).alias("r2")
        ).localCheckpoint(eager=True)
        cur = global_group_id(pair, ["r", "r2"], "nr").select(
            "doc", "off", F.col("nr").alias("r")
        )
        width *= 2
        levels[width] = cur
    lens = docs.select(
        F.col(id_col).alias("doc"),
        F.length(F.lower(F.col(text_col))).alias("__len"),
    ).localCheckpoint(eager=True)
    out = None
    for L in lens_sorted:
        w = max(lv for lv in levels if lv <= L and 2 * lv >= L)
        lvl = levels[w]
        shift = L - w
        if shift > 0:
            tail = lvl.select(
                F.col("doc"),
                (F.col("off") - F.lit(shift)).alias("off"),
                F.col("r").alias("rt"),
            )
            keyed = lvl.join(tail, ["doc", "off"], "inner").select(
                "doc", "off", "r", "rt"
            )
        else:
            keyed = lvl.select("doc", "off", "r", F.col("r").alias("rt"))
        keyed = keyed.join(lens, "doc").where(
            F.col("off") <= F.col("__len") - F.lit(L)
        )
        groups = keyed.groupBy("r", "rt").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("doc").alias("dmin"),
            F.max("doc").alias("dmax"),
        )
        stats = (
            keyed.join(groups, ["r", "rt"])
            .select(
                "doc",
                (F.col("cnt") > 1).cast("int").alias("is_dup"),
                ((F.col("cnt") > 1) & (F.col("dmin") != F.col("dmax")))
                .cast("int")
                .alias("is_cross"),
            )
            .groupBy(F.col("doc").alias(id_col))
            .agg(
                F.count(F.lit(1)).alias("n_starts"),
                F.sum("is_dup").cast("long").alias("n_dup_starts"),
                F.sum("is_cross").cast("long").alias("n_cross_starts"),
            )
            .select(
                F.lit(L).cast("int").alias("span_len"),
                F.col(id_col),
                "n_starts",
                "n_dup_starts",
                "n_cross_starts",
            )
        )
        out = stats if out is None else out.unionByName(stats)
    return out
