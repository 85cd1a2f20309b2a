"""BPE merge learning — tokenizer vocabulary induction.

The one training-data-pipeline stage the text family did not yet
cover: learning the byte-pair-encoding merge table itself (the
GPT-2/SentencePiece preprocessing step). Classic BPE (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units")
iterates: count adjacent symbol pairs over the word-frequency table,
merge the most frequent pair corpus-wide, repeat.

Spark-first design, same planner pattern as the graph family
(`operators/graph.py`): the expensive part — the corpus scan — is ONE
distributed word-frequency aggregation; the merge loop then runs over
the (distinct word, count) table, which is orders of magnitude smaller
than the corpus (Heaps' law). Below ``max_driver_words`` distinct
words the loop is a driver-side dict algorithm over one collect (the
measured-fast path at bench scale); above it, each merge round is two
narrow Spark jobs over the vocab frame:

- the vocab rides in a delimiter-wrapped STRING form (each symbol
  wrapped in U+001F — the same encoding the SQL oracles replay), so
  the two hot per-round operations are whole-stage-codegen string
  primitives: adjacency = ``contains``, merge application = JVM
  ``replace`` (left-to-right non-overlapping — the exact classic-BPE
  scan order, and a no-op on unaffected words);
- pair counts are maintained INCREMENTALLY (round 9): the full
  ``posexplode`` + hash-aggregate runs ONCE, before round 0; after
  each merge only the words that actually contain the merged pair
  change, so each round filters them with the codegen ``contains``,
  re-explodes JUST those rows (old symbols negative, merged symbols
  positive), and folds the deltas into the persisted pair-count
  frame — the shuffle volume per round tracks the affected fraction,
  not the vocab;
- argmax: ``orderBy(count desc, left, right).limit(1)`` over the
  persisted pair frame — a driver scalar, the same bounded-collect
  shape as the planner's own stats;
- the vocab update is a LAZY codegen string map, compacted to a
  checkpoint every few rounds to bound lineage depth.

For production vocab budgets (32K-100K merges) the standard trainer
shape is the DRIVER loop over a frequency-capped word table — pass
``top_words`` to keep the N most frequent words (coverage is computed
and reported via ``warnings.warn``); real tokenizer trainers
(SentencePiece's ``input_sentence_size``/vocab pruning, GPT-2's
pre-tokenized frequency table) do exactly this. The distributed
rounds exist for when even the capped vocab cannot be collected.

Both paths implement identical semantics (highest pair count, ties
broken lexicographically) and are equivalence-tested. The reference
(a fuzzy string matcher) has no tokenizer surface; this is a pipeline
extension in the same family as `functions/text.py`.

At 100 TB: the corpus pass is the same shape as every other text
operator (scan + explode + agg, map-side partial); the vocab table for
a 100 TB web corpus is ~1e8 distinct words x ~30 bytes — comfortably a
distributed frame, far too big to collect, which is exactly what the
distributed rounds are for. n_merges is typically 1e4-1e5; each round
costs seconds on a vocab-sized frame, independent of corpus size.
"""

from __future__ import annotations

import warnings
from typing import List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# Below this many distinct words the merge loop runs driver-side over
# one collect of the (word, count) table — same crossover pattern as
# SMALL_GRAPH_EDGE_LIMIT (operators/graph.py). 500K (word, count)
# pairs is ~25 MB on the driver; the distributed loop's per-round
# fixed cost (two jobs + checkpoint) dwarfs the actual work there.
MAX_DRIVER_WORDS = 500_000

# Glue used to spell a merged symbol. Symbols start as single
# characters, so any multi-char symbol is unambiguous; no marker is
# needed inside symbols (merges are tracked by rank, not by parsing).
_MERGES_SCHEMA = "rank int, left string, right string, merged string, freq bigint"

# Compact the lazily-chained vocab string maps to a checkpoint every
# this many distributed merge rounds: each round adds one codegen
# `replace` to the lineage (cheap), but unbounded chains grow plan
# compile time, so bound the depth.
_COMPACT_EVERY = 8


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over whitespace-lowercased tokens — the ONE
    corpus-wide pass BPE needs; everything after operates on this
    (Heaps'-law small) frame."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _driver_bpe(
    word_counts: List[Tuple[str, int]], n_merges: int, min_freq: int = 1
):
    """Classic dict BPE over a collected word-frequency table. Exact
    twin of the distributed rounds: max pair count, ties broken by
    (left, right) lexicographic order; stops when the best pair drops
    under ``min_freq`` (the standard rare-merge cutoff)."""
    vocab = {}
    for word, cnt in word_counts:
        syms = tuple(word)
        if syms:
            vocab[syms] = vocab.get(syms, 0) + cnt
    merges = []
    for rank in range(n_merges):
        pair_counts: dict = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        freq = pair_counts[best]
        if freq < min_freq:
            break
        a, b = best
        merged = a + b
        new_vocab: dict = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
        merges.append((rank, a, b, merged, int(freq)))
    return merges


def _apply_merge_col(syms, a: str, b: str):
    """Catalyst fold applying one merge left-to-right, non-overlapping:
    walk the symbol array, and when the accumulator's tail equals
    ``a`` and the current symbol is ``b``, replace the tail with the
    merged token. After a merge the tail IS the merged token, so a
    following ``b`` cannot re-merge — the exact classic-BPE scan
    order."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


# Symbol delimiter for the distributed loop's STRING representation:
# a word's symbol sequence [s1, s2, ...] is spelled
# US||s1||US US||s2||US ... (each symbol wrapped in U+001F on both
# sides, so adjacent symbols share no characters). The same encoding
# the SQL oracles use (text_bpe_encode_fixed / text_bpe_first3_merges)
# — and it makes the two hot per-round operations whole-stage-codegen
# string primitives instead of per-row array builders:
#   adjacency test  = s CONTAINS US||a||US||US||b||US
#   merge (a,b)->ab = replace(s, US||a||US||US||b||US, US||a||b||US),
# where JVM string replace is left-to-right non-overlapping — exactly
# the classic-BPE scan order ('aaa' under (a,a) -> [aa, a]), and a
# no-op on strings without the pair. Assumption (shared with the SQL
# oracles): U+001F does not occur inside words — it is a control
# character, never a word character in a natural corpus.
_US = "\x1f"


def _wrap_word(word):
    """word string -> delimiter-wrapped single-character symbols."""
    return F.concat(
        F.lit(_US), F.concat_ws(_US + _US, F.split(word, "")), F.lit(_US)
    )


def _syms_of_s():
    """Symbol array of the wrapped string column ``s`` (strip the one
    leading + trailing US, split on the doubled delimiter)."""
    return F.split(
        F.substring(F.col("s"), F.lit(2), F.length("s") - 2), _US + _US
    )


def _pair_deltas(frame: DataFrame, sign: int) -> DataFrame:
    """Explode a wrapped-string (s, cnt) frame into (a, b, ±cnt)
    adjacent-pair rows — every adjacent position counted (overlaps
    included), the classic Sennrich pair count. ``sign=-1`` retracts a
    word's old pairs; ``sign=+1`` asserts its post-merge pairs."""
    return (
        frame.select(_syms_of_s().alias("syms"), "cnt")
        .select(
            F.posexplode(F.slice(F.col("syms"), 1, F.size("syms") - 1))
            .alias("i", "a"),
            F.col("syms"),
            F.col("cnt"),
        )
        .select(
            F.col("a"),
            F.element_at(F.col("syms"), F.col("i") + 2).alias("b"),
            (F.col("cnt") * F.lit(sign)).alias("pcnt"),
        )
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    max_driver_words: int = MAX_DRIVER_WORDS,
    min_freq: int = 1,
    top_words: Optional[int] = None,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over ``text_col``;
    returns ``(rank, left, right, merged, freq)`` ordered by rank —
    the merge table a tokenizer ships. Deterministic: max corpus pair
    frequency, ties broken lexicographically on (left, right); stops
    early when the best remaining pair's corpus frequency drops under
    ``min_freq`` (Sennrich's rare-merge cutoff — a vocab learned on a
    sample shouldn't memorize hapax pairs).

    ``top_words`` (round 9, VERDICT r8 #2): cap the vocab table to the
    N most frequent words before learning — the standard trainer shape
    for production merge budgets (a 32K-merge run over a capped
    frequent-word table is what SentencePiece/GPT-2-style trainers
    do). Deterministic (count desc, word asc), with the retained
    token-occurrence coverage reported via ``warnings.warn`` so a
    too-aggressive cap is loud. With ``top_words <= max_driver_words``
    any corpus runs the fast driver loop."""
    spark = df.sparkSession
    wf = word_frequencies(df, text_col).localCheckpoint(eager=True)
    n_words = wf.count()
    if top_words is not None and n_words > top_words:
        total_occ = wf.agg(F.sum("cnt")).collect()[0][0] or 0
        # TakeOrdered top-N: per-partition heads merged on the driver,
        # no full sort/shuffle of the vocab frame
        wf = (
            wf.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(top_words)
            .localCheckpoint(eager=True)
        )
        kept_occ = wf.agg(F.sum("cnt")).collect()[0][0] or 0
        pct = 100.0 * kept_occ / total_occ if total_occ else 100.0
        warnings.warn(
            f"learn_bpe_merges: top_words={top_words} keeps "
            f"{kept_occ}/{total_occ} token occurrences "
            f"({pct:.2f}% coverage) of {n_words} distinct words; "
            "merges are learned on the capped table",
            stacklevel=2,
        )
        n_words = top_words
    if n_words <= max_driver_words:
        merges = _driver_bpe(
            [(r["word"], r["cnt"]) for r in wf.collect()],
            n_merges,
            min_freq,
        )
        return spark.createDataFrame(merges or [], _MERGES_SCHEMA)

    # Distributed rounds with INCREMENTAL pair-count maintenance over
    # the wrapped-STRING vocab form (round 9, VERDICT r8 #2): the full
    # posexplode + hash-agg runs once; each round then is
    #   (1) argmax off the persisted (small) pair frame — one bounded
    #       collect;
    #   (2) one job folding the ± pair deltas of ONLY the affected
    #       words (codegen `contains` filter -> explode -> skinny
    #       shuffle whose volume tracks the affected fraction, not the
    #       vocab) into the checkpointed pair frame;
    #   (3) a LAZY vocab update — `replace` is a no-op on unaffected
    #       rows, so the whole update is one codegen string map,
    #       compacted to a checkpoint every _COMPACT_EVERY rounds to
    #       bound lineage.
    # A/B at the 700K-word probe (scripts/probe_bpe_scale.py, PLANS.md
    # round 9, same session, legacy first): 2.39 s/round vs the
    # round-8 full-recount loop's 7.29 — 3.05x, identical merge
    # tables. A first incremental attempt kept the ARRAY vocab form
    # and LOST (9.56 vs 6.96 s/round) — the per-row zip_with flag +
    # 3 checkpoint barriers per round cost more than the explode they
    # saved; the string form is what makes incrementality pay.
    vocab = wf.select(
        _wrap_word(F.col("word")).alias("s"), "cnt"
    ).localCheckpoint(eager=True)
    pair_counts = (
        _pair_deltas(vocab, 1)
        .groupBy("a", "b")
        .agg(F.sum("pcnt").alias("pcnt"))
        .localCheckpoint(eager=True)
    )
    merges = []
    for rank in range(n_merges):
        top = pair_counts.orderBy(
            F.desc("pcnt"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["pcnt"])
        if freq < min_freq:
            break
        merges.append((rank, a, b, a + b, freq))
        pat = _US + a + _US + _US + b + _US
        rep = _US + a + b + _US
        affected = vocab.where(F.col("s").contains(pat))
        merged_affected = affected.select(
            F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"),
            "cnt",
        )
        pair_counts = (
            pair_counts.unionByName(_pair_deltas(affected, -1))
            .unionByName(_pair_deltas(merged_affected, 1))
            .groupBy("a", "b")
            .agg(F.sum("pcnt").alias("pcnt"))
            .where(F.col("pcnt") > 0)
            .localCheckpoint(eager=True)
        )
        vocab = vocab.select(
            F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"),
            "cnt",
        )
        if (rank + 1) % _COMPACT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(merges or [], _MERGES_SCHEMA)


def bpe_encode_tokens(
    df: DataFrame,
    text_col: str,
    merges,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table: each whitespace word segments into
    BPE symbols (characters merged by rank order — the canonical
    encode; GPT-2's lowest-rank-pair loop computes the same result).
    ``merges`` is the (rank, left, right, ...) table from
    :func:`learn_bpe_merges` — a list of Rows/tuples or a DataFrame
    (collected here; merge tables are small by construction, ~1e4-1e5
    rows, and ship to executors inside the UDF closure exactly like a
    broadcast dict). Arrow-batched pandas UDF: pure per-row Python is
    the right tool here — the per-word merge loop is data-dependent
    control flow no Catalyst expression expresses, and the batch shape
    keeps it off the row-at-a-time path."""
    from pyspark.sql.functions import pandas_udf

    if isinstance(merges, DataFrame):
        merges = [(r["left"], r["right"]) for r in merges.collect()]
    else:
        # (rank, left, right, ...) rows/tuples, or bare (left, right)
        merges = [
            (t[1], t[2]) if len(t) >= 4 else (t[0], t[1])
            for t in (tuple(m) for m in merges)
        ]
    pairs = [(str(a), str(b)) for a, b in merges]

    def encode_word(word: str, merge_pairs) -> list:
        syms = list(word)
        for a, b in merge_pairs:
            out = []
            i = 0
            merged = a + b
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def run(t):
            if t is None:
                return []
            toks = []
            for w in str(t).lower().split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, pairs)
                    cache[w] = got
                toks.extend(got)
            return toks

        return texts.map(run)

    return df.withColumn(out_col, encode(F.col(text_col)))
