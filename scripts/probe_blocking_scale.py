#!/usr/bin/env python
"""Scale probe for the round-9 blocking/entity-resolution family: do
the candidate tiers stay linear when the distinct-name count grows
from the gate's 64 to 1,000,000?

Names are synthesized distributed (two syllable draws + a numeric
tail from the id — ~35K distinct phonetic codes' worth of variety,
heavy code collisions like real name data). Measures, per tier,
candidates generated and wall seconds; then the full
resolve_entities pipeline (tiers -> matches -> components ->
canonical). The quadratic truth harness (blocking_quality) is
intentionally NOT run at this size — that is the documented sampling
boundary.

The first run of this probe (no purging) measured the hot-block
failure mode the phonetic docstring predicts: 147M scored pairs from
the Soundex tier and 192M from the 4-char prefix tier at 1M names,
and the composed pipeline GC-thrashed to death unioning them. The
probe now runs the capped tiers (max_block=50 block purging) — the
production configuration.

Run contention-free from the repo root:
    python scripts/probe_blocking_scale.py            # 1M names
    python scripts/probe_blocking_scale.py --small    # 100K
Results pinned in PLANS.md (round 9, session B).
"""

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pl_fuzzy_frame_match_spark.functions.phonetic import (  # noqa: E402
    phonetic_blocked_pairs,
)
from pl_fuzzy_frame_match_spark.operators.blocking import (  # noqa: E402
    prefix_block_pairs,
    resolve_entities,
    sorted_neighborhood_pairs,
)
from pl_fuzzy_frame_match_spark.session import get_spark  # noqa: E402

SYL = ["an", "bel", "cor", "dan", "el", "far", "gil", "han", "ir",
       "jor", "kal", "lin", "mor", "nel", "or", "per", "quin", "ros",
       "sten", "tor", "ul", "ven", "wil", "xan", "yor", "zel"]


def main():
    n = 100_000 if "--small" in sys.argv else 1_000_000
    spark = get_spark("probe-blocking")
    syl = F.array(*[F.lit(s) for s in SYL])
    names = (
        spark.range(n)
        .select(
            F.concat(
                F.element_at(syl, (F.col("id") % 26 + 1).cast("int")),
                F.element_at(syl, (F.col("id") / 26 % 26 + 1).cast("int")),
                F.lit(" "),
                F.element_at(syl, (F.col("id") / 676 % 26 + 1).cast("int")),
                (F.col("id") % 997).cast("string"),
            ).alias("name")
        )
        .localCheckpoint(eager=True)
    )
    print(json.dumps({"names": names.count()}), flush=True)
    for tier, frame in [
        ("phonetic_purged", phonetic_blocked_pairs(names, "name", threshold=0.88, max_block=50)),
        (
            "sorted_neighborhood",
            sorted_neighborhood_pairs(names, "name", window=4, threshold=0.88),
        ),
        ("prefix_purged", prefix_block_pairs(names, "name", prefix_len=4, threshold=0.88, max_block=50)),
    ]:
        t0 = time.time()
        c = frame.count()
        print(
            json.dumps(
                {"tier": tier, "candidates_kept": c,
                 "wall_s": round(time.time() - t0, 1)}
            ),
            flush=True,
        )
    t0 = time.time()
    ents = resolve_entities(names, "name", threshold=0.88, window=4,
                            prefix_len=4, max_block=50)
    n_ent = ents.select("canonical_name").distinct().count()
    print(
        json.dumps(
            {"pipeline": "resolve_entities", "entities": n_ent,
             "wall_s": round(time.time() - t0, 1)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
