"""Skew stress for the two connected-components loops.

VERDICT r4 asked for proof (not claims) that the large-star/small-star
variant wins where min-label propagation degrades. The two degradation
modes are different:

- DIAMETER: min-label needs rounds = longest path; a 128-hop chain costs
  128 shuffle-join rounds. Star halves tree heights every round, so the
  same chain collapses in O(log n) rounds.
- HUB SKEW: a hot node of degree D funnels its whole neighborhood
  through single join keys each round. groupBy-min itself is absorbed
  by partial aggregation, but the edges-join replays the hub's D edges
  every round until convergence; star contracts the graph toward stars,
  so the hub's edge list shrinks instead of being replayed.

This harness builds both graph shapes SYNTHETICALLY (no document
pipeline in the way — it times the CC loops, nothing else) and times
cc_min_label vs cc_star on each at two scales, printing one JSON line.
Both loops are also cross-checked for identical components on the small
scale (same (node -> root) map after min-relabel).

Usage:
    python tools/stress_cc_skew.py             # default sizes
    CC_CHAIN_LEN=256 CC_HUB_DEG=500000 python tools/stress_cc_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_LEN = int(os.environ.get("CC_CHAIN_LEN", "128"))
HUB_DEG = int(os.environ.get("CC_HUB_DEG", "250000"))
N_HUBS = int(os.environ.get("CC_N_HUBS", "4"))
BACKGROUND = int(os.environ.get("CC_BACKGROUND", "1000000"))


def hub_graph(spark, hub_deg: int, n_hubs: int, background: int):
    """n_hubs star components of degree hub_deg (the skew), plus
    `background` disjoint 2-node components (the bulk that keeps the
    shuffles honest). Canonical (u, v<u) ids: hubs are 0..n_hubs-1,
    leaves/background numbered above them."""
    from pyspark.sql import functions as F

    leaves = (
        spark.range(n_hubs * hub_deg)
        .select(
            (F.col("id") + n_hubs).alias("u"),
            (F.col("id") % n_hubs).alias("v"),
        )
    )
    base = n_hubs + n_hubs * hub_deg
    pairs = (
        spark.range(background)
        .select(
            (base + 2 * F.col("id") + 1).alias("u"),
            (base + 2 * F.col("id")).alias("v"),
        )
    )
    return leaves.union(pairs)


def chain_graph(spark, chain_len: int, background: int):
    """One path of length chain_len (diameter driver) plus disjoint
    2-node background components."""
    from pyspark.sql import functions as F

    chain = spark.range(chain_len).select(
        (F.col("id") + 1).alias("u"), F.col("id").alias("v")
    )
    base = chain_len + 1
    pairs = spark.range(background).select(
        (base + 2 * F.col("id") + 1).alias("u"),
        (base + 2 * F.col("id")).alias("v"),
    )
    return chain.union(pairs)


def bidir(edges):
    from pyspark.sql import functions as F

    return edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).union(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))


def run(spark, name: str, edges, max_rounds: int):
    from streams_spark.operators.dedup import cc_min_label, cc_star

    canonical = edges.localCheckpoint()
    bi = bidir(canonical).localCheckpoint()
    out = {}
    t0 = time.time()
    ml = cc_min_label(bi, max_rounds=max_rounds)
    ml_rows = ml.count()
    out["min_label_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    st = cc_star(canonical, max_rounds=max_rounds)
    st_rows = st.count()
    out["star_sec"] = round(time.time() - t0, 2)
    out["nodes"] = ml_rows
    assert ml_rows == st_rows, (name, ml_rows, st_rows)
    return out, ml, st


def main() -> None:
    from pyspark.sql import functions as F

    from streams_spark.session import get_spark

    spark = get_spark("pystreams-cc-skew")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.range(1000).count()

    results = {}

    # correctness cross-check on a small mixed graph first; the chain's
    # ids are offset past the hub graph's range so the two shapes stay
    # DISJOINT components (ids 0.. would otherwise weld the chain onto
    # hub 0 and collapse the mixed topology into one component)
    deg, hubs, bg = 50, 2, 100
    hub_part = hub_graph(spark, deg, hubs, bg)
    offset = hubs + hubs * deg + 2 * bg  # one past hub_graph's id range
    chain_part = chain_graph(spark, 40, 0).select(
        (F.col("u") + offset).alias("u"), (F.col("v") + offset).alias("v")
    )
    small = hub_part.union(chain_part)
    _, ml, st = run(spark, "small", small, max_rounds=64)
    got_ml = {r.node: r.label for r in ml.collect()}
    got_st = {r.doc_id: r.cluster_id for r in st.collect()}
    assert got_ml == got_st, "CC variants disagree on the small graph"
    results["cross_check"] = "identical components"

    for scale, (deg, bg, clen) in {
        "1x": (HUB_DEG // 10, BACKGROUND // 10, CHAIN_LEN // 2),
        "10x": (HUB_DEG, BACKGROUND, CHAIN_LEN),
    }.items():
        hub, _, _ = run(
            spark, f"hub-{scale}", hub_graph(spark, deg, N_HUBS, bg), 64
        )
        chain, _, _ = run(
            spark, f"chain-{scale}", chain_graph(spark, clen, bg),
            max_rounds=clen + 8,
        )
        results[f"hub_{scale}"] = dict(hub, hub_degree=deg, background=bg)
        results[f"chain_{scale}"] = dict(chain, chain_len=clen, background=bg)
        for shape, r in (("hub", hub), ("chain", chain)):
            print(
                f"{shape}-{scale:3s} min_label={r['min_label_sec']:7.2f}s "
                f"star={r['star_sec']:7.2f}s nodes={r['nodes']}",
                flush=True,
            )

    print(json.dumps({"metric": "cc_skew_stress", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
