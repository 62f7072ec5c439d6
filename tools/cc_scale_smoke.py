#!/usr/bin/env python
"""Connected-components scale smoke: dup_clusters at 1x/Nx data with the
star-round count surfaced — the observable that shows wall-time tracking
graph size/structure, not driver round-trips (VERDICT r03 item 1).

The Nx fixture clones are EXACT duplicates of their originals, so every
original doc becomes an N-clique in the dup-pair graph: edge count grows
~N² while component diameter stays ~1 — the round count must stay flat.

Run: python tools/cc_scale_smoke.py [N ...]   (default: 3 30)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_processing_spark.operators.graph import connected_components
from bigdata_processing_spark.queries.dedup import (
    _verified_dup_pairs,
    clear_dedup_memos,
)
from bigdata_processing_spark.session import get_spark
from scale_smoke import build_scaled_dir


def measure(spark, sf_dir: str, label: str) -> None:
    clear_dedup_memos()
    t0 = time.monotonic()
    # UNGUARDED pair pipeline: the smoke exists to stress CC with the
    # full clone-amplified edge set — the default bucket cap (rightly)
    # skips >25-member clone buckets and would starve the graph
    pairs = _verified_dup_pairs(
        spark, sf_dir, max_df=None, max_bucket=None
    ).select("d1", "d2")
    n_edges = pairs.count()
    t_pairs = time.monotonic() - t0
    t1 = time.monotonic()
    # force the distributed star-contraction path: measuring IT is the
    # point (the driver union-find path would swallow the 1x/3x graphs)
    labels, rounds = connected_components(
        pairs, src="d1", dst="d2", small_graph_edges=0
    )
    n_nodes = labels.count()
    n_clusters = labels.select("component").distinct().count()
    t_cc = time.monotonic() - t1
    labels.unpersist()
    print(json.dumps({
        "scale": label,
        "edges": n_edges,
        "nodes": n_nodes,
        "clusters": n_clusters,
        "cc_rounds": rounds,
        "pair_pipeline_sec": round(t_pairs, 2),
        "cc_sec": round(t_cc, 2),
    }), flush=True)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [3, 30]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cc-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    measure(spark, sf_dir, "1x")
    for n in ns:
        scaled = build_scaled_dir(
            spark, sf_dir, n,
            f"/tmp/cc_smoke_{n}x_{os.path.basename(sf_dir.rstrip('/'))}",
        )
        measure(spark, scaled, f"{n}x")
    spark.stop()


if __name__ == "__main__":
    main()
