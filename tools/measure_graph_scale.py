"""Measure knn_graph_ivf at scale: wall + SAMPLED exact recall.

r13 VERDICT items 1 and 4: the graph tier's decade rows carried walls but
no recall — the 100x-scale recall claim was extrapolated from sf1. This
harness builds the corpus-wide kNN graph at a chosen (n_centroids, nprobe)
configuration and bounds whole-graph recall with a sampled exact
reference: ``--sample`` md5-selected rows' true top-k (knn_bruteforce —
the |Q|-bounded exact tier) compared against the graph's edges for those
rows. Sampling by the seeded md5 ranking keeps the row choice
deterministic and engine-independent.

Usage:
    python tools/measure_graph_scale.py --tier emb_sf10 \
        [--n-centroids auto_graph] [--nprobe auto] [--sample 1000] [--k 5]

Prints one JSON line per configuration; paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="emb_sf10",
                    help="emb_sf10 | sf1.0 | a directory with embeddings.parquet")
    ap.add_argument("--n-centroids", default="auto_graph")
    ap.add_argument("--nprobe", default="auto")
    ap.add_argument("--sample", type=int, default=1000)
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.functions.portable import portable_hash64
    from slr207_mapreduce_spark.operators.similarity import (
        auto_graph_centroids,
        auto_graph_nprobe,
        auto_ivf_centroids,
        knn_bruteforce,
        knn_graph_ivf,
        norm_f64,
    )
    from slr207_mapreduce_spark.session import get_session
    from slr207_mapreduce_spark.sources.tables import load_table
    from tools.make_sf import ensure_emb_sf10, ensure_sf1

    if args.tier == "emb_sf10":
        sf_dir = ensure_emb_sf10(REPO)
    elif args.tier == "sf1.0":
        sf_dir = ensure_sf1(REPO)
    else:
        sf_dir = args.tier

    nc = args.n_centroids if args.n_centroids.startswith("auto") else int(args.n_centroids)
    npr = args.nprobe if args.nprobe == "auto" else int(args.nprobe)

    spark = get_session(app_name="measure-graph-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()

    t0 = time.perf_counter()
    g = knn_graph_ivf(emb, k=args.k, nprobe=npr, n_centroids=nc)
    g_cached = g.cache()
    n_edges = g_cached.count()
    wall = time.perf_counter() - t0

    # Sampled exact reference: --sample valid rows under the seeded md5
    # ranking (seed 7 — the family's shared seed), true top-k by the
    # bounded exact tier, recall = |graph edges ∩ exact edges| / (k·|S|).
    nrm = norm_f64(F.col("embedding").cast("array<double>"))
    sample = (
        emb.where((nrm > 0) & (nrm < F.lit(float("inf"))))
        .select("vec_id", "embedding",
                portable_hash64(F.col("vec_id").cast("string"), 7).alias("h"))
        .orderBy("h", "vec_id")
        .limit(args.sample)
        .drop("h")
    )
    exact = knn_bruteforce(emb, sample, k=args.k, max_queries=args.sample)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(g_cached.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count()
    )
    denom = exact.count()
    g_cached.unpersist()

    if nc == "auto_graph":
        cells = auto_graph_centroids(n)
    elif nc == "auto":  # the bounded-|Q| search dial (pre-r14 behavior)
        cells = auto_ivf_centroids(n)
    else:
        cells = nc
    print(json.dumps({
        "tier": args.tier, "n": n,
        "n_centroids": cells,
        "nprobe": auto_graph_nprobe(n) if npr == "auto" else npr,
        "k": args.k, "edges": n_edges,
        "graph_wall_sec": round(wall, 1),
        "sampled_recall": round(hits / denom, 3) if denom else None,
        "sample": args.sample,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
