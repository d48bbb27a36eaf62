"""Reproduce the SCALE.md decade-tier measurements (round-8 tables).

Runs, on local[32] with warm-first / min-of-N timing:

  * the dedup_semantic_clusters decomposition (pair kernel vs CC wall,
    CC round count via connected_components(on_round=...)) at sf1 and
    the emb_sf10 dense-graph stress tier, including the cross-group
    pair count that falsified the tier's original linear design;
  * the MinHash-modality clustering (dedup_clusters' pipeline) at sf1
    and the docs_sf10 linear-structure tier;
  * the TPC-H join family (q3/q5/q9/q18) at sf1 and tpch_sf10.

Tiers are built on demand (tools/make_sf.py ensure_* — tpch_sf10 is
~2.2 GB). Prints one JSON object. Protocol notes: run on a quiet box
(check loadavg in the output); min-of-N discards warm-up, and the sf10
legs default to fewer repeats because each run is tens of seconds.

Usage: python tools/measure_scale.py [--runs-sf1 3] [--runs-sf10 2]
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
    ap.add_argument("--runs-sf1", type=int, default=3)
    ap.add_argument("--runs-sf10", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.operators.dedup import minhash_lsh_candidates
    from slr207_mapreduce_spark.operators.graph import (
        connected_components,
        release_result,
    )
    from slr207_mapreduce_spark.operators.similarity import cosine_neardup_pairs
    from slr207_mapreduce_spark.plans.base import all_queries
    from slr207_mapreduce_spark.session import get_session
    from slr207_mapreduce_spark.sources.tables import load_table
    from tools.make_sf import (
        ensure_docs_sf10,
        ensure_emb_sf10,
        ensure_sf1,
        ensure_tpch_sf10,
    )

    out: dict = {"loadavg_before": [round(x, 2) for x in os.getloadavg()]}
    spark = get_session(app_name="measure-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = ensure_sf1(REPO)

    def cluster_leg(pairs_of, src, dst, runs):
        """Time the pair stage and the CC stage separately; report the
        structural counts once (first/warm run) and min walls after."""
        res: dict = {}
        pw, cw = [], []
        for i in range(runs + 1):
            t0 = time.perf_counter()
            pairs = pairs_of()
            n_pairs = pairs.count()
            t_pairs = time.perf_counter() - t0
            rounds: list = []
            t0 = time.perf_counter()
            cc = connected_components(
                pairs, src=src, dst=dst,
                on_round=lambda r, d: rounds.append((r, d)),
            )
            cc.write.mode("overwrite").format("noop").save()
            t_cc = time.perf_counter() - t0
            if i == 0:
                res["n_pairs"] = n_pairs
                res["cc_rounds"] = len(rounds)
                res["n_clusters"] = cc.select("cluster_id").distinct().count()
            else:
                pw.append(t_pairs)
                cw.append(t_cc)
            release_result(cc)
        res["pair_wall_min"] = round(min(pw), 2)
        res["cc_wall_min"] = round(min(cw), 2)
        return res

    # --- semantic modality: sf1 vs emb_sf10 (dense-graph stress) ---------
    emb10 = ensure_emb_sf10(REPO)
    for label, sf_dir, runs in (
        ("semantic_sf1", sf1, args.runs_sf1),
        ("semantic_emb_sf10", emb10, args.runs_sf10),
    ):
        emb = load_table(spark, "embeddings", sf_dir)
        leg = cluster_leg(
            lambda e=emb: cosine_neardup_pairs(e, threshold=0.2, bits=8),
            "id_a", "id_b", runs,
        )
        leg["cross_group_pairs"] = (
            cosine_neardup_pairs(emb, threshold=0.2, bits=8)
            .where(F.expr("(id_a div 100000000) != (id_b div 100000000)"))
            .count()
        )
        out[label] = leg
        print(label, leg, flush=True)

    # --- MinHash modality: sf1 vs docs_sf10 (linear structure) -----------
    docs10 = ensure_docs_sf10(REPO)
    for label, sf_dir, runs in (
        ("minhash_cc_sf1", sf1, args.runs_sf1),
        ("minhash_cc_docs_sf10", docs10, args.runs_sf10),
    ):
        d = load_table(spark, "documents", sf_dir)
        out[label] = cluster_leg(
            lambda dd=d: minhash_lsh_candidates(
                dd, num_hashes=6, band_size=2, shingle_n=3
            ),
            "doc_a", "doc_b", runs,
        )
        print(label, out[label], flush=True)

    # --- TPC-H join family: sf1 vs tpch_sf10 ------------------------------
    tpch10 = ensure_tpch_sf10(REPO)
    specs = all_queries()
    for name in (
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q9_product_type_profit",
        "q18_large_volume_customers",
    ):
        row = {}
        for label, sf_dir, runs in (
            ("sf1", sf1, args.runs_sf1),
            ("tpch_sf10", tpch10, args.runs_sf10),
        ):
            walls = []
            for i in range(runs + 1):
                t0 = time.perf_counter()
                specs[name].build(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                if i:
                    walls.append(time.perf_counter() - t0)
            row[label] = round(min(walls), 2)
        row["ratio"] = round(row["tpch_sf10"] / row["sf1"], 2)
        out[name] = row
        print(name, row, flush=True)

    out["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
