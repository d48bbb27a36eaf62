"""Stage-decompose the events / graph / warehouse families at sf1
(r15 VERDICT item 5) and probe agg_count_distinct's first-exchange
balance (item 6).

For each family the harness times, warm-first / min-of-N through the noop
sink, the REGISTERED query plus its inline-reconstructed stages, so each
wall can be attributed to a stage the way dedup_minhash_lsh was decomposed
in r15 (OPTIMIZATION_r15.md). Stage frames mirror the builder code; any
drift would show up as a stage wall exceeding its parent query.

The agg_count_distinct probe reproduces the first exchange's
HashPartitioning exactly (murmur3 `F.hash` + `pmod`, the same family the
planner emits) over the post-partial-aggregation rows (distinct
(group, distinct-col, gid) combos per map partition — what the partial
aggregate actually emits), and reports rows per reduce partition
(max/median) — the skew decision row the VERDICT asked for.

Usage: python tools/measure_r16_families.py [--runs 3] [--families all]
Prints one JSON object. Run on a quiet box (loadavg echoed in output).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label: str, make_df, runs: int) -> float:
    """Warm once, then min-of-N of build+execute. The BUILD must be inside
    the timed region: the iterative operators (connected_components,
    pagerank_fp) run their rounds eagerly at build time via per-round
    localCheckpoints — timing only the final noop would measure a
    checkpoint replay, not the query."""
    spark.sparkContext.setJobDescription(label)
    noop(make_df())  # warm (plan + code cache + page cache)
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        noop(make_df())
        best = min(best, time.monotonic() - t0)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--families",
        default="all",
        help="comma list of events,graph,warehouse,aggskew or 'all'",
    )
    args = ap.parse_args()
    fams = (
        {"events", "graph", "warehouse", "aggskew"}
        if args.families == "all"
        else set(args.families.split(","))
    )

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.plans.base import all_queries
    from slr207_mapreduce_spark.session import get_session
    from slr207_mapreduce_spark.sources.tables import load_table
    from tools.make_sf import ensure_sf1

    sf1 = ensure_sf1(REPO)
    spark = get_session(app_name="measure-r16-families", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    out: dict = {"sf_dir": sf1, "runs": args.runs, "loadavg": os.getloadavg()}

    def q(name):
        return lambda: specs[name].build(spark, sf1)

    ev = load_table(spark, "events", sf1)

    if "events" in fams:
        rows: dict[str, float] = {}
        # --- events_sessionization: full, then the window pass alone, then
        # the plain user-keyed agg (the one-exchange floor for this data).
        rows["sessionization_full"] = timeit(
            spark, "ev: sessionization full", q("events_sessionization"), args.runs
        )
        wspec = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))

        def sess_window_only():
            lagts = F.lag("ts").over(wspec)
            flagged = ev.select(
                "user_id",
                "ts",
                "event_id",
                F.when(
                    lagts.isNull()
                    | ((F.unix_seconds(F.col("ts")) - F.unix_seconds(lagts)) > 1800),
                    1,
                )
                .otherwise(0)
                .alias("is_new"),
            )
            return flagged

        rows["sessionization_window_only"] = timeit(
            spark, "ev: sessionization lag pass", sess_window_only, args.runs
        )
        rows["user_agg_floor"] = timeit(
            spark,
            "ev: plain user agg floor",
            lambda: ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")),
            args.runs,
        )

        # --- events_gap_filled_hours: full, hourly agg alone, bounds alone.
        rows["gapfill_full"] = timeit(
            spark, "ev: gapfill full", q("events_gap_filled_hours"), args.runs
        )
        rows["gapfill_hourly_agg"] = timeit(
            spark,
            "ev: gapfill hourly agg",
            lambda: ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
                F.count(F.lit(1)).alias("n_events")
            ),
            args.runs,
        )
        rows["gapfill_bounds_scan"] = timeit(
            spark,
            "ev: gapfill bounds scan",
            lambda: ev.agg(
                F.date_trunc("hour", F.min("ts")).alias("lo"),
                F.date_trunc("hour", F.max("ts")).alias("hi"),
            ),
            args.runs,
        )

        # --- events_sliding_window: full vs the tumbling (1 window/row) twin.
        rows["sliding_full"] = timeit(
            spark, "ev: sliding full", q("events_sliding_window"), args.runs
        )
        rows["tumbling_twin"] = timeit(
            spark, "ev: tumbling twin", q("events_tumbling_window"), args.runs
        )

        # --- events_funnel_stages: full, window staging alone, staging+distinct.
        rows["funnel_stages_full"] = timeit(
            spark, "ev: funnel_stages full", q("events_funnel_stages"), args.runs
        )
        wu = Window.partitionBy("user_id")

        def funnel_staged():
            e = ev.withColumn("es", F.unix_seconds(F.col("ts")))
            return (
                e.withColumn(
                    "t1",
                    F.min(F.when(F.col("event_type") == "view", F.col("es"))).over(wu),
                )
                .withColumn(
                    "t2",
                    F.min(
                        F.when(
                            (F.col("event_type") == "click")
                            & (F.col("es") > F.col("t1")),
                            F.col("es"),
                        )
                    ).over(wu),
                )
                .withColumn(
                    "t3",
                    F.min(
                        F.when(
                            (F.col("event_type") == "purchase")
                            & (F.col("es") > F.col("t2")),
                            F.col("es"),
                        )
                    ).over(wu),
                )
                .select("user_id", "t1", "t2", "t3")
            )

        rows["funnel_window_pass"] = timeit(
            spark, "ev: funnel window pass", funnel_staged, args.runs
        )
        rows["funnel_window_plus_distinct"] = timeit(
            spark,
            "ev: funnel window+distinct",
            lambda: funnel_staged().distinct(),
            args.runs,
        )
        out["events"] = rows

    if "graph" in fams:
        rows = {}
        from slr207_mapreduce_spark.operators.dedup import minhash_lsh_candidates
        from slr207_mapreduce_spark.operators.graph import connected_components

        docs = load_table(spark, "documents", sf1)
        rows["cc_pairs_only"] = timeit(
            spark,
            "graph: lsh pair gen",
            lambda: minhash_lsh_candidates(docs, num_hashes=6, band_size=2, shingle_n=3),
            args.runs,
        )
        rounds: list[int] = []

        def cc_full():
            pairs = minhash_lsh_candidates(docs, num_hashes=6, band_size=2, shingle_n=3)
            return connected_components(
                pairs, src="doc_a", dst="doc_b", on_round=lambda r, d: rounds.append(r)
            )

        rows["cc_full"] = timeit(spark, "graph: dedup_clusters full", cc_full, args.runs)
        rows["cc_rounds"] = max(rounds) if rounds else 0

        # pagerank: edge derivation alone vs the full 5-round fixed point.
        o = load_table(spark, "orders", sf1)
        li = load_table(spark, "lineitem", sf1)

        def pr_edges():
            pairs = o.join(li, o.o_orderkey == li.l_orderkey).select(
                F.col("o_custkey").alias("cust"),
                (F.lit(1000000) + F.col("l_suppkey")).alias("supp"),
            )
            return (
                pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
                .union(pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst")))
                .distinct()
            )

        rows["pagerank_sym_edges"] = timeit(
            spark, "graph: pagerank edge prep", pr_edges, args.runs
        )
        rows["pagerank_full"] = timeit(
            spark, "graph: pagerank full", q("graph_pagerank"), args.runs
        )
        out["graph"] = rows

    if "warehouse" in fams:
        rows = {}
        rows["scd2_full"] = timeit(
            spark, "wh: scd2 full", q("scd2_user_status_history"), args.runs
        )
        wspec = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
        rows["scd2_lag_pass_only"] = timeit(
            spark,
            "wh: scd2 lag pass",
            lambda: ev.select(
                "user_id", "ts", "event_id", "event_type",
                F.lag("event_type").over(wspec).alias("prev"),
            ),
            args.runs,
        )
        rows["cdc_latest_full"] = timeit(
            spark, "wh: cdc_latest_state full", q("cdc_latest_state"), args.runs
        )
        rows["ivm_merge_full"] = timeit(
            spark,
            "wh: incremental merge full",
            q("warehouse_incremental_agg_merge"),
            args.runs,
        )
        cutoff = F.lit("2024-01-15").cast("timestamp")
        evv = ev.select("user_id", "ts", F.col("value").cast("decimal(18,2)").alias("v"))
        rows["ivm_snap_agg_only"] = timeit(
            spark,
            "wh: ivm snapshot agg",
            lambda: evv.where(F.col("ts") < cutoff)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")),
            args.runs,
        )
        out["warehouse"] = rows

    if "aggskew" in fams:
        # Post-partial-agg shuffle rows per reduce partition for
        # agg_count_distinct's FIRST exchange at sf1. The partial aggregate
        # emits one row per distinct (o_orderpriority, ck, os, gid) combo
        # per map partition; HashPartitioning(key, P) = pmod(murmur3, P).
        o = load_table(spark, "orders", sf1)
        P = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # Expand pattern from plans/r16/agg_count_distinct_before.txt (2):
        # gid 0 = (priority, null, null)  [count(*) slice]
        # gid 1 = (priority, o_orderstatus, null)
        # gid 2 = (priority, null, o_custkey)
        # hashpartitioning key order: (priority, status, custkey, gid).
        exp = (
            o.select("o_orderpriority", "o_custkey", "o_orderstatus")
            .withColumn("gid", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
            .select(
                "o_orderpriority",
                F.when(F.col("gid") == 1, F.col("o_orderstatus")).alias("os"),
                F.when(F.col("gid") == 2, F.col("o_custkey")).alias("ck"),
                "gid",
                F.spark_partition_id().alias("mp"),
            )
        )
        partial = exp.groupBy("mp", "o_orderpriority", "os", "ck", "gid").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        dist = (
            partial.groupBy(
                F.pmod(F.hash("o_orderpriority", "os", "ck", "gid"), F.lit(P)).alias("rp")
            )
            .agg(F.count(F.lit(1)).alias("rows_shuffled"))
            .collect()
        )
        sizes = sorted(int(r["rows_shuffled"]) for r in dist)
        n_rows = int(o.count())
        out["aggskew"] = {
            "shuffle_partitions": P,
            "n_reduce_partitions_nonempty": len(sizes),
            "rows_shuffled_total": sum(sizes),
            "rows_input": n_rows,
            "rows_per_partition_max": sizes[-1] if sizes else 0,
            "rows_per_partition_median": sizes[len(sizes) // 2] if sizes else 0,
            "rows_per_partition_min": sizes[0] if sizes else 0,
            "max_over_median": round(sizes[-1] / max(1, sizes[len(sizes) // 2]), 3)
            if sizes
            else None,
        }

    out["loadavg_end"] = os.getloadavg()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
