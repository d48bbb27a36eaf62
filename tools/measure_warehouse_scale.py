"""Warehouse/CDC decade-tier measurement (SCALE.md round-9 table).

VERDICT r08 item 3: the warehouse family (cdc_latest_state /
warehouse_incremental_agg_merge / scd2) had no evidence past sf1. This
harness replays the TPC-H ``orders`` table as an orders CHANGELOG —
every order inserts (seq 0), every 3rd order is later re-priced
(seq 1 upsert, price * 1.1), every 7th order is tombstoned (seq 2
delete) — at two tiers:

  * sf1        (.sfgen/sf1.0,      1.5M orders → ~2.1M changelog rows)
  * tpch_sf10  (.sfgen/tpch_sf10,  15M orders  → ~21M changelog rows)

and measures, warm-first / min-of-N:

  * cdc_compact  — changelog → latest-state snapshot (max_by over seq,
    tombstones dropped): the merge-on-read compaction pass.
  * ivm_merge    — incremental view maintenance refresh: per-customer
    (n_changes, total_priced) kept as agg(seq=0 snapshot) merged with
    agg(seq>=1 delta) through a full-outer coalescing join.
  * scd2_history — per-key version intervals (valid_from_seq,
    valid_to_seq, is_current) via lead() over (key, seq).

Correctness is asserted IN-RUN at every tier, not sampled:

  * cdc_compact result == the closed-form expected state recomputed
    directly from orders (same IEEE double ops) — exceptAll both ways.
  * ivm_merge result == the direct full aggregate over the changelog
    (DECIMAL(18,2) sums: associative, so partial+merge must be
    bit-identical) — exceptAll both ways.

A superlinear sf10/sf1 wall ratio (vs the ~10x row ratio) or any
equality mismatch makes the script exit non-zero.

Usage: python tools/measure_warehouse_scale.py [--runs-sf1 3] [--runs-sf10 2]
Prints one JSON object.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def changelog_path(spark, tier_dir: str, tag: str) -> str:
    """Materialize the orders changelog for a tier once (parquet), so
    the measured operators scan real files like a production CDC feed
    instead of re-deriving the fixture per run."""
    from pyspark.sql import functions as F

    path = os.path.join(REPO, ".sfgen", f"cdc_{tag}", "changelog.parquet")
    # require the _SUCCESS marker, not bare existence: an interrupted
    # write leaves a partial directory that every later run would
    # silently measure (the in-run equality checks would eventually
    # flag it, but the recorded rows/walls would be from wrong data)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        orders = spark.read.parquet(os.path.join(tier_dir, "orders.parquet"))
        base = orders.select(
            F.col("o_orderkey").alias("key"),
            F.col("o_custkey").alias("grp"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
        v0 = base.select(
            "key", "grp", F.lit(0).alias("seq"),
            F.lit("upsert").alias("op"), "price",
        )
        v1 = base.where(F.col("key") % 3 == 0).select(
            "key", "grp", F.lit(1).alias("seq"),
            F.lit("upsert").alias("op"),
            (F.col("price") * F.lit(1.1)).alias("price"),
        )
        v2 = base.where(F.col("key") % 7 == 0).select(
            "key", "grp", F.lit(2).alias("seq"),
            F.lit("delete").alias("op"), F.lit(0.0).alias("price"),
        )
        v0.unionAll(v1).unionAll(v2).write.mode("overwrite").parquet(path)
    return path


def _timed(fn, runs: int) -> float:
    """Warm-first, min-of-runs wall."""
    fn()
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(min(walls), 3)


def tier_leg(spark, tier_dir: str, tag: str, runs: int) -> dict:
    """One tier's measurement + IN-RUN equality asserts. Module-level so
    tests/test_measure_smoke.py can replay it at sf0.01 inside the suite
    (r10, VERDICT r09 item 6) — a refactor that breaks the replay or the
    equality checks fails CI, not a future measurement session."""
    from pyspark.sql import functions as F

    timed = _timed
    log = spark.read.parquet(changelog_path(spark, tier_dir, tag))
    res: dict = {"changelog_rows": log.count()}

    # --- cdc_compact: max_by compaction, tombstones dropped ----------
    def compact_df():
        payload = F.struct(F.col("op"), F.col("price"))
        return (
            log.groupBy("key")
            .agg(F.max_by(payload, F.col("seq")).alias("p"))
            .where(F.col("p.op") != "delete")
            .select("key", F.col("p.price").alias("price"))
        )

    res["cdc_compact_s"] = timed(
        lambda: compact_df().write.mode("overwrite").format("noop").save(),
        runs,
    )
    # equality vs the closed-form expected state (same IEEE ops on the
    # same parquet doubles: v1 wrote price*1.1, expected recomputes it)
    orders = spark.read.parquet(os.path.join(tier_dir, "orders.parquet"))
    expected = (
        orders.where(F.col("o_orderkey") % 7 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(
                F.col("o_orderkey") % 3 == 0,
                F.col("o_totalprice").cast("double") * F.lit(1.1),
            )
            .otherwise(F.col("o_totalprice").cast("double"))
            .alias("price"),
        )
    )
    got = compact_df()
    mism = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    res["cdc_compact_mismatch_rows"] = mism

    # --- ivm_merge: snapshot + delta partials, full-outer merge ------
    dlog = log.where(F.col("op") == "upsert").select(
        "grp", "seq", F.col("price").cast("decimal(18,2)").alias("v")
    )

    def part_agg(df):
        return df.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    def ivm_df():
        snap = part_agg(dlog.where(F.col("seq") == 0))
        delta = part_agg(dlog.where(F.col("seq") >= 1))
        m = snap.alias("a").join(delta.alias("b"), "grp", "full_outer")
        zn = F.lit(0).cast("long")
        zs = F.lit(0).cast("decimal(18,2)")
        return m.select(
            "grp",
            (F.coalesce(F.col("a.n"), zn) + F.coalesce(F.col("b.n"), zn))
            .alias("n_changes"),
            (F.coalesce(F.col("a.s"), zs) + F.coalesce(F.col("b.s"), zs))
            .cast("decimal(20,2)")
            .alias("total_priced"),
        )

    res["ivm_merge_s"] = timed(
        lambda: ivm_df().write.mode("overwrite").format("noop").save(), runs
    )
    direct = part_agg(dlog).select(
        "grp",
        F.col("n").alias("n_changes"),
        F.col("s").cast("decimal(20,2)").alias("total_priced"),
    )
    got = ivm_df()
    mism = got.exceptAll(direct).count() + direct.exceptAll(got).count()
    res["ivm_merge_mismatch_rows"] = mism

    # --- scd2_history: version intervals via lead() ------------------
    def scd2_df():
        from pyspark.sql import Window

        w = Window.partitionBy("key").orderBy("seq")
        return log.select(
            "key", "seq", "op", "price",
            F.lead("seq").over(w).alias("valid_to_seq"),
        ).withColumn("is_current", F.col("valid_to_seq").isNull())

    res["scd2_history_s"] = timed(
        lambda: scd2_df().write.mode("overwrite").format("noop").save(), runs
    )
    return res

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-sf1", type=int, default=3)
    ap.add_argument("--runs-sf10", type=int, default=2)
    args = ap.parse_args()

    from slr207_mapreduce_spark.session import get_session
    from tools.make_sf import ensure_sf1, ensure_tpch_sf10

    out: dict = {"loadavg_before": [round(x, 2) for x in os.getloadavg()]}
    spark = get_session(app_name="measure-warehouse-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = ensure_sf1(REPO)
    sf10 = ensure_tpch_sf10(REPO)
    out["sf1"] = tier_leg(spark, sf1, "sf1", args.runs_sf1)
    out["tpch_sf10"] = tier_leg(spark, sf10, "sf10", args.runs_sf10)

    row_ratio = out["tpch_sf10"]["changelog_rows"] / out["sf1"]["changelog_rows"]
    out["row_ratio"] = round(row_ratio, 2)
    failures = []
    for op in ("cdc_compact_s", "ivm_merge_s", "scd2_history_s"):
        r = out["tpch_sf10"][op] / out["sf1"][op]
        out[f"{op[:-2]}_wall_ratio"] = round(r, 2)
        # generous linearity bound: 2x the row ratio flags superlinearity
        # while tolerating fixed-cost amortization noise
        if r > 2 * row_ratio:
            failures.append(f"{op}: wall ratio {r:.1f} > 2x row ratio {row_ratio:.1f}")
    for tier in ("sf1", "tpch_sf10"):
        for chk in ("cdc_compact_mismatch_rows", "ivm_merge_mismatch_rows"):
            if out[tier][chk] != 0:
                failures.append(f"{tier}.{chk} = {out[tier][chk]}")
    out["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]
    out["failures"] = failures
    print(json.dumps(out))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
