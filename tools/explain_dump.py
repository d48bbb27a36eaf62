"""Dump .explain("formatted") for a set of registered queries to files.

Optimization-round deliverable (r15): the judge checks plan claims in
OPTIMIZATION_r*.md against committed plans/r*/<query>_{before,after}.txt.
This tool writes one file per query with the formatted physical plan,
built under plan_only mode so registry enumeration performs no staging
writes (base.plan_only, r14 VERDICT item 7).

Usage:
    python tools/explain_dump.py --out plans/r15 --suffix before \
        [--sf /root/testdata/sf0.1] [query ...]

With no query names, dumps the bench headline set plus the sf1/longdoc/
codec tier sets (each against its own data directory, like bench.py).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def formatted_plan(df) -> str:
    jvm = df._sc._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r15"))
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from slr207_mapreduce_spark.plans.base import all_queries, plan_only
    from slr207_mapreduce_spark.session import get_session

    spark = get_session(app_name="explain-dump", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # (query, sf_dir) pairs: explicit names use --sf; the default set
    # mirrors bench.py's tiers, each against the directory it is timed on.
    work: list[tuple[str, str]] = []
    if args.queries:
        work = [(q, args.sf) for q in args.queries]
    else:
        work = [(q, args.sf) for q in BENCH_QUERIES]
        try:
            from tools.make_sf import ensure_longdoc, ensure_sf1

            sf1_dir = ensure_sf1(REPO)
            ld_dir = ensure_longdoc(REPO)
            work += [
                (q, sf1_dir)
                for q in (
                    "knn_lsh_bucketed",
                    "pipeline_assign_ids",
                    "pipeline_global_shuffle",
                )
            ]
            work += [
                (q, ld_dir)
                for q in (
                    "pipeline_chunk_documents",
                    "pipeline_pack_sequences",
                    "dedup_cdc_chunks",
                    "text_bpe_apply",
                    "text_lm_score",
                )
            ]
        except Exception as e:  # tiers are optional for a plan dump
            print(f"tier dirs unavailable: {e}", file=sys.stderr)
        work += [
            (q, args.sf)
            for q in (
                "multimodal_jpeg_roundtrip",
                "multimodal_jpeg_color_roundtrip",
                "multimodal_mjpeg_avi_roundtrip",
                "multimodal_mulaw_roundtrip",
                "multimodal_gif_roundtrip",
            )
        ]

    os.makedirs(args.out, exist_ok=True)
    seen: set[str] = set()
    for name, sf_dir in work:
        if name in seen:
            continue
        seen.add(name)
        with plan_only():
            df = specs[name].build(spark, sf_dir)
            text = formatted_plan(df)
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"-- {name} @ {sf_dir} ({args.suffix})\n")
            f.write(text)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
