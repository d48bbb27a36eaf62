"""Beyond-broadcast semantic-gate measurement (SCALE.md round-15).

r14 VERDICT item 1: streaming_semantic_gate_candidates' broadcast store
had a hard 2^20-row reject, and the documented mitigation (gate against
the partitioned lists) had no measured surface. This harness builds a
store PAST that bound and drives the auto-branch:

  * store: 1,280,000 vectors — 640 structured copies of sf0.1's 2,000
    embeddings (64 rotations x 10 epsilon shifts, the emb_sf10
    construction continued past 2^20), planted ground truth: every
    arriving row is an epsilon-copy of a stored family.
  * arriving: 20,000 rows — 10 fresh epsilon variants of the 2,000
    originals under new vec_ids (mirrors the r14 decade row's
    20k-arriving shape), so EVERY arriving row must be flagged
    (its family sits in the store at cos ~= 1).

Claims under test:
  * the auto path ENGAGES instead of raising: the same
    streaming_semantic_gate_candidates call that rejected at this size
    in r14 now returns the distributed plan and completes;
  * verdicts are complete at planted ground truth: all 20,000 arriving
    rows hit (reported, asserted);
  * the documented big-store dial (n_centroids="auto_graph", holding
    per-cell membership at ~192 rows) completes the same gate with the
    same hit set.

Usage: python tools/measure_gate_scale.py
Prints one JSON object; exits non-zero if an assertion fails.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_COPIES = 640  # 64 rotations x 10 epsilon shifts -> 1.28M > 2^20
N_ARRIVING_VARIANTS = 10
STRIDE = 10_000_000
ARRIVING_BASE = 900_000_000


def ensure_gate_fixture(repo_root: str) -> str:
    """Build the >2^20-row store + 20k arriving batch (cached)."""
    import duckdb

    out = os.path.join(repo_root, ".sfgen", "emb_store_1m")
    store_path = os.path.join(out, "store.parquet")
    arr_path = os.path.join(out, "arriving.parquet")
    if os.path.exists(store_path) and os.path.exists(arr_path):
        return out
    os.makedirs(out, exist_ok=True)
    src = "/root/testdata/sf0.1/embeddings.parquet"
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    dim = con.execute(f"SELECT MAX(len(embedding)) FROM '{src}'").fetchone()[0]
    parts = []
    for c in range(N_COPIES):
        g, k = divmod(c, 10)
        rot = (
            f"list_transform(range(0, {dim}),"
            f" i -> embedding[((i + {g}) % {dim}) + 1])"
            if g
            else "embedding"
        )
        eps = f"list_transform({rot}, x -> CAST(x + 0.0001 * {k} AS FLOAT))"
        parts.append(
            # literal offset precomputed: c * STRIDE exceeds INT32 at
            # c >= 215, and DuckDB multiplies INT32 operands as INT32
            f"SELECT vec_id + CAST({c * STRIDE} AS BIGINT) AS vec_id,"
            f" {eps} AS embedding, label FROM '{src}'"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{store_path}'"
        " (FORMAT PARQUET, ROW_GROUP_SIZE 16384)"
    )
    # arriving: fresh epsilon variants of the UNROTATED originals under
    # new ids — each is an eps-copy of store family c=0..9 (cos ~= 1)
    aparts = []
    for k in range(N_ARRIVING_VARIANTS):
        eps = f"list_transform(embedding, x -> CAST(x + 0.00005 * {k + 1} AS FLOAT))"
        aparts.append(
            f"SELECT vec_id + CAST({ARRIVING_BASE + k * STRIDE} AS BIGINT)"
            f" AS vec_id, {eps} AS embedding, label FROM '{src}'"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(aparts)}) TO '{arr_path}'"
        " (FORMAT PARQUET, ROW_GROUP_SIZE 16384)"
    )
    con.close()
    return out


def main() -> int:
    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.session import get_session
    from slr207_mapreduce_spark.streaming.ops import (
        semantic_gate_candidates_distributed,
        streaming_semantic_gate_candidates,
    )

    fixture = ensure_gate_fixture(REPO)
    spark = get_session()
    store = spark.read.parquet(os.path.join(fixture, "store.parquet"))
    arriving = spark.read.parquet(os.path.join(fixture, "arriving.parquet"))
    n_store = store.count()
    n_arriving = arriving.count()
    assert n_store > 1_048_576, n_store  # past the broadcast reject bound

    out: dict = {
        "n_store": n_store,
        "n_arriving": n_arriving,
        "broadcast_bound": 1_048_576,
    }

    # cell-size profile (the skew the per-cell kernel must tolerate)
    from slr207_mapreduce_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_train_centroids,
    )

    cidx, cint = ivf_train_centroids(store, n_corpus=n_store)
    sizes = (
        ivf_assign_cells(store, cidx, cint)
        .groupBy("cidx")
        .count()
        .agg(
            F.count("*").alias("cells"),
            F.max("count").alias("max_cell"),
            F.avg("count").alias("avg_cell"),
        )
        .collect()[0]
    )
    out["store_cells"] = {
        "cells": sizes["cells"],
        "max_cell": sizes["max_cell"],
        "avg_cell": round(sizes["avg_cell"], 1),
    }

    def run(tag: str, df):
        t0 = time.monotonic()
        agg = df.agg(
            F.count("*").alias("pairs"),
            F.countDistinct("vec_id").alias("hit_rows"),
        ).collect()[0]
        out[tag] = {
            "wall_sec": round(time.monotonic() - t0, 1),
            "pairs": agg["pairs"],
            "arriving_rows_hit": agg["hit_rows"],
        }
        return agg["hit_rows"]

    # 1. the r14 reject path, now the auto-branch: the SAME call
    hits = run(
        "auto_branch_default_dials",
        streaming_semantic_gate_candidates(arriving, store, tau=0.4),
    )
    assert hits == n_arriving, (hits, n_arriving)

    # 2. the documented big-store dial: linear cells (~192 rows/cell)
    hits_g = run(
        "distributed_auto_graph_cells",
        semantic_gate_candidates_distributed(
            arriving, store, tau=0.4, n_centroids="auto_graph"
        ),
    )
    assert hits_g == n_arriving, (hits_g, n_arriving)

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
