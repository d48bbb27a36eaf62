"""Connected-components unit tests (hand graphs) + cluster sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cc_two_components_and_chain(spark):
    from slr207_mapreduce_spark.operators.graph import connected_components

    # component {1,2,3} (triangle), chain {10,11,12,13}, pair {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        ["src", "dst"],
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert {got[1], got[2], got[3]} == {1}
    assert {got[10], got[11], got[12], got[13]} == {10}
    assert {got[20], got[21]} == {20}


def test_cc_long_chain_converges(spark):
    from slr207_mapreduce_spark.operators.graph import connected_components

    n = 25  # diameter 24 — forces many propagation rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    got = connected_components(edges, max_iter=n + 2).collect()
    assert all(r["cluster_id"] == 0 for r in got)
    assert len(got) == n + 1


def test_dedup_clusters_consistent_with_pairs(spark):
    from slr207_mapreduce_spark.operators.dedup import minhash_lsh_candidates
    from slr207_mapreduce_spark.plans.base import all_queries
    from slr207_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    clusters = {
        r["node"]: r["cluster_id"]
        for r in all_queries()["dedup_clusters"].build(spark, SF_SMOKE).collect()
    }
    pairs = minhash_lsh_candidates(load_table(spark, "documents", SF_SMOKE)).collect()
    # every candidate pair must land in the same cluster
    for r in pairs:
        assert clusters[r["doc_a"]] == clusters[r["doc_b"]]
    # every cluster label is a member of its own cluster
    for node, cid in clusters.items():
        assert clusters[cid] == cid


def test_iterative_ops_release_round_checkpoints(spark):
    """localCheckpoint blocks are RDD-level pins that DataFrame.unpersist
    cannot free; if per-round checkpoints leak, a long single-session run
    (the driver's) accumulates them until unrelated plans fail. Each
    iterative query may keep ONLY its final result frame pinned."""
    from tests.conftest import SF_CORRECT
    from slr207_mapreduce_spark.plans.base import all_queries

    specs = all_queries()
    sc = spark.sparkContext
    for name in ("dedup_clusters", "graph_pagerank"):
        before = sc._jsc.getPersistentRDDs().size()
        specs[name].build(spark, SF_CORRECT).write.mode("overwrite").format(
            "noop"
        ).save()
        after = sc._jsc.getPersistentRDDs().size()
        assert after - before <= 2, (name, before, after)


def _pinned_rdd_ids(sc) -> set[int]:
    return {e.getKey() for e in sc._jsc.getPersistentRDDs().entrySet().toArray()}


def test_release_result_frees_final_checkpoint(spark):
    """The one pin an iterative op leaves behind (its result frame) is
    releasable by the caller via the public hook, so repeated invocations
    in a long-lived session need not accumulate blocks.

    Asserts on the RESULT FRAME'S OWN LogicalRDD ids (the machinery
    release_result walks), not on the session-global persistent-RDD count —
    the global count is perturbed by other tests in the shared session and
    by the async ContextCleaner, which made the strict-equality form of this
    test order-dependent (red in full-suite runs, green alone)."""
    from slr207_mapreduce_spark.operators.graph import (
        connected_components,
        release_result,
        result_checkpoint_ids,
    )

    sc = spark.sparkContext
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["src", "dst"])
    result = connected_components(edges)
    result.write.mode("overwrite").format("noop").save()
    ids = result_checkpoint_ids(result)
    assert ids, "result frame should pin at least one localCheckpoint block"
    assert ids <= _pinned_rdd_ids(sc), "result blocks must be pinned pre-release"
    release_result(result)
    assert not (ids & _pinned_rdd_ids(sc)), "result blocks must be freed"


def test_release_never_touches_unrelated_pins(spark):
    """Checkpoint ids are derived from each frame's own LogicalRDD, never
    from diffing the session-global persistent-RDD map — so blocks pinned
    by OTHER work in the same session survive an iterative op's cleanup."""
    from slr207_mapreduce_spark.operators.graph import (
        connected_components,
        release_result,
    )

    sc = spark.sparkContext
    bystander = spark.range(100).selectExpr("id", "id * 3 AS v").localCheckpoint()
    bystander_count = bystander.count()
    edges = spark.createDataFrame([(1, 2), (2, 3), (20, 21)], ["src", "dst"])
    result = connected_components(edges)
    result.write.mode("overwrite").format("noop").save()
    release_result(result)
    # the bystander's checkpoint block must still be pinned and readable
    ids = {
        e.getKey()
        for e in sc._jsc.getPersistentRDDs().entrySet().toArray()
    }
    assert bystander._jdf.queryExecution().analyzed().rdd().id() in ids
    assert bystander.count() == bystander_count
    release_result(bystander)


def test_private_api_surface_shape(spark):
    """graph.py's checkpoint release rides private handles
    (``_jdf.queryExecution().analyzed().collectLeaves()`` /
    ``_jsc.getPersistentRDDs()``) because Spark has no public
    localCheckpoint-release API. Pin the exact shapes we touch so a Spark
    upgrade that changes them fails HERE, loudly, instead of silently
    degrading every iterative op (VERDICT r3, next-round item #9)."""
    df = spark.range(3).localCheckpoint(eager=True)
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        leaves = analyzed.collectLeaves()
        assert leaves.size() >= 1
        leaf = leaves.apply(0)
        assert leaf.getClass().getName().endswith("LogicalRDD")
        rdd_id = leaf.rdd().id()
        assert isinstance(rdd_id, int)
        entries = spark.sparkContext._jsc.getPersistentRDDs().entrySet().toArray()
        ids = {e.getKey() for e in entries}
        assert rdd_id in ids
        for e in entries:
            if e.getKey() == rdd_id:
                e.getValue().unpersist(False)
    finally:
        del df


def test_missing_private_api_degrades_to_bounded_leak(spark):
    """If the private surface disappears (Spark upgrade / Connect), the
    release machinery must degrade to the documented bounded leak — keep
    blocks pinned — never crash and never free unowned blocks."""
    from slr207_mapreduce_spark.operators.graph import (
        release_result,
        result_checkpoint_ids,
    )

    class _Broken:
        """Duck-typed frame whose private handle raises (simulates a
        changed/absent _jdf surface)."""

        sparkSession = spark

        @property
        def _jdf(self):
            raise AttributeError("queryExecution surface changed")

    broken = _Broken()
    assert result_checkpoint_ids(broken) == set()
    release_result(broken)  # must not raise

    # and a real bystander checkpoint survives the degraded path
    bystander = spark.range(10).localCheckpoint(eager=True)
    before = result_checkpoint_ids(bystander)
    assert before
    release_result(broken)
    assert before <= _pinned_rdd_ids(spark.sparkContext)
    release_result(bystander)


def test_bfs_distances_hand_graph(spark):
    """Chain 1-2-3-4-5 seeded at 1; isolated pair 10-11 unreachable; seed 99
    absent from the edge list still reports dist 0."""
    from slr207_mapreduce_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,), (99,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 99: 0}


def test_bfs_distances_hop_bound_and_symmetry(spark):
    """max_hops truncates the result set (not the values); edges propagate
    both directions (undirected semantics)."""
    from slr207_mapreduce_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # node 4 is 3 hops out — excluded


def test_bfs_releases_round_checkpoints(spark):
    """BFS keeps only its result frame pinned (same hygiene contract as the
    other iterative operators)."""
    from slr207_mapreduce_spark.operators.graph import bfs_distances, release_result

    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    before = _pinned_rdd_ids(spark.sparkContext)
    res = bfs_distances(edges, seeds, max_hops=15)
    res.write.mode("overwrite").format("noop").save()
    leaked = _pinned_rdd_ids(spark.sparkContext) - before
    assert len(leaked) <= 1  # at most the result frame's own checkpoint
    release_result(res)


def test_checkpointing_queries_pin_only_their_result(spark):
    """Queries that materialize an internal frame (triangle counter's
    oriented edge list, equi-depth histogram's sorted layout) may keep at
    most that one materialization pinned per invocation, and
    release_result must free it."""
    from tests.conftest import SF_CORRECT
    from slr207_mapreduce_spark.operators.graph import release_result
    from slr207_mapreduce_spark.plans.base import all_queries

    specs = all_queries()
    for name in ("graph_triangle_count", "agg_histogram_equidepth"):
        before = _pinned_rdd_ids(spark.sparkContext)
        df = specs[name].build(spark, SF_CORRECT)
        df.write.mode("overwrite").format("noop").save()
        leaked = _pinned_rdd_ids(spark.sparkContext) - before
        assert len(leaked) <= 2, (name, leaked)
        release_result(df)
        still = _pinned_rdd_ids(spark.sparkContext) - before
        # release frees every LogicalRDD leaf the result frame owns
        assert len(still) < max(1, len(leaked)) or not leaked, (name, still)


def test_private_api_adapter_probe_and_degradation(spark):
    """internal/spark_private is the one module allowed to touch Spark
    private handles. Pin (a) the capability probe passes on THIS Spark
    build (the version-pin that used to live implicitly in graph.py), and
    (b) when the probe reports incapable, every adapter degrades to the
    bounded-leak contract: empty ids, no-op release, no exceptions."""
    from slr207_mapreduce_spark.internal import spark_private as sp

    report = sp.probe_report(spark)
    assert report["capable"], (
        f"private checkpoint-release surface probe failed on Spark "
        f"{report['spark_version']} — the graph operators are now on the "
        "bounded-leak path; update internal/spark_private.py for this version"
    )
    # Version pin (r07 verdict item 7): a Spark minor bump must fail HERE,
    # by name, before anyone debugs a silent bounded-leak fallback. On a
    # legitimate upgrade: re-run this test (the probe exercises the full
    # private surface) and append the new minor to VALIDATED_SPARK_MINORS.
    assert report["validated_minor"], (
        f"Spark {report['spark_version']} is not in "
        f"VALIDATED_SPARK_MINORS={sp.VALIDATED_SPARK_MINORS} — re-validate "
        "internal/spark_private.py against this build and extend the pin"
    )
    ck = spark.range(3).localCheckpoint(eager=True)
    ids = sp.checkpointed_rdd_id(ck)
    assert len(ids) == 1
    assert sp.logical_rdd_leaf_ids(ck.select((F.col("id") * 2).alias("x"))) == ids
    sp.unpersist_rdd_ids(spark.sparkContext, ids)

    # simulate an incompatible build: all adapters must degrade, not raise.
    # The verdict cache is keyed per session (r06 ADVICE), so poisoning
    # this session's entry must not require touching a process global.
    try:
        sp._CAPABLE[spark] = False
        ck2 = spark.range(2).localCheckpoint(eager=True)
        assert sp.checkpointed_rdd_id(ck2) == set()
        assert sp.logical_rdd_leaf_ids(ck2) == set()
        sp.unpersist_rdd_ids(spark.sparkContext, set())  # no-op, no raise
        # the operators still produce CORRECT results on the degraded path
        from slr207_mapreduce_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src long, dst long"
        )
        got = {
            (r["node"], r["cluster_id"])
            for r in connected_components(edges).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    finally:
        sp._CAPABLE.pop(spark, None)


def test_connected_components_rounds_flat_under_replication(spark):
    """The O(diameter) claim behind the emb_sf10 SCALE.md row: replicating
    a component K times (disjoint id ranges) grows N by K but leaves every
    component's diameter unchanged, so the min-label propagation must
    converge in EXACTLY the same number of rounds. on_round exposes the
    count; a round count that grows with N here would mean label
    propagation is coupling components (an engine bug)."""
    from slr207_mapreduce_spark.operators.graph import connected_components

    def path_edges(shift):
        return [(shift + i, shift + i + 1) for i in range(6)]  # diameter 6

    def rounds_for(n_copies):
        edges = [e for c in range(n_copies) for e in path_edges(c * 1000)]
        df = spark.createDataFrame(edges, "src long, dst long")
        seen = []
        out = connected_components(
            df, on_round=lambda r, changed: seen.append((r, changed))
        )
        n = out.count()
        assert n == 7 * n_copies
        assert seen[-1][1] == 0  # converged: last round changed nothing
        return len(seen)

    r1, r8 = rounds_for(1), rounds_for(8)
    assert r1 == r8, f"round count grew with replication: {r1} -> {r8}"
