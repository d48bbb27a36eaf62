

def test_tracked_broadcast_retires_previous_but_keeps_it_usable(spark):
    """r14 ADVICE item 2: each explicit-broadcast site unpersists its
    previous broadcast when creating a new one (sweeps hold one
    executor-resident copy per site), and the retired broadcast stays
    usable — unpersist keeps the driver copy, so an older lazy plan
    that executes later re-fetches it."""
    from slr207_mapreduce_spark.operators.similarity import (
        _TRACKED_BC,
        tracked_broadcast,
    )

    sc = spark.sparkContext
    b1 = tracked_broadcast(sc, [1, 2], "t_site")
    b2 = tracked_broadcast(sc, [3, 4], "t_site")
    # r15 VERDICT item 4: keyed by (SparkContext identity, site) so two
    # concurrent sessions in one process never retire each other's live
    # broadcasts
    assert _TRACKED_BC[(id(sc), "t_site")] is b2
    rdd = sc.parallelize([0], 1)
    assert rdd.map(lambda _: sum(b1.value)).collect() == [3]  # re-fetch ok
    assert rdd.map(lambda _: sum(b2.value)).collect() == [7]
