"""Sanity for the generated scale tiers (tools/make_sf.py): the sf1 data
the bench and scale gates run on must actually be what the generator
promises — 10x row counts, intact referential integrity per copy, and
near-dup (not byte-identical) replicated documents."""

from __future__ import annotations

import os

import duckdb

REPO = os.path.join(os.path.dirname(__file__), "..")


def _sf1():
    import sys

    sys.path.insert(0, REPO)
    from tools.make_sf import ensure_sf1

    return ensure_sf1(REPO)


def test_sf1_tier_counts_and_integrity():
    out = _sf1()
    con = duckdb.connect()
    base = "/root/testdata/sf0.1"
    for t, key in (
        # lineitem's composite key is non-unique even in the source data,
        # so the invariant is distinct-count scaling, not uniqueness
        ("lineitem", "(l_orderkey, l_linenumber, l_partkey)"),
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        n0 = con.sql(f"SELECT COUNT(*) FROM '{base}/{t}.parquet'").fetchone()[0]
        k0 = con.sql(f"SELECT COUNT(DISTINCT {key}) FROM '{base}/{t}.parquet'").fetchone()[0]
        n1 = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        nk = con.sql(f"SELECT COUNT(DISTINCT {key}) FROM '{out}/{t}.parquet'").fetchone()[0]
        assert n1 == 10 * n0, (t, n0, n1)
        assert nk == 10 * k0, f"{t}: key strides collided across copies"

    # referential integrity holds copy-by-copy: zero orphans
    orphans = con.sql(
        f"SELECT COUNT(*) FROM '{out}/lineitem.parquet' l "
        f"WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM '{out}/orders.parquet')"
    ).fetchone()[0]
    assert orphans == 0
    orphans2 = con.sql(
        f"SELECT COUNT(*) FROM '{out}/orders.parquet' o "
        f"WHERE o.o_custkey NOT IN (SELECT c_custkey FROM '{out}/customer.parquet')"
    ).fetchone()[0]
    assert orphans2 == 0

    # documents replicate as NEAR-dups (per-copy suffix token): the base
    # corpus's intentional exact-dup groups persist WITHIN each copy
    # (dedup_exact's fixture, 10x the groups) but never merge ACROSS
    # copies (max multiplicity unchanged); n_chars stays consistent
    base_groups, base_max = con.sql(
        f"SELECT COUNT(*), MAX(c) FROM (SELECT COUNT(*) AS c FROM "
        f"'{base}/documents.parquet' GROUP BY text HAVING COUNT(*) > 1)"
    ).fetchone()
    sf1_groups, sf1_max = con.sql(
        f"SELECT COUNT(*), MAX(c) FROM (SELECT COUNT(*) AS c FROM "
        f"'{out}/documents.parquet' GROUP BY text HAVING COUNT(*) > 1)"
    ).fetchone()
    assert sf1_groups == 10 * base_groups
    assert sf1_max == base_max, "exact dups merged across copies"
    bad_nchars = con.sql(
        f"SELECT COUNT(*) FROM '{out}/documents.parquet' WHERE n_chars != LENGTH(text)"
    ).fetchone()[0]
    assert bad_nchars == 0

    # embeddings: per-copy epsilon keeps every vector distinct (no ties)
    dup_vecs = con.sql(
        f"SELECT COUNT(*) FROM (SELECT embedding FROM '{out}/embeddings.parquet' "
        "GROUP BY embedding HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    assert dup_vecs == 0
