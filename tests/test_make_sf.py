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


def test_emb_sf10_tier_structure():
    """The emb_sf10 tier's scale claim rests on two constructed invariants
    (r07 VERDICT item 3): (a) each of the 10 rotation groups is an
    orthogonal transform of the same sf1-design block, so WITHIN-group
    cosine structure — pairs, clusters, diameters — is exactly sf1's and
    total structure grows linearly; (b) groups are disjoint id ranges.
    Verify the rotation/epsilon arithmetic against the sf0.1 source."""
    import sys

    import numpy as np

    sys.path.insert(0, REPO)
    from tools.make_sf import STRIDE, ensure_emb_sf10

    out = ensure_emb_sf10(REPO)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1/embeddings.parquet"
    tier = os.path.join(out, "embeddings.parquet")

    n_src, dim = con.execute(
        f"SELECT COUNT(*), MAX(len(embedding)) FROM '{src}'"
    ).fetchone()
    n, n_ids = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT vec_id) FROM '{tier}'"
    ).fetchone()
    assert n == 100 * n_src and n_ids == n

    # spot-check copy c = 10*g + k of a source vector: rotate by g, add eps*k
    orig = dict(
        con.execute(f"SELECT vec_id, embedding FROM '{src}' WHERE vec_id < 3").fetchall()
    )
    for vec_id, g, k in ((0, 0, 0), (1, 0, 7), (2, 3, 0), (0, 9, 9)):
        c = 10 * g + k
        got = con.execute(
            f"SELECT embedding FROM '{tier}' WHERE vec_id = {vec_id + c * STRIDE}"
        ).fetchone()[0]
        base = orig[vec_id]
        # DuckDB adds FLOAT + (decimal cast to FLOAT) in float32, so the
        # mirror must stay in float32 end-to-end
        eps = np.float32(0.0001 * k)
        want = [
            float(np.float32(base[(i + g) % dim]) + eps) for i in range(dim)
        ]
        assert np.allclose(got, want, rtol=0, atol=0), (vec_id, c)


def test_tpch_sf10_tier_counts():
    """tpch_sf10 (the join-family decade tier) must be exactly 100 disjoint
    sf0.1 copies: linear row growth, per-copy referential integrity (key
    shift applied consistently on both sides of every FK). Skipped unless
    the tier is already on disk — building 1.8 GB inside unit tests would
    dominate suite wall time; the bench/SCALE.md runs build it."""
    import pytest

    tier = os.path.join(REPO, ".sfgen", "tpch_sf10")
    if not os.path.exists(os.path.join(tier, "lineitem.parquet")):
        pytest.skip("tpch_sf10 not built (created by the scale measurement runs)")
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    for t in ("lineitem", "orders", "customer", "supplier", "part"):
        n_src = con.execute(f"SELECT COUNT(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        n = con.execute(f"SELECT COUNT(*) FROM '{tier}/{t}.parquet'").fetchone()[0]
        assert n == 100 * n_src, t
    # FK integrity per copy: every order's customer exists (copy-local join)
    orphans = con.execute(
        f"SELECT COUNT(*) FROM '{tier}/orders.parquet' o "
        f"LEFT JOIN '{tier}/customer.parquet' c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0


def test_docs_and_events_sf10_tier_counts():
    """Late-added integrity pins for the r07 sf10 tiers (the r08 tiers got
    theirs at birth): docs_sf10 must hold exactly 100 schema-consistent
    copies with the designed duplicate structure (copies 1-9 near-dup
    suffixes, copies 10-99 per-token markers — no shared shingles), and
    events_sf10 exactly 100 disjoint user populations with untouched
    timestamps. Skipped until the tiers exist on disk (the scale runs
    build them)."""
    import pytest

    docs = os.path.join(REPO, ".sfgen", "docs_sf10", "documents.parquet")
    events = os.path.join(REPO, ".sfgen", "events_sf10", "events.parquet")
    if not (os.path.exists(docs) and os.path.exists(events)):
        pytest.skip("sf10 tiers not built (created by the scale measurement runs)")
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"

    n_src = con.execute(f"SELECT COUNT(*) FROM '{src}/documents.parquet'").fetchone()[0]
    n, n_ids, bad_len = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT doc_id), "
        f"COUNT(*) FILTER (WHERE n_chars <> LENGTH(text)) FROM '{docs}'"
    ).fetchone()
    assert (n, n_ids, bad_len) == (100 * n_src, 100 * n_src, 0)
    # copy 0 is byte-identical to the source; copy 42 shares no tokens
    diff0 = con.execute(
        f"SELECT COUNT(*) FROM (SELECT text FROM '{docs}' WHERE doc_id < 10000000 "
        f"EXCEPT SELECT text FROM '{src}/documents.parquet')"
    ).fetchone()[0]
    assert diff0 == 0
    shared = con.execute(
        f"""SELECT COUNT(*) FROM (
          SELECT UNNEST(string_split(text, ' ')) AS t FROM '{docs}'
          WHERE doc_id >= 420000000 AND doc_id < 420010000
          INTERSECT
          SELECT UNNEST(string_split(text, ' ')) FROM '{src}/documents.parquet'
          USING SAMPLE 1000 ROWS (reservoir, 7)
        )"""
    ).fetchone()[0]
    assert shared == 0  # per-token 'c42' markers leave no shared vocabulary

    n_esrc = con.execute(f"SELECT COUNT(*) FROM '{src}/events.parquet'").fetchone()[0]
    ne, ne_ids, ts_diff = con.execute(
        f"""SELECT COUNT(*), COUNT(DISTINCT event_id),
            (SELECT COUNT(*) FROM (
               SELECT ts FROM '{events}' WHERE event_id < 10000000
               EXCEPT SELECT ts FROM '{src}/events.parquet'))
            FROM '{events}'"""
    ).fetchone()
    assert (ne, ne_ids, ts_diff) == (100 * n_esrc, 100 * n_esrc, 0)


def test_emb_clustered_tier_structure():
    """The clustered embeddings fixture (r13): md5-deterministic mixture
    with 16 components — schema matches the embeddings table, labels
    cover all components, within-component cosine is high and
    cross-component near zero (the separation the trained-quantizer and
    SemDeDup measurements rely on), and regeneration is byte-stable."""
    import numpy as np

    from tools.make_sf import ensure_emb_clustered

    out = ensure_emb_clustered(REPO, n=500, k=16)
    path = os.path.join(out, "embeddings.parquet")
    con = duckdb.connect()
    schema = con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
    assert [(c[0], c[1]) for c in schema] == [
        ("vec_id", "BIGINT"), ("embedding", "FLOAT[]"), ("label", "INTEGER"),
    ]
    t = con.sql(f"SELECT vec_id, embedding, label FROM '{path}' ORDER BY vec_id").fetchnumpy()
    ids = t["vec_id"]
    lab = t["label"]
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"]])
    assert len(ids) == 500 and mat.shape[1] == 64
    assert set(lab.tolist()) == set(range(16))
    nrm = np.linalg.norm(mat, axis=1)
    assert (nrm > 0).all()
    cos = (mat @ mat.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(ids), 1)
    same = (lab[:, None] == lab[None, :])[iu]
    assert cos[iu][same].mean() > 0.7    # components are tight
    assert abs(cos[iu][~same].mean()) < 0.1  # and mutually near-orthogonal
    assert cos[iu][same].mean() - np.percentile(cos[iu][~same], 99) > 0.3
    # determinism: md5-derived, no RNG — a rebuild must be byte-identical
    before = open(path, "rb").read()
    os.remove(path)
    ensure_emb_clustered(REPO, n=500, k=16)
    assert open(path, "rb").read() == before
