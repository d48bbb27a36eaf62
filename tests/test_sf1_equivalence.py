"""sf1 evidence for the 10 oracle-side-superlinear queries (r06 VERDICT
item 2).

These queries pass the exact-value DuckDB gate at sf0.01 and sf0.1 but are
excluded from the sf1 (10x) oracle sweep because their ORACLE is
superlinear there (brute-force pair enumeration, per-user recursive CTEs,
all-pairs verification tiers). Their Spark sides still need >=sf1
exactness evidence of their own, so each test here verifies the FULL-sf1
Spark run against an independent exact mirror:

- The knn_* family and embedding_neardup_pairs are deterministic,
  fully-specified computations, so the mirror is a numpy re-derivation of
  the exact same IEEE/integer arithmetic (sequential f64 folds, fixed-
  point floors, lexicographic tie-breaks) over the full 20k-vector sf1
  corpus — full-result equality, bit-exact floats included.
- The pair/dedup text queries (ngram_jaccard, minhash_estimator_error)
  restrict to a deterministic md5 stratum of documents (pair membership
  and pair values depend only on the two endpoint docs, so restricting
  the FULL-sf1 result to stratum endpoints is exactly the stratum-only
  computation) and compare against a pure-Python exact mirror.
- dedup_simhash_pairs emits 293M rows at sf1, so equality is checked two
  ways: global per-hamming counts vs a combinatorial count over the
  signature histogram, plus exact row-set equality on the md5 stratum.
- dedup_semantic_clusters = union-find over the embedding_neardup_pairs
  mirror (min-label components), full-result equality.
- events_sessionization_capped_segmented is Spark-vs-Spark: exceptAll in
  both directions against events_sessionization_capped (same oracle,
  different execution strategy) over the full 1M-event sf1 table.

The mirrors intentionally re-implement the arithmetic from the spec (not
by importing the operators), so a drift in either side fails the test.
"""

from __future__ import annotations

import hashlib
import os
from itertools import combinations

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

# slow: the sf1 tier is the >30 s scale class (r15 VERDICT item 2)
pytestmark = [pytest.mark.sf1, pytest.mark.slow]


@pytest.fixture(scope="module")
def sf1():
    import sys

    sys.path.insert(0, REPO)
    from tools.make_sf import ensure_sf1

    return ensure_sf1(REPO)


@pytest.fixture(scope="module")
def specs():
    from slr207_mapreduce_spark.plans.base import all_queries

    return all_queries()


@pytest.fixture(scope="module")
def emb(sf1):
    """(ids int64[N], V float32[N,64]) sorted by vec_id."""
    import duckdb

    con = duckdb.connect()
    t = con.sql(
        f"SELECT vec_id, embedding FROM '{sf1}/embeddings.parquet' ORDER BY vec_id"
    ).fetchnumpy()
    ids = t["vec_id"].astype(np.int64)
    V = np.stack([np.asarray(e, dtype=np.float32) for e in t["embedding"]])
    return ids, V


# --- exact-arithmetic helpers (the spec, re-derived) ----------------------


def _seq_dot_mat(q64: np.ndarray, V64: np.ndarray) -> np.ndarray:
    """Sequential-fold f64 dot of one query against every row: matches
    Spark's aggregate(zip_with(...)) left fold (add per dim, in order)."""
    acc = np.zeros(V64.shape[0])
    for j in range(V64.shape[1]):
        acc = acc + q64[j] * V64[:, j]
    return acc


def _seq_self_dot(V64: np.ndarray) -> np.ndarray:
    acc = np.zeros(V64.shape[0])
    for j in range(V64.shape[1]):
        acc = acc + V64[:, j] * V64[:, j]
    return acc


def _topk(ids_arr, key_desc, k):
    """row_number() over (key DESC, id ASC) <= k — lexicographic order."""
    order = np.lexsort((ids_arr, -key_desc))
    return order[:k]


def _md5_stratum(x: int, mod: int = 16) -> bool:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) % mod == 0


_STRATUM_SQL = (
    "CAST(conv(substring(md5(cast({col} as string)), 1, 15), 16, 10) AS BIGINT)"
    " % 16 = 0"
)


# --- knn family: full-corpus numpy mirrors --------------------------------


def test_sf1_knn_bruteforce_exact(spark, sf1, specs, emb):
    ids, V = emb
    V64 = V.astype(np.float64)
    norms = np.sqrt(_seq_self_dot(V64))
    expected = set()
    for qi in np.where(ids < 10)[0]:
        dots = _seq_dot_mat(V64[qi], V64)
        cos = dots / (norms[qi] * norms)
        mask = ids != ids[qi]
        nid, c = ids[mask], cos[mask]
        for rank, pos in enumerate(_topk(nid, c, 5), start=1):
            expected.add((int(ids[qi]), int(nid[pos]), float(c[pos]), rank))
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in specs["knn_bruteforce"].build(spark, sf1).collect()
    }
    assert got == expected


def test_sf1_knn_quantized_int8_exact(spark, sf1, specs, emb):
    ids, V = emb
    V64 = V.astype(np.float64)
    nrm = np.sqrt(_seq_self_dot(V64))
    codes = np.floor(V64 / nrm[:, None] * 127).astype(np.int64)
    qm, cm = ids < 5, ids >= 5
    iscore = codes[qm] @ codes[cm].T  # integer, order-free
    expected = set()
    for qi, qid in enumerate(ids[qm]):
        for rank, pos in enumerate(_topk(ids[cm], iscore[qi], 3), start=1):
            expected.add((int(qid), int(ids[cm][pos]), int(iscore[qi][pos]), rank))
    got = {
        (r["query_id"], r["neighbor_id"], r["iscore"], r["rank"])
        for r in specs["knn_quantized_int8"].build(spark, sf1).collect()
    }
    assert got == expected


def _jl_sign(j: int, k: int) -> int:
    return 1 if int(hashlib.md5(f"{j},{k}".encode()).hexdigest(), 16) % 2 == 0 else -1


def test_sf1_knn_jl_rerank_exact(spark, sf1, specs, emb):
    ids, V = emb
    V64 = V.astype(np.float64)
    S = np.array([[_jl_sign(j, k) for k in range(16)] for j in range(64)], dtype=np.int64)
    P = np.floor(V64 * 1e6).astype(np.int64) @ S  # exact integers
    norms = np.sqrt(_seq_self_dot(V64))
    from slr207_mapreduce_spark.operators.similarity import auto_jl_shortlist

    jl_short = auto_jl_shortlist(len(ids))  # registered config is "auto"
    expected = set()
    for qi in np.where(ids < 10)[0]:
        pdot = P @ P[qi]
        mask = ids != ids[qi]
        short = _topk(ids[mask], pdot[mask], jl_short)
        sids = ids[mask][short]
        spos = np.searchsorted(ids, sids)  # ids are sorted unique
        dots = _seq_dot_mat(V64[qi], V64[spos])
        cos = dots / (norms[qi] * norms[spos])
        for rank, pos in enumerate(_topk(sids, cos, 5), start=1):
            expected.add((int(ids[qi]), int(sids[pos]), float(cos[pos]), rank))
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in specs["knn_jl_rerank"].build(spark, sf1).collect()
    }
    assert got == expected


def test_sf1_knn_pq_adc_exact(spark, sf1, specs, emb):
    from slr207_mapreduce_spark.operators.similarity import auto_pq_rerank

    ids, V = emb
    m, sub_dim, ksub, k = 8, 8, 16, 5
    rerank = auto_pq_rerank(len(ids))  # registered config is "auto"
    V64 = V.astype(np.float64)
    cent_pos = np.where(ids < ksub)[0]

    def sub(V64s, s):
        return V64s[:, s * sub_dim : (s + 1) * sub_dim]

    # d2[v, s, c] = floor(((aa - 2.0*ab) + bb) * 1e9) with sequential folds
    def d2_tensor(rows):
        out = np.empty((len(rows), m, ksub), dtype=np.int64)
        for s in range(m):
            a = sub(V64[rows], s)
            b = sub(V64[cent_pos], s)
            aa = _seq_self_dot(a)
            bb = _seq_self_dot(b)
            ab = np.zeros((len(rows), ksub))
            for j in range(sub_dim):
                ab = ab + a[:, j][:, None] * b[:, j][None, :]
            out[:, s, :] = np.floor(((aa[:, None] - 2.0 * ab) + bb[None, :]) * 1e9).astype(np.int64)
        return out

    all_rows = np.arange(len(ids))
    d2 = d2_tensor(all_rows)
    codes = d2.argmin(axis=2)  # first min = (d2 asc, cid asc); cid == centroid order
    # centroid ids are ids[cent_pos] (vec_id < ksub), tie-break is on cid
    # value; cent_pos is sorted by vec_id so argmin order == cid order
    q_pos = np.where(ids < 10)[0]
    qd2 = d2[q_pos]  # queries are corpus rows; same tensor
    norms = np.sqrt(_seq_self_dot(V64))
    expected = set()
    for qi, qpos in enumerate(q_pos):
        adc = np.zeros(len(ids), dtype=np.int64)
        for s in range(m):
            adc += qd2[qi, s, codes[:, s]]
        mask = ids != ids[qpos]
        cand = _topk(ids[mask], -adc[mask].astype(np.float64), rerank)
        # (approx_d2 ASC, doc_id ASC): negate for the desc-shaped helper;
        # int64 -> f64 is exact here (|d2 sum| << 2^53)
        cids = ids[mask][cand]
        cpos = np.searchsorted(ids, cids)
        dots = _seq_dot_mat(V64[qpos], V64[cpos])
        cos = dots / (norms[qpos] * norms[cpos])
        for rank, pos in enumerate(_topk(cids, cos, k), start=1):
            expected.add((int(ids[qpos]), int(cids[pos]), float(cos[pos]), rank))
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in specs["knn_pq_adc"].build(spark, sf1).collect()
    }
    assert got == expected


# --- embedding pair family ------------------------------------------------


def _neardup_mirror(ids, V):
    """Exact mirror of cosine_neardup_pairs(threshold=0.2, bits=8)."""
    V64 = V.astype(np.float64)
    norms = np.sqrt(_seq_self_dot(V64))
    bucket = np.zeros(len(ids), dtype=np.int64)
    for j in range(8):
        bucket += (V[:, j] > 0).astype(np.int64) << j
    pairs = []
    for b in np.unique(bucket):
        rows = np.where(bucket == b)[0]
        rows = rows[np.argsort(ids[rows])]
        for i in range(len(rows) - 1):
            a = rows[i]
            rest = rows[i + 1 :]
            dots = _seq_dot_mat(V64[a], V64[rest])
            cos = dots / (norms[a] * norms[rest])
            keep = cos >= 0.2
            for rpos, cval in zip(rest[keep], cos[keep]):
                pairs.append((int(ids[a]), int(ids[rpos]), float(cval)))
    return pairs


@pytest.fixture(scope="module")
def neardup_pairs(emb):
    return _neardup_mirror(*emb)


def test_sf1_embedding_neardup_pairs_exact(spark, sf1, specs, neardup_pairs):
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in specs["embedding_neardup_pairs"].build(spark, sf1).collect()
    }
    assert got == set(neardup_pairs)


def test_sf1_dedup_semantic_clusters_exact(spark, sf1, specs, neardup_pairs):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in neardup_pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    expected = set()
    for members in comp.values():
        lo = min(members)
        expected.update((n, lo) for n in members)
    got = {
        (r["node"], r["cluster_id"])
        for r in specs["dedup_semantic_clusters"].build(spark, sf1).collect()
    }
    assert got == expected


# --- simhash pairs (293M rows at sf1: aggregate + stratum) ----------------


def test_sf1_dedup_simhash_pairs_counts_and_stratum(spark, sf1, specs):
    from pyspark.sql import functions as F

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in specs["dedup_simhash"].build(spark, sf1).collect()
    }
    # (a) global per-hamming counts, combinatorially from the signature
    # histogram (the 293M pairs are never materialized on either side)
    hist: dict[int, int] = {}
    for v in sigs.values():
        hist[v] = hist.get(v, 0) + 1
    masks = [0] + [1 << i for i in range(16)] + [
        (1 << i) | (1 << j) for i in range(16) for j in range(i + 1, 16)
    ]
    expected_by_ham = {0: 0, 1: 0, 2: 0}
    for v, n in hist.items():
        for mk in masks:
            u = v ^ mk
            if mk == 0:
                expected_by_ham[0] += n * (n - 1) // 2
            elif u > v and u in hist:
                expected_by_ham[bin(mk).count("1")] += n * hist[u]
    full = specs["dedup_simhash_pairs"].build(spark, sf1)
    got_by_ham = {
        r["hamming"]: r["n"]
        for r in full.groupBy("hamming").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_by_ham == {h: c for h, c in expected_by_ham.items() if c > 0}

    # (b) exact row-set equality on the deterministic md5 stratum
    strat_ids = {d for d in sigs if _md5_stratum(d)}
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in full.where(
            F.expr(_STRATUM_SQL.format(col="doc_a"))
            & F.expr(_STRATUM_SQL.format(col="doc_b"))
        ).collect()
    }
    sl = sorted(strat_ids)
    sv = np.array([sigs[d] for d in sl], dtype=np.int64)
    sa = np.array(sl, dtype=np.int64)
    x = sv[:, None] ^ sv[None, :]
    ham = np.array([bin(v).count("1") for v in range(1 << 16)])[x]
    ia, ib = np.where(np.triu(ham <= 2, k=1))
    expected = {(int(sa[i]), int(sa[j]), int(ham[i, j])) for i, j in zip(ia, ib)}
    assert got == expected
    assert len(expected) > 0  # the stratum actually exercises pairs


# --- text pair family: stratum mirrors ------------------------------------


def _stratum_docs(sf1):
    import duckdb

    con = duckdb.connect()
    rows = con.sql(f"SELECT doc_id, text FROM '{sf1}/documents.parquet'").fetchall()
    return {d: t for d, t in rows if _md5_stratum(d)}


def _shingle_sets(docs: dict[int, str], n: int = 3) -> dict[int, set]:
    out = {}
    for d, text in docs.items():
        t = text.split(" ")
        out[d] = (
            {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}
            if len(t) >= n
            else set()
        )
    return out


def _exact_jaccard_pairs(sh: dict[int, set], threshold: float):
    inv: dict[str, list[int]] = {}
    for d, ss in sh.items():
        for s in ss:
            inv.setdefault(s, []).append(d)
    inter: dict[tuple[int, int], int] = {}
    for bucket in inv.values():
        bucket.sort()
        for a, b in combinations(bucket, 2):
            inter[(a, b)] = inter.get((a, b), 0) + 1
    out = {}
    for (a, b), i in inter.items():
        j = float(i) / float(len(sh[a]) + len(sh[b]) - i)
        if j >= threshold:
            out[(a, b)] = j
    return out


def test_sf1_dedup_ngram_jaccard_stratum_exact(spark, sf1, specs):
    from pyspark.sql import functions as F

    docs = _stratum_docs(sf1)
    expected = {
        (a, b, j)
        for (a, b), j in _exact_jaccard_pairs(_shingle_sets(docs), 0.5).items()
    }
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in specs["dedup_ngram_jaccard"]
        .build(spark, sf1)
        .where(
            F.expr(_STRATUM_SQL.format(col="doc_a"))
            & F.expr(_STRATUM_SQL.format(col="doc_b"))
        )
        .collect()
    }
    assert got == expected
    assert len(expected) > 0


def _lane_hash(pair: int, lane: int, s: str) -> int:
    h = hashlib.md5(f"s{pair}|{s}".encode()).hexdigest()
    return int(h[16 * lane : 16 * lane + 15], 16)


def test_sf1_dedup_minhash_estimator_error_stratum_exact(spark, sf1, specs):
    from pyspark.sql import functions as F

    docs = _stratum_docs(sf1)
    sh = _shingle_sets(docs)
    exact = _exact_jaccard_pairs(sh, 0.0)
    # 6-hash minhash signatures (lane hashes of 3 md5 digest pairs)
    sigs = {
        d: tuple(
            min((_lane_hash(s // 2, s % 2, x) for x in ss), default=None)
            for s in range(6)
        )
        for d, ss in sh.items()
        if ss
    }
    # LSH candidates: md5 band keys over (h0,h1) (h2,h3) (h4,h5)
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, hs in sigs.items():
        for b in range(3):
            key = hashlib.md5(f"{hs[2 * b]}_{hs[2 * b + 1]}".encode()).hexdigest()
            buckets.setdefault((b, key), []).append(d)
    cand = set()
    for members in buckets.values():
        members.sort()
        cand.update(combinations(members, 2))
    expected = set()
    for a, b in cand:
        agree = sum(1 for s in range(6) if sigs[a][s] == sigs[b][s])
        est = float(agree) / 6.0
        ex = exact.get((a, b), 0.0)
        expected.add((a, b, est, ex, abs(est - ex)))
    got = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"], r["exact_jaccard"], r["abs_err"])
        for r in specs["dedup_minhash_estimator_error"]
        .build(spark, sf1)
        .where(
            F.expr(_STRATUM_SQL.format(col="doc_a"))
            & F.expr(_STRATUM_SQL.format(col="doc_b"))
        )
        .collect()
    }
    assert got == expected
    assert len(expected) > 0


# --- segmented sessionizer: Spark-vs-Spark over the full sf1 table --------


def test_sf1_sessionizer_segmented_equals_loop(spark, sf1, specs):
    loop = specs["events_sessionization_capped"].build(spark, sf1)
    seg = specs["events_sessionization_capped_segmented"].build(spark, sf1)
    assert set(loop.columns) == set(seg.columns), (loop.columns, seg.columns)
    seg_c = seg.select(*loop.columns)  # align column order for exceptAll
    assert seg_c.exceptAll(loop).count() == 0
    assert loop.exceptAll(seg_c).count() == 0


# --- r12 additions: full sf1 Spark-vs-DuckDB exactness (r12 VERDICT
# item 6 — every earlier round's new queries carried sf1-tier evidence;
# these two oracles ARE tractable at sf1: 15.5 s / 1.4 s in DuckDB) -----


def _duck_sf1_views(sf1):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{os.path.join(sf1, t + '.parquet')}')"
        )
    return con


def test_sf1_embedding_kmeans_train_oracle_exact(spark, sf1, specs):
    """The trained-quantizer fit over the full 20k-vector sf1 corpus vs
    the DuckDB end-to-end training replay: every centroid component on
    the 1e-6 grid plus every cell population, exact-integer equality."""
    spec = specs["embedding_kmeans_train"]
    got = sorted(tuple(r) for r in spec.build(spark, sf1).collect())
    con = _duck_sf1_views(sf1)
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    con.close()
    assert len(got) > 256 * 8  # >= isqrt(20k)=141 cells x 64 dims... sanity
    assert got == want


def test_sf1_estimator_countmin_bounds_oracle_exact(spark, sf1, specs):
    """The count-min epsilon-delta certificate over the full sf1 document
    corpus vs DuckDB — all four geometries, integer-exact violation
    counters and bound_held verdicts."""
    spec = specs["estimator_countmin_bounds"]
    got = sorted(tuple(r) for r in spec.build(spark, sf1).collect())
    con = _duck_sf1_views(sf1)
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    con.close()
    assert len(got) == 4
    assert got == want
