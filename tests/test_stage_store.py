"""Persisted shared-stage lifecycle: dedup_candidates and
copurchase_census round-trip through the fingerprint-keyed index
store (the ann_index lifecycle applied to the two remaining shared
stages — build once, every consumer reads the materialization,
rebuild only when the source table's fingerprint changes)."""

import glob
import os

from nova_pulsar_spark.operators import dedup as D
from nova_pulsar_spark.operators import graphs as G
from nova_pulsar_spark.operators.ann_index import index_root


def _write_docs(spark, path, seed, n=10):
    # pairs of identical texts -> identical minhash -> guaranteed LSH
    # candidate pairs; texts vary with `seed` so a rewritten corpus
    # yields different signatures AND a different file fingerprint
    rows = [
        (
            i,
            f"alpha beta gamma delta epsilon zeta eta theta doc{(i // 2) * 7 + seed}",
            "en",
            "web",
            60,
        )
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_lineitem(spark, path, seed, n_orders=6):
    # each order is a basket of 3 parts drawn from a small pool, so the
    # co-purchase graph has repeated (weighted) edges and triangles
    rows = []
    for o in range(n_orders):
        for j in range(3):
            rows.append((o, (o + j * 2 + seed) % 7 + 1))
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.mode(
        "overwrite"
    ).parquet(f"{path}/lineitem.parquet")


def _data_mtimes(kind):
    files = sorted(glob.glob(os.path.join(index_root(), kind, "*", "data", "*.parquet")))
    return {f: os.path.getmtime(f) for f in files}


def test_dedup_candidates_round_trips_store_and_rebuilds_on_stale(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    d = str(tmp_path / "corpus")
    _write_docs(spark, d, seed=0)

    D._STAGE_CACHE.clear()
    mh, cand, ws = D.dedup_candidates(spark, d)
    pairs1 = sorted((r.doc_a, r.doc_b) for r in cand.collect())
    assert pairs1, "identical-text pairs must produce LSH candidates"
    for kind in ("dedup_mh", "dedup_cand", "dedup_ws"):
        assert glob.glob(os.path.join(index_root(), kind, "*", "_meta.json"))
    mtimes = _data_mtimes("dedup_cand")
    assert mtimes

    # fresh consumer (session memo cleared) READS the store: identical
    # candidates, store data files untouched
    D._STAGE_CACHE.clear()
    _, cand2, _ = D.dedup_candidates(spark, d)
    assert sorted((r.doc_a, r.doc_b) for r in cand2.collect()) == pairs1
    assert _data_mtimes("dedup_cand") == mtimes

    # corpus rewrite (different texts and row count -> new fingerprint)
    # => stale candidates never read, stage rebuilt from the new corpus
    _write_docs(spark, d, seed=9, n=12)
    D._STAGE_CACHE.clear()
    _, cand3, ws3 = D.dedup_candidates(spark, d)
    pairs3 = sorted((r.doc_a, r.doc_b) for r in cand3.collect())
    assert pairs3 and max(b for _, b in pairs3) == 11
    assert len(glob.glob(os.path.join(index_root(), "dedup_cand", "*"))) == 2
    # ws is restricted to candidate members of the NEW corpus
    assert {r.doc_id for r in ws3.collect()} == {x for p in pairs3 for x in p}


def test_copurchase_census_round_trips_store_and_rebuilds_on_stale(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    d = str(tmp_path / "corpus")
    _write_lineitem(spark, d, seed=0)

    G._CENSUS_CACHE.clear()
    c = G.copurchase_census(spark, d)
    edges1 = sorted((r.a, r.b, r.w) for r in c["edges_w"].collect())
    assert edges1
    assert glob.glob(os.path.join(index_root(), "graph_edges_w", "*", "_meta.json"))
    mtimes = _data_mtimes("graph_edges_w")

    # orientation invariant holds on the store-read graph: every edge
    # leaves its lower-(degree, id) endpoint
    deg = {r.v: r.d for r in c["deg"].collect()}
    for r in c["oriented"].collect():
        assert (deg[r.src], r.src) < (deg[r.dst], r.dst)

    G._CENSUS_CACHE.clear()
    c2 = G.copurchase_census(spark, d)
    assert sorted((r.a, r.b, r.w) for r in c2["edges_w"].collect()) == edges1
    assert _data_mtimes("graph_edges_w") == mtimes

    _write_lineitem(spark, d, seed=3, n_orders=8)
    G._CENSUS_CACHE.clear()
    c3 = G.copurchase_census(spark, d)
    edges3 = sorted((r.a, r.b, r.w) for r in c3["edges_w"].collect())
    assert edges3 != edges1
    assert len(glob.glob(os.path.join(index_root(), "graph_edges_w", "*"))) == 2


def test_gc_stale_judges_each_kind_by_its_own_table(spark, tmp_path, monkeypatch):
    """The janitor must key 'live' per kind's SOURCE table: dedup
    stages fingerprint documents, the graph fingerprints lineitem —
    a single-table keep fingerprint would delete live indexes of
    every other table."""
    from nova_pulsar_spark.operators.ann_index import gc_stale, index_root

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    d = str(tmp_path / "corpus")
    _write_docs(spark, d, seed=0)
    _write_lineitem(spark, d, seed=0)

    D._STAGE_CACHE.clear()
    G._CENSUS_CACHE.clear()
    D.dedup_candidates(spark, d)
    G.copurchase_census(spark, d)
    live_cand = glob.glob(os.path.join(index_root(), "dedup_cand", "*"))
    live_graph = glob.glob(os.path.join(index_root(), "graph_edges_w", "*"))
    assert len(live_cand) == 1 and len(live_graph) == 1

    # no corpus change: the janitor (default table=embeddings, which
    # this corpus does not even have) must remove NOTHING
    assert gc_stale(spark, d) == []
    assert os.path.exists(live_cand[0]) and os.path.exists(live_graph[0])

    # documents rewritten: exactly the stale dedup dirs go; the live
    # dedup rebuild and the untouched graph index survive
    _write_docs(spark, d, seed=3, n=12)
    D._STAGE_CACHE.clear()
    D.dedup_candidates(spark, d)
    removed = gc_stale(spark, d)
    assert any("dedup_cand" in p for p in removed)
    assert not any("graph_edges_w" in p for p in removed)
    assert not os.path.exists(live_cand[0])
    assert os.path.exists(live_graph[0])
    assert len(glob.glob(os.path.join(index_root(), "dedup_cand", "*"))) == 1


def test_session_caches_evict_stale_fingerprints(spark, tmp_path, monkeypatch):
    """ADVICE r5: fingerprint-keyed session caches must EVICT the
    previous fingerprint's entry on insert — an in-session corpus
    rewrite must neither serve stale frames NOR leave the old entry
    (and its pinned blocks) in the cache for the session's lifetime."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    d = str(tmp_path / "corpus")

    # dedup stage cache: rewrite WITHOUT clearing the session memo
    _write_docs(spark, d, seed=0)
    D._STAGE_CACHE.clear()
    D.dedup_candidates(spark, d)
    assert len(D._STAGE_CACHE) == 1
    old_key = next(iter(D._STAGE_CACHE))
    _write_docs(spark, d, seed=9, n=12)
    _, cand2, _ = D.dedup_candidates(spark, d)  # no manual clear
    # stale entry evicted, new fingerprint's entry present, results fresh
    assert len(D._STAGE_CACHE) == 1
    assert next(iter(D._STAGE_CACHE)) != old_key
    assert max(r.doc_b for r in cand2.collect()) == 11

    # embedding band cache: same discipline through _sign_bands
    from nova_pulsar_spark.operators import similarity as S

    def _write_emb(seed, n):
        spark.createDataFrame(
            [(i, [((i * 3 + dd + seed) % 9 - 4) / 4.0 for dd in range(S.DIM)], i % 2)
             for i in range(n)],
            "vec_id bigint, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    S._BANDS_CACHE.clear()
    _write_emb(0, 8)
    from nova_pulsar_spark.sources.tables import load_table

    S._sign_bands(spark, load_table(spark, d, "embeddings"), d)
    assert len(S._BANDS_CACHE) == 1
    bk = next(iter(S._BANDS_CACHE))
    _write_emb(5, 10)
    got = S._sign_bands(spark, load_table(spark, d, "embeddings"), d)
    assert len(S._BANDS_CACHE) == 1
    assert next(iter(S._BANDS_CACHE)) != bk
    assert got.select("vec_id").distinct().count() == 10
