"""Hot-bucket adversary property test: on a boilerplate-dominated
corpus (tools/make_edgecase_sf.py --skew) the capped dedup DAG's
candidate count must stay near-linear in corpus size while the
uncapped count goes quadratic — and the cap must not eat the organic
near-dup signal."""

from nova_pulsar_spark.operators.dedup import (
    MAX_BUCKET,
    N_BANDS,
    lsh_candidates,
    minhash_signatures,
)
from nova_pulsar_spark.sources.tables import load_table
from tools.make_edgecase_sf import write_skew_documents

BOILER_FRAC = 0.2


def _counts(spark, d, n_docs):
    write_skew_documents(spark, d, n_docs=n_docs, boiler_frac=BOILER_FRAC)
    docs = load_table(spark, d, "documents")
    mh = minhash_signatures(docs).localCheckpoint()
    capped = lsh_candidates(mh).localCheckpoint()
    uncapped_n = lsh_candidates(mh, max_bucket=None).count()
    n_boiler = int(n_docs * BOILER_FRAC)
    # planted sibling pairs: (i, i+1) for even organic i with an odd successor
    siblings = {
        (i, i + 1)
        for i in range(n_boiler, n_docs - 1)
        if i % 2 == 0
    }
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    return {
        "capped": len(got),
        "uncapped": uncapped_n,
        "boiler_pairs_in_capped": sum(1 for a, b in got if a < n_boiler and b < n_boiler),
        "sibling_recall": len(siblings & got) / len(siblings),
        "n_boiler": n_boiler,
    }


def test_cap_bounds_candidates_under_boilerplate_adversary(spark, tmp_path):
    small = _counts(spark, str(tmp_path / "skew400"), 400)
    big = _counts(spark, str(tmp_path / "skew800"), 800)

    # the adversary works: uncapped candidates are dominated by the one
    # template bucket and grow ~quadratically with corpus size
    for c in (small, big):
        boiler_quad = c["n_boiler"] * (c["n_boiler"] - 1) // 2
        assert c["uncapped"] >= boiler_quad
    assert big["uncapped"] / small["uncapped"] >= 3.0

    # the cap holds: zero template pairs survive, the count respects the
    # per-doc theoretical bound, and growth is near-linear (<= 2.5x for
    # a 2x corpus; the uncapped ratio above is ~4x)
    for c, n in ((small, 400), (big, 800)):
        assert c["boiler_pairs_in_capped"] == 0
        assert c["capped"] <= N_BANDS * (MAX_BUCKET - 1) * n / 2
    assert big["capped"] / max(small["capped"], 1) <= 2.5

    # and the cap did NOT cost the organic signal: most planted
    # near-dup sibling pairs (1-word-of-12 edits) remain candidates
    assert small["sibling_recall"] >= 0.5
    assert big["sibling_recall"] >= 0.5


def test_embedding_clique_adversary_capped_and_recalled(spark, tmp_path, monkeypatch):
    """Sign-LSH mirror of the text adversary: a 100-vector near-dup
    mega-clique (the re-crawled-embedding shape) saturates its buckets
    and is excised entirely by EMB_MAX_BUCKET, while planted organic
    sibling pairs keep near-perfect candidate recall; the cap-loss
    ledger prices exactly the clique."""
    import numpy as np
    import pandas as pd

    from nova_pulsar_spark.operators.similarity import (
        DIM,
        EMB_MAX_BUCKET,
        _sign_lsh_candidates,
        llm_dedup_embedding_cap_loss,
    )
    from nova_pulsar_spark.sources.tables import load_table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    rng = np.random.default_rng(11)
    n_clique, n_pairs, n_noise = 100, 20, 160
    v0 = rng.standard_normal(DIM)
    vecs, vid = [], 0
    clique_ids = set()
    for _ in range(n_clique):  # boilerplate clique: one direction, tiny jitter
        vecs.append((vid, (v0 + 0.001 * rng.standard_normal(DIM)).astype(np.float32)))
        clique_ids.add(vid)
        vid += 1
    sibling_pairs = set()
    for _ in range(n_pairs):  # organic near-dup siblings
        x = rng.standard_normal(DIM)
        vecs.append((vid, x.astype(np.float32)))
        vecs.append((vid + 1, (x + 0.02 * rng.standard_normal(DIM)).astype(np.float32)))
        sibling_pairs.add((vid, vid + 1))
        vid += 2
    for _ in range(n_noise):  # unrelated organic mass
        vecs.append((vid, rng.standard_normal(DIM).astype(np.float32)))
        vid += 1
    d = str(tmp_path / "corpus")
    import os

    os.makedirs(d)
    pd.DataFrame(
        {
            "vec_id": [np.int64(i) for i, _ in vecs],
            "embedding": [v for _, v in vecs],
            "label": [np.int32(0)] * len(vecs),
        }
    ).to_parquet(f"{d}/embeddings.parquet")

    e = load_table(spark, d, "embeddings")
    cand = {(r.vec_a, r.vec_b) for r in _sign_lsh_candidates(spark, e, d).collect()}
    # the clique's buckets are saturated -> ZERO intra-clique pairs
    # survive (4950 would without the cap), and total candidates stay
    # far below the clique's own fan-out
    assert not any(a in clique_ids and b in clique_ids for a, b in cand)
    assert len(cand) < 2000
    # organic sibling recall stays near-perfect at the 8-bit rung
    recalled = sum(1 for p in sibling_pairs if p in cand)
    assert recalled >= 0.9 * n_pairs, (recalled, n_pairs)
    # the ledger prices the clique: every band drops >= its clique bucket
    ledger = {r.band: r for r in llm_dedup_embedding_cap_loss(spark, d).collect()}
    assert all(r.n_vecs_dropped >= n_clique for r in ledger.values())
    assert all(r.n_pairs_dropped >= n_clique * (n_clique - 1) // 2 for r in ledger.values())
    assert all(r.n_buckets_dropped >= 1 for r in ledger.values())
