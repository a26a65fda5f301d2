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
