"""Behavioral tests for the north-star LLM-pipeline operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from nova_pulsar_spark.functions.extract import extract_record, llm_output_extract
from nova_pulsar_spark.operators.dedup import llm_dedup_near, minhash_signatures
from nova_pulsar_spark.operators.multimodal import FakeDecoder, multimodal_decode
from nova_pulsar_spark.operators.similarity import llm_simsearch_ivf, llm_simsearch_topk

SF = "/root/testdata/sf0.001"


def test_minhash_identical_docs_collide(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
            (3, "totally different words with nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    mh = minhash_signatures(docs)
    sigs = {(r.doc_id, r.seed): r.mh for r in mh.collect()}
    n_seeds = max(s for _, s in sigs) + 1
    assert all(sigs[(1, s)] == sigs[(2, s)] for s in range(n_seeds))
    assert any(sigs[(1, s)] != sigs[(3, s)] for s in range(n_seeds))


def test_dedup_near_finds_planted_pair(spark, sf_dir):
    pairs = llm_dedup_near(spark, sf_dir).collect()
    # candidate pairs must all carry a signature-agreement estimate
    for r in pairs:
        assert 0.0 <= r.est_jaccard <= 1.0


def test_simsearch_ivf_structure_vs_brute(spark, sf_dir):
    brute = llm_simsearch_topk(spark, sf_dir).collect()
    ivf = llm_simsearch_ivf(spark, sf_dir).collect()
    # IVF scans only the 2 probed cells...
    assert len({r.label for r in ivf}) <= 2
    # ...is exact within them: any brute hit from a probed label must
    # appear in the IVF result with the identical score
    probed = {r.label for r in ivf}
    ivf_scores = {r.vec_id: r.cosine for r in ivf}
    for r in brute:
        if r.label in probed:
            assert ivf_scores.get(r.vec_id) == r.cosine
    # and finds at least one of the true top-k (recall > 0)
    assert {r.vec_id for r in brute} & set(ivf_scores)


def test_fake_decoder_deterministic():
    w1, h1, m1 = FakeDecoder.fake_features(b"hello world payload")
    w2, h2, m2 = FakeDecoder.fake_features(b"hello world payload")
    assert (w1, h1, m1) == (w2, h2, m2)
    assert w1 >= 16 and h1 >= 16


def _make_png(w, h, pixels, ctype, filters):
    """Minimal valid PNG writer (stdlib): 8-bit gray (ctype 0) or RGB
    (ctype 2), one filter byte per row from {0 None, 1 Sub, 2 Up}."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ch = 1 if ctype == 0 else 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw, prev = b"", bytes(w * ch)
    for r in range(h):
        row = bytes(pixels[r * w * ch : (r + 1) * w * ch])
        f = filters[r]
        if f == 0:
            enc = row
        elif f == 1:
            enc = bytes((row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF for i in range(len(row)))
        else:  # Up
            enc = bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        raw += bytes([f]) + enc
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_decoder_decodes_png_without_media_libs():
    """decode_real is LIVE in this container: the stdlib fallback
    inflates + unfilters real PNGs (all-filter gray, RGB via Pillow's
    exact L24 luma) and non-PNG payloads keep the explicit seam."""
    import pytest

    px = list(range(12))
    g = _make_png(4, 3, px, 0, [0, 1, 2])
    assert FakeDecoder.decode_real(g) == (4, 3, sum(px) / 12)
    rgb = [(i * 7) % 256 for i in range(5 * 2 * 3)]
    lum = sum(
        (rgb[i] * 19595 + rgb[i + 1] * 38470 + rgb[i + 2] * 7471) >> 16
        for i in range(0, len(rgb), 3)
    )
    assert FakeDecoder.decode_real(_make_png(5, 2, rgb, 2, [0, 1])) == (5, 2, lum / 10)
    with pytest.raises(NotImplementedError):
        FakeDecoder.decode_real(b"\xff\xd8\xff not-a-png")


def test_real_decode_pipeline_runs_distributed(spark):
    """The REAL-decoder mapInPandas worker executes end to end on
    synthesized PNG payloads (Arrow batches, NULL propagation, exact
    features) — the production decode path, not the fake."""
    from pyspark.sql import functions as SF

    from nova_pulsar_spark.operators.multimodal import DECODE_SCHEMA, decode_real_batches

    px = list(range(12))
    g = _make_png(4, 3, px, 0, [0, 1, 2])
    rgb = [(i * 7) % 256 for i in range(5 * 2 * 3)]
    r = _make_png(5, 2, rgb, 2, [0, 0])
    df = spark.createDataFrame(
        [(1, bytearray(g)), (2, bytearray(r)), (3, None)],
        "doc_id long, payload binary",
    ).select(
        "doc_id",
        "payload",
        SF.lit("image/png").alias("media_type"),
        SF.octet_length("payload").cast("bigint").alias("payload_bytes"),
    )
    got = {row.doc_id: row for row in df.mapInPandas(decode_real_batches, DECODE_SCHEMA).collect()}
    assert (got[1].width, got[1].height, got[1].mean_intensity) == (4, 3, sum(px) / 12)
    assert got[2].width == 5 and got[2].height == 2
    assert got[3].width is None and got[3].mean_intensity is None
    assert got[1].payload_bytes == len(g)

def test_multimodal_decode_schema_and_rows(spark, sf_dir):
    out = multimodal_decode(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 500
    assert out.columns == ["doc_id", "media_type", "width", "height", "mean_intensity", "payload_bytes"]


def test_output_extract_rules():
    rec = extract_record("Edit: a.py\n[main abc1234] msg\n3 passed, 1 failed")
    assert rec["files_modified"] == ["a.py"]
    assert rec["commits"] == ["abc1234"]
    assert rec["tests_passed"] == 3 and rec["tests_failed"] == 1
    assert rec["status"] == "failed"
    rec2 = extract_record("Write: b.py\n10 passed\n[main fffffff] ok")
    assert rec2["status"] == "completed"


def test_output_extract_spark(spark, sf_dir):
    rows = {r.transcript_id: r for r in llm_output_extract(spark, sf_dir).collect()}
    assert rows[0].status == "completed"
    assert rows[1].status == "failed"
    assert rows[2].files_modified == "README.md"


def test_hll_sketch_within_rsd_of_exact(spark, sf_dir):
    """approx_count_distinct (HLL++, default rsd 0.05) stays within a
    generous 3×rsd band of the exact two-phase distinct counts."""
    from nova_pulsar_spark.operators.aggregates import (
        agg_approx_distinct_hll,
        agg_distinct_two_phase,
    )

    exact = {r.l_returnflag: r for r in agg_distinct_two_phase(spark, sf_dir).collect()}
    for r in agg_approx_distinct_hll(spark, sf_dir).collect():
        e = exact[r.l_returnflag]
        assert abs(r.approx_orders - e.n_orders) <= max(3, 0.15 * e.n_orders)
        assert abs(r.approx_parts - e.n_parts) <= max(3, 0.15 * e.n_parts)


def test_quantile_sketch_brackets_exact(spark, sf_dir):
    """percentile_approx at accuracy 10000 lands within the value range
    bracketing each exact quartile (rank tolerance of the GK sketch)."""
    from nova_pulsar_spark.operators.advanced import quantiles_exact, quantiles_sketch

    exact = {r.event_type: r for r in quantiles_exact(spark, sf_dir).collect()}
    for r in quantiles_sketch(spark, sf_dir).collect():
        e = exact[r.event_type]
        q25, q50, q75 = r.quartiles
        # sketch error at accuracy=10000 on sf<=0.01 groups is ~exact;
        # allow a small relative slack for the larger sf dirs
        for approx, true in ((q25, e.q25), (q50, e.q50), (q75, e.q75)):
            assert abs(approx - true) <= 0.02 * max(abs(true), 1.0)


def test_train_test_split_deterministic_and_balanced(spark, sf_dir):
    from nova_pulsar_spark.operators.pipeline import llm_split_train_test

    a = {r.doc_id: r.split for r in llm_split_train_test(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in llm_split_train_test(spark, sf_dir).collect()}
    assert a == b  # pure function of doc_id — stable across runs
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.82 <= frac_train <= 0.96  # ~90% ± hash noise at n=500


def test_sample_per_group_caps_and_repeats(spark, sf_dir):
    from nova_pulsar_spark.operators.pipeline import SAMPLE_PER_GROUP, llm_sample_per_group

    rows = llm_sample_per_group(spark, sf_dir).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert all(len(s) <= SAMPLE_PER_GROUP for s in per_lang.values())
    again = {(r.lang, r.doc_id) for r in llm_sample_per_group(spark, sf_dir).collect()}
    assert {(r.lang, r.doc_id) for r in rows} == again


def test_contamination_excludes_benchmark_and_flags_overlap(spark, sf_dir):
    from nova_pulsar_spark.operators.pipeline import (
        CONTAM_MIN_OVERLAP,
        N_BENCHMARK_DOCS,
        llm_contamination,
    )

    rows = llm_contamination(spark, sf_dir).collect()
    assert all(r.doc_id >= N_BENCHMARK_DOCS for r in rows)
    assert all(r.contaminated == (r.n_overlap >= CONTAM_MIN_OVERLAP) for r in rows)


def test_pii_scrub_redacts_all_three_classes(spark):
    from nova_pulsar_spark.operators.pipeline import _EMAIL_RE, _LONGNUM_RE, _PHONE_RE

    df = spark.createDataFrame(
        [(1, "mail bob@example.com call 555-123-4567 acct 123456789 done")],
        "doc_id long, text string",
    )
    out = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
            ),
            _LONGNUM_RE,
            "<ID>",
        ).alias("clean")
    ).first()["clean"]
    assert out == "mail <EMAIL> call <PHONE> acct <ID> done"


def test_embedding_lsh_prunes_candidate_space(spark, sf_dir):
    from nova_pulsar_spark.operators.similarity import llm_dedup_embedding_lsh
    from nova_pulsar_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    cands = llm_dedup_embedding_lsh(spark, sf_dir).collect()
    all_pairs = n * (n - 1) / 2
    assert len(cands) < 0.05 * all_pairs  # banded buckets, not all-pairs
    assert all(r.is_dup == (r.cosine >= 0.40) for r in cands)


def test_lsh_cap_loss_accounting_on_planted_hot_bucket(spark, tmp_path):
    """A planted bucket of identical boilerplate larger than MAX_BUCKET
    must show up in the recall audit as cap loss (not as a band-
    selectivity miss) and in the per-band cap-loss ledger with the
    exact planted mass."""
    from nova_pulsar_spark.operators.dedup import (
        MAX_BUCKET,
        llm_dedup_lsh_cap_loss,
        llm_dedup_lsh_recall,
    )

    n_boiler = MAX_BUCKET + 6  # 70 > cap; identical text -> one bucket per band
    boiler = ["standard header boilerplate text repeated everywhere always and forever"] * n_boiler
    organic = [
        "alpha beta gamma delta epsilon zeta eta theta iota",
        "alpha beta gamma delta epsilon zeta eta theta kappa",
    ]
    d = str(tmp_path / "hotcap")
    _write_docs(spark, d, boiler + organic)

    planted_pairs = n_boiler * (n_boiler - 1) // 2
    r = llm_dedup_lsh_recall(spark, d).collect()[0]
    # every planted pair is exact-truth AND found by uncapped LSH, but
    # dropped by the cap -> attributed to the cap, not to the bands
    assert r.n_missed_by_cap == planted_pairs
    assert r.n_found_uncapped == r.n_found + planted_pairs
    assert r.recall_uncapped > r.recall
    # the organic near-dup pair still survives the capped path
    assert r.n_found >= 1

    ledger = {row.band: row for row in llm_dedup_lsh_cap_loss(spark, d).collect()}
    assert len(ledger) == 4  # one row per band
    for row in ledger.values():
        assert row.n_buckets_dropped == 1
        assert row.n_docs_dropped == n_boiler
        assert row.n_pairs_dropped == planted_pairs


def test_prod_cap_recover_emits_on_planted_over_cap_bucket(spark, tmp_path):
    """ADVICE r9: `llm_dedup_lsh_cap_recover_prod` is the PRODUCTION
    surface (cap = MAX_BUCKET); at shipped SFs it is legitimately
    empty, so this planted corpus proves it non-vacuous in-tree: a
    70-doc identical clique (> MAX_BUCKET=64) must yield exactly
    n-1 verified (member -> MIN-doc_id representative) pairs, on BOTH
    engines (the DuckDB twin runs the registered SQL on the same
    parquet), while organic under-cap docs never appear."""
    import duckdb

    from nova_pulsar_spark.operators.dedup import MAX_BUCKET
    from nova_pulsar_spark.registry import all_queries

    n_boiler = MAX_BUCKET + 6  # 70 identical docs -> one over-cap bucket per band
    boiler = ["standard header boilerplate text repeated everywhere always and forever"] * n_boiler
    organic = [
        "alpha beta gamma delta epsilon zeta eta theta iota",
        "alpha beta gamma delta epsilon zeta eta theta kappa",
    ]
    d = str(tmp_path / "prodrec")
    _write_docs(spark, d, boiler + organic)

    rq = all_queries()["llm_dedup_lsh_cap_recover_prod"]
    got = rq.fn(spark, d).collect()
    # one recovery pair per non-representative clique member, dup-verified
    assert len(got) == n_boiler - 1
    assert all(r.rep_doc == 0 for r in got)  # MIN doc_id owns the clique
    assert {r.doc_id for r in got} == set(range(1, n_boiler))
    assert all(r.is_dup and r.jaccard == 1.0 for r in got)  # identical text

    # the DuckDB twin agrees on the same parquet — the prod surface is
    # oracle-checked at a corpus where the cap actually sheds
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    odf = con.execute(rq.sql).fetchdf()
    assert len(odf) == n_boiler - 1
    assert set(odf["doc_id"]) == set(range(1, n_boiler))
    assert bool(odf["is_dup"].all()) and (odf["rep_doc"] == 0).all()

    # the dashboard's new recover tiers see the same mass
    from nova_pulsar_spark.operators.dedup import llm_dedup_report

    tiers = {r.tier: r.n for r in llm_dedup_report(spark, d).collect()}
    # the report runs at the registered test cap (2 < 70), so the
    # planted clique is over-cap there too and fully recovered
    assert tiers["recovered_dup_pairs"] >= n_boiler - 1
    assert tiers["recovered_docs"] >= n_boiler - 1


def test_lsh_hot_bucket_cap_drops_boilerplate(spark):
    """The LSH skew mitigation: a boilerplate bucket (many identical
    docs) explodes quadratically; the cap excises it while organic
    buckets keep producing candidates."""
    from nova_pulsar_spark.operators.dedup import lsh_candidates, minhash_signatures

    boiler = [(i, "standard header boilerplate text repeated everywhere always") for i in range(30)]
    organic = [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (101, "alpha beta gamma delta epsilon zeta eta theta kappa"),
    ]
    docs = spark.createDataFrame(boiler + organic, "doc_id long, text string")
    mh = minhash_signatures(docs)
    uncapped = lsh_candidates(mh).count()
    capped = lsh_candidates(mh, max_bucket=10).collect()
    capped_ids = {r.doc_a for r in capped} | {r.doc_b for r in capped}
    assert uncapped >= 30 * 29 / 2  # boilerplate bucket exploded
    assert (100, 101) in {(r.doc_a, r.doc_b) for r in capped}  # organic pair survives
    assert not any(i < 30 for i in capped_ids)  # hot bucket excised


def test_multimodal_resize_preserves_aspect(spark, sf_dir):
    from nova_pulsar_spark.operators.multimodal import RESIZE_TARGET, multimodal_resize

    rows = multimodal_resize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert max(r.out_w, r.out_h) <= RESIZE_TARGET
        # the longer edge lands on the target (floor can shave 1)
        assert max(r.out_w, r.out_h) >= RESIZE_TARGET - 1
        # aspect ratio preserved within floor rounding (relative)
        want = r.width / r.height
        assert abs(r.out_w / r.out_h - want) / want < 0.05


def test_multimodal_audio_chunks_cover_payload(spark, sf_dir):
    from collections import defaultdict

    from nova_pulsar_spark.operators.multimodal import (
        AUDIO_CHUNK_BYTES,
        AUDIO_HOP_BYTES,
        multimodal_audio_chunk,
    )

    by_doc = defaultdict(list)
    for r in multimodal_audio_chunk(spark, sf_dir).collect():
        by_doc[r.doc_id].append(r)
    assert by_doc
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_no)
        assert chunks[0].start_byte == 0
        # is_last marks EOF-reaching chunks; with 50% overlap the final
        # one always qualifies and trailing overlaps may too
        n = max(c.end_byte for c in chunks)
        assert chunks[-1].is_last
        assert all(c.is_last == (c.end_byte == n) for c in chunks)
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_byte - a.start_byte == AUDIO_HOP_BYTES  # fixed hop
            assert a.end_byte > b.start_byte or a.end_byte - a.start_byte < AUDIO_CHUNK_BYTES


def test_pack_sequences_bins_are_contiguous(spark, sf_dir):
    from collections import defaultdict

    from nova_pulsar_spark.operators.pipeline import CTX_LEN, llm_pack_sequences

    rows = llm_pack_sequences(spark, sf_dir).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    for docs in by_src.values():
        docs.sort(key=lambda r: r.doc_id)
        running = 0
        for r in docs:
            assert r.bin_no == running // CTX_LEN
            assert r.bin_offset == running % CTX_LEN
            running += r.n_tokens


def test_shard_balance_serpentine_is_token_balanced(spark, sf_dir):
    """The serpentine strip's guarantee: every shard gets exactly one
    doc per K-sized pass (doc counts differ by at most 1) and
    alternating direction cancels the within-pass size gradient, so
    shard token sums stay within one pass's spread — far tighter than
    hash sharding's token variance on a skewed length distribution."""
    from nova_pulsar_spark.operators.pipeline import SHARD_K, llm_shard_balance
    from nova_pulsar_spark.sources.tables import load_table

    rows = llm_shard_balance(spark, sf_dir).collect()
    assert {r.shard for r in rows} == set(range(SHARD_K))
    n_docs = [r.n_docs for r in rows]
    assert max(n_docs) - min(n_docs) <= 1  # one doc per shard per pass
    toks = [r.shard_tokens for r in rows]
    # spread bounded by the longest document (one pass's worst gradient)
    longest = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("max(size(split(text, ' '))) AS m")
        .first()
        .m
    )
    assert max(toks) - min(toks) <= longest
    # and tight in relative terms on the real length distribution
    assert (max(toks) - min(toks)) / (sum(toks) / len(toks)) < 0.01


def test_shard_assign_is_the_production_view_of_shard_balance(spark, sf_dir):
    """llm_shard_assign (the per-doc production join-back view) and
    llm_shard_balance (the audit rollup) share one serpentine stage:
    rolling the assignment up by shard must reproduce the audit
    exactly, every doc appears exactly once, and shard ids cover
    0..K-1 — so writing `.repartition(shard)` from the assign view
    yields precisely the balanced layout the audit certifies."""
    import pyspark.sql.functions as F

    from nova_pulsar_spark.operators.pipeline import (
        SHARD_K,
        llm_shard_assign,
        llm_shard_balance,
    )

    assign = llm_shard_assign(spark, sf_dir)
    audit = {(r.shard): (r.n_docs, r.shard_tokens) for r in llm_shard_balance(spark, sf_dir).collect()}
    rolled = {
        r.shard: (r.n_docs, r.shard_tokens)
        for r in assign.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
        .collect()
    }
    assert rolled == audit
    assert set(rolled) == set(range(SHARD_K))
    ids = [r.doc_id for r in assign.select("doc_id").collect()]
    assert len(ids) == len(set(ids))  # exactly one shard per doc


def test_corpus_layout_shards_exactly_the_curate_survivors(spark, sf_dir):
    """llm_corpus_layout = llm_corpus_curate pushed through the
    serpentine strip: the per-shard audit must account for every
    survivor exactly once (doc and quality totals match the curate
    output), deal docs one-per-shard-per-pass (counts differ by <=1),
    and keep the token spread serpentine-tight. Quality must MIX
    across shards rather than concentrate: every shard's mean quality
    stays within 0.5 of the corpus mean (scores are 2 or 3 after the
    floor, so a length-correlated layout could otherwise stack one
    shard with all the 3s)."""
    from nova_pulsar_spark.operators.dedup import llm_corpus_curate
    from nova_pulsar_spark.operators.pipeline import SHARD_K, llm_corpus_layout

    surv = llm_corpus_curate(spark, sf_dir).collect()
    rows = llm_corpus_layout(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == len(surv)
    assert sum(r.quality_sum for r in rows) == sum(s.quality_score for s in surv)
    n_docs = [r.n_docs for r in rows]
    assert max(n_docs) - min(n_docs) <= 1
    toks = [r.shard_tokens for r in rows]
    assert (max(toks) - min(toks)) / (sum(toks) / len(toks)) < 0.02
    assert {r.shard for r in rows} <= set(range(SHARD_K))
    corpus_mean = sum(s.quality_score for s in surv) / len(surv)
    for r in rows:
        assert abs(r.quality_sum / r.n_docs - corpus_mean) < 0.5


def test_quality_repetition_flags_repeated_text(spark):
    from nova_pulsar_spark.operators.pipeline import llm_quality_repetition
    from unittest import mock

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam", "en", "s", 0),
         (2, "the quick brown fox jumps over dogs", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch("nova_pulsar_spark.operators.pipeline.load_table", return_value=docs):
        out = {r.doc_id: r for r in llm_quality_repetition(spark, "ignored").collect()}
    assert out[1].top_bigram_frac == 1.0 and out[1].dup_word_frac > 0.8
    assert out[2].top_bigram_frac < 0.2 and out[2].dup_word_frac == 0.0


def test_mix_weights_normalized_and_monotone(spark, sf_dir):
    from nova_pulsar_spark.operators.pipeline import llm_mix_weights

    rows = llm_mix_weights(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-12
    # sqrt temperature: more tokens -> larger weight, but sub-linearly
    rows.sort(key=lambda r: r.n_tokens)
    for a, b in zip(rows, rows[1:]):
        assert a.weight <= b.weight
        if a.n_tokens > 0 and a.weight > 0:
            assert b.weight / a.weight <= (b.n_tokens / a.n_tokens) + 1e-9


def test_dedup_clusters_partition_dup_graph(spark, sf_dir):
    """Components must be consistent with the verified dup pairs: both
    endpoints of every dup edge share a component, the keeper is the
    component minimum, and exactly one keeper exists per component."""
    from collections import defaultdict

    from nova_pulsar_spark.operators.dedup import llm_dedup_clusters, llm_dedup_verify

    comp = {r.doc_id: r for r in llm_dedup_clusters(spark, sf_dir).collect()}
    dup_edges = [
        (r.doc_a, r.doc_b) for r in llm_dedup_verify(spark, sf_dir).collect() if r.is_dup
    ]
    for a, b in dup_edges:
        assert comp[a].component_id == comp[b].component_id
    members = defaultdict(set)
    for r in comp.values():
        members[r.component_id].add(r.doc_id)
    for cid, docs in members.items():
        assert cid == min(docs)
        keepers = [d for d in docs if comp[d].is_keeper]
        assert keepers == [cid]


def test_vocab_topk_is_sorted_and_complete(spark, sf_dir):
    from nova_pulsar_spark.operators.textstats import VOCAB_TOP_K, llm_vocab_topk

    rows = llm_vocab_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= VOCAB_TOP_K
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert len({r.token for r in rows}) == len(rows)


def test_ngram_counts_threshold(spark, sf_dir):
    from nova_pulsar_spark.operators.textstats import NGRAM_MIN_COUNT, llm_ngram_counts

    rows = llm_ngram_counts(spark, sf_dir).collect()
    assert rows and all(r.n >= NGRAM_MIN_COUNT for r in rows)
    assert all(" " in r.bigram for r in rows)


def test_embedding_quantize_roundtrip_error_bound(spark, sf_dir):
    """Dequantized values must sit within 0.5/scale of the original —
    the symmetric-int8 error bound — and q values within [-127, 127]."""
    from nova_pulsar_spark.operators.similarity import llm_embedding_quantize
    from nova_pulsar_spark.sources.tables import load_table

    orig = {r.vec_id: r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()}
    for r in llm_embedding_quantize(spark, sf_dir).collect():
        q = [int(s) for s in r.q8.split(",")]
        assert all(-127 <= v <= 127 for v in q)
        if r.scale > 0:
            for qv, xv in zip(q, orig[r.vec_id]):
                assert abs(qv / r.scale - float(xv)) <= 0.5 / r.scale + 1e-12


def test_contamination_shingles_skip_short_docs(spark):
    """Docs with <3 words emit NO shingles on either engine (the
    concat_ws-phantom / NULL-propagation divergence guard)."""
    import duckdb

    from nova_pulsar_spark.operators.pipeline import _SHINGLES_SQL

    df = spark.createDataFrame(
        [(1, "one two"), (2, "a"), (3, ""), (4, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    shingles = F.array_distinct(
        F.expr(
            "CASE WHEN size(ws) >= 3 THEN "
            "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3))) "
            "ELSE array() END"
        )
    )
    got = {
        r.doc_id: sorted(r.sh)
        for r in df.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", shingles.alias("sh"))
        .collect()
    }
    assert got[1] == got[2] == got[3] == []
    assert got[4] == ["alpha beta gamma", "beta gamma delta"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1 AS doc_id, 'one two' AS text "
                "UNION ALL SELECT 4, 'alpha beta gamma delta'")
    oracle = {
        r[0]: sorted(r[1])
        for r in con.execute(f"SELECT doc_id, {_SHINGLES_SQL} FROM documents").fetchall()
    }
    assert oracle[1] == [] and oracle[4] == got[4]


def test_histogram_degenerate_range_single_bin(spark):
    """All-equal values (constant column profiling) land in bin 0 with
    the full count — no NULL bins, no division blow-up."""
    from nova_pulsar_spark.operators.aggregates import HIST_BINS  # noqa: F401

    df = spark.createDataFrame([(i, 7.5) for i in range(100)], "event_id long, value double")
    b = df.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    raw_bin = F.floor(
        F.coalesce(
            (F.col("value") - F.col("vmin")) * HIST_BINS / F.expr("nullif(vmax - vmin, 0)"),
            F.lit(0),
        )
    ).cast("bigint")
    bin_ = F.least(raw_bin, F.lit(HIST_BINS - 1))
    rows = (
        df.crossJoin(F.broadcast(b))
        .select(bin_.alias("bin"), (F.col("vmin") + (F.col("vmax") - F.col("vmin")) / HIST_BINS * bin_).alias("bin_lo"))
        .groupBy("bin", "bin_lo")
        .count()
        .collect()
    )
    assert len(rows) == 1
    assert (rows[0]["bin"], rows[0]["bin_lo"], rows[0]["count"]) == (0, 7.5, 100)


def test_keep_best_prefers_quality_over_min_id(spark, sf_dir):
    """Exactly one keeper per component; the keeper has the component's
    max quality score (doc_id breaks ties), which is NOT always the
    min-id doc the plain clusters query would keep."""
    from nova_pulsar_spark.operators.dedup import llm_dedup_keep_best

    rows = llm_dedup_keep_best(spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp, members in by_comp.items():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1
        best = max(members, key=lambda r: (r.quality_score, -r.doc_id))
        assert keepers[0].doc_id == best.doc_id
        assert keepers[0].quality_score == max(r.quality_score for r in members)


def test_simsearch_batch_matches_single_query(spark, sf_dir):
    """The batch result for query 0 equals the single-query top-k
    (same scores, same ranking)."""
    from nova_pulsar_spark.operators.similarity import llm_simsearch_batch

    single = [(r.vec_id, r.cosine) for r in llm_simsearch_topk(spark, sf_dir).collect()]
    batch = llm_simsearch_batch(spark, sf_dir)
    q0 = sorted(
        ((r.vec_id, r.cosine) for r in batch.filter(F.col("query_id") == 0).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    assert q0 == single
    # every query in the batch returns exactly top-k rows
    from nova_pulsar_spark.operators.similarity import N_BATCH_QUERIES, TOP_K

    counts = {r.query_id: r["count"] for r in batch.groupBy("query_id").count().collect()}
    assert counts == {q: TOP_K for q in range(N_BATCH_QUERIES)}


def test_cluster_stats_consistent_with_labels(spark, sf_dir):
    """Σ(cluster_size × n_clusters) = labeled docs; docs_removed =
    Σ((size-1) × n_clusters)."""
    from nova_pulsar_spark.operators.dedup import llm_dedup_cluster_stats, llm_dedup_clusters

    n_docs = llm_dedup_clusters(spark, sf_dir).count()
    rows = llm_dedup_cluster_stats(spark, sf_dir).collect()
    assert sum(r.cluster_size * r.n_clusters for r in rows) == n_docs
    assert all(r.docs_removed == (r.cluster_size - 1) * r.n_clusters for r in rows)


def test_dedup_rate_by_source_totals(spark, sf_dir):
    from nova_pulsar_spark.operators.dedup import llm_dedup_exact, llm_dedup_rate_by_source
    from nova_pulsar_spark.sources.tables import load_table

    rows = llm_dedup_rate_by_source(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert all(r.n_dups == r.n_docs - r.n_unique and r.n_dups >= 0 for r in rows)


def test_length_buckets_cover_corpus_and_waste_bounds(spark, sf_dir):
    from nova_pulsar_spark.operators.pipeline import LEN_BUCKET, llm_length_bucket_stats
    from nova_pulsar_spark.sources.tables import load_table

    rows = llm_length_bucket_stats(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        # pad waste per doc is in [1, LEN_BUCKET] (ceiling is exclusive)
        assert r.n_docs * 1 <= r.pad_waste_tokens <= r.n_docs * LEN_BUCKET
        assert r.bucket_lo == r.bucket * LEN_BUCKET


def test_normalize_repeats_collapses_runs_only(spark):
    from nova_pulsar_spark.operators.pipeline import llm_normalize_repeats  # noqa: F401

    df = spark.createDataFrame(
        [(1, "a a a b a"), (2, "x y z"), (3, "t t")],
        "doc_id long, text string",
    )
    w = df.select("doc_id", F.split("text", " ").alias("ws"))
    collapsed = F.expr("filter(ws, (x, i) -> i = 0 OR x != element_at(ws, i))")
    got = {r.doc_id: r.c for r in w.select("doc_id", F.array_join(collapsed, " ").alias("c")).collect()}
    # runs collapse; non-adjacent repeats survive (a...a stays)
    assert got == {1: "a b a", 2: "x y z", 3: "t"}


def test_corpus_curate_funnel_monotone(spark, sf_dir):
    """Survivors pass every individual gate: they are exact keepers,
    not near-dup removals, and at/above the quality floor; the funnel
    is a subset of the corpus with all three filters honored."""
    from nova_pulsar_spark.operators.dedup import (
        QUALITY_FLOOR,
        llm_corpus_curate,
        llm_dedup_exact,
        llm_dedup_keep_best,
    )
    from nova_pulsar_spark.sources.tables import load_table

    out = llm_corpus_curate(spark, sf_dir)
    rows = out.collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert 0 < len(rows) <= total
    assert all(r.quality_score >= QUALITY_FLOOR for r in rows)
    ids = {r.doc_id for r in rows}
    keepers = {r.keeper_id for r in llm_dedup_exact(spark, sf_dir).collect()}
    assert ids <= keepers
    removed = {r.doc_id for r in llm_dedup_keep_best(spark, sf_dir).collect() if not r.keep}
    assert not (ids & removed)


def test_equidepth_buckets_are_equal_count_and_ordered(spark, sf_dir):
    from nova_pulsar_spark.operators.aggregates import EQUIDEPTH_BUCKETS, agg_histogram_equidepth

    rows = sorted(agg_histogram_equidepth(spark, sf_dir).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, EQUIDEPTH_BUCKETS + 1))
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1  # NTILE splits as evenly as possible
    # bucket value ranges are non-overlapping and ordered
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_key_skew_report_ranked_and_consistent(spark, sf_dir):
    from nova_pulsar_spark.operators.aggregates import SKEW_TOP_N, diag_key_skew

    rows = diag_key_skew(spark, sf_dir).collect()
    assert len(rows) == SKEW_TOP_N
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    # the heaviest key is at/above the mean by construction (at small SF
    # the report may cover every key, so the tail can sit below mean)
    assert rows[0].ratio_to_mean >= 1.0
    assert all(r.ratio_to_mean > 0 for r in rows)


def test_langid_confusion_totals_and_consistency(spark, sf_dir):
    from nova_pulsar_spark.operators.textstats import llm_langid_confusion, llm_text_langid
    from nova_pulsar_spark.sources.tables import load_table

    rows = llm_langid_confusion(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == total
    # diagonal agreement matches the per-doc projection exactly
    n_correct = sum(r.n for r in rows if r.correct)
    per_doc = llm_text_langid(spark, sf_dir).collect()
    assert n_correct == sum(1 for r in per_doc if r.labeled_lang == r.predicted_lang)


def test_asof_tolerance_nulls_stale_matches_only(spark, sf_dir):
    from nova_pulsar_spark.operators.advanced import (
        ASOF_TOLERANCE_H,
        join_asof,
        join_asof_tolerance,
    )

    base = {r.event_id: r for r in join_asof(spark, sf_dir).collect()}
    tol = join_asof_tolerance(spark, sf_dir).collect()
    assert len(tol) == len(base)
    for r in tol:
        b = base[r.event_id]
        if r.checkpoint is not None:
            # fresh match: identical to the unbounded as-of choice
            assert (r.checkpoint, r.checkpoint_ts) == (b.checkpoint, b.checkpoint_ts)
            assert (r.ts - r.checkpoint_ts).total_seconds() <= ASOF_TOLERANCE_H * 3600
        elif b.checkpoint_ts is not None:
            # nulled: the match existed but was stale
            assert (r.ts - b.checkpoint_ts).total_seconds() > ASOF_TOLERANCE_H * 3600


def test_asof_nearest_picks_closer_side(spark, sf_dir):
    """Nearest differs from backward exactly when the NEXT checkpoint is
    closer than the previous one; dist is |event - chosen|, minimal."""
    from nova_pulsar_spark.operators.advanced import CHECKPOINTS, join_asof_nearest

    import datetime as dt

    cps = [dt.datetime.fromisoformat(t) for t, _ in CHECKPOINTS]
    rows = join_asof_nearest(spark, sf_dir).collect()
    assert len({r.event_id for r in rows}) == len(rows)
    for r in rows[:200]:
        # the operator compares whole-second epochs (unix_timestamp
        # floors sub-second precision) — mirror that here
        t = r.ts.replace(microsecond=0)
        best = min(abs(int((t - c).total_seconds())) for c in cps)
        assert r.dist_seconds == best


def test_simhash_banded_nn_identical_docs_are_zero_distance(spark):
    """Two identical docs must be each other's nearest neighbor at
    Hamming 0; a vocabulary-disjoint doc never reaches distance 0."""
    # the registered Spark fn loads parquet, so the planted corpus is
    # exercised through the (hash-identical) DuckDB twin instead
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT 1 AS doc_id, "
        "'alpha beta gamma delta epsilon zeta eta theta iota kappa' AS text "
        "UNION ALL SELECT 2, 'alpha beta gamma delta epsilon zeta eta theta iota kappa' "
        "UNION ALL SELECT 3, 'completely different vocabulary nothing shared whatsoever here now'"
    )
    from nova_pulsar_spark.registry import all_queries

    rows = {r[0]: r for r in con.execute(all_queries()["llm_dedup_simhash_banded"].sql).fetchall()}
    assert rows[1][1] == 2 and rows[1][2] == 0 and rows[1][3]  # nn=2, hamming 0, dup
    assert rows[2][1] == 1 and rows[2][2] == 0
    if 3 in rows:  # doc 3 only appears if it shares a band by chance
        assert rows[3][2] > 0


def test_substring_dedup_flags_copied_span(spark):
    from nova_pulsar_spark.operators.dedup import substring_span_stats

    shared = "one two three four five six seven eight"  # exactly K=8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " tail alpha beta gamma delta epsilon zeta eta"),
            (2, "head words differ here completely " + shared),
            (3, "nothing in common with anything else at all whatsoever today"),
            (4, "short doc"),  # < K tokens: contributes no spans
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in substring_span_stats(docs).collect()}
    assert 4 not in rows  # too short to have any span
    assert rows[1].n_dup_spans >= 1 and rows[2].n_dup_spans >= 1
    assert rows[3].n_dup_spans == 0 and not rows[3].mostly_dup
    # doc 2 ends with the shared span; only that one span is duplicated
    assert rows[2].n_dup_spans == 1


def test_setsim_prefix_matches_bruteforce_jaccard(spark):
    from nova_pulsar_spark.operators.dedup import setsim_prefix_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup: jaccard 1.0
            (3, base + " lambda"),  # near dup: high shingle overlap
            (4, "totally different words that share nothing with the base document"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.a_id, r.b_id): r for r in setsim_prefix_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)].jaccard == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)].jaccard >= 0.6
    assert all(4 not in k for k in pairs)
    # lossless at the threshold: brute-force shingle jaccard agrees
    from nova_pulsar_spark.operators.dedup import _shingles_expr

    sh = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", F.split(F.col("text"), " ").alias("ws")
        ).select("doc_id", _shingles_expr().alias("sh")).collect()
    }
    for (a, b), r in pairs.items():
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        assert r.n_inter == inter and r.n_union == union
    brute = {
        (a, b)
        for a in sh
        for b in sh
        if a < b and len(sh[a] & sh[b]) * 5 >= len(sh[a] | sh[b]) * 3
    }
    assert set(pairs) == brute


def test_weighted_sample_biases_toward_heavy_docs(spark, sf_dir):
    from nova_pulsar_spark.operators.pipeline import SAMPLE_K, llm_sample_weighted
    from nova_pulsar_spark.sources.tables import load_table

    sample = llm_sample_weighted(spark, sf_dir).collect()
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    # expected size K, generous tolerance for the Bernoulli variance
    assert 0.5 * SAMPLE_K <= len(sample) <= 1.5 * SAMPLE_K
    mean_s = sum(r.weight for r in sample) / len(sample)
    mean_c = sum(r.n_chars for r in corpus) / len(corpus)
    assert mean_s > mean_c  # weight-proportional: heavy docs over-represented
    # determinism: second run returns the identical id set
    again = {r.doc_id for r in llm_sample_weighted(spark, sf_dir).collect()}
    assert again == {r.doc_id for r in sample}


def test_mad_outliers_matches_bruteforce(spark, sf_dir):
    from nova_pulsar_spark.operators.aggregates import MAD_SIGMA, agg_mad_outliers
    from nova_pulsar_spark.sources.tables import load_table

    got = {r.event_type: r for r in agg_mad_outliers(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)

    def lower_median(vals):
        return sorted(vals)[(len(vals) + 1) // 2 - 1]

    for et, evs in by_type.items():
        med = lower_median([r.value for r in evs])
        mad = lower_median([abs(r.value - med) for r in evs])
        n_out = sum(1 for r in evs if abs(r.value - med) > MAD_SIGMA * mad)
        assert got[et].med == med and got[et].mad == mad and got[et].n_outliers == n_out


def test_simsearch_range_is_pruned_subset_of_bruteforce(spark, sf_dir):
    from nova_pulsar_spark.operators.similarity import (
        QUERY_VEC_ID,
        RANGE_THRESHOLD,
        cosine,
        llm_simsearch_range,
    )
    from nova_pulsar_spark.sources.tables import load_table

    got = {r.vec_id: r.cosine for r in llm_simsearch_range(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    brute = {
        r.vec_id: r.c
        for r in e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", cosine("embedding", "qe").alias("c"))
        .collect()
        if r.c >= RANGE_THRESHOLD
    }
    # every returned neighbor is a true in-radius neighbor with the exact cosine
    for vid, cos in got.items():
        assert vid in brute and cos == brute[vid]
    # the probe actually prunes: strictly fewer candidates than the corpus scan
    assert 0 < len(got) < e.count() / 2


def test_contamination_bloom_identical_to_exact_and_prunes(spark, sf_dir):
    from nova_pulsar_spark.operators.pipeline import (
        BLOOM_BITS,
        BLOOM_WORD_BITS,
        N_BENCHMARK_DOCS,
        _hash12_spark,
        llm_contamination,
        llm_contamination_bloom,
    )
    from nova_pulsar_spark.sources.tables import load_table

    exact = {(r.doc_id, r.n_overlap, r.contaminated) for r in llm_contamination(spark, sf_dir).collect()}
    bloom = {(r.doc_id, r.n_overlap, r.contaminated) for r in llm_contamination_bloom(spark, sf_dir).collect()}
    assert bloom == exact  # no false negatives: byte-identical results

    # and the bitmap genuinely prunes: most corpus shingles never reach the join
    d = load_table(spark, sf_dir, "documents")
    ws = d.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    sh = F.array_distinct(
        F.expr(
            "CASE WHEN size(ws) >= 3 THEN "
            "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3))) "
            "ELSE array() END"
        )
    )
    bench = (
        ws.filter(F.col("doc_id") < N_BENCHMARK_DOCS).select(F.explode(sh).alias("shingle")).distinct()
    )
    h = _hash12_spark(F.col("shingle")) % BLOOM_BITS
    bench_bits = {
        (r.w, r.bit)
        for r in bench.select(
            (h / BLOOM_WORD_BITS).cast("int").alias("w"), (h % BLOOM_WORD_BITS).cast("int").alias("bit")
        ).collect()
    }
    corpus_bits = (
        ws.filter(F.col("doc_id") >= N_BENCHMARK_DOCS)
        .select(F.explode(sh).alias("shingle"))
        .select((h / BLOOM_WORD_BITS).cast("int").alias("w"), (h % BLOOM_WORD_BITS).cast("int").alias("bit"))
        .collect()
    )
    survivors = sum(1 for r in corpus_bits if (r.w, r.bit) in bench_bits)
    assert survivors < len(corpus_bits) / 2  # >50% of the stream pruned map-side


def test_phash_collides_on_tail_edits_not_md5(spark):
    from nova_pulsar_spark.operators.multimodal import PHASH_PIXELS, phash_frame

    base = bytes(range(40, 40 + PHASH_PIXELS))  # 60 "pixels"
    frames = spark.createDataFrame(
        [
            (1, base + b" original tail"),
            (2, base + b" a completely different tail of bytes"),  # same leading pixels
            (3, bytes(reversed(base)) + b" other"),  # same byte multiset, other pattern? ->
            (4, b"short"),  # < 60 bytes: skipped
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.phash for r in phash_frame(frames).collect()}
    assert 4 not in got
    assert got[1] == got[2]  # tail edit preserved the fingerprint
    # reversed pixel ORDER flips which positions are bright: different hash
    assert got[1] != got[3]
    # cross-check one hash against the definition
    px = base
    s = sum(px)
    want = 0
    for i, p in enumerate(px):
        if p * PHASH_PIXELS > s:
            want |= 1 << i
    assert got[1] == want


def test_embedding_normalize_unit_norm_and_zero_guard(spark, tmp_path):
    from nova_pulsar_spark.operators.similarity import llm_embedding_normalize

    d = str(tmp_path / "norm")
    spark.createDataFrame(
        [(0, [3.0, 4.0, 0.0, 0.0], 0), (1, [0.0, 0.0, 0.0, 0.0], 0)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(f"{d}/embeddings.parquet")
    rows = {r["vec_id"]: r for r in llm_embedding_normalize(spark, d).collect()}
    assert abs(rows[0]["norm"] - 5.0) < 1e-12
    unit = [int(x) / 1e6 for x in rows[0]["unit_u6"].split(",")]
    assert abs(sum(v * v for v in unit) - 1.0) < 1e-3
    assert unit[0] == 0.6 and unit[1] == 0.8
    # zero vector: norm 0, unit NULL on both engines by construction
    assert rows[1]["norm"] == 0.0 and rows[1]["unit_u6"] is None


def test_kmeans_step_recovers_planted_clusters(spark, tmp_path):
    from nova_pulsar_spark.operators.similarity import DIM, llm_kmeans_step

    # Two tight planted clusters around A=1.0 and B=-1.0 (first
    # coordinate), zeros elsewhere. Seeds are vec_id 0..3: 0,1 in A
    # and 2,3 in B, so one Lloyd step must assign each point to its
    # own cluster and recover the exact per-cluster means.
    rows = []
    for vid in range(12):
        base = 1.0 if vid % 2 == 0 else -1.0  # even→A, odd→B
        v = [0.0] * DIM
        v[0] = base
        v[1] = 0.01 * vid  # small per-point jitter, cluster-preserving
        rows.append((vid, v, 0))
    # seeds 0..3 = [A, B, A, B] by the parity layout
    d = str(tmp_path / "km")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")

    got = llm_kmeans_step(spark, d).collect()
    by_cid = {}
    for r in got:
        by_cid.setdefault(r["centroid_id"], {})[r["i"]] = (r["c"], r["n_members"])
    # Every point joins the nearest seed of its own cluster; ties on
    # d2 inside a cluster break to the LOWEST centroid id, so all of
    # A lands on seed 0 or 2 and all of B on 1 or 3 — and each point
    # is strictly nearest to one seed here except exact seed matches.
    total = 0
    for cid, dims in by_cid.items():
        n = dims[1][1]
        total += n
        members = [vid for vid in range(12) if _nearest_seed(vid) == cid]
        assert n == len(members), (cid, n, members)
        # exact mean of dim 1 (1-based i=1 is coordinate 0)
        want = sum((1.0 if m % 2 == 0 else -1.0) for m in members) / len(members)
        assert abs(dims[1][0] - want) < 1e-6, cid
    assert total == 12


def _nearest_seed(vid: int) -> int:
    """Mirror of the operator's assignment rule for the planted set."""
    import numpy as np
    from nova_pulsar_spark.operators.similarity import DIM, K_SEEDS

    def vec(v):
        x = np.zeros(DIM)
        x[0] = 1.0 if v % 2 == 0 else -1.0
        x[1] = 0.01 * v
        return x

    best = None
    for s in range(K_SEEDS):
        d2 = float(((vec(vid) - vec(s)) ** 2).sum())
        key = (d2, s)
        if best is None or key < best[0:2]:
            best = (d2, s)
    return best[1]


def _write_docs(spark, path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{path}/documents.parquet")


def test_bpe_merge_step_finds_dominant_pair(spark, tmp_path):
    from nova_pulsar_spark.operators.textstats import llm_bpe_merge_step

    d = str(tmp_path / "bpe")
    # word types: 'aaab' (x2 docs), 'aab', 'xy'
    # pair counts weighted by word freq: 'aa' = 2*2 + 1 = 5, 'ab' = 2 + 1 = 3, 'xy' = 1
    _write_docs(spark, d, ["aaab aab", "aaab xy"])
    got = llm_bpe_merge_step(spark, d).collect()
    assert (got[0]["pair"], got[0]["n"]) == ("aa", 5)
    assert (got[1]["pair"], got[1]["n"]) == ("ab", 3)


def test_perplexity_proxy_scores_common_bigrams_higher(spark, tmp_path):
    from nova_pulsar_spark.operators.textstats import llm_perplexity_proxy

    d = str(tmp_path / "ppl")
    common = "the cat sat"
    _write_docs(spark, d, [common, common, common, "zq qv vk"])
    got = {r["doc_id"]: r for r in llm_perplexity_proxy(spark, d).collect()}
    # 'the cat'/'cat sat' each appear 3x → mean 3; gibberish bigrams are singletons
    assert got[0]["mean_bigram_count"] == 3.0
    assert got[3]["mean_bigram_count"] == 1.0
    assert got[3]["n_bigrams"] == 2


def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    from nova_pulsar_spark.operators.similarity import DIM, MMR_K, llm_simsearch_mmr

    # query (vec_id 0) along axis 0; twins A1/A2 nearly identical and most
    # relevant; B diverse (axis 1 component) but still relevant; fillers
    # weakly relevant. Pure relevance ranks A1, A2 first — MMR must demote
    # the redundant twin A2 below the diverse B.
    def v(axis0, axis1, eps=0.0):
        x = [0.0] * DIM
        x[0], x[1], x[2] = axis0, axis1, eps
        return x

    # Twins sit off-axis so rel(B) ≈ rel(twin) but sim(B, twin) is far
    # below 1 — the regime where λ=0.5 actually reorders.
    rows = [
        (0, v(1.0, 0.0), 0),        # query
        (1, v(0.9, 0.436), 0),      # A1 twin
        (2, v(0.9, 0.4361), 0),     # A2 twin (redundant with A1)
        (3, v(0.9, -0.436), 0),     # B diverse (mirror of the twins)
    ] + [(i, v(0.1, 0.9, 0.01 * i), 0) for i in range(4, 12)]
    d = str(tmp_path / "mmr")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")

    got = llm_simsearch_mmr(spark, d).collect()
    assert len(got) == MMR_K
    order = [r["vec_id"] for r in got]
    assert order[0] == 1  # most relevant twin leads
    assert order.index(3) < order.index(2)  # diverse B beats redundant twin A2
    # ranks are 1..K and mmr never exceeds λ·relevance
    assert [r["sel_rank"] for r in got] == list(range(1, MMR_K + 1))
    assert all(r["mmr_score"] <= 0.5 * r["relevance"] + 1e-12 for r in got)


def test_kmeans_iterate_wcss_monotone_and_converges(spark, tmp_path):
    from nova_pulsar_spark.operators.similarity import DIM, kmeans_iterate

    # two tight planted clusters; seeds 0/1 both start inside cluster A
    # so the loop must MOVE a centroid to claim cluster B
    rows = []
    for vid in range(20):
        v = [0.0] * DIM
        if vid < 10:
            v[0] = 5.0 + 0.01 * vid       # cluster A
        else:
            v[1] = 5.0 + 0.01 * vid       # cluster B
        rows.append((vid, v, 0))
    d = str(tmp_path / "km_it")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")

    cents, wcss = kmeans_iterate(spark, d, iters=4, k=2)
    # Lloyd guarantee: WCSS never increases
    assert all(a >= b - 1e-9 for a, b in zip(wcss, wcss[1:])), wcss
    # and it actually improved on the all-seeds-in-A start
    assert wcss[-1] < wcss[0] / 10
    # final centroids sit at the two planted means (order-free match)
    got = sorted((round(v[0], 3), round(v[1], 3)) for _, v in cents)
    a_mean = sum(5.0 + 0.01 * i for i in range(10)) / 10
    b_mean = sum(5.0 + 0.01 * i for i in range(10, 20)) / 10
    assert got == sorted([(round(a_mean, 3), 0.0), (0.0, round(b_mean, 3))])


def test_containment_bounds_and_dominates_jaccard(spark, sf_dir):
    """Overlap coefficient is in (0, 1] and >= Jaccard on every
    candidate pair (|A∩B|/min ≥ |A∩B|/|A∪B|); contained_doc is the
    pair member with the smaller word set."""
    from nova_pulsar_spark.operators.dedup import (
        llm_dedup_containment,
        llm_dedup_verify,
    )

    cont = {
        (r["doc_a"], r["doc_b"]): r
        for r in llm_dedup_containment(spark, sf_dir).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in llm_dedup_verify(spark, sf_dir).collect()
    }
    assert cont and set(cont) == set(jac)
    for pair, r in cont.items():
        assert 0.0 < r["containment"] <= 1.0 + 1e-12
        assert r["containment"] >= jac[pair] - 1e-12
        assert r["contained_doc"] in pair


def test_bm25_scores_positive_sorted_and_len_normalized(spark, sf_dir):
    from nova_pulsar_spark.operators.textstats import BM25_TOPK, llm_bm25_score

    rows = llm_bm25_score(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOPK
    scores = [r["score"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_terms_matched"] <= 3 for r in rows)


def test_pq_adc_approximates_exact_distance(spark, sf_dir):
    """ADC is a lossy but faithful proxy: results sort by adc_d2, every
    distance is non-negative, and the PQ top-k overlaps the exact
    top-k (recall > 0 even with the tiny 8-entry codebooks)."""
    from nova_pulsar_spark.operators.similarity import PQ_TOPK, llm_simsearch_pq

    rows = llm_simsearch_pq(spark, sf_dir).collect()
    assert len(rows) == PQ_TOPK
    adcs = [r["adc_d2"] for r in rows]
    assert all(a >= 0 for a in adcs)
    assert adcs == sorted(adcs)
    # exact top-k from the true_d2 the operator itself carries is not
    # enough (it only covers returned rows) — recompute brute force
    from pyspark.sql import functions as F

    from nova_pulsar_spark.operators.similarity import QUERY_VEC_ID, cosine
    from nova_pulsar_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    exact = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            F.expr(
                "aggregate(zip_with(embedding, qe, (x, y) -> "
                "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
                "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("d2"),
        )
        .orderBy("d2", "vec_id")
        .limit(PQ_TOPK)
        .collect()
    )
    overlap = {r["vec_id"] for r in rows} & {r["vec_id"] for r in exact}
    assert overlap, "PQ top-k shares nothing with exact top-k"


def test_semdedup_pairs_within_cluster_and_thresholded(spark, sf_dir):
    """Every emitted pair shares a cluster, clears the cosine
    threshold, and removed_vec is always the higher id (keep-first)."""
    from nova_pulsar_spark.operators.similarity import SEMDEDUP_T, llm_dedup_semdedup

    rows = llm_dedup_semdedup(spark, sf_dir).collect()
    assert rows, "semdedup should be non-vacuous on the fixture"
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert r["removed_vec"] == r["vec_b"]
        assert r["cos_sim"] >= SEMDEDUP_T


# --- winnowing / substring scrub / RRF (round-3 additions) -----------------


def test_winnowing_guarantee_shared_run_collides(spark):
    """The winnowing guarantee: any shared token run of length >=
    W+K-1 (= 8 here) must produce at least one shared fingerprint;
    and a doc with no shared grams shares nothing."""
    from nova_pulsar_spark.operators.textstats import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"prefix one two {shared} suffix tail"),
            (2, f"{shared} completely other ending words here"),
            (3, "nothing in common with the others at all nine ten"),
        ],
        "doc_id long, text string",
    )
    fps = {r.doc_id: set(r.fps) for r in winnowing_fingerprints(docs).collect()}
    assert fps[1] & fps[2], "shared 8-token run must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_winnowing_density_and_short_doc(spark):
    from nova_pulsar_spark.operators.textstats import winnowing_fingerprints

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, None), (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in winnowing_fingerprints(docs).collect()}
    # 7 tokens < W+K-1=8 -> no windows; NULL text -> no windows
    assert rows[1].sel == [] and rows[2].sel == []
    # 10 tokens -> 7 grams -> 3 windows, each selecting one min
    assert len(rows[3].sel) == 3
    assert 1 <= len(rows[3].fps) <= 3


def test_substring_scrub_removes_planted_span(spark):
    """Tokens covered by a cross-doc duplicated 8-token span are cut;
    everything else survives verbatim; short docs pass through."""
    from nova_pulsar_spark.operators.dedup import SUBSTR_K, substring_scrub

    assert SUBSTR_K == 8
    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 {span} u3 u4"),
            (2, f"v1 {span} v2 v3 v4 v5"),
            (3, "short doc under eight"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_scrub(docs).collect()}
    assert out[1].clean_text == "u1 u2 u3 u4"
    assert out[2].clean_text == "v1 v2 v3 v4 v5"
    assert out[3].clean_text == "short doc under eight"
    assert out[1].n_removed == 8 and out[3].n_removed == 0


def test_rrf_scores_recompute_from_ranks(spark, sf_dir):
    from nova_pulsar_spark.operators.similarity import RRF_C, RRF_TOPK, llm_simsearch_rrf

    rows = llm_simsearch_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOPK
    # fused score must equal the rank formula exactly, missing head -> 0
    for r in rows:
        exp = (1.0 / (RRF_C + r.r_sparse) if r.r_sparse is not None else 0.0) + (
            1.0 / (RRF_C + r.r_dense) if r.r_dense is not None else 0.0
        )
        assert r.rrf_score == exp
    # descending with doc_id tie-break
    keys = [(-r.rrf_score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_ivfpq_composes_ivf_pruning_with_pq_scores(spark, sf_dir):
    """IVF-PQ = PQ ADC restricted to the probed cells: every hit must
    come from <= 2 cells, and its ADC/exact distances must equal the
    unpruned PQ scoring bit-for-bit (the codebook is corpus-global)."""
    from nova_pulsar_spark.operators.similarity import (
        llm_simsearch_ivfpq,
        llm_simsearch_pq,
        pq_adc_scores,
    )
    from nova_pulsar_spark.sources.tables import load_table

    hits = llm_simsearch_ivfpq(spark, sf_dir).collect()
    assert 0 < len(hits) <= 10
    assert len({r.label for r in hits}) <= 2
    e = load_table(spark, sf_dir, "embeddings")
    full = {
        r.vec_id: (r.adc_d2, r.true_d2)
        for r in pq_adc_scores(e, spark, sf_dir).collect()
    }
    for r in hits:
        assert full[r.vec_id] == (r.adc_d2, r.true_d2)


def test_judge_quality_external_scorer_and_fallback(spark):
    """The S11-style validate-or-fallback contract on the data path:
    a valid external judge's scores land with judged_by='external';
    an invalid judge (wrong length / out-of-range / crash) falls back
    to the deterministic heuristic for the batch."""
    from nova_pulsar_spark.operators.pipeline import judge_quality

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, None)],
        "doc_id long, text string",
    )
    # valid external judge: constant 0.5
    out = {r.doc_id: r for r in judge_quality(docs, judge=lambda ts: [0.5] * len(ts)).collect()}
    assert out[1].judged_by == "external" and out[1].judge_score == 0.5
    assert out[3].judge_score is None  # NULL text never gets a score
    # invalid: wrong length (for every batch size) -> heuristic
    out = {r.doc_id: r for r in judge_quality(docs, judge=lambda ts: [0.5] * (len(ts) + 1)).collect()}
    assert out[1].judged_by == "heuristic" and out[1].judge_score == 3 / 50
    # invalid: out-of-range -> heuristic
    out = {r.doc_id: r for r in judge_quality(docs, judge=lambda ts: [7.0] * len(ts)).collect()}
    assert out[2].judged_by == "heuristic" and out[2].judge_score == 2 / 50
    # crash -> heuristic
    def boom(ts):
        raise RuntimeError("model down")

    out = {r.doc_id: r for r in judge_quality(docs, judge=boom).collect()}
    assert all(r.judged_by == "heuristic" for r in out.values())


def test_bpe_encode_merges_compose(spark):
    """th+e -> the: the ordered merge table must produce 'the' as ONE
    token, and untouched words stay character tokens."""
    from nova_pulsar_spark.operators.dedup import load_table  # noqa: F401  (style parity)
    from nova_pulsar_spark.operators.textstats import BPE_MERGES

    assert ("t", "h") in BPE_MERGES and ("th", "e") in BPE_MERGES
    from pyspark.sql import functions as F

    from nova_pulsar_spark.operators.textstats import (
        _bpe_apply,
        _bpe_char_stream_spark,
    )

    docs = spark.createDataFrame([(1, "the cat"), (2, "xyz")], "doc_id long, text string")
    t = docs.select("doc_id", F.expr("replace(text, ' ', '§')").alias("t1"))
    c = t.select("doc_id", F.expr(_bpe_char_stream_spark()).alias("cs"))
    m = {r.doc_id: r.ms for r in c.select("doc_id", F.expr(_bpe_apply("cs", "replace")).alias("ms")).collect()}
    assert m[1].split(" ")[0] == "the"  # two merges composed
    assert m[2] == "x y z"  # no merge applies


def test_mix_apply_downsamples_to_target(spark, sf_dir):
    """The most under-represented source keeps everything (rate 1.0);
    kept fractions track keep_rate; the decision is a pure function of
    doc_id (stable across runs)."""
    from nova_pulsar_spark.operators.pipeline import llm_mix_apply

    rows = llm_mix_apply(spark, sf_dir).collect()
    by_source: dict = {}
    for r in rows:
        st = by_source.setdefault(r.source, {"rate": r.keep_rate, "n": 0, "kept": 0})
        st["n"] += 1
        st["kept"] += int(r.kept)
    assert max(st["rate"] for st in by_source.values()) == 1.0
    for st in by_source.values():
        frac = st["kept"] / st["n"]
        assert abs(frac - st["rate"]) < 0.25  # hash noise at fixture sizes
    again = {(r.doc_id, r.kept) for r in llm_mix_apply(spark, sf_dir).collect()}
    assert {(r.doc_id, r.kept) for r in rows} == again


def test_incremental_dedup_flags_planted_crossover(spark, sf_dir):
    """Every reported match pairs a batch doc (id % 5 == 0) with an
    index doc (id % 5 != 0); est_jaccard = n_agree/8; rerun-stable."""
    from nova_pulsar_spark.operators.dedup import INCR_MOD, llm_dedup_incremental

    rows = llm_dedup_incremental(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.batch_doc % INCR_MOD == 0
        assert r.matched_index_doc % INCR_MOD != 0
        assert r.est_jaccard == r.n_agree / 8.0
        assert r.is_dup == (r.n_agree >= 4)
    # one row per batch doc (best-match argmax)
    assert len({r.batch_doc for r in rows}) == len(rows)


def test_prefiltered_search_matches_brute_force(spark, sf_dir):
    """Pre-filter hits = brute-force cosine ranking restricted to the
    predicate; survives_postfilter flags exactly the hits inside the
    unfiltered global top-k."""
    from nova_pulsar_spark.operators.similarity import (
        TOP_K,
        llm_simsearch_prefiltered,
        llm_simsearch_topk,
    )

    hits = llm_simsearch_prefiltered(spark, sf_dir).collect()
    brute = llm_simsearch_topk(spark, sf_dir).collect()  # unfiltered top-k
    qlabel_excluded = {r.label for r in hits}
    assert len(hits) == TOP_K
    # the query's own label never appears (the predicate)
    unfiltered_ids = {r.vec_id for r in brute}
    for r in hits:
        assert r.survives_postfilter == (r.vec_id in unfiltered_ids)
    # pre_rank is dense 1..k by descending cosine
    assert [r.pre_rank for r in sorted(hits, key=lambda r: -r.cosine)] == list(range(1, TOP_K + 1))
    assert qlabel_excluded  # non-vacuous


def test_k_anonymity_flags_planted_small_group(spark):
    """A quasi-identifier combination below k is at_risk; table_k is
    the global min; n_at_risk_rows sums the risky groups."""
    from nova_pulsar_spark.operators.dataquality import KANON_K
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    c = spark.createDataFrame(
        [(i, i % 2, "BIG") for i in range(20)] + [(100, 9, "RARE"), (101, 9, "RARE")],
        "c_custkey long, c_nationkey int, c_mktsegment string",
    )
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rows = g.select("c_nationkey", "c_mktsegment", "n", (F.col("n") < KANON_K).alias("at_risk")).collect()
    risky = {(r.c_nationkey, r.c_mktsegment) for r in rows if r.at_risk}
    assert risky == {(9, "RARE")}


def test_minhash_estimator_calibration_on_fixture(spark):
    """The 8-seed banded estimate tracks exact Jaccard on the fixture's
    candidate pairs: deterministic (fixed corpus + fixed hash family),
    so the bounds are exact regression pins, not statistics — mean
    |est - true| ~0.13, worst 0.65 (J(1-J)/8 variance at 8 seeds)."""
    from nova_pulsar_spark.registry import all_queries

    regs = all_queries()
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in regs["llm_dedup_near"].fn(spark, SF).collect()
    }
    true = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in regs["llm_dedup_verify"].fn(spark, SF).collect()
    }
    common = set(est) & set(true)
    assert len(common) >= 20  # non-vacuous
    errs = [abs(est[k] - true[k]) for k in common]
    assert sum(errs) / len(errs) <= 0.2
    assert max(errs) <= 0.7


def test_multimodal_bytes_dedup_planted_copies(spark, monkeypatch):
    """Planted byte-identical payloads collapse to one digest group:
    lowest id kept, reclaimable = (n-1) * payload size."""
    from nova_pulsar_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(7, "same payload bytes"), (3, "same payload bytes"), (9, "unique")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(M, "binarize_documents", lambda _s, _d: docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("payload_bytes"),
    ))
    rows = {r.payload_md5: r for r in M.multimodal_dedup_bytes(spark, "unused").collect()}
    dup = [r for r in rows.values() if r.is_dup]
    assert len(dup) == 1 and len(rows) == 2
    assert dup[0].n_copies == 2 and dup[0].keep_id == 3
    assert dup[0].reclaimable_bytes == dup[0].payload_bytes
    uniq = [r for r in rows.values() if not r.is_dup][0]
    assert uniq.reclaimable_bytes == 0


def test_pca_power_step_matches_numpy(spark):
    """v' = X^T(Xv0) within fixed-point tolerance (N/2^20 per dim),
    v_next unit-norm, Rayleigh quotient ~ ||Xv0||^2 >= 0 (PSD)."""
    import numpy as np
    import pandas as pd

    from nova_pulsar_spark.operators.similarity import llm_pca_power_step

    rows = llm_pca_power_step(spark, SF).collect()
    assert len(rows) == 64 and sorted(r.i for r in rows) == list(range(1, 65))
    X = np.array(
        pd.read_parquet(f"{SF}/embeddings.parquet")["embedding"].tolist(),
        dtype=np.float64,
    )
    s = X.sum(axis=1) * 0.125  # <x, v0> with v0 = 1/8
    want = X.T @ s
    tol = len(X) / 1048576.0 + 1e-9
    got = {r.i: r for r in rows}
    for j in range(64):
        assert abs(got[j + 1].xtxv - want[j]) <= tol, j
    nrm = sum(r.v_next**2 for r in rows)
    assert abs(nrm - 1.0) <= 1e-9
    ray = rows[0].rayleigh_q
    assert all(abs(r.rayleigh_q - ray) <= 0 for r in rows)  # constant column
    assert ray >= -tol  # v0^T X^T X v0 = ||Xv0||^2 up to fixed-point error
    assert abs(ray - 0.125 * float(want.sum())) <= 64 * tol


def test_bitext_margin_matches_brute_force_over_candidates(spark):
    """Forward-best target + margin recomputed in numpy from the SAME
    candidate pairs; mutual_best flags exactly the reciprocal argmax."""
    import numpy as np
    import pandas as pd

    from nova_pulsar_spark.operators.similarity import (
        BITEXT_K,
        BITEXT_SRC_LABEL,
        BITEXT_TGT_LABEL,
        _sign_lsh_candidates,
        llm_bitext_margin,
    )
    from nova_pulsar_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    cand = _sign_lsh_candidates(spark, e, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    lab = dict(zip(emb.vec_id, emb.label))

    pairs = []  # (src, tgt, cos) over cross-label candidates
    for a, b in zip(cand.vec_a, cand.vec_b):
        la, lb = lab[a], lab[b]
        if {la, lb} != {BITEXT_SRC_LABEL, BITEXT_TGT_LABEL}:
            continue
        src, tgt = (a, b) if la == BITEXT_SRC_LABEL else (b, a)
        x, y = vecs[a], vecs[b]
        den = np.sqrt(x @ x) * np.sqrt(y @ y)
        if den == 0:
            continue
        pairs.append((src, tgt, float(x @ y) / den))

    def knn_avg(items):  # items: [(key, other, cos)]
        out = {}
        by = {}
        for k, o, c in items:
            by.setdefault(k, []).append((-c, o, c))
        for k, lst in by.items():
            lst.sort()
            top = [c for _, _, c in lst[:BITEXT_K]]
            out[k] = sum(top) / len(top)
        return out

    nn_s = knn_avg([(s, t, c) for s, t, c in pairs])
    nn_t = knn_avg([(t, s, c) for s, t, c in pairs])
    margins = {
        (s, t): c / ((nn_s[s] + nn_t[t]) * 0.5)
        for s, t, c in pairs
        if (nn_s[s] + nn_t[t]) != 0
    }
    fwd = {}
    for (s, t), mg in margins.items():
        cur = fwd.get(s)
        if cur is None or (mg, -t) > (cur[1], -cur[0]):
            fwd[s] = (t, mg)
    bwd = {}
    for (s, t), mg in margins.items():
        cur = bwd.get(t)
        if cur is None or (mg, -s) > (cur[1], -cur[0]):
            bwd[t] = (s, mg)

    got = {r.src_id: r for r in llm_bitext_margin(spark, SF).collect()}
    assert set(got) == set(fwd)
    assert len(got) >= 3  # non-vacuous on sf0.001
    for s, r in got.items():
        t, mg = fwd[s]
        assert r.tgt_id == t and abs(r.margin - mg) <= 1e-9, s
        assert r.mutual_best == (bwd.get(t, (None,))[0] == s), (s, t)
    assert any(r.mutual_best for r in got.values())


def test_dsir_weights_match_reference_computation(spark):
    """Per-doc mean likelihood ratio recomputed exactly (same md5
    bucketing, smoothing, and fixed-point floor) in plain Python."""
    import hashlib
    import math

    import pandas as pd

    from nova_pulsar_spark.operators.pipeline import (
        DSIR_FP,
        DSIR_NB,
        DSIR_TARGET_SOURCE,
        llm_dsir_weights,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def bucket(tok: str) -> int:
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        return int(h[:4], 16) % DSIR_NB

    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    toks: dict[int, list[int]] = {}
    for r in docs.itertuples():
        if r.text is None:
            continue
        bs = [bucket(t) for t in r.text.split(" ")]
        toks[r.doc_id] = bs
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if r.source == DSIR_TARGET_SOURCE:
                ct[b] = ct.get(b, 0) + 1
    tr_all, tt_all = sum(cr.values()), sum(ct.values())
    qr = {
        b: math.floor(
            float(ct.get(b, 0) + 1)
            * float(tr_all + DSIR_NB)
            / (float(cr[b] + 1) * float(tt_all + DSIR_NB))
            * DSIR_FP
        )
        for b in cr
    }
    got = {r.doc_id: r for r in llm_dsir_weights(spark, SF).collect()}
    assert set(got) == set(docs.doc_id)
    n_null = 0
    for doc_id, bs in toks.items():
        want = sum(qr[b] for b in bs) / DSIR_FP / len(bs)
        assert abs(got[doc_id].dsir_weight - want) <= 1e-12, doc_id
        assert got[doc_id].n_tokens == len(bs)
    for doc_id in set(got) - set(toks):
        assert got[doc_id].dsir_weight is None and got[doc_id].n_tokens == 0
        n_null += 1
    # target-source docs score above the corpus median (selection signal)
    tgt_w = [r.dsir_weight for r in got.values() if r.source == DSIR_TARGET_SOURCE and r.dsir_weight is not None]
    all_w = sorted(r.dsir_weight for r in got.values() if r.dsir_weight is not None)
    if tgt_w:
        med = all_w[len(all_w) // 2]
        assert sum(w > med for w in tgt_w) >= len(tgt_w) / 2


def test_dedup_pagerank_mass_and_hubs(spark):
    """PR over the candidate graph: scores form a probability
    distribution over graph nodes, high-degree hubs outrank leaves,
    and degree matches the symmetrized candidate-pair counts."""
    from nova_pulsar_spark.operators.dedup import dedup_candidates, llm_dedup_pagerank

    rows = llm_dedup_pagerank(spark, SF).collect()
    _, cand, _ = dedup_candidates(spark, SF)
    pairs = [(r.doc_a, r.doc_b) for r in cand.collect()]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert {r.doc_id for r in rows} == set(deg)
    assert all(r.degree == deg[r.doc_id] for r in rows)
    assert abs(sum(r.pr for r in rows) - 1.0) <= 1e-6  # conserved mass
    if len({r.degree for r in rows}) > 1:
        top = max(rows, key=lambda r: r.pr)
        assert top.degree >= sorted(r.degree for r in rows)[len(rows) // 2]


def test_pca_power_iteration_converges_to_top_eigenvector(spark, tmp_path):
    """The full power loop converges to numpy's dominant eigenvector
    (planted-spike corpus — the sf fixtures' spectrum is deliberately
    flat, where power iteration needs O(100) passes) and the Rayleigh
    trace is non-decreasing on the real fixture too."""
    import numpy as np
    import pandas as pd

    from nova_pulsar_spark.operators.similarity import DIM, pca_top_component

    rng = np.random.default_rng(7)
    u = rng.standard_normal(DIM)
    u /= np.linalg.norm(u)
    X = np.outer(rng.standard_normal(120) * 3.0, u) + 0.1 * rng.standard_normal((120, DIM))
    d = str(tmp_path / "spiked")
    import os

    os.makedirs(d)
    pd.DataFrame(
        {
            "vec_id": np.arange(120, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in X],
            "label": np.zeros(120, dtype=np.int32),
        }
    ).to_parquet(f"{d}/embeddings.parquet")
    v, rays = pca_top_component(spark, d, iters=10)
    Xd = np.array([r.astype(np.float64) for r in pd.read_parquet(f"{d}/embeddings.parquet")["embedding"]])
    evals, evecs = np.linalg.eigh(Xd.T @ Xd)
    align = abs(float(np.asarray(v) @ evecs[:, -1]))
    assert align >= 0.999, align  # same direction up to sign
    assert abs(rays[-1] - float(evals[-1])) <= 1e-3 * float(evals[-1])
    # monotone up, at the fixed-point accumulator's error scale
    # (floor(s*x*2^20) loses < n_rows/2^20 per dimension sum)
    fp_tol = 120 / 1048576.0 * 10
    assert all(b >= a - fp_tol for a, b in zip(rays, rays[1:]))
    # real fixture: flat spectrum, but the trace must still be monotone
    _, rf = pca_top_component(spark, SF, iters=5)
    assert all(b >= a - fp_tol for a, b in zip(rf, rf[1:]))


def test_mix_budget_waterfilling_invariants(spark, tmp_path):
    """Waterfilling invariants on a planted skewed corpus: allocations
    sum to the budget, saturated sources contribute all they have,
    unsaturated ones sit exactly at the common level >= every
    saturated availability."""
    from nova_pulsar_spark.operators.pipeline import llm_mix_budget

    rows = []
    did = 0
    for src, n_tok in [("tiny", 10), ("small", 40), ("mid", 200), ("big", 1000)]:
        rows.append((did, " ".join(["w"] * n_tok), "en", src, n_tok))
        did += 1
    d = str(tmp_path / "mb")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{d}/documents.parquet")
    out = {r["source"]: r for r in llm_mix_budget(spark, d).collect()}
    total = 10 + 40 + 200 + 1000
    budget = total // 2  # 625
    alloc = sum(r["allocated_tokens"] for r in out.values())
    assert abs(alloc - budget) < 1e-9, (alloc, budget)
    # tiny/small/mid saturate; big sits at the level
    assert out["tiny"]["saturated"] == 1 and out["tiny"]["allocated_tokens"] == 10
    assert out["small"]["saturated"] == 1 and out["mid"]["saturated"] == 1
    lvl = out["big"]["water_level"]
    assert out["big"]["saturated"] == 0 and abs(out["big"]["allocated_tokens"] - lvl) < 1e-12
    assert lvl >= 200 and lvl == budget - 250  # (625 - 250) / 1 remaining source
