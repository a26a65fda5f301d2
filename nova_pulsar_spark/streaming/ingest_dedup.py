"""Streaming NEAR-duplicate detection at ingest time.

The batch dedup DAG (operators/dedup.py) probes a banded minhash
index; continuous ingestion wants the same check as a stream: every
arriving document either claims its band buckets or collides with the
document that already owns them. This module is that operator:

- minhash signatures are computed ROW-LOCALLY (array lambdas over the
  shingle array — no groupBy), because a pre-shuffle aggregation would
  be a second stateful operator in the stream;
- the state store IS the band index: ``groupBy(band, sig)`` +
  ``applyInPandasWithState``, state = the first doc_id to claim the
  bucket. Arrivals into an owned bucket emit candidate rows
  ``(doc_id, first_doc, is_new=false)`` — exactly the pairs the batch
  LSH join would produce, but incrementally and across micro-batches
  (checkpoint recovery keeps the index).

At 100 TB-ingest scale the state is |distinct (band, sig)| entries of
one long each — RocksDB-backed state handles billions; the hot-bucket
concern maps to per-key arrival rate, bounded upstream by the exact
dedup (`dropDuplicatesWithinWatermark`) running before this stage.

Reference parity: the queue's claim-CAS semantics (Q6,
`hooks/session-start.sh:60-67`) — first writer owns the key, later
writers are redirected — applied to the dedup index.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_BANDS = 4
_SEEDS_PER_BAND = 2

NEARDUP_OUT_SCHEMA = "band int, sig string, doc_id long, first_doc long, is_new boolean"
NEARDUP_STATE_SCHEMA = "first_doc long"


def band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) from a (doc_id, text) frame — row-local.

    Per-seed min-hash via ``array_min`` over the shingle array (the
    batch path's groupBy-min, folded into one row): seed k reads the
    16-hex slice at 4k of md5(shingle) / md5('#'+shingle) — the same
    family as ``minhash_signatures``, so stream and batch agree on
    buckets. Docs with no shingles (under 3 words, NULL text) emit no
    rows and never enter the index.
    """
    def seed_min(s: int) -> str:
        src = "md5(CAST(x AS BINARY))" if s < 4 else "md5(CAST(concat('#', x) AS BINARY))"
        off = (s % 4) * 4 + 1
        return f"array_min(transform(sh, x -> substring({src}, {off}, 16)))"

    band_cols = [
        F.expr(f"concat({seed_min(b * _SEEDS_PER_BAND)}, {seed_min(b * _SEEDS_PER_BAND + 1)})").alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    shingled = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(split(text, ' ')) >= 3 THEN "
            "array_distinct(transform(sequence(1, size(split(text, ' ')) - 2), "
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))) "
            "ELSE CAST(array() AS ARRAY<STRING>) END"
        ).alias("sh"),
    ).filter(F.size("sh") > 0)
    wide = shingled.select("doc_id", *band_cols)
    stack = ", ".join(f"{b}, b{b}" for b in range(N_BANDS))
    return wide.selectExpr("doc_id", f"stack({N_BANDS}, {stack}) AS (band, sig)").select(
        F.col("doc_id"), F.col("band").cast("int").alias("band"), "sig"
    )


def _claim_bucket(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State fn: first arrival owns the (band, sig) bucket; later
    arrivals emit candidate rows against the owner. Deterministic
    within a batch: arrivals are processed in doc_id order."""
    band, sig = key
    (first_doc,) = state.get if state.exists else (None,)
    rows = []
    docs = sorted({int(d) for pdf in pdfs for d in pdf["doc_id"]})
    for d in docs:
        if first_doc is None:
            first_doc = d
            rows.append((band, sig, d, d, True))
        elif d != first_doc:
            rows.append((band, sig, d, int(first_doc), False))
    state.update((int(first_doc),))
    yield pd.DataFrame(rows, columns=["band", "sig", "doc_id", "first_doc", "is_new"])


def near_dup_stream(doc_stream: DataFrame) -> DataFrame:
    """Wire the band index as a streaming stateful op. ``doc_stream``
    needs (doc_id, text); output is NEARDUP_OUT_SCHEMA in update mode."""
    return (
        band_signatures(doc_stream)
        .groupBy("band", "sig")
        .applyInPandasWithState(
            _claim_bucket,
            outputStructType=NEARDUP_OUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- Embedding (ANN) ingest dedup: sign-LSH buckets as stream state --------

# Fixed claim rung: a stream cannot know final corpus size, so buckets
# are claimed at the ladder's base width; the batch compaction that
# folds stream state into the persisted index re-keys onto the stored
# full-width keys (operators/similarity.py `llm_ingest_rekey`).
from nova_pulsar_spark.operators.similarity import EMB_STREAM_BITS  # noqa: E402

EMB_NEARDUP_OUT_SCHEMA = "band int, sig string, vec_id long, first_vec long, is_new boolean"


def embedding_band_signatures(vecs: DataFrame) -> DataFrame:
    """(vec_id, band, sig) from a (vec_id, embedding) frame — row-local
    (one transform lambda over the hyperplane literals; no groupBy, so
    it composes with the single stateful operator downstream). Uses the
    SAME md5-derived hyperplanes as the batch index, so stream claims
    and batch probes agree on buckets at the claim rung."""
    from nova_pulsar_spark.operators.similarity import BAND_BITS, N_BANDS as EMB_BANDS, _signs_spark

    sigs = vecs.select(F.col("vec_id").alias("doc_id"), _signs_spark().alias("signs"))
    band_cols = [
        F.substring(F.col("signs"), b * BAND_BITS + 1, EMB_STREAM_BITS).alias(f"b{b}")
        for b in range(EMB_BANDS)
    ]
    wide = sigs.select("doc_id", *band_cols)
    stack = ", ".join(f"{b}, b{b}" for b in range(EMB_BANDS))
    return wide.selectExpr("doc_id", f"stack({EMB_BANDS}, {stack}) AS (band, sig)").select(
        "doc_id", F.col("band").cast("int").alias("band"), "sig"
    )


def embedding_near_dup_stream(vec_stream: DataFrame) -> DataFrame:
    """The ANN mirror of ``near_dup_stream``: every arriving embedding
    either claims its sign-LSH buckets or collides with the vector
    that owns them — incremental embedding dedup at ingest, state =
    the band index, checkpoint-recoverable. ``vec_stream`` needs
    (vec_id, embedding); output is EMB_NEARDUP_OUT_SCHEMA in update
    mode. Shares ``_claim_bucket`` (claim-CAS semantics) with the text
    path — the state layout is identical, only the signature family
    differs."""
    out = (
        embedding_band_signatures(vec_stream)
        .groupBy("band", "sig")
        .applyInPandasWithState(
            _claim_bucket,
            outputStructType=NEARDUP_OUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return out.select(
        "band",
        "sig",
        F.col("doc_id").alias("vec_id"),
        F.col("first_doc").alias("first_vec"),
        "is_new",
    )
