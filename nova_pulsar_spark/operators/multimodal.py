"""Multimodal column handling: opaque binary payloads + typed metadata.

North-star layer (BASELINE.json): image/audio/video are `binary`
columns with struct metadata; decode / feature-extraction runs as
Arrow-batched Pandas UDFs over `mapInPandas`. The container has no
image/audio libraries, so the decode step is a clearly-marked
deterministic fake (`FakeDecoder`) behind the same interface a real
libjpeg/ffmpeg-backed decoder would implement — the Spark-side
plumbing (schema, batching, partitioning) is real and tested.

Scale notes: binary payloads dominate bytes at 100 TB — the layout
keeps metadata in columnar fields so filters/aggregations never
deserialize payloads (parquet column pruning skips the binary column
entirely unless a decode stage asks for it); decode stages are
mapInPandas over Arrow batches, sized by
`spark.sql.execution.arrow.maxRecordsPerBatch` to bound executor
memory against large payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → an opaque binary `payload` column + metadata.

    Stand-in for a real multimodal table: (id, payload binary,
    media_type, payload_bytes)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("payload_bytes"),
    )


@register(
    "multimodal_meta",
    sql="""
    SELECT
      doc_id,
      md5(text) AS payload_md5,
      CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
      'text/plain' AS media_type
    FROM documents
    """,
    doc="Binary payload metadata scan: hash + size without decoding (column pruning keeps payloads unread)",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binarize_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.col("payload_bytes"),
        F.col("media_type"),
    )


def _pil_image_module():
    """Pillow's Image module when importable, else None — the importlib
    gate that selects the real decode path per worker environment."""
    import importlib

    try:
        return importlib.import_module("PIL.Image")
    except ImportError:
        return None


def _decode_png_stdlib(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_gray) for non-interlaced 8-bit gray/RGB
    PNGs using ONLY the stdlib (zlib inflate + per-row unfilter) — the
    real-decode fallback where no media library exists. RGB collapses
    to luma with Pillow's exact L24 fixed-point ITU-R 601-2 transform
    ((R*19595 + G*38470 + B*7471) >> 16), so environments with and
    without Pillow produce identical features for the supported
    subset. Anything else (16-bit, palette, interlaced, JPEG...)
    raises — the importlib gate's contract, now with a live in-sandbox
    branch instead of an unexecutable one."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("stdlib decode fallback handles PNG only")
    pos, w, h, ctype, idat = 8, None, None, None, b""
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
        pos += 8
        data = payload[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, bitd, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if bitd != 8 or ctype not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    "stdlib PNG path supports 8-bit grayscale/RGB non-interlaced only"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(idat)
    ch = 1 if ctype == 0 else 3
    stride = w * ch
    prev = bytearray(stride)
    total = 0
    p = 0
    for _ in range(h):
        f = raw[p]
        p += 1
        row = bytearray(raw[p : p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter byte {f}")
        if ch == 1:
            total += sum(row)
        else:
            for i in range(0, stride, 3):
                total += (row[i] * 19595 + row[i + 1] * 38470 + row[i + 2] * 7471) >> 16
        prev = row
    n = w * h
    return w, h, (total / n) if n else 0.0


class FakeDecoder:
    """Deterministic stand-in for an image/audio decoder.

    A real deployment implements ``decode(payload) -> features`` with
    libjpeg/ffmpeg; this fake derives stable pseudo-features from the
    payload bytes so the distributed plumbing is fully testable. The
    real-library entry point uses Pillow when importable (importlib
    gate — no hard dependency) and raises NotImplementedError where no
    media libs exist, keeping this container's oracle path unchanged.
    """

    @staticmethod
    def decode_real(payload: bytes) -> tuple[int, int, float]:
        """(width, height, mean_gray_intensity) via Pillow when the
        library is present; same contract as ``fake_features``."""
        Image = _pil_image_module()
        if Image is None:
            # No Pillow: the stdlib PNG decoder covers the 8-bit
            # gray/RGB subset LIVE (feature parity via the same L24
            # transform); everything else keeps the explicit seam.
            return _decode_png_stdlib(payload)
        import io

        with Image.open(io.BytesIO(payload)) as im:
            gray = im.convert("L")
            width, height = gray.size
            data = list(gray.getdata())
            mean = (sum(data) / len(data)) if data else 0.0
            return width, height, mean

    @staticmethod
    def fake_features(payload: bytes) -> tuple[int, int, float]:
        """(width, height, mean_intensity) derived from payload bytes."""
        n = len(payload)
        width = 16 + (n % 64)
        height = 16 + ((n // 64) % 64)
        mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
        return width, height, mean


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)


def decode_real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker on the REAL decoder (Pillow or the stdlib
    PNG fallback) — same schema/NULL contract as ``decode_batches``;
    the production body, exercised live by tests/test_multimodal
    against in-sandbox-synthesized PNGs."""
    for pdf in it:
        feats = pdf["payload"].map(
            lambda p: (None, None, None) if p is None else FakeDecoder.decode_real(bytes(p))
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": feats.map(lambda t: t[0]).astype("Int32"),
                "height": feats.map(lambda t: t[1]).astype("Int32"),
                "mean_intensity": feats.map(lambda t: t[2]).astype("float64"),
                "payload_bytes": pdf["payload_bytes"],
            }
        )


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → decoded feature batch out."""
    for pdf in it:
        # NULL payloads decode to NULL features — the same NULL
        # propagation the SQL twin gets for free from encode(NULL)
        feats = pdf["payload"].map(
            lambda p: (None, None, None) if p is None else FakeDecoder.fake_features(p)
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": feats.map(lambda t: t[0]).astype("Int32"),
                "height": feats.map(lambda t: t[1]).astype("Int32"),
                "mean_intensity": feats.map(lambda t: t[2]).astype("float64"),
                "payload_bytes": pdf["payload_bytes"],
            }
        )


@register(
    "multimodal_decode",
    # The decode path runs through mapInPandas (the real plumbing), but
    # FakeDecoder's feature math is pure arithmetic on the payload
    # BYTES — which the twin reproduces exactly by walking the hex
    # encoding two chars at a time (ascii(substr(text, ...)) would
    # return CODEPOINTS and diverge on any non-ASCII document —
    # edge-case fuzz finding). mean_intensity is one int/int division
    # on both engines → bit-identical for arbitrary UTF-8 input.
    sql="""
    WITH f AS (
      SELECT doc_id, 'text/plain' AS media_type, hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents)
    SELECT doc_id, media_type,
      CAST(16 + (n % 64) AS INT) AS width,
      CAST(16 + ((n // 64) % 64) AS INT) AS height,
      CASE WHEN n IS NULL THEN NULL  -- DuckDB concat('0x', NULL) = '0x', which would fail the cast
           WHEN n = 0 THEN 0.0
           ELSE CAST(list_sum(list_transform(range(1, CAST(least(n, 256) AS INT) + 1),
                                             i -> CAST(concat('0x', substr(hx, 2*i-1, 2)) AS BIGINT))) AS DOUBLE)
                / least(n, 256) END AS mean_intensity,
      n AS payload_bytes
    FROM f
    """,
    doc="mapInPandas decode/feature-extract over Arrow batches (FakeDecoder stands in for media libs)",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binarize_documents(spark, sf_dir)
    return b.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


RESIZE_TARGET = 224

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
    ]
)


def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """decode → resize pipeline stage in ONE mapInPandas pass (payloads
    cross the Arrow boundary once; a real deployment calls PIL/opencv
    here). Fit-to-box preserving aspect ratio; all doubles are single
    mult/div ops so the SQL twin is bit-identical."""
    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:  # NULL propagation, mirroring the twin
                rows.append(dict(doc_id=doc_id, width=None, height=None,
                                 out_w=None, out_h=None, scale=None))
                continue
            w, h, _ = FakeDecoder.fake_features(payload)
            scale = float(RESIZE_TARGET) / max(w, h)
            rows.append(
                {
                    "doc_id": doc_id,
                    "width": w,
                    "height": h,
                    "out_w": int(w * scale),
                    "out_h": int(h * scale),
                    "scale": scale,
                }
            )
        out = pd.DataFrame(rows)
        for c in ("width", "height", "out_w", "out_h"):
            out[c] = out[c].astype("Int32")
        yield out


@register(
    "multimodal_resize",
    sql=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(16 + (octet_length(encode(text)) % 64) AS INT) AS width,
             CAST(16 + ((octet_length(encode(text)) // 64) % 64) AS INT) AS height
      FROM documents)
    SELECT doc_id, width, height,
      CAST(FLOOR(width * (CAST({RESIZE_TARGET} AS DOUBLE) / greatest(width, height))) AS INT) AS out_w,
      CAST(FLOOR(height * (CAST({RESIZE_TARGET} AS DOUBLE) / greatest(width, height))) AS INT) AS out_h,
      CAST({RESIZE_TARGET} AS DOUBLE) / greatest(width, height) AS scale
    FROM f
    """,
    doc="Resize plumbing: decode→fit-to-224 in one mapInPandas stage (aspect "
    "preserved; real deployments swap FakeDecoder for PIL/opencv)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binarize_documents(spark, sf_dir)
    return b.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


AUDIO_CHUNK_BYTES = 128  # analysis window (sized to the test corpus's
AUDIO_HOP_BYTES = 64  # ~300-byte payloads; 50% overlap either way)


@register(
    "multimodal_audio_chunk",
    sql=f"""
    WITH f AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents WHERE octet_length(encode(text)) > 0)
    SELECT f.doc_id,
           CAST(s.i AS INT) AS chunk_no,
           s.i * {AUDIO_HOP_BYTES} AS start_byte,
           least(s.i * {AUDIO_HOP_BYTES} + {AUDIO_CHUNK_BYTES}, f.n) AS end_byte,
           least(s.i * {AUDIO_HOP_BYTES} + {AUDIO_CHUNK_BYTES}, f.n) = f.n AS is_last
    FROM f CROSS JOIN LATERAL (SELECT UNNEST(range(0, (f.n - 1) // {AUDIO_HOP_BYTES} + 1)) AS i) s
    """,
    doc="Audio chunking plumbing: overlapping fixed windows per payload (the "
    "streaming-ASR seek table) — pure built-ins, no UDF, payloads never explode",
)
def multimodal_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk offsets are derived from metadata ONLY (payload_bytes) —
    the binary column itself is pruned from the scan; the chunk table
    is what a downstream mapInPandas ASR stage would join against,
    reading each payload slice once."""
    b = binarize_documents(spark, sf_dir)
    n = F.col("payload_bytes")
    return (
        b.filter(n > 0)
        .select(
            "doc_id",
            n.alias("n"),
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.floor((n - 1) / AUDIO_HOP_BYTES).cast("bigint"),
                )
            ).alias("pos", "i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_no"),
            (F.col("i") * AUDIO_HOP_BYTES).alias("start_byte"),
            F.least(F.col("i") * AUDIO_HOP_BYTES + AUDIO_CHUNK_BYTES, F.col("n")).alias(
                "end_byte"
            ),
            (
                F.least(F.col("i") * AUDIO_HOP_BYTES + AUDIO_CHUNK_BYTES, F.col("n"))
                == F.col("n")
            ).alias("is_last"),
        )
    )


@register(
    "multimodal_frame_sample",
    sql="""
    WITH f AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
      FROM documents)
    SELECT f.doc_id, s.i AS frame_no,
           (f.payload_bytes * s.i) // 8 AS frame_offset
    FROM f CROSS JOIN (SELECT UNNEST(range(0, 8)) AS i) s
    WHERE f.payload_bytes >= 8
    """,
    doc="Frame sampling plumbing: 8 evenly-spaced offsets per payload (the video path's seek table)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binarize_documents(spark, sf_dir)
    frames = spark.range(8).select(F.col("id").cast("int").alias("frame_no"))
    return (
        b.filter(F.col("payload_bytes") >= 8)
        .crossJoin(F.broadcast(frames))
        .select(
            "doc_id",
            "frame_no",
            F.floor(F.col("payload_bytes") * F.col("frame_no") / 8).cast("bigint").alias("frame_offset"),
        )
    )


PHASH_PIXELS = 60  # 60-bit average-hash (BIGINT-safe on both engines)


def phash_frame(b: DataFrame) -> DataFrame:
    """(doc_id, phash) via mapInPandas over Arrow batches.

    Average-hash (aHash): the first 60 payload bytes act as the
    grayscale thumbnail; bit i is set iff pixel i is brighter than the
    thumbnail mean (integer cross-multiply p_i*60 > sum — no float
    mean, so the hash is bit-identical everywhere). A real image
    pipeline decodes + resizes to the 8x8 grid first (FakeDecoder's
    real path does this under Pillow); the hash math is unchanged.
    Payloads shorter than 60 bytes are skipped, mirrored in the twin.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # twin: octet_length(NULL) filter
                    continue
                px = bytes(payload)[:PHASH_PIXELS]
                if len(px) < PHASH_PIXELS:
                    continue
                s = sum(px)
                h = 0
                for i, p in enumerate(px):
                    if p * PHASH_PIXELS > s:
                        h |= 1 << i
                rows.append({"doc_id": doc_id, "phash": h})
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return b.mapInPandas(compute, "doc_id long, phash long")


@register(
    "multimodal_phash_dedup",
    sql=f"""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(1, {PHASH_PIXELS} + 1),
                            i -> CAST(concat('0x', substr(hex(encode(text)), 2*i-1, 2)) AS BIGINT)) AS p
      FROM documents WHERE octet_length(encode(text)) >= {PHASH_PIXELS}),
    hashed AS (
      SELECT doc_id,
             list_sum(list_transform(range(1, {PHASH_PIXELS} + 1),
               i -> CASE WHEN p[i] * {PHASH_PIXELS} > list_sum(p)
                         THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)) AS phash
      FROM px)
    SELECT doc_id, CAST(phash AS BIGINT) AS phash,
           CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same,
           CAST(MIN(doc_id) OVER (PARTITION BY phash) AS BIGINT) AS keeper_id
    FROM hashed
    """,
    doc=f"Perceptual-hash (average-hash) image dedup: {PHASH_PIXELS}-bit "
    "brightness fingerprint via mapInPandas, exact-hash dup groups — tolerant "
    "of tail edits where md5 is not",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-style near-dup over binary payloads: unlike md5 (any byte
    flip changes everything), aHash depends only on the thumbnail's
    brightness PATTERN, so re-encodes/tail edits that preserve the
    leading pixels collide — the cheap first tier of image dedup
    (pHash/dHash refine it; Hamming-band blocking like
    llm_dedup_simhash_banded is the within-distance tier). The hash
    runs in mapInPandas over Arrow batches (the real UDF plumbing;
    payload column pruned until here), dup grouping is one 8-byte-key
    exchange. The window twin's n_same/keeper follow the
    llm_dedup_exact contract."""
    from pyspark.sql.window import Window as W

    b = binarize_documents(spark, sf_dir)
    hashed = phash_frame(b)
    w = W.partitionBy("phash")
    return hashed.select(
        "doc_id",
        "phash",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_same"),
        F.min("doc_id").over(w).cast("bigint").alias("keeper_id"),
    )


# --- Exact payload dedup (the binary-column counterpart of phash) ----------


@register(
    "multimodal_dedup_bytes",
    sql="""
    WITH b AS (
      SELECT doc_id, md5(text) AS payload_md5,
             CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
      FROM documents WHERE text IS NOT NULL)
    SELECT payload_md5,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           COUNT(*) > 1 AS is_dup,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(MIN(payload_bytes) AS BIGINT) AS payload_bytes,
           CAST(SUM(payload_bytes) - MIN(payload_bytes) AS BIGINT) AS reclaimable_bytes
    FROM b GROUP BY payload_md5
    """,
    doc="Exact binary-payload dedup: md5 over the payload column, keep "
    "lowest id per digest, reclaimable-bytes accounting (the storage "
    "dedup pass a multimodal corpus runs before any decoding)",
)
def multimodal_dedup_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical asset dedup — the cheapest and highest-yield pass
    on a multimodal corpus (crawls re-fetch the same image/audio under
    many URLs). Digest-groupBy over md5(payload): the shuffle carries
    (16-byte digest, id, size) rows, the payload column itself never
    moves — at 100 TB that is the difference between shuffling
    kilobyte keys and shuffling the corpus. `reclaimable_bytes` prices
    the win before anyone commits to the rewrite; the near-dup
    complement is `multimodal_phash_dedup` (perceptual), exactly like
    llm_dedup_exact vs llm_dedup_near on text. NULL payloads are
    excluded on both engines (no digest to compare). The full digest
    inventory is reported (is_dup flags the duplicate groups) so the
    oracle comparison is non-vacuous at every test SF — the HAVING cut
    is the consumer's one-line filter."""
    b = binarize_documents(spark, sf_dir).filter(F.col("payload").isNotNull())
    return (
        b.groupBy(F.md5("payload").alias("payload_md5"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            (F.count(F.lit(1)) > 1).alias("is_dup"),
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.min("payload_bytes").cast("bigint").alias("payload_bytes"),
            (F.sum("payload_bytes") - F.min("payload_bytes")).cast("bigint").alias("reclaimable_bytes"),
        )
    )
