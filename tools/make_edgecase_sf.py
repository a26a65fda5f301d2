"""Generate an adversarial sf_dir for cross-engine divergence fuzzing.

Every table carries the values most likely to split Spark and DuckDB:
empty/1-word/2-word documents (phantom-shingle territory), unicode and
repeated-delimiter text, zero and identical embeddings, tied
timestamps, constant/negative/zero event values, boundary lineitem
measures. Run the full oracle sweep against it:

    python tools/make_edgecase_sf.py /tmp/edgecase_sf
    python tools/check_oracle.py /tmp/edgecase_sf

A PASS here means the engine and its DuckDB twins agree even on the
degenerate inputs a 100 TB corpus is guaranteed to contain.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_pulsar_spark.session import get_spark


def _write(df, path: str) -> None:
    """Single parquet FILE (not a Spark directory) so DuckDB's plain
    '<table>.parquet' view pattern works, mirroring the driver's
    testdata layout — including NAIVE timestamp[us] columns (Spark's
    toArrow emits tz=UTC; the driver's parquet is timezone-naive)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = df.toArrow()
    fields = [
        pa.field(f.name, pa.timestamp("us"))
        if pa.types.is_timestamp(f.type) and f.type.tz is not None
        else f
        for f in t.schema
    ]
    pq.write_table(t.cast(pa.schema(fields)), path)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("edgecase-gen")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = dt.datetime(2026, 3, 1, 10, 0, 0)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)

    docs = [
        # doc_id 0..4 overlap the N_BENCHMARK_DOCS window used by the
        # contamination queries — keep them plain.
        (0, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
        (1, "", "en", "web", 0),                          # empty text
        (2, "single", "en", "web", 6),                    # 1 word
        (3, "two words", "en", "web", 9),                 # 2 words (shingle edge)
        (4, "a a a a a a a a", "en", "web", 15),          # max repetition
        (5, "naïve café über straße 日本語 текст", "de", "web", 33),  # unicode
        (6, "the quick brown fox jumps over the lazy dog", "en", "books", 43),  # exact dup
        (7, "the quick brown fox jumps over the lazy dog extra", "en", "web", 49),  # near dup
        (8, "x", "fr", "web", 1),                         # 1 char
        (9, "word " * 50 + "tail", "en", "web", 254),     # long repetitive
        (10, "mail bob@example.com call 555-123-4567 acct 123456789", "en", "web", 53),  # PII
        (11, "el gato y el perro de la casa", "es", "web", 29),
        (12, "the cat sat on the mat with the cat", "en", "books", 35),
        (13, None, None, "web", None),                    # NULL text/lang
    ]
    _write(spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ), f"{out_dir}/documents.parquet")

    DIM = 64
    def vec(*pairs):
        v = [0.0] * DIM
        for i, x in pairs:
            v[i] = x
        return v

    embs = [
        (0, vec((0, 1.0)), 0),                    # the query vector
        (1, vec(), 0),                            # ZERO vector (norm 0)
        (2, vec((0, 1.0)), 0),                    # identical to query
        (3, vec((0, -1.0)), 1),                   # antipodal
        (4, vec((1, 1e-6)), 1),                   # tiny magnitude
        (5, vec((0, 0.5), (1, 0.5)), 1),
        (6, vec((0, 3e4), (1, 4e4)), 2),          # large magnitude
        (7, vec((2, 1.0)), 2),
        (8, vec((0, 0.6), (1, 0.8)), 2),
        (9, vec((0, 0.6), (1, 0.8)), 0),          # duplicate of 8, other label
    ]
    _write(spark.createDataFrame(
        embs, "vec_id bigint, embedding array<float>, label int"
    ), f"{out_dir}/embeddings.parquet")

    events = [
        # tied timestamps, same user
        (1, m(0), 7, "purchase", 10.0, '{"k": 1}'),
        (2, m(0), 7, "purchase", 20.0, '{"k": 2}'),
        # constant-value type (degenerate histogram range)
        (3, m(1), 7, "heartbeat", 5.0, None),
        (4, m(2), 8, "heartbeat", 5.0, None),
        (5, m(3), 9, "heartbeat", 5.0, None),
        # zero / negative values
        (6, m(4), 8, "refund", 0.0, '{"k": null}'),
        (7, m(5), 8, "refund", -12.5, "not json"),
        # purchase→error adjacency for the pattern query
        (8, m(6), 9, "purchase", 1.0, None),
        (9, m(7), 9, "error", 0.0, None),
        # lone user far in the future (gap-fill spine edge)
        (10, m(60 * 24), 10, "purchase", 3.0, '{"deep": {"a": [1, 2]}}'),
        # NULL event_type — PARTITION BY/GROUP BY treat NULL as a
        # regular group, so every group-key rejoin must be null-safe
        # (ranks.nullsafe_equi_join) or this group silently vanishes
        # from the Spark side while the window-only oracle keeps it
        (11, m(8), 7, None, 2.0, None),
        (12, m(9), 8, None, 4.0, '{"k": 3}'),
        (13, m(10), 9, None, None, None),  # NULL type AND NULL value
        # NULL ts — the timestamped-rows contract (round 6): engines
        # disagree on NULL ordering, so every time-ordered/windowed
        # operator excludes NULL ts EXPLICITLY on both sides (Spark's
        # window()/session_window drop them silently anyway); these
        # rows pin that the exclusion is mirrored in every oracle
        (14, None, 7, "purchase", 6.0, None),
        (15, None, 11, "error", None, None),  # whole user un-timestamped
        # non-finite values — the finite-measures contract (round 7):
        # exact accumulators (decimal/cents sums, FLOOR-binning,
        # histogram edges) are undefined on NaN/Inf; DuckDB refuses
        # CAST(nan AS BIGINT/DECIMAL) outright. Before the contract a
        # single NaN row crashed 24 registered queries LOUDLY (zero
        # silent divergences — NaN sorts greatest on both engines, so
        # rank/min/max paths agree); these rows pin that every exact-
        # accumulator op excludes non-finite input on BOTH engines
        (16, m(11), 7, "purchase", float("nan"), None),
        (17, m(12), 8, "refund", float("inf"), None),
        (18, m(13), 9, "error", float("-inf"), None),
    ]
    _write(spark.createDataFrame(
        events,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ), f"{out_dir}/events.parquet")

    region = [(0, "AMERICA"), (1, "ASIA")]
    _write(spark.createDataFrame(region, "r_regionkey int, r_name string"), f"{out_dir}/region.parquet")
    nation = [(0, "US", 0), (1, "JP", 1), (2, "BR", 0)]
    _write(spark.createDataFrame(
        nation, "n_nationkey int, n_name string, n_regionkey int"
    ), f"{out_dir}/nation.parquet")

    customer = [
        (1, "Customer#1", 0, 0.0, "BUILDING"),      # zero balance
        (2, "Customer#2", 1, -999.99, "AUTOMOBILE"), # negative balance
        (3, "Customer#3", 2, 9999.99, "BUILDING"),
        (4, "Customer#4", 0, 9999.99, "MACHINERY"),  # tied balance
    ]
    _write(spark.createDataFrame(
        customer,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ), f"{out_dir}/customer.parquet")

    supplier = [(1, "Supplier#1", 0, 1.0), (2, "Supplier#2", 1, 1.0)]
    _write(spark.createDataFrame(
        supplier, "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    ), f"{out_dir}/supplier.parquet")

    part = [
        (1, "green metal thing", "Brand#1", "PROMO POLISHED", 1, 10.0),
        (2, "red plastic thing", "Brand#2", "ECONOMY BRUSHED", 50, 0.01),  # near-zero price
    ]
    _write(spark.createDataFrame(
        part,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ), f"{out_dir}/part.parquet")

    orders = [
        (1, 1, "O", 100.0, m(0), "1-URGENT"),
        (2, 2, "F", 0.0, m(0), "5-LOW"),            # zero total, tied date
        (3, 3, "O", 100.0, m(10), "1-URGENT"),
        (4, 4, "P", 50.0, m(20), "3-MEDIUM"),
    ]
    _write(spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ), f"{out_dir}/orders.parquet")

    li = [
        # boundary quantities/discounts; duplicate pk pair on purpose
        (1, 1, 1, 1, 1.0, 0.01, 0.0, 0.0, "N", "O", m(0)),
        (1, 2, 2, 1, 50.0, 99999.99, 0.1, 0.08, "N", "O", m(0)),
        (2, 1, 1, 1, 25.0, 500.0, 0.05, 0.04, "R", "F", m(5)),
        (3, 2, 2, 1, 10.0, 100.0, 0.02, 0.01, "A", "F", m(15)),
        (4, 1, 2, 2, 30.0, 300.0, 0.07, 0.06, "N", "O", m(25)),
    ]
    _write(spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ), f"{out_dir}/lineitem.parquet")
    print(f"edge-case sf_dir written to {out_dir}")


def write_skew_documents(
    spark, out_dir: str, n_docs: int = 500, boiler_frac: float = 0.2, seed: int = 7
) -> None:
    """The hot-bucket ADVERSARY: a documents table where one boilerplate
    template dominates ``boiler_frac`` of the corpus (the real-world
    shape: cookie banners, ToS footers, scraped nav chrome) and the
    organic remainder draws words Zipf-style with planted near-dup
    sibling pairs. Uncapped banded LSH goes quadratic on the template
    bucket (n·(n−1)/2 pairs from that one signature); the MAX_BUCKET
    cap must keep the candidate count near-linear in n_docs while the
    organic siblings keep matching. Deterministic per seed.
    """
    import random

    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    template = (
        "subscribe to our newsletter for the latest updates terms of "
        "service apply all rights reserved contact us privacy policy"
    )
    vocab = [f"w{r}" for r in range(1, 201)]
    weights = [1.0 / r for r in range(1, 201)]  # Zipf-ish rank weights
    n_boiler = int(n_docs * boiler_frac)
    rows: list[tuple] = []
    for i in range(n_docs):
        if i < n_boiler:
            text = template
        elif i % 2 == 1 and rows and rows[-1][0] == i - 1 and i - 1 >= n_boiler:
            # near-dup sibling of the previous organic doc: one word swapped
            words = rows[-1][1].split()
            words[5] = rng.choice(vocab)
            text = " ".join(words)
        else:
            text = " ".join(rng.choices(vocab, weights=weights, k=12))
        rows.append((i, text, "en", "web", len(text)))
    _write(
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ),
        f"{out_dir}/documents.parquet",
    )
    print(f"skew documents ({n_docs} docs, {n_boiler} boilerplate) written to {out_dir}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        spark = get_spark("skew-gen")
        spark.sparkContext.setLogLevel("ERROR")
        write_skew_documents(spark, sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew_sf")
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/edgecase_sf")
