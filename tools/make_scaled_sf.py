"""Scale an existing sf_dir 10x (or Nx) by FK-consistent replication —
the second decade of the scaling audit.

The driver ships sf0.001/0.01/0.1; one 10x step (sf0.01 -> sf0.1) can
hide slow superlinearity behind fixed job overhead. This tool
fabricates the NEXT decade from sf0.1: every fact/dimension table is
replicated k = 0..N-1 times with per-table key offsets applied to both
primary and foreign keys, so join selectivities, group cardinalities
per key, and FK integrity are preserved — the workload gets WIDER
(more orders, more users, more documents), not denser, which is how a
real corpus grows. region/nation stay fixed (they are the bounded
dims). Replica rows are perturbed so the dedup tiers see realistic
near-dup structure instead of degenerate exact clones:

- documents: replicas get a ' replicaK tagM' suffix (distinct shingles,
  n_chars recomputed) — k=0 rows stay byte-identical so anchors like
  the contamination window survive;
- embeddings: replicas shift every dim by 0.05*k (bounded 10-clique
  near-dups — the re-crawled-corpus shape; the hot-bucket cap's job);
- events: replicas shift ts by k seconds and get fresh user_ids.

Usage:
    python tools/make_scaled_sf.py SRC_SF_DIR OUT_DIR [N]
    python tools/scaling_report.py SRC_SF_DIR OUT_DIR   # then audit
"""

from __future__ import annotations

import os
import sys

import duckdb


def main(src: str, out: str, n: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")

    def mx(table: str, col: str) -> int:
        return con.execute(f"SELECT MAX({col}) + 1 FROM {table}").fetchone()[0]

    c_max, s_max, p_max = mx("customer", "c_custkey"), mx("supplier", "s_suppkey"), mx("part", "p_partkey")
    o_max, e_max = mx("orders", "o_orderkey"), mx("events", "event_id")
    u_max, d_max, v_max = mx("events", "user_id"), mx("documents", "doc_id"), mx("embeddings", "vec_id")

    def copy(sql: str, table: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: {con.execute(f'SELECT COUNT(*) FROM {chr(39)}{out}/{table}.parquet{chr(39)}').fetchone()[0]} rows")

    rep = f"(SELECT UNNEST(range({n})) AS k)"

    copy("SELECT * FROM region", "region")
    copy("SELECT * FROM nation", "nation")
    copy(
        f"""SELECT c_custkey + k * {c_max} AS c_custkey,
                  c_name || CASE WHEN k = 0 THEN '' ELSE '#r' || k END AS c_name,
                  c_nationkey, c_acctbal, c_mktsegment
           FROM customer, {rep}""",
        "customer",
    )
    copy(
        f"""SELECT s_suppkey + k * {s_max} AS s_suppkey,
                  s_name || CASE WHEN k = 0 THEN '' ELSE '#r' || k END AS s_name,
                  s_nationkey, s_acctbal
           FROM supplier, {rep}""",
        "supplier",
    )
    copy(
        f"""SELECT p_partkey + k * {p_max} AS p_partkey,
                  p_name || CASE WHEN k = 0 THEN '' ELSE ' r' || k END AS p_name,
                  p_brand, p_type, p_size, p_retailprice
           FROM part, {rep}""",
        "part",
    )
    copy(
        f"""SELECT o_orderkey + k * {o_max} AS o_orderkey,
                  o_custkey + k * {c_max} AS o_custkey,
                  o_orderstatus, o_totalprice,
                  o_orderdate + k * INTERVAL 1 SECOND AS o_orderdate,
                  o_orderpriority
           FROM orders, {rep}""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + k * {o_max} AS l_orderkey,
                  l_partkey + k * {p_max} AS l_partkey,
                  l_suppkey + k * {s_max} AS l_suppkey,
                  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                  l_returnflag, l_linestatus,
                  l_shipdate + k * INTERVAL 1 SECOND AS l_shipdate
           FROM lineitem, {rep}""",
        "lineitem",
    )
    copy(
        f"""SELECT event_id + k * {e_max} AS event_id,
                  ts + k * INTERVAL 1 SECOND AS ts,
                  user_id + k * {u_max} AS user_id,
                  event_type, value, props
           FROM events, {rep}""",
        "events",
    )
    copy(
        f"""SELECT doc_id + k * {d_max} AS doc_id,
                  CASE WHEN k = 0 OR text IS NULL THEN text
                       ELSE text || ' replica' || k || ' tag' || (doc_id % 97) END AS text,
                  lang, source,
                  CASE WHEN k = 0 OR text IS NULL THEN n_chars
                       ELSE CAST(length(text || ' replica' || k || ' tag' || (doc_id % 97)) AS BIGINT)
                  END AS n_chars
           FROM documents, {rep}""",
        "documents",
    )
    copy(
        f"""SELECT vec_id + k * {v_max} AS vec_id,
                  CASE WHEN k = 0 THEN embedding
                       ELSE list_transform(embedding, x -> CAST(x + 0.05 * k AS FLOAT))
                  END AS embedding,
                  label
           FROM embeddings, {rep}""",
        "embeddings",
    )
    print(f"scaled sf_dir ({n}x of {src}) written to {out}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
