"""Behavioral tests for the time-series operators (gap-fill, funnel,
rolling distinct) and the chunking curation op."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nova_pulsar_spark.operators.pipeline import CHUNK_STRIDE, CHUNK_TOKENS, llm_chunk_overlap
from nova_pulsar_spark.operators.timeseries import ts_funnel, ts_gapfill, ts_rolling_active
from nova_pulsar_spark.sources.tables import load_table


def test_gapfill_spine_is_contiguous_per_user(spark, sf_dir):
    rows = ts_gapfill(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user, "gapfill returned no rows"
    for user, urows in by_user.items():
        days = sorted(r.day for r in urows)
        # contiguous daily spine between the user's own bounds
        span = (days[-1] - days[0]).days + 1
        assert len(days) == span, f"user {user}: {len(days)} rows for a {span}-day span"
        # first spine day is observed by construction (bounds come from data)
        first = min(urows, key=lambda r: r.day)
        assert first.observed and first.filled_value is not None


def test_gapfill_locf_carries_last_value(spark, sf_dir):
    rows = ts_gapfill(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for urows in by_user.values():
        last_seen = None
        for r in sorted(urows, key=lambda r: r.day):
            if r.observed:
                assert r.n_events > 0
                last_seen = r.filled_value
            else:
                assert r.n_events == 0
                assert r.filled_value == last_seen  # forward-filled
_STAGE_COLS = ("t_view", "t_click", "t_purchase")


def test_funnel_stage_times_strictly_ordered(spark, sf_dir):
    rows = ts_funnel(spark, sf_dir).collect()
    assert rows
    for r in rows:
        times = [getattr(r, c) for c in _STAGE_COLS]
        # depth == number of leading non-nulls; no gaps
        n_lead = 0
        for t in times:
            if t is None:
                break
            n_lead += 1
        assert r.funnel_depth == n_lead
        assert all(t is None for t in times[n_lead:])
        for a, b in zip(times, times[1:]):
            if a is not None and b is not None:
                assert a < b


def test_funnel_covers_every_user(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert ts_funnel(spark, sf_dir).count() == n_users


def test_rolling_active_bounds(spark, sf_dir):
    rows = ts_rolling_active(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.active_1d <= r.active_7d


def test_chunk_overlap_reconstructs_documents(spark, sf_dir):
    chunks = llm_chunk_overlap(spark, sf_dir)
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, crows in by_doc.items():
        crows.sort(key=lambda r: r.chunk_no)
        words = docs[doc_id].split(" ")
        # stride-spaced starts, last chunk may be short
        for r in crows:
            assert r.start_token == r.chunk_no * CHUNK_STRIDE
            expect = words[r.start_token : r.start_token + CHUNK_TOKENS]
            assert r.chunk_text == " ".join(expect)
            assert r.n_tokens == len(expect)
        # non-overlapping prefixes of consecutive chunks rebuild the doc
        rebuilt: list[str] = []
        for r in crows[:-1]:
            rebuilt.extend(r.chunk_text.split(" ")[:CHUNK_STRIDE])
        rebuilt.extend(crows[-1].chunk_text.split(" "))
        assert rebuilt == words


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """Z-value sorting makes row-group min/max stats selective on BOTH
    dimensions: a point predicate on either key scans only a fraction
    of the row groups, where a single-key sort leaves the other
    dimension unselective (every row group matches)."""
    import os

    import pyarrow.parquet as pq

    from nova_pulsar_spark.operators.extras import fn_zorder

    z = fn_zorder(spark, "/root/testdata/sf0.01")

    def scan_fraction(path, col):
        """Avg fraction of row groups a point predicate on `col` scans."""
        ranges = []
        for fname in os.listdir(path):
            if not fname.endswith(".parquet"):
                continue
            f = pq.ParquetFile(os.path.join(path, fname))
            idx = f.schema_arrow.names.index(col)
            for g in range(f.num_row_groups):
                st = f.metadata.row_group(g).column(idx).statistics
                ranges.append((st.min, st.max))
        assert len(ranges) >= 4, "need multiple row groups for the comparison"
        lo = min(a for a, _ in ranges)
        hi = max(b for _, b in ranges)
        probes = range(lo, hi + 1, max(1, (hi - lo) // 50))
        hits = [sum(1 for a, b in ranges if a <= v <= b) / len(ranges) for v in probes]
        return sum(hits) / len(hits)

    zdir, kdir = str(tmp_path / "zsorted"), str(tmp_path / "ksorted")
    opts = {"parquet.block.size": 128 * 1024}
    z.repartition(1).sortWithinPartitions("zval").write.options(**opts).mode(
        "overwrite"
    ).parquet(zdir)
    z.repartition(1).sortWithinPartitions("l_partkey").write.options(**opts).mode(
        "overwrite"
    ).parquet(kdir)
    # partkey-sorted: partkey is very selective but suppkey matches
    # (nearly) every row group — no skipping on the second dimension
    assert scan_fraction(kdir, "l_suppkey") > 0.9
    # z-sorted: BOTH dimensions skip a material share of row groups
    assert scan_fraction(zdir, "l_partkey") < 0.6
    assert scan_fraction(zdir, "l_suppkey") < 0.6


def test_cms_estimates_are_admissible_overestimates(spark, sf_dir):
    from nova_pulsar_spark.operators.textstats import llm_heavy_hitters_cms

    rows = llm_heavy_hitters_cms(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.est_n >= r.exact_n  # CMS never underestimates
        assert r.admissible


def test_salted_join_equals_plain_join(spark, sf_dir):
    from nova_pulsar_spark.operators.joins import join_salted_skew
    from nova_pulsar_spark.sources.tables import load_table

    salted = join_salted_skew(spark, sf_dir)
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    plain = l.join(s, F.col("s_suppkey") == F.col("l_suppkey")).select(
        "l_orderkey", "l_linenumber", "l_suppkey", "s_name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_streaks_are_maximal_consecutive_runs(spark, sf_dir):
    from nova_pulsar_spark.operators.timeseries import ts_streaks
    from nova_pulsar_spark.sources.tables import load_table

    streaks = ts_streaks(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    active = {
        (r.user_id, r.day)
        for r in e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
        .collect()
    }
    covered = set()
    for r in streaks:
        span = (r.streak_end - r.streak_start).days + 1
        assert span == r.streak_days  # streaks are contiguous
        for i in range(span):
            d = r.streak_start + __import__("datetime").timedelta(days=i)
            assert (r.user_id, d) in active  # every streak day was active
            covered.add((r.user_id, d))
        # maximality: the days adjacent to the streak are NOT active
        one = __import__("datetime").timedelta(days=1)
        assert (r.user_id, r.streak_start - one) not in active
        assert (r.user_id, r.streak_end + one) not in active
    assert covered == active  # streaks partition the active days


def test_event_pattern_adjacency_and_gap_semantics(spark):
    """purchase→error matches ONLY when the error is the IMMEDIATELY
    next event for that user and within the 5-min window: an
    intervening event breaks adjacency, a 5-min+1s gap is too late,
    and pairs never cross users."""
    import pandas as pd

    from nova_pulsar_spark.operators.timeseries import PATTERN_WINDOW_MIN

    t0 = dt.datetime(2026, 3, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: purchase then error 90s later, adjacent -> MATCH (gap 90)
        (1, t0, 10, "purchase"),
        (2, t0 + 90 * s, 10, "error"),
        # u2: purchase, CLICK, error -> adjacency broken, no match
        (3, t0, 20, "purchase"),
        (4, t0 + 30 * s, 20, "click"),
        (5, t0 + 60 * s, 20, "error"),
        # u3: purchase then error at window+1s -> too late, no match
        (6, t0, 30, "purchase"),
        (7, t0 + dt.timedelta(minutes=PATTERN_WINDOW_MIN, seconds=1), 30, "error"),
        # u4/u5: purchase and error on DIFFERENT users -> no match
        (8, t0, 40, "purchase"),
        (9, t0 + 10 * s, 50, "error"),
        # u6: error at exactly the window bound -> inclusive MATCH
        (10, t0, 60, "purchase"),
        (11, t0 + dt.timedelta(minutes=PATTERN_WINDOW_MIN), 60, "error"),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, et, 1.0, "{}") for eid, ts, uid, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.select(
        "user_id", "event_id", "event_type", "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    gap_us = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    got = (
        seq.filter(
            (F.col("event_type") == "purchase")
            & (F.col("next_type") == "error")
            & (gap_us <= PATTERN_WINDOW_MIN * 60 * 1_000_000)
        )
        .select("user_id", "event_id", "next_event_id",
                F.floor(gap_us / 1_000_000).cast("bigint").alias("gap_seconds"))
        .collect()
    )
    matches = {(r.user_id, r.event_id, r.next_event_id, r.gap_seconds) for r in got}
    assert matches == {(10, 1, 2, 90), (60, 10, 11, PATTERN_WINDOW_MIN * 60)}


def test_retention_cohort_week0_covers_every_user(spark, sf_dir):
    """Every user is active in their own cohort's week 0, so
    Σ(week_offset=0 cells) = distinct users; offsets are non-negative."""
    from nova_pulsar_spark.operators.timeseries import ts_retention_cohorts

    e = load_table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    rows = ts_retention_cohorts(spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in rows)
    week0 = sum(r.n_active_users for r in rows if r.week_offset == 0)
    assert week0 == n_users
    # retention never exceeds the cohort's week-0 size
    w0 = {r.cohort_day: r.n_active_users for r in rows if r.week_offset == 0}
    assert all(r.n_active_users <= w0[r.cohort_day] for r in rows)


def test_anomaly_zscore_flags_planted_spike(spark):
    """A flat series with one 10x spike: exactly that day is flagged,
    with a positive z-score; the current day never inflates its own
    baseline (trailing frame excludes it)."""
    import pandas as pd

    from nova_pulsar_spark.operators.timeseries import ANOMALY_TRAILING, ANOMALY_Z

    rows = []
    eid = 0
    for day in range(1, 15):
        n = 50 if day == 12 else 5  # spike on day 12
        for i in range(n):
            eid += 1
            rows.append((eid, f"2026-01-{day:02d} 10:{i % 60:02d}:00", 1, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    from pyspark.sql import Window as W

    daily = df.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-ANOMALY_TRAILING, -1)
    stats = daily.select(
        "day", "cnt",
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    mean = F.col("s").cast("double") / F.col("k")
    var = F.col("ss").cast("double") / F.col("k") - mean * mean
    z = (F.col("cnt") - mean) / F.sqrt(var)
    flagged = ((var > 0) & (F.abs(z) >= ANOMALY_Z)) | ((var == 0) & (F.col("cnt") != mean))
    got = (
        stats.filter((F.col("k") >= ANOMALY_TRAILING) & flagged)
        .select("day", F.when(var > 0, z).alias("z"))
        .collect()
    )
    # the spike day sits on a CONSTANT baseline -> zero-variance branch:
    # flagged with NULL z (unbounded anomaly); no other day fires
    assert len(got) == 1
    assert got[0].day.day == 12 and got[0].z is None


def test_cumulative_users_monotone_and_totals(spark, sf_dir):
    from nova_pulsar_spark.operators.timeseries import ts_cumulative_users

    rows = sorted(ts_cumulative_users(spark, sf_dir).collect(), key=lambda r: r.day)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert rows[-1].cumulative_users == n_users
    assert sum(r.new_users for r in rows) == n_users
    cums = [r.cumulative_users for r in rows]
    assert cums == sorted(cums)  # monotone non-decreasing


def test_ohlc_endpoints_deterministic_under_ts_ties(spark, tmp_path):
    import datetime as dt

    from nova_pulsar_spark.operators.timeseries import ts_downsample_ohlc

    h = dt.datetime(2026, 3, 1, 10, 0, 0)
    rows = [
        # same-hour bucket, a ts TIE at the open: event_id must break it
        (2, h, 7, "buy", 5.0, None),
        (1, h, 7, "buy", 3.0, None),   # lower event_id → the open
        (3, h + dt.timedelta(minutes=30), 7, "buy", 9.0, None),
        (4, h + dt.timedelta(minutes=59), 7, "buy", 1.0, None),  # the close + low
        # different bucket
        (5, h + dt.timedelta(hours=1), 7, "buy", 2.0, None),
    ]
    d = str(tmp_path / "ohlc")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    got = {r["bucket_ts"]: r for r in ts_downsample_ohlc(spark, d).collect()}
    b = got[h]
    assert b["open_v"] == 3.0  # event_id 1 beats 2 at the tied ts
    assert b["high_v"] == 9.0 and b["low_v"] == 1.0
    assert b["close_v"] == 1.0 and b["n_events"] == 4
    assert got[h + dt.timedelta(hours=1)]["n_events"] == 1


def test_ewma_fold_matches_reference_recursion(spark, tmp_path):
    import datetime as dt

    from nova_pulsar_spark.operators.timeseries import ts_ewma

    h0 = dt.datetime(2026, 3, 1, 0, 0, 0)
    # three hourly buckets with means 2.0, 4.0, 8.0 (single event each)
    rows = [
        (1, h0, 1, "buy", 2.0, None),
        (2, h0 + dt.timedelta(hours=1), 1, "buy", 4.0, None),
        (3, h0 + dt.timedelta(hours=2), 1, "buy", 8.0, None),
        # second type with one bucket: ewma == that mean
        (4, h0, 2, "view", 5.0, None),
    ]
    d = str(tmp_path / "ewma")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    got = {r["event_type"]: r for r in ts_ewma(spark, d).collect()}
    # recursion: e1=2; e2=0.5*4+0.5*2=3; e3=0.5*8+0.5*3=5.5
    assert got["buy"]["ewma"] == 5.5
    assert got["buy"]["n_hours"] == 3 and got["buy"]["last_mean"] == 8.0
    assert got["view"]["ewma"] == 5.0 and got["view"]["n_hours"] == 1


def test_changepoint_cusum_finds_planted_shift(spark, tmp_path):
    """A series with a clean level shift (5/day then 50/day) must put
    the |CUSUM| peak exactly at the last day of the old level."""
    import datetime as dt

    from nova_pulsar_spark.operators.timeseries import ts_changepoint_cusum

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(20):
        n = 5 if day < 10 else 50
        for k in range(n):
            rows.append(
                (eid, base + dt.timedelta(days=day, minutes=k), eid % 7, "shift", 1.0, "{}")
            )
            eid += 1
    d = str(tmp_path / "cp")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")
    out = {r["event_type"]: r for r in ts_changepoint_cusum(spark, d).collect()}
    r = out["shift"]
    # mean = 27.5/day: cumulative deviation is most negative right
    # before the jump — day index 9 (2024-01-10)
    assert r["cp_day"] == dt.datetime(2024, 1, 10)
    assert r["n_days"] == 20


def test_snapshot_diff_classifies_planted_changes(spark, sf_dir):
    from nova_pulsar_spark.operators.cdc import (
        DIFF_CHG_MOD,
        DIFF_NEW_MOD,
        DIFF_OLD_MOD,
        cdc_snapshot_diff,
    )

    rows = cdc_snapshot_diff(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r["o_orderkey"]
        if r["change_type"] == "added":
            assert k % DIFF_OLD_MOD == 0 and k % DIFF_NEW_MOD != 0
            assert r["old_price"] is None and r["new_price"] is not None
        elif r["change_type"] == "removed":
            assert k % DIFF_NEW_MOD == 0 and k % DIFF_OLD_MOD != 0
            assert r["new_price"] is None and r["old_price"] is not None
        else:
            assert k % DIFF_CHG_MOD == 0
            assert r["new_price"] == r["old_price"] + 1.0


def test_holt_winters_matches_python_reference(spark, tmp_path):
    """The rotating-buffer fold must equal the textbook indexed
    recurrence (seasonal slot = step mod P) on a planted series with a
    real daily cycle — pins the rotation against off-by-one drift."""
    import math

    from nova_pulsar_spark.operators.timeseries import HW_PERIOD, ts_holt_winters

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    vals = []
    for h in range(24 * 7):  # one week of hourly points, daily wave + drift
        v = round(10 + 3 * math.sin(2 * math.pi * (h % 24) / 24) + 0.01 * h, 3)
        vals.append(v)
        rows.append((h, t0 + dt.timedelta(hours=h), 1, "click", v, None))
    d = str(tmp_path / "hw")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")

    got = ts_holt_winters(spark, d).collect()
    assert len(got) == 1 and got[0]["n_hours"] == 24 * 7

    # textbook recurrence with explicit modular season indexing
    P = HW_PERIOD
    l, b, s = vals[0], 0.0, [0.0] * P
    for i, x in enumerate(vals[1:], start=1):
        si = i % P  # slot consumed at step i (rotation starts at slot 1)
        l_new = 0.5 * (x - s[si]) + 0.5 * (l + b)
        b_new = 0.5 * (l_new - l) + 0.5 * b
        s[si] = 0.5 * (x - l_new) + 0.5 * s[si]
        l, b = l_new, b_new
    r = got[0]
    n = 24 * 7
    assert abs(r["level"] - l) < 1e-9 and abs(r["trend"] - b) < 1e-9
    assert abs(r["season_next"] - s[n % P]) < 1e-9
    assert abs(r["forecast_1"] - (l + b + s[n % P])) < 1e-9
    # the seasonal signal must actually be learned (non-trivial slot)
    assert abs(r["season_next"]) > 0.1


def test_lttb_matches_python_reference(spark, tmp_path):
    """ts_lttb vs a direct Python implementation of the LTTB chain on
    a planted spiky series — pins bucket edges, the centroid 'next'
    anchor, and the sequential selection."""
    from nova_pulsar_spark.operators.timeseries import LTTB_K, ts_lttb

    t0 = dt.datetime(2024, 1, 1)
    vals = []
    for h in range(300):
        v = 10.0 + (h % 17) * 0.5
        if h % 50 == 25:
            v += 80.0  # spikes LTTB must keep
        vals.append(round(v, 2))
    rows = [
        (h, t0 + dt.timedelta(hours=h), 1, "click", v, None) for h, v in enumerate(vals)
    ]
    d = str(tmp_path / "lttb")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")
    got = {r["seq"]: (r["x_rel_us"], r["value"]) for r in ts_lttb(spark, d).collect()}

    K = LTTB_K
    n = len(vals)
    xs = [h * 3_600_000_000 for h in range(n)]
    buckets: dict[int, list] = {}
    for j in range(n):
        if j == 0:
            i = 0
        elif j == n - 1:
            i = K - 1
        else:
            i = min(K - 2, 1 + (j - 1) * (K - 2) // (n - 2))
        buckets.setdefault(i, []).append((xs[j], vals[j]))
    avg = {
        i: (sum(x for x, _ in b) / len(b), sum(y for _, y in b) / len(b))
        for i, b in buckets.items()
    }
    sel = [buckets[0][0]]
    for i in range(1, K - 1):
        nax, nay = avg[i + 1]
        px, py = sel[-1]
        best = max(
            buckets[i],
            key=lambda p: (abs((px - nax) * (p[1] - py) - (px - p[0]) * (nay - py)), p[0], p[1]),
        )
        sel.append(best)
    sel.append(buckets[K - 1][0])
    assert len(got) == K
    for i, (x, y) in enumerate(sel):
        assert got[i] == (x, y), (i, got[i], (x, y))
    # the spikes must survive
    kept_vals = {v for _, v in got.values()}
    assert any(v > 80 for v in kept_vals)
