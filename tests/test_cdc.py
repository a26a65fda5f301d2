"""Behavioral tests for the CDC operators (planted no-op updates —
the fixture's random values never repeat consecutively, so the
compression drop branch is exercised here, not by the oracle)."""

from __future__ import annotations

import datetime as dt

from nova_pulsar_spark.operators.cdc import change_compress

T0 = dt.datetime(2024, 1, 1)


def _ev(eid, uid, minute, value):
    return (eid, T0 + dt.timedelta(minutes=minute), uid, "update", value, "{}")


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_change_compress_drops_noop_updates(spark):
    events = spark.createDataFrame(
        [
            _ev(1, 7, 0, 1.0),
            _ev(2, 7, 1, 1.0),  # no-op: same value as previous -> dropped
            _ev(3, 7, 2, 2.0),
            _ev(4, 7, 3, 2.0),  # no-op -> dropped
            _ev(5, 7, 4, 1.0),  # back to an OLD value: a real change, kept
            _ev(6, 9, 0, 2.0),  # other key: its own history, kept
        ],
        SCHEMA,
    )
    kept = sorted(r.event_id for r in change_compress(events).collect())
    assert kept == [1, 3, 5, 6]


def test_change_compress_null_transitions_kept(spark):
    events = spark.createDataFrame(
        [
            _ev(1, 7, 0, 1.0),
            _ev(2, 7, 1, None),  # value -> NULL is a change
            _ev(3, 7, 2, None),  # NULL -> NULL is a no-op (null-safe equality)
            _ev(4, 7, 3, 1.0),  # NULL -> value is a change
        ],
        SCHEMA,
    )
    kept = sorted(r.event_id for r in change_compress(events).collect())
    assert kept == [1, 2, 4]


def test_scd2_intervals_tile_history(spark, sf_dir):
    from nova_pulsar_spark.operators.cdc import cdc_scd2_intervals

    rows = cdc_scd2_intervals(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for _, hist in by_user.items():
        hist.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per key, and it is the last
        assert [r.is_current for r in hist] == [False] * (len(hist) - 1) + [True]
        # intervals tile: each close equals the next open
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from
        assert hist[-1].valid_to is None
