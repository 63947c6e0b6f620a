"""Unit tests for the temporal join operators (as-of, range).

The sf0.01 oracle gate checks full-scale parity against DuckDB's
native ASOF JOIN / inequality join; these pin the edge semantics on
hand-built rows.
"""

from __future__ import annotations

from datetime import datetime

from vectordb_retrieval_spark.operators.temporal import asof_join, range_join


def _ts(s: float) -> datetime:
    return datetime.utcfromtimestamp(1_700_000_000 + s)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, k, _ts(s)) for i, k, s in rows],
        schema="event_id long, user_id long, ts timestamp",
    )


def test_asof_backward_semantics(spark):
    left = _df(spark, [(1, 7, 10.0), (2, 7, 20.0), (3, 7, 5.0), (4, 8, 10.0)])
    #                       latest<=10   latest<=20   none before 5   other key
    right = _df(spark, [(100, 7, 6.0), (101, 7, 10.0), (102, 7, 15.0), (103, 9, 1.0)])
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join(left, right, right_payload=("event_id",)).collect()
    }
    # equal timestamps count as "at or before" (101 at t=10 matches row 1)
    assert got == {1: 101, 2: 102, 3: None, 4: None}


def test_asof_payload_struct_consistency(spark):
    """All attached columns must come from the SAME matched row."""
    left = _df(spark, [(1, 7, 30.0)])
    right = _df(spark, [(100, 7, 10.0), (101, 7, 20.0)])
    r = asof_join(left, right, right_payload=("event_id", "ts")).collect()[0]
    assert r.asof_event_id == 101
    assert r.asof_ts == _ts(20.0)


def test_range_join_matches_brute_force(spark):
    rows_l = [(i, 0, float(i * 37 % 211)) for i in range(40)]
    rows_r = [(1000 + i, 0, float(i * 53 % 199)) for i in range(40)]
    left, right = _df(spark, rows_l), _df(spark, rows_r)
    w = 25
    got = {
        (r.a, r.b, r.dt_us) for r in range_join(left, right, window_s=w).collect()
    }
    expected = {
        (i, j, int((sr - sl) * 1_000_000))
        for i, _, sl in rows_l
        for j, _, sr in rows_r
        if abs(sr - sl) <= w
    }
    assert got == expected


def test_range_join_boundary_inclusive_and_cross_bucket(spark):
    # 59.5s apart but straddling a 60s bucket edge; and exactly 60s apart
    left = _df(spark, [(1, 0, 59.0), (2, 0, 200.0)])
    right = _df(spark, [(10, 0, 118.5), (20, 0, 260.0), (30, 0, 261.0)])
    got = {(r.a, r.b) for r in range_join(left, right, window_s=60).collect()}
    assert (1, 10) in got  # cross-bucket (59.0 -> 118.5, buckets 0 vs 1)
    assert (2, 20) in got  # exactly 60s: inclusive
    assert (2, 30) not in got  # 61s: out


def test_asof_plan_has_no_join_node(spark):
    """The as-of reformulation must stay join-free: one exchange on the
    key, a sort, and a window — no BroadcastHashJoin/SortMergeJoin."""
    left = _df(spark, [(1, 7, 10.0)])
    right = _df(spark, [(100, 7, 6.0)])
    plan = (
        asof_join(left, right, right_payload=("event_id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_sessionize_gap_semantics(spark):
    from vectordb_retrieval_spark.operators.temporal import sessionize

    # user 7: gaps 10s, 40s, 10s with gap_s=30 -> sessions 0,0,1,1
    # user 8: single event -> session 0
    df = _df(
        spark,
        [(1, 7, 0.0), (2, 7, 10.0), (3, 7, 50.0), (4, 7, 60.0), (5, 8, 0.0)],
    )
    got = {r.event_id: r.session_idx for r in sessionize(df, gap_s=30).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}
    # boundary: exactly gap_s apart stays in the same session (strict >)
    df2 = _df(spark, [(1, 7, 0.0), (2, 7, 30.0), (3, 7, 60.1)])
    got2 = {r.event_id: r.session_idx for r in sessionize(df2, gap_s=30).collect()}
    assert got2 == {1: 0, 2: 0, 3: 1}


def test_resample_gap_fill_modes(spark):
    from datetime import datetime

    from vectordb_retrieval_spark.operators.temporal import resample

    rows = [
        # user 1: events in hours 0 and 2 (hour 1 is a gap)
        (0, datetime(2024, 1, 1, 0, 10), 1, 1.25),
        (1, datetime(2024, 1, 1, 0, 50), 1, 2.00),
        (2, datetime(2024, 1, 1, 2, 5), 1, 0.75),
        # user 2: a single event
        (3, datetime(2024, 1, 1, 5, 0), 2, 4.10),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long, value double"
    )
    base_bucket = int(datetime(2024, 1, 1).timestamp()) // 3600

    out = {
        (r.user_id, r.bucket): r
        for r in resample(df, 3600, fill="ffill").collect()
    }
    # full grid per user: 3 buckets for user 1, 1 for user 2
    assert len(out) == 4
    b0, b1, b2 = base_bucket, base_bucket + 1, base_bucket + 2
    assert out[(1, b0)].n_events == 2 and out[(1, b0)].sum_cents == 325
    assert out[(1, b1)].n_events == 0 and out[(1, b1)].sum_cents is None
    assert out[(1, b1)].fill_cents == 325  # carried forward
    assert out[(1, b2)].sum_cents == 75 and out[(1, b2)].fill_cents == 75
    assert out[(2, base_bucket + 5)].sum_cents == 410

    zero = {
        (r.user_id, r.bucket): r for r in resample(df, 3600, fill="zero").collect()
    }
    assert zero[(1, b1)].fill_cents == 0
    none = {
        (r.user_id, r.bucket): r for r in resample(df, 3600, fill="none").collect()
    }
    assert none[(1, b1)].fill_cents is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        resample(df, 3600, fill="bogus")


def test_resample_plan_windows_partitioned(spark):
    from datetime import datetime

    from vectordb_retrieval_spark.operators.temporal import resample

    df = spark.createDataFrame(
        [(0, datetime(2024, 1, 1), 1, 1.0)],
        schema="event_id long, ts timestamp, user_id long, value double",
    )
    plan = (
        resample(df, 3600, fill="ffill")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs and all(s.startswith("key") for s in specs), plan
