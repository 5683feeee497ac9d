"""Sessionization tests: batch gaps-and-islands vs the
applyInPandasWithState streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.sources.tables import load_table
from explora_kafka_spark.streaming import sessions as S

SF_DIR = "/root/testdata/sf0.001"
GAP = 30 * 60 * 1000


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")


def _rows(df):
    return {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events,
         round(r.sum_value, 6))
        for r in df.collect()
    }


def test_batch_sessions_invariants(events):
    rows = S.batch_sessions(events, GAP).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.session_start_ms <= r.session_end_ms
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r.session_start_ms)
        for a, b in zip(sess, sess[1:]):
            # consecutive sessions are separated by more than the gap
            assert b.session_start_ms - a.session_end_ms > GAP
    # total events preserved
    assert sum(r.n_events for r in rows) == events.count()


def test_stream_batch_session_equivalence(spark, events, tmp_path):
    """Streamed sessions == batch sessions minus only the tail sessions
    the watermark cannot prove finished: a session is emitted either when
    a later event closes it or when the event-time timeout fires
    (watermark > session_end + gap). With watermark delay 0 the expected
    set is every batch session except a user's LAST one whose
    end + gap has not been passed by the final watermark (= max event
    time). Files are split by time range so micro-batches replay in
    event-time order."""
    ms = F.unix_millis("ts")
    bounds = events.select(
        F.min(ms).alias("lo"), F.max(ms).alias("hi")
    ).collect()[0]
    step = (bounds.hi - bounds.lo) // 3 + 1
    for i in range(3):
        (
            events.filter(
                (ms >= bounds.lo + i * step) & (ms < bounds.lo + (i + 1) * step)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / "in" / f"batch_{i}"))
        )
    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = S.streaming_sessions(stream, GAP)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = _rows(spark.table("sessions_test"))

    batch = S.batch_sessions(events, GAP)
    last = batch.groupBy("user_id").agg(
        F.max("session_start_ms").alias("session_start_ms")
    )
    closed_batch = _rows(
        batch.join(last, ["user_id", "session_start_ms"], "left_anti")
    )
    final_wm = bounds.hi  # watermark delay 0 → max event-time ms
    timed_out = _rows(
        batch.join(last, ["user_id", "session_start_ms"], "left_semi")
        .filter(F.col("session_end_ms") + GAP + 1 < final_wm)
    )
    assert streamed == closed_batch | timed_out
    # the timeout must have finalized at least one tail session — the
    # regression this test exists for (NoTimeout held them all forever)
    assert timed_out and timed_out <= streamed


def test_session_stats_hand_values(spark):
    """u1: events at 0h,0.2h (one session, 720s, 2 events) + 13h
    (bounce); u2: 0h (bounce). -> 3 sessions, 2 users, bounce 2/3."""
    import datetime as dt

    from explora_kafka_spark.streaming.sessions import session_stats

    rows = [(1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 12), 1.0),
            (1, dt.datetime(2024, 1, 1, 13, 0), 1.0),
            (2, dt.datetime(2024, 1, 1, 0, 0), 1.0)]
    ev = spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, value: double")
    r = session_stats(ev, gap_ms=43_200_000).collect()[0]
    assert (r["n_sessions"], r["n_users"]) == (3, 2)
    assert r["bounce_ppm"] == 666_666
    assert r["p50_duration_s"] == 0.0   # two bounces, one 720s session
    assert r["avg_events"] == round(4 / 3, 6)


def test_session_stats_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    from explora_kafka_spark.streaming.sessions import (session_stats,
                                                        session_stats_sql)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "value")
    got = [tuple(r) for r in
           session_stats(ev, gap_ms=43_200_000).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = [tuple(row) for row in con.execute(
        session_stats_sql(gap_ms=43_200_000)).fetchall()]
    assert [tuple(float(x) for x in r) for r in got] == \
           [tuple(float(x) for x in r) for r in want]
