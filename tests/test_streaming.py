"""Structured Streaming tests: watermarked windowed aggregation with
late-data handling, streaming dedup, and the stateful sessionizer —
driven by incremental file-source batches into memory sinks."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cosmospark import streaming as S


def _write_batch(path: str, idx: int, rows: list[tuple]):
    """rows: (event_id, ts, user_id, event_type, value, props)"""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(path, f"batch-{idx:03d}.parquet"))


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


class TestWindowedCounts:
    def test_watermark_and_late_rows(self, spark, tmp_path):
        src = str(tmp_path / "events")
        os.makedirs(src)
        q = None
        try:
            stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
            agg = S.windowed_counts(stream, window="1 hour", watermark="1 hour")
            q = S.run_to_memory(agg, "win_counts")

            # batch 1: two events in hour 0, one in hour 1
            _write_batch(src, 0, [
                (1, ts(5), 1, "click", 1.0, "{}"),
                (2, ts(20), 2, "click", 2.0, "{}"),
                (3, ts(70), 1, "click", 4.0, "{}"),
            ])
            q.processAllAvailable()
            # append mode: hour-0 window not emitted yet (watermark at
            # 70min - 60min = 10min < window end 60min)
            assert spark.sql("SELECT COUNT(*) FROM win_counts").collect()[0][0] == 0

            # batch 2: a LATE row for hour 0 (ts 25min ≥ watermark 10min
            # → still admitted), plus an event far ahead that pushes the
            # watermark past hour 0's end
            _write_batch(src, 1, [
                (4, ts(25), 3, "click", 8.0, "{}"),
                (5, ts(200), 1, "click", 16.0, "{}"),
            ])
            q.processAllAvailable()
            # batch 3: anything to trigger emission of finalized windows
            _write_batch(src, 2, [(6, ts(260), 2, "click", 32.0, "{}")])
            q.processAllAvailable()

            rows = {
                (r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
                for r in spark.sql("SELECT * FROM win_counts").collect()
            }
            # hour-0 window: events 1, 2 AND the late row 4 → n=3
            assert rows[(T0, "click")] == (3, 1100)
            # hour-1 window finalized too (watermark passed it)
            assert rows[(ts(60), "click")] == (1, 400)
        finally:
            if q:
                q.stop()

    def test_too_late_row_dropped(self, spark, tmp_path):
        src = str(tmp_path / "events2")
        os.makedirs(src)
        q = None
        try:
            stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
            agg = S.windowed_counts(stream, window="1 hour", watermark="30 minutes")
            q = S.run_to_memory(agg, "win_counts2")
            _write_batch(src, 0, [(1, ts(10), 1, "click", 1.0, "{}")])
            q.processAllAvailable()
            # push watermark far ahead: 300 - 30 = 270min
            _write_batch(src, 1, [(2, ts(300), 1, "click", 1.0, "{}")])
            q.processAllAvailable()
            # a row at 15min is behind the watermark → dropped
            _write_batch(src, 2, [(3, ts(15), 1, "click", 99.0, "{}")])
            q.processAllAvailable()
            _write_batch(src, 3, [(4, ts(600), 1, "click", 1.0, "{}")])
            q.processAllAvailable()
            rows = {
                r["window_start"]: r["n"]
                for r in spark.sql("SELECT * FROM win_counts2").collect()
            }
            assert rows[T0] == 1  # the late row 3 did NOT count
        finally:
            if q:
                q.stop()


class TestSessionize:
    def test_sessions_close_on_event_time_gap(self, spark, tmp_path):
        src = str(tmp_path / "events3")
        os.makedirs(src)
        q = None
        try:
            stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
            sess = S.sessionize(stream, gap_minutes=30, watermark="10 minutes")
            q = S.run_to_memory(sess, "sessions")

            # user 1: events at 0 and 10 min (one session);
            # user 2: one event at 5 min
            _write_batch(src, 0, [
                (1, ts(0), 1, "click", 1.0, "{}"),
                (2, ts(10), 1, "click", 2.0, "{}"),
                (3, ts(5), 2, "click", 4.0, "{}"),
            ])
            q.processAllAvailable()
            assert spark.sql("SELECT COUNT(*) FROM sessions").collect()[0][0] == 0

            # events far ahead push the watermark beyond both users'
            # 30-min gaps → their sessions time out and emit
            _write_batch(src, 1, [(4, ts(300), 9, "click", 0.5, "{}")])
            q.processAllAvailable()
            _write_batch(src, 2, [(5, ts(600), 9, "click", 0.5, "{}")])
            q.processAllAvailable()

            got = {
                r["user_id"]: r
                for r in spark.sql("SELECT * FROM sessions").collect()
            }
            assert got[1]["n_events"] == 2
            assert got[1]["total_cents"] == 300
            assert got[1]["session_start"] == ts(0)
            assert got[1]["session_end"] == ts(10)
            assert got[2]["n_events"] == 1 and got[2]["total_cents"] == 400
        finally:
            if q:
                q.stop()

    def test_streaming_dedup(self, spark, tmp_path):
        src = str(tmp_path / "events4")
        os.makedirs(src)
        q = None
        try:
            stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
            q = S.run_to_memory(S.dedup_stream(stream), "deduped")
            _write_batch(src, 0, [
                (1, ts(0), 1, "click", 1.0, "{}"),
                (1, ts(0), 1, "click", 1.0, "{}"),  # dup within batch
            ])
            q.processAllAvailable()
            _write_batch(src, 1, [
                (1, ts(0), 1, "click", 1.0, "{}"),  # dup across batches
                (2, ts(1), 1, "click", 1.0, "{}"),
            ])
            q.processAllAvailable()
            assert spark.sql("SELECT COUNT(*) FROM deduped").collect()[0][0] == 2
        finally:
            if q:
                q.stop()
