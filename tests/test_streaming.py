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

    def test_intra_batch_gap_splits_sessions(self, spark, tmp_path):
        """A single micro-batch spanning >gap of event time (backfill
        shape) must yield MULTIPLE sessions — the r5 sessionizer
        collapsed the whole batch into one."""
        src = str(tmp_path / "events_split")
        os.makedirs(src)
        q = None
        try:
            stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
            sess = S.sessionize(stream, gap_minutes=30, watermark="10 minutes")
            q = S.run_to_memory(sess, "sessions_split")
            # one batch, one user, 2h apart -> two sessions
            _write_batch(src, 0, [
                (1, ts(0), 1, "click", 1.0, "{}"),
                (2, ts(120), 1, "click", 2.0, "{}"),
            ])
            q.processAllAvailable()
            for i, flush_min in ((1, 100000), (2, 200000)):
                _write_batch(src, i, [(90 + i, ts(flush_min), 9, "x", 0.0, "{}")])
                q.processAllAvailable()
            rows = sorted(
                spark.sql(
                    "SELECT * FROM sessions_split WHERE user_id = 1"
                ).collect(),
                key=lambda r: r["session_start"],
            )
            assert len(rows) == 2
            assert [r["n_events"] for r in rows] == [1, 1]
            assert rows[0]["session_start"] == rows[0]["session_end"] == ts(0)
            assert rows[1]["session_start"] == ts(120)
            assert [r["total_cents"] for r in rows] == [100, 200]
        finally:
            if q:
                q.stop()

    def test_stream_matches_batch_sessionize(self, spark, tmp_path):
        """Equivalence contract: streaming sessionize over the real
        sf0.001 events table (fed as one backfill micro-batch) emits
        exactly the sessions the ORACLED batch q_sessionize computes —
        same per-user counts, floored-second bounds, session count."""
        import shutil

        from cosmospark.queries import q_sessionize

        batch = {
            (r["user_id"], r["start_es"], r["end_es"], r["n_events"])
            for r in q_sessionize(spark, "/root/testdata/sf0.001").collect()
        }
        src = str(tmp_path / "events_eq")
        os.makedirs(src)
        shutil.copy(
            "/root/testdata/sf0.001/events.parquet",
            os.path.join(src, "batch-000.parquet"),
        )
        q = None
        try:
            stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
            sess = S.sessionize(stream, gap_minutes=30, watermark="10 minutes")
            q = S.run_to_memory(sess, "sessions_eq")
            q.processAllAvailable()
            # two flush batches: one to advance the watermark past every
            # real session + gap, one more so timeouts fire under it
            for i in range(1, 3):
                _write_batch(
                    src, i, [(10**6 + i, ts(10**6 * i), 10**9, "x", 0.0, "{}")]
                )
                q.processAllAvailable()
            got = {
                (
                    r["user_id"],
                    int(r["session_start"].timestamp()),
                    int(r["session_end"].timestamp()),
                    r["n_events"],
                )
                for r in spark.sql(
                    "SELECT * FROM sessions_eq WHERE user_id < 1000000000"
                ).collect()
            }
            assert got == batch
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


class TestSessionizeTimezone:
    def test_non_utc_session_timezone(self, spark, tmp_path):
        # ADVICE r2: on a non-UTC session the old astype-int64 epoch math
        # shifted session bounds and the event-time timeout by the tz
        # offset; sessionize now localizes with the session tz.
        old_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        src = str(tmp_path / "events_tz")
        os.makedirs(src)
        q = None
        try:
            stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
            sess = S.sessionize(stream, gap_minutes=30, watermark="10 minutes")
            q = S.run_to_memory(sess, "sessions_tz")
            _write_batch(src, 0, [
                (1, ts(0), 1, "click", 1.0, "{}"),
                (2, ts(10), 1, "click", 2.0, "{}"),
            ])
            q.processAllAvailable()
            _write_batch(src, 1, [(3, ts(300), 9, "click", 0.5, "{}")])
            q.processAllAvailable()
            _write_batch(src, 2, [(4, ts(600), 9, "click", 0.5, "{}")])
            q.processAllAvailable()
            got = {
                r["user_id"]: r
                for r in spark.sql("SELECT * FROM sessions_tz").collect()
            }
            # session bounds round-trip exactly: same wall-clock values
            # the source carried, regardless of session tz
            assert got[1]["session_start"] == ts(0)
            assert got[1]["session_end"] == ts(10)
            assert got[1]["n_events"] == 2
        finally:
            if q:
                q.stop()
            spark.conf.set("spark.sql.session.timeZone", old_tz)


class TestParquetSinkResume:
    def test_kill_and_resume_exactly_once(self, spark, tmp_path):
        # VERDICT r2 #10: end-to-end file source → parquet sink with a
        # checkpointLocation; kill the query, append more input, restart
        # with the same checkpoint — every finalized window appears
        # EXACTLY once (no loss, no duplicates).
        src = str(tmp_path / "events_ck")
        sink = str(tmp_path / "sink")
        ck = str(tmp_path / "ck")
        os.makedirs(src)

        stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
        agg = S.windowed_counts(stream, window="1 hour", watermark="30 minutes")
        q = S.run_to_parquet(agg, sink, ck)
        try:
            _write_batch(src, 0, [
                (1, ts(5), 1, "click", 1.0, "{}"),
                (2, ts(20), 2, "click", 2.0, "{}"),
            ])
            q.processAllAvailable()
            # push the watermark past hour 0 → its window finalizes + commits
            _write_batch(src, 1, [(3, ts(200), 1, "click", 4.0, "{}")])
            q.processAllAvailable()
            _write_batch(src, 2, [(4, ts(260), 1, "click", 8.0, "{}")])
            q.processAllAvailable()
        finally:
            q.stop()  # the "kill"

        mid = {
            (r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
            for r in spark.read.parquet(sink).collect()
        }
        assert mid[(T0, "click")] == (2, 300)  # hour-0 window committed once

        # restart from the SAME checkpoint; new input finalizes hour 3+4
        stream2 = S.read_event_stream(spark, src, max_files_per_trigger=1)
        agg2 = S.windowed_counts(stream2, window="1 hour", watermark="30 minutes")
        q2 = S.run_to_parquet(agg2, sink, ck)
        try:
            _write_batch(src, 3, [(5, ts(600), 2, "click", 16.0, "{}")])
            q2.processAllAvailable()
            _write_batch(src, 4, [(6, ts(900), 2, "click", 32.0, "{}")])
            q2.processAllAvailable()
        finally:
            q2.stop()

        rows = spark.read.parquet(sink).collect()
        keyed = {}
        for r in rows:
            k = (r["window_start"], r["event_type"])
            assert k not in keyed, f"duplicate window {k} after resume"
            keyed[k] = (r["n"], r["value_cents"])
        # hour-0 unchanged (not re-emitted), later windows exactly once
        assert keyed[(T0, "click")] == (2, 300)
        assert keyed[(ts(180), "click")] == (1, 400)
        assert keyed[(ts(240), "click")] == (1, 800)
        assert keyed[(ts(600), "click")] == (1, 1600)


class TestStreamingAssignment:
    def test_pip_assignment_runs_on_a_stream(self, spark, tmp_path):
        """The flagship fact operator (encode + broadcast-PIP zone
        assignment) is a stateless narrow mapInPandas, so it runs
        UNCHANGED on Structured Streaming — the 10^12-row batch job and
        the streaming ingest path share one implementation."""
        import pyspark.sql.functions as F

        from cosmospark.assign import encode_and_assign
        from cosmospark.queries import _lux_typed_zones

        src = str(tmp_path / "pts")
        os.makedirs(src)
        for idx in range(2):
            tbl = pa.table(
                {
                    "pid": pa.array([idx * 3 + i for i in range(3)], pa.int64()),
                    "lon": pa.array([2.0 + (idx * 3 + i) * 0.01 for i in range(3)]),
                    "lat": pa.array([49.6 + (idx * 3 + i) * 0.001 for i in range(3)]),
                }
            )
            pq.write_table(tbl, os.path.join(src, f"batch-{idx:03d}.parquet"))

        stream = (
            spark.readStream.schema("pid long, lon double, lat double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        zones = _lux_typed_zones(spark)
        assigned = encode_and_assign(stream, zones)
        q = None
        try:
            q = S.run_to_memory(assigned, "stream_assign")
            q.processAllAvailable()
            got = spark.sql(
                "SELECT pid, zone_id FROM stream_assign ORDER BY pid"
            ).collect()
        finally:
            if q is not None:
                q.stop()
        # batch reference on the same rows
        batch = spark.read.parquet(src)
        want = {
            r["pid"]: r["zone_id"]
            for r in encode_and_assign(batch, zones).collect()
        }
        assert len(got) == 6
        assert {r["pid"]: r["zone_id"] for r in got} == want
        assert all(r["zone_id"] >= 0 for r in got)


def test_streaming_raster_zone_assignment(spark, tmp_path):
    """Stream-static LUT join: a file-source point stream geo-tags
    through the SAME pixel LUT as the batch path, and the streamed
    assignments equal the batch raster assignments row-for-row."""
    import pyspark.sql.functions as F

    from cosmospark.queries import _lux_typed_zones
    from cosmospark.raster import assign_zones_raster, zone_pixel_lut
    from cosmospark.streaming import assign_zones_stream, run_to_memory

    zones = _lux_typed_zones(spark)
    lut = zone_pixel_lut(zones, res=6).localCheckpoint()
    pts = spark.range(500).select(
        F.col("id").alias("pid"),
        F.expr("cast(2.0 + (id * 7919 % 1300) / 100.0 as double)").alias("lon"),
        F.expr("cast(44.0 + (id * 104729 % 1000) / 100.0 as double)").alias("lat"),
    )
    src = str(tmp_path / "pts_stream")
    pts.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)
    out = assign_zones_stream(stream, lut, res=6)
    q = run_to_memory(out, "stream_assign")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["pid"], r["zone_id"])
        for r in spark.table("stream_assign").collect()
    }
    want = {
        (r["pid"], r["zone_id"])
        for r in assign_zones_raster(pts, zones, res=6, lut=lut).collect()
    }
    assert got == want and len(got) == 500
