"""Structured Streaming operators over the events stream.

The reference is a pure batch pipeline (its only "streaming" is
incremental JSONL IO for bounded memory, cosmogony/src/read.rs:7-14);
these are graft additions for the continuous-ingest side of a 100 TB
training-data pipeline: a file-source stream of event batches flows
through watermarked event-time windows (late data handled by the
watermark, state bounded) and a custom stateful sessionizer
(applyInPandasWithState) — the three Structured Streaming shapes the
engine needs (source → windowed agg → sink; dedup; custom state).

Local tests drive them with file sources + memory sinks and
``processAllAvailable``; on a cluster the same code points at object
storage + kafka and a parquet/Delta sink — nothing here is test-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream: each new parquet file in ``path`` is a
    micro-batch increment (the local stand-in for a kafka topic)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time windowed aggregation: per (window,
    event_type) counts + exact cent sums. The watermark bounds state and
    admits late rows up to ``watermark`` behind the max event time —
    rows later than that are dropped, exactly once per window emitted in
    append mode."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_cents",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the continuous form of q_dedup_exact (state bounded by watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

# Parallel arrays: one slot per PENDING (not yet watermark-final)
# session. Multiple pending sessions per user are the norm during
# backfill: one micro-batch can span days of event time, producing many
# gap-separated sessions of which only the watermark-passed prefix may
# legally emit (a later batch can still carry an event that bridges two
# newer ones).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.ArrayType(T.LongType())),
        T.StructField("start_s", T.ArrayType(T.LongType())),
        T.StructField("end_s", T.ArrayType(T.LongType())),
        T.StructField("cents", T.ArrayType(T.LongType())),
    ]
)


def sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    sessions split wherever >``gap_minutes`` of EVENT time separates
    consecutive events — including gaps WITHIN one micro-batch (a
    backfill/catch-up batch spans hours; the r5 version collapsed a
    whole batch into one session, which both loses sessions and
    diverges from the batch q_sessionize semantics). A session emits
    exactly when the watermark proves it final: no in-flight event can
    extend run [s, e] once wm > e + gap, because any such event has
    ts <= e + gap < wm and is watermark-dropped. State per user =
    the pending (not yet provably final) sessions only — bounded by
    gap/watermark, not by history.

    Equivalence contract (tested): on any input, the union of emitted
    sessions == the batch gaps-and-islands sessionization
    (queries.q_sessionize) on counts/bounds/cents.

    Timezone-correct: Arrow hands the worker pandas timestamps rendered
    in ``spark.sql.session.timeZone`` (naive), so epoch conversion
    localizes with the session tz captured at operator-construction time
    — on a non-UTC session the old astype-int64 path shifted session
    bounds and the event-time timeout by the tz offset."""
    import pandas as pd

    session_tz = (
        events.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"
    )

    # Gap decisions run on FLOORED epoch seconds -- the exact arithmetic
    # queries.q_sessionize uses (Spark unix_timestamp truncates) -- so
    # stream == batch holds even for events straddling a sub-second
    # boundary around the gap; emitted bounds are second-resolution.
    gap_s = gap_minutes * 60

    def _ts_from_s(s: int):
        # UTC epoch µs → naive wall time in the session tz (what Spark
        # expects back for TimestampType)
        return (
            pd.Timestamp(int(s) * 1_000_000_000, tz="UTC")
            .tz_convert(session_tz)
            .tz_localize(None)
        )

    def _emit(user_id, runs):
        return pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "session_start": _ts_from_s(s),
                    "session_end": _ts_from_s(e),
                    "total_cents": c,
                }
                for (n, s, e, c) in runs
            ]
        )

    def _fn(key, pdfs, state):
        user_id = key[0]
        wm_s = state.getCurrentWatermarkMs() // 1000
        pending = []
        if state.exists:
            ns, ss, es, cs = state.get
            pending = list(zip(ns, ss, es, cs))
        items = list(pending)  # (n, start_s, end_s, cents)
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pdf["ts"]
                if ts.dt.tz is None:
                    ts = ts.dt.tz_localize(session_tz)
                ts_s = (ts.astype("int64") // 1_000_000_000).to_numpy()
                ev_cents = (
                    (pdf["value"] * 100).round().astype("int64").to_numpy()
                )
                items.extend(
                    (1, int(t), int(t), int(c))
                    for t, c in zip(ts_s, ev_cents)
                )
        # gaps-and-islands over events AND previously-pending sessions
        # (pending runs are disjoint and gap-separated among themselves,
        # but a new event can bridge two of them)
        items.sort(key=lambda it: it[1])
        runs = []
        for n, s, e, c in items:
            if runs and s <= runs[-1][2] + gap_s:
                pn, ps, pe, pc = runs[-1]
                runs[-1] = (pn + n, ps, max(pe, e), pc + c)
            else:
                runs.append((n, s, e, c))
        final = [r for r in runs if r[2] + gap_s < wm_s]
        live = [r for r in runs if r[2] + gap_s >= wm_s]
        if live:
            state.update(
                (
                    [r[0] for r in live],
                    [r[1] for r in live],
                    [r[2] for r in live],
                    [r[3] for r in live],
                )
            )
            # wake when the watermark can first finalize the oldest
            # pending run. `live` only guarantees end_s + gap_s >= wm_s
            # in WHOLE seconds; a watermark carrying a sub-second ms
            # component can exceed the second-floored timeout, and
            # GroupStateImpl rejects timeouts <= watermark — clamp to
            # wm + 1 ms (ADVICE r6; test_streaming sub-second case).
            state.setTimeoutTimestamp(
                max(
                    min(r[2] for r in live) * 1000 + gap_minutes * 60_000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        elif state.exists:
            state.remove()
        if final:
            yield _emit(user_id, final)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Drive a streaming DataFrame into a parquet sink with a checkpoint
    location — the production sink shape. The checkpoint (WAL + state
    store + file-sink manifest) makes restarts exactly-once: a killed
    query restarted with the same ``checkpoint_dir``/``path`` neither
    loses nor duplicates rows (the sink's _spark_metadata commits files
    atomically per batch). Returns the StreamingQuery."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame into an in-memory table (tests /
    local inspection); returns the StreamingQuery."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def assign_zones_stream(
    points_stream: DataFrame,
    lut: DataFrame,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Streaming raster zone assignment: the STREAM-STATIC shape of
    ``raster.assign_zones_raster``. The pixel LUT is corpus-independent
    and static (built once from the zone dim, persisted bucketed by
    cell), so each micro-batch is Morton-encode (JVM) → equi-join
    against the static LUT → ``element_at`` — stateless, no watermark
    needed, and the static side is re-broadcast only when the LUT
    DataFrame changes. This is how a 10^12-row *continuous* ingest keeps
    geo-tagging at raster-join throughput: the geometry work was all
    paid at LUT build time."""
    from cosmospark.raster import assign_zones_raster

    return assign_zones_raster(
        points_stream, None, res, lon_col=lon_col, lat_col=lat_col, lut=lut
    )
