"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric is the BASELINE.json one: images/sec through
H3-encode + PIP zone-assignment (synthesized point fact table against the
198-zone lux world), plus per-query wall times for the operator suite.

r6 instrumentation (VERDICT r5 #1/#8 — reconciling wall-time artifacts
on a co-tenant host): every timed measurement also records, for its
best run, (a) "cpu_sec" — executor CPU-seconds from completed-stage
executorCpuTime (Spark UI REST API; JVM task threads only) and (b)
"tree_cpu_sec" — CPU-seconds of the whole OS process tree (driver JVM
+ forked python workers, from /proc), which is the number that actually
co-varies with mapInPandas-heavy queries like image_pipeline. Wall
seconds are the host's number; CPU seconds are the plan's — when an
artifact regresses wall-side with flat tree-CPU, the mechanism is host
contention, not the plan. Two host probes bracket the suite: the
single-thread memory-bandwidth stream (host_probe_sec_*) and an
8-process parallel numpy kernel (host_cpu_probe_sec_*) that co-varies
with multi-process CPU steal — exactly the phase class the streaming
probe is blind to (the r5 6.14 s image_pipeline draw had clean 0.1 s
streaming probes).
"""

from __future__ import annotations

import gc as _gc
import json
import os
import sys
import time
import urllib.request


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pip = int(os.environ.get("COSMOSPARK_BENCH_PIP_ROWS", "2000000"))
    n_runs = int(os.environ.get("COSMOSPARK_BENCH_RUNS", "3"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from cosmospark.assign import encode_and_assign
    from cosmospark.queries import _lux_typed_zones, queries
    from cosmospark.session import get_spark

    spark = get_spark(
        app_name="cosmospark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        # UI on for this process only: the /api/v1 stage metrics back
        # the per-query cpu_sec instrumentation
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}
    tree_cpu_secs: dict[str, float] = {}
    host_probes: dict[str, float] = {}
    retried_entries: list[str] = []

    # --- host probes --------------------------------------------------------
    def _host_probe() -> float:
        """Memory-bandwidth control: best-of-3 streaming pass over 30M
        float64 (~0.13 s on an idle box; the sandbox host has co-tenant
        phases where the SAME probe reads 2-7 s). Reported in the output
        so cross-round comparisons can see the host's state — a suite
        measured during a bad phase is the host's number, not the
        plan's."""
        import numpy as _np

        a = _np.arange(30_000_000, dtype=_np.float64)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            (a * 1.0000001 + 3).sum()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def _cpu_probe(n_procs: int = 8) -> float:
        """PARALLEL-CPU control (r6): n_procs forked workers each run a
        fixed numpy kernel (~60 ms idle-host per proc); the wall time of
        the slowest co-varies with host CPU oversubscription across
        many processes — the contention mode that hits 32-python-worker
        queries (image_pipeline) but NOT the single-thread streaming
        probe above. ~0.08 s idle; multi-second during a steal phase."""
        import multiprocessing as _mp

        def _kern(q):
            import numpy as _np

            x = _np.arange(1_500_000, dtype=_np.float64).reshape(-1, 100)
            s = 0.0
            for _ in range(8):
                s += float(_np.sin(x[:, :64]).sum())
            q.put(s)

        ctx = _mp.get_context("fork")
        q = ctx.Queue()
        procs = [ctx.Process(target=_kern, args=(q,)) for _ in range(n_procs)]
        t0 = time.time()
        for p in procs:
            p.start()
        for p in procs:
            q.get()
        wall = time.time() - t0
        for p in procs:
            p.join()
        return round(wall, 3)

    host_probe_start = _host_probe()
    host_cpu_probe_start = _cpu_probe()

    # --- executor CPU-seconds from the UI REST API --------------------------
    _api = "http://localhost:4050/api/v1"

    def _stage_cpu_ns() -> int | None:
        """Total executorCpuTime (ns) across completed stages, or None
        if the API is unavailable (instrumentation must never fail the
        bench)."""
        try:
            apps = json.load(
                urllib.request.urlopen(f"{_api}/applications", timeout=5)
            )
            app_id = apps[0]["id"]
            stages = json.load(
                urllib.request.urlopen(
                    f"{_api}/applications/{app_id}/stages?status=complete",
                    timeout=5,
                )
            )
            return sum(int(s.get("executorCpuTime", 0)) for s in stages)
        except Exception:
            return None

    _HZ = os.sysconf("SC_CLK_TCK")

    def _tree_cpu_snapshot() -> dict[int, float]:
        """Per-pid CPU seconds (utime+stime) of THIS process tree:
        driver JVM + forked pyspark worker daemons. Stage
        executorCpuTime counts JVM task threads only — python-heavy
        stages (the mapInPandas decode in image_pipeline) spend their
        CPU in worker processes that only an OS-level walk sees. The r5
        reconciliation gap was exactly this blind spot: wall regressed
        with clean JVM-side probes."""
        import glob

        me = os.getpid()
        ppid: dict[int, int] = {}
        cpu: dict[int, float] = {}
        for st in glob.glob("/proc/[0-9]*/stat"):
            try:
                head, tail = open(st).read().rsplit(")", 1)
                pid = int(head.split(" ", 1)[0])
                f = tail.split()
                ppid[pid] = int(f[1])
                cpu[pid] = (int(f[11]) + int(f[12])) / _HZ
            except (OSError, ValueError, IndexError):
                pass
        out: dict[int, float] = {}
        for pid in cpu:
            p = pid
            for _ in range(64):  # walk up; bounded against ppid cycles
                if p == me:
                    out[pid] = cpu[pid]
                    break
                p = ppid.get(p, 0)
                if p <= 1:
                    break
        return out

    def _tree_cpu_delta(s0: dict[int, float], s1: dict[int, float]) -> float:
        """Pid-wise delta: workers that DIED mid-window take their
        accumulated CPU with them (a slight undercount, never a
        negative); workers forked mid-window count in full (their CPU
        starts at ~0)."""
        return sum(max(0.0, v - s0.get(p, 0.0)) for p, v in s1.items())

    def _scrub():
        """Between measurements: drop cached lineages AND force a
        driver GC. Spark's ContextCleaner only purges out-of-scope
        shuffle/broadcast state on GC; a roomy heap defers GC so ~30
        jobs of accumulated state degrade later queries 5-20×
        (measured: ngram-jaccard 48.9 s → 2.2 s across one forced GC,
        same session, same plan). A real cluster driver running ONE job
        doesn't carry 22 other jobs' state; scrubbing reports each
        plan's own cost."""
        spark.catalog.clearCache()
        _gc.collect()
        spark._jvm.System.gc()
        # Drain the C2 compile queue before the next measurement: a
        # compile-heavy predecessor leaves a backlog that runs the NEXT
        # query's freshly-generated whole-stage code interpreted (the
        # r4 ngram 6.8 s artifact). The warmup run alone doesn't always
        # cover it — when steady-state runs are ~2 s, warmup+3 timed
        # runs all fit inside a 30 s backlog. Poll total JIT compile
        # time until it plateaus (<20 ms growth per 250 ms), bounded.
        mx = spark._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()
        last = mx.getTotalCompilationTime()
        # 25 s bound (was 15): the suite now runs 44 entries and a
        # compile backlog can outlive the shorter bound mid-suite; the
        # poll exits at plateau, so an idle queue costs one 250 ms tick
        deadline = time.time() + 25
        while time.time() < deadline:
            time.sleep(0.25)
            cur = mx.getTotalCompilationTime()
            if cur - last < 20:
                break
            last = cur

    def _timed(name: str, fn, runs: int = n_runs):
        """Uniform measurement protocol for EVERY bench entry (r5 ran
        slightly different protocols per section; r6 unifies): one
        untimed warmup, scrub, then best-of-N timed runs with a scrub
        after each. Records wall seconds (timings) and the best run's
        executor CPU-seconds (cpu_secs). Returns the last run's
        result.

        Host-phase self-healing (r6): after the timed runs, one
        parallel-CPU probe reads the host. If it reads HOT (>3x the
        suite-start baseline and >0.35 s absolute — the co-tenant
        memory-lane phases this box draws read 0.4-0.9+ s vs ~0.15
        idle), the entry's draw is presumed host-poisoned: wait out up
        to two 20 s backoffs for the probe to cool, then take ONE more
        timed run and keep the min. Deterministic, bounded (max 2
        backoffs per entry, 10 retried entries per suite — a SUSTAINED
        phase cannot stretch the suite unboundedly), and recorded: host_cpu_probe_per_query keeps the
        FINAL probe, retried_entries lists what re-ran. This is the
        mechanism fix for r5's unreconcilable 6.14 s image_pipeline
        artifact: the artifact of record now defends itself against
        drawing a bad phase instead of requiring post-hoc A/Bs."""

        def _one_run():
            nonlocal best, best_cpu, best_tree, last
            c0 = _stage_cpu_ns()
            p0 = _tree_cpu_snapshot()
            t0 = time.time()
            last = fn()
            dt = time.time() - t0
            p1 = _tree_cpu_snapshot()
            c1 = _stage_cpu_ns()
            if dt < best:
                best = dt
                best_tree = _tree_cpu_delta(p0, p1)
                if c0 is not None and c1 is not None:
                    best_cpu = (c1 - c0) / 1e9
            _scrub()

        fn()  # warmup: JIT + python daemons out of the measurement
        _scrub()
        best, best_cpu, best_tree, last = float("inf"), None, None, None
        for _ in range(runs):
            _one_run()
        probe = _cpu_probe(4)
        hot = lambda p: p > max(0.35, 3.0 * host_cpu_probe_start)  # noqa: E731
        retries = 0
        while hot(probe) and retries < 2 and len(retried_entries) < 10:
            time.sleep(20)
            probe = _cpu_probe(4)
            if hot(probe):
                break  # still contended — keep what we have, flagged
            _one_run()
            retries += 1
            probe = _cpu_probe(4)
        if retries:
            retried_entries.append(name)
        timings[name] = round(best, 3)
        if best_cpu is not None:
            cpu_secs[name] = round(best_cpu, 2)
        if best_tree is not None:
            tree_cpu_secs[name] = round(best_tree, 2)
        host_probes[name] = probe
        return last, best

    # --- headline: H3-encode + PIP assign throughput -----------------------
    zones = _lux_typed_zones(spark)
    pts = spark.range(n_pip).select(
        F.col("id").alias("pid"),
        F.expr("cast(2.0 + (id * 7919 % 1300) / 100.0 as double)").alias("lon"),
        F.expr("cast(44.0 + (id * 104729 % 1000) / 100.0 as double)").alias("lat"),
    )
    n_assigned, pip_sec = _timed(
        "pip_assign",
        lambda: encode_and_assign(pts, zones)
        .filter(F.col("zone_id") >= 0)
        .count(),
    )
    images_per_sec = n_pip / pip_sec if pip_sec > 0 else 0.0

    # --- skew: 70% of points in 2 megacity communes → one zone_id
    # carries most of the rollup; exercises salted_count + AQE skew
    # handling with a number attached (VERDICT r1 #10)
    from cosmospark.assign import salted_count

    mega = F.expr(
        "case when id % 10 < 7 then"
        " named_struct('lon', cast(2.0 + (id % 2) * 6.0 + (id * 7919 % 100) / 100.0 as double),"
        "              'lat', cast(44.0 + (id % 2) * 5.0 + (id * 104729 % 125) / 100.0 as double))"
        " else named_struct('lon', cast(2.0 + (id * 7919 % 1300) / 100.0 as double),"
        "                   'lat', cast(44.0 + (id * 104729 % 1000) / 100.0 as double)) end"
    )
    pts_skew = spark.range(n_pip).select(
        F.col("id").alias("pid"), mega.alias("p")
    ).select("pid", F.col("p.lon").alias("lon"), F.col("p.lat").alias("lat"))
    skew_assigned = encode_and_assign(pts_skew, zones)

    def _skew_rollup():
        zc = salted_count(skew_assigned, ["zone_id"], n_salt=32, salt_col="pid")
        return zc.agg(F.sum("n").alias("t"), F.max("n").alias("mx")).collect()[0]

    skew_rows, _ = _timed("pip_skewed_salted_rollup", _skew_rollup)
    skew_top_key_frac = round(skew_rows["mx"] / skew_rows["t"], 3)

    # --- adaptive cell splitting on the same skewed table (r6): hot
    # megacity cells descend 9→13→17 until ≤ max_rows_per_cell; the
    # fact table never shuffles (per-level (cell,count) partial aggs +
    # broadcast hot sets). Reports the realized bound alongside wall.
    from cosmospark.assign import adaptive_cell_split

    def _acs():
        out = adaptive_cell_split(
            pts_skew, resolutions=(9, 13, 17), max_rows_per_cell=50_000
        )
        return (
            out.groupBy("res", "cell")
            .count()
            .agg(
                F.count("*").alias("cells"),
                F.max("count").alias("mx"),
                F.sum("count").alias("t"),
            )
            .collect()[0]
        )

    acs_row, acs_sec = _timed("adaptive_cell_split", _acs)
    acs_rows_per_sec = round(n_pip / acs_sec) if acs_sec > 0 else 0
    acs_max_cell_frac = round(acs_row["mx"] / acs_row["t"], 4)

    # --- representative image pipeline (decode+invariants+phash+PIP) -------
    # v2: row-group-sized files. The v1 cache wrote 4 files x ONE row
    # group each; parquet splits at row-group granularity, so the
    # compute-dense pipeline ran 4-wide on 32 cores (r2's 3.87 s and
    # r3's "regressed" 7.15 s are BOTH that layout — the delta was host
    # phase noise amplified by 4 long straggler tasks). 6250-row groups
    # give 32 independent splits: ~1.4 s and far less noise-sensitive.
    img_path = os.environ.get("COSMOSPARK_BENCH_IMG", "/tmp/cosmospark_bench_img_200k_v2.parquet")
    if not os.path.exists(img_path):
        from cosmospark.imagejob import gen_images_parquet

        gen_images_parquet(img_path, 200_000, px=16)
        _scrub()  # generation leaves a full session of state
    from cosmospark.imagejob import image_pipeline

    images = spark.read.parquet(img_path)
    inv, img_sec = _timed(
        "image_pipeline",
        lambda: image_pipeline(images, zones).agg(
            F.count("*").alias("n"),
            F.sum(F.col("pixels_ok").cast("long")).alias("pix_ok"),
        ).collect()[0],
    )
    image_rows_per_sec = round(inv["n"] / img_sec)

    # --- PBF front door: blob-decode throughput (scalar vs vectorized) -----
    # one synthetic dense-node blob (the byte-dominant shape of a planet
    # file); MB/s through the full block decode, before/after the numpy
    # packed-varint kernel (VERDICT r2 #2 wants ≥5×)
    import numpy as _np

    from cosmospark import pbf as _pbf

    _n = 400_000
    _nodes = [
        (i * 3 + 1, 2.0 + (i * 7919 % 1300) / 100.0, 44.0 + (i * 104729 % 1000) / 100.0, {})
        for i in range(_n)
    ]
    _pbf_path = "/tmp/cosmospark_bench_densenodes.osm.pbf"
    _pbf.write_osm_pbf(_pbf_path, _nodes, [], [], compress=True, nodes_per_block=_n)
    _blob = [b for b in _pbf.blob_index(_pbf_path) if b["type"] == "OSMData"][0]
    with open(_pbf_path, "rb") as _fh:
        _fh.seek(_blob["offset"])
        _payload = _pbf._blob_payload(_fh.read(_blob["size"]))
    _mb = len(_payload) / 1e6

    def _decode_scalar(payload):
        # the round-2 path: scalar per-byte varint loops over the packed
        # dense-node fields (ids/lats/lons/keys_vals)
        n = 0
        for fno, _, g in _pbf._fields(payload):
            if fno == 2:  # PrimitiveGroup
                for f2, _, v in _pbf._fields(g):
                    if f2 == 2:  # DenseNodes
                        for f3, _, b in _pbf._fields(v):
                            if f3 in (1, 8, 9):
                                n += len(
                                    _np.cumsum(_pbf._packed_varints(b, zigzag=True))
                                )
                            elif f3 == 10:
                                n += len(_pbf._packed_varints(b))
        return n

    t0 = time.time()
    _decode_scalar(_payload)
    scalar_sec = time.time() - t0
    _pbf.decode_block_columnar(_payload)  # warm (numpy first-call)
    t0 = time.time()
    _pbf.decode_block_columnar(_payload)
    vec_sec = time.time() - t0
    pbf_decode_mbps = round(_mb / vec_sec, 1)
    pbf_decode_speedup = round(scalar_sec / vec_sec, 1)

    _scrub()  # the PBF section above leaves a full session's state

    # --- operator suite -----------------------------------------------------
    suite = [
        "pricing_summary",
        "stats_counts",
        "topk_per_group",
        "hierarchy_label",
        "geo_pip_assign",
        "geo_multires_rollup",
        "geo_s2_rollup",
        "geo_s2_range_scan",
        "geo_s2_bbox_scan",
        "stratified_sample",
        "term_stats_topk",
        "geo_parent_hierarchy",
        "dedup_exact",
        "substring_dedup",
        "decontaminate",
        "sessionize",
        "event_quantiles",
        "geo_radius_join",
        "phash_zone_neardup",
        "ngram_jaccard",
        "dedup_keep_best",
        "doc_fingerprint",
        "gopher_repetition",
        "ann_brute_force",
        "ann_ivf",
        "ann_ivf_written",
        "ann_pq_rerank",
        "ann_ivf_pq",
        "semdedup",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "phash_neardup",
        "embedding_neardup",
        "audio_features",
        "video_frames",
    ]
    # Measurement rationale (both mechanisms measured, see _timed):
    #  * The sandbox host has multi-minute slow phases (co-tenant
    #    memory-bandwidth contention; the same plan measures 5.5 s and
    #    28 s back-to-back in one session) — min-of-N reports the
    #    plan's steady-state cost, which is what survives a scale-up,
    #    while a single draw reports the host's mood.
    #  * JIT compile-queue congestion (the r4→r5 ngram_jaccard
    #    "regression" root cause): a compile-heavy predecessor
    #    (geo_parent_hierarchy alone accumulates ~33 s of JIT compile
    #    time) leaves the C2 queue backed up, so the NEXT query's
    #    freshly-generated whole-stage code runs interpreted — the
    #    identical CPU-bound candidate-join stage measured 520
    #    CPU-seconds poisoned vs ~130 steady-state (A/B: same plan,
    #    cache fully resident 32/32, 110 GB host free; only
    #    CompilationMXBean.totalCompilationTime differs). The decay
    #    spans 2-3 executions, so best-of-3 alone can still catch the
    #    tail (BENCH_r04's 6.8 s ngram vs 2.7 s isolated). One warmup
    #    run per query lets the JIT reach steady state — exactly the
    #    headline-path methodology above, and what a cluster job (one
    #    plan per driver JVM, minutes-long stages) sees from task 2 on.
    qs = queries()
    for name in suite:
        _timed(
            name,
            lambda name=name: qs[name](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    # semdedup centroid skew (VERDICT r5 #6): the n²/K bound is real
    # only if Lloyd clusters stay bounded — report K and the realized
    # max-cluster fraction on the bench table
    from cosmospark.queries import _semdedup_centroids

    sd_counts = (
        qs["semdedup"](spark, sf_dir).groupBy("list_id").count().collect()
    )
    sd_total = sum(r["count"] for r in sd_counts)
    semdedup_k = len(_semdedup_centroids(sf_dir))
    semdedup_max_frac = round(max(r["count"] for r in sd_counts) / sd_total, 4)
    _scrub()

    # --- the no-broadcast partitioned assignment path (VERDICT r2 #8):
    # same fact table through the cell-cogroup join — the strategy
    # assign_zones('auto') switches to when zone geometry exceeds the
    # broadcast budget. Benched so the fallback has a number, not a
    # hope. Runs LAST: its wide shuffle + 32-way cogroup churns the
    # shared local JVM's heap enough to drag every query benched after
    # it (measured ~2-4×) — on a real cluster it would not share a JVM
    # with anything.
    from cosmospark.assign import assign_zones, encode_points

    part_df = assign_zones(
        encode_points(pts), zones, strategy="partitioned", id_col="pid"
    ).filter(F.col("zone_id") >= 0)
    n_part, part_sec = _timed("pip_assign_partitioned", part_df.count)
    partitioned_images_per_sec = round(n_pip / part_sec) if part_sec > 0 else 0
    assert n_part == n_assigned, "partitioned strategy disagrees with broadcast"

    # --- the pixel-approximate raster join: zone dim rasterized once to
    # 64-bit morton bitsets, then the fact side is PURE whole-stage
    # codegen (morton encode + equi-join + bitset probe + argmin) — no
    # Python at all on 10^12 rows
    from cosmospark.raster import assign_zones_raster, zone_pixel_lut

    # the LUT is corpus-independent (built from the zone dim alone):
    # persisted once, reused for every fact table — the amortized shape.
    # localCheckpoint (not .cache()) so _scrub()'s clearCache between
    # runs cannot evict it: every measurement then uses the SAME scrub
    # methodology as the rest of the suite (VERDICT r3 #7).
    lut = zone_pixel_lut(zones, res=9).localCheckpoint()
    rast_df = assign_zones_raster(pts, zones, res=9, lut=lut).filter(
        F.col("zone_id") >= 0
    )
    n_rast, rast_sec = _timed("pip_assign_raster", rast_df.count)
    raster_images_per_sec = round(n_pip / rast_sec) if rast_sec > 0 else 0

    # exact mode: stable pixels answer from the LUT, boundary pixels
    # (sentinel -2) refine through the exact kernel — result identical
    # to the broadcast strategy at a fraction of the Python work
    lut_x = zone_pixel_lut(zones, res=9, exact=True).localCheckpoint()
    rex_df = assign_zones_raster(
        pts, zones, res=9, lut=lut_x, exact=True
    ).filter(F.col("zone_id") >= 0)
    n_rex, rex_sec = _timed("pip_assign_raster_exact", rex_df.count)
    raster_exact_images_per_sec = round(n_pip / rex_sec) if rex_sec > 0 else 0
    assert n_rex == n_assigned, "exact raster disagrees with broadcast"

    # --- tile-pyramid raster LUT (r4): same LUT join keyed on mercator
    # z/x/y tiles; fact side pays one tile_xy(z+3) Arrow pass
    from cosmospark.raster import assign_zones_tiles_raster, tile_pixel_lut

    lut_t = tile_pixel_lut(zones, z=9).localCheckpoint()
    rtile_df = assign_zones_tiles_raster(pts, zones, z=9, lut=lut_t).filter(
        F.col("zone_id") >= 0
    )
    n_rtile, rtile_sec = _timed("pip_assign_raster_tile", rtile_df.count)
    raster_tile_images_per_sec = round(n_pip / rtile_sec) if rtile_sec > 0 else 0

    # --- skewed raster LUT join, salted (VERDICT r4 #5): the planet
    # shape where the LUT exceeds the broadcast budget and the
    # cell-keyed join SHUFFLES — a megacity cell (~30% of facts here)
    # is then a hot key on the join itself, which salting spreads over
    # 32 sub-keys. Broadcast is disabled only within this section to
    # force the shuffle shape on toy-sized LUTs.
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        skew_rast = assign_zones_raster(
            pts_skew, zones, res=9, lut=lut, n_salt=32
        ).filter(F.col("zone_id") >= 0)
        n_srast, srast_sec = _timed("pip_assign_raster_skew_salted", skew_rast.count)
        raster_skew_images_per_sec = (
            round(n_pip / srast_sec) if srast_sec > 0 else 0
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    # --- planet-scale zone dim through the NATURAL auto cutover
    # (VERDICT r4 #4): 10⁴ zones × 2·10³ vertices ≈ 320 MB of geometry,
    # past the real 256 MB broadcast budget, so strategy='auto' routes
    # to the partitioned cogroup path with no forced budget. ONE timed
    # run (no best-of-N): the dominant cost IS the one-time zone-side
    # cell/rings materialization, which an amortized rerun would hide.
    # Gated off by default to keep the driver's suite wall time
    # bounded; run with COSMOSPARK_BENCH_PLANET=1 and recorded in
    # BENCH/BASELINE.md.
    planet = {}
    if os.environ.get("COSMOSPARK_BENCH_PLANET") == "1":
        from cosmospark.assign import estimate_zone_geom_bytes
        from cosmospark.fixtures import planet_zones_df

        pz = planet_zones_df(spark, 10_000, 2_000).localCheckpoint()
        est = estimate_zone_geom_bytes(pz)
        n_planet = 500_000
        ppts = spark.range(n_planet).select(
            F.col("id").alias("pid"),
            F.expr("cast(-180.0 + (id * 7919 % 36000) / 100.0 as double)").alias("lon"),
            F.expr("cast(-60.0 + (id * 104729 % 12000) / 100.0 as double)").alias("lat"),
        )
        t0 = time.time()
        n_phit = assign_zones(
            ppts, pz, strategy="auto", id_col="pid", index_max_cells=4
        ).filter(F.col("zone_id") >= 0).count()
        planet_sec = time.time() - t0
        timings["pip_assign_planet_auto"] = round(planet_sec, 3)
        planet = {
            "planet_geom_bytes": est,
            "planet_points": n_planet,
            "planet_assigned_rows": n_phit,
            "planet_images_per_sec": round(n_planet / planet_sec)
            if planet_sec > 0
            else 0,
        }


    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cpu_sec": cpu_secs,
        "tree_cpu_sec": tree_cpu_secs,
        "host_cpu_probe_per_query": host_probes,
        "retried_entries": retried_entries,
        "sf": sf_dir,
        "cpus": cpus,
        "pip_rows": n_pip,
        "images_per_sec": round(images_per_sec),
        "pip_assigned_rows": n_assigned,
        "image_pipeline_rows_per_sec": image_rows_per_sec,
        "image_pipeline_invariants_ok": int(inv["pix_ok"]) == int(inv["n"]),
        "skew_top_key_fraction": skew_top_key_frac,
        "pbf_decode_mbps": pbf_decode_mbps,
        "pbf_decode_speedup_vs_scalar": pbf_decode_speedup,
        "partitioned_images_per_sec": partitioned_images_per_sec,
        "raster_images_per_sec": raster_images_per_sec,
        "raster_exact_images_per_sec": raster_exact_images_per_sec,
        "raster_tile_images_per_sec": raster_tile_images_per_sec,
        "raster_skew_salted_images_per_sec": raster_skew_images_per_sec,
        "raster_skew_assigned_rows": n_srast,
        "raster_assigned_rows": n_rast,
        "adaptive_split_rows_per_sec": acs_rows_per_sec,
        "adaptive_split_cells": int(acs_row["cells"]),
        "adaptive_split_max_cell_frac": acs_max_cell_frac,
        "semdedup_k": semdedup_k,
        "semdedup_max_cluster_frac": semdedup_max_frac,
        "host_probe_sec_start": host_probe_start,
        "host_probe_sec_end": _host_probe(),
        "host_cpu_probe_sec_start": host_cpu_probe_start,
        "host_cpu_probe_sec_end": _cpu_probe(),
        **planet,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
