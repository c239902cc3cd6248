"""One-off guide-§1 isolation probe for assign_zones_partitioned: time
the refine-row semi-join volume, the full-hit leg, the cogroup PIP
refine and the final argmin separately on the bench's 2M-point
workload. Throwaway measurement tool, not part of the suite."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from cosmospark.queries import _lux_typed_zones
    from cosmospark.session import get_spark
    from cosmospark import cells
    from cosmospark.assign import (
        INDEX_MAX_CELLS,
        _zone_cells_with_full,
        assign_zones,
        encode_points,
    )

    spark = get_spark(
        app_name="profile-partitioned",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    zones = _lux_typed_zones(spark)
    n_pip = 2_000_000
    pts = spark.range(n_pip).select(
        F.col("id").alias("pid"),
        F.expr("cast(2.0 + (id * 7919 % 1300) / 100.0 as double)").alias("lon"),
        F.expr("cast(44.0 + (id * 104729 % 1000) / 100.0 as double)").alias("lat"),
    )
    pts = encode_points(pts)

    def t(name, fn):
        t0 = time.time()
        r = fn()
        print(f"{name:35s} {time.time()-t0:7.2f}s  {r}")
        return r

    zcells = _zone_cells_with_full(zones, INDEX_MAX_CELLS).localCheckpoint(eager=True)
    t("zcells count", zcells.count)
    res_list = sorted(r["res"] for r in zcells.select("res").distinct().collect())
    print("res_list", res_list)
    finest = max(res_list)
    enc = pts.withColumn(
        f"_c{finest}", cells.col_cell_encode(F.col("lon"), F.col("lat"), finest)
    )
    for r in res_list[:-1]:
        enc = enc.withColumn(f"_c{r}", F.shiftright(F.col(f"_c{finest}"), 2 * (finest - r)))
    res_struct = F.array(
        *[F.struct(F.lit(r).alias("res"), F.col(f"_c{r}").alias("cell")) for r in res_list]
    )
    pcells = enc.select("pid", "lon", "lat", F.explode(res_struct).alias("e")).select(
        "pid", "lon", "lat", F.col("e.res").alias("res"), F.col("e.cell").alias("cell")
    )
    zfull = zcells.filter(F.col("full")).select("res", "cell", "zone_id", "rank", "area")
    t("full_hits rows", lambda: pcells.join(F.broadcast(zfull), ["res", "cell"]).count())
    zref = zcells.filter(~F.col("full"))
    t("zref rows", zref.count)
    pref = pcells.join(
        F.broadcast(zref.select("res", "cell").distinct()), ["res", "cell"], "leftsemi"
    )
    t("pref rows (refine input)", pref.count)
    # zone multiplicity the cogroup actually sees
    t(
        "refine candidate pairs",
        lambda: pref.join(
            F.broadcast(zref.select("res", "cell", "zone_id")), ["res", "cell"]
        ).count(),
    )
    full = assign_zones(pts, zones, strategy="partitioned", id_col="pid").filter(
        F.col("zone_id") >= 0
    )
    t("warm full path", full.count)
    t("full path (timed)", full.count)
    spark.stop()


if __name__ == "__main__":
    main()
