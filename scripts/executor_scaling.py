"""N-vs-4N executor-count scaling, emulated faithfully on one box.

A real cluster's "4N executors" means 4N independent (JVM + python
worker) pairs, each with its own core(s). A single local[4N] session is
NOT that: one shared JVM's task threads compete with the python workers,
so the JVM overhead concentrates instead of scaling out. This harness
launches N separate ``spark-submit --master local[1]`` processes, each
pinned (taskset) to its own CPU and given a 1/N shard of the same input
— exactly a cluster's per-executor topology.

Strong scaling: total rows fixed; cluster throughput = Σ rows / max wall.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_fleet(
    n_exec: int,
    total_rows: int,
    zip_path: str,
    cpus_per_exec: int = 2,
    vertices: int = 2048,
) -> dict:
    """One executor = 1 task core + 1 overhead core (JVM GC/JIT/Arrow),
    matching a real executor's cores-per-slot provisioning."""
    shard = total_rows // n_exec
    procs = []
    env = dict(os.environ, OPENBLAS_NUM_THREADS="1", OMP_NUM_THREADS="1")
    for k in range(n_exec):
        lo = k * cpus_per_exec
        cpus = f"{lo}-{lo + cpus_per_exec - 1}"
        cmd = [
            "taskset", "-c", cpus,
            "spark-submit",
            "--master", "local[1]",
            "--driver-memory", "3g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.extraJavaOptions=-XX:+UseSerialGC -XX:CICompilerCount=2",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "detailed_pip_bench_job.py"),
            "--rows", str(shard),
            "--start", str(k * shard),
            "--vertices", str(vertices),
        ]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env))
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        for line in out.strip().splitlines()[::-1]:
            if line.strip().startswith("{"):
                results.append(json.loads(line))
                break
    wall = max(r["wall_sec"] for r in results)
    return {
        "executors": n_exec,
        "rows_total": shard * n_exec,
        "max_wall_sec": wall,
        "per_exec_rows_per_sec": [r["images_per_sec"] for r in results],
        "images_per_sec": round(shard * n_exec / wall),
        "assigned_total": sum(r["assigned"] for r in results),
    }


def main() -> None:
    # default sized so the per-run FIXED cost (driver zone-index build +
    # broadcast, ~5-18 s) is < 10% of the 4N fleet's wall — smaller
    # totals read as fake inefficiency (Amdahl on the fixed cost, NOT
    # engine scaling: measured 26.4k rows/s/exec at 2M-row shards vs
    # 32.4k at 4M vs a flat ~36k kernel rate)
    total = int(os.environ.get("COSMOSPARK_EXEC_ROWS", "32000000"))
    zip_path = "/tmp/cosmospark_pyfiles.zip"
    if not os.path.exists(zip_path):
        import zipfile

        with zipfile.ZipFile(zip_path, "w") as zf:
            pkg = os.path.join(REPO, "cosmospark")
            for root, _, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, REPO))

    vertices = int(os.environ.get("COSMOSPARK_EXEC_VERTICES", "2048"))
    r2 = run_fleet(2, total, zip_path, vertices=vertices)
    r8 = run_fleet(8, total, zip_path, vertices=vertices)
    eff = r8["images_per_sec"] / r2["images_per_sec"] / 4.0
    print(
        json.dumps(
            {
                "vertices": vertices,
                "n2": r2,
                "n8": r8,
                "efficiency_n_to_4n": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
