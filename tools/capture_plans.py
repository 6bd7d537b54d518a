"""Capture explain('formatted') output for a set of declared queries.

Round-6 deliverable helper: run once from the round-start tree and once
from the optimized tree to produce plans/r06/<query>_{before,after}.txt.

Usage:
  PYTHONPATH=<tree> python tools/capture_plans.py <out_dir> <suffix> [sf_dir] q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.environ.get("FS_TREE", "/root/repo"))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:]
    import __spark_entry__ as entry
    from fastselect_spark.runtime.session import get_spark

    spark = get_spark(app_name="capture-plans", master="local[4]", shuffle_partitions=8)
    qs = entry.queries()
    os.makedirs(out_dir, exist_ok=True)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 — record the failure visibly
            txt = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
