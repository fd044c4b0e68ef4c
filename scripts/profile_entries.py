"""Per-entry profiling harness for optimization rounds.

Times selected registry entries in ONE session (the bench's
methodology: same get_spark, same shuffle-partition sizing, timed
action = .count() on the returned frame), optionally twice (cold +
warm), and dumps .explain("formatted") per entry so plan claims are
checkable offline.

Usage:
    python scripts/profile_entries.py NAME [NAME...] \
        [--sf-dir /root/testdata/sf0.1] [--repeat 2] \
        [--plans-dir plans/r10] [--suffix before]

Never run while another Spark JVM (pytest/bench) is up.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY  # noqa: E402
from data_pipelines_snowflake_procedures_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="profile",
        shuffle_partitions=bench._shuffle_partitions_for(args.sf_dir, cpus),
    )
    # Warm the JVM + parquet footers (bench does the same before timing).
    REGISTRY[bench.HEADLINE[0]].spark_fn(spark, args.sf_dir).count()

    for name in args.names:
        if name not in REGISTRY:
            print(f"?? {name}: not in REGISTRY", file=sys.stderr)
            continue
        spec = REGISTRY[name]
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, args.sf_dir)
            n = df.count() if len(df.columns) > 0 else 0
            dt = time.perf_counter() - t0
            print(f"{name} run{i}: {dt:.3f}s ({n} rows)", flush=True)
            spark.catalog.clearCache()
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = spec.spark_fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"  plan -> {out}", flush=True)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
