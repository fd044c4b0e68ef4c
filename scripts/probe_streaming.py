"""Diagnose streaming drain cost: run one drain and dump per-batch
progress metrics (durationMs breakdown, state operator metrics).

Usage: python scripts/probe_streaming.py [entry] [--sf-dir DIR]
Never run while another Spark JVM is up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from data_pipelines_snowflake_procedures_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf-dir":
            sf_dir = sys.argv[1:][i + 1]
    name = args[0] if args else "events_stream_stream_left_outer"

    import bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="probe-streaming",
        shuffle_partitions=bench._shuffle_partitions_for(sf_dir, cpus),
    )
    print(
        "shuffle.partitions =",
        spark.conf.get("spark.sql.shuffle.partitions"),
        "cpus =", cpus,
    )

    # monkeypatch run_to_memory to capture the query handle's progress
    from data_pipelines_snowflake_procedures_spark.streaming import stream as st

    progress_log: list = []
    orig_start = None

    import pyspark.sql.streaming.readwriter as srw  # noqa: F401

    from pyspark.sql.streaming.query import StreamingQuery

    orig_await = None

    orig_run = st.run_to_memory

    def wrapped(streaming_df, *args, **kwargs):
        t0 = time.perf_counter()
        out = orig_run(streaming_df, *args, **kwargs)
        print(
            f"drain wall: {time.perf_counter()-t0:.2f}s "
            f"(shuffle_partitions={kwargs.get('shuffle_partitions')})"
        )
        return out

    st.run_to_memory = wrapped

    # capture progress via listener
    from pyspark.sql.streaming import StreamingQueryListener

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            print("query started", event.id)

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            progress_log.append(p)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            print("query terminated")

    spark.streams.addListener(L())

    from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

    t0 = time.perf_counter()
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    n = df.count()
    print(f"{name}: {time.perf_counter()-t0:.2f}s total ({n} rows)")
    time.sleep(1)
    for p in progress_log:
        dur = p.get("durationMs", {})
        so = [
            {
                k: s.get(k)
                for k in (
                    "operatorName", "numRowsTotal", "numRowsUpdated",
                    "commitTimeMs", "allUpdatesTimeMs", "allRemovalsTimeMs",
                    "numShufflePartitions", "numStateStoreInstances",
                )
            }
            for s in p.get("stateOperators", [])
        ]
        print(
            json.dumps(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": dur,
                    "stateOperators": so,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
