"""Assemble BENCH_sf1.json: the sf1 scale-stress artifact (VERDICT r3
next-round #1).

Joins the sf1 bench output with the per-query sf0.1 timings from the
driver's BENCH_r03.json and each query's data multiplier (which tables
it reads, via scripts/make_scale.py's MULTIPLIERS), then grades every
query on ratio/multiplier — the linear-scaling check. A query is
flagged when its wall-clock grew MORE than its data did (ratio >
multiplier), with a 2x allowance for fixed-overhead-dominated
sub-second baselines.

Usage: python scripts/sf1_report.py <sf1_bench.json> [sf01_bench.json] \
           > BENCH_sf1.json

The optional second argument is a fresh bench.py output at sf0.1 —
its timings baseline queries added AFTER BENCH_r03 (second-wave
entries have no driver-recorded r3 time); r3 values win where both
exist so historical ratios stay comparable.
"""

from __future__ import annotations

import json
import re
import sys

# dominant table(s) per headline query family -> effective multiplier
EVENTS, DOCS, EMB, REL = 50, 100, 50, 10


def multiplier_for(name: str) -> int:
    if name.startswith("events_"):
        return EVENTS
    if "documents" in name or name.startswith(("text_", "corpus_", "vocab_", "dedup_")):
        return DOCS
    if "embedding" in name or name.startswith(("knn_", "kmeans_", "hybrid_")):
        return EMB
    return REL


def main() -> None:
    sf1 = json.load(open(sys.argv[1]))
    r3 = json.load(open("BENCH_r03.json"))
    base = {}
    if len(sys.argv) > 2:  # fresh sf0.1 run for post-r3 entries
        base.update(
            {k: float(v) for k, v in json.load(open(sys.argv[2]))["queries"].items()}
        )
    base.update(
        {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', r3["tail"])
        }
    )
    rows = {}
    flagged = []
    for q, t in sf1["queries"].items():
        b = base.get(q)
        mult = multiplier_for(q)
        ratio = round(t / b, 2) if b else None
        ok = True
        if ratio is not None:
            # sub-second baselines are session-overhead dominated; allow 2x
            allowance = mult * (2.0 if b < 1.0 else 1.0)
            ok = ratio <= allowance
        rows[q] = {
            "sf1_sec": t,
            "sf01_sec": b,
            "ratio": ratio,
            "data_multiplier": mult,
            "linear_ok": ok,
        }
        if not ok:
            flagged.append(q)
    out = {
        "metric": "sf1_scale_stress",
        "value": sf1["value"],
        "unit": "sec",
        "sf": 1.0,
        "n_queries": len(rows),
        "flagged_super_linear": flagged,
        "corpus": {
            "lineitem": 6_000_000,
            "orders": 1_500_000,
            "events": 5_000_000,
            "documents": 500_000,
            "embeddings": 100_000,
        },
        "notes": (
            "var/sf1 built by scripts/make_scale.py (structure-preserving "
            "replication). r4 finding fixed: embedding_near_dup_kmeans "
            "with fixed k=8 ran 303s (65x on 50x data, n^2/k growth); adaptive "
            "k = ceil(n/1024) with the recursive cell cap brought it to ~12x. "
            "r5 extends the run to the second wave: CDC diff, ER clusters, "
            "incremental rollup, PQ ANN, classifier metrics, and the five "
            "Structured Streaming entries (full availableNow drains through "
            "a memory sink: micro-batch scheduling + state store + watermark "
            "flush measured end-to-end; their sf1 wall times are dominated "
            "by state-store row churn and stay well under the 50x data "
            "multiplier). documents_quality_auc_binned already beats the "
            "exact rank form at 500k docs (3.9s vs 7.0s) - the gap is the "
            "single-task global sort the binned form exists to remove. "
            "r6: RocksDB state store cut the big-state drains (sessions "
            "36.2s -> 19.6s; A/B counter-measurement: the 4-small-stores "
            "stream-stream join prefers HDFS, 8.1s vs 15.5s - both "
            "directions recorded, default stays RocksDB with a per-drain "
            "opt-out). New coverage: codes-only quantized ANN (ivfpq "
            "27.2s -> 24.1s), binned robust outlier (3.1s vs exact 6.6s), "
            "incremental quantiles, bloom decontamination, BM25, BPE "
            "training (4.6s at sf1 - vocabulary-sized state, sub-linear), "
            "and the multimodal codec legs (PPM/PNG/JPEG 28.5s, WAV 3.8s, "
            "Y4M 1.8s on 100x docs - all sub-linear). r8: coverage extends "
            "to events_hourly_acf (0.8s, time-dimension-sized) and the "
            "round-8 wave E187-E198 (all sub-second-to-3s at sf1 except "
            "SNM/JL-distortion which are pair-join bound and sub-linear); "
            "orders_bootstrap_mean_ci 37.1s -> 8.6s (one-md5 affine draws "
            "+ pre-fanout repartition); documents_textrank_chunks 54.7s "
            "(was 75.3 at r7) under the node-broadcast policy. r8 "
            "continuation: 34 more entries (E207-E240, waves 7-16) all "
            "sub-linear. Two defects surfaced HERE and not at sf0.01 - "
            "the scale stress doing its job: the Theil entry's "
            "per-nation x*ln(x) sum overflowed int64 (moved to decimal/"
            "hugeint), and part_item_item_cf's pair hash-agg spilled at "
            "32 shuffle partitions (fixed by a 64-way (i,j) repartition "
            "+ single-buyer prefilter + dropping the output sort: 76s "
            "cold -> 23s, ratio 13.3 -> ~4 on 10x data). Absolute "
            "totals are not comparable across rounds (shared box, load "
            "varies +-30%); the gate is the per-query ratio/multiplier "
            "column, which has zero super-linear flags this round."
        ),
        "queries": rows,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
