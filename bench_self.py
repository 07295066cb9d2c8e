"""Self-run bench artifact (VERDICT r7 'Next round' #1): the committed
BENCH_r*.json artifacts keep only the driver's output tail, so
round-over-round per-query regression analysis was impossible from the
record. This runner commits the FULL map:

1. the complete headline suite at sf0.1 (bench.py verbatim, full
   per-query timings preserved), and
2. the ITERATIVE tier (round-bound graph/clustering/dedup/stream
   operators) at sf1.0 — 10x data built by tools/scale_testdata.py —
   so "overhead-bound, not data-bound" is a measured claim: if a query
   is dominated by per-round fixed cost at sf0.1, its sf1.0 time grows
   far less than 10x (scale_ratio << 10).

Usage: python bench_self.py [--out BENCH_SELF_rNN.json]
Writes the JSON artifact and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: the iterative tier: operators whose cost is rounds x per-round
#: fixed overhead + data volume — the set VERDICT r7 asked to see at
#: sf1.0 (ml11 dbscan, g7/g8/g10 graph loops, l12 incremental LSH,
#: l14 MMR, e16 checkpointed stream resume)
ITERATIVE_TIER = [
    "ml11_dbscan",
    "ml11c_dbscan_const_density",
    "g7_cc_largestar",
    "g8_sssp",
    "g10_kcore",
    "l12_incremental_dedup",
    "l14_mmr_rerank",
    "e16_checkpoint_resume",
]

SF1_DIR = ".bench_data/sf1.0"


def run_headline_sf01() -> dict:
    """bench.py verbatim — its single JSON line, fully parsed."""
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1"},
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def run_headline_medians(n_runs: int = 3) -> dict:
    """VERDICT r8 'Next round' #7: same-day run noise is 5-8%, which
    hides <20% regressions in a single run — run the whole headline
    sweep ``n_runs`` times and report per-query MEDIANS. Each run keeps
    its own before/after calibration; cross-round comparisons should
    use the medians, never a single run."""
    import statistics

    runs = [run_headline_sf01() for _ in range(n_runs)]
    names = runs[0]["queries"].keys()
    medians = {
        name: round(statistics.median(r["queries"][name] for r in runs), 3)
        for name in names
    }
    return {
        "n_runs": n_runs,
        "sf": runs[0]["sf"],
        "query_medians": medians,
        "median_total_sec": round(sum(medians.values()), 3),
        "per_run": [
            {
                "value": r["value"],
                "calibration_sec": r.get("calibration_sec"),
                "calibration_ratio": r.get("calibration_ratio"),
                "per_query_mean_sec": r.get("per_query_mean_sec"),
                "per_query_mean_normalized": r.get("per_query_mean_normalized"),
                # full per-query map per run (round 10): medians can be
                # re-pooled over additional runs when a measurement
                # window is degraded — this host's run-level variance is
                # ±20% (r9's own record spans 441-622 s)
                "queries": r.get("queries", {}),
            }
            for r in runs
        ],
        "last_run_full": runs[-1],
    }


def ensure_sf1() -> None:
    probe = os.path.join(SF1_DIR, "lineitem.parquet")
    if os.path.isdir(probe):
        return
    subprocess.run(
        [sys.executable, "tools/scale_testdata.py", "/root/testdata/sf0.1", SF1_DIR, "10"],
        check=True,
    )


def run_iterative_sf1(sf01_queries: dict[str, float]) -> dict:
    from datalake_polygonscan_spark.queries import queries
    from datalake_polygonscan_spark.session import get_spark

    spark = get_spark("bench-sf1")
    qs = queries()
    timings: dict[str, float] = {}
    for name in ITERATIVE_TIER:
        t0 = time.perf_counter()
        qs[name](spark, SF1_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    ratios = {
        n: round(timings[n] / sf01_queries[n], 2)
        for n in ITERATIVE_TIER if sf01_queries.get(n)
    }
    return {
        "sf": 1.0,
        "queries": timings,
        "total_sec": round(sum(timings.values()), 3),
        # sf1.0/sf0.1 wall ratio per query: 10x data -> a ratio well
        # under 10 means fixed per-round overhead dominates at sf0.1
        "scale_ratio_vs_sf0.1": ratios,
    }


def main() -> None:
    out_path = "BENCH_SELF_r09.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    n_runs = 3
    if "--runs" in sys.argv:
        n_runs = int(sys.argv[sys.argv.index("--runs") + 1])
    headline = run_headline_medians(n_runs)
    ensure_sf1()
    iterative = run_iterative_sf1(headline["query_medians"])
    artifact = {
        "kind": "self_bench",
        "headline_sf0.1_medians": headline,
        "iterative_sf1.0": iterative,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({
        "metric": "self_bench",
        "out": out_path,
        "n_runs": n_runs,
        "sf0.1_median_total": headline["median_total_sec"],
        "sf0.1_n_queries": len(headline["query_medians"]),
        "per_run_normalized_means": [
            r["per_query_mean_normalized"] for r in headline["per_run"]],
        "sf1.0_iterative_total": iterative["total_sec"],
        "scale_ratios": iterative["scale_ratio_vs_sf0.1"],
    }))


if __name__ == "__main__":
    main()
