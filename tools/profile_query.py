"""Per-query profiling helper for the optimization rounds.

Times named registry queries in isolation with the noop sink (guide
§1.4) on the bench session, optionally capturing
``.explain("formatted")`` to a file (guide §7.2).

Usage:
    python tools/profile_query.py q1,q2,... [--reps 3] [--sf-dir DIR]
        [--no-warm] [--explain-dir plans/r10 --explain-suffix before]

Prints one line per rep per query plus the median. This is a DEV tool:
the committed record stays bench.py / BENCH_SELF artifacts.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_polygonscan_spark.queries import queries  # noqa: E402
from datalake_polygonscan_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated registry query names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true", help="skip the sf0.001 codegen warmup rep")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="before")
    args = ap.parse_args()

    spark = get_spark("profile")
    qs = queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        fn = qs[name]
        if not args.no_warm and os.path.isdir(warm_dir):
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            import contextlib
            import io

            df = fn(spark, args.sf_dir)
            path = os.path.join(args.explain_dir, f"{name}_{args.explain_suffix}.txt")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"EXPLAIN {name} -> {path}", flush=True)
        if args.reps <= 0:
            continue
        ts = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            ts.append(dt)
            print(f"REP {name} {rep} {dt:.3f}", flush=True)
        print(f"MEDIAN {name} {statistics.median(ts):.3f}", flush=True)


if __name__ == "__main__":
    main()
