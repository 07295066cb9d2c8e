"""TRUE cross-process concurrent MERGE: two OS processes, each with
its own SparkSession (separate JVMs), merge bucket-disjoint batches
into the same table at the same time. Both reads of the base pointer
happen before either commit (go-file barrier), so the slower writer
MUST hit SnapshotConflict — and, buckets being disjoint, resolve it
via the O(metadata) rebase (io/merge.py:_rebase_commit) rather than a
recompute. The cross-JVM generalization of the in-process race in
tests/test_merge.py and the pointer-CAS race in tests/test_sinks.py."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_RACER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[4])
tbl, tag, bucket = sys.argv[1], sys.argv[2], int(sys.argv[3])
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "2g")
    .appName("racer-" + tag).getOrCreate())
from datalake_polygonscan_spark.io.merge import _bucket_col, merge_upsert
seed = spark.createDataFrame([(i, 0.0) for i in range(64)], ["k", "v"])
keys = [r["k"] for r in seed.select("k", _bucket_col(["k"], 8).alias("b"))
        .filter(F.col("b") == bucket).limit(3).collect()]
batch = spark.createDataFrame([(k, float(ord(tag[-1]))) for k in keys], ["k", "v"])
# warm the session (JIT/first-job cost) so both racers hit the merge
# with comparable latency, THEN park on the barrier
batch.count()
with open(os.path.join(tbl, "_ready_" + tag), "w") as f:
    f.write("ready")
go = os.path.join(tbl, "_go")
deadline = time.monotonic() + 120
while not os.path.exists(go):
    if time.monotonic() > deadline:
        sys.exit(2)
    time.sleep(0.002)
merge_upsert(spark, tbl, batch, keys=["k"], n_buckets=8)
print(json.dumps({"tag": tag, "keys": keys}))
"""


def test_cross_process_disjoint_merge_rebase(spark, tmp_path):
    from datalake_polygonscan_spark.io.merge import _bucket_col, merge_upsert
    from datalake_polygonscan_spark.io.sinks import history
    from pyspark.sql import functions as F

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tbl = str(tmp_path / "t")
    seed = spark.createDataFrame([(i, 0.0) for i in range(64)], ["k", "v"])
    merge_upsert(spark, tbl, seed, keys=["k"], n_buckets=8)  # v0

    buckets = sorted(
        r["b"] for r in seed.select(_bucket_col(["k"], 8).alias("b")).distinct().collect()
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _RACER, tbl, f"w{i}", str(buckets[i]), repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for i in range(2)
    ]
    deadline = time.monotonic() + 180
    while not all(os.path.exists(os.path.join(tbl, f"_ready_w{i}")) for i in range(2)):
        assert time.monotonic() < deadline, "racers failed to start"
        time.sleep(0.01)
    with open(os.path.join(tbl, "_go"), "w") as f:
        f.write("go")
    outs = [p.communicate(timeout=300)[0].strip().splitlines()[-1] for p in procs]
    assert all(p.returncode == 0 for p in procs)
    writers = [json.loads(o) for o in outs]

    from datalake_polygonscan_spark.io.sinks import read_table

    live = {r["k"]: r["v"] for r in read_table(spark, tbl).collect()}
    for w in writers:
        val = float(ord(w["tag"][-1]))
        for k in w["keys"]:
            assert live[k] == val, (w, live[k])  # neither merge lost
    log = history(tbl)
    assert [e["version"] for e in log] == [0, 1, 2]
    # both writers read the same base (barrier) => the slower one MUST
    # have conflicted; disjoint buckets => it resolved via rebase
    assert log[-1].get("rebased_from") == 1, log[-1]
