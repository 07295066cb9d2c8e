"""The wallet_export Python DataSource WRITER (io/export_sink.py):
commit publishes atomically through the manifest, abort leaves no
trace, append mode versions exports."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.export_sink import (
    WalletExportDataSource,
    published_files,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(WalletExportDataSource)
    return spark


def _df(spark, n=20, tag="a"):
    return spark.range(n).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("k"),
        (F.col("id") * 2.5).alias("v"),
    )


def test_commit_publishes_manifest_consistent_export(registered, tmp_path):
    spark, root = registered, str(tmp_path / "exp")
    _df(spark, 20).repartition(4).write.format("wallet_export").option("path", root).mode(
        "overwrite"
    ).save()
    files = published_files(root)
    with open(os.path.join(os.path.dirname(files[0]), "_MANIFEST.json")) as f:
        manifest = json.load(f)
    back = spark.read.option("header", "true").schema("k string, v double").csv(files)
    assert back.count() == 20 == manifest["total_rows"]
    assert sorted(r["k"] for r in back.collect()) == sorted(
        r["k"] for r in _df(spark, 20).collect()
    )
    assert not any(
        f for f in os.listdir(os.path.join(root, "_staging")) if not f.startswith(".")
    )  # staging drained


def test_append_mode_versions_exports(registered, tmp_path):
    spark, root = registered, str(tmp_path / "exp")
    _df(spark, 5, "a").write.format("wallet_export").option("path", root).mode("append").save()
    first = published_files(root)
    _df(spark, 7, "b").write.format("wallet_export").option("path", root).mode("append").save()
    second = published_files(root)
    assert os.path.dirname(first[0]).endswith("export-0")
    assert os.path.dirname(second[0]).endswith("export-1")
    back = spark.read.option("header", "true").schema("k string, v double").csv(second)
    assert back.count() == 7  # the pointer resolves ONE live export


def test_failed_job_aborts_and_publishes_nothing(registered, tmp_path):
    spark, root = registered, str(tmp_path / "exp")

    @F.udf("double")
    def boom(v):
        raise RuntimeError("induced task failure")

    df = _df(spark, 10).withColumn("v", boom("v"))
    with pytest.raises(Exception):
        df.write.format("wallet_export").option("path", root).mode("overwrite").save()
    assert not os.path.exists(os.path.join(root, "_PUBLISHED"))
    # abort sweeps staging, but a zombie task can re-stage a part
    # AFTER the sweep (task cancellation is asynchronous) — permitted
    # by the protocol since unmanifested files are invisible to
    # readers. Allow a short settle before asserting the sweep held.
    import time

    for _ in range(20):
        staged = (
            [
                f
                for f in os.listdir(os.path.join(root, "_staging"))
                if not f.startswith(".")
            ]
            if os.path.isdir(os.path.join(root, "_staging"))
            else []
        )
        if not staged:
            break
        time.sleep(0.25)
    # the durable guarantee: nothing PUBLISHED, and the next successful
    # export publishes cleanly with no stale parts in its manifest
    ok = _df(spark, 5)
    ok.write.format("wallet_export").option("path", root).mode("overwrite").save()
    import json

    with open(os.path.join(root, "_PUBLISHED")) as f:
        exp = json.load(f)["export"]
    with open(os.path.join(root, f"export-{exp}", "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 5
    # commit's self-heal swept any zombie residue
    staged = [
        f
        for f in os.listdir(os.path.join(root, "_staging"))
        if not f.startswith(".")
    ]
    assert not staged


def test_speculative_duplicate_task_not_double_committed(registered, tmp_path):
    """Task-retry idempotence (speculative re-execution shape): two
    attempts of the SAME partition both stage a part file, but Spark
    delivers only the winning attempt's commit message to commit().
    The zombie's staged file must never become visible — the manifest
    names exactly the committed parts, the reader resolves through the
    manifest, and commit's self-heal sweeps the residue."""
    from datalake_polygonscan_spark.io.export_sink import WalletExportWriter

    import pyarrow as pa

    spark, root = registered, str(tmp_path / "exp")
    writer = WalletExportWriter(root, ["k", "v"], overwrite=True)
    batch = pa.RecordBatch.from_pydict(
        {"k": ["a%d" % i for i in range(10)], "v": [float(i) for i in range(10)]}
    )
    zombie = writer.write(iter([batch]))   # attempt 0: staged, message dropped
    winner = writer.write(iter([batch]))   # attempt 1: staged, message wins
    assert zombie.filename != winner.filename
    writer.commit([winner])

    files = published_files(root)
    assert [os.path.basename(p) for p in files] == [winner.filename]
    back = (
        spark.read.format("wallet_export").option("path", root).load()
    )
    assert back.count() == 10  # exactly one copy, never the zombie's
    with open(os.path.join(os.path.dirname(files[0]), "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 10
    # self-heal swept the zombie's staged part
    staging = os.path.join(root, "_staging")
    assert not any(f for f in os.listdir(staging) if not f.startswith("."))


def test_reader_ignores_stray_files_and_pins_versions(registered, tmp_path):
    """The manifest IS the read path: a stray CSV dropped beside the
    committed parts is invisible, and option('export', N) pins a
    historical export while the live pointer serves the newest."""
    spark, root = registered, str(tmp_path / "exp")
    _df(spark, 5, "a").write.format("wallet_export").option("path", root).mode("append").save()
    _df(spark, 7, "b").write.format("wallet_export").option("path", root).mode("append").save()
    # adversarial stray file inside the LIVE export dir
    with open(os.path.join(root, "export-1", "part-stray.csv"), "w") as f:
        f.write("k,v\nSTRAY,1.0\n")
    live = spark.read.format("wallet_export").option("path", root).load()
    assert live.count() == 7
    assert not [r for r in live.collect() if r["k"] == "STRAY"]
    pinned = (
        spark.read.format("wallet_export").option("path", root).option("export", "0").load()
    )
    assert pinned.count() == 5
    assert all(r["k"].startswith("a") for r in pinned.collect())


# ---------------------------------------------------------------------------
# R10s: streaming writer (per-batch manifests, batch-id idempotence)
# ---------------------------------------------------------------------------


def test_stream_writer_commits_one_export_per_batch(spark, tmp_path):
    import os

    from datalake_polygonscan_spark.io.export_sink import (
        WalletExportDataSource,
        published_files,
    )

    spark.dataSource.register(WalletExportDataSource)
    src = str(tmp_path / "src")
    root = str(tmp_path / "export")
    os.makedirs(src)
    for i in range(2):
        spark.createDataFrame(
            [(i * 10 + j, f"w{j}", float(j)) for j in range(5)],
            ["tx_id", "wallet_address", "quantity"],
        ).coalesce(1).write.parquet(os.path.join(src, f"f{i}.parquet"))
    stream = (
        spark.readStream.schema("tx_id long, wallet_address string, quantity double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.format("wallet_export")
        .option("path", root)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    exports = sorted(d for d in os.listdir(root) if d.startswith("export-"))
    assert exports == ["export-0", "export-1"]
    # live pointer resolves the LAST batch; each export has 5 rows
    assert len(published_files(root)) >= 1
    total = 0
    for i in range(2):
        total += (
            spark.read.format("wallet_export")
            .option("path", root)
            .option("export", i)
            .load()
            .count()
        )
    assert total == 10


def test_stream_writer_replayed_batch_commit_is_ignored(spark, tmp_path):
    import json
    import os

    from datalake_polygonscan_spark.io.export_sink import WalletExportStreamWriter

    root = str(tmp_path / "export")
    staging = os.path.join(root, "_staging")
    os.makedirs(staging)

    class Msg:
        def __init__(self, name, n):
            self.filename, self.n_rows = name, n

    w = WalletExportStreamWriter(root, ["a"], overwrite=False)
    with open(os.path.join(staging, "p1.csv"), "w") as f:
        f.write('"a"\n1\n')
    w.commit([Msg("p1.csv", 1)], batchId=0)
    with open(os.path.join(root, "_PUBLISHED")) as f:
        before = json.load(f)
    assert before == {"export": 0, "batch_id": 0}

    # re-delivery of batch 0 (sink committed, checkpoint did not)
    with open(os.path.join(staging, "p1_retry.csv"), "w") as f:
        f.write('"a"\n1\n')
    w.commit([Msg("p1_retry.csv", 1)], batchId=0)
    with open(os.path.join(root, "_PUBLISHED")) as f:
        assert json.load(f) == before
    assert sorted(os.listdir(root)) == ["_PUBLISHED", "_staging", "export-0"]
    assert os.listdir(staging) == []  # replayed staging swept

    # the NEXT batch still commits normally
    with open(os.path.join(staging, "p2.csv"), "w") as f:
        f.write('"a"\n2\n')
    w.commit([Msg("p2.csv", 1)], batchId=1)
    with open(os.path.join(root, "_PUBLISHED")) as f:
        assert json.load(f) == {"export": 1, "batch_id": 1}
