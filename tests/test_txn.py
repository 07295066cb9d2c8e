"""S30 multi-table transaction protocol (io/txn.py): all-or-nothing
visibility, conflict abort, crash roll-forward via the intent log."""

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.sinks import SnapshotConflict, atomic_overwrite, read_table
from datalake_polygonscan_spark.io.txn import recover, txn_commit


def _tables(tmp_path):
    return str(tmp_path / "fact"), str(tmp_path / "rollup"), str(tmp_path / "_txn")


def test_txn_commits_both_tables_atomically(spark, tmp_path):
    fact, rollup, troot = _tables(tmp_path)
    f1 = spark.range(10).withColumn("v", F.col("id") * 2)
    r1 = f1.agg(F.sum("v").alias("total"))
    txn_commit(spark, troot, [(fact, f1), (rollup, r1)])
    assert read_table(spark, fact).count() == 10
    assert read_table(spark, rollup).collect()[0]["total"] == 90
    # second txn over both
    f2 = spark.range(20).withColumn("v", F.col("id") * 2)
    txn_commit(spark, troot, [(fact, f2), (rollup, f2.agg(F.sum("v").alias("total")))])
    assert read_table(spark, fact).count() == 20
    assert read_table(spark, rollup).collect()[0]["total"] == 380


def test_txn_conflict_aborts_whole_set(spark, tmp_path):
    fact, rollup, troot = _tables(tmp_path)
    txn_commit(spark, troot, [(fact, spark.range(5)), (rollup, spark.range(1))])
    # race a single-table writer into the window between the
    # transaction's base read and its validation: spy on the FIRST
    # base read of `fact` and commit the racing write right after it
    import datalake_polygonscan_spark.io.txn as txn_mod

    orig = txn_mod.read_pointer
    bases_read = []

    def spy(path):
        b = orig(path)
        if path == fact and len(bases_read) == 0:
            bases_read.append(b)
            # racing single-table writer lands AFTER this base read
            atomic_overwrite(spark.range(99), fact)
        return b

    txn_mod.read_pointer = spy
    try:
        with pytest.raises(SnapshotConflict):
            txn_commit(spark, troot, [(fact, spark.range(7)), (rollup, spark.range(7))])
    finally:
        txn_mod.read_pointer = orig
    # neither table shows the aborted txn: fact has the racer's 99 rows,
    # rollup still has its original single row
    assert read_table(spark, fact).count() == 99
    assert read_table(spark, rollup).count() == 1


def test_txn_crash_after_commit_point_rolls_forward(spark, tmp_path):
    fact, rollup, troot = _tables(tmp_path)
    txn_commit(spark, troot, [(fact, spark.range(5)), (rollup, spark.range(1))])
    with pytest.raises(RuntimeError, match="injected crash"):
        txn_commit(
            spark, troot,
            [(fact, spark.range(50)), (rollup, spark.range(2))],
            _crash_after_apply=1,
        )
    # mixed state on disk: one pointer applied, one not — recovery must
    # roll the intent FORWARD so both show the transaction
    res = recover(troot)
    assert len(res["rolled_forward"]) == 1
    counts = {read_table(spark, fact).count(), read_table(spark, rollup).count()}
    assert counts == {50, 2}
    # idempotent
    res2 = recover(troot)
    assert res2["rolled_forward"] == [] and res2["already_applied"] >= 1


def test_txn_crash_before_commit_point_leaves_base_state(spark, tmp_path):
    fact, rollup, troot = _tables(tmp_path)
    txn_commit(spark, troot, [(fact, spark.range(5)), (rollup, spark.range(1))])
    with pytest.raises(RuntimeError, match="injected crash"):
        txn_commit(
            spark, troot,
            [(fact, spark.range(50)), (rollup, spark.range(2))],
            _crash_after_apply=0,
        )
    # crash hit after the commit point with ZERO applies; roll forward
    res = recover(troot)
    assert len(res["rolled_forward"]) == 1
    assert read_table(spark, fact).count() == 50
    assert read_table(spark, rollup).count() == 2
