"""S35 equality-delete files: blind-write deletes, sequence-number
ordering, multi-column tuples, hard-link zero-rewrite contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.eqdeletes import (
    eq_append,
    eq_delete,
    read_with_equality_deletes,
)


def _rows(spark, *tuples):
    return spark.createDataFrame(list(tuples), "id long, tag string, v double")


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    eq_append(_rows(spark, (1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)), path)
    return path


def test_blind_delete_by_value(spark, table):
    eq_delete(spark, table, spark.createDataFrame([("a",)], "tag string"))
    left = read_with_equality_deletes(spark, table)
    assert sorted(r.id for r in left.collect()) == [2]


def test_reinsert_after_delete_survives(spark, table):
    eq_delete(spark, table, spark.createDataFrame([(1,)], "id long"))
    eq_append(_rows(spark, (1, "z", 99.0)), table)
    rows = {r.id: r.tag for r in read_with_equality_deletes(spark, table).collect()}
    # the seq2 re-insert postdates the seq1 delete: it must be visible,
    # and it must be the NEW generation
    assert rows[1] == "z"
    assert set(rows) == {1, 2, 3}


def test_later_delete_hits_all_generations(spark, table):
    eq_delete(spark, table, spark.createDataFrame([(1,)], "id long"))
    eq_append(_rows(spark, (1, "z", 99.0)), table)
    eq_delete(spark, table, spark.createDataFrame([(1,)], "id long"))
    assert sorted(r.id for r in read_with_equality_deletes(spark, table).collect()) == [2, 3]


def test_multi_column_tuple_matches_conjunctively(spark, table):
    # (id=3, tag='b') matches nothing; (id=3, tag='a') matches row 3
    eq_delete(spark, table, spark.createDataFrame([(3, "b")], "id long, tag string"))
    assert sorted(r.id for r in read_with_equality_deletes(spark, table).collect()) == [1, 2, 3]
    eq_delete(spark, table, spark.createDataFrame([(3, "a")], "id long, tag string"))
    assert sorted(r.id for r in read_with_equality_deletes(spark, table).collect()) == [1, 2]


def test_delete_returns_its_sequence_number(spark, table):
    # appends and deletes share one sequence counter; the delete's seq
    # is what auditing / OPTIMIZE folding keys on
    assert eq_delete(spark, table, spark.createDataFrame([(1,)], "id long")) == 1
    assert eq_append(_rows(spark, (9, "q", 1.0)), table) == 2
    assert eq_delete(spark, table, spark.createDataFrame([(9,)], "id long")) == 3


def test_null_delete_tuple_matches_null_rows(spark, tmp_path):
    """Iceberg v2 equality deletes treat NULL as equal to NULL in
    delete matching — a delete tuple with a NULL value must retire
    data rows whose value IS NULL (plain ``=`` would silently no-op)."""
    path = str(tmp_path / "t")
    eq_append(
        spark.createDataFrame(
            [(1, None, 10.0), (2, "b", 20.0), (3, None, 30.0)],
            "id long, tag string, v double",
        ),
        path,
    )
    eq_delete(spark, path, spark.createDataFrame([(None,)], "tag string"))
    assert sorted(r.id for r in read_with_equality_deletes(spark, path).collect()) == [2]
    # multi-column tuple with a NULL component is still conjunctive:
    # (id=2, tag=NULL) matches nothing — row 2's tag is 'b'
    eq_delete(
        spark, path,
        spark.createDataFrame([(2, None)], "id long, tag string"),
    )
    assert sorted(r.id for r in read_with_equality_deletes(spark, path).collect()) == [2]


def test_delete_commit_never_rewrites_data(spark, table):
    from datalake_polygonscan_spark.io.sinks import current_snapshot_path

    def seq0_inodes():
        snap = current_snapshot_path(table)
        root = os.path.join(snap, "_data", "seq-0")
        return {
            f: os.stat(os.path.join(root, f)).st_ino
            for f in os.listdir(root)
            if f.endswith(".parquet")
        }

    before = seq0_inodes()
    eq_delete(spark, table, spark.createDataFrame([("a",)], "tag string"))
    eq_delete(spark, table, spark.createDataFrame([(2,)], "id long"))
    assert seq0_inodes() == before and before


def test_random_op_sequences_match_reference_model(spark, tmp_path):
    """Model-based check: any interleaving of appends and blind
    equality deletes must leave exactly the rows a sequential
    dict-of-generations reference model predicts. Deterministic
    pseudo-random program (seeded) so the case replays identically."""
    import random

    rng = random.Random(0xE9DE1)
    for trial in range(3):
        path = str(tmp_path / f"t{trial}")
        model: list[tuple[int, int, str]] = []  # (seq, id, tag) visible rows
        seq = 0
        next_id = 0
        ops = []
        for _ in range(6):
            if seq == 0 or rng.random() < 0.55:
                rows = [
                    (next_id + i, rng.choice("abc")) for i in range(rng.randint(1, 4))
                ]
                next_id += len(rows)
                ops.append(("append", rows))
                eq_append(
                    spark.createDataFrame(
                        [(i, t, 1.0) for i, t in rows], "id long, tag string, v double"
                    ),
                    path,
                )
                model.extend((seq, i, t) for i, t in rows)
            else:
                if rng.random() < 0.5 and model:
                    tag = rng.choice("abc")
                    ops.append(("del_tag", tag))
                    eq_delete(spark, path, spark.createDataFrame([(tag,)], "tag string"))
                    model = [r for r in model if r[2] != tag]
                else:
                    victim = rng.randrange(max(next_id, 1))
                    ops.append(("del_id", victim))
                    eq_delete(spark, path, spark.createDataFrame([(victim,)], "id long"))
                    model = [r for r in model if r[1] != victim]
            seq += 1
        got = sorted(
            (r.id, r.tag) for r in read_with_equality_deletes(spark, path).collect()
        )
        want = sorted((i, t) for _s, i, t in model)
        assert got == want, f"trial {trial} ops={ops}: {got} != {want}"
