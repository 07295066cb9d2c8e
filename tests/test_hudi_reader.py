"""Foreign Hudi CoW reader (io/hudi_reader.py): file-slice resolution,
timeline travel, inflight invisibility, MoR gate."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.hudi_reader import (
    HudiProtocolError,
    read_hudi_table,
    timeline_info,
    write_foreign_hudi_fixture,
)


@pytest.fixture()
def hudi_table(spark, tmp_path):
    df = spark.range(60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS value"
    )
    t = str(tmp_path / "huditab")
    write_foreign_hudi_fixture(spark, df, t, "part", "k")
    return t, df


def test_cow_slice_resolution_and_time_travel(spark, hudi_table):
    from pyspark.sql import functions as F

    t, df = hudi_table
    live = read_hudi_table(spark, t)
    v1 = read_hudi_table(spark, t, as_of="001")
    assert live.count() == v1.count() == 60
    # the 002 upsert doubled partition 0's values; 001 sees originals
    s_live = live.filter("part = '0'").agg(F.sum("value")).collect()[0][0]
    s_v1 = v1.filter("part = '0'").agg(F.sum("value")).collect()[0][0]
    assert s_live == 2 * s_v1 and s_v1 > 0
    # untouched partitions identical at both instants
    for p in ("1", "2"):
        a = live.filter(f"part = '{p}'").agg(F.sum("value")).collect()[0][0]
        b = v1.filter(f"part = '{p}'").agg(F.sum("value")).collect()[0][0]
        assert a == b


def test_inflight_base_file_invisible(spark, hudi_table):
    t, _ = hudi_table
    with_meta = read_hudi_table(spark, t, keep_meta=True)
    assert with_meta.filter("_hoodie_commit_time = '003'").count() == 0
    # completing the instant makes the leftover visible (zeroed slice
    # shadows the 002 rewrite for partition 0)
    open(os.path.join(t, ".hoodie", "003.commit"), "w").write("{}")
    now = read_hudi_table(spark, t, keep_meta=True)
    assert now.filter("_hoodie_commit_time = '003'").count() > 0


def test_meta_columns_and_timeline_info(spark, hudi_table):
    t, _ = hudi_table
    assert read_hudi_table(spark, t).columns == ["k", "part", "value"]
    info = timeline_info(t)
    assert info["n_commits"] == 2 and info["latest_instant"] == "002"
    assert info["n_live_slices"] == 3
    # completion-time commit naming (Hudi 1.x) also parses
    os.rename(
        os.path.join(t, ".hoodie", "002.commit"),
        os.path.join(t, ".hoodie", "002_20240101000000.commit"),
    )
    assert timeline_info(t)["latest_instant"] == "002"


def test_unsupported_log_block_types_refused(spark, hudi_table):
    """MoR logs ARE read now; the capability gate moved down a level —
    block types beyond avro-data/rollback-command (hfile, parquet,
    kryo delete blocks) must raise at PLANNING time."""
    from datalake_polygonscan_spark.io.hudi_log import write_log_block

    t, _ = hudi_table
    log = os.path.join(t, "part=0", ".somefile_001.log.1_0-1-0")
    open(log, "wb").write(write_log_block(4, {0: "001"}, b""))  # hfile
    with pytest.raises(HudiProtocolError, match="unsupported log block type"):
        read_hudi_table(spark, t)


def test_hoodie_metadata_table_does_not_trip_mor_gate(spark, hudi_table):
    """ADVICE r8: .hoodie/metadata (Hudi's internal metadata table,
    default-enabled) is itself MoR with .log files — it must be pruned
    from the gate walk, not flag the DATA table as MoR."""
    t, df = hudi_table
    mdt = os.path.join(t, ".hoodie", "metadata", "files")
    os.makedirs(mdt)
    open(os.path.join(mdt, ".files-0000_00000000000000.log.1_0-0-0"), "w").write("")
    assert read_hudi_table(spark, t).count() == df.count()


def test_mixed_width_instants_order_numerically(spark, tmp_path):
    """ADVICE r8: 14-digit (second) and 17-digit (ms) instants coexist
    across Hudi versions; lexicographic compare would order
    '20240101000000000' (17-digit, older day) vs '9999...' wrongly.
    Both slice resolution and as_of must compare numerically."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "mixed")
    hdir = os.path.join(t, ".hoodie")
    os.makedirs(hdir)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.type=COPY_ON_WRITE\n")
    pdir = os.path.join(t, "part=0")
    os.makedirs(pdir)
    fid = "00000000-0000-0000-0000-000000000001-0"
    # 14-digit instant 20240102000000 is NUMERICALLY SMALLER than the
    # 17-digit 20240101000000999 (an earlier wall-clock day at ms
    # precision) — numeric order must pick the 17-digit slice as latest
    old14, new17 = "20240102000000", "20240101000000999"
    for instant, val in ((old14, 1.0), (new17, 2.0)):
        pq.write_table(
            pa.table({"k": [1], "value": [val]}),
            os.path.join(pdir, f"{fid}_0-1-0_{instant}.parquet"))
        _json.dump({}, open(os.path.join(hdir, f"{instant}.commit"), "w"))
    live = read_hudi_table(spark, t).collect()
    assert [r.value for r in live] == [2.0]
    asof = read_hudi_table(spark, t, as_of=old14).collect()
    assert [r.value for r in asof] == [1.0]
    assert timeline_info(t)["latest_instant"] == new17


# ---------------------------------------------------------------------------
# Merge-on-Read (round 9)
# ---------------------------------------------------------------------------


@pytest.fixture()
def mor_table(spark, tmp_path):
    from datalake_polygonscan_spark.io.hudi_reader import (
        write_foreign_hudi_mor_fixture,
    )

    df = spark.range(60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS value"
    )
    t = str(tmp_path / "mortab")
    info = write_foreign_hudi_mor_fixture(spark, df, t, "part", "k")
    return t, df, info


def test_mor_merge_updates_inserts_deletes(spark, mor_table):
    """Live snapshot: updates win over base, inserts appear (both in
    an existing group and a LOG-ONLY group), _hoodie_is_deleted rows
    drop, and the never-completed 004 junk block stays invisible."""
    t, df, info = mor_table
    live = read_hudi_table(spark, t)
    rows = {r.k: r.value for r in live.collect()}
    # partition 0 = k%3==0; updates k%4==0 -> *3; deletes k%6==0
    for k in range(60):
        if k % 3 == 0:
            if k % 6 == 0:
                assert k not in rows          # deleted at 003
            elif k % 4 == 0:
                assert rows[k] == 3.0 * k     # updated at 002
            else:
                assert rows[k] == float(k)    # untouched in-group
        else:
            assert rows[k] == float(k)        # untouched groups bypass
    assert rows[9001] == 42.0                 # insert into existing group
    for k in range(9100, 9105):
        assert rows[k] == float(k)            # log-only group insert
    # junk 004 values (zeroed) leaked nowhere
    assert 0.0 not in [v for k, v in rows.items() if k != 0]


def test_mor_time_travel(spark, mor_table):
    t, df, info = mor_table
    # as_of 002: updates + inserts applied, deletes (003) not yet
    v2 = {r.k: r.value for r in read_hudi_table(spark, t, as_of="002").collect()}
    assert v2[12] == 36.0          # k%4==0 update applied
    assert v2[6] == 6.0            # k%6==0 delete NOT yet applied
    assert v2[9001] == 42.0 and len(v2) == 60 + 1 + 5
    # as_of 001: pristine base
    v1 = {r.k: r.value for r in read_hudi_table(spark, t, as_of="001").collect()}
    assert len(v1) == 60 and all(v1[k] == float(k) for k in range(60))
    assert 9001 not in v1


def test_mor_untouched_groups_bypass_merge_shuffle(spark, mor_table):
    """Plan shape: groups without logs must not enter the window —
    the merged branch unions a plain scan of untouched base files."""
    t, _, info = mor_table
    live = read_hudi_table(spark, t)
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "Union" in plan
    n = live.count()
    assert n == 60 - 10 + 1 + 5  # 60 rows - deleted k%6==0 (10) + 9001 + 5 log-only


def test_mor_rollback_block_invalidates_target(spark, tmp_path):
    """Unit: a rollback command block hides earlier blocks of its
    target instant even when that instant shows completed."""
    from datalake_polygonscan_spark.io.hudi_log import (
        read_log_records,
        write_avro_data_block,
        write_rollback_block,
    )

    schema = ('{"type":"record","name":"r","fields":['
              '{"name":"k","type":"long"},{"name":"v","type":"double"}]}')
    data = (
        write_avro_data_block("002", schema, [{"k": 1, "v": 1.0}])
        + write_avro_data_block("003", schema, [{"k": 1, "v": 99.0}])
        + write_rollback_block("004", "003")
    )
    recs = read_log_records(data, {"002", "003", "004"})
    assert [(i, r["v"]) for i, _b, _r, r in recs] == [("002", 1.0)]


def test_mor_timeline_info_counts_logs(mor_table):
    t, _, _ = mor_table
    info = timeline_info(t)
    assert info["n_commits"] == 3  # 001 commit + 002/003 deltacommits
    assert info["n_log_files"] == 2
    assert info["n_live_slices"] == 4  # 3 base groups + 1 log-only


def test_pending_compaction_logs_merge_onto_completed_base(spark, mor_table):
    """ADVICE r9: logs whose filename base-instant points at a
    PENDING (inflight) compaction — newer than the group's latest
    COMPLETED base instant — must merge onto the completed base, not
    silently vanish from the snapshot."""
    import uuid as _uuid

    from datalake_polygonscan_spark.io.avro import schema_to_avro_json
    from datalake_polygonscan_spark.io.hudi_log import write_avro_data_block
    from datalake_polygonscan_spark.io.hudi_reader import read_hudi_table

    t, df, info = mor_table
    pv0 = info["updated_partition"]
    fid0 = f"{_uuid.UUID(int=1)}-0"
    hdir = os.path.join(t, ".hoodie")

    before = {r.k: r.value for r in read_hudi_table(spark, t).collect()}
    # a compaction was SCHEDULED at instant 005 (never completed); the
    # next deltacommit (006, completed) wrote its log against base 005
    open(os.path.join(hdir, "005.commit.inflight"), "w").write("")
    full_schema = (
        df.selectExpr("k", "part", "value")
        .withColumn("_hoodie_commit_time", F.lit("006"))
        .withColumn("_hoodie_record_key", F.col("k").cast("string"))
        .withColumn("_hoodie_partition_path", F.concat(F.lit("part="), F.col("part")))
        .withColumn("_hoodie_is_deleted", F.lit(False))
    )
    schema_json = schema_to_avro_json(full_schema.schema)
    # update k=3 (lives in partition 0, untouched by fixture logs)
    row = [r.asDict() for r in full_schema.filter("k = 3")
           .withColumn("value", F.lit(777.0)).collect()]
    log = os.path.join(t, f"part={pv0}", f".{fid0}_005.log.1_0-1-0")
    open(log, "wb").write(write_avro_data_block("006", schema_json, row))
    json.dump({"operationType": "UPSERT"},
              open(os.path.join(hdir, "006.deltacommit"), "w"))

    after = {r.k: r.value for r in read_hudi_table(spark, t).collect()}
    assert after[3] == 777.0          # the pending-compaction log applied
    assert after.keys() == before.keys()
    assert {k: v for k, v in after.items() if k != 3} == {
        k: v for k, v in before.items() if k != 3}
