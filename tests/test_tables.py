"""Unit tests for the icelite snapshot table layer (tables.py): append/
overwrite snapshots, time travel, state commits, lineage counts, GC."""

import os

from disco_crawl_spark.tables import Catalog


def test_append_overwrite_timetravel(spark, tmp_warehouse):
    t = Catalog(tmp_warehouse).table("t1")
    assert t.read(spark) is None
    sid0, _ = t.append(spark.range(5).selectExpr("id", "id*2 as v"), round_no=0)
    sid1, _ = t.append(spark.range(5, 8).selectExpr("id", "id*2 as v"),
                       round_no=1)
    assert t.read(spark).count() == 8
    # time travel to the first snapshot
    assert t.read(spark, snapshot_id=sid0).count() == 5
    sid2, _ = t.overwrite(spark.range(2).selectExpr("id", "id*2 as v"),
                          round_no=2)
    assert t.read(spark).count() == 2
    assert t.read(spark, snapshot_id=sid1).count() == 8  # history intact
    hist = t.history()
    assert [s["op"] for s in hist] == ["append", "append", "overwrite"]
    # per-file lineage row counts recorded
    assert hist[0]["rows"] == 5 and hist[1]["rows"] == 8


def test_state_commit_and_gc(spark, tmp_warehouse):
    t = Catalog(tmp_warehouse).table("t2")
    t.append(spark.range(3), round_no=0)
    sid, _ = t.append(spark.range(3, 6), round_no=1)
    st = t.commit_state(1, {"round": 1, "cursor": {"a": 2}})
    snap = t.current_snapshot()
    assert snap["op"] == "state" and snap["state"]["cursor"]["a"] == 2
    assert t.read(spark).count() == 6  # state commit keeps data
    # expire everything before the state snapshot: reads still work
    t.expire_before(st)
    assert t.read(spark).count() == 6
    assert all(s["id"] >= st for s in t.history())


def test_atomic_manifest_swap(spark, tmp_warehouse):
    t = Catalog(tmp_warehouse).table("t3")
    t.append(spark.range(4), round_no=0)
    # no temp manifests left behind
    leftovers = [f for f in os.listdir(t.path) if ".tmp." in f]
    assert leftovers == []
