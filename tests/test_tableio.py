"""TableIO snapshot/append/rollback/checkpoint semantics."""

from crusty_core_spark.sources.tables import TableIO


def df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_append_is_incremental_and_snapshotted(spark, workdir):
    io = TableIO(spark, workdir)
    io.overwrite("t", df(spark, [(1, "a")]))
    s2 = io.append("t", df(spark, [(2, "b")]))
    assert sorted(r.k for r in io.read("t").collect()) == [1, 2]
    # time travel to snapshot 1
    assert [r.k for r in io.read("t", snapshot=1).collect()] == [1]
    io.rollback("t", 1)
    assert [r.k for r in io.read("t").collect()] == [1]
    io.rollback("t", s2)
    assert sorted(r.k for r in io.read("t").collect()) == [1, 2]


def test_merge_insert_new(spark, workdir):
    io = TableIO(spark, workdir)
    io.overwrite("t", df(spark, [(1, "a"), (2, "b")]))
    io.merge_insert_new("t", df(spark, [(2, "DUP"), (3, "c")]), key="k")
    rows = {r.k: r.v for r in io.read("t").collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}  # existing key untouched


def test_empty_table_roundtrip(spark, workdir):
    io = TableIO(spark, workdir)
    io.overwrite("t", df(spark, []))
    assert io.read("t").count() == 0
    io.append("t", df(spark, [(5, "x")]))
    assert io.read("t").count() == 1


def test_checkpoint_restore(spark, workdir):
    io = TableIO(spark, workdir)
    io.overwrite("t", df(spark, [(1, "a")]))
    io.set_state(iter=1)
    ck = io.checkpoint("one")
    io.append("t", df(spark, [(2, "b")]))
    io.set_state(iter=2)
    io.checkpoint("two")
    # crash simulation: restore to the first checkpoint
    io2 = TableIO(spark, workdir)
    io2.restore(ck)
    assert [r.k for r in io2.read("t").collect()] == [1]
    assert io2.state["iter"] == 1
