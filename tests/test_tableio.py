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


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b int")


def _files(root, sub):
    import os

    out = {}
    base = os.path.join(root, sub)
    for dirpath, _, names in os.walk(base):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, base)] = (
                    os.path.getmtime(p), os.path.getsize(p)
                )
    return out


def test_overwrite_partitions_touches_only_touched(spark, workdir):
    """Partition-level overwrite: untouched partitions' files stay
    byte-identical (same path, same mtime/size) across a commit."""
    io = TableIO(spark, workdir)
    io.overwrite_partitions(
        "t", _pdf(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 2)]), "b"
    )
    before = _files(workdir, "t")
    io.overwrite_partitions("t", _pdf(spark, [(9, "z", 1)]), "b")
    after = _files(workdir, "t")
    # every file of the first commit still exists unmodified
    for rel, meta in before.items():
        assert after[rel] == meta
    rows = {r.b: (r.k, r.v) for r in io.read_partitions("t").collect()}
    assert rows == {0: (1, "a"), 1: (9, "z"), 2: (3, "c")}
    # pruned read touches only the requested partition
    only1 = io.read_partitions("t", [1]).collect()
    assert [(r.k, r.v, r.b) for r in only1] == [(9, "z", 1)]


def test_append_partitions_accumulates(spark, workdir):
    io = TableIO(spark, workdir)
    io.append_partitions("t", _pdf(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    io.append_partitions("t", _pdf(spark, [(3, "c", 1)]), "b")
    assert sorted(r.k for r in io.read_partitions("t").collect()) == [1, 2, 3]
    assert sorted(r.k for r in io.read_partitions("t", [1]).collect()) == [2, 3]
    # full read via read() delegates for partitioned tables
    assert io.read("t").count() == 3


def test_partitioned_checkpoint_rollback(spark, workdir):
    io = TableIO(spark, workdir)
    io.overwrite_partitions("t", _pdf(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    ck = io.checkpoint("p1")
    io.overwrite_partitions("t", _pdf(spark, [(9, "z", 1)]), "b")
    assert {r.k for r in io.read_partitions("t").collect()} == {1, 9}
    io.restore(ck)
    assert {r.k for r in io.read_partitions("t").collect()} == {1, 2}
