"""TableIO — snapshot-versioned tables with an atomic manifest.

The design target is Iceberg (snapshot isolation, fast appends, MERGE,
rollback): no Iceberg runtime jar exists in this sandbox (and no ivy cache to
resolve one), so TableIO provides the same narrow contract the engine needs
over plain parquet data directories plus a JSON manifest — the same shape as
Iceberg's metadata tree (manifest → data files), one level shallower. On a
cluster with iceberg-spark-runtime on the classpath the call sites map 1:1
onto Iceberg tables; this fallback keeps every test green offline.

Scalability contract (this is what makes the crawl loop viable at 10^10 rows):
- ``append`` writes ONLY the new rows as a new immutable data dir and records
  a new snapshot = old dirs + new dir. O(new data), never O(table).
- ``overwrite`` writes a new dir and a snapshot containing only it (used for
  the compact ``frontier_pending`` queue, whose size is O(live work), not
  O(history)).
- a snapshot is an immutable list of data dirs → time-travel reads and
  rollback are O(1) manifest operations.

Layout::

    root/
      _manifest.json                 # tables: {name: {current, snapshots, schema}}
      _checkpoints/ckpt-<label>.json # frozen manifests (resume points)
      <table>/data-<n>/*.parquet     # immutable data dirs

Commit protocol: write data dirs first, then atomically replace the manifest
(tmp + rename). A crash mid-commit leaves orphan dirs never referenced by any
manifest — resume reads the last checkpoint, giving the "killed job resumes
with identical crawl ordering and URL-seen contents" guarantee (the reference
itself has NO persistence — in-memory state dies with the process
— checkpoint/resume is a north_rule addition).
"""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession

try:  # orjson when present: ~20x faster full-manifest serialization —
    # the manifest (every table's snapshot history) is re-dumped on every
    # commit flush and checkpoint, ~20 ms/dump via stdlib at crawl scale.
    # Output stays plain JSON (sorted keys, int keys coerced to strings —
    # the same coercions stdlib json.dump applies); readers keep json.load.
    import orjson as _orjson

    _ORJSON_OPTS = _orjson.OPT_SORT_KEYS | _orjson.OPT_NON_STR_KEYS

    def _json_dumps_sorted(obj) -> bytes:
        return _orjson.dumps(obj, option=_ORJSON_OPTS)

except ImportError:  # pragma: no cover - sandbox always has orjson

    def _json_dumps_sorted(obj) -> bytes:
        return json.dumps(obj, sort_keys=True).encode()
from pyspark.sql import types as T


class TableIO:
    """Thread-safe: commits from concurrent writer threads serialize on a
    manifest lock (the engine issues independent table writes in parallel —
    each is its own Spark job)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._lock = threading.RLock()
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "_checkpoints"), exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")
        self._manifest = self._load_manifest()
        self._defer_manifest = False
        self._manifest_dirty = False

    # ---------- manifest ----------

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"tables": {}, "state": {}}

    def _write_manifest(self) -> None:
        # deferred mode (driver-local iterations): the recovery point is the
        # end-of-iteration CHECKPOINT — resume rolls back to the last
        # complete checkpoint regardless of which intra-iteration manifest
        # states hit disk — so persisting the manifest once per batch is
        # crash-equivalent to persisting it per commit. The serialization
        # itself is the cost being amortized: each dump is the FULL manifest
        # (every table's snapshot history), measured ~33 ms × 8 commits per
        # thin local iteration.
        if self._defer_manifest:
            self._manifest_dirty = True
            return
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_json_dumps_sorted(self._manifest))
        os.replace(tmp, self._manifest_path)

    def deferred_manifest(self):
        """Context manager: batch manifest persistence across the enclosed
        commits (one disk write at exit instead of one per commit)."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            with self._lock:
                already = self._defer_manifest
                self._defer_manifest = True
            try:
                yield self
            finally:
                with self._lock:
                    if not already:
                        self._defer_manifest = False
                        if self._manifest_dirty:
                            self._manifest_dirty = False
                            self._write_manifest()

        return _cm()

    @property
    def state(self) -> dict:
        return self._manifest["state"]

    def set_state(self, **kv) -> None:
        # under the manifest lock: the engine's deferred commit writers
        # (plans/engine.py) run _commit concurrently with the main thread's
        # set_state — unlocked, both would race _write_manifest's
        # tmp-then-rename (the second os.replace finds the tmp gone) and
        # json.dump could iterate a dict mid-mutation
        with self._lock:
            self._manifest["state"].update(kv)
            self._write_manifest()

    def _tbl(self, name: str) -> dict:
        return self._manifest["tables"].setdefault(
            name, {"current": 0, "next_dir": 0, "snapshots": {}, "schema": None}
        )

    # ---------- snapshots ----------

    def exists(self, name: str) -> bool:
        t = self._manifest["tables"].get(name)
        return bool(t and t["current"] > 0)

    def snapshot_id(self, name: str) -> int:
        return self._manifest["tables"].get(name, {}).get("current", 0)

    def schema(self, name: str) -> T.StructType:
        return T.StructType.fromJson(self._tbl(name)["schema"])

    def read(self, name: str, snapshot: int | None = None) -> DataFrame:
        t = self._tbl(name)
        snap = t["current"] if snapshot is None else snapshot
        dirs = t["snapshots"].get(str(snap))
        if dirs is None:
            raise KeyError(f"table {name!r} snapshot {snap} does not exist")
        if isinstance(dirs, dict):  # partitioned table → full read
            if snapshot is not None and snapshot != t["current"]:
                raise KeyError(f"partitioned time-travel not supported: {name}")
            return self.read_partitions(name)
        schema = T.StructType.fromJson(t["schema"])
        if not dirs:
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, name, d) for d in dirs]
        return self.spark.read.schema(schema).parquet(*paths)

    def read_last_append(self, name: str) -> DataFrame:
        """Only the rows added by the most recent append/overwrite of the
        current snapshot — O(1 data dir), used for 'latest iteration' reads."""
        t = self._tbl(name)
        dirs = t["snapshots"].get(str(t["current"]))
        if not dirs:
            return self.spark.createDataFrame(
                [], T.StructType.fromJson(t["schema"])
            )
        schema = T.StructType.fromJson(t["schema"])
        return self.spark.read.schema(schema).parquet(
            os.path.join(self.root, name, dirs[-1])
        )

    def _write_dir(self, name: str, df: DataFrame) -> str:
        with self._lock:
            t = self._tbl(name)
            d = f"data-{t['next_dir']:06d}"
            t["next_dir"] += 1
        df.write.mode("overwrite").parquet(os.path.join(self.root, name, d))
        return d

    def _commit(self, name: str, dirs: list[str], schema: T.StructType) -> int:
        with self._lock:
            t = self._tbl(name)
            t["current"] += 1
            t["snapshots"][str(t["current"])] = dirs
            if t["schema"] is None:
                t["schema"] = schema.jsonValue()
            self._write_manifest()
            return t["current"]

    # ---------- operations ----------

    def overwrite(self, name: str, df: DataFrame) -> int:
        d = self._write_dir(name, df)
        return self._commit(name, [d], df.schema)

    def append(self, name: str, df: DataFrame) -> int:
        """O(new rows): writes only the appended data, extends the snapshot."""
        d = self._write_dir(name, df)
        with self._lock:
            t = self._tbl(name)
            cur = list(t["snapshots"].get(str(t["current"]), []))
            return self._commit(name, cur + [d], df.schema)

    # ---------- partitioned tables ----------
    #
    # Partition-level commits are what make the per-iteration state writes
    # O(touched work) instead of O(table): the manifest maps every partition
    # value to the data dirs holding its rows, so an overwrite of K touched
    # partitions leaves the other partitions' dir pointers untouched (the
    # Iceberg analogue is dynamic-partition-overwrite / bucket partitioning).
    # Physically each write is df.write.partitionBy(dup-col) — one subdir per
    # value — and the partition column itself stays in the data files (it is
    # duplicated into `_pc` for the directory layout), so reads never depend
    # on directory-name parsing.

    def _write_part_dir(self, name: str, df: DataFrame, part_col: str,
                        n_files: int | None = None):
        """Write df partitioned by part_col; returns (data_dir, {value: relpath}).

        One file per touched value either way. Default: repartition by the
        partition column at the session shuffle parallelism (the big-data
        layout). ``n_files``: hash the partition column into that many write
        tasks instead — a bounded-parallelism shuffle of a SMALL commit.
        (An earlier coalesce(n_files) variant skipped this tiny shuffle but
        let every task write every subdir it saw — a fat iteration then
        committed n_files x n_values files, ~4k tiny parquet footers for
        job_state alone, and the write + every downstream partition read
        paid per-file overhead; profiled at 7s per deferred writer at 4N.)"""
        from pyspark.sql import functions as F
        with self._lock:
            t = self._tbl(name)
            d = f"data-{t['next_dir']:06d}"
            t["next_dir"] += 1
        path = os.path.join(self.root, name, d)
        out = df.withColumn("_pc", F.col(part_col))
        out = (
            out.repartition(n_files, F.col("_pc")) if n_files
            else out.repartition(F.col("_pc"))
        )
        out.write.mode("overwrite").partitionBy("_pc").parquet(path)
        written = {}
        for sub in os.listdir(path):
            if sub.startswith("_pc="):
                written[sub[len("_pc="):]] = f"{d}/{sub}"
        return d, written

    def overwrite_partitions_local(
        self, name: str, rows_by_value: dict, arrow_schema, spark_schema: T.StructType
    ) -> int:
        """Driver-side partition overwrite: writes each touched partition's
        rows directly with pyarrow (no Spark job, no LocalRelation transfer —
        the low-latency path for small driver-resident states like Bloom
        shard bitsets). ``rows_by_value``: {partition_value: list[dict]}."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            t = self._tbl(name)
            d = f"data-{t['next_dir']:06d}"
            t["next_dir"] += 1

        items = list(rows_by_value.items())
        # from_pylist + tiny-file metadata are GIL-bound: serial writes beat
        # the 16-thread pool below tens of MB (measured 38 ms serial vs
        # 83 ms pooled for 64 x 128 KiB Bloom blobs on tmpfs); estimate the
        # payload from binary/string field sizes to pick the strategy
        est = 0
        for _, rows in items:
            for r in rows:
                for x in r.values():
                    est += len(x) if isinstance(x, (bytes, str)) else 8
        small = est < (32 << 20)
        kw = (
            # statistics/dictionary off (no reader consumes per-file stats;
            # pruning is directory-level via the manifest), compression off
            # (codec setup dominates at tiny-file sizes; Bloom bitsets are
            # incompressible anyway), arrow-schema blob off (the parquet
            # schema reconstructs these simple types exactly — verified for
            # int/str/binary/timestamp) — measured 0.20 -> 0.11 ms/file
            {"write_statistics": False, "use_dictionary": False,
             "compression": "none", "store_schema": False}
            if small
            else {}
        )

        def write_one(item):
            v, rows = item
            sub = os.path.join(self.root, name, d, f"_pc={v}")
            os.makedirs(sub, exist_ok=True)
            pq.write_table(
                pa.Table.from_pylist(rows, schema=arrow_schema),
                os.path.join(sub, "part-00000.parquet"),
                **kw,
            )
            return str(v), f"{d}/_pc={v}"

        if len(items) > 4 and not small:
            written = dict(self._io_pool.map(write_one, items))
        else:
            written = dict(map(write_one, items))
        with self._lock:
            parts = dict(self._parts(name))
            for v, rel in written.items():
                parts[v] = [rel]
            return self._commit_parts(name, parts, spark_schema)

    def _parts(self, name: str) -> dict:
        t = self._tbl(name)
        snap = t["snapshots"].get(str(t["current"]))
        if snap is None:
            return {}
        if not isinstance(snap, dict):
            raise TypeError(f"table {name!r} is not partitioned")
        return snap

    def overwrite_partitions(self, name: str, df: DataFrame, part_col: str,
                             n_files: int | None = None) -> int:
        """Overwrite ONLY the partitions present in df; every other
        partition keeps its current dir list. O(touched partitions)."""
        _, written = self._write_part_dir(name, df, part_col, n_files)
        with self._lock:
            parts = dict(self._parts(name))
            for v, rel in written.items():
                parts[v] = [rel]
            return self._commit_parts(name, parts, df.schema)

    def append_partitions(self, name: str, df: DataFrame, part_col: str,
                          n_files: int | None = None) -> int:
        """Append df's rows, extending each touched partition's dir list."""
        _, written = self._write_part_dir(name, df, part_col, n_files)
        with self._lock:
            parts = {k: list(v) for k, v in self._parts(name).items()}
            for v, rel in written.items():
                parts.setdefault(v, []).append(rel)
            return self._commit_parts(name, parts, df.schema)

    def _commit_parts(self, name: str, parts: dict, schema: T.StructType) -> int:
        with self._lock:
            t = self._tbl(name)
            t["current"] += 1
            t["snapshots"][str(t["current"])] = parts
            if t["schema"] is None:
                t["schema"] = schema.jsonValue()
            self._write_manifest()
            return t["current"]

    def read_partitions(self, name: str, values=None) -> DataFrame:
        """Read a partitioned table, pruned to ``values`` (None = all).
        Reads exactly the selected partitions' files — an O(selected) scan."""
        t = self._tbl(name)
        schema = T.StructType.fromJson(t["schema"])
        parts = self._parts(name)
        if values is not None:
            want = {str(v) for v in values}
            parts = {k: v for k, v in parts.items() if k in want}
        paths = [
            os.path.join(self.root, name, rel)
            for rels in parts.values()
            for rel in rels
        ]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def partition_paths(self, name: str, values=None) -> list[str]:
        """Absolute file-system dirs backing the selected partitions (for
        driver-side reads and scan-volume accounting)."""
        parts = self._parts(name)
        if values is not None:
            want = {str(v) for v in values}
            parts = {k: v for k, v in parts.items() if k in want}
        return [
            os.path.join(self.root, name, rel)
            for rels in parts.values()
            for rel in rels
        ]

    # ---------- driver-local IO (the thin-iteration fast path) ----------
    #
    # A crawl's tail iterations are a few hundred rows: paying multi-stage
    # Spark job latency for them dominates wall time (the same is true on a
    # 1000-executor cluster — tail/thin micro-batches are a known launch-
    # overhead pathology). These helpers read/write the SAME table layout
    # with pyarrow directly on the driver, so a thin iteration costs
    # milliseconds. The files they write are indistinguishable from Spark's
    # (same dirs, same manifest commits, schema derived from the same
    # StructType), so Spark and local iterations interleave freely.

    @staticmethod
    def _arrow_schema(spark_schema: T.StructType):
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(spark_schema)

    @property
    def _io_pool(self):
        """Shared thread pool for driver-local parquet IO: creating a fresh
        ThreadPoolExecutor per read/write spawned 500+ threads per crawl
        (profiled ~1s of pure thread start/teardown)."""
        pool = getattr(self, "_io_pool_obj", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = self._io_pool_obj = ThreadPoolExecutor(max_workers=16)
        return pool

    def _read_file_tbl(self, path: str):
        """One parquet file → Arrow table, via an immutable-file cache (data
        dirs are never rewritten in place — append/overwrite always create
        new dirs — so a path's content is stable for the table's lifetime).
        The driver-local writers seed this cache with the exact table they
        wrote (_seed_pdf_cache), so a write-then-read within one process
        never pays the parquet decode."""
        import pyarrow.parquet as pq

        cache = getattr(self, "_local_tbl_cache", None)
        if cache is None:
            cache = self._local_tbl_cache = {}
        hit = cache.get(path)
        if hit is not None:
            return hit
        tbl = pq.read_table(path)
        if len(cache) > 8192:  # bound driver memory on very long crawls
            cache.clear()
        cache[path] = tbl
        return tbl

    def _seed_pdf_cache(self, path: str, arrow_tbl) -> None:
        """Record the Arrow table a just-written parquet file decodes to.
        ``arrow_tbl`` is the exact Table written, so its ``to_pandas()``
        equals what ``pq.read_table(path).to_pandas()`` would return (same
        schema, same data) — a later in-process read skips the parquet
        decode entirely."""
        cache = getattr(self, "_local_tbl_cache", None)
        if cache is None:
            cache = self._local_tbl_cache = {}
        if len(cache) > 8192:
            cache.clear()
        cache[path] = arrow_tbl

    def _read_paths_local(self, paths: list[str], columns=None):
        """Concatenated pandas frame of the parquet files under ``paths``.

        Reads run on the shared pool in file order (pyarrow releases the
        GIL), and concatenation happens at the ARROW level — one
        ``to_pandas`` over the combined table instead of a pandas concat of
        100+ tiny frames (whose per-element NA-validation dominated tail
        iterations)."""
        import pyarrow as pa

        files = []
        for d in paths:
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    files.append(os.path.join(d, f))
        if not files:
            return None
        if len(files) > 4:
            tbls = list(self._io_pool.map(self._read_file_tbl, files))
        else:
            tbls = [self._read_file_tbl(p) for p in files]
        if columns:
            tbls = [t.select(list(columns)) for t in tbls]
        if len(tbls) == 1:
            return tbls[0].to_pandas()
        try:
            return pa.concat_tables(tbls).to_pandas()
        except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError):
            # mixed writers (Spark vs pyarrow) can disagree on field
            # nullability/metadata — normalize to the first schema
            schema = tbls[0].schema
            return pa.concat_tables(
                [t if t.schema == schema else t.cast(schema) for t in tbls]
            ).to_pandas()

    def _read_paths_tables(self, paths: list[str], columns=None) -> list:
        """Arrow tables of the parquet files under ``paths`` WITHOUT the
        pandas conversion — for consumers that only need column value
        lists (e.g. the url_seen membership sets): the per-tiny-file
        DataFrame construction was ~1.4 ms × hundreds of incremental
        shard files per crawl, all block-manager overhead."""
        files = []
        for d in paths:
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    files.append(os.path.join(d, f))
        if not files:
            return []
        if len(files) > 4:
            tbls = list(self._io_pool.map(self._read_file_tbl, files))
        else:
            tbls = [self._read_file_tbl(p) for p in files]
        if columns:
            tbls = [t.select(list(columns)) for t in tbls]
        return tbls

    def _empty_pdf(self, name: str, columns=None):
        import pandas as pd

        schema = T.StructType.fromJson(self._tbl(name)["schema"])
        cols = columns or [f.name for f in schema.fields]
        return pd.DataFrame(columns=cols)

    def read_local(self, name: str, columns=None):
        """Driver-side pandas read of an unpartitioned table (all dirs)."""
        t = self._tbl(name)
        dirs = t["snapshots"].get(str(t["current"]), [])
        pdf = self._read_paths_local(
            [os.path.join(self.root, name, d) for d in dirs], columns
        )
        return self._empty_pdf(name, columns) if pdf is None else pdf

    def read_last_append_local(self, name: str, columns=None):
        t = self._tbl(name)
        dirs = t["snapshots"].get(str(t["current"]), [])
        pdf = self._read_paths_local(
            [os.path.join(self.root, name, dirs[-1])] if dirs else [], columns
        )
        return self._empty_pdf(name, columns) if pdf is None else pdf

    def read_partitions_local(self, name: str, values=None, columns=None):
        pdf = self._read_paths_local(self.partition_paths(name, values), columns)
        return self._empty_pdf(name, columns) if pdf is None else pdf

    def _write_pdf_dir(self, name: str, pdf, spark_schema: T.StructType,
                       n_files: int = 1) -> str:
        """``n_files > 1`` splits the frame into that many row-sliced files
        (written concurrently — pyarrow releases the GIL): a fat driver-local
        commit read back by a DISTRIBUTED iteration then scans in parallel
        instead of starting from one single-file partition."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            t = self._tbl(name)
            d = f"data-{t['next_dir']:06d}"
            t["next_dir"] += 1
        path = os.path.join(self.root, name, d)
        os.makedirs(path, exist_ok=True)
        arrow = self._arrow_schema(spark_schema)
        tbl = pa.Table.from_pandas(
            pdf[[f.name for f in spark_schema.fields]],
            schema=arrow,
            preserve_index=False,
        )
        k = max(1, min(int(n_files), max(1, tbl.num_rows)))
        if k == 1:
            fp = os.path.join(path, "part-00000.parquet")
            pq.write_table(tbl, fp)
            self._seed_pdf_cache(fp, tbl)
            return d
        step = -(-tbl.num_rows // k)

        def write_one(i):
            fp = os.path.join(path, f"part-{i:05d}.parquet")
            sl = tbl.slice(i * step, step)
            pq.write_table(sl, fp)
            self._seed_pdf_cache(fp, sl)

        list(self._io_pool.map(write_one, range(k)))
        return d

    def append_pdf(self, name: str, pdf, spark_schema: T.StructType,
                   n_files: int = 1) -> int:
        """Driver-side twin of ``append`` (no Spark job)."""
        d = self._write_pdf_dir(name, pdf, spark_schema, n_files)
        with self._lock:
            t = self._tbl(name)
            cur = list(t["snapshots"].get(str(t["current"]), []))
            return self._commit(name, cur + [d], spark_schema)

    def overwrite_pdf(self, name: str, pdf, spark_schema: T.StructType,
                      n_files: int = 1) -> int:
        d = self._write_pdf_dir(name, pdf, spark_schema, n_files)
        return self._commit(name, [d], spark_schema)

    def _write_partitions_pdf(
        self, name: str, pdf, part_col: str, spark_schema: T.StructType
    ) -> dict:
        """Write one parquet file per touched partition value (threaded —
        pyarrow releases the GIL on IO, and tail iterations touch many tiny
        partitions)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            t = self._tbl(name)
            d = f"data-{t['next_dir']:06d}"
            t["next_dir"] += 1
        arrow = self._arrow_schema(spark_schema)
        cols = [f.name for f in spark_schema.fields]
        if not len(pdf):
            return {}
        # ONE pandas→arrow conversion, zero-copy per-partition slices: the
        # per-group from_pandas calls held the GIL and dominated tail-
        # iteration commits (100+ tiny partitions); only the writes (which
        # release the GIL) need to run per partition
        import numpy as np

        sdf = pdf.sort_values(part_col, kind="mergesort")
        tbl = pa.Table.from_pandas(sdf[cols], schema=arrow,
                                   preserve_index=False)
        keys = sdf[part_col].to_numpy()
        values, starts = np.unique(keys, return_index=True)
        bounds = list(starts) + [len(keys)]
        groups = [
            (values[i], tbl.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(len(values))
        ]

        # small-batch commits write SERIALLY with statistics/dictionary
        # encoding off: per-file metadata work is GIL-bound python/C
        # transitions, so 100+ tiny files through the 16-thread pool run
        # 2x SLOWER than one thread (measured 81 ms pooled vs 41 ms serial
        # vs 18 ms serial+tuned for job_state's 128 ~10-row buckets on
        # tmpfs); no reader consumes per-file statistics (pruning here is
        # directory-level via the manifest). Big batches keep the pool —
        # bulk encode/compress releases the GIL, which is also the regime
        # a real (non-tmpfs) filesystem benefits from.
        small = tbl.nbytes < (32 << 20)
        kw = (
            # statistics/dictionary off (no reader consumes per-file stats;
            # pruning is directory-level via the manifest), compression off
            # (codec setup dominates at tiny-file sizes; Bloom bitsets are
            # incompressible anyway), arrow-schema blob off (the parquet
            # schema reconstructs these simple types exactly — verified for
            # int/str/binary/timestamp) — measured 0.20 -> 0.11 ms/file
            {"write_statistics": False, "use_dictionary": False,
             "compression": "none", "store_schema": False}
            if small
            else {}
        )

        def write_one(item):
            v, slice_tbl = item
            sub = os.path.join(self.root, name, d, f"_pc={v}")
            os.makedirs(sub, exist_ok=True)
            fp = os.path.join(sub, "part-00000.parquet")
            pq.write_table(slice_tbl, fp, **kw)
            self._seed_pdf_cache(fp, slice_tbl)
            return str(v), f"{d}/_pc={v}"

        if len(groups) > 4 and not small:
            written = dict(self._io_pool.map(write_one, groups))
        else:
            written = dict(map(write_one, groups))
        return written

    def append_partitions_pdf(
        self, name: str, pdf, part_col: str, spark_schema: T.StructType
    ) -> int:
        """Driver-side twin of ``append_partitions``: one file per touched
        partition value, other partitions' dir lists untouched."""
        written = self._write_partitions_pdf(name, pdf, part_col, spark_schema)
        with self._lock:
            parts = {k: list(vv) for k, vv in self._parts(name).items()}
            for v, rel in written.items():
                parts.setdefault(v, []).append(rel)
            return self._commit_parts(name, parts, spark_schema)

    def overwrite_partitions_pdf(
        self, name: str, pdf, part_col: str, spark_schema: T.StructType
    ) -> int:
        """Driver-side twin of ``overwrite_partitions``."""
        written = self._write_partitions_pdf(name, pdf, part_col, spark_schema)
        with self._lock:
            parts = dict(self._parts(name))
            for v, rel in written.items():
                parts[v] = [rel]
            return self._commit_parts(name, parts, spark_schema)

    # ---------- compaction ----------
    #
    # Append-only tables gain one file per touching iteration, forever; at
    # 10^5 iterations the per-file open cost becomes the scan cost. These
    # rewrite fragmented partitions/dir-lists into single files when their
    # file count exceeds a threshold (the Iceberg analogue is
    # rewrite_data_files / bin-packing). Old data dirs are NOT deleted —
    # prior snapshots and checkpoints keep referencing them (snapshot GC is
    # a separate lifecycle concern, like Iceberg's expire_snapshots), so a
    # crash mid-compaction or a rollback is still safe. Rows are rewritten
    # in read order, so reads return the identical row sequence.

    def _compact_rels_to_dir(self, name: str, rels: list[str]):
        """Concatenate the parquet files under ``rels`` (in order) into one
        file in a fresh data dir; returns (new_rel, n_rows)."""
        import pyarrow.parquet as pq
        import pyarrow as pa

        with self._lock:
            t = self._tbl(name)
            d = f"data-{t['next_dir']:06d}"
            t["next_dir"] += 1
        files = []
        for rel in rels:
            p = os.path.join(self.root, name, rel)
            if not os.path.isdir(p):
                continue
            files.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        # normalize to the table's declared arrow schema before concat:
        # Spark-written and pyarrow-written files carry different
        # field/file metadata that concat_tables would reject
        arrow = self._arrow_schema(
            T.StructType.fromJson(self._tbl(name)["schema"])
        )
        cols = [f.name for f in arrow]
        tbl = pa.concat_tables(
            [pq.read_table(f).select(cols).cast(arrow) for f in files]
        )
        path = os.path.join(self.root, name, d)
        os.makedirs(path, exist_ok=True)
        pq.write_table(tbl, os.path.join(path, "part-00000.parquet"))
        return d, tbl.num_rows

    def _compacted_set(self, name: str) -> set:
        """Dir names that are outputs of earlier compactions (the 'big
        generation'). Tiered compaction never re-merges these on every
        trigger — only when the compacted prefix itself exceeds the
        threshold — so total rewrite bytes over a long crawl are
        O(n·log n / k) instead of O(n²/k) (ADVICE r3; the Iceberg analogue
        is bin-pack rewrite skipping already-compacted files)."""
        return set(self._tbl(name).get("compacted", []))

    def _record_compacted(self, name: str, new_dir: str) -> None:
        t = self._tbl(name)
        comp = set(t.get("compacted", []))
        comp.add(new_dir)
        t["compacted"] = sorted(comp)

    @staticmethod
    def _split_prefix(rels: list[str], comp: set) -> tuple[list, list]:
        """(compacted prefix, fresh tail) of an in-read-order rel list."""
        i = 0
        while i < len(rels) and rels[i].split("/", 1)[0] in comp:
            i += 1
        return rels[:i], rels[i:]

    def compact_partitions(self, name: str, max_files: int) -> int | None:
        """Rewrite partitions whose FRESH (not previously compacted) dir
        count exceeds ``max_files`` — the compacted prefix is kept as-is and
        only re-merged when it alone exceeds ``max_files`` (generation-
        tiered, see _compacted_set). Untouched partitions keep their dir
        lists. Returns the new snapshot id, or None if nothing needed
        compacting (decided from the manifest alone — no filesystem calls)."""
        with self._lock:
            comp = self._compacted_set(name)
            todo: dict = {}
            for v, rels in self._parts(name).items():
                prefix, fresh = self._split_prefix(list(rels), comp)
                if len(prefix) > max_files:
                    todo[v] = (prefix + fresh, [])  # merge the whole list
                elif len(fresh) > max_files:
                    todo[v] = (fresh, prefix)  # merge fresh only
        if not todo:
            return None
        written = {}
        for v, (merge_rels, prefix) in todo.items():
            d, _ = self._compact_rels_to_dir(name, merge_rels)
            written[v] = (f"{d}", prefix, merge_rels)
        with self._lock:
            parts = {k: list(vv) for k, vv in self._parts(name).items()}
            for v, (rel, prefix, merge_rels) in written.items():
                # the partition may have gained appends while we rewrote —
                # keep any rels beyond the snapshot we compacted
                tail = parts[v][len(prefix) + len(merge_rels):]
                parts[v] = prefix + [rel] + tail
                self._record_compacted(name, rel)
            return self._commit_parts(
                name, parts, T.StructType.fromJson(self._tbl(name)["schema"])
            )

    def compact_appends(self, name: str, max_dirs: int,
                        keep_last: int = 1) -> int | None:
        """Merge an append table's FRESH (not previously compacted) oldest
        data dirs into one when the total dir count exceeds ``max_dirs``;
        earlier compaction outputs form a prefix that is only re-merged when
        it alone exceeds ``max_dirs`` (generation-tiered, see
        _compacted_set). The most recent ``keep_last`` dirs are never
        merged, preserving read_last_append semantics."""
        with self._lock:
            t = self._tbl(name)
            dirs = list(t["snapshots"].get(str(t["current"]), []))
            comp = self._compacted_set(name)
        if len(dirs) <= max_dirs:
            return None
        head = dirs[: len(dirs) - keep_last] if keep_last else list(dirs)
        prefix, fresh = self._split_prefix(head, comp)
        if len(prefix) > max_dirs:
            to_merge, prefix = prefix + fresh, []
        elif len(fresh) >= 2:
            to_merge = fresh
        else:
            return None
        d, _ = self._compact_rels_to_dir(name, to_merge)
        with self._lock:
            t = self._tbl(name)
            cur = list(t["snapshots"].get(str(t["current"]), []))
            tail = cur[len(head):]  # appends that landed meanwhile + kept
            self._record_compacted(name, d)
            return self._commit(
                name, prefix + [d] + tail,
                T.StructType.fromJson(t["schema"]),
            )

    def merge_insert_new(self, name: str, df: DataFrame, key: str | list[str]) -> int:
        """MERGE ... WHEN NOT MATCHED THEN INSERT (dedup-set commit;
        reference analogue: HashSetDedup commit, main/src/task_filters.rs:199-211).
        """
        keys = [key] if isinstance(key, str) else list(key)
        if self.exists(name):
            df = df.join(self.read(name).select(*keys), on=keys, how="left_anti")
        return self.append(name, df)

    def rollback(self, name: str, snapshot: int) -> None:
        t = self._tbl(name)
        if str(snapshot) not in t["snapshots"] and snapshot != 0:
            raise KeyError(f"unknown snapshot {snapshot} for {name}")
        t["snapshots"].setdefault("0", [])
        t["current"] = snapshot
        self._write_manifest()

    # ---------- snapshot / checkpoint expiry ----------
    #
    # Every commit adds a snapshot entry holding the table's FULL dir list
    # (or partition map), and every iteration freezes a checkpoint of the
    # whole manifest — without a lifecycle, the manifest grows O(n^2) in
    # commits and is rewritten on every one of them; at 10^5 iterations it
    # is unwritable. These are the Iceberg expire_snapshots /
    # remove_orphan_files analogue: bound retained history, then delete
    # data dirs nothing retained references. Time travel / rollback remain
    # valid within the retention window only.

    def expire_checkpoints(self, keep_last: int) -> list[str]:
        """Delete all but the newest ``keep_last`` checkpoint files
        (labels sort lexicographically = chronologically). Returns the
        deleted paths."""
        cks = self.list_checkpoints()
        drop = cks[:-keep_last] if keep_last else cks
        for p in drop:
            os.remove(p)
        return drop

    def expire_snapshots(self, keep_last: int, gc_files: bool = True) -> dict:
        """Keep each table's newest ``keep_last`` snapshots in the manifest;
        with ``gc_files`` also delete data dirs referenced by neither the
        retained snapshots nor any surviving checkpoint. Must not run
        concurrently with writers (the engine calls it from its
        single-threaded maintenance step). Returns {table: n_expired} plus
        a ``_dirs_removed`` total."""
        dropped: dict = {}
        with self._lock:
            for name, t in self._manifest["tables"].items():
                keep_from = t["current"] - keep_last + 1
                old = [
                    k for k in t["snapshots"]
                    if int(k) < keep_from and int(k) != t["current"]
                ]
                for k in old:
                    del t["snapshots"][k]
                dropped[name] = len(old)
            self._write_manifest()
        if not gc_files:
            return dropped

        referenced: dict[str, set] = {}

        def add_refs(manifest: dict) -> None:
            for name, t in manifest["tables"].items():
                refs = referenced.setdefault(name, set())
                for snap in t["snapshots"].values():
                    rels = (
                        [r for rr in snap.values() for r in rr]
                        if isinstance(snap, dict)
                        else snap
                    )
                    for rel in rels:
                        # partition rels look like "data-000007/_pc=3":
                        # GC operates on whole top-level data dirs
                        refs.add(rel.split("/", 1)[0])

        add_refs(self._manifest)
        for p in self.list_checkpoints():
            with open(p) as f:
                add_refs(json.load(f)["manifest"])
        removed = 0
        for name in self._manifest["tables"]:
            tdir = os.path.join(self.root, name)
            if not os.path.isdir(tdir):
                continue
            refs = referenced.get(name, set())
            for d in os.listdir(tdir):
                if d.startswith("data-") and d not in refs:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
                    removed += 1
        dropped["_dirs_removed"] = removed
        return dropped

    # ---------- checkpoints (atomic multi-table) ----------

    def checkpoint(self, label: str, extra: dict | None = None) -> str:
        with self._lock:  # freeze a consistent manifest snapshot
            # ONE serialization: the dumped string IS the frozen snapshot
            # (the old json.loads(json.dumps(...)) deep copy + re-dump paid
            # two full-manifest serializations per iteration)
            mstr = _json_dumps_sorted(self._manifest)
        path = os.path.join(self.root, "_checkpoints", f"ckpt-{label}.json")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b'{"extra": %s, "manifest": %s}'
                    % (_json_dumps_sorted(extra or {}), mstr))
        os.replace(tmp, path)
        return path

    def list_checkpoints(self) -> list[str]:
        d = os.path.join(self.root, "_checkpoints")
        return sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.endswith(".json")
        )

    def restore(self, checkpoint_path: str) -> dict:
        """Roll every table (and engine state) back to a checkpoint."""
        with open(checkpoint_path) as f:
            ck = json.load(f)
        self._manifest = ck["manifest"]
        self._write_manifest()
        return ck

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def empty_df(spark: SparkSession, schema: T.StructType) -> DataFrame:
    return spark.createDataFrame([], schema)
