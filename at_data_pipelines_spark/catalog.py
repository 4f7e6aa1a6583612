"""Lakehouse table layer — Spark-native rebuild of the reference's bear-lake
protocol (SURVEY §0, §2.1 S1-S4).

Observable reference API (all call sites under /root/reference):

- ``bl.connect_s3(path, ...) -> Database``      (pipelines/clients/bear_lake.py:25-26)
- ``db.create(name, schema, partition_keys, primary_keys, mode)``
                                                 (pipelines/stock_prices_flow.py:99-115)
- ``db.insert(name, data, mode='append')``       (pipelines/stock_prices_flow.py:118)
- ``db.optimize(name)`` — dedup by primary keys  (pipelines/stock_prices_flow.py:121)
- ``bl.table(name)`` lazy scan → ``db.query(expr)`` collect
                                                 (pipelines/utils/data.py:12-17)

Spark-first restatement:

- A table is a directory of hive-partitioned parquet plus a small JSON
  metadata file (declared schema, partition keys, primary keys, ingest
  sequence, dirty partitions).
- ``insert`` appends parquet files stamped with an ``_seq`` batch column.
- ``optimize`` completes the upsert: keep the latest row per primary key
  (``row_number() OVER (PARTITION BY pk ORDER BY _seq DESC) = 1``), the
  same rewrite Delta's MERGE would do.
- ``table`` returns a plain DataFrame; every downstream op is lazy, so
  Catalyst pushes filters/projections into the scan and prunes hive
  partitions (the reference's partition_keys=['year'] layout).

100 TB scale notes:

- ``optimize`` only rewrites **dirty partitions** (partition values touched
  by inserts since the last optimize), via dynamic partition overwrite —
  compaction cost is proportional to the day's ingest, not table size.
  This mirrors the reference's usage: daily flows insert a single year
  partition, so only that partition pays the dedup shuffle.
- The PK dedup is a hash shuffle on the primary key — at cluster scale the
  natural layout is files bucketed by PK hash; here we rely on AQE to size
  the shuffle.
- No driver-side materialization anywhere; creates write empty dataframes,
  reads use the declared schema (robust to empty tables).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

_META_FILE = "_bl_meta.json"
_SEQ_COL = "_seq"


class _HadoopFS:
    """Filesystem operations through the JVM Hadoop FileSystem API, so the
    lakehouse's metadata reads/writes and partition swaps run against ANY
    Hadoop FS URI (file://, hdfs://, s3a://) — not just the local OS
    filesystem. This is the same FS abstraction Spark's own writers use,
    resolved from the session's hadoopConfiguration (credentials,
    endpoints and committers configured there apply here too).

    Atomicity note: directory rename is atomic on HDFS and the local FS;
    on S3A it is a copy+delete. A production deployment on object storage
    would layer a table format (Delta/Iceberg) or an S3 committer on top;
    the swap protocol here is correct either way, just not atomic on S3.
    """

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._IOUtils = jvm.org.apache.commons.io.IOUtils
        self._fs = self._Path(root).getFileSystem(spark._jsc.hadoopConfiguration())

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._Path(p))

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._Path(p))

    def delete(self, p: str) -> None:
        self._fs.delete(self._Path(p), True)

    def rename(self, src: str, dst: str) -> None:
        """Move src over dst (dst removed first, parent created)."""
        dpath = self._Path(dst)
        self._fs.delete(dpath, True)
        parent = dpath.getParent()
        if parent is not None:
            self._fs.mkdirs(parent)
        if not self._fs.rename(self._Path(src), dpath):
            raise IOError(f"rename failed: {src} -> {dst}")

    def list_subdirs(self, p: str) -> list[str]:
        if not self.exists(p):
            return []
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._Path(p))
            if st.isDirectory()
        ]

    def glob_dir_leaves(self, pattern: str, depth: int) -> list[str]:
        """Directories matching a glob, returned as the trailing ``depth``
        path components (e.g. ``year=2021`` or ``year=2021/month=3``) —
        component-based, so no scheme/prefix string surgery on URIs."""
        out = []
        for st in self._fs.globStatus(self._Path(pattern)) or []:
            if not st.isDirectory():
                continue
            parts, node = [], st.getPath()
            for _ in range(depth):
                parts.append(node.getName())
                node = node.getParent()
            out.append("/".join(reversed(parts)))
        return out

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._Path(p))
        try:
            return bytes(self._IOUtils.toByteArray(stream)).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, p: str, text: str) -> None:
        stream = self._fs.create(self._Path(p), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()


@dataclass
class TableMeta:
    name: str
    schema_json: str
    partition_keys: list[str] = field(default_factory=list)
    primary_keys: list[str] = field(default_factory=list)
    next_seq: int = 0
    dirty_partitions: list[list] = field(default_factory=list)  # values of partition_keys tuples
    all_dirty: bool = False

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))


class Lakehouse:
    """A directory-rooted lakehouse database. Every filesystem operation —
    metadata JSON, partition swaps, deletes — goes through the Hadoop
    FileSystem API (``_HadoopFS``), so any Hadoop FS URI (file://,
    hdfs://, s3a://) works, with credentials/committers taken from the
    session's hadoopConfiguration."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.fs = _HadoopFS(spark, self.root)
        self.fs.mkdirs(self.root)

    # fsspec/Polars-style option names → Hadoop s3a configuration keys
    # (the surface bl.connect_s3(path, storage_options) exposes —
    # reference pipelines/clients/bear_lake.py:25-26)
    _S3_OPTION_KEYS = {
        "aws_access_key_id": "fs.s3a.access.key",
        "key": "fs.s3a.access.key",
        "aws_secret_access_key": "fs.s3a.secret.key",
        "secret": "fs.s3a.secret.key",
        "aws_session_token": "fs.s3a.session.token",
        "token": "fs.s3a.session.token",
        "endpoint_url": "fs.s3a.endpoint",
        "region": "fs.s3a.endpoint.region",
        "aws_region": "fs.s3a.endpoint.region",
        "anon": "fs.s3a.connection.anonymous",
    }

    @classmethod
    def connect_s3(
        cls,
        spark: SparkSession,
        root: str,
        storage_options: dict[str, str] | None = None,
    ) -> "Lakehouse":
        """Reference ``bl.connect_s3(path, storage_options)``: open a
        lakehouse on an object-store root, applying fsspec-style
        credential options to the session's hadoopConfiguration (where
        the s3a connector — and therefore every read, write, and
        partition swap in this class — picks them up). Unrecognized
        option names pass through as ``fs.s3a.<name>`` so any connector
        knob is reachable.

        Options are written under the per-bucket namespace
        (``fs.s3a.bucket.<bucket>.*`` — the s3a connector's documented
        per-bucket override mechanism), so two lakehouses on different
        buckets with different credentials/endpoints coexist in one
        session instead of silently clobbering each other's globals."""
        if not root.startswith(("s3a://", "s3://")):
            raise ValueError(f"connect_s3 expects an s3:// or s3a:// root, got {root!r}")
        root = root.replace("s3://", "s3a://", 1)
        bucket = root[len("s3a://") :].split("/", 1)[0]
        conf = spark._jsc.hadoopConfiguration()
        for k, v in (storage_options or {}).items():
            hk = cls._S3_OPTION_KEYS.get(k, f"fs.s3a.{k}")
            hk = hk.replace("fs.s3a.", f"fs.s3a.bucket.{bucket}.", 1)
            conf.set(hk, str(v).lower() if isinstance(v, bool) else str(v))
        return cls(spark, root)

    # -- metadata ----------------------------------------------------------
    def _dir(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _meta_path(self, name: str) -> str:
        return f"{self._dir(name)}/{_META_FILE}"

    def _load_meta(self, name: str) -> TableMeta:
        return TableMeta(**json.loads(self.fs.read_text(self._meta_path(name))))

    def _save_meta(self, meta: TableMeta) -> None:
        self.fs.write_text(self._meta_path(meta.name), json.dumps(meta.__dict__))

    def exists(self, name: str) -> bool:
        return self.fs.exists(self._meta_path(name))

    def tables(self) -> list[str]:
        return sorted(
            d for d in self.fs.list_subdirs(self.root) if self.exists(d)
        )

    # -- DDL ---------------------------------------------------------------
    def create(
        self,
        name: str,
        schema: T.StructType,
        partition_keys: list[str] | None = None,
        primary_keys: list[str] | None = None,
        mode: str = "skip",
    ) -> None:
        """Reference create modes (pipelines/portfolio_weights_flow.py:152-163):
        ``skip`` = CREATE TABLE IF NOT EXISTS, ``replace`` = CREATE OR REPLACE.
        """
        if mode not in ("skip", "replace"):
            raise ValueError(f"mode must be 'skip' or 'replace', got {mode!r}")
        if self.exists(name):
            if mode == "skip":
                return
            self.fs.delete(self._dir(name))
        for k in (partition_keys or []) + (primary_keys or []):
            if k not in schema.fieldNames():
                raise ValueError(f"key {k!r} not in schema for table {name!r}")
        meta = TableMeta(
            name=name,
            schema_json=json.dumps(schema.jsonValue()),
            partition_keys=list(partition_keys or []),
            primary_keys=list(primary_keys or []),
        )
        self._save_meta(meta)

    def drop(self, name: str) -> None:
        if self.exists(name):
            self.fs.delete(self._dir(name))

    # -- DML ---------------------------------------------------------------
    def insert(self, name: str, df: DataFrame, mode: str = "append") -> None:
        """Append a batch (stamped with an ingest sequence for keep-latest
        dedup). ``mode='overwrite'`` truncates first."""
        meta = self._load_meta(name)
        declared = meta.schema
        cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in declared.fields]
        batch = df.select(*cols).withColumn(_SEQ_COL, F.lit(meta.next_seq))
        writer = batch.write.mode("append" if mode == "append" else "overwrite")
        if meta.partition_keys:
            writer = writer.partitionBy(*meta.partition_keys)
        writer.parquet(f"{self._dir(name)}/data")
        if mode != "append":
            # truncation invalidates pre-overwrite dirty state: partitions
            # recorded by earlier inserts may no longer exist, and the next
            # optimize() must only consider this batch
            meta.dirty_partitions = []
            meta.all_dirty = False
        meta.next_seq += 1
        if meta.partition_keys:
            # record which partition values this batch touched (tiny collect:
            # distinct over partition keys only)
            vals = (
                df.select(*[F.col(k).cast(declared[k].dataType) for k in meta.partition_keys])
                .distinct()
                .collect()
            )
            seen = {tuple(r) for r in meta.dirty_partitions}
            for r in vals:
                tup = tuple(r)
                if tup not in seen:
                    meta.dirty_partitions.append(list(tup))
                    seen.add(tup)
        else:
            meta.all_dirty = True
        self._save_meta(meta)

    def _read_raw(self, name: str, meta: TableMeta) -> DataFrame:
        data_dir = f"{self._dir(name)}/data"
        schema_with_seq = T.StructType(
            meta.schema.fields + [T.StructField(_SEQ_COL, T.LongType(), True)]
        )
        if not self.fs.exists(data_dir):
            return self.spark.createDataFrame([], schema_with_seq)
        return (
            self.spark.read.schema(schema_with_seq)
            .option("basePath", data_dir)
            .parquet(data_dir)
        )

    def table(self, name: str) -> DataFrame:
        """Lazy scan (reference S1). Plain DataFrame — filter/select compose
        lazily and Catalyst pushes them into the parquet scan."""
        meta = self._load_meta(name)
        return self._read_raw(name, meta).drop(_SEQ_COL)

    def query(self, df: DataFrame):
        """Reference ``db.query(lazy) -> eager frame`` (pipelines/utils/data.py:12).
        Returns a pandas DataFrame; prefer staying in Spark when composing."""
        return df.toPandas()

    # -- upsert completion -------------------------------------------------
    def optimize(self, name: str) -> None:
        """Deduplicate by primary key, keeping the latest inserted row
        (reference S4: 'Optimize table (deduplicate)',
        pipelines/portfolio_weights_flow.py:168-169).

        Only dirty partitions are rewritten (dynamic partition overwrite),
        so the cost scales with the ingest, not the table.
        """
        meta = self._load_meta(name)
        if not meta.primary_keys:
            return
        if not (meta.dirty_partitions or meta.all_dirty):
            return
        raw = self._read_raw(name, meta)
        part_filter = None
        if meta.partition_keys and not meta.all_dirty:
            for vals in meta.dirty_partitions:
                cond = F.lit(True)
                for k, v in zip(meta.partition_keys, vals):
                    cond = cond & (F.col(k) == F.lit(v))
                part_filter = cond if part_filter is None else (part_filter | cond)
            raw = raw.filter(part_filter)  # partition-pruned scan
        w = W.partitionBy(*meta.primary_keys).orderBy(F.desc(_SEQ_COL))
        deduped = (
            raw.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )
        # Lay files out PK-sorted: cluster rows by hive-partition value
        # (one task per rewritten partition → one file, not one per
        # upstream task) and sort by primary key inside, so parquet
        # row-group min/max stats are tight and PK-range scans skip
        # whole row groups — the compaction-time data-skipping layout a
        # Delta OPTIMIZE ZORDER gives, for the single-key-prefix case.
        cluster = list(meta.partition_keys) + list(meta.primary_keys)
        deduped = (
            deduped.repartition(*[F.col(k) for k in meta.partition_keys])
            if meta.partition_keys
            else deduped
        ).sortWithinPartitions(*cluster)
        # Spark cannot overwrite a path it is reading; write compacted data
        # to a staging dir, then swap the affected partition directories in
        # via Hadoop FS renames (atomic on HDFS/local; see _HadoopFS note
        # for object stores).
        data_dir = f"{self._dir(name)}/data"
        tmp_dir = f"{self._dir(name)}/.compact_tmp"
        self.fs.delete(tmp_dir)
        writer = deduped.write.mode("overwrite")
        if meta.partition_keys:
            writer = writer.partitionBy(*meta.partition_keys)
        writer.parquet(tmp_dir)
        self._swap_partitions(data_dir, tmp_dir, meta)
        meta.dirty_partitions = []
        meta.all_dirty = False
        self._save_meta(meta)

    def _swap_partitions(self, data_dir: str, tmp_dir: str, meta: TableMeta) -> None:
        rewrite_all = meta.all_dirty or not meta.partition_keys
        if rewrite_all:
            self.fs.rename(tmp_dir, data_dir)
            return
        depth = len(meta.partition_keys)
        pattern = "/".join(["*=*"] * depth)
        for rel in self.fs.glob_dir_leaves(f"{tmp_dir}/{pattern}", depth):
            self.fs.rename(f"{tmp_dir}/{rel}", f"{data_dir}/{rel}")
        self.fs.delete(tmp_dir)

    def upsert(self, name: str, df: DataFrame) -> None:
        """The reference's writer idiom: insert(append) + optimize()."""
        self.insert(name, df)
        self.optimize(name)

    def vacuum(self, name: str | None = None) -> list[str]:
        """Remove orphaned staging directories (`.compact_tmp` /
        `.delete_tmp`) left behind by a compaction or delete that died
        between its write and its swap. Safe at any time: live operations
        always delete-then-recreate their staging dir before use, and
        the data/meta of a table are never touched. Returns the removed
        paths (for operational logging)."""
        removed = []
        tables = [name] if name else self.tables()
        for t in tables:
            for leftover in (".compact_tmp", ".delete_tmp"):
                p = f"{self._dir(t)}/{leftover}"
                if self.fs.exists(p):
                    self.fs.delete(p)
                    removed.append(p)
        return removed

    def delete_where(self, name: str, predicate) -> None:
        """Targeted delete (beyond the reference's surface; needed for any
        real lakehouse — corrections, retention, GDPR erasure).

        ``predicate`` is a Column (or SQL string) selecting rows to REMOVE.
        Implementation mirrors optimize(): rewrite only the partitions
        that contain matching rows (partition-pruned scan → staging dir →
        directory swap), cost ∝ affected partitions, not table size.
        """
        meta = self._load_meta(name)
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        # NULL predicate results must mean "keep", not silently vanish
        pred = F.coalesce(pred, F.lit(False))
        raw = self._read_raw(name, meta)
        if meta.partition_keys:
            # find affected partition values (pruned aggregate, tiny collect)
            vals = raw.filter(pred).select(*meta.partition_keys).distinct().collect()
            if not vals:
                return
            part_filter = None
            for r in vals:
                cond = F.lit(True)
                for k in meta.partition_keys:
                    cond = cond & (F.col(k) == F.lit(r[k]))
                part_filter = cond if part_filter is None else (part_filter | cond)
            kept = raw.filter(part_filter).filter(~pred)
            data_dir = f"{self._dir(name)}/data"
            tmp_dir = f"{self._dir(name)}/.delete_tmp"
            self.fs.delete(tmp_dir)
            kept.write.mode("overwrite").partitionBy(*meta.partition_keys).parquet(tmp_dir)
            # swap affected partitions (including now-empty ones)
            depth = len(meta.partition_keys)
            pattern = "/".join(["*=*"] * depth)
            written = set(self.fs.glob_dir_leaves(f"{tmp_dir}/{pattern}", depth))
            for r in vals:
                rel = "/".join(f"{k}={r[k]}" for k in meta.partition_keys)
                if rel in written:
                    self.fs.rename(f"{tmp_dir}/{rel}", f"{data_dir}/{rel}")
                else:
                    self.fs.delete(f"{data_dir}/{rel}")
            self.fs.delete(tmp_dir)
        else:
            kept = raw.filter(~pred)
            data_dir = f"{self._dir(name)}/data"
            tmp_dir = f"{self._dir(name)}/.delete_tmp"
            self.fs.delete(tmp_dir)
            kept.write.mode("overwrite").parquet(tmp_dir)
            self.fs.rename(tmp_dir, data_dir)
