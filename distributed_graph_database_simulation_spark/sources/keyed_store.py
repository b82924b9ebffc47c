"""Bucketed keyed parquet store with MERGE-style upserts (SCD1 latest-wins).

The reference's only mutation primitive is whole-file overwrite
(``primary_server.c:71-76`` — ModifyGraph truncates and rewrites the graph
file). A training-data pipeline needs the keyed generalization: merge a
batch of row-level updates into a 100 TB table WITHOUT rewriting the table
and WITHOUT a transactional table format (plain parquet only, like the rest
of this engine's storage).

Design — Hive-style bucket-partition surgery:

- The table is laid out ``partitionBy(key_bucket)`` with
  ``key_bucket = pmod(xxhash64(key), n_buckets)`` — a pure function of the
  key, so any update row names exactly the one partition directory it can
  touch.
- MERGE reads ONLY the affected buckets (``key_bucket IN (...)`` prunes at
  the parquet source — the bucket list is bounded by ``n_buckets``, never
  by data size), anti-joins the updated keys out, unions the new rows, and
  rewrites just those partition directories via dynamic partition
  overwrite. Cost is proportional to the affected buckets' size: an
  upsert of k keys touches at most min(k, n_buckets) / n_buckets of the
  table.
- Within-batch conflicts resolve deterministically: highest
  ``version_col`` wins, ties broken by the full value struct (max) — so
  replaying the same batch is a byte-level no-op on the stored rows
  (idempotent retries, same contract as the sketch stores).

No ACID/concurrency claims: single-writer per table, like the reference's
write path (the load balancer serializes all writes through one primary,
``load_balancer.c:73-74``). Readers of unaffected partitions are untouched
(their files are never rewritten — pinned in tests by file-listing
equality); readers of affected partitions see the usual
overwrite-in-place non-atomicity plain parquet has always had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

DEFAULT_BUCKETS = 256


class KeyedParquetStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        n_buckets: int = DEFAULT_BUCKETS,
        version_col: str | None = None,
    ):
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.n_buckets = n_buckets
        self.version_col = version_col

    # -- filesystem (scheme-aware) --------------------------------------
    def _fs_and_path(self, path_str: str):
        """Hadoop FileSystem for the path's scheme. os.path checks would be
        driver-local-FS only: on hdfs:// or s3a:// (or a transiently
        unmounted local dir) ``os.path.isdir`` is False, which would send
        upsert() down the write_full(mode=overwrite) branch and replace the
        whole table with one update batch. Resolving through the Hadoop FS
        API makes existence and partition-directory surgery correct for
        every scheme the cluster's Hadoop conf supports."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, hpath

    def _table_exists(self) -> bool:
        fs, hpath = self._fs_and_path(self.path)
        return bool(fs.exists(hpath))

    # -- layout metadata (r16, ADVICE): the bucket count is baked into the
    # on-disk key_bucket= layout, so a caller constructing the store with a
    # DIFFERENT n_buckets (e.g. a changed SPARK_GRAFT_STORE_BUCKETS env)
    # would prune the wrong buckets — stale rows survive in their old
    # directories and updates land in new ones, silently duplicating keys.
    # The count is persisted in an underscore-prefixed sidecar (invisible
    # to parquet readers, like _SUCCESS) and validated before any bucket
    # surgery; a mismatch fails fast instead of corrupting the store.
    def _meta_hpath(self):
        return self._fs_and_path(f"{self.path}/_dgds_store_meta.json")

    def _write_meta(self) -> None:
        import json

        fs, hpath = self._meta_hpath()
        out = fs.create(hpath, True)
        try:
            out.write(
                json.dumps(
                    {"n_buckets": self.n_buckets, "key_col": self.key_col}
                ).encode("utf-8")
            )
        finally:
            out.close()

    def _validate_meta(self) -> None:
        """Check the persisted bucket count against this instance's (adopting
        legacy stores that predate the sidecar by writing it)."""
        import json

        fs, hpath = self._meta_hpath()
        if not fs.exists(hpath):
            self._write_meta()
            return
        stream = fs.open(hpath)
        try:
            raw = self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        meta = json.loads(raw)
        if int(meta.get("n_buckets", self.n_buckets)) != self.n_buckets:
            raise ValueError(
                f"KeyedParquetStore at {self.path} was written with "
                f"n_buckets={meta['n_buckets']}, constructed with "
                f"n_buckets={self.n_buckets}: bucket surgery would corrupt "
                f"the store (stale keys left in old bucket directories)"
            )

    def _remove_partition_dir(self, bucket: int) -> None:
        fs, hpath = self._fs_and_path(f"{self.path}/key_bucket={bucket}")
        if fs.exists(hpath):
            fs.delete(hpath, True)  # recursive; FS-scheme-appropriate delete

    # -- layout ---------------------------------------------------------
    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets)).cast(
            "int"
        )

    def _latest_wins(self, df: DataFrame) -> DataFrame:
        """One row per key: max version wins; ties (and the no-version case)
        resolve by the max of the full value struct — deterministic, so
        replays are no-ops."""
        value_cols = [c for c in df.columns if c != self.key_col]
        order_cols = (
            [self.version_col] + [c for c in value_cols if c != self.version_col]
            if self.version_col
            else value_cols
        )
        packed = df.groupBy(self.key_col).agg(
            F.max(F.struct(*order_cols)).alias("_v")
        )
        return packed.select(
            self.key_col, *[F.col("_v")[c].alias(c) for c in order_cols]
        ).select(self.key_col, *value_cols)  # restore original column order

    # -- operations -----------------------------------------------------
    def write_full(self, df: DataFrame, write_partitions: int | None = None) -> None:
        """Initial (or replacement) load: latest-wins collapse, bucket,
        write all partitions.

        ``write_partitions`` pins the write stage's task count
        (repartition by key): a bucket directory gets one file PER TASK
        holding rows for it, so this is the production file-size dial —
        and what lets the compact() certification entry create the
        multi-file census deterministically (AQE coalesces tiny inputs to
        one task, which would make the small-file problem vacuous at gate
        sfs)."""
        out = self._latest_wins(df).withColumn("key_bucket", self._bucket())
        if write_partitions is not None:
            out = out.repartition(write_partitions, self.key_col)
        else:
            out = self._align_write(out, self.n_buckets)
        (
            out.write.mode("overwrite")
            .partitionBy("key_bucket")
            .parquet(self.path)
        )
        self._write_meta()  # after: mode=overwrite replaces the directory

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop("key_bucket")

    def _affected_buckets(self, *updates: DataFrame) -> list[int]:
        # Bounded collect: at most n_buckets ints, never data-proportional.
        # Varargs union so a MERGE's upsert+delete sides cost ONE job, not
        # one per side (r15: merge_delta ran two bucket collects per batch).
        dfs = [u.select(self._bucket().alias("b")) for u in updates]
        acc = dfs[0]
        for d in dfs[1:]:
            acc = acc.unionByName(d)
        return sorted(r["b"] for r in acc.distinct().collect())

    def _align_write(self, df: DataFrame, n_targets: int) -> DataFrame:
        """Align writer tasks with bucket directories before a
        partitionBy("key_bucket") write: without this every task emits one
        file per bucket it holds (tasks x buckets tiny files per write —
        guide §6 small-files); keyed on key_bucket the write emits exactly
        one file per touched bucket. ``n_targets`` bounds the task count to
        the touched-bucket count so a few-bucket MERGE doesn't schedule
        n_buckets mostly-empty tasks."""
        return df.repartition(max(1, n_targets), F.col("key_bucket"))

    def upsert(
        self,
        updates: DataFrame,
        only_if_newer: bool = False,
        write_partitions: int | None = None,
    ) -> dict:
        """MERGE: replace existing rows for the updated keys, insert new
        keys, leave every other bucket's files untouched. Returns a small
        stats dict (buckets touched / initial-load flag).

        ``only_if_newer=True`` resolves against the STORED row too (max
        version wins across stored ∪ batch, not batch-always-wins) — the
        mode a streaming foreachBatch ingester needs: replaying ANY
        micro-batch, old or new, then converges to the same state instead
        of letting a replayed stale batch clobber newer rows.

        ``write_partitions``: see :meth:`write_full` — pins the write
        stage's task count (files per rewritten bucket)."""
        if not self._table_exists():
            self.write_full(updates, write_partitions=write_partitions)
            return {
                "buckets_touched": self.n_buckets,
                "initial_load": True,
            }
        self._validate_meta()
        batch = self._latest_wins(updates)
        buckets = self._affected_buckets(batch)
        existing = self.spark.read.parquet(self.path).where(
            F.col("key_bucket").isin(buckets)  # partition-prunes the scan
        ).drop("key_bucket")
        if only_if_newer:
            merged = self._latest_wins(existing.unionByName(batch))
        else:
            survivors = existing.join(
                batch.select(self.key_col), self.key_col, "left_anti"
            )
            merged = survivors.unionByName(batch)
        merged = merged.withColumn("key_bucket", self._bucket())
        if write_partitions is not None:
            merged = merged.repartition(write_partitions, self.key_col)
        else:
            merged = self._align_write(merged, len(buckets))
        # No pre-write count: it would re-read and re-merge the affected
        # buckets a second time purely for a stats number (the delete path
        # must pre-materialize, this path must not).
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("key_bucket")
            .parquet(self.path)
        )
        return {
            "buckets_touched": len(buckets),
            "initial_load": False,
        }

    def delete(self, keys: DataFrame) -> dict:
        """Row-level delete by key — same bucket surgery, minus the union.
        ``keys``: a one-column DataFrame of key values."""
        key_df = keys.select(F.col(keys.columns[0]).alias(self.key_col)).distinct()
        self._validate_meta()
        buckets = self._affected_buckets(key_df)
        existing = self.spark.read.parquet(self.path).where(
            F.col("key_bucket").isin(buckets)
        ).drop("key_bucket")
        survivors = existing.join(key_df, self.key_col, "left_anti").withColumn(
            "key_bucket", self._bucket()
        )
        survivors = self._align_write(survivors, len(buckets))
        # Persist, then materialize BEFORE the overwrite: the write replaces
        # the very files this lineage reads, so any post-persist recompute
        # (or post-write action) would hit FILE_NOT_EXIST — and without the
        # persist, the bucket-census collect and the write would each re-read
        # the affected buckets. MEMORY_AND_DISK spills rather than evicts,
        # so the write path never falls back to the deleted source files.
        survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # ONE census job for written-buckets AND row count (was a
            # distinct collect plus a separate count — r15 job fusion).
            census = survivors.groupBy("key_bucket").count().collect()
            written = {r["key_bucket"] for r in census}
            n = sum(r["count"] for r in census)
            if n > 0:
                (
                    survivors.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("key_bucket")
                    .parquet(self.path)
                )
        finally:
            survivors.unpersist()
        # Buckets whose every row was deleted produce no output partition
        # under dynamic overwrite (and an all-empty delete writes nothing
        # at all) — which would LEAVE the deleted rows on disk; remove the
        # stale directories explicitly through the scheme-aware FS handle
        # (on an object store this is the same prefix delete the dynamic-
        # overwrite committer issues for replaced partitions).
        for b in buckets:
            if b not in written:
                self._remove_partition_dir(b)
        return {"buckets_touched": len(buckets), "rows_written": n}


    def compact(self, max_files_per_bucket: int = 1) -> dict:
        """Small-file compaction — the OPTIMIZE-style maintenance pass a
        continuously-upserted store needs: every streaming micro-batch's
        dynamic overwrite leaves one file per touched bucket per write,
        and bucket directories accumulate files until scans pay per-file
        open cost. The bucket-store sibling of
        ``pipeline.compact_parquet`` (which rewrites a whole directory):
        this one is census-driven and SELECTIVE, preserving the
        key_bucket partition layout. Rewrites ONLY the buckets whose
        parquet file count
        exceeds ``max_files_per_bucket``, one file per bucket afterwards
        (the repartition keys each target bucket into exactly one task).
        Content is byte-for-byte preserved (pinned in tests); untouched
        buckets' files are not rewritten. Scheme-aware file listing, so
        the file census works on any Hadoop-supported store."""
        fs, root = self._fs_and_path(self.path)
        if not fs.exists(root):
            return {"buckets_compacted": 0, "files_before": 0, "files_after": 0}
        targets: list[int] = []
        files_before = 0
        it = fs.listStatus(root)
        for st in it:
            name = st.getPath().getName()
            if not name.startswith("key_bucket="):
                continue
            n_files = sum(
                1
                for f in fs.listStatus(st.getPath())
                if f.getPath().getName().endswith(".parquet")
            )
            files_before += n_files
            if n_files > max_files_per_bucket:
                targets.append(int(name.split("=", 1)[1]))
        if not targets:
            return {
                "buckets_compacted": 0,
                "files_before": files_before,
                "files_after": files_before,
            }
        rows = self.spark.read.parquet(self.path).where(
            F.col("key_bucket").isin(targets)
        )
        rows = rows.repartition(len(targets), "key_bucket").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            # Materialize BEFORE the overwrite: the write replaces the very
            # files this lineage reads (same discipline as delete()).
            rows.count()
            (
                rows.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("key_bucket")
                .parquet(self.path)
            )
        finally:
            rows.unpersist()
        # After-census over the whole store (targets now hold one file
        # each; untouched buckets unchanged).
        files_after = 0
        for st in fs.listStatus(root):
            if not st.getPath().getName().startswith("key_bucket="):
                continue
            files_after += sum(
                1
                for f in fs.listStatus(st.getPath())
                if f.getPath().getName().endswith(".parquet")
            )
        return {
            "buckets_compacted": len(targets),
            "files_before": files_before,
            "files_after": files_after,
        }

    def merge_delta(self, updates: DataFrame, delete_keys: DataFrame) -> dict:
        """Upserts + deletes in ONE bucket surgery — a CDC delta applied
        with a single read and a single dynamic-overwrite write over the
        union of both sides' touched buckets, instead of upsert() then
        delete() each re-reading and re-writing its own bucket set.
        Deletes win over upserts on key overlap (a delta that both
        rewrites and tombstones a key means the tombstone is later).
        Same empty-bucket surgery and replay idempotence as delete()."""
        key_df = delete_keys.select(
            F.col(delete_keys.columns[0]).alias(self.key_col)
        ).distinct()
        if not self._table_exists():
            kept = updates.join(key_df, self.key_col, "left_anti").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            try:
                n = kept.count()
                self.write_full(kept)
            finally:
                kept.unpersist()
            # Same keys on both branches (r13 ADVICE): callers keying on
            # rows_written or initial_load must not KeyError by branch.
            return {
                "buckets_touched": self.n_buckets,
                "rows_written": n,
                "initial_load": True,
            }
        # Both sides are consumed by the bucket collect AND the merge plan
        # (and key_df by the survivor anti-join too) — without the scoped
        # persists the delta's upstream (often a full digest scan) executes
        # once per consumer. Bounded by the delta size, never the table.
        self._validate_meta()
        batch = (
            self._latest_wins(updates)
            .join(key_df, self.key_col, "left_anti")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        key_df = key_df.persist(StorageLevel.MEMORY_AND_DISK)
        buckets = self._affected_buckets(batch, key_df)  # one job, both sides
        existing = (
            self.spark.read.parquet(self.path)
            .where(F.col("key_bucket").isin(buckets))
            .drop("key_bucket")
        )
        survivors = existing.join(
            batch.select(self.key_col).unionByName(key_df),
            self.key_col,
            "left_anti",
        )
        merged = survivors.unionByName(batch).withColumn(
            "key_bucket", self._bucket()
        )
        merged = self._align_write(merged, len(buckets)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            # ONE census job for written-buckets AND row count (r15 fusion).
            census = merged.groupBy("key_bucket").count().collect()
            written = {r["key_bucket"] for r in census}
            n = sum(r["count"] for r in census)
            if n > 0:
                (
                    merged.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("key_bucket")
                    .parquet(self.path)
                )
        finally:
            merged.unpersist()
            batch.unpersist()
            key_df.unpersist()
        for b in buckets:
            if b not in written:
                self._remove_partition_dir(b)
        return {
            "buckets_touched": len(buckets),
            "rows_written": n,
            "initial_load": False,
        }
