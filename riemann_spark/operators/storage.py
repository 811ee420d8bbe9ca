"""Event-time storage layout: partitioned writes + pruned reads.

The reference holds state in RAM and bounds it with TTLs
(/root/reference/src/riemann/index.clj); a 100 TB Spark deployment
instead lands events in object storage and must bound what a query
*reads*. Two mechanisms, both declarative so Catalyst applies them
with zero query-side code:

- **partition pruning**: write ``partitionBy(event_date)`` (hive
  layout); any filter on the partition column prunes directories
  before listing files — a day query over a year of data scans
  1/365th of it (shows as ``PartitionFilters`` in the scan node).
- **row-group skipping**: within each partition, sort by
  (host, service, time) so parquet min/max column stats make point
  lookups skip row groups (shows as ``PushedFilters``).

Granularity: day ≈ 275 GB/partition at 100 TB/yr — large enough to
avoid the many-small-files listing wall, small enough that single-day
queries stay cheap. Hour suits hot recent-data queries; both are just
a different truncation of the same epoch-seconds double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TRUNC = {"day": "dd", "hour": "HH"}

#: Test seam: called as hook(event_date, part_path) after the staging
#: write and BEFORE the swap — lets tests inject a "concurrent" ingest
#: append into the live partition to prove the snapshot discipline
#: (tests/test_plans.py). Always None in production.
_compaction_test_hook = None


def with_event_date(df: DataFrame, granularity: str = "day", time_col: str = "time") -> DataFrame:
    """Derive the partition column from epoch-seconds ``time``."""
    ts = F.timestamp_seconds(F.col(time_col))
    if granularity == "day":
        part = F.to_date(ts)
    elif granularity == "hour":
        part = F.date_format(ts, "yyyy-MM-dd-HH")
    else:
        raise ValueError(f"granularity must be day|hour, got {granularity!r}")
    return df.withColumn("event_date", part)


def write_events_partitioned(
    df: DataFrame,
    path: str,
    granularity: str = "day",
    time_col: str = "time",
    sort_keys: tuple[str, ...] = ("host", "service", "time"),
) -> None:
    """Land events hive-partitioned by event time, sorted within
    partitions for parquet min/max stat skipping."""
    out = with_event_date(df, granularity, time_col)
    keys = [k for k in sort_keys if k in out.columns]
    if keys:
        out = out.sortWithinPartitions(*keys)
    out.write.mode("overwrite").partitionBy("event_date").parquet(path)


def read_events_range(
    spark: SparkSession,
    path: str,
    t_from: float,
    t_to: float,
    time_col: str = "time",
) -> DataFrame:
    """Time-range read over a partitioned event lake. The redundant
    ``event_date`` bounds are derived from the time bounds so Catalyst
    prunes partitions (the time filter alone lives in a data column
    and cannot prune directories)."""
    df = spark.read.parquet(path)
    d_from = F.to_date(F.timestamp_seconds(F.lit(t_from)))
    d_to = F.to_date(F.timestamp_seconds(F.lit(t_to)))
    return df.filter(
        (F.col("event_date") >= d_from)
        & (F.col("event_date") <= d_to)
        & (F.col(time_col) >= t_from)
        & (F.col(time_col) < t_to)
    )


def partition_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-partition file census for the lake: (event_date, n_files,
    bytes, mean_file_bytes). Streaming ingest with frequent triggers
    fragments partitions into thousands of tiny parquet files — the
    listing/open overhead wall at 100 TB — and this is the signal that
    drives compaction. Metadata-only: reads the file index, never the
    data (input_file_name over a 0-column projection would still open
    footers; the Hadoop listing does not)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    rows = []
    for part in fs.listStatus(p):
        if not part.isDirectory():
            continue
        name = part.getPath().getName()
        if "=" not in name:
            continue
        date = name.split("=", 1)[1]
        files = [
            f
            for f in fs.listStatus(part.getPath())
            if f.getPath().getName().endswith(".parquet")
        ]
        total = sum(f.getLen() for f in files)
        rows.append((date, len(files), total))
    return spark.createDataFrame(
        rows, "event_date string, n_files long, bytes long"
    ).withColumn(
        "mean_file_bytes",
        (F.col("bytes") / F.greatest(F.col("n_files"), F.lit(1))).cast("long"),
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    min_files_to_compact: int = 4,
    sort_keys: tuple[str, ...] = ("host", "service", "time"),
) -> DataFrame:
    """Bin-pack fragmented partitions into ~``target_file_bytes``
    files (the OPTIMIZE/compaction maintenance job every streaming
    lake needs). Only partitions with ≥ ``min_files_to_compact`` files
    are rewritten — each independently, via coalesce(ceil(bytes/
    target)) so compaction is a narrow, shuffle-free rewrite — and
    re-sorted on ``sort_keys`` to restore parquet min/max stat
    skipping that interleaved micro-batch files destroy.

    Swap discipline (snapshot-then-replace, not dir-overwrite): the
    input file list is SNAPSHOTTED first and only those exact files
    are read, so parquet files a streaming sink appends between
    snapshot and swap are untouched and survive. The staged outputs
    are renamed INTO the live directory (unique ``compacted-`` names)
    and then exactly the snapshotted originals are deleted — the
    partition directory itself never disappears, so readers are never
    blocked and never see an empty partition. Without a manifest
    layer (Delta/Iceberg) the move-in→delete window is not atomic: a
    reader listing mid-swap can observe the compacted rows
    DUPLICATED with the originals for a moment. Run compaction when
    momentary read duplication is tolerable (metrics rollups) or
    schedule it against partitions past the ingest watermark;
    concurrent compactors on the same partition are not supported.

    Crash safety: before the rename loop a hidden per-run manifest
    (``.compact-manifest-<run>``, listing originals + staged names) is
    written into the partition. On entry every partition is first
    RECOVERED from any leftover manifest: if all staged files landed,
    the swap rolls FORWARD (delete the originals the crash left
    behind); otherwise it rolls BACK (delete the partial
    ``compacted-<run>-*`` files). Either way rows are never
    permanently duplicated by a crash + rerun. Prior runs'
    ``compacted-*`` outputs are eligible snapshot inputs (only the
    live run's names are excluded by manifest recovery), so repeated
    compaction of a partition with ongoing ingest CONVERGES to
    ~n_target files instead of ratcheting up one immutable file set
    per run. Returns the before/after census of the partitions it
    rewrote."""
    import math
    import uuid

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(conf)
    # recovery sweep FIRST so the census never counts crash leftovers
    for part in fs.listStatus(hpath(path)):
        if part.isDirectory() and "=" in part.getPath().getName():
            _recover_partition(jvm, fs, hpath, part.getPath().toString())

    stats = partition_file_stats(spark, path).filter(
        F.col("n_files") >= min_files_to_compact
    )
    todo = [(r.event_date, r.n_files, r.bytes) for r in stats.collect()]
    out = []
    for date, n_files, nbytes in todo:
        part_path = f"{path}/event_date={date}"
        n_target = max(1, math.ceil(nbytes / target_file_bytes))
        if n_target >= n_files:
            continue
        # snapshot the exact input files; later appends are not ours.
        # Prior-run compacted-* files ARE inputs (convergence); this
        # run's own outputs don't exist yet so they can't self-join.
        snapshot = [
            f.getPath()
            for f in fs.listStatus(hpath(part_path))
            if f.getPath().getName().endswith(".parquet")
        ]
        if len(snapshot) < min_files_to_compact:
            continue
        df = spark.read.parquet(*[p.toString() for p in snapshot])
        keys = [k for k in sort_keys if k in df.columns]
        compacted = df.coalesce(n_target)
        if keys:
            compacted = compacted.sortWithinPartitions(*keys)
        staging = f"{path}/.compact_tmp_event_date={date}"
        compacted.write.mode("overwrite").parquet(staging)
        if _compaction_test_hook is not None:
            _compaction_test_hook(date, part_path)
        staged = [
            f.getPath()
            for f in fs.listStatus(hpath(staging))
            if f.getPath().getName().endswith(".parquet")
        ]
        run_id = uuid.uuid4().hex[:8]
        targets = [f"compacted-{run_id}-{i:05d}.parquet" for i in range(len(staged))]
        # manifest BEFORE the swap: a crash at any later point is
        # recoverable (all targets present → roll forward, else back)
        _write_manifest(jvm, fs, hpath, part_path, run_id,
                        [p.getName() for p in snapshot], targets)
        # move staged files into the live dir, then delete exactly the
        # snapshotted originals (never the whole directory)
        for sp, tname in zip(staged, targets):
            fs.rename(sp, hpath(f"{part_path}/{tname}"))
        for orig in snapshot:
            fs.delete(orig, False)
        fs.delete(hpath(f"{part_path}/.compact-manifest-{run_id}"), False)
        fs.delete(hpath(staging), True)
        out.append((date, len(snapshot), len(staged), nbytes))
    return spark.createDataFrame(
        out, "event_date string, files_before long, files_after long, bytes long"
    )


def _write_manifest(jvm, fs, hpath, part_path: str, run_id: str,
                    originals: list[str], staged: list[str]) -> None:
    import json

    body = json.dumps({"run": run_id, "originals": originals,
                       "staged": staged}).encode()
    stream = fs.create(hpath(f"{part_path}/.compact-manifest-{run_id}"), True)
    try:
        stream.write(bytearray(body))
    finally:
        stream.close()


def _read_small_file(jvm, fs, p) -> bytes:
    stream = fs.open(p)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _recover_partition(jvm, fs, hpath, part_path: str) -> None:
    """Finish or undo an interrupted swap from its manifest: roll
    FORWARD (delete leftover originals) when every staged
    ``compacted-<run>-*`` file landed, roll BACK (delete the partial
    staged set) otherwise; then drop the manifest. Idempotent."""
    import json

    manifests = [
        f.getPath()
        for f in fs.listStatus(hpath(part_path))
        if f.getPath().getName().startswith(".compact-manifest-")
    ]
    for mp in manifests:
        try:
            m = json.loads(_read_small_file(jvm, fs, mp).decode())
        except Exception:
            fs.delete(mp, False)
            continue
        staged = [hpath(f"{part_path}/{n}") for n in m.get("staged", [])]
        originals = [hpath(f"{part_path}/{n}") for n in m.get("originals", [])]
        if staged and all(fs.exists(p) for p in staged):
            for orig in originals:  # roll forward: finish the delete
                fs.delete(orig, False)
        else:
            for sp in staged:  # roll back: drop the partial swap
                fs.delete(sp, False)
        fs.delete(mp, False)
