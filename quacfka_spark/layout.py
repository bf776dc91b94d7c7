"""Physical table layout for scale: bucketing and partitioning helpers.

The reference leaves physical layout to DuckDB files; at 100 TB the
dominant cost of fact-to-fact joins (lineitem ⋈ orders) and repeated
keyed aggregation is the shuffle. Spark's answer is layout, decided at
write time:

- **Bucketing** (`write_bucketed`): hash-distribute rows into a fixed
  number of buckets on the join/agg key. Two tables bucketed the same
  way join with ZERO exchanges — each task reads matching buckets from
  both sides. At 100 TB this turns the every-query shuffle of the big
  table into a one-time cost paid at ingest.
- **Partitioning** (`write_partitioned`): directory-level pruning for
  low-cardinality predicates (date, region). A filtered scan touches
  only matching directories.
- **Z-ordering** (`write_zordered`): multi-dimensional clustering via a
  bit-interleaved Morton key — compact per-file min/max envelopes on
  BOTH dimensions, so 2-dim range predicates skip most files through
  ordinary parquet stats (the Delta/Iceberg OPTIMIZE ZORDER technique).

Both compose with the streaming pipeline: point `foreachBatch` writes at
`write_bucketed` and every downstream epoch query inherits the layout.

Guard test: tests/test_layout.py asserts the bucketed join plan contains
a SortMergeJoin and no Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


DONE_MARKER = "_QUACFKA_DONE"


def touch_done(d: str) -> None:
    """Touch the library-owned completion marker in ``d`` — written only
    AFTER the write call returned, so its presence proves job completion
    even where the committer's _SUCCESS marker is disabled. Best-effort:
    a non-local / non-POSIX path just skips it (reuse then depends on
    _SUCCESS, never on inferring completeness from part files)."""
    import os

    try:
        with open(os.path.join(d, DONE_MARKER), "w"):
            pass
    except OSError:
        pass


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    *,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save `df` as a bucketed (and bucket-sorted) managed table.

    Bucket count guidance: pick so one bucket of the LARGEST co-bucketed
    table fits an executor task comfortably (~128-512 MB compressed);
    co-joining tables must use the same count and keys. Sorting within
    buckets makes the merge join read-sequential.
    """
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)
    loc = table_location(df.sparkSession, table)
    if loc:
        touch_done(loc)


def table_location(spark: SparkSession, table: str) -> str | None:
    """The managed table's REAL on-disk directory, resolved from the
    catalog (DESCRIBE TABLE EXTENDED). Qualified names and a non-default
    current database land under db.db/tbl — string-joining warehouse +
    table name would miss them, or worse, freshen a same-named dir from
    an unrelated earlier run. Shared by write_bucketed's done-marker
    touch and _ensure_cobucketed's freshness check so the two can never
    disagree about where the artifact lives."""
    from urllib.parse import urlparse

    loc = next(
        (
            r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            if r.col_name == "Location"
        ),
        None,
    )
    return urlparse(loc).path if loc else None


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned parquet for pruning on the partition keys.

    EMPTY input (a real epoch condition): partitionBy writes no
    schema-bearing part files, so read-back fails UNABLE_TO_INFER_SCHEMA.
    Degrade to one empty non-partitioned file — the partition columns
    are still in the DataFrame, so readers see the identical schema
    with zero rows (there are no directories to prune anyway).
    """
    if df.isEmpty():
        df.coalesce(1).write.mode(mode).parquet(path)
        touch_done(path)
        return
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)
    touch_done(path)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed saved tables. With matching bucket specs the
    plan has no Exchange: Spark reads bucket i of both sides in task i.
    (Broadcast is disabled for the join via hints being unnecessary —
    Catalyst already prefers the exchange-free SMJ when specs match.)
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def artifact_fresh(marker: str, source: str) -> bool:
    """Shared stale-artifact rule for derived layout copies (x07's
    partitioned events, the example's masked corpus): the artifact is
    reusable iff its completion marker exists and is at least as new as
    the source fixture it was derived from. A MISSING source counts as
    fresh (nothing to re-derive from; the copy is the best data we
    have) — the x06 'previous session's dirs survive on disk' hazard,
    one rule, one place."""
    import os

    # Two accepted completion proofs: the committer's _SUCCESS, or the
    # library-owned _QUACFKA_DONE this module's writers touch AFTER the
    # write call returns (survives
    # mapreduce.fileoutputcommitter.marksuccessfuljobs=false). A dir
    # with part files but NEITHER marker is treated as stale — with the
    # v2 committer, tasks commit part files directly into the output
    # dir, so "has part files" cannot distinguish a completed write
    # from one that crashed mid-job; only a marker written after the
    # job can.
    d = os.path.dirname(marker)
    for ref in (marker, os.path.join(d, DONE_MARKER)):
        if os.path.exists(ref):
            try:
                return not os.path.exists(source) or os.path.getmtime(
                    ref
                ) >= os.path.getmtime(source)
            except OSError:
                return False  # concurrent rewrite deleted it under us
    return False


def artifact_dir(spark, sf_dir: str, extra: str = "") -> tuple[str, str, str]:
    """Canonical (abs_sf_dir, warehouse_path, tag) for derived layout
    artifacts — the other half of the stale-artifact rule (see
    ``artifact_fresh``), shared by x06's bucketed tables, x07's
    partitioned events, and the example pipeline's masked corpus so the
    tagging conventions cannot drift per call site:

    - abspath BEFORE tagging: a relative sf_dir must not fork the cache
      tag or store symlink targets that resolve against the warehouse;
    - ``extra`` versions the DERIVING PIPELINE (not just the source):
      freshness is mtime-based, so a semantic change to how the artifact
      is built must change the tag or an artifact surviving from an
      older run is silently reused with the old semantics.
    """
    import hashlib
    import os
    from urllib.parse import urlparse

    sf_dir = os.path.abspath(sf_dir)
    key = f"{sf_dir}|{extra}" if extra else sf_dir
    tag = hashlib.md5(key.encode()).hexdigest()[:8]
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    return sf_dir, wh, tag


def zorder_key(x, y, bits: int = 16):
    """Bit-interleaved Z-value (Morton code) of two pre-scaled
    non-negative integer columns — the multi-dimensional clustering key
    (the third classic at-rest layout next to bucketing and directory
    partitioning). Interleaving makes file/row-group min-max stats
    TIGHT on BOTH dimensions simultaneously, so a 2-dim range predicate
    skips most files where a single-column sort helps only its own
    column. Pure Catalyst bit ops (shift/and/or), codegen-friendly."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    dim_x: str,
    dim_y: str,
    *,
    bits: int = 16,
    files: int = 24,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet Z-ordered on two numeric dimensions.

    One small min/max aggregate sizes the per-dimension scaling (an
    ingest-time cost, like computing bucket counts); rows are then
    range-partitioned and sorted by the interleaved Z-value into
    ``files`` files, giving every file a compact Z-range — and therefore
    compact min/max envelopes on BOTH dimensions. Readers need nothing
    special: parquet stats-based row-group/file skipping with ordinary
    pushed range filters does the pruning.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(dim_x).alias("xmin"),
        F.max(dim_x).alias("xmax"),
        F.min(dim_y).alias("ymin"),
        F.max(dim_y).alias("ymax"),
    ).first()
    if stats["xmin"] is None or stats["ymin"] is None:
        # empty input (or all-NULL dims): nothing to cluster — write
        # one empty schema-bearing file so read-back keeps the schema
        df.coalesce(1).write.mode(mode).parquet(path)
        touch_done(path)
        return
    top = (1 << bits) - 1

    def scaled(col: str, lo, hi):
        span = float(max(hi - lo, 1))
        return F.least(
            F.lit(top).cast("long"),
            (
                (F.col(col).cast("double") - float(lo)) * top / span
            ).cast("long"),
        )

    z = zorder_key(
        scaled(dim_x, stats["xmin"], stats["xmax"]),
        scaled(dim_y, stats["ymin"], stats["ymax"]),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
    touch_done(path)


def compact_files(
    df: DataFrame,
    path: str,
    *,
    files: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Small-file compaction: rewrite ``df`` into ``files`` larger
    parquet files, optionally range-clustered + sorted on ``sort_by``.

    Streaming ingest (D13/D15's per-epoch rotation) necessarily emits
    many small files; at 100 TB the small-files problem dominates read
    cost — per-file open/footer overhead, no useful min/max envelopes,
    tiny row groups. Compaction is the maintenance pass every table
    format schedules (Delta OPTIMIZE / Iceberg rewrite_data_files),
    expressed here as plain Spark: ONE range-exchange on the sort key
    (clusters rows so each output file owns a compact key range — the
    same stats-pruning story as write_zordered, in one dimension),
    sortWithinPartitions (no global sort barrier), one write. With no
    ``sort_by`` it is a pure coalesce-style rewrite with a round-robin
    exchange to keep file sizes even.
    """
    if sort_by:
        out = df.repartitionByRange(files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(files)
    out.write.mode(mode).parquet(path)
    touch_done(path)
