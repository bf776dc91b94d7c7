"""Fixture catalog: register the driver's parquet tables as temp views.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings.

At 100 TB these would be partitioned/bucketed external tables; loading
is a metadata operation either way (``spark.read.parquet`` is lazy, and
Catalyst handles partition pruning + predicate pushdown on the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quacfka_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region: 5 rows, nation: 25 rows at TPC-H proportions).
BROADCAST_TABLES = frozenset({"region", "nation"})


_VIEW_CACHE: dict[tuple[SparkSession, str], dict[str, DataFrame]] = {}
_LAST_REGISTERED: dict[SparkSession, str] = {}


def load_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each fixture parquet as a temp view; returns the DataFrames.

    ``events.ts`` has surfaced as three different types across fixture
    generations: parquet TIMESTAMP(NANOS) read as long (``nanosAsLong``),
    TIMESTAMP_NTZ, and plain TIMESTAMP. All are normalized here to
    session-local TIMESTAMP — the session timezone is pinned UTC
    (session.py), so the NTZ->LTZ cast is value-preserving and every
    downstream ts consumer (unix_micros, window, session_window, ...)
    sees one stable dtype regardless of fixture drift.

    Cached per (session, sf_dir): every declared query calls this, and
    the 10 schema reads + view registrations are pure overhead after the
    first call (the DataFrames are immutable lazy plans).
    """
    key = (spark, sf_dir)
    cached = _VIEW_CACHE.get(key)
    if cached is not None:
        # cheap re-registration (no schema reads) if another sf_dir was
        # registered since — keeps the temp-view namespace consistent
        # for callers that use view names rather than the returned dfs
        if _LAST_REGISTERED.get(spark) != sf_dir:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
            _LAST_REGISTERED[spark] = sf_dir
        return cached
    tune_session(spark)
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = normalize_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    _VIEW_CACHE[key] = dfs
    _LAST_REGISTERED[spark] = sf_dir
    return dfs


def normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize a ``ts`` column of any observed fixture flavor to plain
    TIMESTAMP (see load_views docstring). No-op when absent/already so."""
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(field.dataType, T.TimestampType):
            # TIMESTAMP_NTZ (or any other ts flavor) -> TIMESTAMP;
            # lossless under the pinned-UTC session timezone.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def parquet_num_rows(path: str) -> int | None:
    """Table row count read from parquet FOOTER metadata — zero Spark
    jobs, vs the metadata-only-but-still-a-job ``df.count()``. Handles
    both single-file fixtures and directory layouts (pyarrow's default
    ignore_prefixes skips _SUCCESS/_QUACFKA_DONE markers). Returns None
    when the path isn't local parquet readable by pyarrow; callers fall
    back to ``df.count()``."""
    try:
        import pyarrow.dataset as ds

        return ds.dataset(path, format="parquet").count_rows()
    except Exception:
        return None


def stream_events(
    spark: SparkSession, events_dir: str, **options: str
) -> DataFrame:
    """``readStream`` source over a directory of events-fixture parquet
    with the same ts normalization as the batch views: the on-disk dtype
    is sniffed from a batch schema read (file-stream sources require a
    user-supplied schema), then ``normalize_ts`` maps whatever flavor is
    present to plain TIMESTAMP so streaming window/session operators see
    the dtype batch queries see. ``options`` pass through to the reader
    (e.g. ``maxFilesPerTrigger="1"``)."""
    # tune_session before the batch schema sniff: on the TIMESTAMP(NANOS)
    # fixture flavor an untuned external session (nanosAsLong unset)
    # throws at this read — load_views guards the same way.
    tune_session(spark)
    on_disk = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(on_disk)
    for k, v in options.items():
        reader = reader.option(k, v)
    return normalize_ts(reader.parquet(events_dir))
