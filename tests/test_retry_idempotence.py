"""Task-retry idempotence for the deterministic-hash claims.

x02 (hash-gated sampling), salted_join and two_phase_agg
(functions/skew.py) all argue determinism-under-retry: their sampling
gates and salts are pure hashes of row values, never rand(), so a
retried task reproduces its partition byte-for-byte. This test actually
injects a task failure: a Spark context built with ``local[4, 3]``
(maxFailures=3) runs each operator over a mapInPandas stage that throws
on attempt 0 of partition 0, and the retried run's output must equal a
clean run's exactly.

Needs its own SparkContext (maxFailures is a context-level setting and
the shared test session runs maxFailures=1), so it executes in a
subprocess — one JVM per process.
"""

from __future__ import annotations

import os
import subprocess
import sys

import tests.conftest as cf

_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SMOKE_DIR = sys.argv[1]
MARKER_DIR = sys.argv[2]

spark = (
    SparkSession.builder.master("local[4, 3]")  # 4 threads, 3 task attempts
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("retry-idempotence")
    .getOrCreate()
)

docs = spark.read.parquet(f"{SMOKE_DIR}/documents.parquet").select(
    "doc_id", "lang", "source"
)
# >1 partition so the flaky partition is a strict subset of the stage
docs = docs.repartition(4)
schema = docs.schema


def flaky(it):
    import os
    from pyspark import TaskContext

    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        # marker proves the failure (and therefore the retry) happened —
        # user accumulators from failed tasks are dropped, files are not
        open(os.path.join(MARKER_DIR, f"fail-{tc.stageId()}"), "w").close()
        raise RuntimeError("injected task failure (attempt 0)")
    yield from it


flaky_docs = docs.mapInPandas(flaky, schema=schema)


def rows(df):
    return sorted(map(tuple, df.collect()))


from quacfka_spark.functions.skew import salted_join, two_phase_agg

failures = []

# 1. deterministic hash-gated sampling (the x02 expression shape)
frac = (
    F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
    / 65536.0
)
rate = F.when(F.col("lang") == "en", 0.10).otherwise(0.50)
sample = lambda d: d.filter(frac < rate).select("doc_id", "lang")
if rows(sample(flaky_docs)) != rows(sample(docs)):
    failures.append("hash_sample")

# 2. salted join: flaky skewed side against a small dim
dim = docs.select("lang").distinct().withColumn("label", F.upper("lang"))
sj = lambda d: salted_join(d, dim, ["lang"]).select("doc_id", "lang", "label")
if rows(sj(flaky_docs)) != rows(sj(docs)):
    failures.append("salted_join")

# 3. two-phase aggregation with deterministic salt
tp = lambda d: two_phase_agg(
    d,
    ["lang"],
    [F.count(F.lit(1)).alias("n"), F.approx_count_distinct("doc_id").alias("u")],
    [F.sum("n").alias("n_docs"), F.sum("u").alias("u_sum")],
)
if rows(tp(flaky_docs)) != rows(tp(docs)):
    failures.append("two_phase_agg")

import os
n_failures_injected = len(os.listdir(MARKER_DIR))
if n_failures_injected == 0:
    failures.append("no task failure was injected — test vacuous")

if failures:
    print("RETRY-IDEMPOTENCE FAILED:", failures)
    sys.exit(1)
print(f"RETRY-IDEMPOTENCE OK (injected failures: {n_failures_injected})")
"""


def test_retry_idempotence(tmp_path):
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, cf.SMOKE_DIR, str(marker_dir)],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    assert "RETRY-IDEMPOTENCE OK" in proc.stdout
