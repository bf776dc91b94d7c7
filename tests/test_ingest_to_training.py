"""The streaming->curation->packing composition
(examples/ingest_to_training.py) holds its invariants end to end:
cross-epoch content dedup at the sink, a quality gate that actually
fires, and packing offsets that tile each stream's sequences."""

from __future__ import annotations

from pyspark.sql import functions as F

from examples.ingest_to_training import _CAPACITY, run


def test_ingest_to_training_invariants(spark, tmp_path):
    rep = run(spark, str(tmp_path))

    # ingest: 3 epochs with 50% overlap -> exactly the unique ids land
    assert rep["consumed"] == 1200
    assert rep["inserted"] == 800
    assert rep["dedup_dropped"] == 400
    # the quality gate fired, and every curated row shipped
    assert 0 < rep["curated"] < rep["inserted"]
    assert rep["shard_rows"] == rep["curated"]

    shards = spark.read.parquet(str(tmp_path / "train_shards"))
    # no duplicate content survived to the training shards
    assert shards.select("text").distinct().count() == rep["shard_rows"]
    # packing invariants: offsets live inside the capacity, and within
    # each (source, seq_id) run the doc spans tile without overlap
    assert shards.filter(
        (F.col("offset") < 0) | (F.col("offset") >= _CAPACITY)
    ).count() == 0
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    gaps = (
        shards.select(
            "source",
            "doc_id",
            "seq_id",
            "offset",
            "n_tokens",
            F.lag(F.col("seq_id") * _CAPACITY + F.col("offset") + F.col("n_tokens"))
            .over(w)
            .alias("prev_end"),
        )
        .filter(F.col("prev_end").isNotNull())
        .filter(F.col("seq_id") * _CAPACITY + F.col("offset") != F.col("prev_end"))
    )
    assert gaps.count() == 0  # concatenate-and-chop: no gaps, no overlap
    # token accounting matches the packing frame
    assert rep["tokens"] == shards.agg(F.sum("n_tokens")).collect()[0][0]
    # the dataset manifest ships with the shards and matches the run
    import json

    with open(tmp_path / "train_shards" / "_manifest.json") as fh:
        manifest = json.load(fh)
    assert manifest == rep
