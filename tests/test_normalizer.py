"""Normalizer (D10) semantics against hand-built expected output —
mirrors the reference README's deals example (README.md:110-131)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from quacfka_spark.plans.custom import CustomField, TransformRegistry, with_custom_fields
from quacfka_spark.plans.normalizer import NormalizerSpec, flatten


@pytest.fixture(scope="module")
def nested_df(spark):
    rows = [
        Row(
            site=Row(id=1, name="a"),
            deals=[Row(id=10, kind="x"), Row(id=11, kind="y")],
            n=5,
        ),
        Row(site=Row(id=2, name="b"), deals=[], n=7),
        Row(site=Row(id=3, name="c"), deals=[Row(id=30, kind="z")], n=9),
    ]
    return spark.createDataFrame(rows)


def test_explode_with_scalar_duplication_and_null_row(nested_df):
    out = flatten(
        nested_df,
        ["site.id", "n", "deals.id", "deals.kind"],
        ["site", "n", "deal_id", "deal_kind"],
    )
    got = sorted([tuple(r) for r in out.collect()])
    assert got == sorted(
        [
            (1, 5, 10, "x"),
            (1, 5, 11, "y"),  # scalars duplicated per element
            (2, 7, None, None),  # NULL row on empty list (AppendNull)
            (3, 9, 30, "z"),
        ]
    )


def test_indexed_list_access_null_out_of_range(nested_df):
    out = flatten(nested_df, ["site.name", "deals[0].id"], ["s", "first_deal"])
    got = sorted([tuple(r) for r in out.collect()])
    assert got == sorted([("a", 10), ("b", None), ("c", 30)])


def test_fail_on_range_error(nested_df):
    spec = NormalizerSpec(
        fields=["deals[5].id"], aliases=["x"], fail_on_range_error=True
    )
    with pytest.raises(Exception):
        spec.apply(nested_df).collect()


def test_two_unindexed_lists_rejected(nested_df):
    df = nested_df.withColumn("tags", nested_df.deals)
    with pytest.raises(ValueError, match="explodes exactly one"):
        flatten(df, ["deals.id", "tags.kind"], ["a", "b"])


def test_bad_path_rejected(nested_df):
    with pytest.raises(ValueError, match="bad normalizer path"):
        flatten(nested_df, ["deals..id"], ["x"])
    with pytest.raises(ValueError, match="unknown field"):
        flatten(nested_df, ["nope.id"], ["x"])


def test_custom_fields(nested_df):
    from pyspark.sql import functions as F

    out = with_custom_fields(
        nested_df,
        [
            CustomField("ingest_flag", "BOOL", expr=F.lit(True)),
            CustomField("payload_len", "INT64", expr=F.col("n") * 2),
            CustomField("note", "STRING"),
        ],
    )
    r = out.select("ingest_flag", "payload_len", "note").first()
    assert r.ingest_flag is True and r.payload_len == 10 and r.note is None


def test_transform_registry(nested_df):
    reg = TransformRegistry()
    reg.add("site_counts", lambda df: df.groupBy("site.id").count())
    outs = reg.apply_all(nested_df)
    assert set(outs) == {"site_counts"}
    assert outs["site_counts"].count() == 3
