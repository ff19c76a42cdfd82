"""JSONL source/sink + dataset_diff unit tests."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_jsonl_roundtrip_and_field_order(spark, tmp_path):
    from geoparquet_io_spark.sources.jsonl import read_jsonl, write_jsonl

    rows = [(1, "hello \"quoted\" text\nwith newline", 3.5),
            (2, None, -0.25)]
    df = spark.createDataFrame(rows, ["id", "text", "score"])
    path = str(tmp_path / "docs")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema, keep_corrupt=False)
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
    # stable field order per line (scan parts; some may be empty)
    lines = []
    for f in sorted(os.listdir(path)):
        if f.startswith("part-"):
            lines += [ln for ln in open(os.path.join(path, f)) if ln.strip()]
    assert len(lines) == 2
    for ln in lines:
        assert list(json.loads(ln).keys())[0] == "id"


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    from geoparquet_io_spark.sources.jsonl import CORRUPT_COL, read_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "text": "ok"}\n'
                 'THIS IS NOT JSON\n'
                 '{"id": 2, "text": "fine"}\n')
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("text", T.StringType())])
    out = read_jsonl(spark, str(p), schema=schema).collect()
    good = [r for r in out if r[CORRUPT_COL] is None]
    bad = [r for r in out if r[CORRUPT_COL] is not None]
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "THIS IS NOT JSON"

    with pytest.raises(Exception):
        read_jsonl(spark, str(p), schema=schema, keep_corrupt=False).collect()


def test_dataset_diff_all_statuses(spark):
    from geoparquet_io_spark.operators.merge import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        ["k", "v", "x"])
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", None), (4, "d", 41), (5, "e", 50)],
        ["k", "v", "x"])
    got = {r["k"]: r["diff_status"]
           for r in dataset_diff(old, new, "k").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "changed", 5: "added"}
    # restricted compare columns: x ignored -> 4 is unchanged
    got_v = {r["k"]: r["diff_status"]
             for r in dataset_diff(old, new, "k", ["v"]).collect()}
    assert got_v[4] == "unchanged" and got_v[3] == "changed"


def test_dataset_diff_hash_injection_safe(spark):
    """NULL vs any literal string, and separator-containing values that
    would alias neighboring fields under naive concat, must all compare
    as changed."""
    from geoparquet_io_spark.operators.merge import dataset_diff

    old = spark.createDataFrame([(1, None, "x")],
                                "k: long, a: string, b: string")
    new = spark.createDataFrame([(1, "", "x")],
                                "k: long, a: string, b: string")
    assert dataset_diff(old, new, "k").collect()[0]["diff_status"] == "changed"

    # field-boundary shift: ("ab", "c") vs ("a", "bc")
    old2 = spark.createDataFrame([(1, "ab", "c")], ["k", "a", "b"])
    new2 = spark.createDataFrame([(1, "a", "bc")], ["k", "a", "b"])
    assert dataset_diff(old2, new2, "k").collect()[0]["diff_status"] == "changed"


def test_dataset_diff_validates_columns(spark):
    from geoparquet_io_spark.operators.merge import dataset_diff

    old = spark.createDataFrame([(1, "a")], ["k", "v"])
    new = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        dataset_diff(old, new, "k")
