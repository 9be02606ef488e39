"""S1 generality: the one load_table swap point serves orc/json/csv local
mirrors with full value fidelity (schema pinned from the parquet sibling —
timestamps and arrays survive text encodings)."""

from __future__ import annotations

import os

import pytest

from etf_topox_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _mirror(spark, tmp_path, name, fmt):
    src = load_table(spark, SF, name)
    out = str(tmp_path / f"{name}.{fmt}")
    w = src.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        w.option("header", "true").csv(out)
    else:
        if fmt == "json":
            # keep µs precision for TIMESTAMP_NTZ through the text encoding
            w = w.option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        getattr(w, fmt)(out)
    # the parquet sibling supplies the schema
    os.symlink(f"{SF}/{name}.parquet", str(tmp_path / f"{name}.parquet"))
    return out


@pytest.mark.parametrize(
    "name,fmt",
    [
        ("nation", "csv"),        # scalar columns → CSV-safe
        ("events", "json"),       # timestamps through JSON
        ("embeddings", "orc"),    # float arrays through ORC
        ("documents", "json"),
    ],
)
def test_format_round_trip(spark, tmp_path, name, fmt, monkeypatch):
    _mirror(spark, tmp_path, name, fmt)
    base = sorted(map(str, load_table(spark, SF, name).collect()))
    monkeypatch.setenv("SPARK_GRAFT_FORMAT", fmt)
    got = sorted(map(str, load_table(spark, str(tmp_path), name).collect()))
    assert got == base


def test_unknown_format_rejected(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FORMAT", "avro")
    with pytest.raises(ValueError):
        load_table(spark, SF, "nation")
