"""S3/S4 JSON persistence round-trips: records and mapping tables
reload bit-stable with their schemas, and mapping memoization honors
the force_recompute contract (`keyword_merger.py:134-144`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.plans.ingest_queries import i01_parse_clean_records
from advanced_technologies_of_china_graph_database_construction_spark.sources import records_json as rj

from .conftest import SF_SMOKE


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_records_roundtrip_preserves_rows_and_schema(spark, tmp_path):
    rec = i01_parse_clean_records(spark, SF_SMOKE)
    path = str(tmp_path / "records_json")
    rj.save_records_json(rec, path)
    back = rj.load_records_json(spark, path)
    # file sources reload everything nullable; names + types must be exact
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in rec.schema.fields
    ]
    cols = rec.columns
    assert _sorted_rows(back, cols) == _sorted_rows(rec, cols)


def test_records_roundtrip_keeps_null_vs_fallback(spark, tmp_path):
    """The lenient-int F5 columns (year NULL + year_raw string) must
    survive the JSON trip — the int-or-string union typing hard part."""
    rec = i01_parse_clean_records(spark, SF_SMOKE)
    path = str(tmp_path / "records_json_f5")
    rj.save_records_json(rec, path)
    back = rj.load_records_json(spark, path)
    fallback = back.filter(F.col("year").isNull() & (F.col("year_raw") == "n.d."))
    assert fallback.count() == rec.filter(F.col("year").isNull()).count()
    assert dict(back.dtypes)["year"] == "int"


def test_mapping_memoization(spark, tmp_path):
    path = str(tmp_path / "mapping_json")
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame(
            [("a", "a"), ("b", "a"), ("c", "c")], ["surface", "canonical"]
        )

    m1 = rj.memoized_mapping(spark, path, compute)
    assert len(calls) == 1
    # second call reuses the artifact (curated mappings survive re-runs)
    m2 = rj.memoized_mapping(spark, path, compute)
    assert len(calls) == 1
    assert _sorted_rows(m2, ["surface", "canonical"]) == _sorted_rows(m1, ["surface", "canonical"])
    # force_recompute recomputes and overwrites
    rj.memoized_mapping(spark, path, compute, force_recompute=True)
    assert len(calls) == 2
