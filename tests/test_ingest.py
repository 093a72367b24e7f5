"""Unit tests for the TXT record source (sources/txt_records.py) against
real files on disk — the part the oracle round-trip can't cover: the S2
recursive directory scan, provenance, and ragged-schema unions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.sources import txt_records as txt

PAPER = """\
{Title}: Deep Learning for Lithography
{Reference Type}: Journal Article
{Author}: Zhang, Wei ; Li,  Na;
{Keywords}: EUV ; lithography ; EUV
{Author Address}: Tsinghua University 100084 , Beijing / Dept. of EE
{Year}: 2021
{Journal}: Acta Optica
not a field line
{Pages}: 1-10
{Pages}: 11-20

 \t
{Title}: Deep Learning for Lithography
{Reference Type}: Journal Article
{Author}: Someone Else
{Year}: 2022
"""

PATENT = """\
{Title}: Etching Apparatus
{Reference Type}: Patent
{Author}: Wang, Fang
{Year}: n.d.
{Subject}: plasma etching
"""


def _write_tree(tmp_path):
    d1 = tmp_path / "semiconductors" / "论文"
    d2 = tmp_path / "semiconductors" / "专利"
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)
    (d1 / "a.txt").write_text(PAPER, encoding="utf-8")
    (d2 / "b.txt").write_text(PATENT, encoding="utf-8")
    return tmp_path


def test_parse_blocks_fields_and_last_win(spark, tmp_path):
    root = _write_tree(tmp_path)
    parsed = txt.parse_blocks(txt.read_txt_dir(spark, str(root)))
    rows = {(r["file"].split("/")[-1], r["pos"]): r["rec"] for r in parsed.collect()}
    assert len(rows) == 3
    first = rows[("a.txt", 0)]
    assert first["Title"] == "Deep Learning for Lithography"
    # duplicated field keeps the LAST value (dict-assignment semantics)
    assert first["Pages"] == "11-20"
    # non-field lines are ignored, not errors
    assert "not a field line" not in set(first.keys())
    # patent record carries its own field set (ragged schema)
    assert rows[("b.txt", 0)]["Subject"] == "plasma etching"


def test_clean_records_splits_and_casts(spark, tmp_path):
    root = _write_tree(tmp_path)
    rec = txt.clean_records(txt.parse_blocks(txt.read_txt_dir(spark, str(root))))
    by_title_year = {(r["title"], r["year_raw"]): r for r in rec.collect()}
    paper = by_title_year[("Deep Learning for Lithography", "2021")]
    # F1 split + F3 per-element normalize + F4 trailing ';' + D4 dedup
    assert paper["authors"] == ["Zhang, Wei", "Li, Na"]
    assert paper["keywords"] == ["EUV", "lithography"]
    # F2 postal strip + multi-delimiter address split
    assert paper["addresses"] == ["Tsinghua University", "Beijing", "Dept", "of EE"]
    # F5 lenient cast
    assert paper["year"] == 2021
    patent = by_title_year[("Etching Apparatus", "n.d.")]
    assert patent["year"] is None and patent["year_raw"] == "n.d."
    assert patent["label"] == "Patent"
    assert paper["label"] == "Journal_Article"


def test_ingest_keep_first_dedup(spark, tmp_path):
    root = _write_tree(tmp_path)
    deduped = txt.ingest_txt(spark, str(root))
    assert deduped.count() == 2  # 3 records, 1 duplicate title dropped
    winner = deduped.filter(F.col("title") == "Deep Learning for Lithography").collect()[0]
    # keep-FIRST: the pos-0 record (authors Zhang/Li), not the later one
    assert winner["authors"] == ["Zhang, Wei", "Li, Na"]


def test_keep_first_dedup_orders_files_numerically(spark):
    """r6 regression: raw string order puts file_10 before file_2, so a
    title colliding across files with different digit counts kept the
    WRONG record (sf0.1: 300 of 400 titles) — keep_first_dedup must
    compare string provenance under the natural-sort key."""
    from advanced_technologies_of_china_graph_database_construction_spark.sources.txt_records import (
        keep_first_dedup,
        natural_sort_key,
    )

    rows = [
        ("file_2", 0, "T", "early"),   # numerically first
        ("file_10", 0, "T", "late"),   # string-first, numerically later
        ("file_10", 1, "U", "only"),
    ]
    df = spark.createDataFrame(rows, "file string, pos int, title string, body string")
    got = {r["title"]: r["body"] for r in keep_first_dedup(df).collect()}
    assert got == {"T": "early", "U": "only"}
    ordered = [
        r["file"]
        for r in df.select("file").distinct()
        .orderBy(natural_sort_key(df.file)).collect()
    ]
    assert ordered == ["file_2", "file_10"]


def test_keep_first_dedup_breaks_natural_key_ties_deterministically(spark):
    """'file_2' and 'file_02' collapse to the same padded natural key;
    the raw string tie-break must make the winner deterministic
    (review-found, pinned): 'file_02' < 'file_2' in raw order."""
    from advanced_technologies_of_china_graph_database_construction_spark.sources.txt_records import (
        keep_first_dedup,
    )

    rows = [("file_2", 0, "T", "plain"), ("file_02", 0, "T", "padded")]
    df = spark.createDataFrame(rows, "file string, pos int, title string, body string")
    for _ in range(3):  # stable across executions, not one lucky pick
        got = {r["title"]: r["body"] for r in keep_first_dedup(df).collect()}
        assert got == {"T": "padded"}
