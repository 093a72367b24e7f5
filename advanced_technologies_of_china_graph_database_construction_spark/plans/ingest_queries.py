"""Ingest workload: the TXT-record pipeline (S1/S2, F1–F5, D1, U1)
exercised end-to-end as oracle-checked queries.

Construction: render EndNote-style ``{Field}: Value`` blocks from the
``documents`` table deterministically (titles collide mod 400 so the
keep-first dedup has real work; Year is sometimes non-numeric so the
lenient cast has real work; a duplicated ``{Pages}`` field tests
LAST_WIN map semantics; an omitted ``{Volume}`` tests ragged schemas),
group blocks into synthetic "files", then run the *real* parse → clean →
dedup operators from ``sources.txt_records`` over them.

The DuckDB oracle never parses text: it computes the expected cleaned
values directly from ``documents`` — an independent derivation, so a
bug anywhere in render/parse/clean shows up as a mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..sources import txt_records as txt
from .spec import QuerySpec

BLOCKS_PER_FILE = 50
TITLE_MOD = 400

# lang → Reference Type; 'es' intentionally maps to an unknown type so
# the default-label path (utils.py:100-110 fallback) is exercised.
LANG_TO_REF_TYPE = {
    "en": "Journal Article",
    "zh": "Patent",
    "de": "Thesis",
    "fr": "Conference Proceedings",
    "es": "Gray Literature",
}
LANG_TO_LABEL = {
    "en": "Journal_Article",
    "zh": "Patent",
    "de": "Thesis",
    "fr": "Conference_Proceedings",
    "es": "Other_Article",
}


# ----------------------------------------------------------------- render --

def _render_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (file, text) where text is blocks of {Field}: Value
    lines separated by whitespace-only blank lines."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    ref_type_map = F.create_map(
        *[F.lit(x) for kv in LANG_TO_REF_TYPE.items() for x in kv]
    )
    line = lambda field, val: F.concat(F.lit("{" + field + "}: "), val)  # noqa: E731
    block = F.concat_ws(
        "\n",
        line("Title", F.concat(F.lit("Doc "), s(d % TITLE_MOD))),
        line("Reference Type", F.element_at(ref_type_map, F.col("lang"))),
        # double spaces + trailing ';' exercise F3/F4; ';'-split is F1
        line("Author", F.concat(F.lit("A  "), F.col("source"), F.lit(" ;  B "), F.col("lang"), F.lit(";"))),
        # duplicate first keyword exercises order-preserving dedup (D4)
        line("Keywords", F.concat(F.lit("k"), s(d % 7), F.lit(" ; k"), s(d % 11), F.lit(" ; k"), s(d % 7))),
        # 6-digit postal code + multi-delimiter content exercises F2+F1
        line(
            "Author Address",
            F.concat(
                F.lit("Inst "), s(d % 13), F.lit(" "), s(d % 900000 + 100000),
                F.lit(" , Lane "), s(d % 5), F.lit(" / Campus "), s(d % 3),
            ),
        ),
        # non-numeric every 10th record exercises the lenient cast (F5)
        line("Year", F.when(d % 10 == 0, F.lit("n.d.")).otherwise(s(d % 30 + 1990))),
        # omitted every 3rd record exercises ragged schemas (U1)
        F.when(d % 3 != 0, line("Volume", s(d % 40))),
        # duplicated field: dict-assignment keeps the last (LAST_WIN)
        line("Pages", F.lit("1-10")),
        line("Pages", F.lit("11-20")),
        line("Abstract", F.regexp_replace(F.substring("text", 1, 60), r"[\n\r]", " ")),
    )
    return (
        docs.select((d / BLOCKS_PER_FILE).cast("int").alias("file_id"), d.alias("doc_id"), block.alias("block"))
        .groupBy("file_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "block"))),
                    lambda x: x["block"],
                ),
                "\n \n",  # whitespace-only separator line: the \n\s*\n split
            ).alias("text")
        )
        .select(F.concat(F.lit("file_"), F.col("file_id").cast("string")).alias("file"), "text")
    )


def _cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = txt.parse_blocks(_render_files(spark, sf_dir))
    rec = txt.clean_records(parsed)
    return rec.select(
        "file",
        "pos",
        "title",
        "ref_type",
        "label",
        F.array_join("authors", "|").alias("authors_str"),
        F.array_join("keywords", "|").alias("keywords_str"),
        F.array_join("addresses", "|").alias("addresses_str"),
        "year",
        "year_raw",
        "volume",
        "pages",
        "abstract",
    )


# Oracle-side mirror of the *expected* cleaned values, derived directly
# from the documents table (no text round-trip).
_EXPECTED_CTE = """
expected AS (
  SELECT
    doc_id,
    'file_' || CAST(doc_id // 50 AS VARCHAR) AS file,
    'Doc ' || CAST(doc_id % 400 AS VARCHAR) AS title,
    CASE lang WHEN 'en' THEN 'Journal Article' WHEN 'zh' THEN 'Patent'
              WHEN 'de' THEN 'Thesis' WHEN 'fr' THEN 'Conference Proceedings'
              ELSE 'Gray Literature' END AS ref_type,
    CASE lang WHEN 'en' THEN 'Journal_Article' WHEN 'zh' THEN 'Patent'
              WHEN 'de' THEN 'Thesis' WHEN 'fr' THEN 'Conference_Proceedings'
              ELSE 'Other_Article' END AS label,
    'A ' || source || '|B ' || lang AS authors_str,
    CASE WHEN doc_id % 7 = doc_id % 11 THEN 'k' || CAST(doc_id % 7 AS VARCHAR)
         ELSE 'k' || CAST(doc_id % 7 AS VARCHAR) || '|k' || CAST(doc_id % 11 AS VARCHAR)
    END AS keywords_str,
    'Inst ' || CAST(doc_id % 13 AS VARCHAR)
      || '|Lane ' || CAST(doc_id % 5 AS VARCHAR)
      || '|Campus ' || CAST(doc_id % 3 AS VARCHAR) AS addresses_str,
    CASE WHEN doc_id % 10 = 0 THEN NULL ELSE CAST(doc_id % 30 + 1990 AS INT) END AS year,
    CASE WHEN doc_id % 10 = 0 THEN 'n.d.' ELSE CAST(doc_id % 30 + 1990 AS VARCHAR) END AS year_raw,
    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE CAST(doc_id % 40 AS INT) END AS volume,
    '11-20' AS pages,
    trim(regexp_replace(substr(text, 1, 60), '\\s+', ' ', 'g')) AS abstract
  FROM documents)
"""


# --------------------------------------------------------------- i01 parse --

def i01_parse_clean_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cleaned(spark, sf_dir).drop("pos")


I01_SQL = f"""
WITH {_EXPECTED_CTE}
SELECT file, title, ref_type, label, authors_str, keywords_str, addresses_str,
       year, year_raw, volume, pages, abstract
FROM expected
"""


# --------------------------------------------------------------- i02 dedup --

def i02_keep_first_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = txt.keep_first_dedup(_cleaned(spark, sf_dir))
    return deduped.select("title", "authors_str", "year", "year_raw", "abstract")


I02_SQL = f"""
WITH {_EXPECTED_CTE}
SELECT title, authors_str, year, year_raw, abstract
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id % 400 ORDER BY doc_id) AS rn
      FROM expected)
WHERE rn = 1
"""


# --------------------------------------------------------- i03 lenient agg --

def i03_year_cast_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = _cleaned(spark, sf_dir)
    return rec.groupBy("label").agg(
        F.count("*").alias("n_docs"),
        F.count("year").alias("n_year_int"),
        F.sum(F.when(F.col("year").isNull(), 1).otherwise(0)).alias("n_year_fallback"),
        F.min("year").alias("min_year"),
        F.max("year").alias("max_year"),
        F.count("volume").alias("n_volume"),
    )


I03_SQL = f"""
WITH {_EXPECTED_CTE}
SELECT label, count(*) AS n_docs, count(year) AS n_year_int,
       sum(CASE WHEN year IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_year_fallback,
       min(year) AS min_year, max(year) AS max_year, count(volume) AS n_volume
FROM expected GROUP BY label
"""


# --------------------------------------------------------- i04 provenance --

def i04_provenance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = _cleaned(spark, sf_dir)
    return rec.groupBy("file").agg(
        F.count("*").alias("n_records"),
        F.countDistinct("title").alias("n_titles"),
        F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )


I04_SQL = f"""
WITH {_EXPECTED_CTE}
SELECT file, count(*) AS n_records, count(DISTINCT title) AS n_titles,
       0::INT AS first_pos, (count(*) - 1)::INT AS last_pos
FROM expected GROUP BY file
"""


# ------------------------------------- i05 malformed-JSON dead-letter --

def i05_malformed_json_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant JSON ingest with a dead-letter channel — the
    shape every 100 TB feed needs: parse what parses, quarantine what
    doesn't, NEVER fail the job on one bad record (the reference's
    ingest assumes clean EndNote exports; a crawl feed doesn't get to).

    Construction: each document renders to a JSON payload via
    ``to_json``; every 7th payload is truncated by one byte (drops the
    closing ``}``), which is unambiguously malformed.  ``from_json`` in
    PERMISSIVE mode with ``columnNameOfCorruptRecord`` splits the feed:
    valid rows are counted WHERE the corrupt column is NULL — not where
    a payload field is non-NULL, because Spark keeps PARTIAL results
    for corrupt records (fields parsed before the failure point stay
    set), so field-presence is not a validity test.  Recovered snippets
    fold into an order-independent bit_xor checksum of 60-bit md5
    slices, proving the JSON escape/unescape round-trip is lossless —
    the oracle computes the same checksum straight from ``documents``
    without ever touching JSON.

    Scale shape: parse + corrupt-split are narrow (no shuffle until the
    per-source aggregate, which carries three numbers per group);
    malformed payloads ride the SAME rows as a quarantine count, so no
    second pass over the feed.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = F.to_json(
        F.struct(
            F.col("doc_id"), F.col("source"),
            F.substring("text", 1, 40).alias("snippet"),
        )
    )
    # two selects so the truncation expression can reference the
    # rendered payload by name
    feed = (
        docs.select("source", payload.alias("js"), "doc_id")
        .select(
            "source",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.expr("substring(js, 1, length(js) - 1)"),
            )
            .otherwise(F.col("js"))
            .alias("js"),
        )
    )
    parsed = feed.select(
        "source",
        F.from_json(
            "js",
            "doc_id bigint, source string, snippet string, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p"),
    )
    ok = F.col("p._corrupt").isNull()
    # checksum fragments single-sourced from functions.integrity: the
    # NULL-sentinel row key keeps both engines aligned when a snippet
    # is NULL (to_json drops null fields, so the parse recovers NULL —
    # a bare concat_ws would skip it while the oracle's || nullifies)
    from ..functions.integrity import spark_md5_slice, spark_row_key

    slice60 = F.expr(spark_md5_slice(spark_row_key("p.doc_id", "p.snippet")))
    return parsed.groupBy("source").agg(
        F.sum(ok.cast("long")).alias("n_valid"),
        F.sum((~ok).cast("long")).alias("n_dead"),
        F.bit_xor(F.when(ok, slice60)).alias("valid_cks"),
    )


def _i05_sql() -> str:
    from ..functions.integrity import duck_md5_slice, duck_row_key

    row = duck_row_key("doc_id", "substr(text, 1, 40)")
    return f"""
SELECT source,
       sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_dead,
       bit_xor(CASE WHEN doc_id % 7 <> 0 THEN {duck_md5_slice(row)} END) AS valid_cks
FROM documents GROUP BY source
"""


I05_SQL = _i05_sql()


SPECS = [
    QuerySpec("i01_parse_clean_records", i01_parse_clean_records, I01_SQL, "ingest",
              "S1 TXT block parse + F1-F5 cleaning round-trip", bench=True),
    QuerySpec("i02_keep_first_dedup", i02_keep_first_dedup, I02_SQL, "ingest",
              "D1 keep-first dedup by title with explicit ingest order"),
    QuerySpec("i03_year_cast_stats", i03_year_cast_stats, I03_SQL, "ingest",
              "F5 lenient int cast aggregates per label"),
    QuerySpec("i04_provenance_stats", i04_provenance_stats, I04_SQL, "ingest",
              "S2 file provenance through the parse pipeline"),
    QuerySpec("i05_malformed_json_deadletter", i05_malformed_json_deadletter, I05_SQL,
              "ingest",
              "corrupt-tolerant JSON ingest: PERMISSIVE from_json dead-letter "
              "split, valid-rows checksum proves lossless escape round-trip"),
]
