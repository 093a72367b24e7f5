"""TXT record source: EndNote-style ``{Field}: Value`` exports → typed
DataFrame.

Re-expresses the reference's ingest pipeline (``cleaner.py``) as a lazy
Spark plan:

- S1 record scan   — blank-line block split + per-line field regex
  (``cleaner.py:7-26``, regex at ``cleaner.py:21``)
- S2 directory scan — ``data/src_data/<domain>/{论文,专利}/*.txt`` with
  provenance (``cleaner.py:171-217``)
- F1 multi-delimiter split (``cleaner.py:55-64``)
- F2 postal-code strip (``cleaner.py:29-39``)
- F3 whitespace normalize (``cleaner.py:105-117``)
- F4 trailing ``;`` trim (``cleaner.py:54``)
- F5 lenient int cast with raw fallback (``cleaner.py:67-71``)
- D1 keep-first dedup by Title (``cleaner.py:77-94``)
- U1 union of ragged sources (``cleaner.py:206-216``)

Everything is built-in column expressions — no Python UDFs — so the whole
parse/clean path stays inside whole-stage codegen and scales linearly
with input splits.  The reference's dict semantics (later duplicate field
wins) are implemented inside the parse expression itself (sort-based
keep-last in ``parse_blocks``), so the plan is correct under any session
``mapKeyDedupPolicy``.

Scale notes (100 TB): parsing is a narrow map over file splits
(``wholetext`` keeps one file per row — fine for reference-manager
exports which are ≤ tens of MB; truly huge single files would switch to
the blank-line-delimited ``lineSep`` reader).  The only shuffle in the
whole ingest plan is D1's dedup exchange on the title key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Fields that are `;`-separated lists (cleaner.py:55-57).
LIST_FIELDS = ("Author", "Keywords", "Tertiary Author", "Subsidiary Author")
# Fields parsed as int with string fallback (cleaner.py:67-71).
INT_FIELDS = ("Year", "Volume", "Issue")
# Scalar passthrough fields kept as document properties
# (csv_extractor.py:45-59).
SCALAR_FIELDS = (
    "Title",
    "Reference Type",
    "Abstract",
    "Journal",
    "Pages",
    "DOI",
    "URL",
    "ISBN/ISSN",
    "Publisher",
    "Place Published",
    "Date",
)

# Reference-Type → node label with default (utils.py:100-110,
# TopicTocsv.py:14-25).
REF_TYPE_TO_LABEL = {
    "Journal Article": "Journal_Article",
    "Conference Proceedings": "Conference_Proceedings",
    "Patent": "Patent",
    "Newspaper Article": "Newspaper_Article",
    "Thesis": "Thesis",
    "Book": "Book",
}
DEFAULT_LABEL = "Other_Article"


def read_txt_dir(spark: SparkSession, path: str) -> DataFrame:
    """S2: recursive directory scan keeping file provenance.

    One row per file (`wholetext`), ``file`` = full path so the
    domain / 论文|专利 segments stay recoverable downstream
    (`cleaner.py:198-217` keeps them implicitly by iteration order; we
    keep them as data).
    """
    return (
        spark.read.option("recursiveFileLookup", True)
        .text(path, wholetext=True)
        .select(F.input_file_name().alias("file"), F.col("value").alias("text"))
    )


def parse_blocks(files: DataFrame, text_col: str = "text", file_col: str = "file") -> DataFrame:
    """S1: blank-line block split + ``{Field}: Value`` line parse.

    Returns (file, pos, rec:map<string,string>) — ``pos`` is the block's
    position within its file, giving a deterministic ingest order for the
    keep-first dedup (SURVEY.md §7 hard-part (b)).

    Mirrors ``parse_entries`` (`cleaner.py:7-26`): blocks are separated
    by blank (possibly whitespace-only) lines; within a block only lines
    matching ``{Field}: Value`` contribute; a duplicated field keeps the
    last value (dict-assignment semantics).  The keep-last dedup happens
    inside the array expression — NOT via `spark.sql.mapKeyDedupPolicy` —
    so the plan is correct under any session configuration (the driver
    supplies its own SparkSession whose default policy throws on
    duplicate map keys).
    """
    blocks = files.select(
        F.col(file_col).alias("file"),
        F.posexplode(F.split(F.col(text_col), r"\n\s*\n")).alias("pos", "block"),
    ).filter(F.trim("block") != "")
    lines = F.split(F.col("block"), r"\n")
    field_lines = F.filter(lines, lambda l: l.rlike(r"^\{[^}]+\}:"))
    entries = F.transform(
        field_lines,
        lambda l, i: F.struct(
            F.regexp_extract(l, r"^\{([^}]+)\}:", 1).alias("key"),
            i.alias("idx"),
            F.trim(F.regexp_extract(l, r"^\{[^}]+\}:\s*(.*)$", 1)).alias("value"),
        ),
    )
    # Keep-last per key in O(k log k): sort by (key, idx) — the struct's
    # natural field order — then keep each element whose successor starts
    # a different key (the last occurrence in its key group).  The sorted
    # array is bound ONCE as a lambda variable via the single-element
    # transform; referencing a non-lambda expression inside a HOF lambda
    # re-evaluates it per element (measured 2.5× slower than even the old
    # slice/exists k² scan), which was the i01 bench regression.
    rec = F.element_at(
        F.transform(
            F.array(F.array_sort(entries)),
            lambda a: F.map_from_entries(
                F.transform(
                    F.filter(
                        a,
                        lambda e, i: (i == F.size(a) - 1)
                        | (F.element_at(a, i + F.lit(2))["key"] != e["key"]),
                    ),
                    lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value")),
                )
            ),
        ),
        1,
    )
    return blocks.select("file", "pos", rec.alias("rec"))


# ----------------------------------------------------------- field cleaning --

def strip_postal(col: Column) -> Column:
    """F2: drop standalone 6-digit postal codes, collapse whitespace
    (`cleaner.py:29-39`)."""
    no_postal = F.regexp_replace(col, r"(?<!\d)\d{6}(?!\d)", " ")
    return F.trim(F.regexp_replace(no_postal, r"\s+", " "))


def norm_ws(col: Column) -> Column:
    """F3: whitespace normalize + trim (`cleaner.py:105-117`)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_trailing_semi(col: Column) -> Column:
    """F4: ``value.strip().strip(';')`` (`cleaner.py:54`)."""
    return F.trim(F.regexp_replace(F.trim(col), r";+$", ""))


def split_list(col: Column, pattern: str = ";") -> Column:
    """F1: split, per-element whitespace-normalize, drop empties,
    keep first-occurrence order dedup (D4, `keyword_merger.py:261-263`)."""
    items = F.transform(F.split(col, pattern), norm_ws)
    return F.array_distinct(F.filter(items, lambda x: x != ""))


def split_addresses(col: Column) -> Column:
    """F1+F2 for `Author Address`: postal strip then multi-delimiter
    split on ``; . , / ·`` (`cleaner.py:59-65`)."""
    return split_list(strip_postal(col), r"[;.,/·]")


def lenient_int(col: Column) -> Column:
    """F5: int(x) with fallback-to-string handled by keeping the raw
    column alongside (`cleaner.py:67-71`); this returns the int side."""
    return col.try_cast("int")


def clean_records(parsed: DataFrame, rec_col: str = "rec") -> DataFrame:
    """Typed projection of a parsed record map — the Spark equivalent of
    ``format_data`` + ``data_cleaning``'s normalization passes
    (`cleaner.py:42-74,97-122`).

    Output: one wide nullable row per record (SURVEY.md §1.1's
    "dynamic dict = nullable-wide-row" mapping) carrying
    file/pos provenance.
    """
    rec = F.col(rec_col)

    def get(field: str) -> Column:
        return rec[F.lit(field)]

    cols = [F.col("file"), F.col("pos")]
    cols.append(norm_ws(strip_trailing_semi(get("Title"))).alias("title"))
    cols.append(norm_ws(get("Reference Type")).alias("ref_type"))
    label_map = F.create_map(
        *[F.lit(x) for kv in REF_TYPE_TO_LABEL.items() for x in kv]
    )
    cols.append(
        F.coalesce(
            F.element_at(label_map, norm_ws(get("Reference Type"))), F.lit(DEFAULT_LABEL)
        ).alias("label")
    )
    for field, name in (
        ("Author", "authors"),
        ("Keywords", "keywords"),
        ("Tertiary Author", "tertiary_authors"),
        ("Subsidiary Author", "subsidiary_authors"),
    ):
        cols.append(split_list(strip_trailing_semi(get(field))).alias(name))
    cols.append(split_addresses(get("Author Address")).alias("addresses"))
    for field, name in (("Year", "year"), ("Volume", "volume"), ("Issue", "issue")):
        raw = strip_trailing_semi(get(field))
        cols.append(lenient_int(raw).alias(name))
        cols.append(raw.alias(f"{name}_raw"))
    # driven by SCALAR_FIELDS so the constant and the projection can't
    # drift (r12 review: ISBN/ISSN and Date were silently dropped while
    # the constant claimed passthrough — isbn_issn IS a reference doc
    # property, csv_extractor.py:57); Title / Reference Type are
    # handled above as title/ref_type/label
    for field in SCALAR_FIELDS:
        if field in ("Title", "Reference Type"):
            continue
        name = "isbn_issn" if field == "ISBN/ISSN" else field.lower().replace(" ", "_")
        cols.append(norm_ws(get(field)).alias(name))
    return parsed.select(*cols)


def natural_sort_key(col: Column) -> Column:
    """L3 filename NUMERIC sort: zero-pad every digit run so plain
    string ordering equals numeric ordering (``file_2`` before
    ``file_10`` — raw string order puts ``file_10`` first, which is
    neither the reference's iteration order nor any ingest order a
    human would call "first").  Pure JVM HOF: split into digit /
    non-digit runs (lookaround regex), left-pad the numeric runs to 20
    digits, re-join.  Runs LONGER than 20 digits are compared by their
    20-digit PREFIX (``lpad`` truncates) — not a tie: two such runs can
    order by prefix against their numeric value.  Accepted bound: no
    real filename carries a >20-digit counter (uint64 is 20 digits),
    and any fixed pad width has the same cliff one digit later.

    Found the hard way (r6): at sf0.01 the synthetic corpus spans
    file_0..file_9 where string order HAPPENS to equal numeric order,
    so the i02 gate stayed green — at sf0.1 (file_0..file_99) the raw
    string ordering picked the wrong "first" record for 300 of 400
    colliding titles."""
    runs = F.split(col, r"(?<=\d)(?=\D)|(?<=\D)(?=\d)")
    return F.array_join(
        F.transform(
            runs,
            lambda p: F.when(p.rlike(r"^\d+$"), F.lpad(p, 20, "0")).otherwise(p),
        ),
        "",
    )


def keep_first_dedup(
    records: DataFrame, key: str = "title", order_cols: tuple[str, ...] = ("file", "pos")
) -> DataFrame:
    """D1: keep the first-ingested record per key (`cleaner.py:77-94`).

    Input-order "first" is made explicit and distribution-safe by the
    (file, pos) provenance columns — SURVEY.md §7 hard-part (b) — with
    STRING order columns compared under ``natural_sort_key`` so the
    file component sorts numerically (L3; see that docstring for the
    sf0.1 trap this closes).  One shuffle on the dedup key; at 100 TB
    this is the ingest plan's only wide stage and the key (title) is
    near-unique so no skew.
    """
    from pyspark.sql.types import StringType

    # Raw column appended as tie-break: the natural key COLLAPSES
    # textually distinct strings ('file_2' vs 'file_02' share one
    # padded key), and a window tie would make "first" run-dependent —
    # (natural_key, raw) is a total order again.
    order_exprs: list[Column] = []
    for c in order_cols:
        if isinstance(records.schema[c].dataType, StringType):
            order_exprs.append(natural_sort_key(F.col(c)))
        order_exprs.append(F.col(c))
    w = Window.partitionBy(key).orderBy(*order_exprs)
    return (
        records.filter(F.col(key).isNotNull() & (F.col(key) != ""))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ingest_txt(spark: SparkSession, path: str) -> DataFrame:
    """Full S2→S1→clean→D1 ingest pipeline as one lazy plan."""
    return keep_first_dedup(clean_records(parse_blocks(read_txt_dir(spark, path))))
