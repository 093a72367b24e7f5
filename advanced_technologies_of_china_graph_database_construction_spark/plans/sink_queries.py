"""CSV-sink round-trip queries — the S5/S6 bulk export surface
(`csv_extractor.py:16-241`) proven through the gate instead of
pytest-only: each spec WRITES the neo4j-admin-format CSV with the real
sink code, reads the files back with a plain ``spark.read.csv``, and the
DuckDB oracle recomputes what the files must contain.  F10's list
rendering (``[a,b]`` with ``"`` doubling, `utils.py:90-97`) is exercised
with elements that actually contain quotes.

Everything round-trips as VARCHAR (a header CSV read without schema
inference is all-string on any engine), with doubles pinned to
DECIMAL(14,2) before rendering so both engines print identical digits.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import enrich
from ..operators.graph import GRAPH_ORACLE_CTES, build_graph
from ..sources.csv_export import (
    render_list_literal,
    write_relationship_csvs,
    write_topic_rels_csv,
)
from ..sources.records_json import load_records_json, save_records_json
from .spec import QuerySpec


def s03_node_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + F10: document node CSV (``:ID,:LABEL,props…``) with a
    rendered keyword-name list property, written then read back.  The
    list elements are wrapped in literal ``"`` so the LOAD-CSV doubling
    has real work, and the CSV writer's own field quoting (the value
    contains commas and quotes) must round-trip cleanly through the
    reader."""
    g = build_graph(spark, sf_dir)
    kw = (
        g.edges.filter(F.col("rel_type") == "HAS_KEYWORD")
        .join(g.keywords, F.col("dst") == F.col("keyword_id"))
        .groupBy(F.col("src").alias("doc_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.concat(F.lit('"'), F.col("name"), F.lit('"')))
            ).alias("kws")
        )
    )
    nodes = g.docs.join(kw, "doc_id", "left").select(
        F.col("doc_id").cast("string").alias(":ID"),
        F.col("label").alias(":LABEL"),
        "title",
        F.col("year").cast("string").alias("year"),
        F.col("totalprice").cast("decimal(14,2)").cast("string").alias("totalprice"),
        "status",
        render_list_literal(
            F.coalesce(F.col("kws"), F.array().cast("array<string>"))
        ).alias("keywords"),
    )
    out = tempfile.mkdtemp(prefix="sink_nodes_")
    nodes.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.option("header", True).csv(out)


S03_SQL = GRAPH_ORACLE_CTES + """,
kwl AS (
  SELECT e.src AS doc_id,
         '[' || string_agg('""' || k.name || '""', ',' ORDER BY k.name) || ']' AS kws
  FROM e_has_keyword e JOIN keywords k ON e.dst = k.keyword_id
  GROUP BY e.src)
SELECT CAST(d.doc_id AS VARCHAR) AS ":ID",
       d.label AS ":LABEL",
       d.title,
       CAST(d.year AS VARCHAR) AS year,
       CAST(CAST(d.totalprice AS DECIMAL(14,2)) AS VARCHAR) AS totalprice,
       d.status,
       coalesce(k.kws, '[]') AS keywords
FROM docs d LEFT JOIN kwl k ON d.doc_id = k.doc_id
"""


def s04_rel_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the per-type relationship sinks (deduped tuples, scoped
    ``:START_ID(Label)`` headers) written with the real export code;
    the AUTHORED dataset is read back for comparison."""
    g = build_graph(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sink_rels_")
    paths = write_relationship_csvs(g, out)
    return spark.read.option("header", True).csv(paths["AUTHORED"])


S04_SQL = GRAPH_ORACLE_CTES + """
SELECT DISTINCT CAST(src AS VARCHAR) AS ":START_ID(Author)",
       CAST(dst AS VARCHAR) AS ":END_ID(Document)",
       'AUTHORED' AS ":TYPE"
FROM e_authored
"""


def s05_topic_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 + F12: the ``(paperTitle, paperLabel, topicName)`` export
    (`TopicTocsv.py:28-80`) written with the real sink; topic names are
    fed in WITH a parenthetical gloss so the F12 strip
    (`utils.py` parenthetical removal) has real work — the read-back
    must contain the bare taxonomy names."""
    docs = load_table(spark, sf_dir, "documents")
    cls = enrich.classify_topics(docs, enrich.taxonomy_df(spark))
    valid = cls.filter(F.col("error").isNull())
    classified = valid.select(
        F.concat(F.lit("Doc-"), F.col("doc_id").cast("string")).alias("title"),
        F.lit("Journal_Article").alias("label"),
        F.concat(
            F.col("topic_name"), F.lit(" ("), F.col("category"), F.lit(" gloss)")
        ).alias("topic_name"),
    )
    out = tempfile.mkdtemp(prefix="sink_topics_")
    path = write_topic_rels_csv(classified, out)
    return spark.read.option("header", True).csv(path)


def _taxonomy_sql() -> str:
    from .enrich_queries import _N_TOPICS, _TAXONOMY_CTE

    return (
        f"WITH {_TAXONOMY_CTE},\n"
        f"cls AS (SELECT doc_id, (length(text) % {_N_TOPICS} + 1)::INT AS topic_id"
        " FROM documents)"
    )


def s05_sql() -> str:
    return (
        _taxonomy_sql()
        + """
SELECT DISTINCT 'Doc-' || CAST(c.doc_id AS VARCHAR) AS paperTitle,
       'Journal_Article' AS paperLabel,
       t.topic_name AS topicName
FROM cls c JOIN taxonomy t USING (topic_id)
"""
    )


def s06_json_records_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: line-delimited JSON persistence with the sidecar-schema
    reload contract (`Hype.py:71-72,85-86` checkpoint artifacts) —
    records including an array column survive the write/read unchanged
    and with the writer's exact types (no inference pass)."""
    docs = load_table(spark, sf_dir, "documents")
    rec = docs.select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.slice(F.split(F.trim("text"), r"\s+"), 1, 3).alias("head_toks"),
    )
    out = tempfile.mkdtemp(prefix="records_json_")
    save_records_json(rec, out)
    back = load_records_json(spark, out)
    return back.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.array_join("head_toks", "|").alias("head_toks"),
    )


S06_SQL = r"""
SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars,
       array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 3), '|')
         AS head_toks
FROM documents
"""


def s07_orc_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-sink breadth beyond parquet: documents written as ORC
    partitioned by ``lang`` (hive-style directory layout), read back
    with a partition filter — the read must prune to the one ``lang``
    directory (same pruning contract the graph/IVF stores pin) and the
    typed columns must survive the format round-trip exactly."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="sink_orc_")
    try:
        docs.write.mode("overwrite").partitionBy("lang").orc(out)
        back = spark.read.orc(out).filter(F.col("lang") == "en")
        # Pruning check stays live: the lang predicate must reach the
        # ORC scan as a PARTITION filter (the executed plan renders it
        # as "(lang#N = en)" inside PartitionFilters — asserting on
        # directory names is vacuous because the plan string only shows
        # the root location).
        plan = back._jdf.queryExecution().executedPlan().toString()
        pruned = [
            l for l in plan.splitlines()
            if "PartitionFilters" in l and "lang" in l and "= en" in l
        ]
        assert pruned, plan
        res = back.select("doc_id", "lang", "source", "n_chars")
        # Materialize before removing the backing dir (the returned
        # DataFrame must not lazily read a deleted path — the e11/a07
        # temp-store discipline); the result is one partition's rows.
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


S07_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'en'
"""


def s09_bucketed_traversal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-storage round-trip through the gate: docs and edges
    written ``bucketBy`` the doc-id join key (saveAsTable — bucket
    metadata lives in the catalog), the 1-hop HAS_KEYWORD traversal
    joined off the bucketed tables, aggregated to per-year citation
    counts.  The join is asserted IN-SPEC to plan as a SortMergeJoin
    with ZERO Exchange (broadcast disabled for the check: at 100 TB
    neither side broadcasts, and that is the plan the layout exists
    for — co-located bucket files replace the per-query shuffle).
    Tables use a unique prefix and are dropped in ``finally``; the
    result is materialized first (the s07/e22 pattern)."""
    import uuid

    from ..sources.bucketed import bucketed_traversal, write_bucketed_graph

    g = build_graph(spark, sf_dir)
    prefix = f"s09_{uuid.uuid4().hex[:8]}"
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs_tbl, edges_tbl = write_bucketed_graph(g, spark, n_buckets=8, prefix=prefix)
        joined = bucketed_traversal(spark, docs_tbl, edges_tbl, "HAS_KEYWORD")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
        return (
            joined.groupBy("year")
            .agg(F.count(F.lit(1)).alias("n_citations"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
        for tbl in (f"{prefix}_docs", f"{prefix}_edges"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


S09_SQL = """
SELECT year(o_orderdate) AS year, count(*) AS n_citations
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) e
JOIN orders ON e.l_orderkey = o_orderkey
GROUP BY 1
"""


def s10_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the lakehouse incremental-write
    face: refresh ONE partition of a partitioned table without
    touching (or even listing) the others.  At 100 TB this is the
    difference between rewriting a day and rewriting the lake; the
    reference's store rebuilds wholesale (Hype.py drop-and-recreate —
    the d39 contrast), this is the write-side half of that argument.

    The spec proves the semantics, not just the API: documents land
    partitioned by ``lang``, then a delta containing ONLY the ``en``
    rows (n_chars bumped +1000) is written with ``mode("overwrite")``
    + ``partitionOverwriteMode=dynamic`` as a per-write OPTION (no
    session conf — the driver's bare session must not matter).  Under
    STATIC overwrite the delta would wipe every other lang's
    partition; without replacement ``en`` would keep stale values —
    the per-lang read-back aggregate fails the gate either way.
    """
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "lang"
    )
    out = tempfile.mkdtemp(prefix="sink_dpo_")
    try:
        docs.write.mode("overwrite").partitionBy("lang").parquet(out)
        delta = docs.filter(F.col("lang") == "en").withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        )
        delta.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("lang").parquet(out)
        back = spark.read.parquet(out).groupBy("lang").agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
        )
        return spark.createDataFrame(back.collect(), back.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


S10_SQL = """
SELECT lang, count(*) AS n_rows,
       sum(n_chars + CASE WHEN lang = 'en' THEN 1000 ELSE 0 END)::BIGINT AS sum_chars
FROM documents GROUP BY lang
"""


def s11_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read — the other lakehouse inevitability: a
    long-lived table's early files predate columns its later files
    carry, and the reader must reconcile per-file footers instead of
    trusting the first one.  Batch 1 lands WITHOUT ``lang`` (the
    pre-evolution era), batch 2 appends WITH it; ``mergeSchema=true``
    unions the footers so era-1 rows surface with NULL lang — which
    the aggregate relabels ``(pre-evolution)`` so the gate proves BOTH
    that era-1 rows kept their payload and that era-2 rows kept their
    lang (a first-footer-wins reader would drop the column entirely;
    a last-footer reader would fail era-1 files).

    Scale note: mergeSchema footer reconciliation is a one-time
    planning cost per query, not a per-row cost — but on a million-file
    table it is a real listing job, which is why production tables
    graduate to catalog-tracked schemas (the s09 saveAsTable face);
    this spec covers the schema-on-read era before that graduation.
    """
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="sink_evo_")
    try:
        era1 = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "source", "n_chars"
        )
        era2 = docs.filter(F.col("doc_id") % 2 != 0).select(
            "doc_id", "source", "n_chars", "lang"
        )
        era1.write.mode("overwrite").parquet(out)
        era2.write.mode("append").parquet(out)
        merged = spark.read.option("mergeSchema", "true").parquet(out)
        back = merged.groupBy(
            F.coalesce("lang", F.lit("(pre-evolution)")).alias("lang")
        ).agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
        )
        return spark.createDataFrame(back.collect(), back.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


S11_SQL = """
SELECT CASE WHEN doc_id % 2 = 0 THEN '(pre-evolution)' ELSE lang END AS lang,
       count(*) AS n_rows, sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY 1
"""


# single source of truth for s12's per-file cap: the compact_partitions
# call and the ceil(n_rows / cap) file-count assertion must use the SAME
# number or the assertion silently drifts wrong instead of failing loudly
S12_ROWS_PER_FILE = 100_000


def s12_compacted_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance op every APPENDED store
    eventually needs (the e26/e27 micro-batch sinks and the p03
    per-ingest deltas all accrete files; the reference's one-shot CSV
    dump never faces this).  Documents land partitioned by ``source``
    in a deliberately fragmented layout — every source scattered
    across an 8-way round-robin shuffle (≈8 files each) EXCEPT
    ``src0``, pre-written as a single healthy file.  The compactor
    must (a) converge each fragmented source to ceil(n_rows/cap)
    files — one at the gate SFs, (b) leave
    ``src0``'s file byte-identical — same name, same bytes (the
    dynamic-overwrite no-touch contract, asserted in-spec on the
    directory listing), and (c) lose no rows, which the gate proves
    against the raw-table oracle."""
    import os
    import shutil
    import tempfile

    from ..sources.compaction import compact_partitions, partition_file_stats

    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="sink_compact_")
    try:
        healthy = docs.filter(F.col("source") == "src0").coalesce(1)
        healthy.write.mode("overwrite").partitionBy("source").parquet(out)
        frag = docs.filter(F.col("source") != "src0").repartition(8)
        frag.write.mode("append").partitionBy("source").parquet(out)

        def listing(src: str) -> dict[str, float]:
            d = os.path.join(out, f"source={src}")
            return {
                f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            }

        before = listing("src0")
        compacted = compact_partitions(
            spark, out, ["source"], rows_per_file=S12_ROWS_PER_FILE
        )
        # (b) the healthy partition was not flagged, listed, or rewritten
        assert "src0" not in {r["source"] for r in compacted}, compacted
        assert listing("src0") == before, (before, listing("src0"))
        # (a) every partition converged to the file count its row count
        # warrants — ceil(n_rows / rows_per_file), which is 1 at the
        # gate SFs but legitimately >1 once a source exceeds the
        # per-file cap (compact_partitions re-splits via
        # maxRecordsPerFile; asserting == 1 would fail spuriously at
        # larger SFs)
        stats = partition_file_stats(spark, out, ["source"]).collect()
        bad = [
            r
            for r in stats
            if r["n_files"] != -(-r["n_rows"] // S12_ROWS_PER_FILE)
        ]
        assert not bad, bad
        back = spark.read.parquet(out).select(
            "doc_id", "lang", "source", "n_chars", F.md5("text").alias("text_md5")
        )
        # materialize before removing the backing dir (s07 discipline)
        return spark.createDataFrame(back.collect(), back.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


S12_SQL = """
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5 FROM documents
"""


SPECS = [
    QuerySpec(
        name="s12_compacted_store_roundtrip",
        fn=s12_compacted_store_roundtrip,
        oracle=S12_SQL,
        category="sink",
        description="small-file compaction: fragmented source partitions "
        "converge to one file each, the healthy partition's file stays "
        "byte-identical, read-back gated vs the raw table",
    ),
    QuerySpec(
        name="s11_schema_evolution_read",
        fn=s11_schema_evolution_read,
        oracle=S11_SQL,
        category="sink",
        description="schema-evolution read: mergeSchema reconciles an era "
        "without the lang column against appended files that carry it; "
        "pre-evolution rows surface with NULL lang, gated closed-form",
    ),
    QuerySpec(
        name="s10_dynamic_partition_overwrite",
        fn=s10_dynamic_partition_overwrite,
        oracle=S10_SQL,
        category="sink",
        description="dynamic partition overwrite: one lang partition refreshed "
        "in place via a per-write option; static-wipe and stale-partition "
        "failure modes both break the read-back aggregate",
    ),
    QuerySpec(
        name="s09_bucketed_traversal_roundtrip",
        fn=s09_bucketed_traversal_roundtrip,
        oracle=S09_SQL,
        category="sink",
        description="Bucketed (bucketBy doc-id) docs+edges tables: the 1-hop "
        "traversal joins with a pinned zero-Exchange SortMergeJoin off the "
        "co-located bucket files, aggregated and gated vs the raw-table oracle.",
    ),
    QuerySpec(
        name="s07_orc_partitioned_roundtrip",
        fn=s07_orc_partitioned_roundtrip,
        oracle=S07_SQL,
        category="sink",
        description="ORC sink partitioned by lang; partition-pruned, "
        "type-preserving read-back oracle-checked",
    ),
    QuerySpec(
        name="s03_node_csv_roundtrip",
        fn=s03_node_csv_roundtrip,
        oracle=S03_SQL,
        category="sink",
        description="S5 node CSV sink + F10 list literal with quote doubling, "
        "write/read round-trip oracle-checked",
    ),
    QuerySpec(
        name="s04_rel_csv_roundtrip",
        fn=s04_rel_csv_roundtrip,
        oracle=S04_SQL,
        category="sink",
        description="S6 relationship CSV sink (AUTHORED), write/read "
        "round-trip oracle-checked",
    ),
    QuerySpec(
        name="s05_topic_csv_roundtrip",
        fn=s05_topic_csv_roundtrip,
        oracle=s05_sql(),
        category="sink",
        description="S10 topic-rel CSV sink with F12 parenthetical strip, "
        "write/read round-trip oracle-checked",
    ),
    QuerySpec(
        name="s06_json_records_roundtrip",
        fn=s06_json_records_roundtrip,
        oracle=S06_SQL,
        category="sink",
        description="S3 JSON record persistence (sidecar-schema reload), "
        "write/read round-trip oracle-checked incl. array column",
    ),
]
