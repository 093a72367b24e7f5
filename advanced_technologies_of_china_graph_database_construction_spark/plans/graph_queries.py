"""Graph query workload — the reference's 17-question acceptance suite
(`Q.txt:1-67`, 6 classes) re-expressed as DataFrame joins over the
node/edge model (SURVEY.md §2.5 J3-J10, §2.6 A4, §2.7 L1).

Every MATCH pattern in the generated-Cypher workload is an equi-join of
the edges table with node tables; Catalyst picks broadcast hash joins
for the entity dims and shuffled joins on doc_id for the big edge
tables — exactly the physical strategy a graph query planner would want
at 100 TB (edges bucketed by src).

Queries g01-g17 map 1:1 onto the Q.txt classes:
  类型一 (forward 1-hop)        → g01-g04
  类型二 (reverse 1-hop)        → g05-g07
  类型三 (property lookup/agg)  → g08-g10
  类型四 (existence check)      → g11-g12
  类型五 (2-hop co-occurrence)  → g13-g14
  类型六 (3/4-hop traversal)    → g15-g16
  alias expansion (J9)          → g17
  fallback full-text (Q3/J10)   → g18-g19 over `documents`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import (
    GRAPH_ORACLE_CTES,
    REL_ALIAS_OF,
    REL_AUTHORED,
    REL_AUTHOR_ADDRESS,
    REL_HAS_KEYWORD,
    REL_HAS_TOPIC,
    REL_PUBLISHED_BY,
    build_graph,
)
from .spec import QuerySpec

# Fixed parameters, chosen to exist at every scale factor.
AUTHOR = "Customer#000000001"
ORG = "Supplier#000000001"
KEYWORD = "cold widget"
ADDRESS = "NATION_3"
TOPIC = "ASIA"
DOC = "DOC-7"
DOC2 = "DOC-42"


# --- 类型一: forward 1-hop traversals (J3) ---
def g01_docs_by_author(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    a = g.authors.filter(F.col("name") == AUTHOR)
    e = g.edges_of(REL_AUTHORED)
    return (
        F.broadcast(a)
        .join(e, a.author_id == e.src)
        .join(g.docs, e.dst == g.docs.doc_id)
        .select("title", "year", "label")
    )


G01_SQL = GRAPH_ORACLE_CTES + f"""
SELECT d.title, d.year, d.label
FROM authors a JOIN e_authored e ON a.author_id = e.src
JOIN docs d ON e.dst = d.doc_id
WHERE a.name = '{AUTHOR}'
"""


def g02_keywords_of_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    d = g.docs.filter(F.col("title") == DOC)
    e = g.edges_of(REL_HAS_KEYWORD)
    return (
        F.broadcast(d)
        .join(e, d.doc_id == e.src)
        .join(g.keywords, e.dst == g.keywords.keyword_id)
        .select(F.col("name").alias("keyword"))
        .distinct()
    )


G02_SQL = GRAPH_ORACLE_CTES + f"""
SELECT DISTINCT k.name AS keyword
FROM docs d JOIN e_has_keyword e ON d.doc_id = e.src
JOIN keywords k ON e.dst = k.keyword_id
WHERE d.title = '{DOC}'
"""


def g03_orgs_of_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    d = g.docs.filter(F.col("title") == DOC)
    e = g.edges_of(REL_PUBLISHED_BY)
    return (
        F.broadcast(d)
        .join(e, d.doc_id == e.src)
        .join(g.orgs, e.dst == g.orgs.org_id)
        .select(F.col("name").alias("org"))
        .distinct()
    )


G03_SQL = GRAPH_ORACLE_CTES + f"""
SELECT DISTINCT o.name AS org
FROM docs d JOIN e_published_by e ON d.doc_id = e.src
JOIN orgs o ON e.dst = o.org_id
WHERE d.title = '{DOC}'
"""


def g04_topics_of_author(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    a = g.authors.filter(F.col("name") == AUTHOR)
    ea = g.edges_of(REL_AUTHORED)
    et = g.edges_of(REL_HAS_TOPIC).withColumnRenamed("src", "tsrc").withColumnRenamed("dst", "tdst")
    topics = g.topics.withColumnRenamed("name", "topic")
    return (
        F.broadcast(a)
        .join(ea, a.author_id == ea.src)
        .join(et, ea.dst == F.col("tsrc"))
        .join(topics, F.col("tdst") == topics.topic_id)
        .select("topic")
        .distinct()
    )


G04_SQL = GRAPH_ORACLE_CTES + f"""
SELECT DISTINCT t.name AS topic
FROM authors a JOIN e_authored ea ON a.author_id = ea.src
JOIN e_has_topic et ON ea.dst = et.src
JOIN topics t ON et.dst = t.topic_id
WHERE a.name = '{AUTHOR}'
"""


# --- 类型二: reverse 1-hop traversals (J4) ---
def g05_docs_by_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    k = g.keywords.filter(F.col("name") == KEYWORD)
    e = g.edges_of(REL_HAS_KEYWORD)
    return (
        F.broadcast(k)
        .join(e, k.keyword_id == e.dst)
        .join(g.docs, e.src == g.docs.doc_id)
        .select("title", "year")
        .distinct()
    )


G05_SQL = GRAPH_ORACLE_CTES + f"""
SELECT DISTINCT d.title, d.year
FROM keywords k JOIN e_has_keyword e ON k.keyword_id = e.dst
JOIN docs d ON e.src = d.doc_id
WHERE k.name = '{KEYWORD}'
"""


def g06_docs_by_org(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    o = g.orgs.filter(F.col("name") == ORG)
    e = g.edges_of(REL_PUBLISHED_BY)
    return (
        F.broadcast(o)
        .join(e, o.org_id == e.dst)
        .join(g.docs, e.src == g.docs.doc_id)
        .select("title", "year", "label")
        .distinct()
    )


G06_SQL = GRAPH_ORACLE_CTES + f"""
SELECT DISTINCT d.title, d.year, d.label
FROM orgs o JOIN e_published_by e ON o.org_id = e.dst
JOIN docs d ON e.src = d.doc_id
WHERE o.name = '{ORG}'
"""


def g07_docs_per_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    e = g.edges_of(REL_AUTHOR_ADDRESS)
    return (
        e.join(F.broadcast(g.addresses), e.dst == g.addresses.address_id)
        .groupBy(F.col("name").alias("address"))
        .agg(F.count("*").alias("n_docs"))
    )


G07_SQL = GRAPH_ORACLE_CTES + """
SELECT ad.name AS address, count(*) AS n_docs
FROM e_author_address e JOIN addresses ad ON e.dst = ad.address_id
GROUP BY ad.name
"""


# --- 类型三: property lookup + aggregate-over-traversal (J5, A4) ---
def g08_doc_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    return g.docs.filter(F.col("title") == DOC2).select(
        "title", "year", "label", "status", F.round("totalprice", 2).alias("totalprice")
    )


G08_SQL = GRAPH_ORACLE_CTES + f"""
SELECT title, year, label, status, round(totalprice, 2) AS totalprice
FROM docs WHERE title = '{DOC2}'
"""


def g09_docs_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    # label-union predicate P10: all doc labels as one scan.
    g = build_graph(spark, sf_dir)
    return (
        g.docs.filter(F.col("label").isin(["Patent", "Journal_Article", "Book", "Thesis", "Conference_Proceedings"]))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.min("year").alias("min_year"), F.max("year").alias("max_year"))
    )


G09_SQL = GRAPH_ORACLE_CTES + """
SELECT label, count(*) AS n, min(year) AS min_year, max(year) AS max_year
FROM docs
WHERE label IN ('Patent', 'Journal_Article', 'Book', 'Thesis', 'Conference_Proceedings')
GROUP BY label
"""


def g10_docs_per_year_for_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q.txt Q10 "papers with keyword X per year" — the flagship (SURVEY §7 M0).
    g = build_graph(spark, sf_dir)
    k = g.keywords.filter(F.col("name") == KEYWORD)
    e = g.edges_of(REL_HAS_KEYWORD)
    return (
        F.broadcast(k)
        .join(e, k.keyword_id == e.dst)
        .join(g.docs, e.src == g.docs.doc_id)
        .select("doc_id", "year")
        .distinct()
        .groupBy("year")
        .agg(F.count("*").alias("n_docs"))
    )


G10_SQL = GRAPH_ORACLE_CTES + f"""
SELECT year, count(*) AS n_docs
FROM (SELECT DISTINCT d.doc_id, d.year
      FROM keywords k JOIN e_has_keyword e ON k.keyword_id = e.dst
      JOIN docs d ON e.src = d.doc_id
      WHERE k.name = '{KEYWORD}') t
GROUP BY year
"""


# --- 类型四: relationship-existence checks (J6 semi-join) ---
def g11_author_wrote_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    d = g.docs.filter(F.col("title") == DOC)
    e = g.edges_of(REL_AUTHORED)
    authored = e.join(F.broadcast(d), e.dst == d.doc_id, "left_semi")
    hits = g.authors.join(authored, g.authors.author_id == authored.src, "left_semi").filter(
        F.col("name") == AUTHOR
    )
    return hits.agg(F.count("*").alias("n_matches"))


G11_SQL = GRAPH_ORACLE_CTES + f"""
SELECT count(*) AS n_matches
FROM authors a
WHERE a.name = '{AUTHOR}'
  AND EXISTS (SELECT 1 FROM e_authored e JOIN docs d ON e.dst = d.doc_id
              WHERE e.src = a.author_id AND d.title = '{DOC}')
"""


def g12_doc_has_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    d = g.docs.filter(F.col("title") == DOC)
    k = g.keywords.filter(F.col("name") == KEYWORD)
    e = g.edges_of(REL_HAS_KEYWORD)
    hit = (
        e.join(F.broadcast(d), e.src == d.doc_id, "left_semi")
        .join(F.broadcast(k), F.col("dst") == k.keyword_id, "left_semi")
    )
    return hit.agg(F.count("*").alias("n_matches"))


G12_SQL = GRAPH_ORACLE_CTES + f"""
SELECT count(*) AS n_matches
FROM e_has_keyword e
WHERE EXISTS (SELECT 1 FROM docs d WHERE d.doc_id = e.src AND d.title = '{DOC}')
  AND EXISTS (SELECT 1 FROM keywords k WHERE k.keyword_id = e.dst AND k.name = '{KEYWORD}')
"""


# --- 类型五: 2-hop co-occurrence self-joins (J7) ---
def g13_cooccurring_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    e = g.edges_of(REL_HAS_KEYWORD)
    k = g.keywords.filter(F.col("name") == KEYWORD)
    docs_with_k = e.join(F.broadcast(k), e.dst == k.keyword_id, "left_semi").select("src").distinct()
    other = (
        e.join(docs_with_k, "src")
        .join(g.keywords, e.dst == g.keywords.keyword_id)
        .filter(F.col("name") != KEYWORD)
    )
    return (
        other.groupBy(F.col("name").alias("keyword"))
        .agg(F.countDistinct("src").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("keyword"))
        .limit(20)
    )


G13_SQL = GRAPH_ORACLE_CTES + f"""
SELECT k2.name AS keyword, count(DISTINCT e2.src) AS n_docs
FROM (SELECT DISTINCT e.src FROM e_has_keyword e
      JOIN keywords k ON e.dst = k.keyword_id WHERE k.name = '{KEYWORD}') dk
JOIN e_has_keyword e2 ON e2.src = dk.src
JOIN keywords k2 ON e2.dst = k2.keyword_id
WHERE k2.name <> '{KEYWORD}'
GROUP BY k2.name
ORDER BY n_docs DESC, keyword ASC
LIMIT 20
"""


def g14_copublishing_orgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    e = g.edges_of(REL_PUBLISHED_BY)
    o = g.orgs.filter(F.col("name") == ORG)
    docs_of_o = e.join(F.broadcast(o), e.dst == o.org_id, "left_semi").select("src").distinct()
    other = (
        e.join(docs_of_o, "src")
        .join(g.orgs, e.dst == g.orgs.org_id)
        .filter(F.col("name") != ORG)
    )
    return (
        other.groupBy(F.col("name").alias("org"))
        .agg(F.countDistinct("src").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("org"))
        .limit(20)
    )


G14_SQL = GRAPH_ORACLE_CTES + f"""
SELECT o2.name AS org, count(DISTINCT e2.src) AS n_docs
FROM (SELECT DISTINCT e.src FROM e_published_by e
      JOIN orgs o ON e.dst = o.org_id WHERE o.name = '{ORG}') dk
JOIN e_published_by e2 ON e2.src = dk.src
JOIN orgs o2 ON e2.dst = o2.org_id
WHERE o2.name <> '{ORG}'
GROUP BY o2.name
ORDER BY n_docs DESC, org ASC
LIMIT 20
"""


# --- 类型六: 3- and 4-hop traversals (J8) ---
def g15_org_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    o = g.orgs.filter(F.col("name") == ORG)
    ep = g.edges_of(REL_PUBLISHED_BY)
    et = g.edges_of(REL_HAS_TOPIC).withColumnRenamed("src", "tsrc").withColumnRenamed("dst", "tdst")
    topics = g.topics.withColumnRenamed("name", "topic")
    return (
        F.broadcast(o)
        .join(ep, o.org_id == ep.dst)
        .join(et, ep.src == F.col("tsrc"))
        .join(F.broadcast(topics), F.col("tdst") == topics.topic_id)
        .groupBy("topic")
        .agg(F.countDistinct("tsrc").alias("n_docs"))
    )


G15_SQL = GRAPH_ORACLE_CTES + f"""
SELECT t.name AS topic, count(DISTINCT et.src) AS n_docs
FROM orgs o JOIN e_published_by ep ON o.org_id = ep.dst
JOIN e_has_topic et ON ep.src = et.src
JOIN topics t ON et.dst = t.topic_id
WHERE o.name = '{ORG}'
GROUP BY t.name
"""


def g16_related_authors_via_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 4-hop: Author → Doc → Keyword → Doc → Author — a Q16-STYLE variant
    # of the 类型六 class (the literal Q16 chain routes through coauthors
    # and is empty on single-author fixtures; see
    # nl/engine.t_coauthor_doc_topics for the literal chain).
    # ONE implementation of the join chain: the NL-facing template owns
    # it (nl/engine.t_related_authors_via_keywords, the n10 spec), and
    # the direct query delegates — the n10-vs-g16 gate equality is then
    # structural, not a two-copy coincidence.
    from ..nl.engine import t_related_authors_via_keywords

    return t_related_authors_via_keywords(build_graph(spark, sf_dir), AUTHOR)


G16_SQL = GRAPH_ORACLE_CTES + f"""
SELECT a2.name AS author, count(DISTINCT mk.kw) AS n_shared_keywords
FROM (SELECT DISTINCT ek.dst AS kw
      FROM e_authored ea
      JOIN authors a ON ea.src = a.author_id
      JOIN e_has_keyword ek ON ek.src = ea.dst
      WHERE a.name = '{AUTHOR}') mk
JOIN e_has_keyword ek2 ON ek2.dst = mk.kw
JOIN e_authored ea2 ON ea2.dst = ek2.src
JOIN authors a2 ON ea2.src = a2.author_id
WHERE a2.name <> '{AUTHOR}'
GROUP BY a2.name
ORDER BY n_shared_keywords DESC, author ASC
LIMIT 20
"""


# --- alias expansion (J9): keyword OR any ALIAS_OF target ---
def g17_alias_expanded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = build_graph(spark, sf_dir)
    k = g.keywords.filter(F.col("name") == KEYWORD).select("keyword_id")
    alias = g.edges_of(REL_ALIAS_OF)
    # ids reachable via ALIAS_OF in either direction, plus the ids themselves
    fwd = alias.join(F.broadcast(k), alias.src == k.keyword_id, "left_semi").select(F.col("dst").alias("keyword_id"))
    bwd = alias.join(F.broadcast(k), alias.dst == k.keyword_id, "left_semi").select(F.col("src").alias("keyword_id"))
    ids = k.unionByName(fwd).unionByName(bwd).distinct()
    e = g.edges_of(REL_HAS_KEYWORD)
    return (
        e.join(F.broadcast(ids), e.dst == ids.keyword_id, "left_semi")
        .join(g.docs, e.src == g.docs.doc_id)
        .select("title", "year")
        .distinct()
    )


G17_SQL = GRAPH_ORACLE_CTES + f""",
kids AS (SELECT keyword_id FROM keywords WHERE name = '{KEYWORD}'),
ids AS (
  SELECT keyword_id FROM kids
  UNION SELECT a.dst FROM e_alias_of a JOIN kids ON a.src = kids.keyword_id
  UNION SELECT a.src FROM e_alias_of a JOIN kids ON a.dst = kids.keyword_id)
SELECT DISTINCT d.title, d.year
FROM e_has_keyword e JOIN ids ON e.dst = ids.keyword_id
JOIN docs d ON e.src = d.doc_id
"""


# --- fallback full-text search (Q3/J10, P7-P9) over `documents` ---
FB_TERMS = ("spark", "join")


def g18_fulltext_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AND-of-terms regex fallback (`neo4j_query_executor.py:414-419`):
    # re-expressed as a conjunction of contains() — SURVEY §7 hard part (e).
    docs = load_table(spark, sf_dir, "documents")
    cond = F.lit(True)
    for t in FB_TERMS:
        cond = cond & F.col("text").contains(t)
    return (
        docs.filter(cond)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
        .limit(100)
    )


G18_SQL = f"""
SELECT doc_id, lang, source FROM documents
WHERE text LIKE '%{FB_TERMS[0]}%' AND text LIKE '%{FB_TERMS[1]}%'
ORDER BY doc_id LIMIT 100
"""


def g19_fulltext_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    # OR-of-terms case-insensitive regex (`neo4j_query_executor.py:427-441`).
    docs = load_table(spark, sf_dir, "documents")
    pattern = "(?i)(" + "|".join(FB_TERMS) + ")"
    return (
        docs.filter(F.col("text").rlike(pattern))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


G19_SQL = f"""
SELECT lang, count(*) AS n_docs FROM documents
WHERE regexp_matches(text, '(?i)({FB_TERMS[0]}|{FB_TERMS[1]})')
GROUP BY lang
"""


def g20_motif_author_keyword_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative motif surface (GraphFrames-style find()): per author,
    how many distinct keywords their documents reach — the 2-hop
    (a)-[:AUTHORED]->(d); (d)-[:HAS_KEYWORD]->(k) pattern compiled to
    the same join chain the hand-written traversals use."""
    from ..operators.motif import find

    g = build_graph(spark, sf_dir)
    m = find(g, "(a)-[:AUTHORED]->(d); (d)-[:HAS_KEYWORD]->(k)", attrs=False)
    return (
        m.groupBy("a_id")
        .agg(F.countDistinct("k_id").alias("n_keywords"))
        .orderBy(F.desc("n_keywords"), F.asc("a_id"))
        .limit(20)
        .select(F.col("a_id").alias("author_id"), "n_keywords")
    )


G20_SQL = GRAPH_ORACLE_CTES + """
SELECT a.src AS author_id, count(DISTINCT k.dst) AS n_keywords
FROM e_authored a JOIN e_has_keyword k ON a.dst = k.src
GROUP BY a.src
ORDER BY n_keywords DESC, author_id ASC
LIMIT 20
"""


SPECS = [
    QuerySpec("g01_docs_by_author", g01_docs_by_author, G01_SQL, "graph", "类型一: docs by author (J3)"),
    QuerySpec("g02_keywords_of_doc", g02_keywords_of_doc, G02_SQL, "graph", "类型一: keywords of doc"),
    QuerySpec("g03_orgs_of_doc", g03_orgs_of_doc, G03_SQL, "graph", "类型一: orgs of doc"),
    QuerySpec("g04_topics_of_author", g04_topics_of_author, G04_SQL, "graph", "类型一: topics of author's docs"),
    QuerySpec("g05_docs_by_keyword", g05_docs_by_keyword, G05_SQL, "graph", "类型二: docs by keyword (J4)"),
    QuerySpec("g06_docs_by_org", g06_docs_by_org, G06_SQL, "graph", "类型二: docs by org"),
    QuerySpec("g07_docs_per_address", g07_docs_per_address, G07_SQL, "graph", "类型二: docs per address"),
    QuerySpec("g08_doc_properties", g08_doc_properties, G08_SQL, "graph", "类型三: property lookup (J5)"),
    QuerySpec("g09_docs_per_label", g09_docs_per_label, G09_SQL, "graph", "P10 label-union scan"),
    QuerySpec("g10_docs_per_year_for_keyword", g10_docs_per_year_for_keyword, G10_SQL, "graph",
              "类型三: docs per year for keyword (A4; flagship)", bench=True),
    QuerySpec("g11_author_wrote_doc", g11_author_wrote_doc, G11_SQL, "graph", "类型四: existence (J6)"),
    QuerySpec("g12_doc_has_keyword", g12_doc_has_keyword, G12_SQL, "graph", "类型四: existence (J6)"),
    QuerySpec("g13_cooccurring_keywords", g13_cooccurring_keywords, G13_SQL, "graph",
              "类型五: co-occurring keywords (J7 self-join)", bench=True),
    QuerySpec("g14_copublishing_orgs", g14_copublishing_orgs, G14_SQL, "graph", "类型五: co-publishing orgs (J7)"),
    QuerySpec("g15_org_topics", g15_org_topics, G15_SQL, "graph", "类型六: 3-hop org→doc→topic (J8)"),
    QuerySpec("g16_related_authors_via_keywords", g16_related_authors_via_keywords, G16_SQL, "graph",
              "类型六: 4-hop author→doc→kw→doc→author (J8; Q16-style keyword "
              "variant, literal coauthor chain empty on fixture)", bench=True),
    QuerySpec("g17_alias_expanded_docs", g17_alias_expanded_docs, G17_SQL, "graph", "J9 alias expansion"),
    QuerySpec("g18_fulltext_and", g18_fulltext_and, G18_SQL, "graph", "fallback AND-of-terms (P8/J10)"),
    QuerySpec("g19_fulltext_or", g19_fulltext_or, G19_SQL, "graph", "fallback OR-of-terms regex (P9)"),
    QuerySpec("g20_motif_author_keyword_reach", g20_motif_author_keyword_reach, G20_SQL, "graph",
              "motif find() surface: 2-hop author→doc→keyword reach"),
]
