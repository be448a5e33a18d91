"""Crawl-engine operators re-expressed over the driver's TPC-H-ish tables so
the DuckDB oracle can value-check them (SURVEY.md §5.6). Each function is the
*same DataFrame shape* the engine uses in production (plans/rounds.py), with
driver columns standing in for crawl state.

Operator ids cited per SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .pagerank import pagerank_iterations
from ..functions.urlnorm import (
    hosts_list_contains_col,
    sha256_trunc32_col,
    source_filename_col,
)


def _t(spark, sf_dir, name) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# F12 — recrawl-due predicate (data.rs:243-259), over orders
# ---------------------------------------------------------------------------

NOW_EPOCH = 986083200  # 2001-04-01 00:00:00 UTC — mid-range of o_orderdate


def f12_recrawl_due(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    failed = (F.col("o_orderkey") % 4).cast("int")
    lv = F.unix_timestamp(F.col("o_orderdate"))
    backoff_due = lv + 3600 * F.pow(F.lit(2.0), failed - 1) < NOW_EPOCH
    popular = F.col("o_totalprice") > 200000
    interval_h = F.when(popular, F.lit(24)).otherwise(F.lit(720))
    recrawl_due = lv + 3600 * interval_h < NOW_EPOCH
    due = F.when(failed > 0, backoff_due).otherwise(recrawl_due)
    return orders.select(
        "o_orderkey", failed.alias("failed"), due.alias("due"))


F12_SQL = f"""
SELECT o_orderkey,
       (o_orderkey % 4)::INT AS failed,
       CASE WHEN (o_orderkey % 4) > 0 THEN
         epoch(o_orderdate) + 3600 * pow(2.0, (o_orderkey % 4) - 1) < {NOW_EPOCH}
       ELSE
         epoch(o_orderdate)
           + 3600 * (CASE WHEN o_totalprice > 200000 THEN 24 ELSE 720 END)
           < {NOW_EPOCH}
       END AS due
FROM orders
"""


# ---------------------------------------------------------------------------
# G2 — PageRank over a derived graph (pagerank.rs:103-120)
# ---------------------------------------------------------------------------

PR_MOD = 100
PR_ITERS = 3


def g2_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's real join-agg operator on edges derived from orders:
    src=o_custkey%M, dst=o_orderkey%M, w=1. Self-links excluded from inbound
    but counted in outdeg — the reference quirk, same in the SQL oracle."""
    orders = _t(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % PR_MOD).cast("long").alias("src"),
        (F.col("o_orderkey") % PR_MOD).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"))
    nodes = (edges.select(F.col("src").alias("node_id"))
             .union(edges.select("dst")).distinct())
    scores = spark.createDataFrame([], "node_id long, score double")
    # node ids are moduli — at most 2*PR_MOD distinct, far below the
    # layout threshold, so the invariant-side hash+sort cache is skipped
    out = pagerank_iterations(nodes, edges, scores, PR_ITERS,
                              approx_nodes=2 * PR_MOD)
    return out.select("node_id", F.round("score", 6).alias("score"))


def g2_pagerank_sql() -> str:
    setup = f"""
WITH edges AS (
  SELECT (o_custkey % {PR_MOD})::BIGINT AS src,
         (o_orderkey % {PR_MOD})::BIGINT AS dst,
         1.0::DOUBLE AS weight
  FROM orders
), nodes AS (
  SELECT DISTINCT src AS node_id FROM edges
  UNION SELECT DISTINCT dst FROM edges
), outdeg AS (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src
), contrib AS (
  SELECT e.src, e.dst, e.weight / o.outdeg AS frac
  FROM edges e JOIN outdeg o ON e.src = o.src
  WHERE e.src != e.dst
), s0 AS (
  SELECT node_id, 1.0::DOUBLE AS score FROM nodes
)"""
    body = ""
    prev = "s0"
    for i in range(1, PR_ITERS + 1):
        body += f""", s{i} AS (
  SELECT n.node_id,
         0.15 + 0.85 * coalesce(sum(c.frac * p.score), 0.0) AS score
  FROM nodes n
  LEFT JOIN contrib c ON c.dst = n.node_id
  LEFT JOIN {prev} p ON p.node_id = c.src
  GROUP BY n.node_id
)"""
        prev = f"s{i}"
    return (setup + body
            + f"\nSELECT node_id, round(score, 6) AS score FROM {prev}")


# ---------------------------------------------------------------------------
# T1/T2 — threshold-bounded top-k (data.rs:226-275)
# ---------------------------------------------------------------------------

def t2_threshold_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (orders.where(F.col("o_totalprice") >= 100000)
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100)
            .select("o_orderkey", "o_totalprice"))


T2_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders WHERE o_totalprice >= 100000
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# T3/P1 — per-host politeness budget (data.rs:418-439)
# ---------------------------------------------------------------------------

def t3_per_host_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (orders.withColumn("slot", F.row_number().over(w))
            .where(F.col("slot") <= 3)
            .select(F.col("o_custkey").alias("host_key"),
                    "o_orderkey", "slot"))


T3_SQL = """
SELECT o_custkey AS host_key, o_orderkey, slot
FROM (SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS slot
      FROM orders)
WHERE slot <= 3
"""


# ---------------------------------------------------------------------------
# J2 — seen-set anti-join admission (data.rs:195-208)
# ---------------------------------------------------------------------------

def j2_admission_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (customer.join(orders.select(F.col("o_custkey").alias("c_custkey")),
                          "c_custkey", "left_anti")
            .select("c_custkey", "c_name"))


J2_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# ---------------------------------------------------------------------------
# J4 — bounded redirect-chain resolution (processed.rs:117-129)
# ---------------------------------------------------------------------------

def j4_redirect_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """redirects: even k → k/2; resolve ≤3 hops with coalesce — the same
    3 chained self-left-joins the processed export uses."""
    orders = _t(spark, sf_dir, "orders")
    red = orders.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("src"),
        (F.col("o_orderkey") / 2).cast("long").alias("dst"))
    base = orders.select(F.col("o_orderkey").alias("k"))
    r1 = red.select(F.col("src").alias("k"), F.col("dst").alias("d1"))
    r2 = red.select(F.col("src").alias("d1"), F.col("dst").alias("d2"))
    r3 = red.select(F.col("src").alias("d2"), F.col("dst").alias("d3"))
    return (base.join(r1, "k", "left").join(r2, "d1", "left")
            .join(r3, "d2", "left")
            .select("k", F.coalesce("d3", "d2", "d1", "k").alias("final_key")))


J4_SQL = """
WITH red AS (
  SELECT o_orderkey AS src, (o_orderkey / 2)::BIGINT AS dst
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT b.o_orderkey AS k,
       coalesce(r3.dst, r2.dst, r1.dst, b.o_orderkey) AS final_key
FROM orders b
LEFT JOIN red r1 ON r1.src = b.o_orderkey
LEFT JOIN red r2 ON r2.src = r1.dst
LEFT JOIN red r3 ON r3.src = r2.dst
"""


# ---------------------------------------------------------------------------
# G1 — sorted-distinct dictionary (processed.rs:49-96)
# ---------------------------------------------------------------------------

def g1_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary build via the scalable global ordinal (ranked.py) — a
    bare ``Window.orderBy`` row_number funnels the distinct set through
    one partition, the exact anti-pattern the engine's own dictionary
    builds (plans/processed.py) eliminated."""
    from .ranked import global_row_number

    docs = _t(spark, sf_dir, "documents")
    return (global_row_number(docs.select("lang").distinct(), ["lang"],
                              "g1_rn")
            .select("lang", (F.col("g1_rn") - 1).cast("int").alias("lang_id")))


G1_SQL = """
SELECT lang, (row_number() OVER (ORDER BY lang) - 1) AS lang_id
FROM (SELECT DISTINCT lang FROM documents)
"""


# ---------------------------------------------------------------------------
# G4/G5 — ordered grouped collect / inverted index (processed.rs:103-194)
# ---------------------------------------------------------------------------

def g4_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
                 .alias("doc_ids")))


G4_SQL = """
SELECT source, count(*) AS n_docs,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
FROM documents GROUP BY source
"""


def g5_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
            .agg(F.array_join(F.array_sort(F.collect_set("source")), ",")
                 .alias("sources"),
                 F.countDistinct("source").alias("n_sources")))


G5_SQL = """
SELECT lang,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# G6 — stats count (processed.rs:217-236)
# ---------------------------------------------------------------------------

def g6_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.countDistinct(F.sha2(F.col("text"), 256)).alias("distinct_texts"),
        F.count("*").alias("total_docs"))


G6_SQL = """
SELECT count(DISTINCT sha256(text)) AS distinct_texts,
       count(*) AS total_docs
FROM documents
"""


# ---------------------------------------------------------------------------
# O1 — union-distinct (data.rs:125-126)
# ---------------------------------------------------------------------------

def o1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    return (lineitem.select(F.col("l_suppkey").alias("key"))
            .union(supplier.select(F.col("s_suppkey")))
            .distinct())


O1_SQL = """
SELECT l_suppkey AS key FROM lineitem
UNION
SELECT s_suppkey FROM supplier
"""


# ---------------------------------------------------------------------------
# U6/U8/F1/U7 — URL scalar ops over derived host/path strings
# ---------------------------------------------------------------------------

def u8_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", sha256_trunc32_col(F.col("text")).alias("content_hash"))


U8_SQL = "SELECT doc_id, substr(sha256(text), 1, 32) AS content_hash FROM documents"


def u6_source_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    path = F.concat(F.lit("/img/"), F.col("lang"), F.lit("/"),
                    F.col("source"), F.lit(".v2.png/"))
    return docs.select("doc_id", path.alias("path"),
                       source_filename_col(path).alias("filename"))


U6_SQL = """
WITH t AS (
  SELECT doc_id, '/img/' || lang || '/' || source || '.v2.png/' AS path
  FROM documents
)
SELECT doc_id, path,
       string_split(
         regexp_extract(rtrim(path, '/'), '([^/]*)$', 1), '.')[1] AS filename
FROM t
"""


def f1_host_suffix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    hosts_list = ("src1.example.com", "example.com")
    return (docs.select("doc_id", host.alias("host"))
            .where(hosts_list_contains_col(host, hosts_list)))


F1_SQL = """
WITH t AS (SELECT doc_id, source || '.example.com' AS host FROM documents)
SELECT doc_id, host FROM t
WHERE host = 'src1.example.com' OR host LIKE '%.src1.example.com'
   OR host = 'example.com' OR host LIKE '%.example.com'
"""


def u7_host_shorten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive shortening terminates at ≤2 labels (ratelimiter.rs:56-62) —
    4-label input shortened twice."""
    docs = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("cdn.img."), F.col("source"), F.lit(".net"))
    parts = F.split(host, r"\.")
    final = F.array_join(F.slice(parts, F.size(parts) - 1, 2), ".")
    return docs.select("doc_id", host.alias("host"),
                       final.alias("crawl_delay_host")).distinct()


U7_SQL = """
SELECT DISTINCT doc_id, 'cdn.img.' || source || '.net' AS host,
       array_to_string(
         (string_split('cdn.img.' || source || '.net', '.'))[-2:],
         '.') AS crawl_delay_host
FROM documents
"""


# ---------------------------------------------------------------------------
# O2/O3 — except / anti set ops (garbagecollect.rs:18-28, page.rs:286-291)
# ---------------------------------------------------------------------------

def o2_except_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Files-on-disk minus linked files ≅ parts never shipped (J6 shape)."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    return (part.select(F.col("p_partkey").alias("key"))
            .subtract(lineitem.select(F.col("l_partkey").alias("key"))))


O2_SQL = """
SELECT p_partkey AS key FROM part
EXCEPT
SELECT l_partkey FROM lineitem
"""


# ---------------------------------------------------------------------------
# G3 — outdegree count incl. duplicates (pagerank.rs:50,78)
# ---------------------------------------------------------------------------

def g3_outdegree(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    edges = orders.select((F.col("o_custkey") % PR_MOD).alias("src"),
                          (F.col("o_orderkey") % PR_MOD).alias("dst"))
    return edges.groupBy("src").agg(F.count("*").alias("outdeg"))


G3_SQL = f"""
SELECT (o_custkey % {PR_MOD}) AS src, count(*) AS outdeg
FROM orders GROUP BY (o_custkey % {PR_MOD})
"""


# ---------------------------------------------------------------------------
# J1 — cache lookup with freshness + stale fallback (image.rs:75-125)
# ---------------------------------------------------------------------------

def j1_cache_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer=candidates, orders=cache: latest order per custkey is the
    cache entry; fresh iff within 168h of NOW; fallback=stale entry."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"),
                                           F.desc("o_orderkey"))
    cache = (orders.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1)
             .select(F.col("o_custkey").alias("c_custkey"),
                     F.col("o_orderkey").alias("cached_key"),
                     F.col("o_orderdate").alias("cached_at")))
    fresh = (F.unix_timestamp(F.col("cached_at")) + 168 * 3600
             > F.lit(NOW_EPOCH))
    return (customer.join(cache, "c_custkey", "left")
            .select("c_custkey", "cached_key",
                    F.when(F.col("cached_key").isNotNull(), fresh)
                    .otherwise(F.lit(False)).alias("fresh")))


J1_SQL = f"""
WITH cache AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS cached_key,
         o_orderdate AS cached_at
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC,
                                              o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
)
SELECT c.c_custkey, cache.cached_key,
       CASE WHEN cache.cached_key IS NOT NULL
            THEN epoch(cache.cached_at) + 168 * 3600 > {NOW_EPOCH}
            ELSE false END AS fresh
FROM customer c LEFT JOIN cache ON c.c_custkey = cache.c_custkey
"""


# ---------------------------------------------------------------------------
# P4 — failure/backoff merge semantics (main.rs:271-287)
# ---------------------------------------------------------------------------

def p4_backoff_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pages=customer, this-round errors=orders with status 'F'-ish: failed
    increments for error keys, resets for success keys — the MERGE shape."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    outcomes = (orders.groupBy(F.col("o_custkey").alias("c_custkey"))
                .agg(F.max(F.when(F.col("o_orderstatus") == "F", 1)
                           .otherwise(0)).alias("had_failure")))
    prev_failed = (F.col("c_custkey") % 3).cast("int")
    return (customer.join(outcomes, "c_custkey", "left")
            .select("c_custkey",
                    F.when(F.col("had_failure").isNull(), prev_failed)
                    .when(F.col("had_failure") == 1, prev_failed + 1)
                    .otherwise(F.lit(0)).alias("failed")))


P4_SQL = """
WITH outcomes AS (
  SELECT o_custkey AS c_custkey,
         max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS had_failure
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey,
       CASE WHEN o.had_failure IS NULL THEN (c.c_custkey % 3)::INT
            WHEN o.had_failure = 1 THEN (c.c_custkey % 3)::INT + 1
            ELSE 0 END AS failed
FROM customer c LEFT JOIN outcomes o ON c.c_custkey = o.c_custkey
"""
