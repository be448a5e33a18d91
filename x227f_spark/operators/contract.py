"""Driver-contract entries for the UDF-shaped crawl operators (SURVEY.md
§5.6): U1-U5 canonicalization, E1-E3 extraction, T5/P8 budget pass, X2/X3
image byte ops, plus the SQL-expressible J5/G7/O3/O4/T4 shapes.

Each entry runs the PRODUCTION operator (the same pandas UDF / DataFrame
pipeline plans/rounds.py executes) over inputs synthesized *deterministically*
from the driver tables, so the driver's per-round check exercises the real
code path. The pure-Python URL/byte logic has no faithful ANSI-SQL
equivalent, so those entries are rows-only by design (the driver records the
weaker rows+schema check); the relational shapes carry full value oracles.

Reference ids cited per SURVEY.md §2 (urlutil.py ⇄ url.rs, extract_logic.py
⇄ page.rs:148-298, fetch.py budget pass ⇄ image.rs:26-65).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

from ..constants import EngineConfig
from ..extract_logic import candidate_scrape_order
from ..functions.urlnorm import (
    make_clean_page_url_udf,
    page_id_udf,
    url_join_udf,
)
from ..operators import fetch as fetch_ops
from .. import imagebytes
from ..urlutil import Url, transform_image_url_clean

US = "\x1f"


def _docs(spark, sf_dir) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _base_url_col():
    """Deterministic page URL per doc — mixed case/port/dot-segments so U1
    normalization has something to do."""
    return F.concat(
        F.lit("HTTPS://"), F.col("source"), F.lit(".Example.com:443/a/../"),
        F.col("lang"), F.lit("/p"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/index.html"))
        .otherwise(F.lit("/")),
        F.lit("?ref=track&q=1#frag"))


# ---------------------------------------------------------------------------
# U1-U5 — URL canonicalization scalar ops (rows-only; url.rs semantics)
# ---------------------------------------------------------------------------

def u1_page_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — PageId normalization (data.rs:520-556)."""
    return _docs(spark, sf_dir).select(
        "doc_id", _base_url_col().alias("url"),
        page_id_udf(_base_url_col()).alias("page_id"))


def u2_clean_page_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — tracking-param strip + normalization (page.rs:246-258)."""
    clean_udf = make_clean_page_url_udf(("ref", "si"))
    url = F.concat(_base_url_col(), F.lit("&si=abc&keep=1"))
    return _docs(spark, sf_dir).select(
        "doc_id", url.alias("url"), clean_udf(url).alias("cleaned"))


@pandas_udf(StringType())
def _image_clean_udf(urls: pd.Series) -> pd.Series:
    def _c(u):
        p = Url.parse(u)
        return transform_image_url_clean(p).to_string() if p else u

    return urls.map(_c)


def _image_url_col():
    return F.concat(
        F.lit("https://"), F.col("source"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(".files.neocities.org/img/b"))
        .otherwise(F.lit(".example.net/cdn-cgi/image/w=88/img/b")),
        F.col("doc_id").cast("string"), F.lit(".png"))


def u3_image_url_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — canonical image URL (image.rs:273-288 transforms)."""
    return _docs(spark, sf_dir).select(
        "doc_id", _image_url_col().alias("image_url"),
        _image_clean_udf(_image_url_col()).alias("cleaned"))


def u4_image_url_bypass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 — the URL actually requested (image.rs:290) — the engine's own
    bypass UDF (operators/fetch.py)."""
    return _docs(spark, sf_dir).select(
        "doc_id", _image_url_col().alias("image_url"),
        fetch_ops.bypass_url_udf(_image_url_col()).alias("requested"))


def u5_url_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 — RFC-3986 relative resolution (url.rs join semantics)."""
    rel = (F.when(F.col("doc_id") % 5 == 0, F.lit("../up/x.html"))
           .when(F.col("doc_id") % 5 == 1, F.lit("/rooted/y.png"))
           .when(F.col("doc_id") % 5 == 2, F.lit("sibling.gif"))
           .when(F.col("doc_id") % 5 == 3, F.lit("//other.example.org/z"))
           .otherwise(F.lit("?q=only")))
    return _docs(spark, sf_dir).select(
        "doc_id", rel.alias("rel"),
        url_join_udf(_base_url_col(), rel).alias("resolved"))


# ---------------------------------------------------------------------------
# E1-E3 — span extraction (page.rs:148-298) via the production extract UDF
# ---------------------------------------------------------------------------

_SPAN_SCHEMA = ("array<struct<kind:string,text:string,media_ref:string,"
                "offset:int>>")


def _span(kind, text, media_ref, off):
    return F.struct(F.lit(kind).alias("kind"), text.alias("text"),
                    media_ref.alias("media_ref"),
                    F.lit(off).cast("int").alias("offset"))


def _spans_col():
    """Deterministic span stream per doc: a wrapped button (anchor+img), a
    bare img, an 88x31-attr img, an over-long href, a rejected-width img,
    and enough internal anchors to trip the E3 8-link truncation."""
    d = F.col("doc_id")
    btn_src = F.concat(F.lit("/b/btn"), (d % 11).cast("string"), F.lit(".png"))
    attrs = F.concat(F.lit("alt "), (d % 5).cast("string"), F.lit(US),
                     F.when(d % 3 == 0, F.lit("")).otherwise(F.lit("t")),
                     F.lit(US + "88" + US + "31"))
    bad_attrs = F.lit("x" + US + US + "100" + US + "31")
    href = F.concat(F.lit("https://target"), (d % 7).cast("string"),
                    F.lit(".example.org/?ref=x"))
    long_href = F.concat(F.lit("/"), F.repeat(F.lit("y"), 300))
    anchors = [
        _span("anchor", F.concat(F.lit("/int/"), ((d + F.lit(i)) % 12)
                                 .cast("string")), F.lit(None).cast("string"),
              10 + i)
        for i in range(10)  # 10 candidates → truncated to max 8
    ]
    spans = F.array(
        _span("anchor", href, F.lit(None).cast("string"), 0),
        _span("img", attrs, btn_src, 1),
        _span("img", F.lit(US.join(("", "", "", ""))),
              F.concat(F.lit("bare"), (d % 4).cast("string"), F.lit(".gif")),
              2),
        _span("img", bad_attrs, F.lit("rejected.png"), 3),
        _span("anchor", long_href, F.lit(None).cast("string"), 4),
        *anchors,
    )
    return spans.cast(_SPAN_SCHEMA)


def _extracted(spark, sf_dir) -> DataFrame:
    extract_udf = fetch_ops.make_extract_udf(EngineConfig())
    base = F.concat(F.lit("https://src"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com/pages/p"),
                    F.col("doc_id").cast("string"), F.lit("/"))
    return (_docs(spark, sf_dir)
            .select("doc_id", extract_udf(_spans_col(), base).alias("ext")))


def e1_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — img-candidate extraction: one row per kept candidate."""
    return (_extracted(spark, sf_dir)
            .select("doc_id", F.posexplode("ext.candidates")
                    .alias("ord", "c"))
            .select("doc_id", "ord", F.col("c.src").alias("src"),
                    F.col("c.image_url").alias("image_url"),
                    F.col("c.alt").alias("alt"),
                    F.col("c.title").alias("title")))


def e2_anchor_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — wrapping-anchor attribution: candidates that got an href."""
    return (_extracted(spark, sf_dir)
            .select("doc_id", F.explode("ext.candidates").alias("c"))
            .where(F.col("c.href").isNotNull())
            .select("doc_id", F.col("c.src").alias("src"),
                    F.col("c.href").alias("href")))


def e3_link_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — internal links minus button hrefs, ≤256 chars, first 8."""
    return (_extracted(spark, sf_dir)
            .select("doc_id",
                    F.size("ext.internal_links").alias("n_links"),
                    F.array_join("ext.internal_links", ",").alias("links")))


# ---------------------------------------------------------------------------
# T5 + P8 — candidate rotation & scrape-budget pass (image.rs:26-65)
# ---------------------------------------------------------------------------

@pandas_udf(StringType())
def _scrape_order_udf(n: pd.Series) -> pd.Series:
    return n.map(lambda v: ",".join(map(str, candidate_scrape_order(int(v)))))


def t5_candidate_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — deterministic candidate rotation order for n candidates."""
    n = (F.col("n_chars") % 160).cast("int")
    return (_docs(spark, sf_dir)
            .select("doc_id", n.alias("n_candidates"),
                    _scrape_order_udf(n).alias("scrape_order")))


def p8_budget_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — the production partition-level budget pass over a synthesized
    candidate table: docs whose first 101 rotated candidates contain no
    button keep nothing; others keep every button."""
    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        d.alias("crawl_pos"),
        F.explode(F.sequence(F.lit(0), (F.col("n_chars") % 120).cast("int")))
        .alias("ord"))
    # dispositions: sparse valid buttons; doc_id%7==0 docs get none at all
    valid = ((F.col("crawl_pos") + F.col("ord")) % 9 == 0) \
        & (F.col("crawl_pos") % 7 != 0)
    cand = docs.select(
        "crawl_pos", F.col("ord").cast("int").alias("ord"),
        F.concat(F.lit("https://img.example/b"),
                 F.col("ord").cast("string")).alias("image_url"),
        F.lit(None).cast("string").alias("href"),
        F.lit("a").alias("alt"), F.lit(None).cast("string").alias("title"),
        F.lit(False).alias("cache_fresh"),
        F.lit(None).cast("string").alias("c_hash"),
        F.lit(None).cast("string").alias("c_ext"),
        F.lit(None).cast("timestamp").alias("c_last"),
        F.when(valid, F.lit("valid")).otherwise(F.lit("not_button"))
        .alias("disposition"),
        F.when(valid, F.sha2(F.concat(F.lit("h"), F.col("ord").cast("string")),
                             256)).alias("hash"),
        F.when(valid, F.lit("png")).alias("file_ext"),
        F.when(valid, F.concat(F.lit("https://img.example/b"),
                               F.col("ord").cast("string"))).alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("now"))
    kept = fetch_ops.budget_pass(cand, num_partitions=8)
    return kept.select("crawl_pos", "ord", "hash", "file_ext")


# ---------------------------------------------------------------------------
# X2/X3 — image re-encode & format sniffing (image.rs:193-267, rows-only)
# ---------------------------------------------------------------------------

@pandas_udf(StructType([
    StructField("fmt", StringType()), StructField("ext", StringType()),
    StructField("width", IntegerType()), StructField("height", IntegerType()),
    StructField("is_button", BooleanType()),
]))
def _sniff_udf(doc_id: pd.Series) -> pd.DataFrame:
    out = {"fmt": [], "ext": [], "width": [], "height": [], "is_button": []}
    fmts = ("png", "gif", "bmp", "jpeg")
    for d in doc_id:
        fmt = fmts[int(d) % 4]
        w, h = (88, 31) if d % 3 != 0 else (100, 31)
        data = imagebytes.make_image(fmt, w, h, seed=int(d))
        g = imagebytes.guess_format(data)
        dims = imagebytes.image_dimensions(data, g)
        out["fmt"].append(g)
        out["ext"].append(imagebytes.format_extension(g) if g else None)
        out["width"].append(dims[0] if dims else None)
        out["height"].append(dims[1] if dims else None)
        out["is_button"].append(imagebytes.validate_image_size(data, g) is True)
    return pd.DataFrame(out)


def x3_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — magic-byte sniffing + dimension parse + 88x31 gate over
    deterministic synthetic images (imagebytes.make_image)."""
    return (_docs(spark, sf_dir)
            .select("doc_id", _sniff_udf(F.col("doc_id")).alias("s"))
            .select("doc_id", "s.fmt", "s.ext", "s.width", "s.height",
                    "s.is_button"))


@pandas_udf(StructType([
    StructField("len_before", IntegerType()),
    StructField("len_after", IntegerType()),
    StructField("changed", BooleanType()),
    StructField("pixels_equal", BooleanType()),
]))
def _reencode_udf(doc_id: pd.Series) -> pd.DataFrame:
    from ..imagebytes import png_pixels, reencode_png

    out = {"len_before": [], "len_after": [], "changed": [],
           "pixels_equal": []}
    for d in doc_id:
        # deliberately suboptimal source (level-1 deflate, y-gradient rows)
        # so the optimizer has real work; even docs stay level-9/flat and
        # exercise the keep-original branch
        data = imagebytes.make_png(88, 31, seed=int(d),
                                   level=1 if d % 2 else 9,
                                   gradient=bool(d % 2))
        re = reencode_png(data)
        out["len_before"].append(len(data))
        out["len_after"].append(len(re))
        out["changed"].append(re != data)
        out["pixels_equal"].append(png_pixels(data) == png_pixels(re))
    return pd.DataFrame(out)


def x2_png_reencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — lossless PNG recompression (image.rs:193-230 approximated with
    a max-level zlib IDAT rewrite): bytes change, pixels don't."""
    return (_docs(spark, sf_dir)
            .select("doc_id", _reencode_udf(F.col("doc_id")).alias("r"))
            .select("doc_id", "r.len_before", "r.len_after", "r.changed",
                    "r.pixels_equal"))


def x2x3_image_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+X3 as ONE driver entry: the external 50-query cap forces the
    rows-only tail to spill a few entries per round; merging the two
    image-byte operators halves that pressure while still exercising both
    code paths end-to-end (re-encode results joined on doc_id with the
    sniffer's view of the same synthetic images). Self-checks the X2
    invariant inline: a row whose pixels changed is a correctness break,
    not a data point."""
    joined = (x2_png_reencode(spark, sf_dir)
              .join(x3_format_sniff(spark, sf_dir), "doc_id"))
    # assert_true lives in a FILTER predicate (returns NULL when the
    # invariant holds, raises otherwise) — a dropped assert column would
    # just be pruned by Catalyst and never evaluated
    return (joined.where(F.assert_true(
                F.col("pixels_equal"),
                F.lit("X2 re-encode altered pixels")).isNull())
            .select("doc_id", "len_before", "len_after", "changed",
                    "pixels_equal", "fmt", "ext", "width", "height",
                    "is_button"))


# ---------------------------------------------------------------------------
# J5 / G7 / O3 / O4 / T4 — SQL-expressible shapes (full value oracles)
# ---------------------------------------------------------------------------

def j5_dict_encode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — dictionary-encode a string column and join ids back
    (processed.rs:98-101 shape)."""
    from .ranked import global_row_number

    docs = _docs(spark, sf_dir)
    dic = (global_row_number(docs.select("source").distinct(), ["source"],
                             "j5_rn")
           .select("source", (F.col("j5_rn") - 1).cast("int")
                   .alias("source_id")))
    return (docs.join(dic, "source")
            .select("doc_id", "source", "source_id"))


J5_SQL = """
WITH dic AS (
  SELECT source, row_number() OVER (ORDER BY source) - 1 AS source_id
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.doc_id, d.source, dic.source_id
FROM documents d JOIN dic USING (source)
"""


def g7_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 — per-round metrics rollup shape (counts + sums per action),
    over the events stream."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value"),
                 F.countDistinct("user_id").alias("n_users")))


G7_SQL = """
SELECT event_type, count(*) AS n,
       round(sum(value), 4) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def o3_except_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — links ∖ hrefs with cap-8 truncation (page.rs:286-292 shape):
    per customer, first 8 order keys not in the 'F'-status set."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return (orders.where(F.col("o_orderstatus") != "F")
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 8)
            .select(F.col("o_custkey").alias("src"),
                    F.col("o_orderkey").alias("kept_key"), "rk"))


O3_SQL = """
SELECT o_custkey AS src, o_orderkey AS kept_key, rk
FROM (SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderkey) AS rk
      FROM orders WHERE o_orderstatus != 'F')
WHERE rk <= 8
"""


def o4_distinct_by_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — first-occurrence dedup (page.rs:196-199 existing_img_urls):
    first lineitem per (orderkey) by linenumber."""
    li = _t(spark, sf_dir, "lineitem")
    # (l_linenumber, l_partkey, l_suppkey) — the synthetic lineitem reuses
    # line numbers, so the pinned tie-break makes the "first" total
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey",
                                            "l_suppkey")
    return (li.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("l_orderkey", F.col("l_partkey").alias("first_part")))


O4_SQL = """
SELECT l_orderkey, l_partkey AS first_part
FROM (SELECT l_orderkey, l_partkey,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey,
                                         l_suppkey) AS rn
      FROM lineitem)
WHERE rn = 1
"""


def t4_top_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 — top-n score dump rows (pagerank.rs:137-147 / data.rs:220-224):
    the debug-dump DataFrame the S9 sink writes."""
    from .relational import g2_pagerank

    return (g2_pagerank(spark, sf_dir)
            .orderBy(F.desc("score"), F.asc("node_id"))
            .limit(20)
            .select("node_id", "score"))


def t4_top_scores_sql() -> str:
    from .relational import g2_pagerank_sql

    return (f"SELECT node_id, score FROM ({g2_pagerank_sql()})\n"
            f"ORDER BY score DESC, node_id ASC LIMIT 20")


def _t(spark, sf_dir, name) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
