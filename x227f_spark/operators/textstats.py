"""Text-analysis operators for the training-data pipeline over the
``documents`` table (doc_id, text, lang, source, n_chars):

- token counting (whitespace tokenizer, JVM-side split)
- quality scoring (length / distinct-ratio / token-length stats)
- language-ID (stopword-list n-gram heuristic, pure joins+aggs)
- document fingerprinting (canonical bag-of-words hash)

All pure ``pyspark.sql.functions`` — no Python in the hot path; each has an
exact DuckDB oracle (same column names, floats rounded identically before
output so the value-hash comparison is stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed marker-word profiles for the language-ID heuristic. The driver corpus
# is synthetic word soup, so the *prediction quality* is meaningless — the
# operator shape (explode → broadcast-join profile → argmax with pinned
# tie-break) is what scales to a real profile table.
LANG_MARKERS = {
    "en": ("the", "a", "data", "query", "fast"),
    "fr": ("table", "ligne", "colonne", "petit", "join"),
    "es": ("valor", "fila", "columna", "row", "slow"),
    "de": ("der", "die", "das", "scan", "merge"),
    "zh": ("hash", "batch", "stream", "window", "agg"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def tokens_col(text):
    return F.split(F.trim(text), r"\s+")


# ---------------------------------------------------------------------------

def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text) AS n_chars_actual
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    avg_len = F.round((F.length(F.col("text")) - (n - 1)) / n, 4)
    distinct_ratio = F.round(nd / n, 4)
    quality = F.round(F.least(n / F.lit(50.0), F.lit(1.0)) * (nd / n), 4)
    return docs.select(
        "doc_id", n.alias("n_tokens"), nd.alias("n_distinct"),
        avg_len.alias("avg_token_len"), distinct_ratio.alias("distinct_ratio"),
        quality.alias("quality"),
    )


TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct,
       round((length(text) - (len(toks) - 1)) / len(toks)::DOUBLE, 4)
           AS avg_token_len,
       round(len(list_distinct(toks)) / len(toks)::DOUBLE, 4)
           AS distinct_ratio,
       round(least(len(toks) / 50.0, 1.0)
             * (len(list_distinct(toks)) / len(toks)::DOUBLE), 4) AS quality
FROM t
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    profile = spark.createDataFrame(
        [(lang, w) for lang, ws in sorted(LANG_MARKERS.items()) for w in ws],
        "cand_lang string, marker string")
    tok = docs.select("doc_id",
                      F.explode(tokens_col(F.col("text"))).alias("tok"))
    hits = (tok.join(F.broadcast(profile), tok["tok"] == profile["marker"])
            .groupBy("doc_id", "cand_lang").agg(F.count("*").alias("hits")))
    # argmax as a partial-aggregating groupBy instead of a window sort:
    # min(struct(-hits, cand_lang)) ≡ row_number over (hits DESC,
    # cand_lang ASC) = 1 — same winner, same tie-break, map-side reduced
    # before the exchange (guide §2.3)
    best = (hits.groupBy("doc_id")
            .agg(F.min(F.struct((-F.col("hits")).alias("nh"),
                                F.col("cand_lang"))).alias("b"))
            .select("doc_id", F.col("b.cand_lang").alias("predicted_lang"),
                    (-F.col("b.nh")).alias("hits")))
    return (docs.select("doc_id").join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("predicted_lang", F.lit("und"))
                     .alias("predicted_lang"),
                    F.coalesce("hits", F.lit(0)).alias("hits")))


def lang_id_sql() -> str:
    rows = ", ".join(f"('{lang}', '{w}')"
                     for lang, ws in sorted(LANG_MARKERS.items()) for w in ws)
    return f"""
WITH profile(cand_lang, marker) AS (VALUES {rows}),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
hits AS (
  SELECT doc_id, cand_lang, count(*) AS hits
  FROM tok JOIN profile ON tok.tok = profile.marker
  GROUP BY doc_id, cand_lang
),
best AS (
  SELECT doc_id, cand_lang AS predicted_lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand_lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id,
       coalesce(b.predicted_lang, 'und') AS predicted_lang,
       coalesce(b.hits, 0) AS hits
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON d.doc_id = b.doc_id
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical bag-of-words fingerprint: sha256 of the sorted distinct
    token list — U8-style truncation (image.rs:184-191)."""
    docs = _docs(spark, sf_dir)
    toks = tokens_col(F.col("text"))
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return docs.select(
        "doc_id", F.substring(F.sha2(canon, 256), 1, 32).alias("fingerprint"))


FINGERPRINT_SQL = """
SELECT doc_id,
       substr(sha256(array_to_string(
           list_sort(list_distinct(regexp_split_to_array(trim(text), '\\s+'))),
           ' ')), 1, 32) AS fingerprint
FROM documents
"""
