"""Deduplication operators for the training-data pipeline over
``documents`` — the four standard families:

- exact:          hash-groupBy (content sha256)
- n-gram Jaccard: shingle → candidate pairs via shared shingle → verify
- MinHash + LSH:  shingle → k minhashes → banded buckets → bucket join
- SimHash:        token hashes → per-bit majority vote → 64-bit signature

Everything is pure DataFrame algebra (explode / groupBy / window /
self-join) — the shapes that scale: candidate generation never goes O(n²);
pairs only materialize for docs sharing a shingle/band bucket. Portable
hashing (sha256 hex, JVM-side) keeps the DuckDB oracles value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .qcache import scoped_persist
from .textstats import tokens_col

MINHASH_K = 64         # hash functions (production-shaped; was 8 in round 1)
MINHASH_BANDS = 16     # bands of 4 rows → candidates at jaccard ≳ 0.55
SHINGLE = 3            # words per shingle
JACCARD_THRESHOLD = 0.5
# Kirsch-Mitzenmacher double hashing: h_i = (h1 + i*h2) mod P with h1/h2
# cut from ONE sha256 per shingle — 64 portable hash functions at the cost
# of one digest (doing 64 independent sha256s per shingle was the round-1
# minhash cost center)
MINHASH_P = 1_000_000_007

_HEX = "0123456789abcdef"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def shingles_of_tokens(toks):
    """Distinct 3-word shingles from a MATERIALIZED token-array column.

    ``toks`` must be a plain column reference, not the ``split`` expression
    itself: higher-order-function lambdas are interpreted with no common-
    subexpression elimination, so an embedded ``split`` would re-tokenize
    the document for every element access (measured r7: 8.4 s → 0.5 s for
    the sf0.1 shingle pass after materializing the tokens — guide §4.2).
    ``arrays_zip`` of three shifted slices builds each shingle with O(1)
    array work per element (no per-index ``element_at`` probing); the
    produced strings and their order are byte-identical to the round-6
    ``transform(sequence(...), element_at)`` formulation, so the DuckDB
    oracle SQL is unchanged.
    """
    n = F.size(toks)
    m = F.greatest(n - SHINGLE + 1, F.lit(1))
    z = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m),
                     F.slice(toks, 3, m))
    sh = F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]))
    return F.when(n >= SHINGLE, F.array_distinct(sh)) \
            .otherwise(F.array_distinct(F.array(F.array_join(toks, " "))))


_SHINGLES_SQL = """
  CASE WHEN len(toks) >= 3 THEN
    list_distinct(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
  ELSE list_distinct([array_to_string(toks, ' ')]) END
"""


def _doc_shingles(spark, sf_dir) -> DataFrame:
    """Per-doc distinct shingles — persisted: re-referenced by candidate
    generation AND verification within one query, and Spark's cache lookup
    matches the identical analyzed plan across the jaccard/minhash
    operators, so the shingle stage is computed once per session/sf."""
    docs = _docs(spark, sf_dir)
    # A small corpus scans as 1-2 parquet splits (single row group), and a
    # persisted DataFrame keeps its child's partitioning — so every
    # downstream compute pass over the cache (the 64 minhash aggregates,
    # the prefix-join explode) would run on one core (measured r7: the
    # minhash signature stage was a 5.4 s single task). Spread the cache
    # across the session's compute width only when the scan is narrower
    # than the core count; a production-sized input already scans wide and
    # skips the extra exchange (guide §2.5 input-skew remedy: "repartition
    # immediately after the read").
    if docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        docs = docs.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "doc_id")
    toked = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    ds = scoped_persist(toked.select(
        "doc_id", shingles_of_tokens(F.col("toks")).alias("shingles")))
    # materialize the cache eagerly: the jaccard query references it from
    # two CONCURRENT jobs (the dfreq chain and the prefix broadcast
    # subtree), and two jobs racing to build the same uncached
    # InMemoryRelation each recompute every partition (duplicate shingle
    # work + core contention, one winner per block). One tiny count pins
    # the blocks before the fan-out; later calls see the warm cache.
    ds.count()
    return ds


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (docs.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_dups")))


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS content_hash,
       min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents
GROUP BY sha256(text)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard near-dup pairs with **prefix filtering** (AllPairs /
    PPJoin candidate pruning).

    Candidates are generated only from each document's *prefix* — its first
    ``n - ceil(t*n) + 1`` shingles under a global rarest-first order
    (document frequency asc, shingle asc). Prefix-filter lemma: two sets
    with overlap ≥ α must collide within their ``len - α + 1`` prefixes of
    any shared total order, and jaccard ≥ t implies overlap ≥ ceil(t·n) for
    each side — so every qualifying pair still collides and the final
    result is IDENTICAL to the naive shared-shingle join. High-df template
    shingles sort to the ends of documents and drop out of candidate
    generation entirely, which removes the round-1 quadratic fan-out
    (44 s → the pair count collapses to the near-dup groups themselves).
    """
    ds = _doc_shingles(spark, sf_dir)
    exploded = ds.select("doc_id", F.size("shingles").alias("n"),
                         F.explode("shingles").alias("s"))
    dfreq = exploded.groupBy("s").agg(F.count("*").alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "s")
    prefix_len = (F.col("n")
                  - F.ceil(F.col("n") * F.lit(JACCARD_THRESHOLD)) + 1)
    pref = (exploded.join(dfreq, "s")
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= prefix_len)
            .select("doc_id", "s", "n"))
    pref = scoped_persist(pref)  # both sides of the candidate self-join
    pref.count()  # pin before the self-join's two jobs race to build it
    # AllPairs length filter in the join condition: jaccard >= t implies
    # |inter| <= min(na, nb) and |union| >= max(na, nb), so min/max >= t
    # is necessary — pruning size-incompatible pairs BEFORE the distinct
    # and the array verify can never drop a qualifying pair (r7: cuts the
    # sf0.1 candidate set 409,103 -> 309,803 with an identical result).
    size_ok = (F.least(F.col("a.n"), F.col("b.n"))
               >= F.lit(JACCARD_THRESHOLD)
               * F.greatest(F.col("a.n"), F.col("b.n")))
    pairs = (pref.alias("a").join(
        pref.alias("b"),
        (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        & size_ok)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct())
    # hash-spread the verify stage on doc_a: the candidate pairs are a few
    # AQE-coalesced partitions of near-zero bytes but the array_intersect
    # verify is the query's CPU center — repartitioning the skinny id
    # pairs (guide §8: move the light proxy, attach payloads last) spreads
    # it across the session's compute width, and at scale this is the very
    # exchange a non-broadcast verify join would need anyway.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pairs = pairs.repartition(n_part, "doc_a")
    sa = ds.select(F.col("doc_id").alias("doc_a"),
                   F.col("shingles").alias("sh_a"))
    sb = ds.select(F.col("doc_id").alias("doc_b"),
                   F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter / union, 4)
    return (pairs.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD))


DEDUP_NGRAM_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), ds AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t
), ex AS (
  SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM ds
), dfreq AS (
  SELECT s, count(*) AS df FROM ex GROUP BY s
), pref AS (
  SELECT doc_id, s FROM (
    SELECT e.doc_id, e.s, e.n,
           row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.s) AS rk
    FROM ex e JOIN dfreq d USING (s))
  WHERE rk <= n - CAST(ceil({JACCARD_THRESHOLD} * n) AS BIGINT) + 1
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(len(list_intersect(sa.shingles, sb.shingles))
             / (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles)))::DOUBLE,
             4) AS jaccard
FROM pairs p
JOIN ds sa ON sa.doc_id = p.doc_a
JOIN ds sb ON sb.doc_id = p.doc_b
WHERE round(len(list_intersect(sa.shingles, sb.shingles))
            / (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles)))::DOUBLE,
            4) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _hex_int_col(h, start: int, width: int):
    """Portable hex→int: nibble-by-nibble positional sum. The identical
    strpos arithmetic runs in the DuckDB oracle, so the value (not just the
    semantics) is engine-independent."""
    v = F.lit(0).cast("long")
    for j in range(width):
        v = v * 16 + (F.instr(F.lit(_HEX),
                              F.substring(h, start + j, 1)) - 1).cast("long")
    return v


def _hex_int_sql(col: str, start: int, width: int) -> str:
    expr = "CAST(0 AS BIGINT)"
    for j in range(width):
        expr = (f"({expr} * 16 + "
                f"(strpos('{_HEX}', substr({col}, {start + j}, 1)) - 1))")
    return expr


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signature_i(doc) = min over shingles of (h1 + i*h2) mod P, with
    (h1, h2) cut from one sha256 per shingle (Kirsch-Mitzenmacher) — k
    portable hash functions for one digest, k min-aggs in one groupBy."""
    ds = _doc_shingles(spark, sf_dir)
    ex = ds.select("doc_id", F.explode("shingles").alias("s"))
    # materialize the digest behind a projection boundary: _hex_int_col
    # references it 7 times per half, and only codegen'd projections get
    # subexpression elimination — the interpreted fallback would otherwise
    # recompute sha2 14x per shingle (guide §4.2 flavor of the same
    # HOF/CSE pitfall fixed in shingles_of_tokens)
    ex = ex.select("doc_id", F.sha2(F.col("s"), 256).alias("h"))
    ex = ex.select("doc_id", _hex_int_col(F.col("h"), 1, 7).alias("h1"),
                   _hex_int_col(F.col("h"), 8, 7).alias("h2"))
    aggs = [
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(MINHASH_P))
        .alias(f"mh{i}")
        for i in range(MINHASH_K)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(spark, sf_dir)
    rows_per_band = MINHASH_K // MINHASH_BANDS
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.sha2(F.concat_ws("|", *[
                     F.col(f"mh{b * rows_per_band + j}").cast("string")
                     for j in range(rows_per_band)]), 256).alias("bucket"))
        for b in range(MINHASH_BANDS)
    ])
    bucketed = scoped_persist(  # both sides of the bucket self-join
        sig.select("doc_id", F.explode(bands).alias("bb"))
           .select("doc_id", F.col("bb.band").alias("band"),
                   F.col("bb.bucket").alias("bucket")))
    # pin the cache before the self-join: its two scans run as concurrent
    # jobs, and racing jobs each recompute the whole signature chain (the
    # 64-aggregate pass) while building the same uncached blocks
    bucketed.count()
    return (bucketed.alias("a").join(
        bucketed.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct())


def dedup_minhash_sql() -> str:
    rows_per_band = MINHASH_K // MINHASH_BANDS
    mh_cols = ", ".join(
        f"min((h1 + {i} * h2) % {MINHASH_P}) AS mh{i}"
        for i in range(MINHASH_K))
    band_structs = ", ".join(
        "({b}, sha256({cat}))".format(
            b=b, cat=" || '|' || ".join(
                f"mh{b * rows_per_band + j}::VARCHAR"
                for j in range(rows_per_band)))
        for b in range(MINHASH_BANDS))
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), ds AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t
), ex0 AS (
  SELECT doc_id, sha256(unnest(shingles)) AS h FROM ds
), ex AS (
  SELECT doc_id, {_hex_int_sql('h', 1, 7)} AS h1,
         {_hex_int_sql('h', 8, 7)} AS h2 FROM ex0
), sig AS (
  SELECT doc_id, {mh_cols} FROM ex GROUP BY doc_id
), bucketed AS (
  SELECT doc_id, b.* FROM sig,
  LATERAL (VALUES {band_structs}) AS b(band, bucket)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bucketed a JOIN bucketed b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over token occurrences; portable bit extraction from
    sha256 hex nibbles (same arithmetic in the oracle)."""
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("t"))
    h16 = F.substring(F.sha2(F.col("t"), 256), 1, 16)
    tok = tok.select("doc_id", h16.alias("h"))
    sums = []
    for j in range(16):
        nib = F.instr(F.lit(_HEX), F.substring(F.col("h"), j + 1, 1)) - 1
        for b in range(4):
            bit = F.shiftright(nib, b).bitwiseAND(F.lit(1))
            sums.append(F.sum(bit * 2 - 1).alias(f"s_{j}_{b}"))
    agg = tok.groupBy("doc_id").agg(*sums)
    out_nibbles = []
    for j in range(16):
        val = sum(
            (F.when(F.col(f"s_{j}_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
             for b in range(4)), F.lit(0))
        out_nibbles.append(F.substring(F.lit(_HEX), val + 1, 1))
    return agg.select("doc_id", F.concat(*out_nibbles).alias("simhash"))


def dedup_simhash_sql() -> str:
    sums = []
    for j in range(16):
        nib = f"(strpos('{_HEX}', substr(h, {j + 1}, 1)) - 1)"
        for b in range(4):
            bit = f"(({nib} // {1 << b}) % 2)"
            sums.append(f"sum({bit} * 2 - 1) AS s_{j}_{b}")
    nibbles = []
    for j in range(16):
        val = " + ".join(
            f"(CASE WHEN s_{j}_{b} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(4))
        nibbles.append(f"substr('{_HEX}', ({val}) + 1, 1)")
    return f"""
WITH tok AS (
  SELECT doc_id,
         substr(sha256(unnest(regexp_split_to_array(trim(text), '\\s+'))),
                1, 16) AS h
  FROM documents
), agg AS (
  SELECT doc_id, {', '.join(sums)} FROM tok GROUP BY doc_id
)
SELECT doc_id, {' || '.join(nibbles)} AS simhash FROM agg
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (over the embeddings table)
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.9


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: candidates are generated per IVF bucket (vectors sharing a
    nearest centroid), so the pairwise comparison is per-bucket, not global
    O(n²); the centroid assignment is the same operator as ann_ivf_assign.
    """
    from .similarity import _dot, _norm, ivf_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign = ivf_assign(spark, sf_dir).select("vec_id", "centroid_id")
    v = (emb.join(assign, "vec_id")
         .select("vec_id", "centroid_id", F.col("embedding").alias("v")))
    # norms once per row, not per pair (see similarity.ivf_assign) —
    # identical float product, so the oracle hash is unchanged
    v = v.select("vec_id", "centroid_id", "v", _norm(F.col("v")).alias("nv"))
    a = v.select(F.col("vec_id").alias("id_a"), "centroid_id",
                 F.col("v").alias("va"), F.col("nv").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"),
                 F.col("centroid_id").alias("cb"), F.col("v").alias("vb"),
                 F.col("nv").alias("nb"))
    pairs = a.join(b, (F.col("centroid_id") == F.col("cb"))
                   & (F.col("id_a") < F.col("id_b")))
    cos = F.round(_dot(F.col("va"), F.col("vb"))
                  / (F.col("na") * F.col("nb")), 6)
    return (pairs.select("id_a", "id_b", cos.alias("cos_sim"))
            .where(F.col("cos_sim") >= COSINE_DUP_THRESHOLD))


DEDUP_EMBEDDING_SQL = f"""
WITH k AS (
  SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id,
         list_transform(embedding, x -> x::DOUBLE) AS cv
  FROM embeddings WHERE vec_id < (SELECT k FROM k)
), v0 AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), scored AS (
  SELECT vec_id, centroid_id,
         round(list_dot_product(cv, v)
               / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(v, v))),
               6) AS sim
  FROM v0 CROSS JOIN cent
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, centroid_id ASC) AS rn
    FROM scored) WHERE rn = 1
), vv AS (
  SELECT v0.vec_id, a.centroid_id, v0.v
  FROM v0 JOIN assign a ON v0.vec_id = a.vec_id
)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       round(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v))
                * sqrt(list_dot_product(y.v, y.v))), 6) AS cos_sim
FROM vv x JOIN vv y
  ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
WHERE round(list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v))
               * sqrt(list_dot_product(y.v, y.v))), 6) >= {COSINE_DUP_THRESHOLD}
"""
