"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the engine's frontier-refresh pipeline shape
(PageRank join-agg → threshold filter → pinned-tiebreak top-k) over the
sf0.001 tables.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (crawl operators re-expressed over the driver tables) plus the
training-data pipeline operators (dedup / similarity / text analysis /
multimodal). Column names and float rounding are pinned identically on both
sides so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from x227f_spark.operators import contract, dedup, multimodal, relational, similarity, textstats  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: rank the order-graph with the engine's PageRank
    operator, then run the T2 threshold-top-k admission over it."""
    sf_dir = "/root/testdata/sf0.001"
    scores = relational.g2_pagerank(spark, sf_dir)
    return (scores.where(F.col("score") >= 0.151)
            .orderBy(F.desc("score"), F.asc("node_id"))
            .limit(10_000))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordering contract: the driver runs only the FIRST 50 entries, so every
    oracle-backed query (i.e. every key of ``oracle_sql()``) is listed first —
    38 of them — followed by the rows-only block. tools/check_oracles.py
    asserts this prefix invariant so a future addition can't silently push an
    oracle-backed query past the cap again (round-3 regression: o3/o4/t4)."""
    return {
        # ---- oracle-backed (must all precede the rows-only block) ----
        # crawl operators (SURVEY.md §2) over driver tables
        "f1_host_suffix_filter": relational.f1_host_suffix_filter,
        "f12_recrawl_due": relational.f12_recrawl_due,
        "g1_dictionary": relational.g1_dictionary,
        "g2_pagerank": relational.g2_pagerank,
        "g4_group_collect": relational.g4_group_collect,
        "g5_inverted_index": relational.g5_inverted_index,
        "g6_stats": relational.g6_stats,
        "j2_admission_antijoin": relational.j2_admission_antijoin,
        "j4_redirect_chain": relational.j4_redirect_chain,
        "o1_union_distinct": relational.o1_union_distinct,
        "t2_threshold_topk": relational.t2_threshold_topk,
        "t3_per_host_budget": relational.t3_per_host_budget,
        "u6_source_filename": relational.u6_source_filename,
        "u7_host_shorten": relational.u7_host_shorten,
        "u8_content_hash": relational.u8_content_hash,
        "o2_except_gc": relational.o2_except_gc,
        "g3_outdegree": relational.g3_outdegree,
        "j1_cache_lookup": relational.j1_cache_lookup,
        "p4_backoff_merge": relational.p4_backoff_merge,
        "j5_dict_encode_join": contract.j5_dict_encode_join,
        "g7_metrics": contract.g7_metrics,
        "o3_except_truncate": contract.o3_except_truncate,
        "o4_distinct_by_first": contract.o4_distinct_by_first,
        "t4_top_scores": contract.t4_top_scores,
        # training-data pipeline operators
        "dedup_exact": dedup.dedup_exact,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_embedding_cosine": dedup.dedup_embedding_cosine,
        "ann_cosine_topk": similarity.cosine_topk,
        "ann_ivf_assign": similarity.ivf_assign,
        "ann_ivf_bucket_stats": similarity.ivf_bucket_stats,
        "text_token_count": textstats.token_count,
        "text_quality": textstats.text_quality,
        "text_lang_id": textstats.lang_id,
        "text_fingerprint": textstats.fingerprint,
        "mm_decode_features": multimodal.decode_features,
        "mm_frame_sample": multimodal.frame_sample,
        # ---- rows-only block (may spill past the driver's 50-query cap) ----
        # Rotated per round (see _rotate_tail) so the 2 entries the cap
        # drops differ every round — the union of any few consecutive
        # rounds covers the full set. Production ANN (sampled k-means +
        # two-level coarse quantizer + multi-probe + hot-bucket salting):
        # k-means output is not SQL-expressible — rows-only entries that
        # SELF-ASSERT their invariants (agreement with flat argmax /
        # recall vs exact top-k; verify=True is the contract mode — the
        # production default runs zero exact scans and zero collects) and
        # raise on a break, so the driver row is meaningful without a
        # DuckDB oracle; also pytest-verified (tests/test_ann.py).
        **_rotate_tail({
            "ann_ivf_assign_prod":
                lambda s, d: similarity.ivf_assign_production(
                    s, d, verify=True),
            "ann_multiprobe_topk":
                lambda s, d: similarity.ann_query_multiprobe(
                    s, d, verify=True),
            # UDF-shaped crawl operators (operators/contract.py). U1-U5,
            # E1-E3, T5/P8, X2/X3 are pure-Python URL/byte logic with no
            # faithful ANSI-SQL twin → rows-only driver check by design
            # (SURVEY.md §5.6). X2+X3 share one merged entry
            # (contract.x2x3_image_bytes) to relieve cap pressure.
            "u1_page_id": contract.u1_page_id,
            "u2_clean_page_url": contract.u2_clean_page_url,
            "u3_image_url_clean": contract.u3_image_url_clean,
            "u4_image_url_bypass": contract.u4_image_url_bypass,
            "u5_url_join": contract.u5_url_join,
            "e1_span_extract": contract.e1_span_extract,
            "e2_anchor_match": contract.e2_anchor_match,
            "e3_link_truncate": contract.e3_link_truncate,
            "t5_candidate_rotation": contract.t5_candidate_rotation,
            "p8_budget_pass": contract.p8_budget_pass,
            "x2x3_image_bytes": contract.x2x3_image_bytes,
            "ann_buckets_salted": similarity.ivf_buckets_salted,
        }),
    }


def _rotate_tail(tail: dict) -> dict:
    """Round-keyed rotation of the rows-only tail: the driver caps its run
    at the first 50 queries() entries, which drops the LAST len(queries)-50
    rows-only entries. Rotating the tail's order by the number of recorded
    correctness rounds (CORRECTNESS_r*.json files in the repo root — a
    deterministic, driver-maintained round counter) shifts which entries
    spill each round, so every rows-only operator gets periodic driver
    evidence. The oracle-backed prefix above is NOT rotated — the
    check_oracles.py prefix invariant (every oracle-backed entry inside the
    cap) holds for any rotation."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    k = len(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    names = list(tail)
    k %= len(names)
    return {n: tail[n] for n in names[k:] + names[:k]}


def oracle_sql() -> dict[str, str]:
    return {
        "f1_host_suffix_filter": relational.F1_SQL,
        "f12_recrawl_due": relational.F12_SQL,
        "g1_dictionary": relational.G1_SQL,
        "g2_pagerank": relational.g2_pagerank_sql(),
        "g4_group_collect": relational.G4_SQL,
        "g5_inverted_index": relational.G5_SQL,
        "g6_stats": relational.G6_SQL,
        "j2_admission_antijoin": relational.J2_SQL,
        "j4_redirect_chain": relational.J4_SQL,
        "o1_union_distinct": relational.O1_SQL,
        "t2_threshold_topk": relational.T2_SQL,
        "t3_per_host_budget": relational.T3_SQL,
        "u6_source_filename": relational.U6_SQL,
        "u7_host_shorten": relational.U7_SQL,
        "u8_content_hash": relational.U8_SQL,
        "o2_except_gc": relational.O2_SQL,
        "g3_outdegree": relational.G3_SQL,
        "j1_cache_lookup": relational.J1_SQL,
        "p4_backoff_merge": relational.P4_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": dedup.DEDUP_NGRAM_SQL,
        "dedup_minhash_lsh": dedup.dedup_minhash_sql(),
        "dedup_simhash": dedup.dedup_simhash_sql(),
        "dedup_embedding_cosine": dedup.DEDUP_EMBEDDING_SQL,
        "ann_cosine_topk": similarity.COSINE_TOPK_SQL,
        "ann_ivf_assign": similarity.IVF_ASSIGN_SQL,
        "ann_ivf_bucket_stats": similarity.IVF_BUCKET_STATS_SQL,
        "text_token_count": textstats.TOKEN_COUNT_SQL,
        "text_quality": textstats.TEXT_QUALITY_SQL,
        "text_lang_id": textstats.lang_id_sql(),
        "text_fingerprint": textstats.FINGERPRINT_SQL,
        "mm_decode_features": multimodal.DECODE_FEATURES_SQL,
        "mm_frame_sample": multimodal.FRAME_SAMPLE_SQL,
        "j5_dict_encode_join": contract.J5_SQL,
        "g7_metrics": contract.G7_SQL,
        "o3_except_truncate": contract.O3_SQL,
        "o4_distinct_by_first": contract.O4_SQL,
        "t4_top_scores": contract.t4_top_scores_sql(),
    }
