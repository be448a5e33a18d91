"""J2 — broadcast Bloom filter fronting the exact seen-set anti-join.

The north_rule's admission design: a Bloom filter prunes the big anti-join,
the salted-hash-partitioned anti-join provides exactness (SURVEY.md §4).
Rows the Bloom rejects are *definitely new* and skip the join entirely; rows
it accepts go through the exact left-anti join. The filter is therefore an
optimization only — false positives cost a join probe, never correctness.

Implementation: k xxhash64 hash functions computed JVM-side
(``F.xxhash64`` with per-hash seed columns), per-partition numpy bitmaps
packed executor-side (Arrow batches) and OR-merged with a treeReduce,
broadcast to executors, membership tested by a vectorized pandas UDF
(numpy fancy indexing — no per-row Python).

Scale note (10^10 keys): a single 1%-FPR bloom is ~12 GB — too big to
broadcast whole. ``build_bloom(..., n_shards=S)`` implements the sharded
design: keys route to a shard by ``pmod(xxhash64(key), S)``, each shard
is an independent bitmap sized for ``expected/S`` keys and broadcast as
its OWN broadcast variable, and the probe side is hash-partitioned on the
shard id before probing — so a task only ever touches (and, on a real
cluster, only ever *fetches*: Spark broadcasts are pulled lazily on first
access) the one shard its partition needs. Per-task broadcast memory is
total/S instead of total. The anti-join behind it is unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


class BloomFilter:
    def __init__(self, bits: np.ndarray, m: int, k: int, broadcast):
        self.bits = bits
        self.m = m
        self.k = k
        self._broadcast = broadcast

    def _position_cols(self, key: Column) -> list[Column]:
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(self.m)).alias(f"_bloom_pos{i}")
            for i in range(self.k)
        ]

    def might_contain(self, df: DataFrame, key: Column) -> DataFrame:
        """Adds a boolean ``_bloom_hit`` column."""
        bc = self._broadcast
        k = self.k

        @pandas_udf("boolean")
        def _probe(*pos_cols: pd.Series) -> pd.Series:
            bits = bc.value
            hit = np.ones(len(pos_cols[0]), dtype=bool)
            for p in pos_cols:
                idx = p.to_numpy(dtype=np.int64)
                hit &= (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
            return pd.Series(hit)

        pos_names = [f"_bloom_pos{i}" for i in range(k)]
        df = df.withColumns(dict(zip(pos_names, self._position_cols(key))))
        df = df.withColumn("_bloom_hit", _probe(*[F.col(n) for n in pos_names]))
        return df.drop(*pos_names)


class ShardedBloomFilter:
    """S independent per-shard bitmaps, each its own broadcast variable.
    Same ``might_contain`` contract as :class:`BloomFilter`; the probe
    repartitions on the shard id so each task touches one shard."""

    def __init__(self, shard_bcs: dict, m: int, k: int, n_shards: int):
        self._shard_bcs = shard_bcs
        self.m = m
        self.k = k
        self.n_shards = n_shards

    def might_contain(self, df: DataFrame, key: Column) -> DataFrame:
        bcs = self._shard_bcs
        k, m, S = self.k, self.m, self.n_shards

        @pandas_udf("boolean")
        def _probe(shard: pd.Series, *pos_cols: pd.Series) -> pd.Series:
            sh = shard.to_numpy(dtype=np.int64)
            hit = np.ones(len(sh), dtype=bool)
            pos = [p.to_numpy(dtype=np.int64) for p in pos_cols]
            # group rows by shard; only the shards present in this batch
            # have their broadcast fetched/touched
            for s in np.unique(sh):
                bc = bcs.get(int(s))
                mask = sh == s
                if bc is None:  # shard saw no keys at build: definite miss
                    hit[mask] = False
                    continue
                bits = bc.value
                h = np.ones(int(mask.sum()), dtype=bool)
                for p in pos:
                    idx = p[mask]
                    h &= (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
                hit[mask] = h
            return pd.Series(hit)

        shard_col = F.pmod(F.xxhash64(F.lit(-1), key), F.lit(S))
        pos_names = [f"_bloom_pos{i}" for i in range(k)]
        df = df.withColumn("_bloom_shard", shard_col)
        df = df.withColumns({
            n: F.pmod(F.xxhash64(F.lit(i), key), F.lit(m))
            for i, n in enumerate(pos_names)})
        df = df.repartition(max(S, df.sparkSession.sparkContext
                                .defaultParallelism), "_bloom_shard")
        df = df.withColumn("_bloom_hit", _probe(
            F.col("_bloom_shard"), *[F.col(n) for n in pos_names]))
        return df.drop("_bloom_shard", *pos_names)


# Per-broadcast bitmap cap. One 1%-FPR bloom over 10^10 keys is ~12 GB —
# unbroadcastable whole; capping each shard at 256 MB yields S≈47 shards at
# the 10^10 design point while every realistic sandbox/bench seen set stays
# single-shard (a 256 MB bitmap covers ~2.2e8 keys at 1% FPR).
SHARD_BYTES_MAX = 256 << 20


def shards_for(expected: int, fpp: float = 0.01) -> int:
    """Shard count so each shard's bitmap fits under ``SHARD_BYTES_MAX`` —
    the engine wires this to its live seen-set count each round."""
    bits = max(64, int(-max(expected, 16) * math.log(fpp)
                       / (math.log(2) ** 2)))
    return max(1, -(-(bits >> 3) // SHARD_BYTES_MAX))


def build_bloom(df: DataFrame, key: Column, expected: int,
                fpp: float = 0.01, n_shards: int = 1):
    """Build a broadcast Bloom filter over ``key`` of ``df``.

    Fully distributed: hash positions are computed JVM-side
    (``F.xxhash64``), each partition packs its own bitmap with numpy
    (Arrow-batched — no per-row Python), and the partials are OR-combined
    with a ``treeReduce`` on the executors. Nothing key-proportional ever
    reaches the driver — only ``ceil(log(P))`` bitmap-sized partials, then
    the final bitmap (the thing being broadcast anyway). Round 1 collected
    every distinct bit position to the driver (k×n rows), a multi-GB
    driver funnel at 10^8 seen keys.
    """
    if n_shards > 1:
        return _build_sharded(df, key, expected, fpp, n_shards)
    expected = max(expected, 16)
    m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / expected * math.log(2)))
    k = min(k, 8)
    nbytes = (m >> 3) + 1

    pos_df = df.select(*[
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(m)).alias(f"p{i}")
        for i in range(k)
    ])

    def _partial(batches):
        import pyarrow as pa

        bits_p = np.zeros(nbytes, dtype=np.uint8)
        for batch in batches:
            for col in range(batch.num_columns):
                idx = batch.column(col).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                np.bitwise_or.at(bits_p, idx >> 3,
                                 (1 << (idx & 7)).astype(np.uint8))
        yield pa.RecordBatch.from_arrays(
            [pa.array([bits_p.tobytes()], type=pa.binary())], names=["bits"])

    partials = pos_df.mapInArrow(_partial, "bits binary")
    bits = (partials.rdd
            .map(lambda r: np.frombuffer(r["bits"], dtype=np.uint8))
            .treeReduce(np.bitwise_or))
    bits = np.asarray(bits, dtype=np.uint8)  # own the buffer
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bits)
    return BloomFilter(bits, m, k, bc)


def _build_sharded(df: DataFrame, key: Column, expected: int, fpp: float,
                   n_shards: int) -> ShardedBloomFilter:
    """Per-shard bitmaps built from shard-partitioned key sets. Each
    partition packs bitmaps only for the shards it holds (after the
    shard-hash repartition that is ~one shard per partition), partials
    OR-combine per shard on the executors, and each shard becomes its own
    broadcast — nothing whole-filter-sized exists anywhere."""
    per_shard = max(expected // n_shards, 16)
    m = max(64, int(-per_shard * math.log(fpp) / (math.log(2) ** 2)))
    k = min(8, max(1, round(m / per_shard * math.log(2))))
    nbytes = (m >> 3) + 1

    pos_df = df.select(
        F.pmod(F.xxhash64(F.lit(-1), key), F.lit(n_shards)).alias("_sh"),
        *[F.pmod(F.xxhash64(F.lit(i), key), F.lit(m)).alias(f"p{i}")
          for i in range(k)],
    ).repartition(n_shards, "_sh")

    def _partial(batches):
        import pyarrow as pa

        maps: dict[int, np.ndarray] = {}
        for batch in batches:
            sh = batch.column(0).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            for col in range(1, batch.num_columns):
                idx = batch.column(col).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                for s in np.unique(sh):
                    bits_p = maps.setdefault(
                        int(s), np.zeros(nbytes, dtype=np.uint8))
                    part = idx[sh == s]
                    np.bitwise_or.at(bits_p, part >> 3,
                                     (1 << (part & 7)).astype(np.uint8))
        if maps:
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(maps.keys()), type=pa.int32()),
                 pa.array([b.tobytes() for b in maps.values()],
                          type=pa.binary())],
                names=["shard", "bits"])

    partials = pos_df.mapInArrow(_partial, "shard int, bits binary")
    merged = (partials.rdd
              .map(lambda r: (r["shard"],
                              np.frombuffer(r["bits"], dtype=np.uint8)))
              .reduceByKey(np.bitwise_or)
              .collect())  # <= n_shards (shard, bitmap) pairs
    sc = df.sparkSession.sparkContext
    shard_bcs = {int(s): sc.broadcast(np.asarray(b, dtype=np.uint8))
                 for s, b in merged}
    return ShardedBloomFilter(shard_bcs, m, k, n_shards)


def anti_join_new(targets: DataFrame, key_col: str, seen: DataFrame,
                  seen_key: str, bloom: BloomFilter | None) -> DataFrame:
    """Rows of ``targets`` whose key is NOT in ``seen`` — Bloom-fronted
    exact anti-join (P2/J2, data.rs:195-208 membership semantics)."""
    if bloom is None:
        return targets.join(seen.select(F.col(seen_key).alias(key_col)),
                            key_col, "left_anti")
    probed = bloom.might_contain(targets, F.col(key_col))
    definitely_new = probed.where(~F.col("_bloom_hit")).drop("_bloom_hit")
    maybe_seen = probed.where(F.col("_bloom_hit")).drop("_bloom_hit")
    checked = maybe_seen.join(
        seen.select(F.col(seen_key).alias(key_col)), key_col, "left_anti")
    return definitely_new.unionByName(checked)
