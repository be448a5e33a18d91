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


def _size_params(expected: int, fpp: float) -> tuple[int, int]:
    expected = max(expected, 16)
    m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    k = min(8, max(1, round(m / expected * math.log(2))))
    return m, k


def _bitmap_of(df: DataFrame, key: Column, m: int, k: int) -> np.ndarray:
    """Distributed bitmap build: hash positions JVM-side, per-partition
    numpy packing (Arrow batches), executor-side treeReduce OR. Only
    bitmap-sized partials ever reach the driver."""
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
    return np.asarray(bits, dtype=np.uint8).copy()  # own the buffer


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
    m, k = _size_params(expected, fpp)
    bits = _bitmap_of(df, key, m, k)
    bc = df.sparkSession.sparkContext.broadcast(bits)
    return BloomFilter(bits, m, k, bc)


def _build_sharded(df: DataFrame, key: Column, expected: int, fpp: float,
                   n_shards: int) -> ShardedBloomFilter:
    """Per-shard bitmaps built from shard-partitioned key sets. Each
    partition packs bitmaps only for the shards it holds (after the
    shard-hash repartition that is ~one shard per partition), partials
    OR-combine per shard on the executors, and each shard becomes its own
    broadcast — nothing whole-filter-sized exists anywhere."""
    m, k = _size_params(max(expected // n_shards, 16), fpp)
    maps = _shard_bitmaps_of(df, key, m, k, n_shards)
    sc = df.sparkSession.sparkContext
    shard_bcs = {s: sc.broadcast(b) for s, b in maps.items()}
    return ShardedBloomFilter(shard_bcs, m, k, n_shards)


def _shard_bitmaps_of(df: DataFrame, key: Column, m: int, k: int,
                      n_shards: int) -> dict[int, np.ndarray]:
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
    return {int(s): np.asarray(b, dtype=np.uint8).copy() for s, b in merged}


class IncrementalBloom:
    """Round-to-round incremental Bloom maintenance — O(batch) per round.

    The round-4 engine rebuilt the filter from the FULL seen set every
    round: an O(state) scan plus Python bitmap packing in the round's
    control-plane path, pure waste in recrawl-heavy steady state where the
    seen set barely grows. Bloom bitmaps are OR-monotone, so the driver
    keeps the merged bitmaps between rounds (the same arrays the one-shot
    build collects anyway) and each round scans ONLY the keys first seen
    since the last update — with the seen table stored as per-round append
    deltas, the ``first_seen_round > upto`` predicate prunes whole delta
    files via parquet stats, so update I/O is O(batch). A round that adds
    no keys (the steady recrawl regime) costs zero jobs: the caller's
    driver-side seen counter short-circuits the update.

    Capacity doubling: bitmaps are sized for 2× the seen count at
    (re)build time; a full rebuild fires only when the count outgrows
    capacity (or on the first call, e.g. after a crash-resume — the state
    is driver-held and deliberately not checkpointed: losing it costs one
    O(state) rebuild, never correctness). Amortized over the doublings
    that is O(1) full scans per key, and under capacity the realized FPP
    is strictly better than the target. Shard count follows capacity
    (``shards_for``), so the sharded path engages at the same thresholds
    as the one-shot build; superseded broadcasts are unpersisted (not
    destroyed — an evicted-and-recomputed cache partition may still probe
    an old filter object, and unpersisted broadcasts re-ship from the
    driver on access).
    """

    def __init__(self, fpp: float = 0.01, min_seen: int = 0):
        self.fpp = fpp
        self.min_seen = min_seen
        self._filter = None
        self._capacity = 0
        self._count = -1       # seen_count the current bitmaps cover
        self._upto = -1        # max first_seen_round folded in
        self._bits = None      # np.ndarray (single) or dict (sharded)

    def _broadcast(self, spark) -> None:
        old = self._filter
        sc = spark.sparkContext
        # snapshot (copy) at broadcast time: later rounds OR into the
        # driver-held arrays in place, and an executor re-fetching an
        # unpersisted broadcast must see the filter as of ITS round
        if isinstance(self._bits, dict):
            bcs = {s: sc.broadcast(b.copy()) for s, b in self._bits.items()}
            m, k = self._mk
            self._filter = ShardedBloomFilter(bcs, m, k, self._n_shards)
        else:
            m, k = self._mk
            snap = self._bits.copy()
            self._filter = BloomFilter(snap, m, k, sc.broadcast(snap))
        if old is not None:
            try:
                if isinstance(old, ShardedBloomFilter):
                    for bc in old._shard_bcs.values():
                        bc.unpersist(False)
                else:
                    old._broadcast.unpersist(False)
            except Exception:
                pass

    def update(self, seen: DataFrame, key_col: str, seen_count: int,
               upto_round: int):
        """Return a filter covering every key of ``seen`` (committed as of
        ``upto_round``), or None below the ``min_seen`` engage threshold.
        ``seen_count`` is the caller's driver-side count — when unchanged
        since the last update the call is free."""
        if seen_count < self.min_seen:
            return None
        key = F.col(key_col)
        if self._filter is None or seen_count > self._capacity:
            # full (re)build, capacity-doubled so rebuilds amortize O(1)
            self._capacity = max(2 * seen_count, 2 * max(self.min_seen, 16))
            self._n_shards = shards_for(self._capacity, self.fpp)
            if self._n_shards > 1:
                self._mk = _size_params(
                    max(self._capacity // self._n_shards, 16), self.fpp)
                self._bits = _shard_bitmaps_of(seen, key, *self._mk,
                                               self._n_shards)
            else:
                self._mk = _size_params(self._capacity, self.fpp)
                self._bits = _bitmap_of(seen, key, *self._mk)
        elif seen_count != self._count:
            delta = seen.where(F.col("first_seen_round") > F.lit(self._upto))
            if self._n_shards > 1:
                for s, b in _shard_bitmaps_of(delta, key, *self._mk,
                                              self._n_shards).items():
                    if s in self._bits:
                        np.bitwise_or(self._bits[s], b, out=self._bits[s])
                    else:
                        self._bits[s] = b
            else:
                np.bitwise_or(self._bits, _bitmap_of(delta, key, *self._mk),
                              out=self._bits)
        else:
            return self._filter  # no new keys since the last update
        self._count = seen_count
        self._upto = upto_round
        self._broadcast(seen.sparkSession)
        return self._filter


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
