"""Snapshot table store: the engine's transactional state layer.

Plays the role Iceberg plays in production (and the role
write-`.bak`-then-rename plays in the reference, data.rs:93-102 /
processed.rs:225-230): every crawl round commits *all* changed tables in one
atomic step, and a killed job resumes from the last committed checkpoint
(P5, data.rs:104-114).

Three table modes:

- **cow** (copy-on-write): each commit writes a full new version directory —
  the stand-in for Iceberg ``overwritePartitions`` (used for ``scores``,
  which PageRank legitimately replaces wholesale every round).
- **append**: each commit writes only a delta directory; a read unions all
  committed deltas — the stand-in for Iceberg ``append`` (used for the
  monotone tables: seen set, trace, metrics — at 10^10 scale rewriting the
  seen set per round would dominate the job).
- **merge** (merge-on-read): each commit writes ONE O(batch) delta file of
  upsert rows plus tombstone key rows (``_ts`` flag); a read stacks the
  deltas over the base with *replace-key-group* semantics — for every key
  present in a delta (upsert or tombstone), all older rows of that key are
  dropped and the delta's non-tombstone rows become the key's new group.
  This is the stand-in for Iceberg MOR (``MERGE INTO`` + positional
  deletes) and is what makes the per-round commit O(batch) instead of
  O(state): the reference mutates `pages`/`edges`/`button_cache` in place
  under a mutex (data.rs:298-326), and a naive snapshot port rewrote those
  tables wholesale every round. Compaction is ADAPTIVE (LSM-style
  absorption): when the accumulated delta bytes (plus this round's,
  estimated from the last write) reach half the base size — or the stack
  reaches ``COMPACT_AT`` — the commit writes the merged table as a new
  base instead of stacking another delta. A light-churn round (batch ≪
  state, the 10^10 design point) writes O(batch) with ≤1.5x amortized
  write amplification; an extreme-churn round (batch ≈ state, e.g. a
  recrawl-everything bench) degrades gracefully to exactly one full
  write per round — the copy-on-write cost, never worse.

  Why merge-on-read and not bucketed partial rewrites: with
  ``hash(key) % B`` buckets a batch of k uniformly-hashed keys touches
  ~B·(1−e^(−k/B)) buckets — at any realistic batch:bucket ratio (150k keys
  vs a few thousand buckets, or 5M keys vs even 10^6 buckets at the 10^10
  design point) that is *all* of them, so "rewrite only touched buckets"
  degenerates to the full rewrite it was meant to avoid. MOR's write cost
  is genuinely independent of state size.

Layout::

    <root>/tables/<table>/v{N:06d}/   parquet data (full version or delta)
    <root>/checkpoints/r{R:06d}.json  committed table→version map of round R
    <root>/CHECKPOINT                 atomic pointer (tmp+rename) to latest

A round writes new version directories (crash-safe: nothing references them
until commit), then renames the checkpoint json over ``CHECKPOINT``. A
killed half-committed round re-runs idempotently — the deterministic round
recomputes the identical result from the previous checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def commit_write_threads(cores: int = 8) -> int:
    """Bounded commit-write pool size (see the concurrency note in
    ``StateStore.commit``). Read per-commit so tests/benches can flip it.

    Default scales with the session's parallelism: a 1M round stages ~7
    write jobs, and a fixed pool of 4 serializes them into two waves with
    a one-job tail wave that idles most of a 16-core box (measured in the
    r5 scaling legs: write stage speedup 2.37x vs ~3x for the data plane).
    ``max(4, cores // 2)`` keeps the 4-core behavior identical while
    letting wider sessions run the whole mix in one wave.

    An explicitly set env value wins outright; values <= 1 mean fully
    serial writes (r6 ADVICE: the old ``env if env > 0`` silently turned
    the 0 opt-out into the computed parallel pool)."""
    env = os.environ.get("X227F_COMMIT_WRITE_THREADS")
    if env is not None:
        return max(int(env), 1)
    return max(4, cores // 2)


def _dir_bytes(path: str) -> int:
    """Total bytes under a version dir (driver-side fs metadata; a version
    dir holds at most ~defaultParallelism files)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


@dataclass
class MergeDelta:
    """One round's change set for a merge-on-read table.

    ``rows``: the upserted rows (full table schema). ``keys``: the key
    column(s) defining a group. ``dels``: optional key-only DataFrame of
    groups to delete outright (keys also present in ``rows`` are simply
    replaced — an explicit tombstone is unnecessary for them but harmless).
    """
    rows: DataFrame
    keys: list[str]
    dels: DataFrame | None = None


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "tables"), exist_ok=True)
        os.makedirs(os.path.join(root, "checkpoints"), exist_ok=True)
        self._cow: dict[str, int] = {}
        self._append: dict[str, list[int]] = {}
        # per-table bytes of the most recent write — feeds the adaptive
        # write-spread sizing (driver-side fs metadata; not persisted: the
        # first write after a resume just uses the full spread once)
        self._last_write_bytes: dict[str, int] = {}
        # name -> {"base": int|None, "deltas": [int...], "keys": [col...]}
        self._merge: dict[str, dict] = {}
        self.round = 0
        self.stats: dict = {}
        self.last_timing: dict = {}  # per-phase seconds of the last commit
        self._load_checkpoint()

    # -- checkpoint handling ----------------------------------------------
    def _ptr_path(self) -> str:
        return os.path.join(self.root, "CHECKPOINT")

    def _load_checkpoint(self) -> None:
        try:
            with open(self._ptr_path()) as f:
                ck = json.load(f)
            self._cow = dict(ck["cow"])
            self._append = {k: list(v) for k, v in ck["append"].items()}
            self._merge = {k: {"base": v.get("base"),
                               "deltas": list(v.get("deltas", [])),
                               "keys": list(v["keys"]),
                               "base_bytes": int(v.get("base_bytes", 0)),
                               "delta_bytes": list(v.get("delta_bytes", [])),
                               "last_bytes": int(v.get("last_bytes", 0))}
                           for k, v in ck.get("merge", {}).items()}
            self.round = int(ck["round"])
            self.stats = dict(ck.get("stats", {}))
            # commit() migrates cow→merge by adopting the cow version as the
            # merge base, so a table in BOTH maps means a corrupt/foreign
            # checkpoint — fail loudly rather than let read() pick one.
            mixed = sorted(set(self._cow) & set(self._merge))
            if mixed:
                raise ValueError(
                    f"checkpoint lists tables in both cow and merge modes: "
                    f"{mixed} (corrupt or hand-edited checkpoint)")
        except FileNotFoundError:
            self._cow, self._append, self.round, self.stats = {}, {}, 0, {}
            self._merge = {}

    # write-spread keys: hash-repartition each staged table on its key so
    # parquet+zstd encoding parallelizes across cores instead of the 1-2
    # AQE-coalesced partitions a small shuffle ends with. Content-neutral:
    # nothing downstream assumes file order.
    WRITE_KEYS = {
        "pages": "page_id", "seen": "page_id", "edges": "src",
        "scores": "node_id", "discovered": "node_id", "queue": "queue_pos",
        "button_cache": "url", "media": "media_ref", "trace": "seq",
    }

    # target bytes per written file/partition when sizing the write spread
    # from the table's last observed write (guide §6 output sizing, scaled
    # down to the per-round delta regime: a 1M-design-point delta of
    # 100-300 MB still fans out to the full 2x-cores spread, while a
    # KB-sized bench delta stops paying 64 write tasks + 64-file dirs per
    # table per round). Env-overridable for clusters with different I/O.
    WRITE_TARGET_BYTES = int(os.environ.get(
        "X227F_WRITE_SPREAD_TARGET_BYTES", str(4 * 1024 * 1024)))

    def _spread(self, name: str, df: DataFrame,
                bytes_hint: int | None = None) -> DataFrame:
        key = self.WRITE_KEYS.get(name)
        if key is None:
            return df
        # 2x cores, not 1x: a write stage of exactly `cores` tasks is a
        # barrier over the slowest-of-N draw with zero scheduling slack —
        # on this box the slowest of 16 runs ~40% over median vs ~8% for
        # the slowest of 4 (BENCH/NOTES.md "Measured machine noise"), which
        # is why write scaled worst (2.37x) in the r5 legs. Two tasks per
        # core lets dynamic scheduling absorb the tail, the same sizing
        # rule the session applies to shuffle.partitions (session.py).
        n = 2 * self.spark.sparkContext.defaultParallelism
        # size-adapt: the table's last written size (or the caller's hint,
        # for folds) bounds how many useful write tasks exist. A table
        # seen at B bytes gets ceil(B / WRITE_TARGET_BYTES) partitions,
        # capped at the 2x-cores spread — big deltas keep the full r6
        # write parallelism, small ones stop burning a 64-task barrier
        # per table per round. First-ever writes (no history) use the
        # full spread; the estimate self-corrects on the next round.
        est = bytes_hint if bytes_hint is not None \
            else self._last_write_bytes.get(name)
        if est is not None:
            n = max(1, min(n, -(-int(est) // self.WRITE_TARGET_BYTES)))
        return df.repartition(n, df[key])

    # append tables merge their accumulated delta dirs into one once this
    # many pile up — the snapshot-store analogue of Iceberg's rewrite_data_
    # files compaction. Keeps the per-read file-listing and union fan-in
    # bounded over thousands of rounds (amortized: one extra full write of
    # the table every COMPACT_AT rounds).
    COMPACT_AT = 8

    # merge tables absorb on the SIZE criterion (amortized write ≤ 3x batch
    # — delta + the 2x-batch amortized fold when deltas reach half the
    # base); this cap only bounds read-plan depth / file-listing fan-in in
    # ultra-light-churn regimes and is deliberately larger than COMPACT_AT
    # (an absorb every 8 rounds would re-introduce O(state/8) per round)
    MERGE_STACK_MAX = 24

    # stack cap for tables whose whole size is below the fold floor: their
    # folds are trivially cheap, and bounding the stack bounds how many
    # times the commit plans re-embed the delta union (plan-guard bar)
    MERGE_STACK_SMALL = 4

    def commit(self, round_no: int, overwrite: dict[str, DataFrame],
               append: dict[str, DataFrame] | None = None,
               stats: dict | None = None,
               late_append=None,
               merge: dict[str, MergeDelta] | None = None) -> None:
        """Write staged tables as new version dirs, then atomically flip the
        checkpoint pointer. One call per crawl round (P3). Table writes are
        submitted concurrently (Spark schedules them side by side), which is
        the snapshot-store analogue of Iceberg's parallel manifest writes.

        ``late_append``: optional ``() -> dict[name, DataFrame]`` invoked
        after the main writes finish but before the pointer flips — lets the
        caller derive tables (metrics) from Observations attached to the
        staged writes, so counting piggybacks on the write jobs instead of
        costing separate actions."""
        import time
        from concurrent.futures import ThreadPoolExecutor

        self.last_timing = {}
        _t = time.monotonic()

        def _phase(key):
            nonlocal _t
            now = time.monotonic()
            self.last_timing[key] = round(now - _t, 3)
            _t = now

        new_cow = dict(self._cow)
        new_append = {k: list(v) for k, v in self._append.items()}
        new_merge = {k: {"base": v["base"], "deltas": list(v["deltas"]),
                         "keys": list(v["keys"]),
                         "base_bytes": v.get("base_bytes", 0),
                         "delta_bytes": list(v.get("delta_bytes", [])),
                         "last_bytes": v.get("last_bytes", 0)}
                     for k, v in self._merge.items()}
        jobs = []
        doomed_deltas: list[str] = []

        def _next_v(name):
            m = new_merge.get(name, {})
            return max([new_cow.get(name, 0), m.get("base") or 0]
                       + new_append.get(name, [0])
                       + list(m.get("deltas") or [0])) + 1

        for name, df in overwrite.items():
            v = _next_v(name)
            jobs.append((name, df, v))
            new_cow[name] = v
        for name, df in (append or {}).items():
            v = _next_v(name)
            jobs.append((name, df, v))
            new_append.setdefault(name, []).append(v)
        delta_written: list[tuple[str, int]] = []
        for name, md in (merge or {}).items():
            ent = new_merge.get(name)
            if ent is None:
                # First MergeDelta for this table. If a checkpoint written
                # by the older copy-on-write format already holds a cow
                # version, ADOPT it as the merge base — otherwise read()
                # would prefer the (base=None) merge view and silently drop
                # every pre-existing row, breaking the P5 resume guarantee
                # across the format change.
                cow_base = new_cow.pop(name, None)
                ent = {"base": cow_base, "deltas": [], "keys": list(md.keys),
                       "base_bytes": (_dir_bytes(self._table_path(name, cow_base))
                                      if cow_base is not None else 0),
                       "delta_bytes": [], "last_bytes": 0}
                new_merge[name] = ent
            # every round writes ONE O(batch) delta file: upserts
            # (_ts=false) + tombstone keys (_ts=true, null payload). Key
            # groups present in the delta replace the base group wholesale
            # at read time. Folding deltas into the base (LSM absorption)
            # happens AFTER the delta lands, from the on-disk parquet only
            # — see the fold loop below.
            delta = md.rows.withColumn("_ts", F.lit(False))
            if md.dels is not None:
                key_set = set(md.keys)
                tomb = md.dels.select(*md.keys).select(
                    *[F.col(f.name).cast(f.dataType) if f.name in key_set
                      else F.lit(None).cast(f.dataType).alias(f.name)
                      for f in md.rows.schema.fields],
                    F.lit(True).alias("_ts"))
                delta = delta.unionByName(tomb)
            v = _next_v(name)
            jobs.append((name, delta, v))
            ent["deltas"].append(v)
            delta_written.append((name, v))

        def _write(job):
            name, df, v = job
            path = self._table_path(name, v)
            self._spread(name, df).write.mode("overwrite").parquet(path)
            # dict assignment is atomic under the GIL; pool threads write
            # disjoint names except on retry, where last-wins is fine
            self._last_write_bytes[name] = _dir_bytes(path)

        def _try_write(job):
            try:
                _write(job)
                return None
            except Exception as e:
                return (job, e)

        # Write concurrency: a BOUNDED pool, safe only because every input
        # the staged tables share is materialized before the pool starts.
        # The round-2 race — two concurrent writes materializing the same
        # lazily-cached subplan under AQE with different coalesced partition
        # counts, poisoning the cache for the whole session ("Can't zip RDDs
        # with unequal numbers of partitions", deterministic at 1M-row
        # commits) — cannot fire when shared subtrees are already
        # LogicalRDDs (localCheckpoint) or materialized InMemoryRelations.
        # The engine upholds that by construction: `fetched`/`selected`/
        # `seen_new` are localCheckpoints, the `links` persist is warmed by
        # the node-id count job before commit, and `seen_all` is
        # deliberately NOT cached (rounds.py) so no lazy shared cache
        # exists. That invariant is ENFORCED here, not assumed: any staged
        # plan still referencing an unmaterialized cache drops the commit
        # to serial writes (correct either way — the pool is purely a
        # throughput optimization). On a real deployment each table write
        # is its own job against the catalog (Iceberg commit) and the race
        # does not exist at all. A transient failure is still retried
        # once, serially. Set X227F_COMMIT_WRITE_THREADS=1 to force the
        # fully serial round-3 behavior.
        n_workers = commit_write_threads(
            self.spark.sparkContext.defaultParallelism)
        if n_workers > 1 and any(self._has_unloaded_cache(df)
                                 for _n, df, _v in jobs):
            import logging
            logging.getLogger(__name__).warning(
                "staged commit plan references an unmaterialized cache — "
                "falling back to serial writes for this round (pool-unsafe "
                "under the AQE cached-subplan race)")
            n_workers = 1
        if n_workers > 1:
            with ThreadPoolExecutor(max_workers=n_workers) as ex:
                failures = [f for f in ex.map(_try_write, jobs)
                            if f is not None]
        else:
            failures = [f for f in map(_try_write, jobs) if f is not None]
        for job, first_err in failures:
            try:
                _write(job)
            except Exception as e:
                raise RuntimeError(
                    f"commit write failed twice for table '{job[0]}' "
                    f"v{job[2]} (first error: {first_err})") from e
        _phase("staged")

        if late_append:
            late_jobs = []
            for name, df in (late_append() or {}).items():
                v = _next_v(name)
                late_jobs.append((name, df, v))
                new_append.setdefault(name, []).append(v)
            for job in late_jobs:
                _write(job)
        _phase("late")

        # ---- compactions + LSM folds -------------------------------------
        # Unlike the staged-table writes above, every job below reads ONLY
        # committed parquet files of its own table — no two tables share any
        # subplan (cached or otherwise), so the AQE poisoned-cache race that
        # forces care with the staged writes cannot exist here and the jobs
        # run through the same bounded pool unconditionally. This is where
        # the serial round-3 commit path left parallelism on the floor: an
        # extreme-churn round folds all five merge tables back-to-back, and
        # each fold alone is a small job that nowhere near saturates the
        # executor slots.
        fold_jobs = []  # (table_name, fn); appliers run serially afterwards

        for name, versions in list(new_append.items()):
            if len(versions) < self.COMPACT_AT:
                continue

            def _compact(name=name, versions=versions):
                paths = [self._table_path(name, v) for v in versions]
                merged = self.spark.read.parquet(*paths)
                v = max(versions) + 1
                hint = sum(_dir_bytes(p) for p in paths)
                self._spread(name, merged, bytes_hint=hint) \
                    .write.mode("overwrite").parquet(
                        self._table_path(name, v))

                def apply():
                    doomed_deltas.extend(self._table_path(name, x)
                                         for x in versions)
                    new_append[name] = [v]
                return apply
            fold_jobs.append((name, _compact))

        # merge-table size bookkeeping (driver-side fs metadata, delta dirs
        # only — a handful of files each)
        for name, v in delta_written:
            b = _dir_bytes(self._table_path(name, v))
            new_merge[name]["delta_bytes"].append(b)
            new_merge[name]["last_bytes"] = b
        # Absorption: once accumulated delta bytes reach half the base size
        # (or the stack hits MERGE_STACK_MAX, or there is no base yet),
        # fold base+deltas into a new base. The fold reads ONLY the
        # committed parquet files — scans, anti-joins, one union — never
        # the round's live plans, so it composes with any producer plan
        # and costs pure I/O-bounded work. Light-churn rounds (batch ≪
        # state, the 10^10 design point) fold rarely: amortized write is
        # ≤3x batch. Extreme-churn rounds (batch ≈ state) fold every
        # round: one delta + one full write, the LSM equivalent of the
        # old copy-on-write cost.
        # Size floor on the absorb criterion: at sandbox/bench scale every
        # table's base is tiny, so "deltas reached half the base" fired
        # every round and each round paid a full-table rewrite of EVERY
        # merge table (r7 baseline: write.folds ~1.5 s of each ~19 s bench
        # round — pure write amplification for KB-sized state). Below the
        # floor, deltas simply stack (reads take a few more broadcast
        # anti-joins, bounded by MERGE_STACK_MAX); at any real state size
        # the 0.5x-base criterion dominates and behavior is unchanged.
        min_fold = int(os.environ.get("X227F_MIN_FOLD_BYTES",
                                      str(32 * 1024 * 1024)))
        for name, ent in list(new_merge.items()):
            dsum = sum(ent.get("delta_bytes") or [])
            if not ent["deltas"]:
                continue
            # sub-floor tables still cap their stack at MERGE_STACK_SMALL:
            # every committed-plan reference embeds the whole delta union,
            # so an unbounded small-state stack regrows the round-1 plan
            # blowup (tests/test_plan_guard.py) — and folding a table this
            # small is by definition cheap. Big tables never hit this arm.
            small_cap = ((ent.get("base_bytes", 0) + dsum) < min_fold
                         and len(ent["deltas"]) >= self.MERGE_STACK_SMALL)
            if not (ent["base"] is None
                    or len(ent["deltas"]) >= self.MERGE_STACK_MAX
                    or small_cap
                    or dsum >= max(0.5 * ent.get("base_bytes", 0),
                                   min_fold)):
                continue

            def _fold(name=name, ent=ent, dsum=dsum):
                merged = self._merge_view(name, ent)
                v = _next_v(name)
                hint = ent.get("base_bytes", 0) + dsum
                self._spread(name, merged, bytes_hint=hint) \
                    .write.mode("overwrite").parquet(
                        self._table_path(name, v))

                def apply():
                    if ent["base"] is not None:
                        doomed_deltas.append(
                            self._table_path(name, ent["base"]))
                    doomed_deltas.extend(self._table_path(name, x)
                                         for x in ent["deltas"])
                    new_merge[name] = {
                        "base": v, "deltas": [], "keys": list(ent["keys"]),
                        "base_bytes": _dir_bytes(self._table_path(name, v)),
                        "delta_bytes": [],
                        "last_bytes": ent.get("last_bytes", 0)}
                return apply
            fold_jobs.append((name, _fold))

        if fold_jobs:
            # Concurrent-_next_v safety: each fold/compaction allocates its
            # version from its own table's committed history, so the pool is
            # race-free iff no two jobs target the same table. Today that
            # holds by construction (one fold per merge table, compactions
            # keyed off disjoint append tables — the two maps share no
            # names); enforce it so a future same-table second job fails
            # loudly instead of racing the version scan.
            fold_names = [n for n, _fn in fold_jobs]
            assert len(set(fold_names)) == len(fold_names), (
                f"fold pool requires unique table names, got {fold_names}")
            if n_workers > 1 and len(fold_jobs) > 1:
                with ThreadPoolExecutor(max_workers=n_workers) as ex:
                    appliers = list(ex.map(lambda j: j[1](), fold_jobs))
            else:
                appliers = [fn() for _n, fn in fold_jobs]
            # metadata mutations (new_append/new_merge/doomed_deltas) stay
            # single-threaded: each job returns an applier closure run here
            for apply in appliers:
                apply()
        _phase("folds")

        # stats may be a callable evaluated *after* late_append — lets the
        # caller fold Observation results from the staged writes (queue
        # length, seen count) into the same atomic checkpoint
        ck_stats = (stats() if callable(stats) else stats) \
            if stats is not None else self.stats
        ck = {"round": round_no, "cow": new_cow, "append": new_append,
              "merge": new_merge, "stats": ck_stats}
        ck_path = os.path.join(self.root, "checkpoints", f"r{round_no:06d}.json")
        with open(ck_path, "w") as f:
            json.dump(ck, f)
        tmp = self._ptr_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ck, f)
        os.replace(tmp, self._ptr_path())  # the atomic commit point
        self._gc_old_versions(self._cow, new_cow)
        for path in doomed_deltas:  # superseded by the compacted version
            shutil.rmtree(path, ignore_errors=True)
        self._cow, self._append, self._merge = new_cow, new_append, new_merge
        self.round = round_no
        self.stats = ck["stats"]

    @staticmethod
    def _has_unloaded_cache(df: DataFrame) -> bool:
        """True when ``df``'s plan (after cache substitution) references an
        InMemoryRelation whose column buffers are NOT yet materialized —
        the precondition of the AQE poisoned-cache race two concurrent
        writes can trip. Uses ``QueryExecution.withCachedData`` (analysis +
        cache substitution only, no optimizer pass — cheap driver metadata
        work; InMemoryRelation is a leaf node). Returns True on any
        introspection failure: "can't prove safe" degrades to the serial
        path, which is always correct."""
        try:
            leaves = df._jdf.queryExecution().withCachedData().collectLeaves()
            for i in range(leaves.size()):
                leaf = leaves.apply(i)
                if (leaf.getClass().getSimpleName() == "InMemoryRelation"
                        and not leaf.cacheBuilder()
                                    .isCachedColumnBuffersLoaded()):
                    return True
            return False
        except Exception:
            return True

    def _read_parquet(self, path: str, schema: str | None,
                      with_ts: bool = False) -> DataFrame:
        """Parquet read with an optional known schema — a caller-supplied
        schema (the engine passes its SCHEMAS entry) skips the per-read
        footer-inference round trip, which is pure driver/control-plane
        latency repeated for every table view every round."""
        r = self.spark.read
        if schema is not None:
            from pyspark.sql.types import BooleanType, StructType
            st = StructType.fromDDL(schema)
            if with_ts:
                st = st.add("_ts", BooleanType())
            r = r.schema(st)
        return r.parquet(path)

    def _merge_view(self, name: str, ent: dict,
                    schema: str | None = None) -> DataFrame:
        """Merged (current) view of a merge-on-read table with
        replace-key-group semantics: for every key present in any delta,
        the NEWEST delta containing it decides the key's group (its
        non-tombstone rows, or nothing if it only tombstones the key);
        base rows survive only for keys in no delta.

        Shape (r7): deltas are read as one seq-tagged union, the winner
        picked with a per-key max-seq window over DELTA rows only, and the
        base filtered with a SINGLE anti-join on the union's key set —
        instead of the r6 per-delta chain of anti-join+union layers, whose
        committed-plan text grew ~250 KB per stacked delta (the round-1
        plan-blowup failure mode, re-exposed once the r7 fold-size floor
        let stacks deepen; caught by tests/test_plan_guard.py) and whose
        k chained broadcast filters each touched every base row. The
        window shuffles only delta rows (batch x stack, never the base);
        the key-set anti-join auto-broadcasts while small, and at 10^10
        scale with multi-GB key sets falls back to a shuffle join — the
        Bloom pre-filter in operators/bloom.py is the documented escape
        hatch."""
        from pyspark.sql import Window as W

        keys = ent["keys"]
        base = (self._read_parquet(self._table_path(name, ent["base"]), schema)
                if ent["base"] is not None else None)
        if not ent["deltas"]:
            return base
        parts = [
            self._read_parquet(self._table_path(name, v), schema,
                               with_ts=True).withColumn("__mor_seq",
                                                        F.lit(i))
            for i, v in enumerate(ent["deltas"])
        ]
        alld = parts[0]
        for p in parts[1:]:
            alld = alld.unionByName(p)
        w = W.partitionBy(*keys)
        newest = (alld.withColumn("__mor_mx", F.max("__mor_seq").over(w))
                  .where(F.col("__mor_seq") == F.col("__mor_mx")))
        rows = newest.where(~F.col("_ts")).drop("_ts", "__mor_seq",
                                                "__mor_mx")
        if base is None:
            return rows
        dkeys = alld.select(*keys).distinct()
        return base.join(dkeys, keys, "left_anti").unionByName(rows)

    def _gc_old_versions(self, old_cow: dict[str, int],
                         new_cow: dict[str, int], keep: int = 2) -> None:
        for name, cur in new_cow.items():
            tdir = os.path.join(self.root, "tables", name)
            if not os.path.isdir(tdir):
                continue
            protected = set(self._append.get(name, []))
            for entry in os.listdir(tdir):
                if not entry.startswith("v"):
                    continue
                try:
                    v = int(entry[1:])
                except ValueError:
                    continue
                if v <= cur - keep and v not in protected:
                    shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)

    # -- reads --------------------------------------------------------------
    def _table_path(self, name: str, version: int) -> str:
        return os.path.join(self.root, "tables", name, f"v{version:06d}")

    def exists(self, name: str) -> bool:
        return (name in self._cow or name in self._append
                or name in self._merge)

    def read(self, name: str, schema: str | None = None) -> DataFrame:
        """Committed view of a table; empty DF (with ``schema``) when the
        table has never been committed. A supplied ``schema`` also skips
        parquet footer inference on every read (see ``_read_parquet``)."""
        if name in self._merge:
            ent = self._merge[name]
            if ent["base"] is not None or ent["deltas"]:
                return self._merge_view(name, ent, schema)
        paths = []
        if name in self._cow:
            paths.append(self._table_path(name, self._cow[name]))
        for v in self._append.get(name, []):
            paths.append(self._table_path(name, v))
        if paths:
            r = self.spark.read
            if schema is not None:
                r = r.schema(schema)
            return r.parquet(*paths)
        if schema is None:
            raise KeyError(f"table {name} not committed and no schema given")
        return self.spark.createDataFrame([], schema)
