"""Distributed exact global row numbering.

``row_number().over(Window.orderBy(...))`` moves EVERY row into one
partition (Spark warns: "No Partition Defined for Window operation") and
serializes the stage — at 10^10-frontier round sizes that single sorted
partition is the whole round's bottleneck. The engine needs exact global
ordinals in three places per round (admission rank T1/T2, the scheduler's
global fetch rank T3, and dense node-id assignment for new pages — see
plans/rounds.py), so this module provides the standard scalable
equivalent:

1. ``repartitionByRange`` on the sort key — partition *i* holds a
   contiguous slice of the global order (parallel sample + shuffle);
2. rank *within* each partition (parallel sort, no data movement across
   the range partitions beyond the window's hash exchange);
3. shift each partition's local ranks by the total count of rows in the
   partitions before it — a prefix sum over ``num_partitions`` integers
   on the driver (metadata, not data);
4. broadcast-join the tiny offset table back.

The result is byte-identical to the single-partition window **provided
the sort key is a total order** (unique tie-break). Every engine call
site already guarantees that — (score desc, node_id), queue_pos, and
(crawl_pos, link_class, link_ord) are all unique — and the same
uniqueness was already required for the old window to be deterministic.
Range-partition boundaries come from sampling and may vary run to run,
but the assigned ordinal of a given row never does: with unique keys the
k-th row of the total order gets k regardless of where the boundaries
fall.

Reference parity: this implements the rank/ordinal semantics of the
reference's in-memory sorted structures (data.rs:271-274 queue insertion
order, data.rs:418-439 scheduler pop order, dense node-id append) — the
reference holds them in one process; at cluster scale the ordinal itself
must be computed without funneling the table through one task.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_PID = "__grn_pid"
_LRN = "__grn_lrn"
_OFF = "__grn_off"


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column | str],
    out_col: str,
    num_partitions: int | None = None,
    persist: Callable[[DataFrame], DataFrame] | None = None,
    return_count: bool = False,
) -> DataFrame:
    """Add ``out_col`` = 1-based global row number of ``df`` under the
    total order ``order_by``, without a single-partition window.

    ``order_by`` entries may be column names or Column sort expressions
    (``F.desc(...)`` works). ``persist`` is a round-scoped cache hook
    (CrawlEngine._persist); when None a plain ``.persist()`` is used and
    freed lazily by Spark's ContextCleaner.

    ``return_count=True`` returns ``(df, total_rows)`` — the total falls
    out of the partition-size prefix sum for free, saving callers a
    separate ``count()`` job.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]

    ranged = df.repartitionByRange(num_partitions, *cols)
    w = W.partitionBy(_PID).orderBy(*cols)
    local = (ranged.withColumn(_PID, F.spark_partition_id())
             .withColumn(_LRN, F.row_number().over(w)))
    # cache: the counts job below and the caller's downstream both read it
    if persist is not None:
        local = persist(local)
    else:
        from .qcache import scoped_persist
        local = scoped_persist(local)  # released by the harness's scope

    # partition sizes → driver prefix sum (num_partitions rows, metadata)
    sizes = {r[_PID]: r["cnt"] for r in
             local.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], 0
    for pid in sorted(sizes):  # range partition ids ascend with the order
        offsets.append((pid, acc))
        acc += sizes[pid]
    if not offsets:
        out = local.withColumn(out_col, F.col(_LRN).cast("long")) \
                   .drop(_PID, _LRN)
        return (out, 0) if return_count else out
    off_df = spark.createDataFrame(offsets, f"{_PID} int, {_OFF} long")
    out = (local.join(F.broadcast(off_df), _PID)
           .withColumn(out_col, (F.col(_OFF) + F.col(_LRN)).cast("long"))
           .drop(_PID, _LRN, _OFF))
    return (out, acc) if return_count else out
