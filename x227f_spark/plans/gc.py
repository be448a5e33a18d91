"""J6 — unlinked-button garbage collection (garbagecollect.rs:7-43).

The reference lists ``data/buttons/`` and deletes files whose
``<hash>.<ext>`` name is not referenced by any page's buttons. Here the
media store is the ``media(media_ref, bytes, ...)`` table (or a directory of
content-addressed files); GC is the left-anti join of stored refs against
the union of referenced hashes, exactly the reference's set-difference."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linked_refs(pages: DataFrame) -> DataFrame:
    """Distinct ``<hash>.<ext>`` filenames referenced by any button
    (garbagecollect.rs:12-17)."""
    return (pages.select(F.explode("buttons").alias("b"))
            .select(F.concat_ws(".", F.col("b.hash"),
                                F.col("b.file_ext")).alias("filename"))
            .distinct())


def unlinked(media_files: DataFrame, pages: DataFrame) -> DataFrame:
    """media_files(filename) rows not referenced by any page — the delete
    set (garbagecollect.rs:18-28)."""
    return media_files.join(linked_refs(pages), "filename", "left_anti")


def gc_media_dir(spark, pages: DataFrame, media_dir: str,
                 return_names: bool = False) -> list[str]:
    """Filesystem flavor: delete unlinked files under ``media_dir``
    (garbagecollect.rs:30-43).

    Deletes run EXECUTOR-SIDE via ``foreachPartition`` — the delete set is
    never collected to the driver, so the 100 TB shape (every worker
    issuing object-store deletes for its partition of the anti-join) is the
    code path that runs here too. ``return_names=True`` additionally
    returns the sorted deleted names (small-scale test/parity contract —
    the reference returns them, garbagecollect.rs:40); the default returns
    an empty list without materializing the set on the driver."""
    import os

    names = [f for f in os.listdir(media_dir)
             if os.path.isfile(os.path.join(media_dir, f))]
    files_df = spark.createDataFrame([(n,) for n in names] or [],
                                     "filename string")
    doomed_df = unlinked(files_df, pages)
    if return_names:
        # test/parity flavor: one collect, then executor-style per-name
        # unlink on the driver (the list is the contract output anyway)
        doomed = [r["filename"] for r in doomed_df.collect()]
        for name in doomed:
            os.remove(os.path.join(media_dir, name))
        return sorted(doomed)

    def _rm(rows):
        for r in rows:
            try:
                os.remove(os.path.join(media_dir, r["filename"]))
            except OSError:
                pass  # already gone — GC is idempotent

    doomed_df.foreachPartition(_rm)
    return []
