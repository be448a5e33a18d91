"""X1 — fix-images batch maintenance mode (main.rs:336-545).

The reference's flow: group all buttons by hash (G4), re-encode each stored
image (X2), and where the re-encode changes the bytes, rewrite the media
store and update every referencing page's ButtonData in place. Re-run
ordering quirk faithfully avoided: page updates happen via a hash→hash
mapping join, so order doesn't matter.

The canonical X2 re-encode is the identity (hash parity is pinned on source
bytes, SURVEY.md §2 X2); a real deployment passes ``re_encode`` (e.g.
oxipng-style recompression). The plumbing — Arrow-batch re-encode, 88x31
re-validation (main.rs:430-445), content-addressed rewrite, ordered in-place
button updates across pages — is real and tested with a custom re_encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import imagebytes


def fix_images(spark: SparkSession, pages: DataFrame, media: DataFrame,
               re_encode=None) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (pages', media', mapping) where mapping(old_hash, new_hash,
    new_file_ext) lists the changed images. ``re_encode(data: bytes,
    fmt: str) -> bytes`` defaults to identity (canonical X2)."""
    enc = re_encode if re_encode is not None else (lambda data, fmt: data)

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for ref, data, ext in zip(pdf["media_ref"], pdf["bytes"],
                                      pdf["file_ext"]):
                data = bytes(data)
                fmt = imagebytes.guess_format(data)
                try:
                    new = enc(data, fmt or ext)
                except Exception:
                    continue  # re-encode failure → leave untouched (main.rs:448)
                if new == data:
                    continue
                # re-validate just to be sure (main.rs:224 / image.rs:224-227)
                if imagebytes.validate_image_size(new) is not True:
                    continue
                rows.append({
                    "old_hash": ref,
                    "new_hash": imagebytes.hash_image(new),
                    "new_bytes": new,
                    "new_file_ext": imagebytes.format_extension(
                        imagebytes.guess_format(new) or ext),
                })
            yield pd.DataFrame(
                rows, columns=["old_hash", "new_hash", "new_bytes",
                               "new_file_ext"])

    changed = media.mapInPandas(
        batches, "old_hash string, new_hash string, new_bytes binary, "
                 "new_file_ext string").localCheckpoint(eager=True)

    mapping = changed.select("old_hash", "new_hash", "new_file_ext")

    # media rewrite: drop old rows, insert new (content-addressed)
    media2 = (media.join(mapping.select(F.col("old_hash").alias("media_ref")),
                         "media_ref", "left_anti")
              .unionByName(changed.select(
                  F.col("new_hash").alias("media_ref"),
                  F.col("new_bytes").alias("bytes"),
                  F.col("new_file_ext").alias("file_ext"),
                  F.lit(88).alias("width"), F.lit(31).alias("height")))
              .dropDuplicates(["media_ref"]))

    # in-place button updates across all pages, order preserved (main.rs:497-520)
    upd = (pages.select("page_id", F.explode("buttons").alias("b"))
           .join(mapping.withColumnRenamed("old_hash", "hash"),
                 F.col("b.hash") == F.col("hash"), "left")
           .select(
               "page_id",
               F.struct(
                   F.col("b.ord").alias("ord"),
                   F.col("b.source").alias("source"),
                   F.coalesce("new_hash", F.col("b.hash")).alias("hash"),
                   F.coalesce("new_file_ext", F.col("b.file_ext"))
                   .alias("file_ext"),
                   F.col("b.target").alias("target"),
                   F.col("b.last_visited").alias("last_visited"),
                   F.col("b.alt").alias("alt"),
                   F.col("b.title").alias("title"),
               ).alias("b2")))
    rebuilt = upd.groupBy("page_id").agg(
        F.sort_array(F.collect_list("b2")).alias("buttons"))
    pages2 = (pages.drop("buttons")
              .join(rebuilt, "page_id", "left")
              .select(pages["page_id"], "url", "last_visited", "failed",
                      "redirects_to", "internal_links",
                      F.coalesce("buttons", F.array().cast(
                          pages.schema["buttons"].dataType.simpleString()
                      )).alias("buttons")))
    return pages2, media2, mapping
