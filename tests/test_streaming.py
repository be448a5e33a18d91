"""Structured Streaming operators: watermarked windowed metrics vs batch
twin; streaming exactly-once admission."""

import pytest

from x227f_spark.streaming import events as S


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_windowed_metrics_matches_batch(spark, sf_dir):
    stream = S.windowed_metrics(S.read_events_stream(spark, sf_dir))
    got = S.run_available_now(stream, "wm_stream")
    want = S.windowed_metrics_batch(
        spark.read.parquet(f"{sf_dir}/events.parquet"))
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows
    assert len(got_rows) > 0


def test_streaming_admission_exactly_once(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    rows = [
        ("a.com", datetime(2026, 1, 1, 0, 0, 0), "https://a.com/"),
        ("a.com", datetime(2026, 1, 1, 0, 0, 5), "https://a.com/?dup"),
        ("b.com/x", datetime(2026, 1, 1, 0, 1, 0), "https://b.com/x"),
    ]
    tbl = pa.table({
        "page_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "url": pa.array([r[2] for r in rows]),
    })
    d = tmp_path / "disc"
    d.mkdir()
    pq.write_table(tbl, str(d / "part0.parquet"))

    stream = (spark.readStream
              .schema("page_id string, ts timestamp, url string")
              .parquet(str(d)))
    admitted = S.streaming_admission(stream)
    q = (admitted.writeStream.format("memory").queryName("adm")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("adm").collect()
    assert sorted(r["page_id"] for r in out) == ["a.com", "b.com/x"]
