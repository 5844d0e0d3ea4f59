"""Custom uploadqueue DataSource (sources/queue_source.py): decode
parity with the column codec, per-file partitioning, provenance, and
fail-loud malformed lines."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions.json_codec import (
    decode_queue_message,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.queue_source import (
    register_queue_source,
    write_queue_dump,
)


def _sample(spark, n=40):
    return spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("upload_id"),
        F.lit("bkt").alias("bucket_name"),
        F.concat(F.lit("f"), F.col("id"), F.lit(".csv")).alias("file_name"),
    )


def test_source_matches_column_codec(spark, tmp_path):
    dump = str(tmp_path / "dump")
    write_queue_dump(_sample(spark), dump, n_files=4)
    register_queue_source(spark)

    via_source = spark.read.format("uploadqueue").load(dump)
    via_codec = (
        spark.read.text(dump)
        .select(decode_queue_message("value", wrapped_base64=True).alias("m"))
        .select("m.upload_id", "m.bucket_name", "m.file_name")
    )
    key = lambda r: (r["upload_id"], r["bucket_name"], r["file_name"])
    a = sorted(key(r) for r in via_source.collect())
    b = sorted(key(r) for r in via_codec.collect())
    assert a == b and len(a) == 40


def test_one_partition_per_file_with_provenance(spark, tmp_path):
    dump = str(tmp_path / "dump4")
    write_queue_dump(_sample(spark), dump, n_files=4)
    register_queue_source(spark)
    df = spark.read.format("uploadqueue").load(dump)
    assert df.rdd.getNumPartitions() == 4
    prov = df.groupBy("source_file").agg(
        F.count("*").alias("n"), F.min("line_no").alias("lo")
    )
    rows = prov.collect()
    assert len(rows) == 4
    assert all(r["lo"] == 0 for r in rows)  # line numbering per file
    assert sum(r["n"] for r in rows) == 40


def test_malformed_line_fails_with_position(spark, tmp_path):
    dump = tmp_path / "bad"
    dump.mkdir()
    good = base64.b64encode(
        b'{"upload_id":"u1","bucket_name":"b","file_name":"f"}'
    )
    (dump / "part-0.txt").write_bytes(good + b"\nnot-base64!!\n")
    register_queue_source(spark)
    with pytest.raises(Exception, match="part-0.txt:1"):
        spark.read.format("uploadqueue").load(str(dump)).collect()


def test_sink_roundtrip_through_source(spark, tmp_path):
    """df.write.format('uploadqueue') → spark.read.format('uploadqueue')
    must be the identity on the three message fields, with staging
    cleaned up and a _SUCCESS marker (two-phase commit)."""
    import os

    register_queue_source(spark)
    out = str(tmp_path / "sink_out")
    os.makedirs(out)
    df = _sample(spark, 25)
    df.repartition(3).write.format("uploadqueue").option("path", out).mode(
        "append"
    ).save()

    assert os.path.exists(f"{out}/_SUCCESS")
    assert not os.path.exists(f"{out}/.staging")
    back = spark.read.format("uploadqueue").load(out)
    key = lambda r: (r["upload_id"], r["bucket_name"], r["file_name"])
    assert sorted(key(r) for r in back.collect()) == sorted(
        key(r) for r in df.collect()
    )


def test_sink_rejects_missing_columns(spark, tmp_path):
    register_queue_source(spark)
    bad = spark.range(3).select(F.col("id").cast("string").alias("upload_id"))
    with pytest.raises(Exception, match="bucket_name"):
        bad.write.format("uploadqueue").option(
            "path", str(tmp_path / "bad_out")
        ).mode("append").save()


def test_sink_wire_matches_column_codec_bytes(spark, tmp_path):
    """The sink's stdlib encoding must be byte-identical to the
    plan-level codec's wire format (so either end can produce or
    consume the other's dumps)."""
    import os

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.queue_source import (
        write_queue_dump,
    )

    register_queue_source(spark)
    df = _sample(spark, 10).coalesce(1)
    a = str(tmp_path / "via_sink")
    os.makedirs(a)
    df.write.format("uploadqueue").option("path", a).mode("append").save()
    b = str(tmp_path / "via_codec")
    write_queue_dump(df, b, n_files=1)

    lines = lambda d: sorted(
        ln
        for f in os.listdir(d)
        if not f.startswith(("_", "."))  # _SUCCESS, .crc sidecars
        for ln in open(os.path.join(d, f), "rb").read().splitlines()
        if ln
    )
    assert lines(a) == lines(b)


def test_stream_reader_consumes_incrementally(spark, tmp_path):
    """readStream.format('uploadqueue'): files landing after the first
    drain are picked up by the checkpointed name-cursor offset, and
    nothing is delivered twice."""
    import os

    register_queue_source(spark)
    dump = str(tmp_path / "stream_dump")
    os.makedirs(dump)
    sink = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "stream_ckpt")

    def land(name, ids):
        import base64 as b64
        import json as js

        with open(os.path.join(dump, name), "wb") as fh:
            for i in ids:
                payload = js.dumps(
                    {"upload_id": f"u{i}", "bucket_name": "b",
                     "file_name": f"f{i}.csv"},
                    separators=(",", ":"),
                ).encode()
                fh.write(b64.b64encode(payload) + b"\n")

    def drain():
        q = (
            spark.readStream.format("uploadqueue")
            .load(dump)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    land("msg-00000.txt", range(5))
    drain()
    land("msg-00001.txt", range(5, 8))
    drain()  # restart from checkpoint; only the new file may be read

    got = sorted(
        r["upload_id"] for r in spark.read.parquet(sink).collect()
    )
    assert got == sorted(f"u{i}" for i in range(8))


def test_source_composes_with_idempotency_gate(spark, tmp_path):
    """End-to-end S2→F2 through the CUSTOM source: queue messages for
    already-done uploads are filtered by the terminal-ledger anti-join;
    only genuinely new messages survive as work."""
    import os

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.ingest import (
        ingest_batch,
        terminal_upload_ids,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.ledger import (
        read_ledger,
    )

    csv_dir = str(tmp_path / "csvs")
    os.makedirs(csv_dir)
    for i in range(3):
        with open(f"{csv_dir}/data{i}.csv", "w") as fh:
            fh.write("id,name\n1,a\n2,b\n")
    ledger_dir = str(tmp_path / "ledger")
    ingest_batch(spark, csv_dir, ledger_dir)  # all three become done

    done = read_ledger(spark, ledger_dir).select(
        "upload_id", "bucket_name", "file_name"
    )
    # queue dump: redeliveries of the three done files + two new ones
    new = spark.createDataFrame(
        [("ffffaaaa00000001", "bkt", "new1.csv"),
         ("ffffaaaa00000002", "bkt", "new2.csv")],
        "upload_id string, bucket_name string, file_name string",
    )
    dump = str(tmp_path / "gate_dump")
    write_queue_dump(done.unionByName(new), dump, n_files=2)

    register_queue_source(spark)
    msgs = spark.read.format("uploadqueue").load(dump)
    skip = terminal_upload_ids(read_ledger(spark, ledger_dir))
    fresh = msgs.join(F.broadcast(skip), "upload_id", "left_anti")
    assert sorted(r["file_name"] for r in fresh.collect()) == [
        "new1.csv", "new2.csv",
    ]
