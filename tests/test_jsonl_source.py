"""JSONL corpus source: good lines parse, malformed lines quarantine as
data, and the source composes with the dedup pipeline end-to-end."""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    dedup,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources import (
    read_jsonl_dir,
    split_quarantine,
)

LINES = [
    '{"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "s1", "meta": {"k": "v"}}',
    '{"doc_id": 2, "text": "alpha   BETA gamma", "lang": "en", "source": "s1", "meta": {}}',
    "{not json at all",
    '{"doc_id": 4, "text": "delta epsilon", "lang": "en", "source": "s2", "meta": null}',
]


def test_jsonl_read_quarantine_and_dedup(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")

    df = read_jsonl_dir(spark, str(tmp_path))
    good, bad = split_quarantine(df)

    assert good.count() == 3
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]["raw_line"]
    meta = {r["doc_id"]: r["meta"] for r in good.collect()}
    assert meta[1] == {"k": "v"}

    # composes with dedup: docs 1 and 2 normalize equal
    kept = dedup.exact_dedup(good.select("doc_id", "text"))
    assert kept.count() == 2
    assert {r["doc_id"] for r in kept.collect()} == {1, 4}
