"""Queue-message JSON codec — operators S2/S5 in SURVEY.md §2a.

Reference: producer ``main.py:74-81`` JSON-serializes a 3-field dict and
publishes it base64-wrapped; consumer ``main.py:98-103`` base64-decodes
and JSON-parses. Spark-first: `to_json(struct(...))` / `from_json` with
the explicit QUEUE_MESSAGE_SCHEMA, plus `base64`/`unbase64` for the wire
wrapping — all JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import QUEUE_MESSAGE_SCHEMA


def encode_queue_message(
    upload_id: Column | str = "upload_id",
    bucket_name: Column | str = "bucket_name",
    file_name: Column | str = "file_name",
    wrap_base64: bool = False,
) -> Column:
    """JSON payload `{"upload_id":...,"bucket_name":...,"file_name":...}`."""
    cols = [
        (F.col(c) if isinstance(c, str) else c).alias(name)
        for c, name in (
            (upload_id, "upload_id"),
            (bucket_name, "bucket_name"),
            (file_name, "file_name"),
        )
    ]
    payload = F.to_json(F.struct(*cols))
    if wrap_base64:
        payload = F.base64(payload.cast("binary"))
    return payload


def decode_queue_message(data: Column | str, wrapped_base64: bool = False) -> Column:
    """Inverse of encode: (optionally unbase64) → parse → struct column."""
    col = F.col(data) if isinstance(data, str) else data
    if wrapped_base64:
        col = F.unbase64(col).cast("string")
    return F.from_json(col, QUEUE_MESSAGE_SCHEMA)
