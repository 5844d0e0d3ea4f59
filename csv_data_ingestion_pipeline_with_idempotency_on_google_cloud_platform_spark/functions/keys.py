"""Content-addressed key derivation — operator K1 in SURVEY.md §2a.

Reference (``main.py:15-18,43-48``)::

    upload_id = sha256(f"{bucket}-{name}-{size}-{created_iso}")[:16]

Spark-first: a pure column expression (`concat_ws` + `sha2` + `substring`)
that stays inside whole-stage codegen — no UDF, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic ISO-8601 rendering of the creation timestamp (the
# reference uses datetime.isoformat(), main.py:47). Second precision is
# the engine's canonical key granularity.
ISO_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss"


def upload_id_col(
    bucket_name: Column | str = "bucket_name",
    file_name: Column | str = "file_name",
    file_size: Column | str = "file_size",
    time_created: Column | str = "time_created",
) -> Column:
    """16-hex-char truncated SHA-256 over the '-'-joined identity tuple.

    `concat_ws('-')` reproduces the reference's f-string join exactly;
    `coalesce(..., '')` matches its None→'' ternary (main.py:47).
    """
    bucket_name = F.col(bucket_name) if isinstance(bucket_name, str) else bucket_name
    file_name = F.col(file_name) if isinstance(file_name, str) else file_name
    file_size = F.col(file_size) if isinstance(file_size, str) else file_size
    time_created = F.col(time_created) if isinstance(time_created, str) else time_created

    created_iso = F.coalesce(F.date_format(time_created, ISO_TS_FORMAT), F.lit(""))
    joined = F.concat_ws(
        "-", bucket_name, file_name, file_size.cast("string"), created_iso
    )
    return F.substring(F.sha2(joined, 256), 1, 16)
