"""Custom PySpark DataSource for the reference's queue wire format —
operator S2 as a FIRST-CLASS Spark source instead of a decode step.

The reference's consumer receives base64-wrapped JSON messages
`{"upload_id", "bucket_name", "file_name"}` (main.py:98-103). The
existing plan-level codec (functions/json_codec.py) decodes that wire
format from an already-loaded column; this module registers
``spark.read.format("uploadqueue")`` via the Spark 4 Python Data
Source API so a message dump (one base64 line per message, the shape
a queue-to-object-store archiver produces) is a TABLE:

- ``partitions()`` exposes one input partition per file, so a
  1000-executor cluster decodes a 1000-file dump with full
  parallelism — the file list is driver-side planning state, the
  decode runs in Arrow-batched Python workers.
- Each row carries provenance (``source_file``, ``line_no``) — the
  queue analogue of ``input_file_name()`` — so a malformed message is
  attributable to its exact wire position.
- A line that is not valid base64-JSON raises with file+line context:
  a queue dump with garbage in it should fail the scan loudly, not
  silently drop messages (the same fail-loud stance as the ingest
  gate's AnalysisException handling).

The decoded fields are byte-identical to
``decode_queue_message(wire, wrapped_base64=True)`` on the same lines
(parity is test-pinned), so everything downstream of S2 — the
idempotency gate, the ledger upsert — composes unchanged.
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

QUEUE_SOURCE_NAME = "uploadqueue"
_SCHEMA = (
    "upload_id string, bucket_name string, file_name string, "
    "source_file string, line_no bigint"
)


class _QueueFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _UploadQueueReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("uploadqueue source requires a path")

    def partitions(self):
        paths = []
        for root, _dirs, files in os.walk(self.path):
            for f in sorted(files):
                if f.startswith(("_", ".")):  # _SUCCESS, hidden/CRC files
                    continue
                paths.append(os.path.join(root, f))
        if not paths and os.path.isfile(self.path):
            paths = [self.path]
        return [_QueueFilePartition(p) for p in sorted(paths)]

    def read(self, partition: _QueueFilePartition):
        with open(partition.path, "rb") as fh:
            for i, raw in enumerate(fh):
                line = raw.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(base64.b64decode(line, validate=True))
                except Exception as ex:
                    raise ValueError(
                        f"malformed queue message at "
                        f"{partition.path}:{i}: {ex}"
                    ) from ex
                yield (
                    obj.get("upload_id"),
                    obj.get("bucket_name"),
                    obj.get("file_name"),
                    partition.path,
                    i,
                )


class _UploadQueueStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: the dump directory is treated as
    an append-only log of wire files consumed in NAME order, so the
    offset is simply the last consumed file name — a primitive-typed,
    checkpointable cursor, with `readBetweenOffsets` giving exact
    batch replay on recovery. Contract: producers append files with
    monotonically increasing names (what queue archivers and the
    `uploadqueue` sink's part-NNNNN naming both do); a file sorting
    BELOW the cursor is never picked up. The simple-reader form is
    deliberate — a queue dump's per-batch volume is message-sized; the
    partition-planned batch reader covers bulk backfills."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("uploadqueue stream requires a path")

    def _files(self):
        if not os.path.isdir(self.path):
            return []
        return sorted(
            f
            for f in os.listdir(self.path)
            if not f.startswith(("_", "."))
            and os.path.isfile(os.path.join(self.path, f))
        )

    def _decode(self, names):
        # materialized (not a generator): the runner pickles the batch
        # to ship it from the driver-side prefetch to executors
        rows = []
        for name in names:
            part = _QueueFilePartition(os.path.join(self.path, name))
            rows.extend(_UploadQueueReader({"path": self.path}).read(part))
        return iter(rows)  # list_iterator: an iterator AND picklable

    def initialOffset(self) -> dict:
        return {"consumed": ""}

    def read(self, start: dict):
        new = [f for f in self._files() if f > start["consumed"]]
        if not new:
            return iter(()), start
        end = {"consumed": new[-1]}
        return self._decode(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        names = [
            f
            for f in self._files()
            if start["consumed"] < f <= end["consumed"]
        ]
        return self._decode(names)


class _QueueCommit(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class _UploadQueueWriter(DataSourceWriter):
    """S5 as a first-class sink with the API's two-phase commit: each
    task stages its messages under a dot-prefixed directory (hidden
    from the reader's file walk), the driver renames staged files into
    place on `commit` and deletes them on `abort` — so a failed job
    leaves NO torn message files visible, the same all-or-nothing
    contract the ledger gets from its atomic directory exchange."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("uploadqueue sink requires a path")
        self.staging = os.path.join(self.path, ".staging")

    def write(self, iterator) -> _QueueCommit:
        import uuid

        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(self.staging, f"task-{uuid.uuid4().hex}.txt")
        n = 0
        with open(staged, "wb") as fh:
            for row in iterator:
                # same field order as the column codec's struct, compact
                # separators, raw UTF-8 — byte-compatible with
                # encode_queue_message on ASCII-safe payloads
                payload = json.dumps(
                    {
                        "upload_id": row["upload_id"],
                        "bucket_name": row["bucket_name"],
                        "file_name": row["file_name"],
                    },
                    separators=(",", ":"),
                    ensure_ascii=False,
                ).encode("utf-8")
                fh.write(base64.b64encode(payload) + b"\n")
                n += 1
        return _QueueCommit(staged, n)

    def commit(self, messages) -> None:
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(
                m.staged_path, os.path.join(self.path, f"part-{i:05d}.txt")
            )
        try:
            os.rmdir(self.staging)
        except OSError:
            pass
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class UploadQueueDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return QUEUE_SOURCE_NAME

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _UploadQueueReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _UploadQueueStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        names = [f.name for f in schema.fields]
        required = ["upload_id", "bucket_name", "file_name"]
        missing = [c for c in required if c not in names]
        if missing:
            raise ValueError(
                f"uploadqueue sink requires columns {required}; "
                f"missing {missing}"
            )
        return _UploadQueueWriter(self.options)


def register_queue_source(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(UploadQueueDataSource)


def write_queue_dump(df, path: str, n_files: int = 4) -> None:
    """Produce a wire-format dump from (upload_id, bucket_name,
    file_name) rows — the encode half, reusing the plan-level codec so
    dump and column-codec stay byte-identical. Files are hash-routed
    on upload_id (deterministic content per partition)."""
    from pyspark.sql import functions as F

    from ..functions.json_codec import encode_queue_message

    wire = encode_queue_message(
        "upload_id", "bucket_name", "file_name", wrap_base64=True
    )
    (
        df.repartition(n_files, "upload_id")
        # Spark's base64 is the MIME variant: past 76 chars it inserts
        # CRLF chunk breaks, which the line-oriented text writer would
        # turn into split (truncated) messages — emit canonical
        # single-line base64 on the wire
        .select(F.regexp_replace(wire, "[\\r\\n]", "").alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
