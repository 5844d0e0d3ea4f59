from .ingest_stream import start_ingest_stream  # noqa: F401
