from .ingest import ingest_batch  # noqa: F401
from .ledger import (  # noqa: F401
    compact_ledger,
    latest_wins,
    list_uploads,
    point_lookup,
    read_ledger,
    upsert_append,
)
from .dlq import dlq_replay, route_to_dlq  # noqa: F401
from .bloom import bloom_anti_join  # noqa: F401
