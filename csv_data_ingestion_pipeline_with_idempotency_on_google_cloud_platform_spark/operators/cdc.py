"""Change-data-capture merge: apply an upsert/delete batch to a
snapshot — the MERGE INTO of lakehouse table formats, expressed as
plain DataFrame algebra over immutable parquet.

This is the generalized form of the reference's ledger upsert
(``main.py:61-68``: keyed ``set(merge=True)``): where the ledger keeps
every transition and resolves reads with latest-wins, `merge_changes`
produces the POST-IMAGE table — the shape needed when downstream
consumers want a current snapshot (feature stores, serving mirrors),
not an audit log.

Scale shape: ONE join. The snapshot side only ever anti-joins against
the change keys — a CDC batch is small relative to the table by
definition, so the anti-join broadcasts (AQE decides) and the snapshot
never shuffles; the change batch's internal latest-wins is a
map-side-combinable max_by on the key. Rewriting only affected
partitions (partition-pruned read + dynamic overwrite) is the storage
half of the same pattern (sources/layout.py covers file rewriting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "ts",
    op_col: str = "op",
) -> DataFrame:
    """Post-image of `snapshot` after applying `changes`.

    `changes` carries the snapshot columns plus `op_col` in
    {'upsert','delete'} and `ts_col` ordering concurrent changes to
    one key; the LATEST change per key wins (supply distinct
    timestamps per key for deterministic output, as any real CDC log
    does). A key whose final change is 'delete' drops out; any other
    final op is applied as an upsert (replace-or-insert).
    """
    row = F.struct(*[F.col(c) for c in changes.columns])
    latest = (
        changes.groupBy(key)
        .agg(F.max_by(row, F.col(ts_col)).alias("__row"))
        .select("__row.*")
    )
    untouched = snapshot.join(latest.select(key), key, "left_anti")
    applied = latest.filter(F.col(op_col) != F.lit("delete")).drop(op_col)
    return untouched.unionByName(applied.select(*snapshot.columns))
