"""Z-order (Morton curve) data layout — multi-dimensional clustering
for data skipping at scale.

The WRITE path (sources/layout.py:write_zorder) materializes Morton-
clustered parquet; this module is its ANALYTICS twin: given two keys,
compute the zone map a Z-ordered layout would produce — per-zone row
counts and per-dimension min/max, i.e. exactly the footer statistics
min-max pruning would consult — so layout decisions ("would z-ordering
these two columns prune my workload?") can be answered with a query
instead of a rewrite of the table.

Unlike the writer (float scaling against driver-collected bounds —
fine for a physical layout where approximation only costs a little
locality), everything here is integer-exact: 16-bit normalization via
BIGINT `div`, bit interleave as shift/mask sums, bounds from ONE 1-row
aggregate joined back as a broadcast. Exactness is what makes the
zone map oracle-comparable bit for bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension; z-value spans 2*Z_BITS bits

# (v - vmin) * 65535 div max(vmax - vmin, 1): pure BIGINT arithmetic
# end to end (`div`, never float `/` + floor — near 2^53 a double
# quotient can round across an integer); operands are non-negative, so
# truncating `div` equals the DuckDB oracle's floor `//`.
_U16_TMPL = (
    "CAST(((({v}) - ({vmin})) * CAST(65535 AS BIGINT))"
    " div greatest(({vmax}) - ({vmin}), CAST(1 AS BIGINT)) AS BIGINT)"
)


def zvalue_col(ux: Column, uy: Column) -> Column:
    """Interleave two 16-bit values into a 32-bit Morton code:
    bit i of ux lands at position 2i, bit i of uy at 2i+1. Pure
    shift/and/sum expressions — whole-stage-codegen'd JVM arithmetic,
    no UDF, and literally the same formula the DuckDB oracle spells
    out term by term (:func:`zvalue_sql`)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(
            F.shiftleft(F.shiftright(ux, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(uy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zvalue_sql(ux: str, uy: str) -> str:
    """The DuckDB-SQL twin of :func:`zvalue_col` — one explicit
    32-term integer expression over column expressions `ux`/`uy`."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({ux} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({uy} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def u16_sql(v: str, vmin: str, vmax: str) -> str:
    """DuckDB-SQL twin of the 16-bit normalization (floor `//` over
    non-negative BIGINTs — same value the engine's `div` produces)."""
    return (
        f"((({v}) - ({vmin})) * CAST(65535 AS BIGINT))"
        f" // greatest(({vmax}) - ({vmin}), CAST(1 AS BIGINT))"
    )


def _with_norm(
    df: DataFrame, x_col: Column, y_col: Column
) -> DataFrame:
    """Shared 16-bit normalization for the curve layouts: attach
    __zx/__zy (raw bigint dims), __ux/__uy (16-bit normalized) and
    __chk (the range-overflow guard term, 0 when in bounds). Global
    min/max come from ONE 1-row aggregate crossJoined back (broadcast
    by size) — two narrow passes, no shuffle of the data itself."""
    tagged = (
        df.withColumn("__zx", x_col.cast("bigint"))
        .withColumn("__zy", y_col.cast("bigint"))
        .filter(F.col("__zx").isNotNull() & F.col("__zy").isNotNull())
    )
    bounds = tagged.agg(
        F.min("__zx").alias("__xmin"),
        F.max("__zx").alias("__xmax"),
        F.min("__zy").alias("__ymin"),
        F.max("__zy").alias("__ymax"),
    )
    ux = F.expr(_U16_TMPL.format(v="__zx", vmin="__xmin", vmax="__xmax"))
    uy = F.expr(_U16_TMPL.format(v="__zy", vmin="__ymin", vmax="__ymax"))
    # (v - vmin) * 65535 wraps BIGINT once a dimension's range reaches
    # 2^47 (2^47 * 65535 ~ 2^63). Fail loudly instead of silently
    # corrupting curve codes; the guard rides the same broadcast row
    # (added into the curve expression so column pruning can't drop it —
    # it contributes 0 whenever the ranges are in bounds).
    lim = F.lit(1 << 47).cast("bigint")
    chk = (
        F.when(
            ((F.col("__xmax") - F.col("__xmin")) >= lim)
            | ((F.col("__ymax") - F.col("__ymin")) >= lim),
            F.raise_error(
                F.lit(
                    "curve layout: dimension range >= 2^47 — 16-bit "
                    "normalization would overflow BIGINT; rescale the "
                    "column first"
                )
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
    )
    return (
        tagged.crossJoin(F.broadcast(bounds))
        .withColumn("__ux", ux)
        .withColumn("__uy", uy)
        .withColumn("__chk", chk)
        .drop("__xmin", "__xmax", "__ymin", "__ymax")
    )


def with_zvalue(
    df: DataFrame, x_col: Column, y_col: Column, z_name: str = "z"
) -> DataFrame:
    """Attach the Morton code of two integer expressions as `z_name`,
    keeping the normalized inputs as __zx/__zy (see _with_norm for the
    bounds/overflow-guard shape)."""
    n = _with_norm(df, x_col, y_col)
    return n.withColumn(
        z_name, zvalue_col(F.col("__ux"), F.col("__uy")) + F.col("__chk")
    ).drop("__ux", "__uy", "__chk")


def zorder_zonemap(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    bucket_bits: int = 10,
) -> DataFrame:
    """Zone-map summary of a Z-ordered layout: bucket rows by the top
    `bucket_bits` of the Morton code (the file/row-group boundaries a
    range-partitioned write would produce) and report each zone's row
    count and per-dimension min/max — the footer statistics data
    skipping would consult. Tight (max−min) per zone on BOTH
    dimensions is the whole point of the curve; the oracle checks the
    numbers, the plan test checks nothing shuffles but the one
    groupBy. Returns (zbucket, n, x_min, x_max, y_min, y_max)."""
    shift = 2 * Z_BITS - bucket_bits
    z = with_zvalue(df, x_col, y_col)
    return z.groupBy(
        F.shiftright(F.col("z"), shift).cast("bigint").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__zx").alias("x_min"),
        F.max("__zx").alias("x_max"),
        F.min("__zy").alias("y_min"),
        F.max("__zy").alias("y_max"),
    )



def hvalue_col(ux: Column, uy: Column) -> Column:
    """Hilbert-curve index of two 16-bit values (round 6): the classic
    xy→d bit walk (Wikipedia/Warren, public domain) — for each bit
    plane s = 2^15..2^0, add s²·((3·rx) xor ry) and rotate/reflect the
    quadrant frame — run as ONE F.aggregate fold over the 16 literal
    bit planes with a (d, x, y) struct accumulator. A runtime fold,
    not an unrolled expression: naive substitution would double the
    (x, y) expression tree per plane (2^16 blowup); the fold keeps it
    linear, still pure JVM integer arithmetic, no UDF.

    Hilbert vs Morton: both linearize 2-D, but Hilbert has no
    long-range jumps (adjacent curve positions are always grid
    neighbors), so zone min/max spans — what data skipping actually
    consults — are tighter on range workloads. The zonemap twin below
    makes that comparison measurable."""
    planes = F.array(*[F.lit(1 << (15 - i)).cast("long") for i in range(16)])
    init = F.struct(
        F.lit(0).cast("long").alias("d"),
        ux.cast("long").alias("x"),
        uy.cast("long").alias("y"),
    )

    def step(acc, s):
        rx = F.when((acc["x"].bitwiseAND(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when((acc["y"].bitwiseAND(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d2 = acc["d"] + s * s * (3 * rx).bitwiseXOR(ry).cast("long")
        nx = F.when(
            ry == 0, F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        ).otherwise(acc["x"])
        ny = F.when(
            ry == 0, F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        ).otherwise(acc["y"])
        return F.struct(d2.alias("d"), nx.alias("x"), ny.alias("y"))

    return F.aggregate(planes, init, step)["d"].cast("long")


def hilbert_zonemap(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    bucket_bits: int = 10,
) -> DataFrame:
    """Hilbert twin of :func:`zorder_zonemap`: identical 16-bit
    normalization and rollup, curve swapped — per-zone row count and
    per-dimension min/max of a Hilbert-clustered layout. Same plan
    shape (two narrow passes + one groupBy); the curve walk rides the
    projection. Returns (hbucket, n, x_min, x_max, y_min, y_max)."""
    shift = 2 * Z_BITS - bucket_bits
    # the 16-plane curve walk is an interpreted fold (HOFs don't
    # codegen) — spread a single-file scan before paying it (r9:
    # no-op at real scale, where the scan already has many splits)
    from ..utils import parallelize_narrow

    n = _with_norm(parallelize_narrow(df), x_col, y_col)
    h = n.withColumn(
        "__h", hvalue_col(F.col("__ux"), F.col("__uy")) + F.col("__chk")
    )
    return h.groupBy(
        F.shiftright(F.col("__h"), shift).cast("bigint").alias("hbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__zx").alias("x_min"),
        F.max("__zx").alias("x_max"),
        F.min("__zy").alias("y_min"),
        F.max("__zy").alias("y_max"),
    )
