"""Market-basket co-occurrence: support / confidence / lift over
within-order item pairs — the association-rule primitive (Agrawal &
Srikant 1994's frequent-pair stage) a commerce-scale pipeline runs for
recommendations and for training-data co-occurrence features.

Scale design — the pair explosion is the whole problem:

* Pairs are generated per ORDER, never across the corpus: distinct
  (order, item-group) first (map-side-combined), then a self-join on
  the order key with ``a < b`` ordering. With g groups per order the
  expansion is C(g,2) ≤ C(|groups|,2) rows per order — bounded by the
  attribute's cardinality (brand: 25 → ≤300 pairs/order), NOT by
  order size. This is the same bucket-bounded-expansion contract as
  dedup._bucket_pairs.
* Marginals (per-group order counts) come from the same distinct
  relation and broadcast back onto the pair counts — the fact table
  is scanned once, shuffled once (on the order key).
* All metrics are exact integer milli-units: lift_milli =
  (1000·N·c_ab) div (c_a·c_b) — bit-identical in any engine, no
  float division in the hash. Max intermediate ~1000·N·c_ab fits
  BIGINT through ~10¹⁵ orders.

No analogue in the reference (ingest glue only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_lift(
    lineitem: DataFrame,
    part: DataFrame,
    group_col: str = "p_brand",
    min_pair_orders: int = 2,
) -> DataFrame:
    """Support/confidence/lift for within-order brand pairs.

    Returns (group_a, group_b, n_orders_pair, n_orders_a, n_orders_b,
    support_milli, confidence_milli, lift_milli) for unordered pairs
    a < b seen in at least ``min_pair_orders`` orders.
    """
    # one distinct (order, group) relation feeds pairs, marginals AND
    # the order count; checkpoint it lazily (r9): the four consumers
    # otherwise re-run the fact-table join + distinct per reference —
    # the query's single action materializes it, everything downstream
    # reads the (|orders|×|groups|-bounded) blocks
    og = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", group_col)),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("ok"), F.col(group_col).alias("g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # the order count rides the returned plan as a broadcast 1-row
    # aggregate (r10): the old `.count()` was a separate driver action
    # (plus a driver→literal round-trip) executed inside every timed
    # run; countDistinct over the checkpointed relation is the same
    # exact integer
    n_orders_df = og.agg(
        F.countDistinct("ok").cast("long").alias("__n_orders")
    )
    marg = og.groupBy("g").agg(F.count("*").alias("n_g"))
    a = og.select("ok", F.col("g").alias("ga"))
    b = og.select("ok", F.col("g").alias("gb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_orders)
    )
    out = (
        pairs.join(F.broadcast(marg.select(F.col("g").alias("ga"), F.col("n_g").alias("n_a"))), "ga")
        .join(F.broadcast(marg.select(F.col("g").alias("gb"), F.col("n_g").alias("n_b"))), "gb")
        .crossJoin(F.broadcast(n_orders_df))
    )
    return out.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.col("n_ab").alias("n_orders_pair"),
        F.col("n_a").alias("n_orders_a"),
        F.col("n_b").alias("n_orders_b"),
        F.expr("(1000 * n_ab) div __n_orders").alias("support_milli"),
        F.expr("(1000 * n_ab) div n_a").alias("confidence_milli"),
        F.expr("(1000 * cast(__n_orders as bigint) * n_ab) div (n_a * n_b)").alias(
            "lift_milli"
        ),
    )


def frequent_itemsets(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    top_pairs: int = 50,
    top_triples: int = 20,
) -> DataFrame:
    """A-priori frequent itemsets, sizes 2 and 3 (round 6; Agrawal &
    Srikant VLDB'94) — the classic market-basket mining step above
    X38's pair-lift: which item PAIRS and TRIPLES co-occur in at least
    ``min_support`` orders.

    A-priori pruning is the scale contract: items below
    ``min_support`` order-frequency are dropped BEFORE any pair join
    (an infrequent item cannot appear in a frequent set), so the
    per-order expansion runs over frequent items only — C(g,2) and
    C(g,3) with g = frequent items per order, the same order-bounded
    expansion as copurchase_lift. All counts are exact integers; the
    top-N cut per size breaks support ties lexicographically on the
    item ids, so the report replays identically in any engine.

    Returns (set_size, item_a, item_b, item_c, support) — item_c NULL
    for pairs; top `top_pairs`/`top_triples` rows per size by
    (support desc, items asc).
    """
    b = lineitem.select(
        F.col(order_col).alias("o"), F.col(item_col).alias("p")
    ).distinct()
    freq1 = (
        b.groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
        .where(F.col("c1") >= min_support)
        .select("p")
    )
    fb = b.join(F.broadcast(freq1), "p", "left_semi")
    a1 = fb.select(F.col("o"), F.col("p").alias("pa"))
    a2 = fb.select(F.col("o"), F.col("p").alias("pb"))
    a3 = fb.select(F.col("o"), F.col("p").alias("pc"))
    # the (o, pa, pb) pair relation feeds BOTH the pair supports and
    # the triple join; the fb exchange under it is planned once and
    # reused by every reference (a1/a2/a3 are canonically identical),
    # only the sort-merge pass re-executes per consumer. r10 measured
    # non-finding: a lazy localCheckpoint here to share that merge ran
    # 2.84 → 3.93 s (materializing ~0.9M pair rows costs more than the
    # second merge over the reused shuffle files).
    pair_rows = a1.join(a2, ["o"]).where(F.col("pb") > F.col("pa"))
    pairs = (
        pair_rows.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    triples = (
        pair_rows.join(a3, ["o"])
        .where(F.col("pc") > F.col("pb"))
        .groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    # per-size top-N as orderBy + limit — a TakeOrderedAndProject
    # (per-partition top-N, driver merge of N rows), never the r9
    # constant-key row_number window that sorted every surviving
    # itemset in ONE partition (r10; the ordering key is total —
    # support desc, items asc, items unique per group — so the row set
    # is identical to the rank filter, and the oracle's own ORDER
    # BY/LIMIT form matches verbatim)
    top2 = (
        pairs.orderBy(F.desc("support"), F.asc("pa"), F.asc("pb"))
        .limit(top_pairs)
        .select(
            F.lit(2).cast("long").alias("set_size"),
            F.col("pa").alias("item_a"),
            F.col("pb").alias("item_b"),
            F.lit(None).cast("long").alias("item_c"),
            "support",
        )
    )
    top3 = (
        triples.orderBy(F.desc("support"), F.asc("pa"), F.asc("pb"), F.asc("pc"))
        .limit(top_triples)
        .select(
            F.lit(3).cast("long").alias("set_size"),
            F.col("pa").alias("item_a"),
            F.col("pb").alias("item_b"),
            F.col("pc").alias("item_c"),
            "support",
        )
    )
    return top2.unionByName(top3)
