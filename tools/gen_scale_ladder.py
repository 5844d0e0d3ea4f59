"""Generate a 10x (sf1-equivalent) corpus for the scale ladder.

The driver ships sf0.001/0.01/0.1 only; the dedup/similarity families'
linearity claims need a real 10x data point, not a replicated one. This
writes NEW deterministic data drawn from the same distribution family
as the sf0.1 tables (empirical vocab, length/lang/source distributions,
per-label embedding Gaussians, the TPC-H customer name pattern) — 10x
more DISTINCT content, so bucket occupancy, pair expansion, and index
cell sizes scale the way a real corpus grows, not the way a replica
does.

Writes documents/embeddings/customer parquet to
spark-warehouse/ladder_sf1/ (gitignored — regenerate on demand):

    python tools/gen_scale_ladder.py [out_dir] [scale]

Seeded numpy throughout; output is byte-stable for a given
(sf0.1 input, scale).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def load(table: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{table}.parquet"))


def gen_documents(scale: int, rng: np.random.Generator) -> pa.Table:
    docs = load("documents")
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()

    vocab = sorted({w for t in texts for w in t.split() if w})
    # empirical word frequencies so generated shingle/bucket occupancy
    # matches the source distribution
    counts = {w: 0 for w in vocab}
    for t in texts:
        for w in t.split():
            if w:
                counts[w] += 1
    freqs = np.array([counts[w] for w in vocab], dtype=np.float64)
    freqs /= freqs.sum()
    tok_lens = np.array([len(t.split()) for t in texts])
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    src_vals, src_counts = np.unique(sources, return_counts=True)
    src_p = src_counts / src_counts.sum()

    n = len(texts) * scale
    out_text: list[str] = []
    words = np.array(vocab)
    lens = rng.choice(tok_lens, size=n)
    for i in range(n):
        out_text.append(" ".join(rng.choice(words, size=max(int(lens[i]), 1), p=freqs)))
    # plant exact dups and near-dups at the source corpus's rate:
    # 8/5000 exact; near-dups arise naturally from the shared small
    # vocab (as in the source), plus an explicit 0.5% perturbed-copy set
    n_exact = max(1, int(round(8 / 5000 * n)))
    for j in range(n_exact):
        src_i = int(rng.integers(0, n))
        dst_i = int(rng.integers(0, n))
        out_text[dst_i] = out_text[src_i]
    n_near = max(1, n // 200)
    for j in range(n_near):
        src_i = int(rng.integers(0, n))
        toks = out_text[src_i].split()
        if len(toks) > 3:
            pos = int(rng.integers(0, len(toks)))
            toks[pos] = str(words[int(rng.integers(0, len(words)))])
        out_text[int(rng.integers(0, n))] = " ".join(toks)

    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(out_text),
            "lang": pa.array(rng.choice(lang_vals, size=n, p=lang_p)),
            "source": pa.array(rng.choice(src_vals, size=n, p=src_p)),
            "n_chars": pa.array([len(t) for t in out_text], type=pa.int64()),
        }
    )


def gen_embeddings(scale: int, rng: np.random.Generator) -> pa.Table:
    emb = load("embeddings")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(emb.column("label").to_pylist())
    n = len(vecs) * scale
    out = np.empty((n, vecs.shape[1]))
    out_label = np.empty(n, dtype=np.int64)
    # per-label Gaussian fit -> 10x fresh samples per label
    uniq = np.unique(labels)
    per = n // len(uniq)
    i = 0
    for lb in uniq:
        sel = vecs[labels == lb]
        mu, sd = sel.mean(axis=0), sel.std(axis=0) + 1e-9
        take = per if lb != uniq[-1] else n - i
        out[i : i + take] = rng.normal(mu, sd, size=(take, vecs.shape[1]))
        out_label[i : i + take] = lb
        i += take
    # planted near-dup vectors (~1%): tiny perturbations of existing rows
    n_dup = n // 100
    src_is = rng.integers(0, n, size=n_dup)
    dst_is = rng.integers(0, n, size=n_dup)
    out[dst_is] = out[src_is] + rng.normal(0, 1e-4, size=(n_dup, vecs.shape[1]))
    out_label[dst_is] = out_label[src_is]
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(out.tolist(), type=pa.list_(pa.float64())),
            "label": pa.array(out_label, type=pa.int64()),
        }
    )


def gen_customer(scale: int, rng: np.random.Generator) -> pa.Table:
    cust = load("customer")
    n = cust.num_rows * scale
    segs = np.unique(np.array(cust.column("c_mktsegment").to_pylist()))
    return pa.table(
        {
            "c_custkey": pa.array(range(n), type=pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(rng.integers(0, 25, size=n), type=pa.int64()),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, size=n), 2)
            ),
            "c_mktsegment": pa.array(rng.choice(segs, size=n)),
        }
    )


def gen_lineitem(scale: int, rng: np.random.Generator) -> pa.Table:
    """10× lineitem with 10× DISTINCT orders/parts/suppliers, preserving
    the structural distributions the graph/basket families depend on:
    lines-per-order, supplier-frequency skew (resampled marginal shape
    re-instantiated over a 10× key space), and the per-line numeric
    columns (empirical resample). Co-occurrence density per order stays
    constant while the pair UNIVERSE grows 100× — exactly how a real
    marketplace scales, and the regime the kNN sparsification must
    survive."""
    li = load("lineitem")
    ok = np.array(li.column("l_orderkey").to_pylist())
    n_orders_src = len(np.unique(ok))
    _, lines_per_order = np.unique(ok, return_counts=True)
    supp = np.array(li.column("l_suppkey").to_pylist())
    supp_vals, supp_counts = np.unique(supp, return_counts=True)
    n_supp = len(supp_vals) * scale
    # supplier popularity: tile the empirical count shape across the
    # 10x key space, then normalize (preserves skew profile)
    shape = np.sort(supp_counts)[::-1].astype(np.float64)
    pop = np.tile(shape, scale)[:n_supp]
    pop /= pop.sum()
    supp_ids = rng.permutation(n_supp)  # decorrelate popularity from id
    n_parts = len(np.unique(np.array(li.column("l_partkey").to_pylist()))) * scale
    n_orders = n_orders_src * scale
    counts = rng.choice(lines_per_order, size=n_orders)
    total = int(counts.sum())
    orderkeys = np.repeat(np.arange(n_orders, dtype=np.int64), counts)
    suppkeys = supp_ids[rng.choice(n_supp, size=total, p=pop)].astype(np.int64)
    partkeys = rng.integers(0, n_parts, size=total).astype(np.int64)
    qty = np.array(li.column("l_quantity").to_pylist())
    price = np.array(li.column("l_extendedprice").to_pylist())
    idx = rng.integers(0, len(qty), size=total)
    epoch = np.datetime64("1994-01-01")
    return pa.table(
        {
            "l_orderkey": pa.array(orderkeys),
            "l_partkey": pa.array(partkeys),
            "l_suppkey": pa.array(suppkeys),
            "l_linenumber": pa.array(
                np.concatenate([np.arange(1, c + 1) for c in counts]).astype(
                    np.int32
                )
            ),
            "l_quantity": pa.array(qty[idx]),
            "l_extendedprice": pa.array(price[idx]),
            "l_discount": pa.array(np.round(rng.uniform(0, 0.1, size=total), 2)),
            "l_tax": pa.array(np.round(rng.uniform(0, 0.08, size=total), 2)),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=total)),
            "l_linestatus": pa.array(rng.choice(["F", "O"], size=total)),
            "l_shipdate": pa.array(
                epoch + rng.integers(0, 2000, size=total).astype("timedelta64[D]")
            ),
        }
    )


def gen_part(scale: int, rng: np.random.Generator) -> pa.Table:
    """10× part dimension keyed to gen_lineitem's part id space, with
    the empirical brand/type/size marginals (what copurchase_lift and
    skyline read)."""
    pt = load("part")
    n = pt.num_rows * scale
    brands = np.array(pt.column("p_brand").to_pylist())
    types = np.array(pt.column("p_type").to_pylist())
    sizes = np.array(pt.column("p_size").to_pylist())
    prices = np.array(pt.column("p_retailprice").to_pylist())
    idx = rng.integers(0, pt.num_rows, size=n)
    return pa.table(
        {
            "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
            "p_name": pa.array([f"part {i}" for i in range(n)]),
            "p_brand": pa.array(brands[idx]),
            "p_type": pa.array(types[idx]),
            "p_size": pa.array(sizes[idx], type=pa.int32()),
            "p_retailprice": pa.array(prices[idx]),
        }
    )


def gen_orders(scale: int, rng: np.random.Generator) -> pa.Table:
    """10× orders with 10× DISTINCT customers, preserving the
    per-customer order-COUNT distribution (resampled from the real
    counts — drives how many intervals each interval_merge customer
    contributes) and the global orderdate range plus empirical
    price/status/priority marginals. NOT preserved (r6 ADVICE): the
    per-customer orderdate span/density — dates are drawn i.i.d.
    uniform over the global range independent of customer, so a
    synthetic customer's episode structure (episode count/length
    after interval_merge's gap-tolerance chaining) is denser-than-
    real for heavy customers; ladder wall-times for the episode
    family are an upper bound on merge work, not a calibrated
    replay of real per-customer temporal clustering."""
    od = load("orders")
    n = od.num_rows * scale
    cust = np.asarray(od.column("o_custkey").to_pylist())
    _, cnts = np.unique(cust, return_counts=True)
    n_cust = len(cnts) * scale
    per_cust = rng.choice(cnts, size=n_cust)
    custkeys = np.repeat(np.arange(n_cust, dtype=np.int64), per_cust)
    if len(custkeys) >= n:
        custkeys = custkeys[:n]
    else:
        pad = rng.integers(0, n_cust, size=n - len(custkeys))
        custkeys = np.concatenate([custkeys, pad])
    dt_us = np.asarray(od.column("o_orderdate").cast(pa.int64()).to_pylist())
    prices = np.asarray(od.column("o_totalprice").to_pylist())
    status = np.asarray(od.column("o_orderstatus").to_pylist())
    prio = np.asarray(od.column("o_orderpriority").to_pylist())
    uniq_s, cnt_s = np.unique(status, return_counts=True)
    uniq_p, cnt_p = np.unique(prio, return_counts=True)
    return pa.table(
        {
            "o_orderkey": pa.array(range(n), type=pa.int64()),
            "o_custkey": pa.array(custkeys, type=pa.int64()),
            "o_orderstatus": pa.array(
                rng.choice(uniq_s, size=n, p=cnt_s / cnt_s.sum())
            ),
            "o_totalprice": pa.array(rng.choice(prices, size=n)),
            "o_orderdate": pa.array(
                rng.integers(dt_us.min(), dt_us.max() + 1, size=n),
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                rng.choice(uniq_p, size=n, p=cnt_p / cnt_p.sum())
            ),
        }
    )


def gen_events(scale: int, rng: np.random.Generator) -> pa.Table:
    """10× events with 10× DISTINCT users, preserving the structural
    distributions the statistics family depends on: the per-user
    event-count distribution (drives Gini/Lorenz concentration and
    the Mann-Whitney arm sizes), the event-type mix, the value
    distribution (bootstrap resample), and the observed time span
    (drives the daily-series length for EWMA/ACF/CUSUM)."""
    ev = load("events")
    n = ev.num_rows * scale
    users = np.asarray(ev.column("user_id").to_pylist())
    _, cnts = np.unique(users, return_counts=True)
    n_users = len(cnts) * scale
    per_user = rng.choice(cnts, size=n_users)
    user_ids = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    if len(user_ids) >= n:
        user_ids = user_ids[:n]
    else:
        pad = rng.integers(0, n_users, size=n - len(user_ids))
        user_ids = np.concatenate([user_ids, pad])
    ts_us = np.asarray(ev.column("ts").cast(pa.int64()).to_pylist())
    types = np.asarray(ev.column("event_type").to_pylist())
    values = np.asarray(ev.column("value").to_pylist())
    uniq_t, cnt_t = np.unique(types, return_counts=True)
    return pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(
                rng.integers(ts_us.min(), ts_us.max() + 1, size=n),
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array(user_ids, type=pa.int64()),
            "event_type": pa.array(
                rng.choice(uniq_t, size=n, p=cnt_t / cnt_t.sum())
            ),
            "value": pa.array(rng.choice(values, size=n)),
            "props": pa.array(["{}"] * n),
        }
    )


def main() -> None:
    """usage: gen_scale_ladder.py [out_dir] [scale] [tables-csv]

    tables-csv restricts generation (e.g. `customer` for the 100x
    linkage-graph decade — the clusters path reads only customer, and
    100x documents would be gratuitous disk/time)."""
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/ladder_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(4242)
    for name, fn in (
        ("documents", gen_documents),
        ("embeddings", gen_embeddings),
        ("customer", gen_customer),
        ("lineitem", gen_lineitem),
        ("part", gen_part),
        ("events", gen_events),
        ("orders", gen_orders),
    ):
        if only is not None and name not in only:
            continue
        t = fn(scale, rng)
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows -> {out_dir}/{name}.parquet")


if __name__ == "__main__":
    main()
