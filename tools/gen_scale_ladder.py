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


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/ladder_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(4242)
    for name, fn in (
        ("documents", gen_documents),
        ("embeddings", gen_embeddings),
        ("customer", gen_customer),
    ):
        t = fn(scale, rng)
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows -> {out_dir}/{name}.parquet")


if __name__ == "__main__":
    main()
