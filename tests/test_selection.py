"""DSIR importance-resampling weights: exact replication of the
hashed-bigram log-ratio pipeline on a planted corpus (the in-test
oracle — same md5 buckets, same add-1 smoothing, same milli rounding),
plus the directional property that makes the operator useful: raw docs
that *look like* the target slice outrank ones that don't."""

from __future__ import annotations

import hashlib
import math

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.selection import (
    dsir_weights,
)

TARGET_TEXTS = [
    "alpha beta gamma delta epsilon",
    "beta gamma delta epsilon zeta",
    "gamma delta epsilon zeta alpha",
    "delta epsilon zeta alpha beta",
]
BACKGROUND_TEXTS = [
    "uno dos tres cuatro cinco",
    "dos tres cuatro cinco seis",
    "tres cuatro cinco seis uno",
    "cuatro cinco seis uno dos",
]
# raw-pool probes: target-vocab text under a non-target lang, and a
# background-vocab twin — resampling should prefer the first.
PROBE_LIKE_TARGET = "alpha beta gamma delta"
PROBE_LIKE_BACKGROUND = "uno dos tres cuatro"


def _rows():
    rows = []
    for i, t in enumerate(TARGET_TEXTS):
        rows.append((i, t, "en"))
    for i, t in enumerate(BACKGROUND_TEXTS):
        rows.append((100 + i, t, "de"))
    rows.append((200, PROBE_LIKE_TARGET, "de"))
    rows.append((201, PROBE_LIKE_BACKGROUND, "fr"))
    return rows


def _expected(n_buckets: int = 1024):
    """Pure-Python replication of the operator's math (same md5
    buckets, same smoothing, same per-bucket milli rounding)."""

    def bigram_buckets(text):
        ws = text.strip().lower().split()
        return [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16) % n_buckets
            for a, b in zip(ws, ws[1:])
        ]

    rows = _rows()
    c_t: dict[int, int] = {}
    c_r: dict[int, int] = {}
    for _id, text, lang in rows:
        for b in bigram_buckets(text):
            c_r[b] = c_r.get(b, 0) + 1
            if lang == "en":
                c_t[b] = c_t.get(b, 0) + 1
    tot_t = sum(c_t.values())
    tot_r = sum(c_r.values())
    w = {
        b: round(
            math.log(
                ((c_t.get(b, 0) + 1.0) * (tot_r + n_buckets))
                / ((c_r[b] + 1.0) * (tot_t + n_buckets))
            )
            * 1000.0
        )
        for b in c_r
    }
    out = {}
    for _id, text, _lang in rows:
        bs = bigram_buckets(text)
        out[_id] = (len(bs), sum(w[b] for b in bs))
    return out


def test_dsir_weights_match_python_replica_exactly(spark):
    docs = spark.createDataFrame(_rows(), "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_milli"])
        for r in dsir_weights(docs).collect()
    }
    assert got == _expected()


def test_dsir_ranks_target_alike_above_background_alike(spark):
    docs = spark.createDataFrame(_rows(), "doc_id long, text string, lang string")
    got = {r["doc_id"]: r["dsir_milli"] for r in dsir_weights(docs).collect()}
    # (add-1 smoothing pulls every score negative at this corpus size;
    # DSIR is used as a *ranking*, so the invariant is ordering)
    assert got[200] > got[201]
    # each probe separates cleanly from the OTHER vocabulary's peers
    worst_target_peer = min(got[i] for i in range(4))
    best_background_peer = max(got[100 + i] for i in range(4))
    assert got[200] > best_background_peer
    assert got[201] < worst_target_peer


def test_dsir_skips_sub_bigram_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one-token", "en"), (2, "", "en"), (3, "two tokens", "de")],
        "doc_id long, text string, lang string",
    )
    out = dsir_weights(docs).collect()
    assert {r["doc_id"] for r in out} == {3}
