"""Column-function parity tests on an adversarial corpus: the Spark
expressions must agree with straight Python on empty strings, unicode,
whitespace soup, and punctuation-only text.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions import (
    content_hash_col,
    token_count_col,
    upload_id_col,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions.text import (
    lang_id_col,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
    fake_features,
)

CORPUS = [
    "",
    " ",
    "\t\n  \t",
    "hello world",
    "  leading and trailing  ",
    "multi   space\tand\ttabs",
    "the quick brown fox",
    "no stopwords here xyzzy qwerty",
    "สวัสดีครับ this is mixed",
    "你好世界",
    "Привет мир",
    "...!!!???",
    "a",
    "word " * 50,
]


def _py_tokens(t: str) -> list[str]:
    t = t.strip()
    return t.split() if t else []


def test_token_count_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "i int, text string")
    got = {r["i"]: r["n"] for r in df.select("i", token_count_col("text").alias("n")).collect()}
    for i, t in enumerate(CORPUS):
        assert got[i] == len(_py_tokens(t)), repr(t)


def test_content_hash_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "i int, text string")
    got = {r["i"]: r["h"] for r in df.select("i", content_hash_col("text").alias("h")).collect()}
    import re

    for i, t in enumerate(CORPUS):
        norm = re.sub(r"\s+", " ", t).strip().lower()
        assert got[i] == hashlib.sha256(norm.encode()).hexdigest(), repr(t)


def test_lang_id_edges(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "i int, text string")
    got = {r["i"]: r["l"] for r in df.select("i", lang_id_col("text").alias("l")).collect()}
    assert got[CORPUS.index("สวัสดีครับ this is mixed")] == "th"
    assert got[CORPUS.index("你好世界")] == "zh"
    assert got[CORPUS.index("Привет мир")] == "ru"
    assert got[CORPUS.index("the quick brown fox")] == "en"
    assert got[CORPUS.index("no stopwords here xyzzy qwerty")] == "unknown"
    assert got[CORPUS.index("")] == "unknown"


def test_upload_id_parity_with_reference_formula(spark):
    """upload_id == sha256(f'{bucket}-{name}-{size}-{iso}')[:16]
    (reference main.py:15-18) for normal and null-timestamp rows."""
    rows = [
        ("b", "f.csv", 10, "2024-03-01 12:34:56"),
        ("bucket-x", "weird name.csv", 0, "1999-12-31 23:59:59"),
        ("b2", "null-ts.csv", 7, None),
    ]
    df = spark.createDataFrame(
        [(b, f, s, ts) for b, f, s, ts in rows],
        "bucket_name string, file_name string, file_size long, created string",
    ).select(
        "bucket_name",
        "file_name",
        upload_id_col(
            "bucket_name", "file_name", "file_size", F.col("created").cast("timestamp")
        ).alias("uid"),
    )
    got = {r["file_name"]: r["uid"] for r in df.collect()}
    for b, f, s, ts in rows:
        iso = ts.replace(" ", "T") if ts else ""
        expected = hashlib.sha256(f"{b}-{f}-{s}-{iso}".encode()).hexdigest()[:16]
        assert got[f] == expected, f


def test_queue_codec_roundtrip(spark):
    """encode_queue_message ∘ decode_queue_message == identity, including
    the base64 wire wrapping (reference main.py:74-81 → 98-103)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions import (
        decode_queue_message,
        encode_queue_message,
    )

    df = spark.createDataFrame(
        [("abc123", "bucket-1", "a.csv"), ("def456", "bucket-2", "weird name.csv")],
        "upload_id string, bucket_name string, file_name string",
    )
    wire = df.select(
        encode_queue_message(wrap_base64=True).alias("data"),
        "upload_id",
    )
    decoded = wire.select(
        "upload_id", decode_queue_message("data", wrapped_base64=True).alias("m")
    ).select("upload_id", "m.*")
    rows = {r["upload_id"]: r for r in decoded.collect()}
    assert rows["abc123"]["bucket_name"] == "bucket-1"
    assert rows["def456"]["file_name"] == "weird name.csv"


def test_fake_features_deterministic():
    a = fake_features(b"payload")
    b = fake_features(b"payload")
    assert a == b and len(a) == 8
    assert all(0 <= x < 1 for x in a)
    assert fake_features(b"other") != a


def test_pii_redaction_planted(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions.text import (
        pii_counts_cols,
        redact_pii_col,
    )

    cases = [
        ("contact a.b-c_d%x+1@sub.example.co.uk today", "contact <EMAIL> today", 1, 0),
        ("card 4111 1111-1111 1111 exp", "card <NUMBER> exp", 0, 1),
        ("no pii here", "no pii here", 0, 0),
        ("short 12345 stays", "short 12345 stays", 0, 0),
        ("x@y.io and 0123456789", "<EMAIL> and <NUMBER>", 1, 1),
    ]
    df = spark.createDataFrame([(t,) for t, *_ in cases], "text string")
    counts = pii_counts_cols("text")
    got = df.select(
        "text",
        redact_pii_col("text").alias("red"),
        counts["n_emails"].alias("ne"),
        counts["n_long_numbers"].alias("nn"),
    ).collect()
    by_text = {r["text"]: r for r in got}
    for text, expected, ne, nn in cases:
        r = by_text[text]
        assert r["red"] == expected, (text, r["red"])
        assert (r["ne"], r["nn"]) == (ne, nn), (text, r["ne"], r["nn"])


def test_repetition_signals_on_planted_docs(spark):
    """Gopher-style repetition fractions: a repetitive doc scores high,
    clean prose scores zero."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions.text import (
        repetition_cols,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "a b a b\na b a b\nxyz"),   # dup line + heavy bigram reuse
            (2, "every word here differs"),  # clean
            (3, "one"),                      # no bigrams at all
        ],
        "doc_id long, text string",
    )
    rep = repetition_cols("text")
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            F.round(rep["dup_line_frac"], 4).alias("dl"),
            F.round(rep["dup_bigram_frac"], 4).alias("db"),
        ).collect()
    }
    assert rows[1]["dl"] == round(1 / 3, 4)   # 3 lines, 2 distinct
    assert rows[1]["db"] == round(5 / 8, 4)   # 8 bigrams, 3 distinct
    assert rows[2]["dl"] == 0.0 and rows[2]["db"] == 0.0
    assert rows[3]["db"] == 0.0


def test_constraint_checks_detect_planted_violations(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.profiling import (
        check_not_null,
        check_references,
        check_unique,
        run_checks,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 20), (3, None), (4, 99)],
        "id long, parent_id long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    report = {
        r["constraint"]: r["n_violations"]
        for r in run_checks(
            [
                check_unique(child, ["id"]),
                check_not_null(child, "parent_id"),
                check_references(child, "parent_id", parent, "pid", "fk(parent_id)"),
            ]
        ).collect()
    }
    assert report["unique(id)"] == 1  # id=2 twice -> one extra row
    assert report["not_null(parent_id)"] == 1
    # orphans: only 99; the NULL parent_id is NOT a reference violation
    # (SQL FK semantics — check_not_null covers it separately)
    assert report["fk(parent_id)"] == 1


def test_profile_table_handles_hostile_column_names(spark):
    """Column names with spaces, hyphens, quotes, and backticks must
    survive the stack() SQL round-trip (identifiers backtick-quoted,
    label literals escaped)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.profiling import (
        profile_table,
    )

    df = (
        spark.range(3)
        .selectExpr(
            "id AS `my col`",
            "id * 2 AS `with-hyphen`",
            "CAST(id AS STRING) AS `it's`",
        )
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"my col", "with-hyphen", "it's"}
    assert rows["my col"]["n_rows"] == 3
    assert rows["with-hyphen"]["n_distinct"] == 3
    assert rows["it's"]["n_nulls"] == 0


def test_hard_negatives_mines_null_label_vectors(spark):
    """NULL-label (unlabeled) corpus vectors are valid negatives for
    labeled anchors, and NULL-label anchors mine labeled vectors; only
    NULL-vs-NULL counts as same-label (IS DISTINCT FROM semantics)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        hard_negatives,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], "a"),
            (1, [0.9, 0.1], None),  # unlabeled, near anchor 0
            (2, [0.0, 1.0], "b"),
            (3, [0.1, 0.9], None),  # unlabeled, near vec 2
        ],
        "vec_id long, embedding array<double>, label string",
    )
    anchors = emb.filter("vec_id IN (0, 1)")
    out = hard_negatives(emb, anchors, k=2)
    mined = {
        (r["anchor_id"], r["vec_id"]) for r in out.collect()
    }
    # labeled anchor 0 ('a') mines the unlabeled vec 1 (closest)
    assert (0, 1) in mined
    # unlabeled anchor 1 mines labeled vectors but NOT fellow-NULL vec 3
    assert (1, 0) in mined
    assert all(v != 3 for (a, v) in mined if a == 1)


def test_merge_changes_semantics(spark):
    """CDC merge post-image: latest change per key wins, deletes drop,
    upserts replace or insert, untouched rows pass through unchanged."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.cdc import (
        merge_changes,
    )

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, payload string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", "upsert", 1),   # replace
            (3, "c2", "upsert", 1),   # superseded by the later delete
            (3, "c3", "delete", 2),
            (4, "d", "upsert", 1),    # insert
            (5, "e", "delete", 1),    # delete of a missing key: no-op
        ],
        "id long, payload string, op string, ts long",
    )
    got = {
        (r["id"], r["payload"])
        for r in merge_changes(snap, changes, key="id").collect()
    }
    assert got == {(1, "a"), (2, "b2"), (4, "d")}


def test_cosine_zero_vector_is_total(spark):
    """Zero-norm vectors must score 0.0, not kill the job under ANSI
    division semantics — real corpora contain empty/padding rows."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions.vectors import (
        cosine_similarity_col,
    )

    df = spark.createDataFrame(
        [
            ([0.0, 0.0], [1.0, 2.0]),
            ([0.0, 0.0], [0.0, 0.0]),
            ([3.0, 4.0], [3.0, 4.0]),
        ],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in df.select(cosine_similarity_col("a", "b").alias("c")).collect()]
    assert got == [0.0, 0.0, 1.0]
    # a NULL embedding is corrupt data, not a dissimilar one: it must
    # propagate NULL, never masquerade as similarity 0.0
    nulls = spark.createDataFrame(
        [(None, [1.0, 0.0])], "a array<double>, b array<double>"
    )
    assert nulls.select(cosine_similarity_col("a", "b").alias("c")).first()["c"] is None
