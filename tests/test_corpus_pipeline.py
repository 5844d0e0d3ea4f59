"""End-to-end corpus preparation: planted exact dup, near dup, and a
junk document must each fall out at the right stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.corpus import (
    prepare_corpus,
)

from .conftest import SF_DIR


def test_prepare_corpus_stages(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    planted = docs.unionByName(
        spark.createDataFrame(
            [
                # exact dup of doc 0 (same text modulo whitespace/case)
                (100001, None),
                # junk: punctuation soup, no stopwords → low quality
                (100002, "!!! ??? ... ;;; :::"),
                # tiny: below token floor
                (100003, "two words"),
            ],
            "doc_id long, text string",
        ).withColumn(
            "text",
            F.coalesce(
                "text",
                F.upper(
                    F.lit(docs.filter(F.col("doc_id") == 0).collect()[0]["text"])
                ),
            ),
        )
    )

    clean, report = prepare_corpus(planted, min_quality=0.3, min_tokens=3)
    stages = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in report.collect()}

    n_in = planted.count()
    assert stages["input"] == (n_in, n_in)
    # the exact dup of doc 0 collapses
    assert stages["exact_dedup"][1] == n_in - 1
    # quality stage drops at least the junk + tiny docs
    assert stages["quality_filter"][1] <= stages["near_dedup"][1] - 2

    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 100001 not in ids and 100002 not in ids and 100003 not in ids
    assert 0 in ids
    # surviving docs carry a language tag
    assert clean.filter(F.col("lang_pred").isNull()).count() == 0


def test_lm_scores_rank_fluency_and_match_duckdb(spark, duck):
    """Self-referenced bigram LM: a doc stitched from common corpus
    bigrams must outscore planted gibberish, and per-doc logprobs must
    match a DuckDB implementation of the same closed form (1e-9)."""
    from pyspark.sql import functions as F

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        lm_scores,
    )
    from .conftest import SF_DIR

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    fluent = base.limit(1).select(
        F.lit(800000).cast("long").alias("doc_id"), F.col("text")
    )
    gibberish = spark.createDataFrame(
        [(800001, "qzx vplk wrmt jjqx zzvb koqp xntd grrl")], "doc_id long, text string"
    )
    docs = base.unionByName(fluent).unionByName(gibberish)
    # reference model = base corpus (scoring a singleton against itself
    # would make its own bigrams look perfectly predictable)
    got = {r["doc_id"]: r for r in lm_scores(docs, ref=base).collect()}
    assert got[800000]["lm_logprob"] > got[800001]["lm_logprob"]

    oracle = duck.execute(f"""
        WITH raw AS (SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')
                     UNION ALL SELECT 800000, (SELECT text FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id LIMIT 1)
                     UNION ALL SELECT 800001, 'qzx vplk wrmt jjqx zzvb koqp xntd grrl'),
        d AS (SELECT doc_id,
                     CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                          ELSE list_transform(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'), x -> lower(x)) END AS tk
              FROM raw),
        dref AS (SELECT * FROM d WHERE doc_id < 800000),
        bi AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
               FROM d, UNNEST(range(1, greatest(len(tk), 1))) t(i)
               WHERE len(tk) >= 2),
        bir AS (SELECT * FROM bi WHERE doc_id < 800000),
        uni AS (SELECT w, COUNT(*) AS c1 FROM (SELECT unnest(tk) AS w FROM dref) GROUP BY w),
        vv AS (SELECT COUNT(DISTINCT w) AS v, COUNT(*) AS n FROM (SELECT unnest(tk) AS w FROM dref)),
        bic AS (SELECT w1, w2, COUNT(*) AS c12 FROM bir GROUP BY w1, w2),
        sc AS (SELECT b.doc_id,
                      ln(0.9 * CASE WHEN u.c1 IS NOT NULL
                                    THEN COALESCE(c.c12, 0) * 1.0 / u.c1
                                    ELSE 0.0 END
                       + 0.1 * (COALESCE(u2.c1, 0) + 1) * 1.0 /
                               ((SELECT n FROM vv) + (SELECT v FROM vv))) AS lp
               FROM bi b
               LEFT JOIN bic c ON b.w1 = c.w1 AND b.w2 = c.w2
               LEFT JOIN uni u ON b.w1 = u.w
               LEFT JOIN uni u2 ON b.w2 = u2.w)
        SELECT doc_id, COUNT(*) AS n_bigrams, AVG(lp) AS lm
        FROM sc GROUP BY doc_id
    """).fetchall()
    odict = {i: (n, lm) for i, n, lm in oracle}
    for doc_id, r in got.items():
        if r["n_bigrams"] == 0:
            assert doc_id not in odict
            continue
        n, lm = odict[doc_id]
        assert r["n_bigrams"] == n, doc_id
        assert abs(r["lm_logprob"] - lm) < 1e-9, (doc_id, r["lm_logprob"], lm)


def test_prepare_corpus_without_report_is_lazy(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clean, report = prepare_corpus(docs, with_report=False)
    assert report is None
    assert clean.count() > 0


def test_prepare_corpus_with_decontam_and_classifier_stages(spark):
    """The optional stages: a doc leaking an eval 5-gram is dropped by
    decontamination; a doc the trained classifier scores below floor is
    dropped by the classifier filter; the report records both."""
    from pyspark.sql import Row

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.classify import (
        prior_milli,
        train_token_weights,
    )

    eval_q = "what is the capital of france and which river flows through paris"
    good = "the quick brown fox jumps over the lazy dog near the river bank today"
    frish = "le chat noir dort ici pres de la fenetre ouverte ce matin calme"
    leaked = "intro " + eval_q + " outro words to pad this document out properly"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text=leaked),
            Row(doc_id=3, text=frish),
        ]
    )
    eval_set = spark.createDataFrame([Row(doc_id=100, text=eval_q)])
    train = spark.createDataFrame(
        [
            Row(doc_id=0, text=good, lang="en"),
            Row(doc_id=1, text="the dog ran over the bank near the fox", lang="en"),
            Row(doc_id=2, text=frish, lang="fr"),
            Row(doc_id=3, text="le chien brun court vite ce matin", lang="fr"),
        ]
    )
    weights = train_token_weights(train, vocab_size=200)
    prior = prior_milli(train)

    clean, report = prepare_corpus(
        docs,
        min_quality=0.0,
        min_tokens=1,
        eval_set=eval_set,
        classifier_weights=weights,
        classifier_prior=prior,
        min_score_milli=0,
    )
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert kept == [1]  # 2 decontaminated, 3 classifier-rejected
    stages = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in report.collect()}
    assert stages["decontamination"] == (3, 2)
    assert stages["classifier_filter"] == (2, 1)
