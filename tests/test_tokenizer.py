"""BPE trainer/encoder vs a reference implementation of the classic
word-frequency algorithm (Sennrich et al. 2016)."""

from __future__ import annotations

import collections

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.tokenizer import (
    apply_bpe,
    learn_bpe_merges,
    merge_table,
    word_frequencies,
)

from .conftest import SF_DIR


def _ref_learn(texts: list[str], n_merges: int, min_pair_count: int = 2):
    """Straight-line reference: word-frequency table, overlapping pair
    counts, greedy left-to-right merge, (count desc, pair asc) choice."""
    wf = collections.Counter(w for t in texts for w in t.split())
    vocab = {tuple(w): c for w, c in wf.items()}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest (l, r)
        top = max(pairs.values())
        if top < min_pair_count:
            break
        l, r = sorted(p for p, c in pairs.items() if c == top)[0]
        merges.append((l, r, top))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def test_learn_matches_reference_on_toy_corpus(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = learn_bpe_merges(docs, n_merges=8, checkpoint_every=3)
    want = _ref_learn(texts, 8)
    assert got == want
    # the classic example learns 'est' pieces from newest/widest
    joined = ["".join((l, r)) for l, r, _ in got]
    assert "es" in joined or "st" in joined


def test_learn_handles_overlapping_runs(spark):
    docs = spark.createDataFrame([("aaaa aaaa baa",)], "text string")
    got = learn_bpe_merges(docs, n_merges=2)
    want = _ref_learn(["aaaa aaaa baa"], 2)
    assert got == want
    # overlapping 'aa' in 'aaaa' counts pairwise (3 per word) like the
    # canonical counter, and the merge collapses runs left-to-right
    assert got[0][:2] == ("a", "a")


def test_learn_stops_below_min_pair_count(spark):
    docs = spark.createDataFrame([("ab cd ef",)], "text string")
    # every pair occurs once → nothing reaches min_pair_count=2
    assert learn_bpe_merges(docs, n_merges=5) == []


def test_apply_bpe_encodes_with_learned_merges(spark):
    texts = ["low low low lower", "newest newest widest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = learn_bpe_merges(docs, n_merges=6, min_pair_count=2)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(docs, merges).collect()
    }
    # round-trip: concatenating a word's pieces reproduces the word
    for i, t in enumerate(texts):
        rebuilt, k = [], 0
        words = t.split()
        pieces = out[i]
        for w in words:
            acc = ""
            while acc != w:
                acc += pieces[k]
                k += 1
            rebuilt.append(acc)
        assert rebuilt == words
        assert k == len(pieces)
    # the hot word 'low' compresses into fewer symbols than characters
    merged_syms = [p for p in out[0] if len(p) > 1]
    assert merged_syms


def test_word_frequencies_and_merge_table_schema(spark):
    docs = spark.createDataFrame([("a b a",), ("",)], "text string")
    wf = {r["word"]: r["wcount"] for r in word_frequencies(docs).collect()}
    assert wf == {"a": 2, "b": 1}
    mt = merge_table(spark, [("a", "b", 7)])
    assert mt.columns == ["rank", "left", "right", "pair_count"]
    assert mt.collect()[0]["pair_count"] == 7


def test_learn_on_real_documents_is_deterministic(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents")
    m1 = learn_bpe_merges(docs, n_merges=5)
    m2 = learn_bpe_merges(docs, n_merges=5)
    assert m1 == m2 and len(m1) == 5


def test_bpe_literal_encode_hand_example(spark):
    """'the and there' under the frozen merge list: t h->th, th e->the,
    a n->an, an d->and, e r->er, r e->re."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.tokenizer import (
        bpe_literal_encode,
    )

    rows = [
        (1, "the and there"),   # the->1 piece; and->1; there: t h e r e -> th e r e -> the r e -> the re -> 2 pieces
        (2, "  "),              # blank -> zeros
        (3, "in inner"),        # in->1; inner: i n n e r -> in n er -> 3
        (4, "thth ththth"),     # adjacent runs: both merge fully (the
                                # two-pass replace = simultaneous BPE
                                # merge; one pass would skip every
                                # other occurrence)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bpe_literal_encode(df).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_symbols"], r1["n_pieces"]) == (3, 11, 4)
    assert r1["merge_gain_milli"] == (1000 * (11 - 4)) // 11
    assert (got[2]["n_words"], got[2]["n_symbols"], got[2]["n_pieces"]) == (0, 0, 0)
    assert got[2]["merge_gain_milli"] == 0
    r3 = got[3]
    assert (r3["n_words"], r3["n_symbols"], r3["n_pieces"]) == (2, 7, 4)
    r4 = got[4]
    # thth -> th th (2); ththth -> th th th (3): matches the repo's
    # own _encode_word merge-all-occurrences semantics
    assert (r4["n_words"], r4["n_symbols"], r4["n_pieces"]) == (2, 10, 5)
