"""Corpus-boilerplate family: line-level C4 dedup, duplicate-span
hotspots, TF-IDF top terms — hand-computed micro-fixtures."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
    text as text_fn,
)
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
    dedup,
    lines,
)


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def line_docs(spark):
    # doc 1: lines A B; doc 2: lines B C (B repeats — doc 1 keeps it);
    # doc 3: line A again (doc 1 keeps it) + unique D.
    rows = [
        (1, ["alpha beta", "gamma delta"]),
        (2, ["gamma delta", "epsilon zeta"]),
        (3, ["alpha beta", "eta theta"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, lines array<string>")


def test_line_dedup_global_first_occurrence(line_docs):
    out = {
        r["doc_id"]: r
        for r in lines.line_dedup_stats(line_docs).collect()
    }
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["n_lines"] == 2 and out[3]["n_kept"] == 1
    # content pinned, not just counts
    assert out[1]["kept_md5"] == md5("alpha beta\ngamma delta")
    assert out[2]["kept_md5"] == md5("epsilon zeta")
    assert out[3]["kept_md5"] == md5("eta theta")


def test_line_dedup_doc_with_nothing_kept(spark):
    rows = [(1, ["x y"]), (2, ["x y"])]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r["doc_id"]: r for r in lines.line_dedup_stats(df).collect()}
    assert out[2]["n_kept"] == 0
    assert out[2]["kept_md5"] == md5("")


def test_line_dedup_ties_break_on_line_idx(spark):
    # Same doc repeats a line: first occurrence (lower idx) survives.
    df = spark.createDataFrame(
        [(7, ["dup line", "mid", "dup line"])],
        "doc_id long, lines array<string>",
    )
    row = lines.line_dedup_stats(df).collect()[0]
    assert row["n_lines"] == 3 and row["n_kept"] == 2
    assert row["kept_md5"] == md5("dup line\nmid")


def test_wrap_tokens_to_lines_shapes(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["lines"]
        for r in df.select(
            "doc_id", lines.wrap_tokens_to_lines(F.col("text"), 2).alias("lines")
        ).collect()
    }
    assert got[1] == ["a b", "c d", "e"]
    assert got[2] == ["x"]
    with pytest.raises(ValueError):
        lines.wrap_tokens_to_lines(F.col("text"), 0)


def test_shared_gram_hotspots_counts_docs_and_occurrences(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),   # gram "a b c" occurs at 2 positions
            (2, "z a b c z"),
            (3, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    out = dedup.shared_gram_hotspots(df, n=3, min_docs=2, top=5).collect()
    got = {r["gram"]: (r["n_docs"], r["n_occurrences"]) for r in out}
    assert got == {"a b c": (2, 3)}  # doc1 twice ("a b c a b c" windows 1,4) + doc2


def test_shared_gram_hotspots_ordering_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "p q p q"), (2, "p q x"), (3, "q x y"), (4, "x y z"), (5, "x y w")],
        "doc_id long, text string",
    )
    out = dedup.shared_gram_hotspots(df, n=2, min_docs=2, top=10).collect()
    keys = [(r["n_docs"], r["n_occurrences"], r["gram"]) for r in out]
    assert keys == sorted(keys, key=lambda t: (-t[0], -t[1], t[2]))


def test_tfidf_top_terms_ranking_and_score(spark):
    # 3 docs; "rare" appears only in doc 1 (df=1), "common" in all (df=3).
    df = spark.createDataFrame(
        [
            (1, "rare common common"),
            (2, "common other"),
            (3, "common third"),
        ],
        "doc_id long, text string",
    )
    out = text_fn.tfidf_top_terms(df, top_per_doc=2).collect()
    d1 = {r["term"]: r for r in out if r["doc_id"] == 1}
    # rare: tf=1, df=1, N=3 -> 3_000_000; common: tf=2, df=3 -> 2_000_000
    assert d1["rare"]["score_scaled"] == 3_000_000
    assert d1["rare"]["term_rank"] == 1
    assert d1["common"]["score_scaled"] == 2_000_000
    assert d1["common"]["term_rank"] == 2
    # every doc contributes at most top_per_doc rows
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in out)
    assert all(v <= 2 for v in per_doc.values())


def test_tfidf_tie_breaks_on_term(spark):
    df = spark.createDataFrame(
        [(1, "bbb aaa"), (2, "aaa bbb")], "doc_id long, text string"
    )
    out = [
        (r["term"], r["term_rank"])
        for r in text_fn.tfidf_top_terms(df, top_per_doc=2).collect()
        if r["doc_id"] == 1
    ]
    assert sorted(out, key=lambda t: t[1]) == [("aaa", 1), ("bbb", 2)]


def test_dedup_incremental_kill_paths(spark):
    # existing holds "A"; incoming holds a re-crawl of A (store-hit
    # kill), a batch-internal dup pair (first-occurrence kill), and a
    # genuinely new doc.
    existing = spark.createDataFrame(
        [(1, "doc alpha")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "Doc  ALPHA"),   # normalizes == existing -> killed
            (11, "doc beta"),
            (12, "doc beta"),     # batch dup -> 11 survives
            (13, "doc gamma"),
        ],
        "doc_id long, text string",
    )
    out = dedup.dedup_incremental(existing, incoming)
    assert sorted(r["doc_id"] for r in out.collect()) == [11, 13]


def test_dedup_incremental_accepts_fingerprint_store(spark):
    # At scale the existing side is a persisted fingerprint store, not
    # the corpus — a 1-column frame named `fingerprint` works directly.
    import hashlib

    store = spark.createDataFrame(
        [(hashlib.md5(b"doc alpha").hexdigest(),)], "fingerprint string"
    )
    incoming = spark.createDataFrame(
        [(10, "doc alpha"), (11, "doc beta")], "doc_id long, text string"
    )
    out = dedup.dedup_incremental(store, incoming)
    assert [r["doc_id"] for r in out.collect()] == [11]


def test_gopher_quality_flags_rules(spark):
    rows = [
        (1, "the cat sat on the mat and it is a fine day for all of us "
            "to be here now with many more words to pass the gate"),
        (2, "tiny doc"),                              # word-count fail
        (3, "!!! ??? ... ;;; ::: !!! ??? ... ;;; ::: " * 3),  # punct fail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text_fn.gopher_quality_flags(
            df, min_words=10, min_stopword_ratio=0.05
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["ok_word_count"] is False and out[2]["keep"] is False
    assert out[3]["ok_punct"] is False and out[3]["keep"] is False
    # per-rule flags stay independent: doc 2 fails count, not punct
    assert out[2]["ok_punct"] is True


def test_bpe_train_and_encode_hand_computed():
    """'low'x3 + 'lower'x2: round-1 pairs (l,o) and (o,w) tie at 5,
    lexicographic tie-break picks (l,o); then (lo,w) at 5, then
    (low,</w>) at 3, then the three 2-count pairs tie and (e,r) wins.
    Greedy apply: 'low' collapses to a single token, 'lowest' to
    low|e|s|t|</w> = 5."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import bpe

    merges = bpe.train_merges_on_texts(["low low low", "lower lower"], 4)
    assert merges == [
        ("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "r"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("low", ranks) == 1
    assert bpe.encode_word("lowest", ranks) == 5
    assert bpe.encode_word("", ranks) == 1  # bare </w>


def test_cdc_chunks_survive_prefix_insertion(spark):
    # the CDC property fixed windows lack: prepending text shifts every
    # fixed window, but content-defined boundaries re-synchronize, so
    # the unchanged tail still produces identical (shared) chunks
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        lines as lines_mod,
    )

    base = " ".join(f"tok{i % 37}x{i % 11}" for i in range(400))
    shifted = "alpha beta gamma " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r for r in lines_mod.cdc_chunk_stats(df).collect()
    }
    assert rows[1].n_chunks > 3
    # most of doc 1's chunks re-appear verbatim inside doc 2
    assert rows[1].n_shared_chunks >= rows[1].n_chunks - 2
    assert rows[2].n_shared_chunks >= rows[1].n_chunks - 2
    assert rows[1].n_tokens == 400
    assert rows[2].n_tokens == 403


def test_cdc_chunk_token_counts_conserve(spark):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        lines as lines_mod,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = lines_mod.cdc_chunk_stats(docs).collect()
    assert out
    for r in out:
        assert r.n_tokens >= r.n_chunks >= 1
        assert 0 <= r.n_shared_chunks <= r.n_chunks


def test_bpe_spark_trainer_paths_agree(spark, sf_dir):
    """The three trainers are exact replicas of one another: the
    pure-Python loop (Python tokenization), the distributed trainer's
    driver path (Spark word count, driver merge loop), and its
    open-vocabulary Spark-rounds path (per-round pair aggregation,
    JVM-side merge fold) — same merges, same order, on a real corpus."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    py = bpe.train_merges_on_texts(texts, 12)
    driver_path = bpe.train_bpe_merges_spark(docs, n_merges=12)
    rounds_path = bpe.train_bpe_merges_spark(
        docs, n_merges=12, driver_vocab_limit=0
    )
    assert py == driver_path == rounds_path
    assert len(py) == 12


def test_bpe_unicode_whitespace_tokenizes_like_java(spark):
    """Whitespace-parity guard (ADVICE r07): U+00A0 and U+0085 are
    whitespace to Python str.split() but NOT to Java \\s — the
    Spark-side word count keeps 'a\\u00a0b' as ONE word, and every
    Python-side replica (driver merge path, apply-pass tokenizer) must
    agree or the exact-by-construction oracle silently breaks on
    non-ASCII-whitespace corpora."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import bpe

    text = "a b xy p q\tr"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    # Spark word count: the glued tokens survive as single words
    words = {
        r["w"]: r["freq"] for r in bpe.word_freq_table(df).collect()
    }
    assert set(words) == {"a b", "xy", "p", "q", "r"}
    # Python replica tokenizer agrees exactly
    assert sorted(bpe._java_ws_words(text)) == sorted(words)
    # end to end: driver path == Spark-rounds path == pure-Python loop
    # on the unicode-whitespace corpus
    py = bpe.train_merges_on_texts([text], 6)
    assert py == bpe.train_bpe_merges_spark(df, n_merges=6)
    assert py == bpe.train_bpe_merges_spark(
        df, n_merges=6, driver_vocab_limit=0
    )
    # apply pass counts the glued words as single words too
    out = bpe.bpe_token_counts(df, py).collect()[0]
    assert out["n_words"] == 5


def test_bpe_spark_trainer_max_words_cap(spark):
    """max_words keeps only the top-K words by (freq DESC, word ASC)
    before the merge loop: with K=1 only 'low low low' survives, so
    the merges are exactly the 'low</w>' collapse chain."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import bpe

    df = spark.createDataFrame(
        [(1, "low low low lower"), (2, "low lower")], ["doc_id", "text"]
    )
    merges = bpe.train_bpe_merges_spark(df, n_merges=10, max_words=1)
    assert merges == [("l", "o"), ("lo", "w"), ("low", "</w>")]


def test_bm25_topk_ranking_properties(spark):
    """BM25 sanity on a constructed corpus: a document saturated with a
    query term outranks a balanced one; documents with no query term
    never appear; rank is contiguous from 1; n_tokens is the doc's
    whitespace token count; idf weighting makes the rarer query term
    worth more than the common one."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    rows = [
        (1, "spark spark spark spark filter"),   # tf-heavy on 'spark'
        (2, "spark filter scan sort group"),     # one hit
        (3, "filter scan sort group order"),     # no hits -> excluded
        (4, "join filter scan sort group"),      # rare term 'join'
        (5, "spark filter scan sort group by"),  # one hit, longer doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text_fn.bm25_topk(
        df, ["spark", "join"], top_k=10
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert 3 not in got
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    assert got[1]["n_tokens"] == 5
    # tf saturation still rewards repetition: doc 1 beats doc 2
    assert got[1]["score"] > got[2]["score"]
    # 'join' appears in 1/5 docs vs 'spark' in 3/5: idf makes the
    # single rare-term doc beat the single common-term doc
    assert got[4]["score"] > got[2]["score"]
    # longer doc with same tf scores lower (length normalization)
    assert got[2]["score"] > got[5]["score"]
    # all scores positive, truncated to the 1e-6 grid
    for r in out:
        assert r["score"] > 0
        assert abs(r["score"] * 1e6 - round(r["score"] * 1e6)) < 1e-3


def test_bm25_oversized_term_list_dispatches_to_inverted(spark):
    import pytest

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    # >128 distinct terms: auto dispatches to the inverted-index plan
    # (VERDICT r07 item 5) and still scores correctly
    out = text_fn.bm25_topk(df, [f"t{i}" for i in range(129)] + ["b"])
    assert out.count() == 1
    # forcing the conditional plan keeps the original fail-loudly cap
    with pytest.raises(ValueError, match="at most 128"):
        text_fn.bm25_topk(
            df, [f"t{i}" for i in range(129)], strategy="conditional"
        )
    with pytest.raises(ValueError, match="unknown bm25 strategy"):
        text_fn.bm25_topk(df, ["a"], strategy="bogus")
    # duplicates collapse before the cap: 200 copies of one term is fine
    assert text_fn.bm25_topk(df, ["a"] * 200).count() == 1


def test_bm25_inverted_matches_conditional(spark):
    """Differential gate between the two physical strategies: identical
    (rank, doc, n_tokens, score) rows on the same corpus and query —
    the inverted plan is a pure execution-strategy change."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    rows = [
        (1, "spark spark spark spark filter"),
        (2, "spark filter scan sort group"),
        (3, "filter scan sort group order"),
        (4, "join filter scan sort group"),
        (5, "spark filter scan sort group by"),
        (6, ""),
        (7, "join join spark"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    terms = ["spark", "join", "absent_term"]
    cond = text_fn.bm25_topk(df, terms, strategy="conditional").collect()
    inv = text_fn.bm25_topk(df, terms, strategy="inverted").collect()
    assert cond == inv


def test_round8_ops_on_empty_corpus(spark):
    """The four round-8 curation ops must survive a zero-row corpus
    with their declared schemas intact (the shape an incremental
    pipeline hits on an empty partition/day)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        dedup as dedup_mod,
        sampling,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    nb = text_fn.nb_class_log_odds(empty, F.col("lang") == "en")
    assert nb.columns == ["doc_id", "n_tokens", "mean_log_odds", "nb_label"]
    assert nb.count() == 0

    dsir = sampling.importance_resample(
        empty, F.col("source") == "src0", k=5
    )
    assert dsir.columns == ["doc_id", "source", "n_tokens", "log_weight"]
    assert dsir.count() == 0

    funnel = text_fn.curation_funnel(empty, F.col("lang") == "en").collect()
    assert [(r["stage"], r["n_docs"], r["n_tokens"]) for r in funnel] == [
        ("0_total", 0, 0),
        ("1_gopher", 0, 0),
        ("2_classifier", 0, 0),
        ("3_dedup", 0, 0),
    ]

    sub = dedup_mod.dedup_exact_substrings(empty)
    assert sub.columns == ["doc_id", "n_tokens", "n_removed", "cleaned_text"]
    assert sub.count() == 0
