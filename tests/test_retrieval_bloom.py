"""Tests for the retrieval operator family (TF-IDF / BM25 / bigram LM),
the Gopher repetition metrics, incremental batch-vs-corpus dedup, and the
manifest bloom-filter point-lookup pruning."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from airflow_etl_spark.operators import dedup, retrieval, text
from airflow_etl_spark.sources import txn


@pytest.fixture()
def docs(spark):
    rows = [
        Row(doc_id=1, text="spark merge vector spark merge spark table scan"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=3, text="spark spark spark spark spark spark spark spark"),
        Row(doc_id=4, text="merge vector merge vector merge vector merge vector"),
        Row(doc_id=5, text="a b"),
    ]
    return spark.createDataFrame(rows)


# ------------------------------------------------------------- retrieval --
def test_tfidf_topk_ranks_distinctive_terms(docs):
    out = retrieval.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 2's top keywords are its unique words, never corpus-common 'the'
    top2 = [r["term"] for r in sorted(by_doc[2], key=lambda r: r["rank"])]
    assert len(top2) == 2
    # 'the' appears only in doc 2 → idf = ln(5/1); tf=2 makes it the top term
    assert top2[0] == "the"
    # rank is dense 1..k per doc
    assert [r["rank"] for r in sorted(by_doc[1], key=lambda r: r["rank"])] == [1, 2]


def test_bm25_orders_by_query_term_density(docs):
    out = retrieval.bm25_search(docs, ["spark", "merge", "vector"], k=10)
    rows = {r["id"]: r for r in out.collect()}
    # doc 2 has zero query terms -> absent; docs 1/3/4 present
    assert 2 not in rows
    assert {1, 3, 4} <= set(rows)
    # doc 1 hits all three query terms; doc 3 only one -> doc 1 scores higher
    assert rows[1]["bm25"] > rows[3]["bm25"]
    ranks = sorted(r["rank"] for r in rows.values())
    assert ranks == list(range(1, len(rows) + 1))


def test_bigram_lm_score_prefers_typical_docs(spark):
    rows = [Row(doc_id=i, text="spark merge table scan spark merge") for i in range(8)]
    rows.append(Row(doc_id=99, text="zz qq spark pp merge ww"))
    df = spark.createDataFrame(rows)
    out = {r["id"]: r for r in retrieval.bigram_lm_score(df).collect()}
    # the doc made of unseen bigrams scores strictly lower than the
    # corpus-typical docs
    assert out[99]["lm_score"] < out[0]["lm_score"]
    assert out[0]["n_bigrams"] == 5


def test_bigram_lm_score_excludes_token_singletons(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="one"), Row(doc_id=2, text="two tokens here")]
    )
    ids = {r["id"] for r in retrieval.bigram_lm_score(df).collect()}
    assert ids == {2}


# ------------------------------------------------------------ repetition --
def test_repetition_features(docs):
    out = {r["id"]: r for r in text.repetition_features(docs).collect()}
    # doc 3 is one token repeated: top bigram 'spark spark' covers ~all chars
    assert out[3]["top_bigram"] == "spark spark"
    assert out[3]["dup_5gram_frac"] > 0.5
    # doc 2 has no repeated 5-grams
    assert out[2]["dup_5gram_frac"] == 0.0
    # doc 5 is too short for 5-grams -> 0.0, and has a bigram but no trigram
    assert out[5]["dup_5gram_frac"] == 0.0
    assert out[5]["top_bigram"] == "a b"
    assert out[5]["top_trigram"] is None
    # doc 4 alternates 'merge vector' -> that is the dominant bigram
    assert out[4]["top_bigram"] == "merge vector"
    assert 0 < out[4]["top_bigram_frac"] <= 1.0


# ---------------------------------------------------- incremental dedup ---
def test_incremental_neardup_flags_only_known_docs(spark):
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta"),
            Row(doc_id=2, text="one two three four five six seven eight nine"),
        ]
    )
    batch = spark.createDataFrame(
        [
            # exact duplicate of corpus doc 1
            Row(doc_id=10, text="alpha beta gamma delta epsilon zeta eta theta"),
            # entirely novel
            Row(doc_id=11, text="red orange yellow green blue indigo violet"),
        ]
    )
    out = dedup.incremental_neardup(batch, corpus).collect()
    matched = {r["batch_id"] for r in out}
    assert 10 in matched and 11 not in matched
    exact = [r for r in out if r["batch_id"] == 10 and r["match_id"] == 1]
    assert exact and exact[0]["est_jaccard"] == 1.0


# ------------------------------------------------------------- blooms -----
def test_bloom_point_lookup_prunes_and_is_exact(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    # spread keys across many files so a single key lives in few of them
    txn.commit(df.repartition(16, "k"), path, bloom_cols=["k"])

    m = txn.live_manifest(path)
    n_files = len(m["files"])
    assert n_files > 4
    assert any("bloom" in e and "k" in e["bloom"] for e in m["files"])

    for probe in (0, 1234, 1999):
        pruned = txn.pruned_files_point(path, "k", probe)
        assert 0 < len(pruned) < n_files  # bloom actually skips files
        got = txn.read_point(spark, path, "k", probe).collect()
        want = txn.read(spark, path).filter(F.col("k") == probe).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # absent key: bloom may or may not prune to zero files, but the read
    # must return no rows
    assert txn.read_point(spark, path, "k", 999_999).count() == 0


def test_bloom_survives_append_and_json_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.range(0, 500).select(F.col("id").alias("k"))
    txn.commit(base.repartition(8, "k"), path, bloom_cols=["k"])
    delta = spark.range(500, 600).select(F.col("id").alias("k"))
    txn.append_files(delta.repartition(2, "k"), path, bloom_cols=["k"])

    m = txn.live_manifest(path)
    # manifest is valid JSON end-to-end and old + new entries carry blooms
    json.dumps(m)
    with_bloom = [e for e in m["files"] if "bloom" in e]
    assert len(with_bloom) >= 2
    # a key only in the delta is found, and full-table count is intact
    assert txn.read_point(spark, path, "k", 555).count() == 1
    assert txn.read(spark, path).count() == 600


def test_bloom_python_spark_hash_parity(spark):
    # the driver-side probe positions must equal the Spark-side positions
    vals = ["abc", "42", "x-y_z"]
    df = spark.createDataFrame([Row(s=v) for v in vals])
    cols = [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("s"))), 1, 7),
            16,
            10,
        ).cast("bigint") % txn.BLOOM_M
        for i in range(txn.BLOOM_K)
    ]
    rows = df.select(F.col("s"), F.array(*cols).alias("pos")).collect()
    for r in rows:
        assert sorted(set(r["pos"])) == txn._bloom_positions_py(r["s"])


def test_lm_cross_split_scoring_flags_copied_doc(spark):
    """bigram_lm_score(train_df=...): a test doc copied verbatim from
    train scores strictly higher under the train LM than a gibberish doc
    whose bigrams were never seen (which bottoms out at the Laplace
    floor) — the discrimination the LM-contamination probe rests on."""
    from airflow_etl_spark.operators.retrieval import bigram_lm_score

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),  # leaked
            (101, "zxq wvu tsr qpo nml kji"),  # gibberish, all unseen
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r["lm_score"]
        for r in bigram_lm_score(test, train_df=train).collect()
    }
    assert out[100] > out[101]
    # self-scoring equivalence: train_df=None == train_df=df
    a = sorted(map(tuple, bigram_lm_score(train).collect()))
    b = sorted(map(tuple, bigram_lm_score(train, train_df=train).collect()))
    assert a == b


# ---------------------------------------------- trigram index (r7 s4) --
def test_trigram_search_equals_naive_scan(spark):
    from airflow_etl_spark.operators import retrieval

    rows = [
        (1, "the quick brown fox"),
        (2, "QUICK   Brown dogs"),      # normalization: case + ws collapse
        (3, "quickly browned"),          # contains the trigrams, not the phrase
        (4, "nothing here"),
        (5, "ab"),                       # shorter than a trigram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = retrieval.trigram_postings(docs)
    got = sorted(
        r.doc_id
        for r in retrieval.trigram_search(postings, docs, "quick brown").collect()
    )
    assert got == [1, 2]  # doc 3 is a candidate but fails the verify


def test_trigram_search_rejects_short_pattern(spark):
    import pytest as _pytest

    from airflow_etl_spark.operators import retrieval

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    postings = retrieval.trigram_postings(docs)
    with _pytest.raises(ValueError, match="cannot anchor"):
        retrieval.trigram_search(postings, docs, "ab")


# -- positional phrase search ------------------------------------------------


def _phrase_hits(spark, rows, phrase):
    from airflow_etl_spark.operators import retrieval

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = retrieval.phrase_search(
        retrieval.positional_postings(docs), phrase
    ).collect()
    return {r.doc_id: r.n_hits for r in got}


def test_phrase_search_basic_and_counts(spark):
    hits = _phrase_hits(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "beta alpha beta gamma end alpha beta gamma"),
            (3, "beta gamma alpha"),          # wrong order at start? no: contains 'beta gamma'
            (4, "alpha delta beta gamma"),
            (5, "nothing here"),
        ],
        "beta gamma",
    )
    assert hits == {1: 1, 2: 2, 3: 1, 4: 1}


def test_phrase_search_repeated_words_and_overlap(spark):
    # "a a" in "a a a": anchors 0 and 1 -> 2 overlapping occurrences;
    # a single "a" must NOT match (needs both offsets)
    hits = _phrase_hits(
        spark, [(1, "a a a"), (2, "b a b"), (3, "a b a")], "a a"
    )
    assert hits == {1: 2}


def test_phrase_search_three_words_strict_adjacency(spark):
    hits = _phrase_hits(
        spark,
        [(1, "x one two three y"), (2, "one two x three"), (3, "one three two")],
        "one two three",
    )
    assert hits == {1: 1}


def test_phrase_search_rejects_single_word(spark):
    from airflow_etl_spark.operators import retrieval
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="< 2 words"):
        retrieval.phrase_search(retrieval.positional_postings(docs), "solo")


def test_phrase_search_plan_filters_tokens_below_exchange(spark, sf_dir):
    """The corpus-sized posting relation must be filtered to the
    phrase's words BEFORE any exchange, and the offset join must
    broadcast — the properties that keep cost df-bounded at 100 TB."""
    from airflow_etl_spark import queries as Q
    from airflow_etl_spark.plans import formatted_plan

    import re

    plan = formatted_plan(Q.queries()["text_phrase_search"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the token IN-list filter exists and its node id is LOWER (closer to
    # the scan) than every exchange's — i.e. it runs before any shuffle
    m = re.search(r"\((\d+)\) Filter\nInput.*\nCondition : .*IN \(merge",
                  plan)
    assert m, "token IN-list filter not found in plan"
    first_exchange = min(
        int(x) for x in re.findall(r"\((\d+)\) Exchange", plan)
    )
    assert int(m.group(1)) < first_exchange
