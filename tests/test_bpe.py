"""BPE training/encoding verified against an independent pure-Python
reference implementation on real corpus data (the oracle for an
iterative algorithm SQL can't express)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row, functions as F

from airflow_etl_spark import catalog
from airflow_etl_spark.operators import bpe

from tests.conftest import TEST_SF_DIR


# ---------------------------------------------------------------- reference
def _py_merge_pass(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {w: list(w) + [bpe.EOW] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (left, right), n = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if n <= 1:
            break
        merges.append((left, right))
        vocab = {w: _py_merge_pass(s, left, right) for w, s in vocab.items()}
    return merges, vocab


# ------------------------------------------------------------------- tests
def test_bpe_matches_python_reference_on_corpus(spark):
    docs = catalog.load_table(spark, TEST_SF_DIR, "documents")
    merges, vocab = bpe.bpe_train(docs, n_merges=10)

    wc = {r["word"]: r["cnt"] for r in bpe.word_counts(docs).collect()}
    ref_merges, ref_vocab = _py_bpe(wc, 10)

    assert merges == ref_merges
    got = {r["word"]: list(r["tokens"]) for r in vocab.collect()}
    assert got == ref_vocab


def test_bpe_merge_is_greedy_leftmost(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="aaa aaa aaa")])
    merges, vocab = bpe.bpe_train(df, n_merges=1)
    # best pair is (a, a); greedy pass over a a a </w> -> aa, a, </w>
    assert merges == [("a", "a")]
    toks = vocab.filter(F.col("word") == "aaa").collect()[0]["tokens"]
    assert list(toks) == ["aa", "a", bpe.EOW]


def test_bpe_encode_known_and_oov_words(spark):
    train = spark.createDataFrame(
        [Row(doc_id=i, text="low lower lowest low low") for i in range(3)]
    )
    merges, vocab = bpe.bpe_train(train, n_merges=5)
    assert merges  # something was learned
    test_df = spark.createDataFrame([Row(doc_id=9, text="low zebra")])
    out = {r["word"]: r for r in bpe.bpe_encode(test_df, vocab).collect()}
    # trained word uses merged tokens (fewer than chars+eow)
    assert out["low"]["n_tokens"] < 4
    # OOV word falls back to characters + EOW
    assert list(out["zebra"]["tokens"]) == ["z", "e", "b", "r", "a", bpe.EOW]
    assert [out["low"]["pos"], out["zebra"]["pos"]] == [0, 1]


def test_bpe_stops_when_counts_exhaust(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="ab cd")])
    merges, _ = bpe.bpe_train(df, n_merges=50)
    # every pair has count 1 -> nothing merges, no infinite loop
    assert merges == []


def test_vocab_persists_as_txn_artifact(spark, tmp_path):
    """The learned vocabulary is an ordinary relation: txn-commit it once,
    reload in a later job, and encoding from the stored artifact equals
    encoding from the in-memory one — tokenizer artifacts ride the same
    atomic table layer as data."""
    from airflow_etl_spark.sources import txn

    train = spark.createDataFrame(
        [Row(doc_id=i, text="pack my box with five dozen jugs") for i in range(4)]
    )
    _merges, vocab = bpe.bpe_train(train, n_merges=6)
    path = str(tmp_path / "vocab")
    txn.commit(vocab, path)

    reloaded = txn.read(spark, path)
    test_df = spark.createDataFrame([Row(doc_id=1, text="box jugs unknownword")])
    direct = sorted(
        (r["pos"], tuple(r["tokens"])) for r in bpe.bpe_encode(test_df, vocab).collect()
    )
    stored = sorted(
        (r["pos"], tuple(r["tokens"])) for r in bpe.bpe_encode(test_df, reloaded).collect()
    )
    assert direct == stored and len(direct) == 3
