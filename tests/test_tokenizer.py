"""Subword tokenizer (operators/tokenizer.py): BPE fit determinism,
WordPiece greedy longest-match semantics, UNK paths, persistence
round-trip, and the zero-shuffle apply plan."""

import json

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.tokenizer import (
    MAX_WORD_LEN,
    UNK,
    WordpieceVocab,
    fit_bpe_vocab,
    tokenize,
    wordpiece_tokens,
)


def _vocab(pairs):
    return WordpieceVocab(pieces=sorted(pairs))


def test_greedy_longest_match_first():
    v = _vocab([("un", False), ("u", False), ("n", True),
                ("related", True), ("re", True), ("l", True),
                ("a", True), ("t", True), ("e", True), ("d", True)])
    # longest-first: "un" beats "u"; "related" beats "re"
    assert v.tokenize_word("unrelated") == ["un", "##related"]


def test_continuation_vs_initial_are_distinct():
    # "ab" exists only as a continuation: word-initial position must
    # NOT use it
    v = _vocab([("a", False), ("ab", True), ("b", True)])
    assert v.tokenize_word("aab") == ["a", "##ab"]
    assert v.tokenize_word("ab") == ["a", "##b"]


def test_unk_when_no_piece_matches():
    v = _vocab([("a", False), ("b", True)])
    assert v.tokenize_word("xa") == [UNK]
    assert v.tokenize_word("ax") == [UNK]  # 'x' has no continuation form


def test_long_word_is_unk():
    v = _vocab([("a", False), ("a", True)])
    assert v.tokenize_word("a" * MAX_WORD_LEN) == ["a"] + ["##a"] * (MAX_WORD_LEN - 1)
    assert v.tokenize_word("a" * (MAX_WORD_LEN + 1)) == [UNK]


def test_fit_is_deterministic_and_merges_frequent_pairs(spark):
    df = spark.createDataFrame(
        [(i, "low low low lower lowest") for i in range(4)], "id LONG, text STRING"
    )
    v1 = fit_bpe_vocab(df, "text", n_merges=10, min_count=1)
    v2 = fit_bpe_vocab(df, "text", n_merges=10, min_count=1)
    assert v1.pieces == v2.pieces
    # "low" appears in every word: the merges must build it up
    assert v1.tokenize_word("low")[0] == "low"
    # chars are always present in both positional forms
    assert ("l", False) in v1.pieces and ("o", True) in v1.pieces


def test_persistence_round_trip():
    v = _vocab([("he", False), ("llo", True), ("h", False), ("e", True),
                ("l", True), ("o", True)])
    v2 = WordpieceVocab.from_dict(json.loads(json.dumps(v.to_dict())))
    assert v2.pieces == v.pieces
    assert v2.tokenize_word("hello") == v.tokenize_word("hello")


def test_tokenize_dataframe_matches_python_core(spark):
    rows = [(0, "Hello hello world!"), (1, ""), (2, None), (3, "hello-world")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    v = _vocab([("hello", False), ("world", False), ("h", False),
                ("e", True), ("l", True), ("o", True), ("w", False),
                ("r", True), ("d", True)])
    out = {r["doc_id"]: r["wp_tokens"]
           for r in tokenize(df, v, "text").collect()}
    # lowercased split, punctuation dropped, same pieces either path
    assert out[0] == ["hello", "hello", "world"]
    assert out[1] == [] and out[2] == []
    assert out[3] == ["hello", "world"]


def test_count_column_is_piece_count(spark):
    df = spark.createDataFrame([(0, "ab ab")], "doc_id LONG, text STRING")
    v = _vocab([("a", False), ("b", True)])
    r = tokenize(df, v, "text").collect()[0]
    assert r["wp_tokens"] == ["a", "##b", "a", "##b"]
    assert r["wp_tokens_count"] == 4


def test_apply_plan_has_no_shuffle(spark, sf_dir):
    from syzgydb_spark.plans import scale_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v = _vocab([("a", False), ("b", True)])
    rep = scale_report(tokenize(docs, v, "text"))
    assert rep["n_shuffles"] == 0
