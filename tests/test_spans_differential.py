"""Differential tests: duplicate_spans and repetition_stats vs plain
Python reference implementations on randomized corpora (seeded, like
test_filter_differential's strategy)."""

import random
from collections import Counter

import pytest

from syzgydb_spark.operators.dedup import duplicate_spans
from syzgydb_spark.operators.quality import repetition_stats


def _py_tokens(text):
    import re

    return [t for t in re.split(r"[^\w']+", text.lower()) if t]


def _py_spans(docs, gram_n, min_span):
    """Reference implementation: gram → set of docs; positions whose
    gram occurs in ≥2 docs; consecutive positions merge to islands."""
    gram_docs = {}
    doc_grams = {}
    for did, text in docs:
        toks = _py_tokens(text)
        grams = [
            " ".join(toks[i : i + gram_n]) for i in range(len(toks) - gram_n + 1)
        ]
        doc_grams[did] = grams
        for g in set(grams):
            gram_docs.setdefault(g, set()).add(did)
    out = set()
    for did, grams in doc_grams.items():
        dup_pos = [i for i, g in enumerate(grams) if len(gram_docs[g]) >= 2]
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        islands = []
        for p in dup_pos[1:]:
            if p == prev + 1:
                prev = p
            else:
                islands.append((start, prev))
                start = prev = p
        islands.append((start, prev))
        for s, e in islands:
            end = e + gram_n - 1
            if end - s + 1 >= min_span:
                out.add((did, s, end, end - s + 1))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_duplicate_spans_differential(spark, seed):
    """Random docs over a tiny token alphabet (forcing natural 3-gram
    collisions) must match the Python reference exactly."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(8)]  # tiny → lots of shared grams
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(24)
    ]
    want = _py_spans(docs, gram_n=3, min_span=4)
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, gram_n=3, min_span_tokens=4).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_repetition_stats_differential(spark, seed):
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(5)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for did, text in docs:
        toks = _py_tokens(text)
        bigrams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        top = max(Counter(bigrams).values()) if bigrams else 0
        r = got[did]
        assert r["n_tokens"] == len(toks)
        assert r["n_bigrams"] == max(len(toks) - 1, 0)
        assert r["top_bigram_count"] == top, (did, text)
        if toks:
            assert abs(r["distinct_token_ratio"] - len(set(toks)) / len(toks)) < 1e-12


# ------------------------------------------------ line_dedup differential


def _py_line_dedup(docs, min_count, min_chars):
    """Reference implementation of corpus-wide exact line dedup."""
    from collections import Counter

    counts = Counter()
    split = {}
    for did, text in docs:
        lines = text.split("\n")
        split[did] = lines
        for l in lines:
            t = l.strip(" ")  # SQL trim(): spaces only
            if len(t) >= min_chars:
                counts[t] += 1
    out = {}
    for did, lines in split.items():
        kept, removed = [], 0
        for l in lines:
            t = l.strip(" ")
            if len(t) >= min_chars and counts[t] >= min_count:
                removed += 1
            else:
                kept.append(l)
        out[did] = ("\n".join(kept), len(lines), removed)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_line_dedup_differential(spark, seed):
    """Randomized corpora with heavy line reuse: Spark line_dedup must
    agree exactly with the single-threaded reference on every doc."""
    from syzgydb_spark.operators.dedup import line_dedup

    rng = random.Random(seed)
    pool = [
        f"shared sentence number {i} with several words in it" for i in range(12)
    ] + ["shrt", "", "  ", "x" * 14, "y" * 15]
    docs = []
    for did in range(60):
        n = rng.randint(1, 8)
        lines = []
        for _ in range(n):
            if rng.random() < 0.6:
                l = rng.choice(pool)
            else:
                l = f"unique line {did} {rng.random()}"
            # random indentation exercises trim-matching
            lines.append(" " * rng.randint(0, 3) + l + " " * rng.randint(0, 2))
        docs.append((did, "\n".join(lines)))

    expected = _py_line_dedup(docs, min_count=3, min_chars=15)
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed_lines"])
        for r in line_dedup(df, min_count=3, min_line_chars=15).collect()
    }
    assert got == expected
