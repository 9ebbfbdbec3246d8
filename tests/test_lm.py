"""N-gram LM + BPE operator tests: hand-computed smoothed score, greedy
fold vs a pure-Python reference (property-style over random arrays),
training determinism, and the chained-merge semantics."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from traval_spark.operators.lm import (
    bpe_apply,
    bpe_pair_counts,
    bpe_train,
    lm_score,
    merge_pair,
    ngram_counts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, [1, 2, 1, 2, 3]), (2, [1, 2]), (3, [1, 1, 2]), (4, [5]),
         (5, [1, 1, 1])],
        "doc_id bigint, tokens array<int>",
    )


def test_lm_score_hand_computed(spark, corpus):
    """doc 2 = [1,2]: c(1,2)=4, c(prefix 1)=7, V=4 ->
    ln((4+.5)/(7+.5*4)) = ln(0.5)."""
    got = {r["doc_id"]: (r["n_grams"], r["avg_logp"])
           for r in lm_score(corpus).collect()}
    assert 4 not in got  # single-token doc has no bigram
    assert got[2][0] == 1
    assert got[2][1] == pytest.approx(math.log(0.5), rel=1e-12)
    # model trained on itself: every doc's score is a finite negative
    assert all(v[1] < 0 and math.isfinite(v[1]) for v in got.values())


def test_ngram_counts_trigram(spark, corpus):
    got = {(r["prefix"], r["gram"]): r["cnt"]
           for r in ngram_counts(corpus, n=3).collect()}
    assert got[("1,2", "1,2,1")] == 1
    assert got[("2,1", "2,1,2")] == 1
    assert got[("1,1", "1,1,1")] == 1
    assert got[("1,1", "1,1,2")] == 1
    assert len(got) == 5  # (1,2,3) is the fifth


def _ref_merge(toks, a, b, c):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(c)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def test_merge_pair_matches_reference_on_random_arrays(spark):
    rng = random.Random(7)
    rows = [(i, [rng.randrange(4) for _ in range(rng.randrange(0, 12))])
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")
    got = df.withColumn("m", merge_pair(F.col("tokens"), 1, 2, 99)).collect()
    for r in got:
        assert r["m"] == _ref_merge(r["tokens"], 1, 2, 99), r["tokens"]


def test_bpe_train_deterministic_and_chained(spark, corpus):
    """(1,2) wins round 1 (4 occurrences); after rewriting, (1,1) wins
    round 2 — and a third round may consume the new ids."""
    merges, out = bpe_train(corpus, 2, vocab_base=100)
    assert merges == [(1, 2, 100), (1, 1, 101)]
    got = {r["doc_id"]: r["tokens"] for r in out.collect()}
    assert got[1] == [100, 100, 3]
    assert got[5] == [101, 1]
    # apply on the raw corpus reproduces the training rewrite exactly
    re_applied = bpe_apply(corpus, merges)
    assert {r["doc_id"]: r["tokens"] for r in re_applied.collect()} == got


def test_bpe_pair_counts_values(spark, corpus):
    got = {(r["p"], r["w"]): r["cnt"] for r in bpe_pair_counts(corpus).collect()}
    assert got[(1, 2)] == 4
    assert got[(1, 1)] == 3
    assert got[(2, 1)] == 1
    assert got[(2, 3)] == 1
    assert sum(got.values()) == 9  # total bigram occurrences


def test_lm_score_flags_gibberish_tail(spark):
    """A document of corpus-typical bigrams outscores a document of
    never-seen bigrams — the filter's discriminative contract."""
    typical = [1, 2, 3] * 30
    docs = [(i, typical) for i in range(20)]
    docs.append((99, [7, 11, 13, 17, 19, 23]))  # grams unseen elsewhere
    df = spark.createDataFrame(docs, "doc_id bigint, tokens array<int>")
    got = {r["doc_id"]: r["avg_logp"] for r in lm_score(df).collect()}
    assert got[99] < got[0]
    assert got[99] == min(got.values())


def test_bm25_hand_computed(spark):
    """3-doc corpus, query {1}: N=3, df=2, avg_len=(2+4+3)/3=3 ->
    idf = ln(1 + 1.5/2.5); doc 10 tf=1 dl=2, doc 11 tf=2 dl=4."""
    from traval_spark.operators.lm import bm25_scores

    df = spark.createDataFrame(
        [(10, [1, 2]), (11, [1, 1, 3, 4]), (12, [5, 6, 7])],
        "doc_id bigint, tokens array<int>",
    ).withColumn("n_tok", F.size("tokens"))
    got = {r["doc_id"]: (r["n_terms"], r["score"])
           for r in bm25_scores(df, [1], k1=1.2, b=0.75).collect()}
    assert set(got) == {10, 11}
    idf = math.log(1 + 1.5 / 2.5)
    s10 = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2 / 3.0))
    s11 = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 4 / 3.0))
    assert got[10] == (1, pytest.approx(s10, rel=1e-12))
    assert got[11] == (1, pytest.approx(s11, rel=1e-12))
    assert got[11][1] > got[10][1]  # higher tf wins despite longer doc


def test_dsir_weights_python_replay_and_ordering(spark):
    """A 6-doc corpus with two vocabularies: docs made of target-side
    grams must outscore docs of off-target grams, and every (n_grams,
    logw) matches a pure-Python replay of the identical construction
    (md5 bucket, Laplace +1 over B, one log per bucket, 6dp dot)."""
    import hashlib
    from traval_spark.operators.lm import dsir_weights

    corpus_rows = [
        (1, "alpha beta alpha gamma"),
        (2, "beta alpha beta"),
        (3, "delta epsilon zeta"),
        (4, "zeta epsilon delta delta"),
        (5, "alpha zeta"),
        (6, None),
    ]
    target_rows = [(101, "alpha beta gamma alpha"),
                   (102, "beta gamma alpha")]
    B = 64
    corpus = spark.createDataFrame(corpus_rows,
                                   "doc_id bigint, text string")
    target = spark.createDataFrame(target_rows,
                                   "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_grams"], r["logw"])
           for r in dsir_weights(corpus, target, buckets=B).collect()}

    def grams(text):
        t = text.split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    raw, tgt, db = {}, {}, {}
    for did, txt in corpus_rows:
        if txt is None:
            continue
        for g in grams(txt):
            b = bucket(g)
            raw[b] = raw.get(b, 0) + 1
            db.setdefault(did, {})
            db[did][b] = db[did][b] + 1 if b in db[did] else 1
    for _, txt in target_rows:
        for g in grams(txt):
            b = bucket(g)
            tgt[b] = tgt.get(b, 0) + 1
    R, T = sum(raw.values()), sum(tgt.values())
    exp = {}
    for did, bs in db.items():
        lw = sum(
            n * math.log(((tgt.get(b, 0) + 1) * (R + B))
                         / ((raw[b] + 1) * (T + B)))
            for b, n in bs.items()
        )
        exp[did] = (sum(bs.values()), round(lw, 6))
    assert set(got) == set(exp)  # doc 6 (NULL text) emits nothing
    for did in exp:
        assert got[did][0] == exp[did][0]
        assert got[did][1] == pytest.approx(exp[did][1], abs=1e-6)
    # target-like docs over off-target docs
    assert min(got[1][1], got[2][1]) > max(got[3][1], got[4][1])


def test_dsir_weights_empty_target_degenerates_to_rarity(spark):
    """With an empty target every bucket's t_b is 0, so logw collapses
    to sum_b n_db * ln((R+B)/((r_b+1)*B)) — still defined, no NULLs,
    and docs of common grams score LOWER than docs of rare grams
    (pure inverse-frequency)."""
    from traval_spark.operators.lm import dsir_weights

    corpus = spark.createDataFrame(
        [(1, "x x x x"), (2, "y q")], "doc_id bigint, text string")
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    rows = {r["doc_id"]: r["logw"]
            for r in dsir_weights(corpus, empty, buckets=32).collect()}
    assert set(rows) == {1, 2} and all(v is not None for v in rows.values())


def test_unimax_budget_waterfilling_properties(spark):
    """Hand case: sizes {a:10, b:100, c:1000}, epochs 2, budget 500
    -> caps {20, 200, 2000}; a caps (20*3+0=60<=500), b caps
    (200*2+20=420<=500), c uncapped at t=(500-220)/1 = 280.0;
    allocations sum to the budget, epochs respect the cap; an
    oversized budget caps everyone and discloses the shortfall."""
    from traval_spark.operators.sampling import unimax_budget

    rows = [("a", 10), ("b", 100), ("c", 1000)]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    out = {r["source"]: r
           for r in unimax_budget(df, budget=500, max_epochs=2)
           .collect()}
    assert (out["a"]["capped"], out["b"]["capped"],
            out["c"]["capped"]) == (1, 1, 0)
    assert out["a"]["alloc"] == 20.0 and out["b"]["alloc"] == 200.0
    assert out["c"]["alloc"] == 280.0
    assert abs(sum(r["alloc"] for r in out.values()) - 500.0) < 1e-9
    assert out["a"]["epochs"] == 2.0  # exactly the cap
    assert out["c"]["epochs"] == 0.28
    assert all(r["shortfall"] == 0 for r in out.values())

    big = {r["source"]: r
           for r in unimax_budget(df, budget=10_000, max_epochs=2)
           .collect()}
    assert all(r["capped"] == 1 for r in big.values())
    assert big["a"]["shortfall"] == 10_000 - 2220


def test_heaps_fit_diverse_vs_saturated(spark):
    """A source whose every doc brings fresh tokens fits beta near 1;
    a source repeating one template fits beta near 0 — and the rungs
    are the nested dyadic samples (a token counts from the SMALLEST
    fraction containing any of its docs)."""
    from traval_spark.operators.text import heaps_fit

    fresh = [(i, "div", " ".join(f"w{i}_{j}" for j in range(20)))
             for i in range(64)]
    tmpl = [(1000 + i, "tpl", "the same old template text again")
            for i in range(64)]
    docs = spark.createDataFrame(fresh + tmpl,
                                 "doc_id bigint, source string, "
                                 "text string")
    out = {r["source"]: r for r in heaps_fit(docs, seed=5).collect()}
    assert out["div"]["n_rungs"] == 5
    assert out["div"]["beta"] > 0.95  # V grows ~ linearly with n
    assert out["tpl"]["beta"] < 0.1   # vocabulary saturated at rung 1
    assert out["div"]["r2"] > 0.99
