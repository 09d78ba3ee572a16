"""Kneser-Ney bigram LM scores (operators/text.py kn_bigram_scores).

Golden: an independent pure-Python interpolated-KN implementation
(dict counters, no Spark) over a tiny corpus with repeats, OOV tokens
and a whitespace-only doc. The cross-engine oracle lives in
queries.py (`kn_bigram_quality`, DuckDB window-lag rebuild).
"""

import math
from collections import Counter

import pytest


def _kn_golden(docs, vocab_size, d=0.75):
    toks = {i: [t for t in text.split(" ") if t] for i, text in docs}
    cf = Counter(t for ts in toks.values() for t in ts)
    vocab = {t for t, _ in sorted(cf.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:vocab_size]}
    seqs = {i: ["\x02"] + [t if t in vocab else "\x01" for t in ts]
            for i, ts in toks.items() if ts}
    big = Counter()
    for seq in seqs.values():
        for v, w in zip(seq, seq[1:]):
            big[(v, w)] += 1
    c_v, n1p_v, n1p_w = Counter(), Counter(), Counter()
    for (v, w), c in big.items():
        c_v[v] += c
        n1p_v[v] += 1
        n1p_w[w] += 1
    nb = len(big)

    def p(v, w):
        return (max(big[(v, w)] - d, 0) / c_v[v]
                + d * n1p_v[v] / c_v[v] * (n1p_w[w] / nb))

    out = {}
    for i, seq in seqs.items():
        ps = [p(v, w) for v, w in zip(seq, seq[1:])]
        out[i] = (len(ps),
                  round(-sum(math.log2(x) for x in ps) / len(ps), 4))
    return out, (big, c_v, n1p_v, n1p_w, nb, d)


CORPUS = [(1, "a b a b c"), (2, "b a  a"), (3, "c c c"),
          (4, "   "), (5, "z q b a")]


def test_kn_golden_is_a_proper_distribution():
    # interpolated KN must normalize: for every history v, P(.|v)
    # sums to exactly 1 over the observed event vocabulary
    _, (big, c_v, n1p_v, n1p_w, nb, d) = _kn_golden(CORPUS, 3)
    events = list(n1p_w)
    for v in c_v:
        s = sum(max(big[(v, w)] - d, 0) / c_v[v]
                + d * n1p_v[v] / c_v[v] * (n1p_w[w] / nb)
                for w in events)
        assert s == pytest.approx(1.0, abs=1e-12)


def test_kn_bigram_scores_match_pure_python_golden(spark):
    from sparktiles.operators.text import kn_bigram_scores

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
           for r in kn_bigram_scores(df, vocab_size=3).collect()}
    want, _ = _kn_golden(CORPUS, 3)
    assert got == want
    assert 4 not in got          # whitespace-only doc drops out
    assert got[3][0] == 3        # n_tokens = token count, BOS free


def test_kn_bigram_full_vocab_has_no_unk(spark):
    # with the vocab cap above the type count, no token maps to UNK,
    # so a doc of one repeated token scores near-zero bits
    from sparktiles.operators.text import kn_bigram_scores

    df = spark.createDataFrame(
        [(1, "x x x x x x x x"), (2, "x y")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["bits_per_token"]
           for r in kn_bigram_scores(df, vocab_size=100).collect()}
    want, _ = _kn_golden([(1, "x x x x x x x x"), (2, "x y")], 100)
    assert out == {k: v[1] for k, v in want.items()}
    assert out[1] < out[2]       # stereotypical text scores fewer bits
