"""BPE train + apply (operators/tokenizer.py).

Golden: an independent pure-Python BPE (different data structures —
per-word symbol lists, min-over-zip rank scan) plus the classic
Sennrich low/lower/newest hand case. Cross-op continuity: merge 0
must equal bpe_pair_counts' argmax on the same corpus.
"""

from collections import Counter


def _golden_train(word_counts, n_merges):
    words = [(list(w), int(c)) for w, c in word_counts if len(w) >= 2]
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in words:
            for pair in zip(syms, syms[1:]):
                pc[pair] += c
        if not pc:
            break
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(top)
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if (syms[i], syms[i + 1]) == top:
                    syms[i:i + 2] = [syms[i] + syms[i + 1]]
                else:
                    i += 1
    return merges


def _golden_encode(word, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        ranked = [(ranks.get(p, len(ranks) + 1), p)
                  for p in zip(syms, syms[1:])]
        r, pair = min(ranked)
        if r > len(ranks):
            break
        i = 0
        while i < len(syms) - 1:
            if (syms[i], syms[i + 1]) == pair:
                syms[i:i + 2] = [syms[i] + syms[i + 1]]
            else:
                i += 1
    return syms


CORPUS = [(1, "low low lower"), (2, "newest newest"), (3, ""),
          (4, "low a lowest")]


def test_trainer_matches_hand_case_and_golden():
    from sparktiles.operators.tokenizer import bpe_train_merges

    wc = Counter()
    for _, text in CORPUS:
        for w in text.split(" "):
            if w:
                wc[w] += 1
    merges = bpe_train_merges(wc.items(), 6)
    # hand: (l,o),(o,w),(w,e) all tie at highest count; pair-asc
    # picks (l,o); then (lo,w) beats (w,e) on the same rule
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    assert merges == _golden_train(wc.items(), 6)


def test_encode_word_matches_golden():
    from sparktiles.operators.tokenizer import bpe_train_merges, encode_word

    wc = Counter()
    for _, text in CORPUS:
        for w in text.split(" "):
            if w:
                wc[w] += 1
    merges = bpe_train_merges(wc.items(), 4)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ["low", "lower", "lowest", "newest", "a", "xyz", "wew"]:
        assert encode_word(w, ranks) == _golden_encode(w, merges), w


def test_bpe_tokenize_corpus_end_to_end(spark):
    from sparktiles.operators.text import bpe_pair_counts
    from sparktiles.operators.tokenizer import (bpe_train_merges,
                                                bpe_tokenize_corpus)

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bpe_tokenize_corpus(df, n_merges=4)
           .collect()}
    wc = Counter()
    for _, text in CORPUS:
        for w in text.split(" "):
            if w:
                wc[w] += 1
    merges = bpe_train_merges(wc.items(), 4)
    for i, text in CORPUS:
        want = []
        for w in text.split(" "):
            if w:
                want.extend(_golden_encode(w, merges))
        assert out[i]["bpe_tokens"] == want, i
        assert out[i]["n_bpe_tokens"] == len(want)
    assert out[3]["bpe_tokens"] == []          # empty doc keeps its row

    # continuity: merge 0 == the bpe_pair_counts argmax
    top = bpe_pair_counts(df, top_k=1).collect()[0]
    assert merges[0] == (top["left_sym"], top["right_sym"])
