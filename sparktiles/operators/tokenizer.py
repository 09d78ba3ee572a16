"""BPE tokenizer train + apply — the missing half of the tokenizer
story (`operators/text.py bpe_pair_counts` is the distributed
count-and-rank primitive; this module closes the loop with the full
merge-table trainer and the encoder that applies it).

Design, and why each half runs where it runs (Sennrich et al. 2016;
the rank-greedy apply loop is the GPT-2/HF `bpe()` contract):

- TRAINING operates on the word-FREQUENCY table, not the corpus —
  exactly what SentencePiece/HF trainers do. The only distributed
  work is one scan -> groupBy(word) (map-side combined, key space =
  the vocabulary, Zipf-bounded) -> sort-limit to `max_words`. The
  merge loop itself runs driver-side over that bounded table: it is
  inherently sequential (merge i+1's counts depend on merge i's
  rewrite), so "distributing" it would serialize n_merges shuffles
  of a table that fits in one pandas frame. Tie rule matches
  bpe_pair_counts (count desc, then pair asc) so iteration 0 of the
  trainer reproduces that operator's argmax.

- ENCODING is per-word iterative (merge the lowest-rank adjacent
  pair until none applies) — genuinely not expressible in DataFrame
  built-ins, so it is the legitimate Arrow-batched mapInPandas case:
  the merge-rank dict ships once per task, each batch keeps a
  word -> tokens cache (Zipf makes the hit rate ~99% on real text),
  and no row-at-a-time Python UDF appears anywhere. The registered
  query is rows-only checked by the driver (greedy BPE has no SQL
  oracle); exact token-sequence parity is pinned by the pure-Python
  golden in tests/test_bpe_encode.py instead.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    """One left-to-right rewrite of every `pair` occurrence in syms."""
    a, b = pair
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_merges(word_counts: Iterable[tuple], n_merges: int) -> list:
    """Driver-side BPE merge-table trainer over (word, count) rows.

    Returns up to n_merges (left, right) pairs in merge order. Ties
    break (count desc, pair asc) — the bpe_pair_counts rule."""
    vocab: dict = {}
    for w, c in word_counts:
        if len(w) >= 2:
            t = tuple(w)
            vocab[t] = vocab.get(t, 0) + int(c)
    merges: list = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nv: dict = {}
        for syms, c in vocab.items():
            t = _merge_word(syms, best)
            nv[t] = nv.get(t, 0) + c
        vocab = nv
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Rank-greedy BPE apply (the GPT-2/HF bpe() loop): repeatedly
    merge ALL occurrences of the lowest-rank adjacent pair."""
    syms = tuple(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        syms = _merge_word(syms, best)
    return list(syms)


def bpe_encode(df: DataFrame, merges: list, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Apply a trained merge table: (doc_id, bpe_tokens array<string>,
    n_bpe_tokens). Arrow-batched mapInPandas with a per-batch
    word->tokens cache; the ranks dict is a task-closure broadcast."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    tcol, icol = text_col, id_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks_col = []
            for text in pdf[tcol]:
                toks: list = []
                for wd in (text or "").split(" "):
                    if not wd:
                        continue
                    got = cache.get(wd)
                    if got is None:
                        got = encode_word(wd, ranks)
                        cache[wd] = got
                    toks.extend(got)
                toks_col.append(toks)
            yield pd.DataFrame({
                "doc_id": pdf[icol],
                "bpe_tokens": toks_col,
                "n_bpe_tokens": [len(t) for t in toks_col],
            })

    from sparktiles.operators.spread import spread

    return spread(df.select(F.col(icol), F.col(tcol))).mapInPandas(
        run, "doc_id long, bpe_tokens array<string>, n_bpe_tokens long")


def bpe_tokenize_corpus(df: DataFrame, n_merges: int = 64,
                        max_words: int = 65536,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Self-contained train-then-apply: learn `n_merges` merges from
    the corpus's own top-`max_words` word-frequency table (one scan,
    bounded collect — the IVF-centroid pattern), then encode every
    document. Deterministic end to end."""
    wc = (df.select(F.explode(F.filter(
        F.split(F.col(text_col), " "),
        lambda t: F.length(t) >= 2)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words).collect())
    merges = bpe_train_merges([(r["w"], r["c"]) for r in wc], n_merges)
    return bpe_encode(df, merges, text_col=text_col, id_col=id_col)
