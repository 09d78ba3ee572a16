"""Large-scale training-data text operators.

Dedup family (each also exposed as an oracle-checked query in
sparktiles/queries.py):
- exact_dedup          hash-groupBy on content
- minhash_signatures / lsh_buckets / minhash_dedup
                       shingle -> minhash -> band -> bucket-join;
                       portable minhash = min of 8-hex slices of a
                       seeded md5 digest (4 lanes per digest) so any
                       engine reproduces the signatures
- simhash              64-bit simhash over token hashes (xxhash64
                       JVM-side; hamming-distance candidate pairs via
                       band buckets)
- ngram_jaccard_pairs  token-set Jaccard over blocked candidates

Analysis family:
- language_id          n-gram/stopword-profile heuristic (pure column
                       math; no model dependency)
- quality_scores       length/punctuation/stopword/token-length stats
- token_counts         whitespace + regex word tokenization counts
- fingerprint          winnowing-style min-hash of char shingles
- repetition_signals   Gopher-style dup/top n-gram fractions + gate
- duplicate_window_fractions
                       ExactSubstr-style cross-doc duplicate windows
- decontaminate        benchmark n-gram decontamination (broadcast)
- stratified_sample    deterministic per-stratum quota sampling
- canonical_url / dedup_url_canonical
                       URL normalization (scheme/www/fragment/
                       tracking params) + best-doc-per-URL dedup
- paragraph_dedup      CCNet-style cross-doc paragraph removal
- exactsubstr_cut      ExactSubstr duplicate-span REMOVAL (rebuilds
                       docs with duplicated windows cut out)
- pack_sequences       concat-and-chunk training-sequence packing via
                       a two-pass distributed prefix-sum
- domain_temperature_resample
                       count^alpha mixture flattening with
                       deterministic per-domain quota sampling

All operators are DataFrame->DataFrame, shuffle only on their group
keys, and keep heavy work in JVM built-ins (higher-order functions) —
no Python UDFs in any of them except none at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ dedup

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: md5 groupBy, min id wins (deterministic)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             k: int = 3) -> DataFrame:
    """Distinct k-token shingles per doc (higher-order fns, no UDF)."""
    return shingles_with_multiplicity(df, text_col, id_col, k).distinct()


def shingles_with_multiplicity(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """All k-token shingles per doc WITH multiplicity — no distinct, so
    no exchange: feeds aggregations (like minhash's min) for which
    dedup is a no-op and the distinct's shuffle would be pure waste."""
    from sparktiles.operators.spread import spread

    toks = F.split(F.col(text_col), " ")
    base = spread(
        df.select(F.col(id_col).alias("doc_id"), toks.alias("t")).where(
            F.size("t") >= k))

    def shingle(i):
        out = F.element_at(F.col("t"), i)
        for j in range(1, k):
            out = F.concat(out, F.lit(" "), F.element_at(F.col("t"), i + j))
        return out

    return base.select(
        "doc_id",
        F.explode(
            F.transform(F.sequence(F.lit(1), F.size("t") - (k - 1)), shingle)
        ).alias("s"),
    )


def minhash_signatures(df: DataFrame, n_hashes: int = 8, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Portable minhash via digest splitting: one md5 digest per FOUR
    hash lanes — digest_d(s) = md5(d || s), h_i(doc) = min over
    shingles of the i-th 8-hex (32-bit) slice of digest_{i//4}.

    Why slices, not one md5 per lane: the digest is the map-side cost
    (measured 8→2 md5 calls per shingle ≈ the whole signatures job at
    corpus scale, BENCH.md session 16), md5's 128 bits are independent
    lanes by construction (the standard one-permutation/digest-split
    minhash family), and 32 bits per lane keeps the min-collision
    probability negligible at per-doc shingle counts. Lexicographic
    min over lowercase-hex slices == numeric min of the 32-bit lane in
    BOTH Spark and DuckDB, so the oracle stays expressible as
    substr(md5(d || s), 1 + 8*lane, 8).

    The digests are computed in a PROJECTION before the groupBy (one
    md5 per digest per shingle, guaranteed — not left to the
    aggregate's subexpression elimination), then the slices fold
    through a codegen'd hash aggregate whose map-side partial combine
    collapses the exchange to one 8-slice row per doc per partition;
    min over the shingle MULTISET equals min over the distinct set,
    so there is still no distinct exchange. (A shuffle-free variant
    folding the mins row-locally with F.aggregate was µbenched and
    rejected: interpreted HOF + per-element struct allocation lost to
    whole-stage codegen both in absolute time and in 2v8 scaling,
    0.90 vs 0.93.)"""
    sh = shingles_with_multiplicity(df, text_col, id_col, k)
    n_digests = (n_hashes + 3) // 4
    digests = [F.md5(F.concat(F.lit(str(d)), F.col("s"))).alias(f"_d{d}")
               for d in range(n_digests)]
    lanes = sh.select("doc_id", *digests).select(
        "doc_id",
        *[F.substring(F.col(f"_d{i // 4}"), 1 + 8 * (i % 4), 8).alias(f"h{i}")
          for i in range(n_hashes)])
    return lanes.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)])


def band_rows(sigs: DataFrame, band_size: int = 2) -> DataFrame:
    """One (band, signature, doc_id) row per signature band — the
    shared banding step of lsh_buckets and the CC edge builder."""
    hcols = [c for c in sigs.columns if c.startswith("h")]
    bands = [hcols[i: i + band_size] for i in range(0, len(hcols), band_size)]
    out = None
    for bi, cols in enumerate(bands):
        b = sigs.select(
            F.lit(bi).alias("band"),
            F.concat(*[F.col(c) for c in cols]).alias("signature"),
            "doc_id",
        )
        out = b if out is None else out.unionByName(b)
    return out


def lsh_buckets(sigs: DataFrame, band_size: int = 2) -> DataFrame:
    """Band the signature columns; one output row per (band, signature)
    bucket; bucket_size > 1 -> near-dup candidates."""
    return band_rows(sigs, band_size).groupBy("band", "signature").agg(
        F.count("*").alias("bucket_size"),
        F.min("doc_id").alias("canonical_id"),
        F.collect_list("doc_id").alias("members"),
    )


def minhash_dedup(df: DataFrame, n_hashes: int = 8, band_size: int = 2,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_id -> canonical_id mapping: a doc maps to the smallest id it
    shares any LSH band bucket with (one sweep, no iteration)."""
    sigs = minhash_signatures(df, n_hashes, text_col, id_col)
    buckets = lsh_buckets(sigs, band_size)
    pairs = buckets.where(F.col("bucket_size") > 1).select(
        F.explode("members").alias("doc_id"), "canonical_id"
    )
    return pairs.groupBy("doc_id").agg(F.min("canonical_id").alias("canonical_id"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            portable: bool = False) -> DataFrame:
    """64-bit SimHash: per token occurrence, hash each token; each bit
    votes +1/-1; the sign of the per-bit vote sum forms the fingerprint.

    Token hash: xxhash64 by default (fastest JVM path); with
    portable=True, the low 60 bits of md5 (conv(hex,16,10)) — bitwise
    reproducible by any engine with md5, which is what makes the
    simhash_dedup query DuckDB-oracle-checkable (bits 60-63 then never
    set: their vote sums are -n_tokens).

    Scale shape: one row per token occurrence (no 64x bit explode), 64
    `sum` aggregates in a single groupBy(doc_id). Spark's hash aggregate
    combines map-side, so the shuffle carries one 64-long partial row
    per (doc, map task) regardless of document length.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    if portable:
        hash_col = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    else:
        hash_col = F.xxhash64("tok")
    h = toks.withColumn("h", hash_col)
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(64):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b if b < 63 else -(1 << 63))
                      .cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select("doc_id", fp.alias("simhash"))


def hamming_candidates(sims: DataFrame, n_bands: int = 4) -> DataFrame:
    """Multi-band blocking over the 64-bit simhash: split into `n_bands`
    disjoint bit-bands; any pair agreeing on at least one full band is a
    candidate (pigeonhole: every pair with hamming < n_bands is
    guaranteed to collide on some band). Union of per-band equality
    joins, deduped — the same band trick as minhash LSH, so no
    single-prefix recall hole and no all-pairs join."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    banded = sims.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"shiftright(simhash, {i * width}) & {mask}").alias("key"),
            )
            for i in range(n_bands)
        ])).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, block_cols: list[str],
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token-set Jaccard within candidate blocks (J = |A∩B|/|A∪B|)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), *block_cols,
        F.array_distinct(F.split(F.col(text_col), " ")).alias("ts"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    union = F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - inter
    return a.join(b, cond).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        (inter.cast("double") / union).alias("jaccard"),
    )


def ngram_jaccard_bucketed(
    df: DataFrame,
    bucket_width: int = 32,
    min_jaccard: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    len_col=None,
    extra_block_cols: list[str] = (),
) -> DataFrame:
    """Token-set Jaccard with LENGTH-BUCKET blocking: documents whose
    lengths land in the same or an ADJACENT bucket are candidates, so a
    near-dup pair that differs slightly in length is still found —
    exact-length equality blocking (the naive `n_chars = n_chars` block)
    only ever compares identical-length docs.

    Stays an equi-join (no non-equi/cartesian plan): the a-side explodes
    each doc to three keys {bkt-1, bkt, bkt+1} and joins b on its single
    bkt, so every |Δbkt| <= 1 pair matches exactly once. Work is O(n²)
    only within a bucket neighborhood; at 100 TB the bucket key shards
    the shuffle like any LSH band."""
    lc = F.col(len_col) if len_col else F.length(F.col(text_col))
    bkt = F.floor(lc / bucket_width).cast("long")
    toks = df.select(
        F.col(id_col).alias("doc_id"), *extra_block_cols,
        bkt.alias("bkt"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("ts"),
    )
    a = toks.select(
        "doc_id", *extra_block_cols,
        F.explode(F.array(F.col("bkt") - 1, F.col("bkt"),
                          F.col("bkt") + 1)).alias("bkta"),
        "ts",
    ).alias("a")
    b = toks.alias("b")
    cond = (F.col("a.bkta") == F.col("b.bkt")) & \
        (F.col("a.doc_id") < F.col("b.doc_id"))
    for c in extra_block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    union = F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - inter
    j = inter.cast("double") / union
    return a.join(b, cond).where(j >= min_jaccard).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        j.alias("jaccard"),
    )


# ------------------------------------------------------------------ analysis

_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "un"],
    "es": ["el", "la", "de", "que", "los", "es", "un"],
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language heuristic: score per language =
    fraction of tokens in that language's stopword list; argmax wins,
    'und' (undetermined) when all scores are 0."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    scores = []
    for lang, words in _PROFILES.items():
        wl = F.array(*[F.lit(w) for w in words])
        s = F.size(F.filter(toks, lambda x: F.array_contains(wl, x)))
        scores.append(F.struct(
            (s.cast("double") / F.size(toks)).alias("score"), F.lit(lang).alias("lang")
        ))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_score", F.round(best["score"], 4))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / avg-token-length —
    the standard web-text quality gates."""
    toks = F.split(F.col(text_col), " ")
    stop = F.array(*[F.lit(w) for w in _PROFILES["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^\.,;:!?]", ""))
    return (
        df.withColumn("n_chars_q", F.length(text_col))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("stopword_ratio", F.round(n_stop / F.size(toks), 4))
        .withColumn("punct_ratio", F.round(n_punct / F.length(text_col), 4))
        .withColumn(
            "avg_token_len", F.round(F.length(text_col) / F.size(toks), 4))
        .withColumn(
            "quality_ok",
            (F.col("n_tokens") >= 5) & (F.col("punct_ratio") < 0.2)
            & (F.col("avg_token_len").between(2.0, 20.0)),
        )
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex word tokens per row."""
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.col(text_col), " "))
    ).withColumn(
        "word_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]+"), F.lit(0))),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                window: int = 16, stride: int = 8) -> DataFrame:
    """Winnowing-style doc fingerprint: min md5 over strided char
    shingles (deterministic, engine-portable)."""
    idx = F.explode(F.sequence(F.lit(1), F.lit(1 + stride * 24), F.lit(stride)))
    e = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"),
        F.length(text_col).alias("_L"), idx.alias("i"),
    ).where(F.col("i") + window <= F.col("_L") + 1)
    return e.groupBy("doc_id").agg(
        F.min(F.md5(F.expr(f"substr(_t, i, {window})"))).alias("fingerprint")
    )


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       top2_threshold: float = 0.20,
                       dup3_threshold: float = 0.30) -> DataFrame:
    """Gopher-style per-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", appendix A1.1 repetition filters): for
    token n-grams, the fraction of all n-gram occurrences covered by
    the single most frequent n-gram (top_2gram_frac) and by n-grams
    that occur more than once (dup_2gram_frac / dup_3gram_frac), plus
    a boolean gate at the given thresholds.

    Scale path: the signals are INTRA-document, so no shuffle needs
    to exist at all — the first version's explode -> groupBy(doc,
    gram) -> groupBy(doc) moved every distinct gram across the wire
    twice, and the 2v8 scaling probe showed that exchange (not the
    hashing) as the leg's ceiling. This version is map-only: per row,
    hash the n-grams (xxhash64, 8-byte values, the collision trade
    every hashed dedup here accepts), array_sort the hashes, and read
    the signals off adjacent runs — duplicated-occurrence count is
    (adjacent-equal pairs) + (runs of length >= 2), the top count is
    the longest run (one O(n) aggregate() pass). All JVM higher-order
    functions, O(n log n) per doc, zero exchanges; 100k-token docs
    cost n log n, not n^2. Short docs keep zero fractions.

    Optimizer hardening: the sorted hash array is bound as a
    HIGHER-ORDER LAMBDA VARIABLE (`transform(array(sorted), s ->
    struct(<all signals>))[0]`), never as a plain projected column.
    A projected `_s` referenced inside the filter()/aggregate()
    lambdas looks harmless, but predicate pushdown substitutes the
    column's defining expression into EVERY reference when the gate
    (`where(~repetitive)`) crosses the projection — including the
    per-element lambda references — turning the per-doc cost into
    O(n) re-evaluations of the full tokenize+hash+sort chain (an
    80x measured slowdown in join/filter contexts, invisible in a
    bare noop sink because CollapseProject's multi-reference guard
    keeps the column materialized there). No rewrite rule inlines
    through a lambda binding, so this shape is safe in ANY context.
    """
    from sparktiles.operators.spread import spread

    toks = F.split(F.col(text_col), " ")
    base = spread(df.select(F.col(id_col).alias("doc_id"),
                            toks.alias("_ts")), min_bytes=1 << 17)

    def add_stats(frame: DataFrame, n: int, prefix: str) -> DataFrame:
        # element_at is 1-based; CASE guards keep every element_at
        # in-bounds under ANSI (sequence(1, 0) would count DOWN, and
        # i=2 must not touch s[0])
        parts = ", ".join(f"element_at(_ts, i + {j})" for j in range(n))
        hashes = (
            f"CASE WHEN size(_ts) < {n} THEN array()::array<bigint> "
            f"ELSE transform(sequence(1, size(_ts) - {n - 1}), "
            f"i -> xxhash64(concat_ws(' ', {parts}))) END")
        pairs = ("size(filter(sequence(2, size(s)), i -> "
                 "element_at(s, i) = element_at(s, i - 1)))")
        runs2 = ("size(filter(sequence(2, size(s)), i -> "
                 "element_at(s, i) = element_at(s, i - 1) AND "
                 "(CASE WHEN i = 2 THEN true "
                 "ELSE element_at(s, i - 1) != element_at(s, i - 2) END)))")
        top_run = (
            "aggregate(sequence(2, size(s)), "
            "struct(1 AS cur, 1 AS best), "
            "(st, i) -> CASE WHEN element_at(s, i) = element_at(s, i - 1)"
            " THEN struct(st.cur + 1 AS cur,"
            " greatest(st.best, st.cur + 1) AS best)"
            " ELSE struct(1 AS cur, st.best AS best) END, "
            "st -> st.best)")
        # the lambda yields the FINAL per-order outputs (count + both
        # fractions), so every downstream column touches the struct
        # exactly once — a pushed-down predicate costs one chain eval
        # per n-gram order, the same as the bare projection
        sig = F.expr(
            f"transform(array(array_sort({hashes})), s -> struct("
            f"size(s) AS ng, "
            f"CASE WHEN size(s) < 2 THEN 0.0D "
            f"ELSE CAST({pairs} + {runs2} AS DOUBLE) / size(s) END"
            f" AS dup_frac, "
            f"CASE WHEN size(s) = 0 THEN 0.0D WHEN size(s) = 1 THEN 1.0D "
            f"ELSE CAST({top_run} AS DOUBLE) / size(s) END"
            f" AS top_frac))[0]")
        frame = frame.withColumn(f"_sig_{prefix}", sig)
        return (
            frame
            .withColumn(f"n_{prefix}",
                        F.col(f"_sig_{prefix}.ng").cast("bigint"))
            .withColumn(f"_top_{prefix}", F.col(f"_sig_{prefix}.top_frac"))
            .withColumn(f"_dup_{prefix}", F.col(f"_sig_{prefix}.dup_frac"))
            .drop(f"_sig_{prefix}"))

    out = add_stats(add_stats(base, 2, "2grams"), 3, "3grams")
    top2 = F.round(F.coalesce("_top_2grams", F.lit(0.0)), 4)
    dup2 = F.round(F.coalesce("_dup_2grams", F.lit(0.0)), 4)
    dup3 = F.round(F.coalesce("_dup_3grams", F.lit(0.0)), 4)
    return out.select(
        "doc_id",
        F.coalesce("n_2grams", F.lit(0)).alias("n_2grams"),
        top2.alias("top_2gram_frac"),
        dup2.alias("dup_2gram_frac"),
        F.coalesce("n_3grams", F.lit(0)).alias("n_3grams"),
        dup3.alias("dup_3gram_frac"),
        ((top2 > top2_threshold) | (dup3 > dup3_threshold)
         ).alias("repetitive"),
    )


def _token_windows(df: DataFrame, text_col: str, id_col: str,
                   n: int) -> DataFrame:
    """All n-token sliding windows per doc (with multiplicity) as
    64-bit xxhash64 hashes: (doc_id, h). Shuffles never carry raw
    text — and the key is an 8-byte long, not a 32-char digest
    string: the hash values never reach operator OUTPUT (only
    equality on them matters), so the wire format is free to be the
    cheapest one. Measured on the 2v8 curation scaling legs, the
    md5-string version moved 4x the shuffle key bytes for identical
    results (absent 2^-64 collisions — the same risk every
    hash-partitioned dedup already accepts)."""
    from sparktiles.operators.spread import spread

    toks = F.split(F.col(text_col), " ")
    base = spread(df.select(F.col(id_col).alias("doc_id"), toks.alias("_ts")))
    parts = ", ".join(f"element_at(_ts, i + {j})" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(_ts) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(_ts) - {n - 1}), "
        f"i -> xxhash64(concat_ws(' ', {parts}))) END")
    return base.select("doc_id", F.explode(grams).alias("h"))


def duplicate_window_fractions(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id",
                               window: int = 10) -> DataFrame:
    """ExactSubstr-flavored cross-document duplicate-window analysis
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"): hash every `window`-token sliding window; a
    window is a cross-document duplicate when the same token sequence
    also occurs in some OTHER document. Per document, report the
    window count, how many of its window occurrences are duplicated
    elsewhere, and the fraction — the signal ExactSubstr uses to
    locate verbatim boilerplate spans for removal.

    Scale path: the paper's suffix array is a single-machine
    structure; the Spark-native equivalent is hashed windows — and
    the shape matters. "Occurs in some OTHER document" is
    min(doc_id) != max(doc_id) per gram hash, so the cross-doc dup
    set falls out of ONE map-side-combined groupBy(h) — the distinct
    (doc, h) pair stream never has to shuffle, and no 25M-row
    sort-merge join back on h exists (the first version did both;
    the 2v8 scaling probe caught it running SLOWER than the strictly
    bigger exactsubstr_cut). n_windows per doc is pure map-side
    arithmetic (size - window + 1). Only gram occurrences that hit
    the dup set — the signal itself — ever shuffle on doc_id; the
    dup-set join is broadcast when it fits and AQE falls back to a
    shuffled join when a 100 TB dup set doesn't. Window keys are
    8-byte xxhash64 longs (see _token_windows); docs shorter than
    `window` keep zero counts (left join back).
    """
    w = _token_windows(df, text_col, id_col, window)
    dup = (w.groupBy("h")
           .agg(F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"))
           .where(F.col("_lo") != F.col("_hi")).select("h"))
    dup_counts = (w.join(dup, "h")
                  .groupBy("doc_id").agg(F.count("*").alias("dup_windows")))
    n_win = F.greatest(
        F.size(F.split(F.col(text_col), " ")) - (window - 1), F.lit(0)
    ).cast("bigint")
    base = df.select(F.col(id_col).alias("doc_id"),
                     n_win.alias("n_windows"))
    return base.join(dup_counts, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
        F.round(
            F.when(F.col("n_windows") > 0,
                   F.coalesce(F.col("dup_windows"), F.lit(0))
                   .cast("double") / F.col("n_windows"))
            .otherwise(F.lit(0.0)), 4)
        .alias("dup_window_frac"),
    )


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 5) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Gopher A.2
    procedure): flag corpus documents sharing any n-token n-gram with
    a held-out benchmark set. Returns one row per corpus doc with the
    count of distinct shared n-grams and a contaminated flag.

    Scale path: both sides reduce to DISTINCT n-gram hashes before
    the join. The benchmark side (eval suites, a few MB) is tiny next
    to a 100 TB corpus — it is explicitly broadcast, so the corpus
    gram stream never shuffles for the join; the only wide exchange
    is the per-doc count aggregation, which Catalyst partially
    aggregates map-side.
    """
    cg = _token_windows(corpus, text_col, id_col, n).distinct()
    bg = (_token_windows(benchmark, text_col, id_col, n)
          .select("h").distinct())
    hits = (cg.join(F.broadcast(bg), "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_contaminated_grams")))
    base_ids = corpus.select(F.col(id_col).alias("doc_id"))
    return base_ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_contaminated_grams", F.lit(0))
        .alias("n_contaminated_grams"),
        (F.coalesce("n_contaminated_grams", F.lit(0)) > 0)
        .alias("contaminated"),
    )


def stratified_sample(df: DataFrame, strata_col: str, quota: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum quota sampling — the language/domain
    re-balancing step of a training-data pipeline: rank documents
    inside each stratum by md5 of their id (a stable uniform
    permutation any engine reproduces) and keep the first `quota`.

    Scale path: one shuffle on the stratum key; the rank is a
    per-partition sort. Strata counts are usually few (languages,
    domains) but can be huge per stratum — for exact quotas that sort
    is the contract; when an approximate quota is fine at 100 TB,
    skip the window entirely and keep rows whose md5(id) falls below
    quota / stratum_count (pure filter, no shuffle at all).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(strata_col))
        .withColumn("sample_rank",
                    F.row_number().over(w).cast("int"))
        .where(F.col("sample_rank") <= quota)
    )


# ------------------------------------------------------------------ PII

# Deliberately a portable-regex subset (no lookaround, ASCII classes):
# the same patterns run on Java regex (Spark), RE2 (DuckDB) and Python,
# so the scrub is engine-checkable. Order matters: emails first (their
# dotted hosts would otherwise be half-eaten by the IP pass), then IPs,
# then phones.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction (the C4/CCNet-style scrub step of a web-corpus
    pipeline): replace emails, IPv4 addresses and international-format
    phone numbers with typed placeholder tokens, and report the count
    of each per document.

    Scale path: pure column expressions (regexp_extract_all +
    regexp_replace), whole-stage-codegen'd JVM-side, zero shuffles —
    a map-only pass however wide the corpus. Counts come from the
    pre-replacement text so overlapping categories are counted on the
    original bytes.
    """
    from sparktiles.operators.spread import spread

    t = F.col(text_col)
    out = spread(df.select(F.col(id_col), F.col(text_col)),
                 min_bytes=1 << 17).select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        *[F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
          .cast("long").alias(f"n_{name}")
          for name, pat, _ in PII_PATTERNS],
    )
    scrubbed = F.col("_t")
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return out.select(
        "doc_id",
        scrubbed.alias("text"),
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
        (sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS) > 0)
        .alias("has_pii"),
    )


# ------------------------------------------------------------ boilerplate

def remove_boilerplate_lines(df: DataFrame, min_frac: float = 0.5,
                             min_docs: int = 2, text_col: str = "text",
                             id_col: str = "doc_id",
                             domain_col: str = "source") -> DataFrame:
    """Per-domain boilerplate-line removal (the C4/CCNet dedup-within-
    site step): a line is boilerplate when it appears in >= min_frac
    of the domain's documents (and at least min_docs of them) —
    navigation footers, cookie banners, legal blurbs. Returns each doc
    rebuilt without those lines plus (n_lines, n_removed).

    Scale path: lines shuffle as (domain, 8-byte xxhash64) pairs —
    never raw text; the per-(domain, line) distinct-doc count and the
    per-domain doc count are map-side-combined aggregates; the
    boilerplate set (tiny: lines crossing the frequency bar) is the
    join's build side. Rebuild keeps line order with a sort_array
    over (pos, line) structs — collect_list order is NOT stable in a
    distributed shuffle, the struct sort is.
    """
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(domain_col).alias("_dom"),
                     F.split(F.col(text_col), "\n").alias("_ls"))
    lines = base.select(
        "doc_id", "_dom",
        F.posexplode("_ls").alias("pos", "line"),
    ).withColumn("_h", F.xxhash64("line"))

    domain_docs = base.groupBy("_dom").agg(
        F.count("*").alias("_ndocs"))
    line_docs = lines.groupBy("_dom", "_h").agg(
        F.count_distinct("doc_id").alias("_cnt"))
    boiler = (
        line_docs.join(F.broadcast(domain_docs), "_dom")
        .where((F.col("_cnt") >= min_docs)
               & (F.col("_cnt").cast("double") / F.col("_ndocs") >= min_frac))
        .select("_dom", "_h")
    )
    kept = lines.join(F.broadcast(boiler), ["_dom", "_h"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
            "\n").alias("text"),
        F.count("*").alias("n_kept"),
    )
    # per-doc line counts come from the split array map-side — an
    # aggregate here would re-scan and re-explode the whole corpus
    totals = base.select(
        "doc_id", F.size("_ls").cast("long").alias("n_lines"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .alias("n_removed"),
        )
    )


# ------------------------------------------------------------- rarity

def token_rarity(df: DataFrame, max_cf: int = 2, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Rare-token fraction per document — the vocabulary-side quality
    signal (gibberish, OCR noise and boilerplate IDs are made of
    tokens the rest of the corpus never repeats): a token is rare
    when its corpus-wide occurrence count is <= max_cf.

    Scale shape: the corpus frequency table is Zipf-shaped, so the
    FREQUENT head (cf > max_cf) is small and broadcastable while the
    rare tail is enormous — therefore rare tokens are counted as
    occurrences that do NOT match the broadcast frequent set
    (left_anti), never by materializing the tail. Per-doc totals are
    map-side size(split); the one wide exchange is the cf groupBy,
    map-side combined."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    frequent = (
        toks.groupBy("tok").agg(F.count("*").alias("cf"))
        .where(F.col("cf") > max_cf)
        .select("tok")
    )
    rare_counts = (
        toks.join(F.broadcast(frequent), "tok", "left_anti")
        .groupBy("doc_id").agg(F.count("*").alias("n_rare"))
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: t != "")).cast("long").alias("n_tokens"))
    return totals.join(rare_counts, "doc_id", "left").select(
        "doc_id", "n_tokens",
        F.coalesce("n_rare", F.lit(0)).alias("n_rare"),
        (F.coalesce("n_rare", F.lit(0)).cast("double")
         / F.greatest("n_tokens", F.lit(1))).alias("rare_frac"),
    )


# --------------------------------------------------------------- urls

def canonical_url(url_col) -> "F.Column":
    """Canonical form of a web-crawl URL (the key for URL-level dedup
    of a Common-Crawl-style corpus, where the same page is fetched via
    http/https, with/without www, with tracking params, fragments and
    trailing slashes): lowercase, drop scheme + leading www., drop the
    #fragment, drop utm_* tracking params (keeping real params and
    their order), drop a trailing '/'. Pure column expressions — RE2-
    compatible patterns so any engine reproduces the key."""
    u = F.lower(url_col)
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www\\.", "")
    u = F.regexp_replace(u, "#.*$", "")
    path = F.regexp_replace(F.split(u, "\\?").getItem(0), "/$", "")
    # F.get is null-safe out-of-bounds (element_at throws under ANSI)
    qs = F.coalesce(F.get(F.split(u, "\\?"), 1), F.lit(""))
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"))
    return F.when(
        F.size(params) > 0,
        F.concat(path, F.lit("?"), F.array_join(params, "&"))
    ).otherwise(path)


def dedup_url_canonical(df: DataFrame, url_col: str = "url",
                        id_col: str = "doc_id",
                        quality_col: str = "n_chars") -> DataFrame:
    """URL-level dedup: keep the best document per canonical URL
    (highest quality_col, ties to the smallest id — deterministic).
    Returns (canon_url, doc_id, n_dupes). One shuffle on the canonical
    URL; refetches of hot pages are bounded per-key group sizes, not a
    skew risk at crawl scale (per-URL fetch counts are small)."""
    from pyspark.sql.window import Window

    keyed = df.select(
        canonical_url(F.col(url_col)).alias("canon_url"),
        F.col(id_col).alias("doc_id"),
        F.col(quality_col).alias("_q"))
    w = Window.partitionBy("canon_url").orderBy(
        F.col("_q").desc(), F.col("doc_id").asc())
    return (
        keyed
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dupes", F.count("*").over(
            Window.partitionBy("canon_url")).cast("bigint"))
        .where(F.col("_rn") == 1)
        .select("canon_url", "doc_id", "n_dupes")
    )


# --------------------------------------------------------- paragraphs

def paragraph_dedup(df: DataFrame, k_words: int = 16, max_docs: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style paragraph-level dedup: the corpus is chunked into
    k-word paragraphs; a paragraph appearing in more than max_docs
    DISTINCT documents is dropped from every document; each doc is
    rebuilt from its surviving paragraphs in order. Returns
    (doc_id, text, n_paras, n_removed).

    Scale shape: paragraph construction is MAP-SIDE (sequence +
    slice + array_join over the split array — no explode shuffle);
    the distinct-doc count shuffles 8-byte xxhash64 keys, never
    paragraph text; the common set (paragraphs over the bar) is tiny
    and broadcast for the anti-join; the rebuild is one groupBy with
    an order-stable sort_array over (idx, paragraph) structs."""
    from sparktiles.operators.spread import spread

    k = F.lit(k_words)
    base = spread(df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_w")))
    paras = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("_w") / k).cast("int") - 1),
                lambda i: F.array_join(
                    F.slice("_w", i * k + 1, k), " "))
        ).alias("idx", "para"),
    ).withColumn("_h", F.xxhash64("para"))
    common = (
        paras.groupBy("_h")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") > max_docs)
        .select("_h")
    )
    kept = paras.join(F.broadcast(common), "_h", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"]),
            " ").alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = base.select(
        "doc_id",
        F.ceil(F.size("_w") / k).cast("bigint").alias("n_paras"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        "n_paras",
        (F.col("n_paras") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint").alias("n_removed"),
    )


# ------------------------------------------------------------ LM score

def unigram_lm_scores(df: DataFrame, vocab_size: int = 1024,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """CCNet-style LM quality proxy without an external model: train a
    unigram LM on the corpus itself (one counting pass), score each
    document by bits/token = -mean(log2 p(tok)). The model keeps the
    top `vocab_size` types by corpus frequency (ties broken by token —
    deterministic); out-of-vocab tokens share the tail mass uniformly
    over tail types. Low bits/token ≈ stereotypical text, high ≈
    gibberish/rare-vocab — the perplexity-bucket signal CCNet uses for
    quality partitioning, self-contained.

    Scale shape: the type-frequency table is the only wide exchange
    (map-side combined), computed ONCE — the first version derived the
    vocab broadcast, the total/ntypes scalars and the vocab-mass
    scalars as three independent lazy subtrees, so one scoring run
    re-tokenized the corpus ~4x through serialized broadcast-build
    jobs (the ppl 2v8 stage decomposition measured that increment at
    0.45 scaling, BENCH_PPL_STAGEDECOMP.json). Now cf is persisted,
    the model (<= vocab_size rows) and its scalars are collected
    driver-side in two tiny jobs — the same bounded-aggregate-collect
    pattern as the IVF centroids — and the scoring pass references
    nothing but the token stream and a literal-backed broadcast:
    exactly two corpus scans total, no crossJoins, no repeated
    sort-limit.

    The scoring probe itself is bandwidth-shaped (the 2v8 phase
    ablation in BENCH.md measured it at ~0.3 in bus-starved windows),
    so the per-token work is kept minimal: log2 is factored OUT of the
    token stream onto the <= vocab_size model rows (computed by the
    SAME JVM log2 expression on the same doubles, so per-token values
    are bit-identical to the inline form), and the broadcast probe is
    keyed on xxhash64(tok) longs — Spark builds a primitive
    LongHashedRelation instead of a string-keyed UnsafeHashedRelation,
    and the exploded stream carries (long, long) rows with no string
    ever reaching the join. The hash never reaches operator output, so
    only equality matters (the dup-window idiom); a vocab/corpus-type
    collision needs ~1M types against 2^64 (p ~ 1e-13) and would be
    caught by the cross-engine oracle. Returns
    (doc_id, n_tokens, bits_per_token)."""
    spark = df.sparkSession
    # NOTE: deliberately NOT spread() — the heavy work here sits
    # behind the token groupBy exchange (already wide), and the A/B
    # at sf1.0 measured the extra round-robin exchange as a net loss
    # (1.69s -> 2.09s); see OPTIMIZATION_r06.md.
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    cf = toks.groupBy("tok").agg(F.count("*").alias("cf")).persist()
    try:
        vocab_rows = (cf.orderBy(F.col("cf").desc(), F.col("tok").asc())
                      .limit(vocab_size).collect())
        tot_row = cf.agg(F.sum("cf").alias("t"),
                         F.count("*").alias("n")).first()
    finally:
        cf.unpersist(blocking=False)
    total, ntypes = int(tot_row["t"] or 0), int(tot_row["n"])
    vmass = sum(int(r["cf"]) for r in vocab_rows)
    nvocab = len(vocab_rows)
    # identical arithmetic ORDER to the JVM expression it replaces:
    # ((t - v) as double) / t / (n - k) — IEEE-reproducible
    tail_p = (float(total - vmass) / total / (ntypes - nvocab)
              if ntypes > nvocab else 1.0)
    vocab_df = spark.createDataFrame(
        [(r["tok"], int(r["cf"])) for r in vocab_rows] or
        [("", 0)], "tok string, cf long").where(F.col("cf") > 0)
    # tail log2 through the same JVM expression as the model rows
    tail_lp = spark.range(1).select(
        F.log2(F.lit(tail_p)).alias("lp")).first()["lp"]
    model = vocab_df.select(
        F.xxhash64("tok").alias("_h"),
        F.log2(F.col("cf").cast("double")
               / F.lit(total).cast("long")).alias("_lp"))
    scored = (
        toks.select("doc_id", F.xxhash64("tok").alias("_h"))
        .join(F.broadcast(model), "_h", "left")
        .select("doc_id",
                F.coalesce(F.col("_lp"), F.lit(tail_lp)).alias("_lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(-F.avg("_lp"), 4).alias("bits_per_token"),
    )


# ------------------------------------------------------------------ BM25

def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BM25 document retrieval for a bag of query terms — the lexical
    side of the similarity-search family (ANN covers embeddings).
    Returns the top-k (doc_id, score) by the standard Robertson/
    Sparck-Jones formula with the +1 idf smoothing
    (idf = ln((N - df + 0.5)/(df + 0.5) + 1)).

    Scale shape: the query-term set is a broadcast literal filter, so
    ONLY matching token occurrences ever shuffle (tf groupBy, map-side
    combined — the corpus-wide token stream is filtered at the scan);
    df and N/avg-doclen are small aggregates over that filtered set
    and one map-side length projection; the final top-k is a
    distributed sort-limit. Ties break on doc_id (deterministic).
    Scores round to 4 dp for cross-engine parity."""
    terms = F.array(*[F.lit(t) for t in query_terms])
    lens = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: t != "")).cast("double").alias("dl"))
    corpus = lens.agg(F.count("*").cast("double").alias("_n"),
                      F.avg("dl").alias("_avgdl"))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.array_contains(terms, F.col("tok")))
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("double").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn("_idf", F.log(
            (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0))
        .withColumn("_s", F.col("_idf") * F.col("tf") * (k1 + 1.0)
                    / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                           / F.col("_avgdl"))))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def exactsubstr_cut(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 5) -> DataFrame:
    """ExactSubstr duplicate-SPAN REMOVAL — the cut step of Lee et al.
    2021 that `duplicate_window_fractions` only measures: any
    `window`-token sequence occurring more than once in the corpus
    (cross- OR intra-document, the paper's criterion) is a duplicated
    span; every token covered by at least one such span is removed and
    the document is rebuilt from the surviving tokens in order.

    Returns (doc_id, n_tokens, n_removed, kept_text) for every input
    doc — kept_text == original text when nothing was duplicated, and
    '' when the whole doc was covered.

    Scale path: the paper's suffix array is single-machine; the
    distributed equivalent is hashed sliding windows. One explode
    carries (doc, pos, xxhash64) — 8-byte keys, never raw text; the
    duplicate set is a map-side-combined groupBy(h) HAVING n > 1; the
    mark-back is an equi-join on h; per-doc covered-start lists are a
    collect_set groupBy (bounded by doc length). The rebuild is pure
    JVM higher-order functions: expand starts -> covered position set
    -> filter the token array by position. Nothing is O(corpus^2) and
    no Python runs per row.
    """
    from sparktiles.operators.spread import spread

    toks = F.split(F.col(text_col), " ")
    base = spread(df.select(F.col(id_col).alias("doc_id"), toks.alias("_ts")))
    parts = ", ".join(f"element_at(_ts, i + {j})" for j in range(window))
    grams = F.expr(
        f"CASE WHEN size(_ts) < {window} THEN "
        f"array()::array<struct<pos:int,h:bigint>> "
        f"ELSE transform(sequence(1, size(_ts) - {window - 1}), "
        f"i -> struct(i AS pos, "
        f"xxhash64(concat_ws(' ', {parts})) AS h)) END")
    # localCheckpoint: `w` feeds both the duplicate-hash aggregate and
    # the mark-back join; lazy, each replays the gram explode (r06 A/B
    # at sf1.0: 3.40 -> 2.83s with the checkpoint)
    w = (base.select("doc_id", F.explode(grams).alias("_g"))
         .select("doc_id", F.col("_g.pos").alias("pos"),
                 F.col("_g.h").alias("h"))
         .localCheckpoint())
    dup = (w.groupBy("h").agg(F.count("*").alias("n"))
           .where(F.col("n") > 1).select("h"))
    starts = (w.join(dup, "h")
              .groupBy("doc_id")
              .agg(F.sort_array(F.collect_set("pos")).alias("_starts")))
    # ts and cov are bound as higher-order lambda variables (see the
    # repetition_signals hardening note): a consumer predicate pushed
    # across this projection (e.g. `where(kept_text != '')` or the
    # funnel's min-length gate) then costs ONE evaluation of the
    # covered-set chain, never a per-element re-expansion of it
    # inside the position filter.
    out = F.expr(
        f"transform(array(_ts), ts -> transform(array("
        f"array_distinct(flatten(transform(_starts, "
        f"st -> sequence(st, st + {window - 1}))))), cov -> struct("
        f"size(ts) AS n_tokens, "
        f"size(cov) AS n_removed, "
        f"concat_ws(' ', transform(filter(sequence(1, size(ts)), "
        f"p -> NOT array_contains(cov, p)), "
        f"p -> element_at(ts, p))) AS kept_text))[0])[0]")
    rebuilt = (
        base.join(starts, "doc_id", "left")
        .withColumn("_starts", F.coalesce(
            "_starts", F.expr("array()::array<int>")))
        .withColumn("_out", out)
    )
    return rebuilt.select(
        "doc_id",
        F.col("_out.n_tokens").alias("n_tokens"),
        F.col("_out.n_removed").alias("n_removed"),
        F.col("_out.kept_text").alias("kept_text"),
    )


def pack_sequences(df: DataFrame, budget: int = 256, block: int = 64,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Training-sequence packing, concat-and-chunk style (the GPT /
    T5 "pack then split at a fixed token budget" preprocessing): lay
    all documents end-to-end in deterministic doc_id order and cut the
    token stream into fixed-`budget` chunks. Per doc, report its token
    count, global token offset, the first/last chunk it lands in, how
    many chunks it spans (boundary-crossing docs are the ones a packer
    must split or pad around), and its offset inside its first chunk.

    Scale path: a naive cumulative sum is `SUM OVER (ORDER BY ...)` —
    a single-partition window, the classic distributed-scan trap. This
    runs a THREE-level blocked scan: docs are range-blocked on
    `floor(doc_id / block)`, pass 1 computes per-block local prefix
    sums (windows partitioned BY BLOCK — parallel); pass 2 rolls block
    totals up per SUPER-block of 65536 blocks (windows partitioned by
    super-block — still parallel, <= 65536 rows each); only the
    super-block totals — N / (block * 65536) rows, e.g. 2.4e5 rows at
    a 10^12-doc corpus with the default block=64 — ever meet a global
    ordered window, and those land on one task as a bounded tiny
    table (the r05 two-level version put N/block rows — 1.6e10 at
    that corpus — through that single task, contradicting its own
    100 TB contract; r06 fix, outputs integer-identical since block
    boundaries never change the global prefix sum). Everything else
    is broadcast-joined back; the only full-width exchange is the
    block hash partition itself.
    """
    lens = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint")
        .alias("n_tokens"),
        F.expr(f"{id_col} div {block}").alias("_blk"),
    )
    from pyspark.sql import Window
    in_blk = (Window.partitionBy("_blk").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, -1))
    local = lens.withColumn(
        "_loc", F.coalesce(F.sum("n_tokens").over(in_blk), F.lit(0)))
    blk_tot = (lens.groupBy("_blk").agg(F.sum("n_tokens").alias("_tot"))
               .withColumn("_sb", F.expr("_blk div 65536")))
    in_sb = (Window.partitionBy("_sb").orderBy("_blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    blk_local = blk_tot.withColumn(
        "_locb", F.coalesce(F.sum("_tot").over(in_sb), F.lit(0)))
    sb_tot = blk_tot.groupBy("_sb").agg(F.sum("_tot").alias("_stot"))
    sb_w = (Window.orderBy("_sb")
            .rowsBetween(Window.unboundedPreceding, -1))
    sb_off = sb_tot.withColumn(
        "_soff", F.coalesce(F.sum("_stot").over(sb_w), F.lit(0))
    ).select("_sb", "_soff")
    blk_off = (blk_local.join(F.broadcast(sb_off), "_sb")
               .select("_blk",
                       (F.col("_soff") + F.col("_locb")).alias("_off")))
    packed = (
        local.join(F.broadcast(blk_off), "_blk")
        .withColumn("token_offset", F.col("_off") + F.col("_loc"))
        .withColumn("first_chunk", F.expr(f"token_offset div {budget}"))
        .withColumn("last_chunk", F.expr(
            f"(token_offset + n_tokens - 1) div {budget}"))
    )
    return packed.select(
        "doc_id", "n_tokens", "token_offset", "first_chunk", "last_chunk",
        (F.col("last_chunk") - F.col("first_chunk") + 1).alias("n_chunks"),
        (F.col("token_offset") % budget).alias("chunk_offset"),
        (F.col("last_chunk") > F.col("first_chunk"))
        .alias("crosses_boundary"),
    )


def inverted_index(df: DataFrame, max_df: int | None = None,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Materialized inverted index — one row per token with document
    frequency, collection frequency, and the posting list serialized
    as "doc:tf,doc:tf,..." in doc_id order (the string form keeps the
    artifact cross-engine comparable; a production sink would keep
    the struct array). `max_df` drops tokens appearing in more than
    that many documents — the stopword cut every IR system applies,
    and at corpus scale also the skew guard: a stopword's posting
    list is O(corpus) on one key, so it must be cut BEFORE the
    collect, not after.

    Scale path: tf = groupBy(token, doc) with map-side combine (the
    shuffle carries distinct (token, doc) pairs); df counts are a
    second map-side-combined groupBy over those rows; the over-limit
    token set is tiny by Zipf (only heads exceed max_df) and
    broadcasts as an anti-join filter on the tf stream before the
    posting-list aggregation, so no collected list can exceed max_df
    entries."""
    from sparktiles.operators.spread import spread

    toks = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy("token", "doc_id").agg(
        F.count("*").alias("tf"))
    if max_df is not None:
        heads = (tf.groupBy("token").agg(F.count("*").alias("_df"))
                 .where(F.col("_df") > max_df).select("token"))
        tf = tf.join(F.broadcast(heads), "token", "left_anti")
    return tf.groupBy("token").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda s: F.concat_ws(":", s["doc_id"], s["tf"])),
            ",").alias("postings"),
    )


def ngram_count_table(df: DataFrame, n: int = 2, min_count: int = 2,
                      text_col: str = "text") -> DataFrame:
    """KenLM-style n-gram count table: every n-token sequence in the
    corpus with its total occurrence count, thresholded at
    `min_count` (count pruning — the standard LM-training step that
    keeps the table finite). Returns (gram, cnt).

    Scale path: the grams are generated map-side per row (sequence +
    element_at, no intermediate explosion of join keys), then one
    map-side-combined groupBy(gram); the HAVING filter runs post-agg
    where it must (a pruned gram's count is unknowable earlier), but
    partial aggregation means the shuffle carries distinct grams per
    partition, not occurrences."""
    parts = ", ".join(f"element_at(_ts, i + {j})" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(_ts) < {n} THEN array()::array<string> "
        f"ELSE transform(sequence(1, size(_ts) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) END")
    from sparktiles.operators.spread import spread

    g = (spread(df.select(F.split(F.col(text_col), " ").alias("_ts")))
         .select(F.explode(grams).alias("gram")))
    return (g.groupBy("gram").agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") >= min_count))


def domain_temperature_resample(df: DataFrame, alpha: float = 0.5,
                                scale: float = 4.0,
                                domain_col: str = "source",
                                id_col: str = "doc_id") -> DataFrame:
    """Temperature-flattened domain resampling — the training-mixture
    step that stops a handful of giant domains from dominating the
    corpus (the count^alpha reweighting used by CCNet / multilingual
    LM mixtures): a domain with n docs keeps
    quota = min(n, floor(scale * n^alpha)) of them, so small domains
    survive intact while heavy domains are downsampled toward the
    temperature curve. WHICH docs survive is deterministic: rank
    within the domain by md5(doc_id) — a stable pseudo-random order
    any engine reproduces — and keep the first `quota`.

    Returns every input doc with its domain count, quota, rank, and a
    kept flag (callers filter on `kept`; emitting the flag keeps the
    row count stable for auditing).

    Scale shape: one map-side-combined count per domain (broadcast
    back — #domains rows), one rank window partitioned by domain. A
    single pathological domain is one window partition; real corpora
    cap per-domain rows far below a task's capacity, and the rank
    needs no global order. quota stays in exact double territory:
    n^0.5 is IEEE-correctly-rounded sqrt in every engine, so
    floor(scale * sqrt(n)) is reproducible cross-engine (no
    order-dependent double summation anywhere).
    """
    from pyspark.sql import Window
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_domain"))
    # alpha=0.5 goes through sqrt, not pow: sqrt is IEEE
    # correctly-rounded everywhere while pow(x, 0.5) is allowed 1 ulp
    # of slop on the JVM — enough to flip a floor() at a perfect
    # square (n=25 -> 4*sqrt=20.0 exactly).
    nd = F.col("n_domain").cast("double")
    curve = F.sqrt(nd) if alpha == 0.5 else F.pow(nd, F.lit(alpha))
    quota = counts.withColumn(
        "quota", F.least(F.col("n_domain"), F.floor(scale * curve)))
    rk = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(domain_col))
        .withColumn("sample_rank",
                    F.row_number().over(rk).cast("int"))
        .join(F.broadcast(quota), domain_col)
        .select("doc_id", F.col(domain_col).alias("domain"),
                "n_domain", "quota", "sample_rank",
                (F.col("sample_rank") <= F.col("quota")).alias("kept"))
    )


# ------------------------------------------- CCNet perplexity buckets

def perplexity_buckets(df: DataFrame, vocab_size: int = 1024,
                       n_buckets: int = 3, text_col: str = "text",
                       id_col: str = "doc_id",
                       lang_col: str = "lang") -> DataFrame:
    """CCNet's head/middle/tail perplexity partitioning (Wenzek et al.
    2020, the step after the LM scoring): score every document with
    the self-trained unigram LM (`unigram_lm_scores`), then split each
    language's documents into `n_buckets` equal-frequency bands by
    bits/token. Band 0 ('head') is the most-stereotypical slice CCNet
    keeps for LM pretraining; 'tail' is the gibberish end.

    Scale shape: scoring inherits unigram_lm_scores' shape (sort-limit
    vocab, broadcast model scalars, one groupBy(doc)). The banding
    needs an exact per-language rank, and both obvious spellings lose
    at scale (both were 2v8-measured): a window partitioned by lang
    caps the stage's parallelism at #languages (0.48 at 3M docs), and
    a repartitionByRange sort fixes the ratio but its boundary-
    sampling job RE-EXECUTES the whole LM upstream (2.1x absolute,
    0.59). So the rank is decomposed instead: bits/token is rounded
    to 4 dp, so the distinct (lang, score) table is bounded by value
    granularity — a few hundred thousand rows at ANY corpus size —
    and rank(doc) = [docs of this lang with a smaller score]
    (a cumulative window over that tiny table, broadcast back)
    + [tie rank by doc_id within the doc's own (lang, score) group]
    (a window whose partition count is the distinct table — wide
    parallelism). One corpus-wide hash exchange total, no range
    sampling, no #langs bottleneck; a pathological every-doc-same-
    score corpus degrades only the tie window to per-lang partitions.

    Returns (doc_id, lang, n_tokens, bits_per_token, ppl_bucket)."""
    from pyspark.sql.window import Window

    scored = unigram_lm_scores(df, vocab_size, text_col, id_col)
    langs = df.select(F.col(id_col).alias("doc_id"),
                      F.col(lang_col).alias("lang"))
    j = scored.join(langs, "doc_id")
    cnts = j.groupBy("lang", "bits_per_token").agg(
        F.count("*").alias("_c"))
    w_below = (Window.partitionBy("lang").orderBy("bits_per_token")
               .rowsBetween(Window.unboundedPreceding, -1))
    w_tot = Window.partitionBy("lang")
    off = cnts.select(
        "lang", "bits_per_token",
        F.coalesce(F.sum("_c").over(w_below), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_tot).alias("_n"))
    w_tie = Window.partitionBy("lang", "bits_per_token").orderBy(
        F.col("doc_id").asc())
    r = (j.join(F.broadcast(off), ["lang", "bits_per_token"])
         .withColumn("_rn", F.row_number().over(w_tie)))
    # floor(n_buckets * rank0 / count): NTILE-free equal-frequency
    # band index — integer-exact in both engines (no NTILE remainder
    # ambiguity to cross-check).
    pos = F.col("_off") + F.col("_rn") - F.lit(1)
    bi = F.floor((F.lit(n_buckets) * pos) / F.col("_n")).cast("int")
    label = (F.when(bi == 0, F.lit("head"))
             .when(bi == n_buckets - 1, F.lit("tail"))
             .otherwise(F.lit("middle")))
    return r.select("doc_id", "lang", "n_tokens", "bits_per_token",
                    label.alias("ppl_bucket"))


# -------------------------------------- MinHash candidate verification

def minhash_jaccard_verify(df: DataFrame, n_hashes: int = 8,
                           band_size: int = 2, threshold: float = 0.0,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """The verification stage of MinHash dedup (Broder 1997): LSH
    banding yields CANDIDATE pairs with false positives (two docs can
    collide on one band and differ everywhere else); the fraction of
    agreeing signature components is an unbiased Jaccard estimate, and
    pairs below `threshold` are dropped before any document is. Pairs
    are the star edges (bucket-canonical, member) — linear in bucket
    membership, never a bucket's O(k^2) pair explosion.

    Scale shape: the pair list is sparse (dup candidates only); the
    two signature lookups are equi-joins on doc id against the
    8-column signature table — shuffle width is candidates + 2
    signature projections, never the corpus text. Everything is JVM
    column math.

    Returns (doc_a, doc_b, est_jaccard), doc_a < doc_b, est rounded
    to 4 dp for cross-engine parity."""
    # localCheckpoint: THREE lazy references follow (the bucket build
    # and both signature-lookup sides of the pair join) — without it
    # each replays the shingle+md5 corpus scan (r06: the replays were
    # ~2/3 of the 10.1s BENCH_r05 leg at sf1.0)
    sigs = minhash_signatures(df, n_hashes, text_col, id_col).localCheckpoint()
    buckets = lsh_buckets(sigs, band_size)
    # canonical_id = min(members), so (canonical, member) is already
    # (smaller, larger) — ordered pairs come free of least/greatest.
    pairs = (
        buckets.where(F.col("bucket_size") > 1)
        .select(F.col("canonical_id").alias("doc_a"),
                F.explode("members").alias("doc_b"))
        .where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"h{i}").alias(f"_a{i}") for i in range(n_hashes)])
    b = sigs.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"h{i}").alias(f"_b{i}") for i in range(n_hashes)])
    agree = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("int")
        for i in range(n_hashes)
    )
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b",
                F.round(agree / F.lit(float(n_hashes)), 4)
                .alias("est_jaccard"))
        .where(F.col("est_jaccard") >= F.lit(threshold))
    )


# --------------------------------------------- winnowing fingerprints

def _winnow_kernel(k: int, window: int, with_pos: bool):
    """mapInArrow kernel for winnowing selection: per document, md5
    every char k-gram, slide a `window` over consecutive digests, and
    keep each window's minimum — ties on the digest broken by the
    RIGHTMOST position (the MOSS rule). Selection compares the raw
    16-byte digests as (hi, lo) big-endian uint64 pairs, which orders
    identically to the lowercase-hex string MIN the r05 SQL expression
    used (`md5hex || lpad(10^9 - pos)`), and the ascending candidate
    scan makes `<=` the rightmost-tie update — so the selected set is
    exactly the old one. with_pos=False deduplicates to the distinct
    digest set (what the overlap join consumes)."""
    import numpy as np

    def gen(batches):
        import hashlib

        import pyarrow as pa

        md5 = hashlib.md5
        for batch in batches:
            id_type = batch.column(0).type
            ids_py = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_ids, out_pos, out_fp = [], [], []
            for rid, s in zip(ids_py, texts):
                L = len(s) - k + 1
                if L < window:
                    continue
                digs = [md5(s[i:i + k].encode()).digest() for i in range(L)]
                arr = (np.frombuffer(b"".join(digs), dtype=">u8")
                       .reshape(L, 2).astype(np.uint64))
                hi, lo = arr[:, 0], arr[:, 1]
                nwin = L - window + 1
                best = np.arange(nwin)
                bh, bl = hi[:nwin].copy(), lo[:nwin].copy()
                for j in range(1, window):
                    ch, cl = hi[j:j + nwin], lo[j:j + nwin]
                    # later index wins digest ties -> <= on the low word
                    lt = (ch < bh) | ((ch == bh) & (cl <= bl))
                    best = np.where(lt, np.arange(j, j + nwin), best)
                    bh = np.where(lt, ch, bh)
                    bl = np.where(lt, cl, bl)
                sel = np.unique(best)
                if with_pos:
                    out_ids.extend([rid] * len(sel))
                    out_pos.extend(sel.tolist())
                    out_fp.extend(digs[i].hex() for i in sel)
                else:
                    fps = sorted({digs[i] for i in sel})
                    out_ids.extend([rid] * len(fps))
                    out_fp.extend(d.hex() for d in fps)
            cols = [pa.array(out_ids, type=id_type)]
            names = ["doc_id"]
            if with_pos:
                cols.append(pa.array(out_pos, type=pa.int32()))
                names.append("pos")
            cols.append(pa.array(out_fp, type=pa.string()))
            names.append("fp")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return gen


def winnowing_fingerprints(df: DataFrame, k: int = 8, window: int = 4,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """True winnowing (Schleimer/Wilkerson/Aiken 2003, the MOSS
    algorithm): hash every char k-gram, slide a window of `window`
    consecutive hashes, and in each window select the minimum hash —
    ties broken by the RIGHTMOST position, the property that makes
    the selected set a function of document content alone (guaranteed
    density 2/(window+1), every match of length >= window+k-1 shares
    a fingerprint). Upgrades the strided-min `fingerprint` sketch to
    the real fingerprint SET with positions, which is what plagiarism
    / overlap detection joins on.

    Scale shape: ZERO exchanges — the whole selection happens inside
    the scan task's mapInArrow kernel (_winnow_kernel). The r05
    revision built the same selection from JVM expressions — one
    md5-hex || lpad(10^9-pos) string per gram, then array_min over
    every window slice and array_distinct: ~4 string allocations plus
    window*42-byte comparisons per gram (43.6s at sf1.0, BENCH_r05).
    The kernel hashes each gram once, compares raw 16-byte digests as
    two uint64 lanes (identical order to the hex-string MIN), and
    runs the window scan vectorized — same output, no JVM string
    churn. Contract: `id_col` identifies the document (unique per
    row, as an id is) — per-doc (pos, fp) sets are exact-distinct.
    Returns (doc_id, pos, fp); pos is the 0-based k-gram start
    offset, fp the md5 hex of the k-gram."""
    from sparktiles.operators.spread import spread

    n = F.length(F.col(text_col)) - F.lit(k - 1)
    idt = df.schema[id_col].dataType.simpleString()
    src = spread(df.where(n >= window)
                 .select(F.col(id_col).alias("doc_id"), F.col(text_col)),
                 min_bytes=1 << 17)
    return src.mapInArrow(_winnow_kernel(k, window, True),
                          f"doc_id {idt}, pos int, fp string")


# ------------------------------------------ DSIR importance weights

def dsir_logweights(df: DataFrame, target_col: str = "lang",
                    target_value: str = "en", n_buckets: int = 256,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): featurize every
    document as hashed n-gram (uni+bi) bucket counts, fit two bag-of-
    buckets models — target p (docs matching the target predicate)
    and raw q (the whole corpus) with add-one smoothing — and score
    each document by log w = sum over its gram occurrences of
    ln p(bucket) - ln q(bucket). High log-weight docs look like the
    target distribution; resampling by w is the DSIR selection step
    (the deterministic top-fraction cut composes with
    domain_temperature_resample's md5-rank machinery).

    Engine parity: bucket = md5-low-60-bits % n_buckets (the repo's
    portable hash idiom); both LN terms are computed as the same
    quotient expression; the per-doc sum is rounded to 4 dp.

    Scale shape: gram rows are doc-local so the model groupBy is
    map-side-combined down to <= n_buckets rows per partition; the
    lambda table (n_buckets rows) broadcasts back; the per-doc sum is
    ONE corpus-wide exchange (groupBy doc with partial agg). The
    target/raw models are corpus aggregates, not samples — at 100 TB
    the bucket tables are still n_buckets rows. r06: the bucketed
    gram frame is localCheckpointed — it used to be a lazy subtree
    referenced three times (cr, ct, final rejoin), replaying the
    md5-gram scan 3x (27.8s at sf1.0, BENCH_r05) — and cr/ct are now
    ONE aggregation (count + count_if, integer-identical to the old
    count/count/left-join).

    Returns (doc_id, n_feats, log_weight)."""
    from sparktiles.operators.spread import spread

    t0 = spread(df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(target_col) == target_value).alias("_is_t"),
        F.filter(F.split(F.col(text_col), " "),
                 lambda t: t != "").alias("_ts")), min_bytes=1 << 17)
    grams = F.concat(
        F.col("_ts"),
        F.expr("CASE WHEN size(_ts) < 2 THEN array()::array<string> "
               "ELSE transform(sequence(1, size(_ts) - 1), "
               "i -> concat_ws(' ', _ts[i - 1], _ts[i])) END"))
    base = t0.select("doc_id", "_is_t", F.explode(grams).alias("g"))
    b = base.select(
        "doc_id", "_is_t",
        (F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
         % n_buckets).alias("b")).localCheckpoint()
    lam_rows = b.groupBy("b").agg(
        F.count("*").alias("cr"), F.count_if("_is_t").alias("ct"))
    tots = lam_rows.agg(F.sum("cr").alias("_tr"),
                        F.sum("ct").alias("_tt"))
    lam = (lam_rows.crossJoin(F.broadcast(tots)).select(
        "b",
        (F.log((F.col("ct") + F.lit(1.0))
               / (F.col("_tt") + F.lit(float(n_buckets))))
         - F.log((F.col("cr") + F.lit(1.0))
                 / (F.col("_tr") + F.lit(float(n_buckets)))))
        .alias("_lam")))
    return (b.join(F.broadcast(lam), "b")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_feats"),
                 F.round(F.sum("_lam"), 4).alias("log_weight")))


# ------------------------------------------------- BPE pair counting

def bpe_pair_counts(df: DataFrame, top_k: int = 20,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The counting step of BPE tokenizer training (Sennrich et al.
    2016): split the corpus into whitespace words, read each word as
    a symbol sequence (chars at iteration 0), and count adjacent
    symbol pairs across the corpus; the trainer's merge loop picks
    the top pair, rewrites, and recounts. This operator is that
    count-and-rank primitive — iterating it with a rewrite rule IS
    the trainer, and each iteration keeps this one's shape.

    Scale shape: pair extraction is map-side array math; the groupBy
    key space is the symbol-pair alphabet (bounded, tiny), so the
    hash aggregate is map-side-combined to near-nothing and the
    top-k is a sort-limit over a bounded table — no stage touches
    corpus-order data after the scan.

    Returns the top_k (left_sym, right_sym, cnt) by count desc, then
    pair asc for determinism."""
    from sparktiles.operators.spread import spread

    w = spread(df.select(F.col(text_col)), min_bytes=1 << 17).select(
        F.explode(F.filter(F.split(F.col(text_col), " "),
                           lambda t: F.length(t) >= 2)).alias("w"))
    pairs = w.select(
        F.posexplode(F.expr(
            "transform(sequence(1, length(w) - 1), "
            "i -> struct(substr(w, i, 1) AS l, "
            "substr(w, i + 1, 1) AS r))")).alias("_i", "p"))
    return (pairs.groupBy(F.col("p.l").alias("left_sym"),
                          F.col("p.r").alias("right_sym"))
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("left_sym").asc(),
                     F.col("right_sym").asc())
            .limit(top_k))


def winnowing_overlap_pairs(df: DataFrame, k: int = 8, window: int = 4,
                            min_shared: int = 2, max_df: int = 16,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """The MOSS overlap join winnowing exists for: document pairs
    sharing at least `min_shared` distinct selected fingerprints,
    i.e. pairs containing a common passage of length >= window+k-1
    per shared fingerprint. This is the cross-document plagiarism /
    near-identical-passage detector that complements MinHash (whole-
    document similarity) and ExactSubstr (span removal).

    Scale shape: the per-doc fingerprint SETS are built map-side in
    the _winnow_kernel mapInArrow (raw-digest winnowing selection +
    per-doc dedup — no global DISTINCT exchange, since doc ids are
    unique; the r05 JVM-expression variant of the same selection was
    the leg's whole cost, 43.6s of md5-hex string churn at sf1.0),
    then localCheckpointed: three lazy references follow (the hot-fp
    count, and both sides of the self-join), and without the
    checkpoint each would replay the full md5 scan — the same
    lazy-subtree trap kn_bigram_scores documents. Boilerplate
    fingerprints appearing in more than `max_df` documents are cut
    BEFORE the self-join (the same Zipf-head guard as
    inverted_index's max_df — the over-limit set is tiny and
    broadcasts as an anti-join), so the fp self-join's fan-out is
    bounded by max_df^2 per fingerprint — never a hot key. The pair
    aggregation is map-side-combined on (doc_a, doc_b).

    Returns (doc_a, doc_b, shared_fps), doc_a < doc_b."""
    from sparktiles.operators.spread import spread

    n = F.length(F.col(text_col)) - F.lit(k - 1)
    idt = df.schema[id_col].dataType.simpleString()
    fps = (spread(df.where(n >= window)
                  .select(F.col(id_col).alias("doc_id"), F.col(text_col)),
                  min_bytes=1 << 17)
           .mapInArrow(_winnow_kernel(k, window, False),
                       f"doc_id {idt}, fp string")
           .localCheckpoint())
    hot = (fps.groupBy("fp").agg(F.count("*").alias("_df"))
           .where(F.col("_df") > max_df).select("fp"))
    cold = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = cold.select(F.col("doc_id").alias("doc_a"), "fp")
    b = cold.select(F.col("doc_id").alias("doc_b"), "fp")
    return (a.join(b, "fp")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("shared_fps"))
            .where(F.col("shared_fps") >= min_shared))


def kn_bigram_scores(df: DataFrame, vocab_size: int = 1024,
                     discount: float = 0.75,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality scores — the honest
    distributed version of CCNet's KenLM perplexity filter (CCNet
    trains a smoothed n-gram model and buckets documents by ppl;
    `unigram_lm_scores` is the order-1 proxy, this is order 2 with
    the real KN smoothing math: Kneser/Ney 1995, Chen & Goodman 1999
    eq. 4.26, interpolated form, one fixed discount).

    Self-trained like the unigram op: the corpus is both the training
    and the scoring set, so every scored bigram was seen and all
    probabilities are well-defined without further backoff. Tokens
    outside the top `vocab_size` types (by corpus frequency, ties on
    token — deterministic) collapse to an UNK symbol first, exactly
    the fixed-vocab treatment KenLM applies, which also bounds the
    bigram model at (V+2)^2 rows worst case (far fewer in practice) —
    small enough to broadcast. Each document is scored as
    bits/token = -mean(log2 P(w|v)) over its tokens, with a
    begin-of-sentence sentinel conditioning the first token:

        P(w|v) = max(c(v,w) - d, 0)/c(v) + d*N1+(v,.)/c(v) * Pcont(w)
        Pcont(w) = N1+(.,w) / |distinct bigrams|

    Scale shape: exactly three corpus scans, all map-side until their
    one combined groupBy — (A) the type-frequency pass that picks the
    vocab (sort-limit, same as unigram_lm_scores), (B) the bigram
    count pass, (C) the scoring pass. Bigram pairs are built per row
    with zip_with over the filtered token array (no shuffle, no
    window-over-doc exchange); the UNK mapping is two broadcast
    left-joins against the <=vocab_size-row vocab, applied AFTER the
    explode so the per-element work stays codegen explode + hash
    probe rather than an interpreted per-token HOF membership test
    (the session-12b lesson: interpreted lambdas lose to codegen
    streams). The KN model (c_vw + history stats + continuation
    counts in one frame) is a broadcast; scoring is one probe + one
    map-side-combined groupBy(doc). No Python UDFs anywhere.

    Like the unigram probe, every join in the token stream is keyed
    on xxhash64 LONGS, not strings (LongHashedRelation probes; the
    stream after the raw explode carries only longs): tokens become
    hash ids with BOS/UNK as hashed sentinels, the bigram tables key
    on xxhash64(v_id, w_id), and the full KN probability — including
    its log2 — is precomputed per MODEL row by the identical JVM
    expression chain, so the per-token work in scan C is two string
    hashes, three long probes and one avg. Hash ids also key scan
    B's counts, so a 64-bit collision would merge two types on both
    sides consistently; at ~1M types p ~ 1e-13, and the cross-engine
    oracle (string-keyed DuckDB) would catch it.

    Sentinels are chr(2) (BOS) and chr(1) (UNK); corpus text is
    assumed control-character-free (the reference's extracted text
    is). Returns (doc_id, n_tokens, bits_per_token) rounded to 4 dp.
    """
    from sparktiles.operators.spread import spread

    bos, unk = "\x02", "\x01"
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    df = spread(df.select(F.col(id_col), F.col(text_col)))

    # -- scan A: vocab by corpus frequency (sort-limit, bounded rows;
    # localCheckpoint because FOUR lazy references follow — the two
    # broadcast probes in each of scans B and C would otherwise each
    # re-derive the sort-limit from a fresh corpus scan). Kept as
    # hash ids only: strings never leave scan A.
    toks = df.select(F.explode(arr).alias("tok"))
    vocab_df = (toks.groupBy("tok").agg(F.count("*").alias("cf"))
                .orderBy(F.col("cf").desc(), F.col("tok").asc())
                .limit(vocab_size)
                .select(F.xxhash64("tok").alias("_h"))
                .localCheckpoint())
    spark = df.sparkSession
    sent = spark.range(1).select(
        F.xxhash64(F.lit(bos)).alias("hb"),
        F.xxhash64(F.lit(unk)).alias("hu")).first()
    h_bos, h_unk = int(sent["hb"]), int(sent["hu"])

    def bigram_stream(frame):
        """(doc_id, v, w) hash-id pair per token — built map-side,
        UNK-mapped via two broadcast long probes. Each token of a doc
        is predicted once; the first is conditioned on BOS. The pair
        array stays strings through the (already-HOF) zip_with and is
        hashed AFTER the explode, in the codegen'd stream — not via a
        second interpreted per-element HOF (session-12b lesson)."""
        n = F.size(F.col("_a"))
        av = F.concat(F.array(F.lit(bos)), F.col("_a"))
        pairs = F.zip_with(
            F.slice(av, 1, n), F.slice(av, 2, n),
            lambda x, y: F.struct(x.alias("v_raw"), y.alias("w_raw")))
        big = (frame
               .select(F.col(id_col).alias("doc_id"), arr.alias("_a"))
               .where(F.size("_a") > 0)
               .select("doc_id", F.explode(pairs).alias("_p"))
               .select("doc_id",
                       F.xxhash64(F.col("_p.v_raw")).alias("hv"),
                       F.xxhash64(F.col("_p.w_raw")).alias("hw")))
        vv = vocab_df.select(F.col("_h").alias("hv"),
                             F.lit(True).alias("_inv"))
        vw = vocab_df.select(F.col("_h").alias("hw"),
                             F.lit(True).alias("_inw"))
        return (big
                .join(F.broadcast(vv), "hv", "left")
                .join(F.broadcast(vw), "hw", "left")
                .select(
                    "doc_id",
                    F.when(F.col("hv") == h_bos, F.lit(h_bos))
                    .when(F.col("_inv"), F.col("hv"))
                    .otherwise(F.lit(h_unk)).alias("v"),
                    F.when(F.col("_inw"), F.col("hw"))
                    .otherwise(F.lit(h_unk)).alias("w")))

    # -- scan B: the KN count tables (all derived from c_vw, which is
    # bounded by the capped vocab, then assembled into one broadcast)
    c_vw = (bigram_stream(df).groupBy("v", "w")
            .agg(F.count("*").alias("c_vw")).persist())
    try:
        hist = c_vw.groupBy("v").agg(
            F.sum("c_vw").alias("c_v"),
            F.count("*").alias("n1p_v"))
        cont = c_vw.groupBy("w").agg(F.count("*").alias("n1p_w"))
        # the model is BOUNDED (one row per distinct capped bigram);
        # localCheckpoint materializes it once so the scoring plan
        # references a leaf, not three lazy re-derivations of c_vw —
        # the exact re-scan bug the session-12 unigram fix removed
        model = (c_vw.join(hist, "v").join(cont, "w")
                 .select("v", "w", "c_vw", "c_v", "n1p_v", "n1p_w")
                 .localCheckpoint())
        n_bigrams = model.count()
    finally:
        c_vw.unpersist(blocking=False)
    d = float(discount)
    nb = float(n_bigrams) if n_bigrams else 1.0
    # -- scan C: probe + score. The full KN probability AND its log2
    # are precomputed per MODEL row with the exact arithmetic order
    # the SQL oracle uses (greatest-diff / c_v, then the lambda term)
    # — same JVM expressions on the same doubles, so per-token values
    # are bit-identical to the inline form; the token stream carries
    # one long key and fetches one double.
    scored_model = (
        model.select(
            F.xxhash64("v", "w").alias("_hm"),
            F.log2(
                F.greatest(F.col("c_vw").cast("double") - F.lit(d),
                           F.lit(0.0)) / F.col("c_v").cast("double")
                + F.lit(d) * F.col("n1p_v").cast("double")
                / F.col("c_v").cast("double")
                * (F.col("n1p_w").cast("double") / F.lit(nb))
            ).alias("_lp")))
    return (
        bigram_stream(df)
        .select("doc_id", F.xxhash64("v", "w").alias("_hm"))
        .join(F.broadcast(scored_model), "_hm")
        .groupBy("doc_id").agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.avg("_lp"), 4).alias("bits_per_token")))


# Mojibake repairs (UTF-8 bytes mis-decoded as cp1252 -- the ftfy
# core cases), applied FIRST so the punctuation fold sees real
# characters. \\u escapes throughout: several sequences contain C1
# codepoints that would be invisible (and strip-rule bait) as raw
# source bytes. Rule ORDER is part of the contract (applied in
# sequence, like ftfy).
_MOJIBAKE_PAIRS = [
    ("\u00e2\u20ac\u2122", "\u2019"),  # E2 80 99 -> right single quote
    ("\u00e2\u20ac\u02dc", "\u2018"),  # E2 80 98 -> left single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # E2 80 9C -> left double quote
    ("\u00e2\u20ac\u009d", "\u201d"),  # E2 80 9D -> right double quote
    ("\u00e2\u20ac\u201d", "\u2014"),  # E2 80 94 -> em dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # E2 80 A6 -> ellipsis
    ("\u00c3\u00a9", "\u00e9"),         # C3 A9 -> e acute
    ("\u00c3\u00a8", "\u00e8"),         # C3 A8 -> e grave
    ("\u00c3\u00bc", "\u00fc"),         # C3 BC -> u umlaut
    ("\u00c3\u00b1", "\u00f1"),         # C3 B1 -> n tilde
]
# 1:1 punctuation fold (translate): curly quotes -> straight, en/em
# dash -> hyphen, NBSP -> space
_PUNCT_FROM = "\u2019\u2018\u201c\u201d\u2013\u2014\u00a0"
_PUNCT_TO = "''\"\"-- "


def normalize_text(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """C4/ftfy-style deterministic text normalization — the cleanup
    stage web-crawl pipelines run before dedup/quality (C4 strips
    control characters and collapses whitespace; ftfy repairs
    UTF-8-as-cp1252 mojibake; quote/dash folding is the standard
    pre-tokenizer canonicalization). A fixed, ORDERED rule chain so
    two engines reproduce it byte-for-byte:

      1. mojibake repairs (literal replaces, table above)
      2. punctuation fold (1:1 translate)
      3. ellipsis char -> "..."
      4. strip C0 controls except tab/newline, plus DEL
      5. collapse space/tab runs -> one space, trim ends

    All JVM column ops (replace/translate/regexp_replace) — one
    map-side projection, no shuffle, no UDF, trivially pushdown-safe.
    Returns (doc_id, norm_text, changed)."""
    c = F.col(text_col)
    for bad, good in _MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(bad), F.lit(good))
    c = F.translate(c, _PUNCT_FROM, _PUNCT_TO)
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b-\\x1f\\x7f]", "")
    c = F.trim(F.regexp_replace(c, "[ \\t]+", " "))
    from sparktiles.operators.spread import spread

    return spread(df.select(F.col(id_col), F.col(text_col)),
                  min_bytes=1 << 17).select(
        F.col(id_col).alias("doc_id"),
        c.alias("norm_text"),
        (c != F.col(text_col)).alias("changed"),
    )


def url_domain(url_col) -> "F.Column":
    """Registrable-host extraction from a crawl URL (lowercased, no
    scheme/www/port/path) — the blocklist and per-domain-stats key.
    RE2-compatible pieces so any engine reproduces it."""
    u = F.lower(url_col)
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www\\.", "")
    host = F.split(u, "/").getItem(0)
    return F.split(host, ":").getItem(0)


def filter_blocked_domains(df: DataFrame, blocked: list[str],
                           url_col: str = "url") -> DataFrame:
    """UT1/blocklist-style domain filter — the first gate of a crawl
    curation pipeline (C4 and RefinedWeb both open with one): drop
    every doc whose URL host IS a blocked domain or is a SUBDOMAIN of
    one. Returns the surviving rows unchanged plus the extracted
    `domain` column.

    Scale shape: the blocklist is a broadcast; matching is one hash
    probe on the exact host plus a probe per dot-suffix of the host
    (hosts have ~2-4 labels, and the suffix set is built map-side
    with JVM array ops) — NOT a contains()/LIKE scan over the
    blocklist, which would be O(|blocklist|) per row and unusable at
    the UT1 list's millions of entries."""
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(d.lower(),) for d in blocked] or [("",)],
        "blocked_domain string").where(F.col("blocked_domain") != "")
    dom = url_domain(F.col(url_col))
    with_dom = df.withColumn("domain", dom)
    # every dot-suffix of the host that has >= 2 labels: a.b.c.d ->
    # [a.b.c.d, b.c.d, c.d]
    labels = F.split(F.col("domain"), "\\.")
    # guard: a single-label host (sequence(0, -1) would DESCEND in
    # Spark) probes only itself
    suffixes = F.when(
        F.size(labels) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(labels) - 2),
            lambda i: F.array_join(
                F.slice(labels, i + 1, F.size(labels) - i), "."))
    ).otherwise(F.array(F.col("domain")))
    probes = with_dom.select(
        F.col(url_col).alias("_u"),
        F.explode(suffixes).alias("blocked_domain"))
    hit = (probes.join(F.broadcast(bl), "blocked_domain")
           .select(F.col("_u").alias(url_col)).distinct())
    return with_dom.join(hit, url_col, "left_anti")


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus profile: doc/token/type counts, hapax fraction
    (Zipf tail mass — a data-quality smell when it collapses), and
    the coverage of the 10 most frequent types (a head-heaviness
    smell when it explodes). The table every curation run prints
    before and after its gates.

    Scale shape: one tokenize scan into the map-side-combined cf
    groupBy; everything else is aggregates of that bounded table plus
    one sort-limit for the top-10 mass. Fractions round to 4 dp for
    cross-engine parity."""
    toks = df.select(F.explode(
        F.filter(F.split(F.col(text_col), " "),
                 lambda t: t != "")).alias("tok"))
    cf = toks.groupBy("tok").agg(F.count("*").alias("cf"))
    n_docs = df.count()
    agg = cf.agg(
        F.sum("cf").alias("_ntok"),
        F.count("*").alias("_ntype"),
        F.sum(F.when(F.col("cf") == 1, 1).otherwise(0)).alias("_hapax"),
    )
    top10 = (cf.orderBy(F.col("cf").desc(), F.col("tok").asc()).limit(10)
             .agg(F.sum("cf").alias("_top10")))
    return (agg.crossJoin(top10).select(
        F.lit(n_docs).alias("n_docs"),
        F.col("_ntok").alias("n_tokens"),
        F.col("_ntype").alias("n_types"),
        F.round(F.col("_hapax").cast("double") / F.col("_ntype"), 4)
        .alias("hapax_frac"),
        F.round(F.col("_top10").cast("double") / F.col("_ntok"), 4)
        .alias("top10_coverage")))


def source_mix_report(df: DataFrame, group_col: str = "source",
                      text_col: str = "text",
                      lang_col: str = "lang") -> DataFrame:
    """Per-source mixture report: docs, tokens, mean chars, language
    count, dominant language (ties break lang-asc) and language
    entropy in bits — the table a data-mixture decision reads
    (domain_temperature_resample consumes exactly these counts).

    Scale shape: one map-side length/token projection into a
    (source) groupBy and a tiny (source, lang) groupBy; the dominant
    lang is a row_number window over the latter (bounded: sources x
    langs rows). Entropy rounds to 4 dp."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.length(text_col).alias("_nc"),
        F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda t: t != "")).alias("_nt"))
    per_src = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.round(F.avg(F.col("_nc").cast("double")), 2).alias("avg_chars"))
    sl = base.groupBy("source", "lang").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("source").orderBy(
        F.col("_n").desc(), F.col("lang").asc())
    top = (sl.withColumn("_rk", F.row_number().over(w))
           .where(F.col("_rk") == 1)
           .select("source", F.col("lang").alias("top_lang")))
    ent = (sl.withColumn(
        "_tot", F.sum("_n").over(Window.partitionBy("source")))
        .withColumn("_p", F.col("_n").cast("double") / F.col("_tot"))
        .groupBy("source").agg(
            F.count("*").alias("n_langs"),
            # + 0.0 folds IEEE -0.0 (single-lang source) to +0.0 so
            # both engines serialize the identical double
            F.round(-F.sum(F.col("_p") * F.log2("_p")) + F.lit(0.0), 4)
            .alias("lang_entropy_bits")))
    return (per_src.join(top, "source").join(ent, "source")
            .select("source", "n_docs", "n_tokens", "avg_chars",
                    "n_langs", "top_lang", "lang_entropy_bits"))
