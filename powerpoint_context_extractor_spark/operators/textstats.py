"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting, and skew-safe host aggregation.

Everything is built-in-function math (codegen'd, combiner-friendly) and
integer-exact so DuckDB oracles apply. Heuristics are deliberately
simple and *frozen* — correctness means matching the declared rule, not
linguistic truth (SURVEY.md §5: the generator/spec is the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .extract import _spread_small_input

P = 1_000_000_007

# marker-token sets per language (frozen; mirrored in oracle SQL)
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "los", "de", "que"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "que"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # BPE-ish: runs of letters/digits/punct


def _toks(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + char count."""
    return docs.select(
        F.col(id_col),
        F.size(_toks(text_col)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(f"({TOKEN_RE})"), 1))
        .cast("long").alias("re_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"))


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Marker-token count per language; argmax, ties by language name
    ascending (deterministic)."""
    toks = _toks(text_col)

    def marker_count(lang):
        markers = LANG_MARKERS[lang]
        # NB: single-arg lambda only — a second arg makes pyspark pass
        # the array index Column into it
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    scores = [marker_count(lang).alias(f"s_{lang}")
              for lang in sorted(LANG_MARKERS)]
    scored = docs.select(F.col(id_col), *scores)
    pairs = F.array(*[F.struct((-F.col(f"s_{lang}")).alias("neg"),
                               F.lit(lang).alias("lang"))
                      for lang in sorted(LANG_MARKERS)])
    return scored.select(
        id_col,
        F.array_min(pairs).getField("lang").alias("pred_lang"),
        (-F.array_min(pairs).getField("neg")).cast("long").alias("score"))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Integer quality features: token count, mean word length (x100,
    integer division), stopword ratio in basis points, and a frozen
    composite score."""
    toks = _toks(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("nc"),
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("long")
        .alias("stop"))
    # `div` = exact integer division, matches DuckDB `//`
    feat = base.select(
        id_col, "n_tokens",
        F.expr("((nc - (n_tokens - 1)) * 100) div n_tokens").alias("mean_wl_x100"),
        F.expr("(stop * 10000) div n_tokens").alias("stop_bp"))
    score = (F.least(F.col("n_tokens"), F.lit(100)) * 100
             + F.when((F.col("mean_wl_x100") >= 300)
                      & (F.col("mean_wl_x100") <= 800), 5000).otherwise(0)
             - F.col("stop_bp")).cast("long")
    return feat.select(id_col, "n_tokens", "mean_wl_x100", "stop_bp",
                       score.alias("quality"))


# Gopher quality-rule constants (Rae et al. 2021, MassiveText §A.1.1 —
# public method). Frozen: the DuckDB oracle mirrors every threshold.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL_X100 = 300      # mean word length in [3, 10]
GOPHER_MAX_MWL_X100 = 1000
GOPHER_MAX_SYMBOL_BP = 1000    # symbol-to-word ratio <= 0.1
GOPHER_MIN_ALPHA_BP = 8000     # >= 80% of words contain a letter
GOPHER_MIN_STOP_DISTINCT = 2   # >= 2 distinct stop words present


def quality_score_v2(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher rule set (r4 VERDICT #7, extending ``quality_score``):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    ('#' and '...' per word), alphabetic-word fraction, and
    distinct-stop-word presence — every feature an exact integer
    (ratios in basis points via integer division), so the whole rule
    set is DuckDB-oracle-checkable. ``gopher_pass`` is the conjunction
    the capstone pipeline gates on.

    Scale shape: per-row array/string math inside whole-stage codegen —
    ZERO shuffles, scan speed at 100 TB (same as repetition_stats).
    Line-level Gopher rules (bullet/ellipsis line fractions) are out of
    scope here: the documents corpus is single-line by construction."""
    toks = _toks(text_col)
    # '#' count + '...' occurrence count, all-integer (div is exact)
    n_sym = F.expr(
        f"(length({text_col}) - length(replace({text_col}, '#', '')))"
        f" + ((length({text_col}) - length(replace({text_col}, '...', '')))"
        f" div 3)")
    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_words"),
        F.length(F.col(text_col)).cast("long").alias("nc"),
        n_sym.cast("long").alias("n_sym"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
        .alias("n_alpha"),
        F.size(F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))).cast("long")
        .alias("n_stop_distinct"))
    feat = base.select(
        id_col, "n_words",
        F.expr("((nc - (n_words - 1)) * 100) div n_words")
        .alias("mean_wl_x100"),
        F.expr("(n_sym * 10000) div n_words").alias("symbol_bp"),
        F.expr("(n_alpha * 10000) div n_words").alias("alpha_bp"),
        "n_stop_distinct")
    gopher_pass = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_wl_x100") >= GOPHER_MIN_MWL_X100)
        & (F.col("mean_wl_x100") <= GOPHER_MAX_MWL_X100)
        & (F.col("symbol_bp") <= GOPHER_MAX_SYMBOL_BP)
        & (F.col("alpha_bp") >= GOPHER_MIN_ALPHA_BP)
        & (F.col("n_stop_distinct") >= GOPHER_MIN_STOP_DISTINCT)
    ).cast("long")
    return feat.select(id_col, "n_words", "mean_wl_x100", "symbol_bp",
                       "alpha_bp", "n_stop_distinct",
                       gopher_pass.alias("gopher_pass"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Rolling polynomial fingerprint over token hashes:
    fold(acc*31 + H(tok)) mod P — order-sensitive (unlike a bag-of-
    tokens hash), so near-identical docs with swapped words differ."""
    toks = _toks(text_col)
    h = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % P  # noqa: E731
    fp = F.aggregate(toks, F.lit(0).cast("long"),
                     lambda acc, t: (acc * 31 + h(t)) % P)
    return docs.select(F.col(id_col), fp.alias("fp"))


def token_chunks(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", window: int = 64,
                 stride: int = 48) -> DataFrame:
    """Sliding-window token chunking (r4) — the context-window prep
    every LLM training pipeline runs: chunk k covers whitespace tokens
    [k*stride, k*stride+window); overlapping when stride < window; a
    doc with <= window tokens yields exactly one chunk; the final
    chunk may be short but always starts inside the doc.

    Scale shape: chunks are a per-row pure function of the token array
    (same map-side transform/sequence/slice pattern as paragraph_dedup)
    — the only rows ever shuffled are whatever the CALLER aggregates;
    this operator itself is zero-shuffle scan-speed. Emits
    (id, chunk_id, n_tokens, chunk_md5)."""
    if stride <= 0 or window <= 0:
        raise ValueError("token_chunks: window and stride must be > 0")
    base = docs.select(F.col(id_col), _toks(text_col).alias("_toks"))
    n = F.size("_toks")
    chunks = F.expr(
        f"transform(sequence(0, (CASE WHEN size(_toks) <= {window} THEN 1 "
        f"ELSE 1 + ((size(_toks) - {window} + {stride} - 1) DIV {stride}) "
        f"END) - 1), "
        f"k -> array_join(slice(_toks, k*{stride}+1, {window}), ' '))")
    out = (base.filter(n > 0)
           .select(F.col(id_col),
                   F.posexplode(chunks).alias("chunk_id", "chunk")))
    return out.select(
        id_col, "chunk_id",
        F.size(F.split(F.col("chunk"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("chunk").cast("binary")).alias("chunk_md5"))


def split_sentences(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Regex sentence segmentation (r4): a sentence is a maximal run of
    non-terminator chars plus its trailing terminator run
    (``[^.!?]+[.!?]*``), trimmed, empties dropped — the frozen rule is
    deliberately RE2-compatible (no lookbehind) so the DuckDB oracle
    runs the IDENTICAL pattern. Per-row array math, zero shuffles.
    Emits (id, sent_id, n_chars, sent_md5)."""
    sents = F.expr(
        f"filter(transform(regexp_extract_all({text_col}, "
        f"'[^.!?]+[.!?]*', 0), s -> trim(s)), s -> s != '')")
    out = docs.select(
        F.col(id_col), F.posexplode(sents).alias("sent_id", "sentence"))
    return out.select(
        id_col, "sent_id",
        F.length("sentence").cast("long").alias("n_chars"),
        F.md5(F.col("sentence").cast("binary")).alias("sent_md5"))


def normalize_nfc(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization (r4): the canonicalization every LLM
    text pipeline runs before hashing/dedup — visually identical
    strings with decomposed combining marks ('e'+U+0301 vs 'é') hash
    differently and silently defeat exact dedup. Spark has no built-in
    normalizer, so this is an Arrow-batched mapInPandas over stdlib
    ``unicodedata`` (one Python crossing per batch, no per-row UDF);
    DuckDB's ``nfc_normalize`` is the independent oracle. Emits
    (id, text_nfc, changed)."""
    import unicodedata

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("text_nfc", T.StringType(), True),
        T.StructField("changed", T.LongType(), True),
    ])

    def _batches(batches):
        for pdf in batches:
            src = pdf[text_col].tolist()
            nfc = [unicodedata.normalize("NFC", t) if t is not None
                   else None for t in src]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "text_nfc": nfc,
                "changed": [None if t is None else int(t != o)
                            for t, o in zip(nfc, src)],
            })

    return _spread_small_input(docs.select(id_col, text_col),
                               key=id_col).mapInPandas(
        _batches, schema=schema)


def bigram_coherence(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Corpus-statistics coherence score (r5) — the integer-exact
    stand-in for CCNet's LM-perplexity quality signal (public method;
    floating log-probs are not cross-engine-exact, corpus frequencies
    are): a document whose token bigrams are frequent across the
    corpus reads like the corpus; gibberish and boilerplate-free spam
    score low. coherence_x100 = (sum of corpus-wide counts of the
    doc's bigrams * 100) div n_bigrams — average corpus support per
    bigram. Docs with < 2 tokens have no bigrams and are excluded
    (mirrored in the oracle).

    Scale shape: bigrams are assembled map-side (repetition_stats
    pattern); the corpus frequency is a combiner-friendly count keyed
    by the bigram string, rejoined via an AQE-skew-splittable hash
    join (a stop-bigram like 'of the' is a hot key by construction) —
    the same safe topology as substring dedup."""
    toks = _toks(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda k: F.concat_ws(" ", F.element_at(toks, k + 1),
                                          F.element_at(toks, k + 2)))
    ).otherwise(F.array().cast("array<string>"))
    bg = (docs.select(F.col(id_col), bigrams.alias("_bgs"))
          .filter(F.size("_bgs") > 0)
          .select(F.col(id_col), F.explode("_bgs").alias("bg")))
    freq = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("corpus_n"))
    return (bg.join(freq, "bg")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("corpus_n").alias("freq_sum"))
            .select(F.col(id_col),
                    F.col("n_bigrams").cast("long").alias("n_bigrams"),
                    F.col("freq_sum").cast("long").alias("freq_sum"),
                    F.expr("(freq_sum * 100) div n_bigrams")
                    .alias("coherence_x100")))


def bpe_pair_counts(docs: DataFrame, text_col: str = "text",
                    k: int = 20) -> DataFrame:
    """First BPE merge step (Sennrich et al. 2016 — public method):
    corpus-wide adjacent-CHARACTER-pair frequencies within words, top-k
    by (count desc, pair asc) — the vocabulary-induction statistic a
    tokenizer-training pipeline computes over the cleaned corpus.
    Deterministic tie-break makes the top-k exactly oracle-checkable.

    Scale shape: pairs are assembled map-side from each word; ONE
    combiner-friendly count shuffle keyed by the 2-char pair (at most
    ~64k distinct keys — the reduce side is trivially small however
    large the corpus), then a driver-bound top-k sort over those few
    thousand rows."""
    words = docs.select(F.explode(_toks(text_col)).alias("w"))
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(F.expr(
            "transform(sequence(1, length(w) - 1), "
            "i -> substring(w, i, 2))")).alias("pair"))
    return (pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(k))


def bpe_learn(docs: DataFrame, text_col: str = "text",
              n_merges: int = 8) -> DataFrame:
    """Iterative BPE vocabulary induction (r6, r5 VERDICT #5 — the
    actual merge LOOP, not just the first-pair statistic): run
    ``n_merges`` merges over the corpus, each picking the most frequent
    adjacent symbol pair (tie-break: count desc, pair asc) and merging
    it corpus-wide, and emit the ordered merge table
    (step, pair, merged, n) — the trained tokenizer vocabulary.

    MERGE RULE (documented, cross-engine-exact): a word is carried as
    a space-delimited symbol string '' h e l l o ''; applying merge
    (a,b) is TWO sequential plain-``replace`` passes of '' a b '' ->
    '' ab ''. Both engines' replace is non-overlapping left-to-right,
    so this is deterministic and identical in Spark and DuckDB; it
    equals greedy BPE merging except inside odd same-symbol runs of
    length >= 5, where the pairing order differs (documented
    deviation — determinism and oracle-exactness over char-perfect
    Sennrich emulation).

    Scale shape (the standard BPE-trainer layout): the corpus is
    scanned ONCE into a distinct (word, freq) table — vocabulary-sized,
    millions of rows at 100 TB, not corpus-sized — which is cached;
    each iteration is one combiner-friendly pair-count over that tiny
    table plus a driver-held top-1 row (kmeans-loop precedent), and
    merges apply map-side via replace. Nothing corpus-sized ever
    shuffles after the first aggregation."""
    from pyspark.sql import Row

    spark = docs.sparkSession
    wf = (docs.select(F.explode(_toks(text_col)).alias("w"))
          .filter(F.length("w") >= 1)
          .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    sym = wf.select(
        F.concat(F.lit(" "), F.concat_ws(" ", F.split(F.col("w"), "")),
                 F.lit(" ")).alias("s"),
        "freq").cache()
    merges = []
    cached = [sym]     # unpersist only at the end: dropping a parent
    try:               # before its child materializes replays lineage
        for step in range(1, n_merges + 1):
            a = F.split(F.trim(F.col("s")), " ")
            pairs = sym.select(
                F.explode(F.when(
                    F.size(a) >= 2,
                    F.transform(F.sequence(F.lit(1), F.size(a) - 1),
                                lambda i: F.concat_ws(
                                    " ", F.element_at(a, i),
                                    F.element_at(a, i + 1)))
                ).otherwise(F.array().cast("array<string>"))).alias("pair"),
                "freq")
            top = (pairs.groupBy("pair")
                   .agg(F.sum("freq").alias("n"))
                   .orderBy(F.col("n").desc(), F.col("pair").asc())
                   .first())
            if top is None:
                break
            pair, n = top["pair"], top["n"]
            merged = pair.replace(" ", "")
            merges.append(Row(step=step, pair=pair, merged=merged, n=n))
            pat, rep = F.lit(f" {pair} "), F.lit(f" {merged} ")
            sym = sym.select(
                F.replace(F.replace(F.col("s"), pat, rep), pat, rep)
                .alias("s"), "freq").cache()
            cached.append(sym)
    finally:
        for c in cached:
            c.unpersist()
    schema = ("step int, pair string, merged string, n long")
    return spark.createDataFrame(merges, schema)


def bpe_encode(docs: DataFrame, merges: list | None = None,
               id_col: str = "doc_id", text_col: str = "text",
               n_merges: int = 8) -> DataFrame:
    """Apply a learned BPE merge table to the corpus (r6 — the encode
    half of the tokenizer story; ``bpe_learn`` is the train half):
    per document, tokenize, expand each word to its symbol string,
    apply the ``merges`` pairs IN ORDER with the same double-anchored
    replace rule bpe_learn documents, and emit integer-exact token
    accounting: (id, ws_tokens, bpe_tokens, fertility_bp) where
    fertility_bp = bpe_tokens * 10000 div ws_tokens — the
    tokens-per-word statistic LLM-data pipelines budget context by.

    ``merges=None`` trains on ``docs`` itself (8 driver-held jobs over
    the vocabulary-sized word-frequency table, kmeans-loop precedent)
    then encodes. Explicit ``merges`` (list of 'a b' pair strings)
    skips training — the production shape: train once, encode many.

    Scale shape: encoding is MAP-ONLY, zero shuffle — the merge table
    is a driver-held constant folded into the plan (≤ n_merges string
    literals), each word's symbol string is rewritten in place via
    array ``transform``, and the per-doc sums are ``aggregate`` HOFs.
    No explode, no per-doc regroup, nothing corpus-sized moves."""
    if merges is None:
        merges = [r["pair"]
                  for r in bpe_learn(docs, text_col, n_merges).collect()]
    toks = F.filter(_toks(text_col), lambda w: F.length(w) >= 1)
    sym = F.transform(
        toks,
        lambda w: F.concat(F.lit(" "), F.concat_ws(" ", F.split(w, "")),
                           F.lit(" ")))
    def _apply(pat, rep):
        # closure factory, NOT default args: Spark derives HOF arity
        # from the Python signature, so `lambda s, pat=pat: ...` would
        # be treated as a 3-argument lambda
        return lambda s: F.replace(F.replace(s, pat, rep), pat, rep)

    for pair in merges:
        sym = F.transform(sym, _apply(F.lit(f" {pair} "),
                                      F.lit(f" {pair.replace(' ', '')} ")))
    bpe = F.aggregate(
        sym, F.lit(0).cast("long"),
        lambda acc, s: acc + F.size(F.split(F.trim(s), " ")))
    out = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("ws_tokens"),
        bpe.alias("bpe_tokens"))
    return out.withColumn(
        "fertility_bp",
        F.expr("CASE WHEN ws_tokens > 0 "
               "THEN bpe_tokens * 10000 div ws_tokens END").cast("long"))


def compression_ratio(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", level: int = 6) -> DataFrame:
    """zlib compression-ratio quality signal (r5, r4 VERDICT missing
    #4 — a standard Gopher-adjacent heuristic): highly compressible
    text is repetitive boilerplate/template spam, near-incompressible
    'text' is binary junk or encrypted garbage; pipelines keep a band.
    ratio_bp = compressed_len * 10000 // utf8_len (integer-exact and
    deterministic: zlib output at a fixed level is a pure function of
    the input bytes — pinned by a dual-run pytest; DuckDB has no zlib,
    so the driver check is rows-only by design).

    Scale shape: Arrow-batched mapInPandas over stdlib zlib (one
    Python crossing per batch, no per-row UDF), map-only — zero
    shuffles, scan speed at 100 TB. Emits (id, raw_len, zlib_len,
    ratio_bp)."""
    import zlib

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("raw_len", T.LongType()),
        T.StructField("zlib_len", T.LongType()),
        T.StructField("ratio_bp", T.LongType()),
    ])

    def _batches(batches):
        for pdf in batches:
            ids, raws, zs, bps = [], [], [], []
            for did, t in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                b = (t or "").encode("utf-8")
                z = len(zlib.compress(b, level))
                ids.append(did)
                raws.append(len(b))
                zs.append(z)
                bps.append(z * 10000 // len(b) if b else None)
            yield pd.DataFrame({id_col: ids, "raw_len": raws,
                                "zlib_len": zs, "ratio_bp": bps})

    return _spread_small_input(docs.select(id_col, text_col),
                               key=id_col).mapInPandas(
        _batches, schema=schema)


def detect_heavy_hitters(df: DataFrame, key_col: str,
                         fraction_threshold: float = 0.1,
                         sample_fraction: float | None = None) -> list:
    """Heavy-hitter keys holding > ``fraction_threshold`` of rows —
    the salting trigger (U5). At scale, pass ``sample_fraction`` so the
    detector reads a cheap sample instead of the full table; candidates
    only (sampling can over/under-shoot slightly, fine for a heuristic
    whose only effect is extra salt)."""
    src = df.select(key_col)
    if sample_fraction:
        src = src.sample(fraction=sample_fraction, seed=42)
    total = src.count()
    if total == 0:
        return []
    hits = (src.groupBy(key_col).count()
            .filter(F.col("count") > total * fraction_threshold)
            .orderBy(F.col("count").desc(), F.col(key_col)))
    return [r[key_col] for r in hits.collect()]


def host_stats_salted(events: DataFrame, key_col: str = "event_type",
                      n_salts: int = 8) -> DataFrame:
    """Skew-safe two-stage aggregation (U5): partial agg on
    (key, salt) spreads a hot key over ``n_salts`` reducers, final agg
    merges partials. Result is identical to a plain groupBy — that
    identity IS the oracle."""
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                        F.lit(n_salts)))
    partial = (salted.groupBy(key_col, "_salt")
               .agg(F.count(F.lit(1)).alias("pc"),
                    F.sum(F.round(F.col("value") * 100).cast("long")).alias("ps")))
    return (partial.groupBy(key_col)
            .agg(F.sum("pc").alias("n"),
                 F.sum("ps").alias("value_cents")))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     dup_threshold_pct: int = 10) -> DataFrame:
    """Gopher-style within-document repetition filter: the fraction of
    duplicate token bigrams flags template/spam pages (MassiveText's
    'repetition' quality rules, Rae et al. 2021 — public method).

    Everything is per-row array math inside whole-stage codegen
    (sequence/transform/array_distinct): ZERO shuffles, so at 100 TB
    this runs at scan speed. Integer-exact flag: flagged=1 iff
    100*dup_bigrams > threshold_pct*n_bigrams (no float division)."""
    toks = _toks(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda k: F.concat_ws(" ", F.element_at(toks, k + 1),
                                          F.element_at(toks, k + 2)))
    ).otherwise(F.array().cast("array<string>"))
    d = docs.select(F.col(id_col), bigrams.alias("bg"))
    n_all = F.size(F.col("bg")).cast("long")
    n_dist = F.size(F.array_distinct(F.col("bg"))).cast("long")
    return (d.select(F.col(id_col),
                     n_all.alias("n_bigrams"),
                     n_dist.alias("n_distinct"),
                     (n_all - n_dist).alias("dup_bigrams"))
            .withColumn("flagged",
                        (100 * F.col("dup_bigrams")
                         > dup_threshold_pct * F.col("n_bigrams"))
                        .cast("long")))


def hash_classifier_score(docs: DataFrame, buckets: int = 4096,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Linear text-classifier INFERENCE with the hashing trick (the
    fastText / Vowpal-Wabbit architecture, public method): each token
    hashes into one of ``buckets`` weight slots and the doc score is
    the plain sum of its tokens' weights — no vocabulary, no
    embedding matrix, O(tokens) per doc. The weight table here is
    FROZEN pseudo-weights (w[b] = ((b * 2654435761) % 1997) - 998, a
    Knuth-hash spread over [-998, 998]) because the contract under
    test is the inference PLAN, which is exactly what a trained
    model would run: swap the weight expression for a broadcast
    lookup of real weights and nothing else changes.

    Scale shape: pure map-side HOF math over the token array —
    transform + aggregate inside whole-stage codegen, zero shuffle,
    zero Python. Emits (id, n_toks, score, label)."""
    from .dedup import tokens_col
    toks = tokens_col(text_col)
    score = F.expr(
        "aggregate(transform(split({t}, ' '), x -> "
        "((cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)"
        " % {p}) % {b})"
        " * 2654435761 % 1997 - 998), "
        "cast(0 as bigint), (acc, v) -> acc + v)".format(
            t=text_col, p=P, b=int(buckets)))
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_toks"),
        score.cast("long").alias("score"),
        (score > 0).cast("long").alias("label"))


def tfidf_topk(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document salient-term extraction (TF-IDF top-k) — the
    keyword signal corpus curation and retrieval labeling both lean
    on. IDF uses the integer surrogate ``n_docs div df`` (monotone in
    the real idf, cross-engine exact — no float log drift), score =
    tf * idf, rank ties broken lexicographically.

    Scale shape: two combiner-friendly shuffles (per-(doc, token) tf,
    then token df over the already-collapsed tf table) + one join on
    token (AQE-splittable if a stopword-like token is hot); the
    corpus row count rides in as a broadcast 1-row aggregate, never a
    driver collect; the top-k window partitions by doc_id — per-doc
    state only, no global window. Emits
    (doc_id, term, tf, df, score, rank)."""
    if k < 1:
        raise ValueError("tfidf_topk: k must be >= 1")
    toks = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
        .filter(F.length("term") >= 3))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(df_t, "term")
              .join(F.broadcast(n))
              .withColumn("score",
                          F.expr("tf * (n_docs DIV df)").cast("long")))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                             F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", F.col("tf").cast("long"),
                    F.col("df").cast("long"), "score",
                    F.col("rank").cast("long")))


# Frozen confusable subset (Unicode TR39 skeleton idea, public method):
# Cyrillic lowercase/uppercase and Greek lookalikes -> ASCII. A frozen
# SUBSET like the PSL list in urltools.py — swapping in the full
# confusables.txt is a data change, not a code change.
CONFUSABLE_SRC = ("аеорсухі"
                  "ѕ"
                  "АВЕКМНОР"
                  "СТХ"
                  "ορυχΟ")
CONFUSABLE_DST = "aeopcyxisABEKMHOPCTXopuxO"
assert len(CONFUSABLE_SRC) == len(CONFUSABLE_DST)


def confusable_skeleton(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Homoglyph-spoof detection (the IDN/phishing signal a web corpus
    screens for): map the frozen confusable set to ASCII with one
    ``translate`` (single codegen expression, zero shuffle), count
    replaced chars via the delete-form of translate, and emit the
    skeleton's md5 so two visually-identical-but-differently-encoded
    texts collide. (id, n_confusables, flagged, skeleton_md5)."""
    t = F.col(text_col)
    n_conf = (F.length(t)
              - F.length(F.translate(t, CONFUSABLE_SRC, "")))
    return docs.select(
        F.col(id_col),
        n_conf.cast("long").alias("n_confusables"),
        (n_conf > 0).cast("long").alias("flagged"),
        F.md5(F.translate(t, CONFUSABLE_SRC, CONFUSABLE_DST))
        .alias("skeleton_md5"))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              q_id_col: str = "query_id", q_text_col: str = "q_text",
              buckets: int = 32) -> DataFrame:
    """BM25 retrieval over inverted postings (r7) — the lexical
    ranking every retrieval/dedup-against-index pipeline starts from
    (Robertson/Sparck-Jones, public method), in the integer-exact
    rank-equivalent form this repo's oracles demand:

      k1 = 6/5, b = 3/4 (the standard 1.2/0.75), avgdl = T/N kept as
      the exact rational (T = corpus token count, N = docs), idf =
      the monotone integer surrogate (N*1000) div df (same device as
      :func:`tfidf_topk` — no float log drift), so with everything
      multiplied through by 10*T the per-term score is

        score = idf * (22*T*tf) div (10*T*tf + 3*T + 9*dl*N)

      summed over the query's distinct matching terms; top-k docs per
      query by (score desc, doc_id).

    Scale shape: postings = two combiner-friendly aggregations (tf,
    then df over the collapsed tf table); doc lengths ride the same
    tf table (sum per doc); the query side — eval queries are tiny —
    reduces to distinct (query, term) and BROADCASTS onto the
    postings, so the corpus-sized side never shuffles for the match;
    per-(query, doc) partial scores combine map-side; the final
    top-k is TWO-LEVEL (bucket by doc id, k per bucket, then k per
    query) because a web-scale query matches billions of docs — a
    single partitionBy(query) window would funnel them into one
    task. Emits (query_id, doc_id, score, rank)."""
    if k < 1:
        raise ValueError("bm25_topk: k must be >= 1")
    toks = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
        .filter(F.length("term") >= 3))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = docs.select(F.count(F.lit(1)).alias("n_docs"))
    tsum = tf.agg(F.sum("tf").alias("t_tokens"))
    qterms = (queries.select(
        F.col(q_id_col).alias("query_id"),
        F.explode(F.split(F.lower(F.col(q_text_col)), " "))
        .alias("term"))
        .filter(F.length("term") >= 3).distinct())
    scored = (tf.join(F.broadcast(qterms), "term")
              .join(df_t, "term")
              .join(dl, "doc_id")
              .join(F.broadcast(tot))
              .join(F.broadcast(tsum))
              .withColumn("_s", F.expr(
                  "((n_docs * 1000) div df) * (22 * t_tokens * tf) div "
                  "(10 * t_tokens * tf + 3 * t_tokens "
                  "+ 9 * dl * n_docs)")))
    per_doc = (scored.groupBy("query_id", "doc_id")
               .agg(F.sum("_s").alias("score")))
    w1 = Window.partitionBy(
        "query_id", F.col("doc_id") % buckets).orderBy(
        F.col("score").desc(), "doc_id")
    stage1 = (per_doc.withColumn("_r1", F.row_number().over(w1))
              .filter(F.col("_r1") <= k))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "doc_id")
    return (stage1.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id",
                    F.col("score").cast("long").alias("score"),
                    F.col("rank").cast("long").alias("rank")))


# PII patterns (frozen for the oracle; deliberately inside the
# RE2 ∩ Java-regex dialect subset — no backreferences, no lookaround)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")
PII_PHONE = r"\+[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{4,7}"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """PII redaction (r7) — the scrub pass every released training
    corpus runs (public method; e.g. the C4/ROOTS-style regex
    filters): emails, international-format phone numbers, and IPv4
    addresses are counted and replaced with fixed tags
    (``<EMAIL>``/``<PHONE>``/``<IP>``). Counts + the md5 of the
    scrubbed text ride under the oracle; patterns live in the
    RE2 ∩ Java dialect subset so Spark and DuckDB agree char for
    char. Order matters and is FROZEN: emails first (an email must
    not first lose its digits to the phone pattern), then phones,
    then IPs. Map-only, zero shuffle, built-ins end to end."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0))
    scrub1 = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_phone = F.size(F.regexp_extract_all(scrub1, F.lit(PII_PHONE), 0))
    scrub2 = F.regexp_replace(scrub1, PII_PHONE, "<PHONE>")
    n_ip = F.size(F.regexp_extract_all(scrub2, F.lit(PII_IPV4), 0))
    scrub3 = F.regexp_replace(scrub2, PII_IPV4, "<IP>")
    return docs.select(
        F.col(id_col),
        n_email.cast("long").alias("n_email"),
        n_phone.cast("long").alias("n_phone"),
        n_ip.cast("long").alias("n_ip"),
        ((n_email > 0) | (n_phone > 0) | (n_ip > 0)).cast("long")
        .alias("has_pii"),
        F.md5(scrub3.cast("binary")).alias("clean_md5"))


def code_detect(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Code-vs-prose detection (r7) — the routing filter a mixed web
    corpus needs before language-specific pipelines: integer
    basis-point ratios of code-ish characters ({}();=<> and []),
    indented-line share, and semicolon-terminated-line share, with a
    frozen rule-of-thumb flag (symbol_bp >= 300 AND (indent or semi
    present), or symbol_bp >= 800 alone). Everything integer,
    map-only, built-ins only."""
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    sym = (F.length(t) - F.length(F.translate(t, "{}();=<>[]", "")))
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    indented = F.size(F.filter(
        lines, lambda ln: ln.startswith("    ") | ln.startswith("\t")))
    semi = F.size(F.filter(lines, lambda ln: ln.rlike(";\\s*$")))
    # integer `div`, not float `/` + cast: keeps the basis points exact
    # integer math end to end (the cross-engine discipline the oracle's
    # `//` uses) instead of relying on double rounding never crossing
    # an integer boundary
    base = docs.select(
        F.col(id_col),
        sym.cast("long").alias("_sym"),
        n_chars.cast("long").alias("_nchars"),
        indented.cast("long").alias("_ind"),
        semi.cast("long").alias("_semi"),
        n_lines.cast("long").alias("_nlines"))
    sym_bp = F.expr("(_sym * 10000) div _nchars")
    ind_bp = F.expr("(_ind * 10000) div _nlines")
    semi_bp = F.expr("(_semi * 10000) div _nlines")
    return base.select(
        F.col(id_col),
        sym_bp.alias("symbol_bp"),
        ind_bp.alias("indent_bp"),
        semi_bp.alias("semi_bp"),
        (((sym_bp >= 300) & ((ind_bp > 0) | (semi_bp > 0)))
         | (sym_bp >= 800)).cast("long").alias("is_code"))
