"""Text-analysis operators for LLM-training-data pipelines.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM,
whole-stage codegen) — no Python UDFs — so they run at full scan
speed over 100 TB of documents and push column pruning into parquet.

Operators (driver north-star set, beyond the qcache reference which
has no string functions at all — SURVEY.md §2.9):
- token counting: whitespace tokens + a BPE-ish regex token count
- quality scoring: length / punctuation / stopword / digit /
  uppercase ratios and a composite score
- language ID: stopword-hit n-gram heuristic over a small per-language
  lexicon (expressed as regexp counts → argmax, all codegen)
- fingerprinting: 64-bit rolling/content hashes for exact and
  shingled near-exact matching
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish tokenization: word pieces, numbers, or single non-space
# symbols — a cheap regex proxy for subword tokenizers.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Script-based detection for languages whose writing system identifies
# them outright — checked before the stopword heuristic. Ranges are
# literal codepoint classes (not \p{Script=...}) so Java regex and RE2
# (DuckDB) read them identically; the q29 oracle is generated from this
# same table, so the heuristic and the oracle cannot drift. ORDER
# MATTERS: kana before the CJK-unified block (Japanese text mixes kana
# with kanji; kana wins), and each entry wins over the lexicon argmax.
LANGUAGE_SCRIPTS: list[tuple[str, str]] = [
    ("ja", "[ぁ-ゟ゠-ヿ]"),  # hiragana + katakana
    ("ko", "[가-힣]"),               # hangul syllables
    ("zh", "[一-鿿]"),               # CJK unified ideographs
    ("ru", "[Ѐ-ӿ]"),               # cyrillic
    ("el", "[Ͱ-Ͽ]"),               # greek
    ("ar", "[؀-ۿ]"),               # arabic
    ("he", "[֐-׿]"),               # hebrew
    ("hi", "[ऀ-ॿ]"),               # devanagari
    ("th", "[฀-๿]"),               # thai
]

# Tiny per-language stopword lexicons (public knowledge). Matching is
# whole-word, case-insensitive.
LANGUAGE_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour", "que", "des"],
    "es": ["el", "los", "las", "es", "en", "una", "para", "con", "por", "del"],
    "it": ["il", "di", "che", "non", "gli", "della", "sono", "questo", "anche", "più"],
    "pt": ["o", "os", "um", "uma", "não", "são", "como", "mais", "foi", "pelo"],
    "nl": ["de", "het", "een", "niet", "ook", "maar", "zijn", "voor", "naar", "deze"],
}


def whitespace_token_count(col: Column) -> Column:
    """Number of whitespace-separated tokens; 0 for empty/null-ish."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_count(col: Column) -> Column:
    """Approximate subword token count via the BPE-ish regex."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_REGEX), 0))


def _count_matches(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern))


def _raw_quality_ratios(col: Column) -> dict[str, Column]:
    """Unrounded quality signals (internal: the composite score must
    be computed from RAW ratios — scoring pre-rounded values puts the
    result systematically on rounding-tie boundaries)."""
    n_chars = F.length(col)
    n_tokens = whitespace_token_count(col)
    n_punct = _count_matches(col, r"[\.,;:!\?\"'\(\)\[\]\{\}]")
    n_digits = _count_matches(col, r"[0-9]")
    n_upper = _count_matches(col, r"[A-Z]")
    n_stopwords = _count_matches(
        F.lower(col), r"\b(" + "|".join(LANGUAGE_STOPWORDS["en"]) + r")\b"
    )
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars_computed": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / safe_chars,
        "digit_ratio": n_digits / safe_chars,
        "upper_ratio": n_upper / safe_chars,
        "stopword_ratio": n_stopwords / safe_tokens,
        "mean_token_len": (n_chars - (n_tokens - 1)) / safe_tokens,
    }


_ROUNDED = {"punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio", "mean_token_len"}


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns. One pass, all codegen."""
    raw = _raw_quality_ratios(F.col(text_col))
    for name, expr in raw.items():
        df = df.withColumn(name, F.round(expr, 6) if name in _ROUNDED else expr)
    return df


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score: rewards stopword presence and
    sane token lengths, penalizes digit/punctuation soup — the
    standard cheap pre-filter shape used before expensive model-based
    scoring. Computed from raw (unrounded) ratios."""
    raw = _raw_quality_ratios(F.col(text_col))
    score = (
        F.lit(0.25) * F.least(raw["stopword_ratio"] * 2, F.lit(1.0))
        + F.lit(0.25) * (1 - F.least(raw["digit_ratio"] * 5, F.lit(1.0)))
        + F.lit(0.25) * (1 - F.least(raw["punct_ratio"] * 5, F.lit(1.0)))
        + F.lit(0.25)
        * F.when((raw["mean_token_len"] >= 3) & (raw["mean_token_len"] <= 10), 1.0)
        .otherwise(0.0)
    )
    return quality_features(df, text_col).withColumn("quality_score", F.round(score, 6))


# Unicode word tokenizer shared by the engine and the DuckDB oracle:
# both Java regex and RE2 support \p{L}/\p{N}, so lower + split on
# non-letter/digit runs produces identical token streams in both.
WORD_SPLIT_REGEX = r"[^\p{L}\p{N}]+"


def word_tokens(col: Column) -> Column:
    """Lower-cased word tokens (array<string>), one split per row."""
    return F.split(F.lower(col), WORD_SPLIT_REGEX)


def language_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (whole-word, case-insensitive).

    Plan: ONE tokenize pass, then per-language membership counting
    with `filter(tokens, t -> array_contains(lexicon, t))` — short
    string comparisons against a 10-word literal array instead of the
    previous 7 full `regexp_count` alternation scans of the document
    (the bench suite's 2nd most expensive expression, VERDICT r1).
    Callers composing multiple scores should go through
    `language_pred` so the split binds once (see `let`)."""
    tokens = word_tokens(col)
    return {
        lang: _lexicon_hits(tokens, words)
        for lang, words in LANGUAGE_STOPWORDS.items()
    }


def _lexicon_hits(tokens: Column, words: list[str]) -> Column:
    lexicon = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lexicon, t)))


def language_pred(col: Column, min_hits: int = 1) -> Column:
    """Language prediction: script-range checks first (LANGUAGE_SCRIPTS
    order — `rlike`, which exits at the FIRST matching char, not a
    full-document count), then the stopword-hit argmax; 'und' below
    `min_hits`. Ties break by the fixed language order
    (deterministic). The token array is bound with `let` so the split
    evaluates once per row, not once per language (CollapseProject
    would otherwise inline it into all 7 lambdas); the CaseWhen chain
    short-circuits per row, so pure-Latin documents never pay for the
    script scans beyond the first few character-class probes."""
    from .dedup import let

    def build(tokens: Column) -> Column:
        scores = {
            lang: _lexicon_hits(tokens, words)
            for lang, words in LANGUAGE_STOPWORDS.items()
        }
        langs = list(scores.keys())
        best = scores[langs[0]]
        for lang in langs[1:]:
            best = F.greatest(best, scores[lang])
        pred = F.lit("und")
        # reversed so earlier languages win ties via later overwrite
        for lang in reversed(langs):
            pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
        return F.when(best < min_hits, F.lit("und")).otherwise(pred)

    pred = let(word_tokens(col), build)
    # reversed so the FIRST table entry becomes the outermost (highest
    # priority) branch
    for lang, pattern in reversed(LANGUAGE_SCRIPTS):
        pred = F.when(col.rlike(pattern), F.lit(lang)).otherwise(pred)
    return pred


def language_id(df: DataFrame, text_col: str = "text", min_hits: int = 1) -> DataFrame:
    """Append `lang_pred` (see language_pred)."""
    return df.withColumn("lang_pred", language_pred(F.col(text_col), min_hits))


def bm25_top_terms(
    df: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 terms per document (the classic keyword-extraction /
    relevance-feature pass over a corpus).

    Plan, stage by stage (all built-in exprs, no UDFs — and exactly
    TWO shuffles of the big (doc, term) table):
    1. explode(word_tokens) -> groupBy(doc, term) count: partial-agg
       shuffle keyed (doc, term); this is also where token volume
       collapses to the per-doc vocabulary.
    2. corpus stats (N docs, avgdl = total tokens / N): ONE global
       partial agg over tf — a 1-row frame, broadcast back. avgdl is
       an exact-integer quotient (long/long), so engines agree
       bit-for-bit without float-sum order concerns.
    3. document frequency: groupBy(term) over the (doc, term) table —
       vocabulary-sized output. Joined back on term; at 100 TB the
       vocab table is orders of magnitude smaller than the corpus and
       AQE converts this to a broadcast join when it fits (skipping
       the term shuffle entirely).
    4. doc length + BM25 + per-doc top-k: dl is a window SUM over the
       SAME partitioning the ranking window needs, so Spark plans one
       exchange by doc for both (the old doclen groupBy+join cost a
       third shuffle of tf).

    Ranking is (score desc, term asc); the score arithmetic is written
    in one canonical order so an external SQL engine reproduces the
    same doubles bit-for-bit (gated by q56's DuckDB oracle).
    """
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.agg(
        F.countDistinct(id_col).alias("n_docs"), F.sum("tf").alias("_total")
    ).select("n_docs", (F.col("_total") / F.col("n_docs")).alias("avgdl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    score = idf * (
        (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    w_doc = Window.partitionBy(id_col)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("dl", F.sum("tf").over(w_doc))
        .withColumn("_score", score)
    )
    w = w_doc.orderBy(F.desc("_score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "rank", F.round("_score", 6).alias("bm25"))
    )


def unigram_surprise(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-proxy quality score: mean negative unigram
    log-probability per document, with the LM estimated from the
    corpus itself — the cheap statistical stand-in for model-based
    perplexity filtering (low surprise = repetitive/common text, very
    high surprise = gibberish/rare-token soup).

    Plan: (doc,term) TF agg -> vocab-sized count table (AQE broadcasts
    it back when small) -> per-doc sum. The per-term contribution
    tf * ln(cnt/N) is snapped to fixed-point 1e-6 BEFORE summing, so
    the per-doc sum is exact long arithmetic — order-independent under
    any partitioning (and bit-equal in the DuckDB oracle); floats in a
    distributed sum would not be.
    """
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))

    logp_fp = F.round(F.log(F.col("cnt") / F.col("n_total")) * 1e6).cast("long")
    contrib = (F.col("tf") * logp_fp).alias("contrib_fp")
    per_doc = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(id_col, F.col("tf"), contrib)
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"), F.sum("contrib_fp").alias("s_fp"))
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(-(F.col("s_fp") / 1e6) / F.col("n_tokens"), 6).alias("surprise"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition/boilerplate signals (the cheap Gopher/C4-style
    quality gates applied before model-based scoring):

    - `n_tokens`                whitespace tokens
    - `distinct_token_ratio`    |set(tokens)| / |tokens|
    - `dup_2gram_frac`          1 - |set(2-grams)| / |2-grams|
    - `dup_line_ratio`          1 - |set(lines)| / |lines|

    One split per row bound with `let`; 2-grams via zip_with over the
    two shifted token slices — all built-in collection expressions,
    scan-speed at any corpus size. Ratios round to 6 dp (exact-match
    oracle contract)."""
    from .dedup import let

    col = F.col(text_col)

    def build(toks: Column) -> Column:
        n = F.size(toks)
        two = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        n2 = F.size(two)
        return F.struct(
            n.alias("n_tokens"),
            F.round(F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1)), 6).alias(
                "distinct_token_ratio"
            ),
            F.when(n2 < 1, F.lit(0.0))
            .otherwise(F.round(1 - F.size(F.array_distinct(two)) / n2, 6))
            .alias("dup_2gram_frac"),
        )

    lines = F.split(col, r"\n")
    stats = let(F.split(F.trim(col), r"\s+"), build)
    return (
        df.withColumn("_rs", stats)
        .select(
            "*",
            F.col("_rs.n_tokens").alias("n_tokens"),
            F.col("_rs.distinct_token_ratio").alias("distinct_token_ratio"),
            F.col("_rs.dup_2gram_frac").alias("dup_2gram_frac"),
            F.round(
                1 - F.size(F.array_distinct(lines)) / F.greatest(F.size(lines), F.lit(1)), 6
            ).alias("dup_line_ratio"),
        )
        .drop("_rs")
    )


# PII patterns chosen to mean the same thing to Java regex and RE2
# (no backreferences / lookaround), so the engine and a DuckDB oracle
# agree byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9\-]{6,}[0-9]",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII match counts (`n_email`, `n_phone`,
    `n_ipv4`) — the detection half of the scrub pipeline, pure
    codegen regexp_count."""
    col = F.col(text_col)
    for kind, pattern in PII_PATTERNS.items():
        df = df.withColumn(f"n_{kind}", F.regexp_count(col, F.lit(pattern)))
    return df


def pii_redact(df: DataFrame, text_col: str = "text", out_col: str = "text_redacted") -> DataFrame:
    """Replace each PII match with a typed placeholder (`<EMAIL>`,
    `<PHONE>`, `<IPV4>`) — the standard pre-training scrub. Chained
    regexp_replace, single projection, no Python."""
    out = F.col(text_col)
    for kind, pattern in PII_PATTERNS.items():
        out = F.regexp_replace(out, pattern, f"<{kind.upper()}>")
    return df.withColumn(out_col, out)


def top_terms_by_group(
    df: DataFrame,
    k: int = 20,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most frequent terms per group (per-language vocabulary
    building — the first pass of tokenizer training / corpus audits).

    Plan: explode(tokens) -> groupBy(group, term) partial-agg shuffle
    (this is where token volume collapses to per-group vocabulary
    size) -> row_number window partitioned by group over the
    vocab-sized table only. Ranking ties break by term (ascending) so
    the result is deterministic and engine-portable.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(word_tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("grp").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "term", "n", "rank")
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 256,
    stride: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-tokenization pass that turns variable-length documents into
    model-sized training sequences.

    Window rule (deterministic, engine-portable): word tokens (the
    shared WORD_SPLIT_REGEX tokenizer, empties dropped), chunk starts
    at 0, stride, 2*stride, ... while start < n_tokens; each chunk is
    tokens[start : start+chunk_size] (the trailing chunk may be
    partial). Documents with zero tokens produce zero chunks.

    Output: (id_col, chunk_id, n_chunk_tokens, chunk_text).

    Plan: ONE projection + explode (Generate) — entirely scan-stage,
    no shuffle, no Python; chunking 100 TB is embarrassingly parallel
    and this form keeps it that way. The token array is bound once
    with `let` (CollapseProject would otherwise re-split per
    subexpression); the two-arg transform lambda supplies chunk_id
    for free.
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError(
            f"chunk_size and stride must be >= 1, got {chunk_size}, {stride}"
        )
    from .dedup import let

    def build(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(0), n - 1, F.lit(stride))
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_id"),
                F.size(F.slice(toks, s + 1, chunk_size)).alias("n_chunk_tokens"),
                F.array_join(F.slice(toks, s + 1, chunk_size), " ").alias(
                    "chunk_text"
                ),
            ),
        )

    tokens = F.filter(word_tokens(F.col(text_col)), lambda t: t != "")
    return (
        df.select(F.col(id_col), F.explode(let(tokens, build)).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    token_budget: int = 512,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_chunk_tokens",
    hash_fn: str = "xxhash64",
    seed: int = 0,
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget packs
    (the pre-training step that concatenates short sequences so no
    context-window tokens are wasted as padding).

    Packing rule (deterministic, engine-portable): chunks hash into
    `n_buckets` independent streams by document id; within a bucket,
    chunks concatenate into a token "tape" in (doc_id, chunk_id)
    order, and packs are the budget-aligned windows over that tape —
    a chunk belongs to the pack where it STARTS (chunks are never
    split — that is the chunker's job — so a pack can overflow by at
    most chunk_size - 1 tokens). pack = (bucket, pack_id);
    `tape_offset` is the chunk's start position on the bucket's tape,
    from which any downstream layout (attention-mask boundaries,
    concat order) derives without a second pass.

    Scale shape: a global greedy pack is a single-partition sort — the
    bucketed form runs `n_buckets` independent cumulative-sum windows,
    one shuffle by bucket, each window linear in its bucket. More
    buckets = more parallelism at the cost of one partially-filled
    final pack per bucket.
    """
    if token_budget < 1 or n_buckets < 1:
        raise ValueError(
            f"token_budget and n_buckets must be >= 1, got {token_budget}, {n_buckets}"
        )
    # the bucket hash reuses sampling's portable hash60 (md5 path is
    # bit-equal in DuckDB, enabling the q68 oracle; xxhash64 is the
    # fast default)
    from .sampling import hash60

    bucket = F.pmod(hash60(F.col(id_col), seed, hash_fn), F.lit(n_buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc(), F.col(chunk_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)
    return (
        chunks.withColumn("bucket", bucket)
        .withColumn("tape_offset", before.cast("long"))
        .withColumn(
            "pack_id", F.floor(F.col("tape_offset") / F.lit(token_budget)).cast("int")
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", normalize: bool = True) -> DataFrame:
    """64-bit content fingerprint: xxhash64 over (optionally
    whitespace/case-normalized) text. Identical fingerprints == exact
    (modulo normalization) duplicates; groupBy(fingerprint) is the
    scalable exact-dedup shuffle key (8 bytes instead of document
    bodies on the wire)."""
    col = F.col(text_col)
    if normalize:
        col = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(col))


def chunk_dup_stats(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document boilerplate fraction at chunk granularity: chunk
    every document (chunk_documents' window rule), count how many of a
    document's chunks also occur VERBATIM in at least one other
    document, and report the fraction — the standard intra-corpus
    boilerplate / template-contamination signal (headers, nav bars,
    license blocks repeat chunk-exactly across pages long before whole
    documents are near-dups).

    Output: (id_col, n_chunks, n_dup_chunks, dup_frac), dup_frac
    rounded to 6 places (portable double arithmetic).

    Scale shape: chunking is scan-stage (no shuffle); the repeat test
    is ONE partial-agg shuffle keyed on the 64-bit chunk fingerprint
    carrying (fingerprint, count_distinct-ish doc pair) — bodies never
    shuffle twice: the per-chunk join back is on the fingerprint, and
    the per-doc rollup reuses the id partitioning. Exactly-repeated
    boilerplate concentrates on few fingerprints; the groupBy is a
    partial-agg so hot fingerprints combine map-side."""
    from pyspark.sql import functions as F

    chunks = chunk_documents(df, chunk_size, stride, text_col, id_col).select(
        id_col, F.xxhash64("chunk_text").alias("_fp")
    )
    # fingerprint -> does it appear in >= 2 distinct docs?
    spread = chunks.groupBy("_fp").agg(
        F.count_distinct(F.col(id_col)).alias("_ndocs")
    )
    flagged = chunks.join(spread, "_fp").select(
        id_col, (F.col("_ndocs") >= 2).cast("int").alias("_dup")
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("_dup").alias("n_dup_chunks"),
        F.round(F.sum("_dup") / F.count(F.lit(1)), 6).alias("dup_frac"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inter-document n-gram novelty: for each document, how many of
    its DISTINCT word n-grams are introduced BY it — i.e. no document
    with a smaller id contains them. High-novelty documents carry new
    content; near-zero novelty flags template/boilerplate tails that
    survived exact dedup. (doc_id order is the corpus's arrival order,
    so this is "novel at ingest time".)

    Returns (id, n_ngrams, n_novel) — exact integers (the fraction is
    a trivial ratio for the caller; emitting only integers keeps the
    result bit-comparable across engines).

    Scale shape: n-gram generation is a scan-stage flatMap (built-in
    transform over the token array — no UDF); one partial-agg shuffle
    keyed on the n-gram computes each gram's minimum doc id (hot grams
    combine map-side); one equi-join attributes first-introduction
    back to documents and reduces per doc. The shuffle carries 64-bit-
    hashable short strings, never document bodies."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.filter(word_tokens(F.col(text_col)), lambda t: t != "")
    # guard: sequence(1, stop) DESCENDS when stop < 1 (Spark semantics),
    # which would index element_at(toks, 0) and raise — docs shorter
    # than n tokens get an empty gram array instead.
    grams = F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )).otherwise(F.array().cast("array<string>"))
    expl = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    first = expl.groupBy("gram").agg(F.min(id_col).alias("_first"))
    per_doc = (
        expl.join(first, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("_first") == F.col(id_col)).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        )
    )


def vocab_overlap(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between groups (languages, sources,
    shards): distinct-token sets per group, intersection sizes for
    every unordered group pair. Jaccard = n_common/(n_a+n_b-n_common)
    is left to the caller — the emitted columns are exact integers.

    The cross-corpus contamination / domain-shift probe: a "zh" shard
    sharing most of its vocabulary with "en" flags mislabeled data.

    Scale shape: one distinct shuffle on (group, token) — vocabulary-
    sized, not corpus-sized — then a self-equi-join ON TOKEN between
    group vocabularies and a partial-count shuffle per pair. Group
    pair coverage is total (zero-overlap pairs included) via the tiny
    sizes×sizes cross join, which is broadcast."""
    vocab = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(
                F.array_distinct(
                    F.filter(word_tokens(F.col(text_col)), lambda t: t != "")
                )
            ).alias("tok"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        vocab.alias("a")
        .join(vocab.alias("b"), "tok")
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pairs = (
        F.broadcast(sizes.alias("sa"))
        .join(F.broadcast(sizes.alias("sb")))
        .filter(F.col("sa.g") < F.col("sb.g"))
        .select(
            F.col("sa.g").alias("ga"),
            F.col("sb.g").alias("gb"),
            F.col("sa.n").alias("n_a"),
            F.col("sb.n").alias("n_b"),
        )
    )
    return pairs.join(inter, ["ga", "gb"], "left").select(
        F.col("ga").alias(f"{group_col}_a"),
        F.col("gb").alias(f"{group_col}_b"),
        "n_a",
        "n_b",
        F.coalesce("n_common", F.lit(0)).alias("n_common"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-profile summary — the pre-training data-quality report:
    per column, row/null/distinct counts and min/max (rendered to
    strings so heterogeneous column types stack into one frame).

    ONE aggregation job computes every column's statistics (a single
    global agg with 4·k expressions — Spark evaluates them in one
    partial-agg pass, so profiling 100 TB is one scan + one 1-row
    shuffle, not k jobs); the per-column unpivot happens on the single
    aggregated row, driver-free. count_distinct over many columns
    expands the partial rows k-fold, which is the documented cost of
    EXACT distincts — callers profiling very wide tables at scale can
    accept approx_count_distinct instead (see operators/sketch.py);
    the gate uses exact so the oracle can reproduce it."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    # positional alias names + one[i] references: column names with
    # dots/backticks/spaces would break string-based F.col lookups on
    # the generated aliases (a dot parses as struct access)
    def _q(c: str):  # backtick-quoted exact-name reference
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(_q(c).isNull().cast("long")).alias(f"__nn_{i}"),
            F.count_distinct(_q(c)).alias(f"__nd_{i}"),
            F.min(_q(c)).cast("string").alias(f"__mn_{i}"),
            F.max(_q(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                one[5 * i + 0].alias("n_rows"),
                one[5 * i + 1].alias("n_null"),
                one[5 * i + 2].alias("n_distinct"),
                one[5 * i + 3].alias("min_value"),
                one[5 * i + 4].alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def token_cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Top PMI token pairs within a +-`window` co-occurrence window —
    the word2vec/GloVe preprocessing statistic (Church & Hanks 1990),
    and the collocation probe run on a corpus before tokenizer
    training. PMI(a,b) = ln( P(a,b) / (P(a) P(b)) ) over pair and
    token instance counts.

    Scale shape: pair generation is PURE ARRAY EXPRESSIONS in the scan
    stage — for each offset d in 1..window, zip the token array with
    itself shifted by d (transform over an index sequence); no
    positional self-join, no shuffle until the (a, b) partial agg.
    The exchanges carry (pair, count) and (token, count) — vocabulary-
    bounded, never the corpus. Marginals attach with two token-keyed
    joins and the two global scalars ride a 1-row cross join.

    Determinism: all counts are exact longs; PMI is emitted as
    round(pmi * 1e6) LONG with the ln-sum written in one fixed
    association order, so a replicating engine evaluating the same
    IEEE expression produces the identical integer (the q59 device).
    Pairs are unordered (least/greatest normalization); ties in the
    top-n break on (pair) lexicographically.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = F.array_remove(word_tokens(F.col(text_col)), "")
    from .dedup import let

    def pairs_of(t: Column) -> Column:
        per_d = [
            F.when(
                F.size(t) > d,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - d),
                    lambda i: F.struct(
                        F.least(
                            F.element_at(t, i), F.element_at(t, i + F.lit(d))
                        ).alias("a"),
                        F.greatest(
                            F.element_at(t, i), F.element_at(t, i + F.lit(d))
                        ).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            for d in range(1, window + 1)
        ]
        return F.concat(*per_d) if len(per_d) > 1 else per_d[0]

    pair_rows = df.select(
        F.explode(let(toks, pairs_of)).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    pair_counts = pair_rows.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    tok_counts = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = pair_counts.agg(
        F.sum("n_ab").alias("n_pairs")
    ).crossJoin(tok_counts.agg(F.sum("c").alias("n_tok")))
    scored = (
        pair_counts.filter(F.col("n_ab") >= min_count)
        .join(tok_counts.select(F.col("tok").alias("a"), F.col("c").alias("c_a")), "a")
        .join(tok_counts.select(F.col("tok").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "n_ab",
            # one fixed association order, replicated verbatim by the
            # oracle: (((ln(nab) - ln(np)) - ln(ca)) - ln(cb)) + 2*ln(nt)
            F.round(
                (
                    F.log(F.col("n_ab"))
                    - F.log(F.col("n_pairs"))
                    - F.log(F.col("c_a"))
                    - F.log(F.col("c_b"))
                    + F.lit(2.0) * F.log(F.col("n_tok"))
                )
                * 1e6
            )
            .cast("long")
            .alias("pmi_e6"),
        )
    )
    return scored.orderBy(F.col("pmi_e6").desc(), "a", "b").limit(top_n)
