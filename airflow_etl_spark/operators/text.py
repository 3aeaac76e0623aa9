"""Text-analysis operators for the training-data pipeline (extension
surface; BASELINE.json north star).

All operators are pure JVM-side column expressions (no Python UDFs) so they
whole-stage-codegen and scale linearly with no shuffle:

- tokenization (whitespace + regex "BPE-ish" word/number/punct tokens)
- token counting
- quality scoring (length / punctuation / stopword / repetition features)
- language ID (stopword-overlap heuristic over a fixed per-language lexicon)
- document fingerprinting (md5 over normalized text)

Determinism note: every function here is a deterministic expression over the
text column only, so results are engine-portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions import normalize_text

#: Fixed tiny stopword lexicons for the language-ID heuristic. The point is
#: deterministic, cheap n-gram-style scoring — not linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que"],
}

#: Regex for "BPE-ish" tokens: letter runs, digit runs, or single
#: non-alphanumeric-non-space marks. Kept to portable regex constructs
#: (works identically in Java regex and RE2).
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens over normalized text (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(normalize_text(c), " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(text))


def regex_token_count(text: Column | str) -> Column:
    """Count of TOKEN_REGEX matches — the BPE-ish token estimate."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality features:

    - n_chars_norm: normalized char length
    - n_tokens: whitespace token count
    - n_distinct_tokens: vocabulary size
    - repetition_ratio: 1 - distinct/total (high → boilerplate/spam)
    - mean_token_len
    - stopword_ratio: fraction of tokens in the english stopword set
    """
    toks = ws_tokens(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    sw = F.array([F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return (
        df.withColumn("n_chars_norm", F.length(normalize_text(text_col)))
        .withColumn("n_tokens", n)
        .withColumn("n_distinct_tokens", nd)
        .withColumn(
            "repetition_ratio",
            F.round(F.lit(1.0) - nd.cast("double") / n.cast("double"), 4),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                (F.length(normalize_text(text_col)) - (n - 1)).cast("double")
                / n.cast("double"),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio", F.round(n_sw.cast("double") / n.cast("double"), 4)
        )
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (distinct hits, array-intersect)."""
    toks = ws_tokens(text)
    return {
        lang: F.size(
            F.array_intersect(toks, F.array([F.lit(s) for s in words]))
        )
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "predicted_lang") -> DataFrame:
    """Predict language = argmax stopword-hit count, ties broken by
    alphabetical language code, 'und' (undetermined) when zero hits."""
    scores = lang_scores(text_col)
    # build a (score, negated-rank-safe lang) struct array and take the max:
    # max on (score asc, lang desc-inverted) — to get ties → alphabetically
    # first lang, invert the lang ordering via a fixed index.
    langs = sorted(scores)  # alphabetical
    structs = [
        F.struct(
            scores[lang].alias("score"),
            F.lit(len(langs) - i).alias("pref"),  # earlier lang → higher pref
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*structs))
    return df.withColumn(
        out_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of normalized text (whitespace-insensitive
    exact-dup key)."""
    return df.withColumn(out_col, F.md5(normalize_text(text_col)))


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 8, w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash fingerprint family,
    Schleimer et al.'s winnowing scheme): hash every char k-gram of the
    normalized text, keep the minimum hash of each w-wide sliding window,
    emit the distinct minima as (id, fingerprint) rows.

    Guarantees at least one fingerprint per shared substring of length
    >= k + w - 1 — the standard near-dup/plagiarism fingerprint. Pure
    column expressions (sequence/transform/slice over the JVM), one linear
    pass, no shuffle; texts shorter than k collapse to one whole-text hash.
    The 28-bit md5-derived gram hash is engine-portable (same convention as
    dedup.h28).
    """
    from .core import spread
    from .dedup import h28

    # grams need a dynamic substring start, so the gram array is built with
    # a SQL expr; the hash over it reuses the shared h28 convention
    grams = F.expr(
        f"transform(sequence(1, greatest(length(nt) - {k - 1}, 1)), "
        f"i -> substring(nt, i, {k}))"
    )
    fps = (
        f"case when size(hs) >= {w} then "
        f"array_distinct(transform(sequence(1, size(hs) - {w - 1}), "
        f"j -> array_min(slice(hs, j, {w})))) "
        f"else array(array_min(hs)) end"
    )
    return (
        # spread: char-k-gram hashing is the expensive projection; a
        # single-file input would run it on one core
        spread(df).select(F.col(id_col), normalize_text(text_col).alias("nt"))
        .withColumn("hs", F.transform(grams, h28))
        .select(id_col, F.explode(F.expr(fps)).alias("fingerprint"))
    )


def _word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (empty when the doc has
    fewer than n tokens). 1-based slice — Spark's slice convention."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(tokens) >= n, grams).otherwise(empty)


def dup_ngram_frac(text: Column | str, n: int = 5) -> Column:
    """Fraction of the document's word n-grams that are repeats
    (1 - distinct/total; 0.0 when shorter than n tokens) — the Gopher
    duplicate-n-gram filter as a single pure expression."""
    toks = ws_tokens(text)
    grams = _word_ngrams(toks, n)
    return F.when(F.size(toks) < n, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
            4,
        )
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021's
    repetitive-text filters, word-n-gram family):

    - top_bigram / top_trigram: the document's most frequent word 2-/3-gram
      (ties → lexicographically first gram — deterministic);
    - top_bigram_frac / top_trigram_frac: fraction of the normalized text's
      characters covered by that gram's occurrences
      (count * len(gram) / len(normalized_text), the Gopher convention);
    - dup_5gram_frac: fraction of the document's word 5-grams that are
      repeats (1 - distinct/total; 0.0 for docs shorter than 5 tokens).

    A quality filter drops docs where any of these exceed its threshold
    (boilerplate, keyword-stuffed spam, looped generations).

    Plan shape: dup_5gram_frac is a pure per-row expression (zero
    shuffle). The top-gram mode is explode → groupBy(id, n, gram) →
    per-(id, n) top-1 window — linear in corpus tokens and partitioned by
    document id throughout, so it scales to arbitrarily long documents
    (an all-pairs in-array mode via filter() would be O(tokens²) per doc).
    """
    from .core import spread

    toks = ws_tokens(text_col)
    # spread: the n-gram string building below is the hot projection and
    # runs BEFORE any shuffle — a single-file input would do it on 1 core
    df = spread(df)
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("t"),
        F.length(normalize_text(text_col)).cast("double").alias("n_chars"),
    )
    grams = base.select(
        "id",
        "n_chars",
        F.explode(
            F.array(
                F.struct(F.lit(2).alias("n"), _word_ngrams(F.col("t"), 2).alias("gs")),
                F.struct(F.lit(3).alias("n"), _word_ngrams(F.col("t"), 3).alias("gs")),
            )
        ).alias("g"),
    ).select("id", "n_chars", "g.n", F.explode("g.gs").alias("gram"))
    counts = grams.groupBy("id", "n_chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("id", "n").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn(
            "frac",
            F.round(F.col("cnt") * F.length("gram") / F.col("n_chars"), 4),
        )
        .groupBy("id")
        .agg(
            F.max(F.when(F.col("n") == 2, F.col("gram"))).alias("top_bigram"),
            F.max(F.when(F.col("n") == 2, F.col("frac"))).alias("top_bigram_frac"),
            F.max(F.when(F.col("n") == 3, F.col("gram"))).alias("top_trigram"),
            F.max(F.when(F.col("n") == 3, F.col("frac"))).alias("top_trigram_frac"),
        )
    )
    g5 = _word_ngrams(F.col("t"), 5)
    dup5 = base.select(
        "id",
        F.when(F.size("t") < 5, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(g5)).cast("double") / F.size(g5),
                4,
            )
        )
        .alias("dup_5gram_frac"),
    )  # same formula as dup_ngram_frac, over the already-tokenized column
    return dup5.join(top, "id", "left").select(
        F.col("id"),
        "top_bigram",
        "top_bigram_frac",
        "top_trigram",
        "top_trigram_frac",
        "dup_5gram_frac",
    )


# --------------------------------------------------------------------------
# cleaning (C4-style line rules, PII redaction, in-document dedup) — the
# Common-Crawl-to-corpus steps; all pure JVM expressions, zero shuffle
# --------------------------------------------------------------------------

#: Portable PII patterns (Java regex == RE2-safe constructs only).
#: ORDER IS THE CONTRACT: most-specific first — emails (their digits must
#: not half-match as phones), then IPv4 (digit-dot runs the phone pattern
#: would swallow), then card-like digit runs, then the loosest (phones).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{13,16}\b", "<NUMBER>"),
    (r"\+?[0-9][0-9()\-\. ]{5,}[0-9]", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace emails / phone-like digit runs / long card-like numbers /
    IPv4s with typed placeholders — the standard pre-training PII scrub.
    A chain of regexp_replace calls: one codegen'd pass per pattern, zero
    shuffle, deterministic. Pattern order matters (emails first so their
    digits never half-match as phones) and is part of the contract."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def dedup_lines(text: Column | str) -> Column:
    """Remove REPEATED lines within a document, keeping first occurrences
    in order (array_distinct is order-preserving) — the in-document
    repetition scrub (boilerplate headers/footers repeating per page).
    Cross-document dedup stays with the dedup operator family."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_join(F.array_distinct(_lines(c)), "\n")


def c4_line_filter(
    text: Column | str, min_words: int = 3, require_terminal: bool = True
) -> Column:
    """C4's line-level cleaning rules as one expression: keep only lines
    with >= min_words words and (optionally) terminal punctuation
    (. ! ? ") — the filter that strips menus, nav bars, and cookie
    banners from web text. Returns the cleaned document (kept lines
    rejoined)."""
    c = F.col(text) if isinstance(text, str) else text
    keep = lambda ln: (  # noqa: E731
        (F.size(F.split(F.trim(ln), " +")) >= F.lit(min_words))
        & (
            F.lit(not require_terminal)
            | ln.rlike(r'[.!?"]\s*$')
        )
    )
    return F.array_join(F.filter(_lines(c), keep), "\n")


def cross_doc_line_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CROSS-document line deduplication — the C4 global dedup step
    (`dedup_lines` above handles only in-document repeats): every
    normalized line keeps exactly its FIRST corpus-wide occurrence
    (min doc id, then min position — deterministic, engine-portable) and
    later occurrences drop; documents reassemble in original line order.
    Strips boilerplate that repeats ACROSS pages (cookie banners, nav
    text, license headers) — one of the highest-value cleanups measured
    for web-scale pretraining corpora.

    Scale shape: two shuffles, both on high-cardinality keys — (1) the
    window over the line key (md5 of the normalized line, so the
    decision rides a fixed-width key, not text) ranks occurrences; (2)
    the reassembly groups by doc id. No broadcast of anything
    corpus-sized, no driver-side state. Blank lines are formatting, not
    content: they are always kept, never dedup keys (otherwise the
    corpus would share ONE newline).

    Returns (id, text_deduped, n_lines, n_kept)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(_lines(F.col(text_col))).alias("pos", "line"),
    ).withColumn("norm", normalize_text(F.col("line")))
    w = Window.partitionBy("norm").orderBy(id_col, "pos")
    ranked = lines.withColumn(
        "keep",
        (F.col("norm") == "") | (F.row_number().over(w) == 1),
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
                "\n",
            ).alias("text_deduped"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
    )


def clean_pipeline(
    df: DataFrame, text_col: str = "text", min_words: int = 3
) -> DataFrame:
    """The composed cleaning pass (C4 line rules → in-doc line dedup →
    PII redaction), emitted alongside before/after size evidence. One
    projection — the full scrub costs a single codegen'd map over the
    corpus."""
    cleaned = redact_pii(
        dedup_lines(c4_line_filter(F.col(text_col), min_words))
    )
    return df.withColumn("clean_text", cleaned).withColumn(
        "n_chars_before", F.length(F.col(text_col))
    ).withColumn("n_chars_after", F.length("clean_text"))


# --------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-style serving path)
# --------------------------------------------------------------------------

#: Feature-hash dimensionality of the classifier. Vocabulary-free: every
#: token maps to a bucket via the portable md5 h28 hash, so serving needs
#: no vocabulary table — the standard hashing-trick deployment of a
#: fastText/logistic quality model (Joulin et al. 2016).
CLASSIFIER_DIM = 512

#: Knuth multiplicative constant used to derive the demo weight for bucket
#: j. In production the weight vector comes from an externally-trained
#: model and enters the plan as ONE array literal (see similarity
#: _array_lit_1d_double — O(1) plan nodes at any dim); the arithmetic
#: derivation keeps the registry query reproducible inside ANY engine with
#: 64-bit integers, which is what the cross-engine oracle checks.
_W_MULT = 2654435761


def _bucket_weight(bucket: Column) -> Column:
    """Deterministic pseudo-weight for a feature bucket: an integer-only
    affine hash mapped into [-0.5, 0.5). Same expression is replayed by
    the DuckDB oracle — exact, no float accumulation involved."""
    return (
        ((bucket + 1) * F.lit(_W_MULT) % 1000).cast("double") / 1000.0 - 0.5
    )


def classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = CLASSIFIER_DIM,
) -> DataFrame:
    """Score every document with a hashed-bag-of-words linear classifier:
    margin = mean over tokens of w[h28(token) % dim]; prob = sigmoid of a
    temperature-scaled margin; pred_quality = prob >= 0.5.

    This is the SERVING path of a fastText-style quality model — the
    shape of "run a trained quality classifier over 100 TB of text": a
    PURE PROJECTION (tokenize → hash → weight lookup → sequential fold),
    zero shuffle, no vocabulary broadcast, whole-stage codegen end to end.
    The margin fold is a left-to-right `F.aggregate` so the float
    accumulation order is deterministic and engine-portable (the DuckDB
    oracle folds an ordered list the same way).
    """
    from .dedup import h28

    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    margin_sum = F.aggregate(
        F.transform(toks, lambda t: _bucket_weight(h28(t) % dim)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    margin = F.round(margin_sum / n.cast("double"), 4)
    prob = F.round(1.0 / (1.0 + F.exp(-8.0 * margin)), 4)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        margin.alias("margin"),
        prob.alias("prob"),
        (prob >= 0.5).alias("pred_quality"),
    )


def chunk_windows(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the context-window packing /
    RAG-indexing primitive: each document's whitespace tokens split into
    windows of `chunk_tokens` with `overlap` tokens shared between
    consecutive windows (stride = chunk_tokens - overlap), the standard
    fixed-size chunker (e.g. LangChain/LlamaIndex token splitters,
    passage chunking in DPR). The last window may be shorter; every
    token lands in at least one window. Documents whose normalized text
    is empty yield no rows.

    Returns (id, chunk_idx, start_token, n_chunk_tokens, chunk_text).

    Scale shape: a pure projection plus an explode whose output size is
    the corpus's true chunk count — no shuffle, no UDF; the token array
    is let-bound so normalize+split runs once per document, not once
    per chunk. Deterministic: chunk boundaries are arithmetic over the
    token index, so re-runs and repartitionings chunk identically
    (content-defined chunking would too, but fixed-stride is the
    training-pipeline standard)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    from .dedup import let

    out = (
        df.select(F.col(id_col).alias("id"), ws_tokens(text_col).alias("toks"))
        .where((F.size("toks") > 1) | (F.element_at("toks", 1) != F.lit("")))
    )
    n = F.size("toks")
    n_chunks = F.greatest(
        F.lit(1),
        ((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)).cast("long"),
    )
    out = out.withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)),
    )
    start = F.col("chunk_idx") * F.lit(step)
    window = F.slice(F.col("toks"), (start + 1).cast("int"), chunk_tokens)
    return out.select(
        "id",
        "chunk_idx",
        start.alias("start_token"),
        let(window, lambda w: F.size(w)).cast("int").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def chunk_content_defined(
    df: DataFrame,
    divisor: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER token i
    whenever h28(token_i) % divisor == 0, so boundaries depend only on
    LOCAL content — an edit early in a document shifts only its own
    chunk, not every later boundary (the rsync/FastCDC property that
    makes chunk-level dedup survive insertions; fixed-stride windows
    re-chunk everything downstream of an edit). Expected chunk length =
    `divisor` tokens. Production CDC adds min/max size clamps; they
    introduce a boundary-to-boundary sequential dependence, so this
    operator documents the unclamped contract instead (the tail of the
    size distribution is geometric).

    Returns (id, chunk_idx, start_token, n_chunk_tokens, chunk_text).

    Zero-shuffle: boundary positions, chunk extents, and chunk texts are
    all array expressions per document (token array and boundary list
    let-bound, evaluated once), plus one explode sized to the true chunk
    count."""
    from .dedup import h28, let

    out = (
        df.select(F.col(id_col).alias("id"), ws_tokens(text_col).alias("toks"))
        .where((F.size("toks") > 1) | (F.element_at("toks", 1) != F.lit("")))
    )
    n = F.size("toks")
    bpos = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: h28(F.try_element_at(F.col("toks"), i)) % divisor == 0,
    )
    ends = let(
        bpos,
        lambda b: F.when(
            (F.size(b) > 0) & (F.try_element_at(b, F.lit(-1)) == n), b
        ).otherwise(F.concat(b, F.array(n))),
    )
    out = out.withColumn("ends", ends).withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), F.size("ends") - 1))
    )
    start = F.when(F.col("chunk_idx") == 0, F.lit(0)).otherwise(
        F.try_element_at(F.col("ends"), F.col("chunk_idx"))
    )
    end_cur = F.try_element_at(F.col("ends"), F.col("chunk_idx") + 1)
    return out.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_token"),
        (end_cur - start).cast("int").alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("toks"), (start + 1).cast("int"), (end_cur - start).cast("int")),
            " ",
        ).alias("chunk_text"),
    )


# --------------------------------------------- HTML extraction (r7 s4) --
HTML_TEMPLATE = (
    "<html><head><title>Corpus Page</title></head><body>"
    "<nav>Home | About | Contact</nav><main><p>{body}</p></main>"
    "<footer>(c) corpus site - all rights reserved</footer></body></html>"
)


def with_html_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "html"
) -> Column:
    """Deterministic HTML fixture: every document wrapped in the same
    chrome (title, nav, footer) — the shape a web crawl hands the
    extraction stage. Returns the html Column (attach with
    withColumn)."""
    pre, post = HTML_TEMPLATE.split("{body}")
    return F.concat(F.lit(pre), F.col(text_col), F.lit(post))


def html_to_lines(html: Column | str) -> Column:
    """Tag-strip an HTML document into its text segments: every tag
    becomes a line boundary, blank segments drop. A trafilatura-lite
    first pass — no parser, one RE2-safe regex, fully codegen'd. (Real
    crawls also need entity decoding and script/style elision — out of
    fixture scope, same dataflow.)"""
    c = F.col(html) if isinstance(html, str) else html
    segs = F.split(F.regexp_replace(c, "<[^>]+>", "\n"), "\n")
    return F.filter(
        F.transform(segs, lambda s: F.trim(s)), lambda s: s != ""
    )


def drop_boilerplate_lines(
    lines: DataFrame, id_col: str = "doc_id", line_col: str = "line",
    frac: float = 0.5,
) -> DataFrame:
    """Remove every line whose NORMALIZED form appears in more than
    `frac` of all documents — chrome repeats on every page, content
    doesn't (the CCNet/trafilatura corpus-frequency heuristic, distinct
    from cross_doc_line_dedup which keeps first occurrences). Two
    aggregates on the line-hash key plus one anti-join; the frequent
    set is tiny by construction (only corpus-wide repeats qualify) and
    broadcasts."""
    spark_n = lines.select(id_col).distinct().count()  # control-plane scalar
    norm = normalize_text(F.col(line_col))
    keyed = lines.withColumn("__norm", norm)
    frequent = (
        keyed.select(id_col, "__norm")
        .distinct()
        .groupBy("__norm")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") > frac * spark_n)
        .select("__norm")
    )
    return keyed.join(
        F.broadcast(frequent), "__norm", "left_anti"
    ).drop("__norm")


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    max_words: int = 3,
    k: int = 3,
    vocab_bound: int | None = None,
) -> DataFrame:
    """RAKE-style keyword extraction (Rose et al.'s public algorithm):
    candidate phrases are maximal stopword-free token runs (gaps-and-
    islands: run_id = pos − row_number over non-stop tokens, a pure
    window identity — no per-row Python); each word scores
    degree/frequency over the WHOLE corpus' candidate phrases, a phrase
    scores the sum of its words' scores, and each document keeps its
    top-k phrases.

    Exactness: word score = floor(deg·1e6/freq) — integer ppm, so
    phrase scores are exact integer sums and the per-doc rank has no
    float ties. Scale shape: one posexplode, one window over per-doc
    positions (document grain), ONE corpus-level word aggregate whose
    result is word-vocabulary-sized (broadcast back), and a top-k
    window over per-doc phrases. Returns
    (id, phrase, n_words, score_ppm, rank).

    `vocab_bound` (r12 broadcast audit): the word-score relation is
    vocab-sized (Heaps-sublinear) — forced broadcast by default; pass a
    known/measured distinct-word bound to make the hint adaptive for
    web-scale corpora (over budget → shuffle join on the word key)."""
    stopwords = stopwords or LANG_STOPWORDS["en"]
    toks = ws_tokens(F.col(text_col))
    t = df.select(F.col(id_col), F.posexplode(toks)).toDF(
        id_col, "pos", "w"
    ).filter(F.length("w") > 0)
    ns = t.filter(~F.col("w").isin(stopwords))
    wrun = Window.partitionBy(id_col).orderBy("pos")
    runs = ns.withColumn(
        "run", F.col("pos") - F.row_number().over(wrun)
    )
    phrases = (
        runs.groupBy(id_col, "run")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("pos", "w"))
                ).getField("w"),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("int").alias("n_words"),
        )
        .filter(F.col("n_words") <= max_words)
    )
    # corpus word stats over candidate-phrase members only
    members = runs.join(
        phrases.select(id_col, "run"), [id_col, "run"], "left_semi"
    ).join(
        phrases.select(
            id_col, "run", F.col("n_words").alias("__len")
        ),
        [id_col, "run"],
    )
    wstats = members.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("__len").cast("long").alias("deg"),
    ).withColumn(
        "wscore", F.expr("(deg * 1000000) DIV freq").cast("long")
    )
    from .core import broadcast_if_bounded

    ws_rel = wstats.select("w", "wscore")
    ws_h = (
        F.broadcast(ws_rel) if vocab_bound is None
        else broadcast_if_bounded(ws_rel, bound_rows=vocab_bound)
    )
    scored = (
        members.join(ws_h, "w")
        .groupBy(id_col, "run")
        .agg(F.sum("wscore").cast("long").alias("score_ppm"))
        .join(phrases, [id_col, "run"])
    )
    wtop = Window.partitionBy(id_col).orderBy(
        F.col("score_ppm").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wtop).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "phrase", "n_words", "score_ppm", "rank")
    )


# ------------------------------------------------------- URL canonical --
#: tracking query parameters stripped by canonicalize_url
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|mc_cid|mc_eid)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL form for dedup/blocklist keys, as ONE built-in
    column expression (no UDF): lowercase scheme+host, default ports
    stripped (:80 http / :443 https), fragment dropped, ONE trailing
    slash trimmed off the path, tracking query params (utm_*, fbclid,
    gclid, mc_*) removed, surviving params SORTED so param order never
    splits a dedup group. Crawl frontiers and near-dup URL grouping
    live on exactly this normalization; every step is deterministic
    string algebra, portable to any engine with regexp + array ops."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(
        path.endswith("/") & (F.length(path) > 1),
        F.substring(path, 1, F.length(path) - 1),
    ).when(path == "/", F.lit("")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qtail)


# ---------------------------------------------------------- readability --
def readability_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading ease in EXACT fixed point (milli-units): words =
    whitespace tokens of the normalized text, sentences = terminal
    [.!?] runs (min 1), syllables = vowel-group count ([aeiouy]+, the
    standard cheap approximation). fre_milli = 206835 −
    ⌊1015·W/S⌋ − ⌊84600·Y/W⌋ — all numerators non-negative so floor ==
    truncation in every engine and no float ever enters the score. The
    corpus-quality signal next to quality_features' ratios: prose
    scores 40-80k milli, templated/generated text drifts out the
    bottom. One projection, no shuffle."""
    t = normalize_text(F.col(text_col))
    words = F.size(F.split(t, " ")).cast("long")
    sentences = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)).cast("long"),
        F.lit(1).cast("long"),
    )
    syllables = F.size(
        F.regexp_extract_all(t, F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    base = df.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    )
    # integer DIV end to end — floor(double_div) can round a
    # just-under-integer quotient UP before flooring; DIV cannot
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(206835).cast("long")
            - F.expr("1015 * n_words DIV n_sentences")
            - F.expr("84600 * n_syllables DIV greatest(n_words, 1L)")
        ).cast("long").alias("fre_milli"),
    )
