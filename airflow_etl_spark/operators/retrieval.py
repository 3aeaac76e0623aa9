"""Corpus-statistics text operators: TF-IDF keywords, BM25 search, and a
corpus-trained bigram language-model quality score.

These extend the pure-expression text family (operators/text.py) with the
operators that need CORPUS statistics — document frequencies, average
document length, n-gram counts. They are the standard retrieval /
quality-filtering passes of a training-data pipeline (BM25 dataset search,
TF-IDF keyword extraction, perplexity-style LM filtering a la CCNet —
here the LM is trained on the corpus itself, so the whole pass is
deterministic and self-contained).

Scale design (the 100 TB story):
- Every operator is two phases: (1) build the statistics relations
  (token/bigram counts, document frequencies) with ONE map-side-combined
  groupBy over the exploded token stream; (2) join per-document term
  multiplicities against those statistics. The statistics relations are
  vocabulary-sized — orders of magnitude smaller than the corpus — so in
  production they are computed once, txn.commit'ed, and reused; the
  scoring join shuffles on the term key, which AQE handles (a genuinely
  hot term can be salted, but term-frequency skew is bounded because the
  per-doc side is pre-aggregated to (doc, term, multiplicity) first —
  one row per distinct term per doc, not per occurrence).
- Scalars (corpus size N, vocabulary size V, average doc length) ride a
  broadcast 1-row cross join — never a driver collect in the data path.
- No Python UDFs anywhere: tokenization and log-scoring are JVM column
  expressions inside whole-stage codegen.

Reference provenance: the reference has no retrieval layer (it is an ETL
warehouse); these operators belong to the extension surface mandated for
the training-data pipeline (BASELINE.json north star), with semantics
from the public BM25 (Robertson/Sparck Jones) and CCNet/KenLM filtering
literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import h28, let
from .text import ws_tokens

#: BM25 hyperparameters (the canonical Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) stream — one row per token occurrence."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(ws_tokens(text_col)).alias("term")
    )


def doc_term_freq(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf) — per-document term multiplicities. The map-side
    combine here is what bounds downstream join sizes: one row per
    DISTINCT term per doc."""
    return (
        _doc_tokens(df, text_col, id_col)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3,
    vocab_bound: int | None = None,
) -> DataFrame:
    """Top-k keywords per document by TF-IDF.

    score(d, t) = tf(d, t) * ln(N / df(t)); ties broken by term asc —
    fully deterministic. Returns (id, term, tfidf, rank).

    Plan: doc-term multiplicities (one groupBy) → document frequencies
    (one groupBy over the distinct doc-term pairs, vocabulary-sized
    result) → broadcast-join df(t) and N back onto the per-doc stream →
    per-doc top-k window. The window partitions by document id, so it
    rides the same hash partitioning as the doc-term aggregate.

    The df(t) relation is VOCAB-sized — Heaps-sublinear in the corpus,
    so forced broadcast (the default) holds far past any tested scale,
    but a web-scale corpus's term domain can outgrow the driver. Pass
    `vocab_bound` (a known/measured distinct-term bound) to make the
    hint adaptive (r12 broadcast audit): over the budget the df join
    becomes a shuffle join on the SAME term key the df aggregate
    already shuffled on.
    """
    from .core import broadcast_if_bounded

    dtf = doc_term_freq(df, text_col, id_col)
    n_docs = df.select(
        F.countDistinct(id_col).cast("double").alias("n_docs")
    )
    dfreq = dtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq_h = (
        F.broadcast(dfreq) if vocab_bound is None
        else broadcast_if_bounded(dfreq, bound_rows=vocab_bound)
    )
    scored = (
        dtf.join(dfreq_h, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k retrieval over the corpus for a bag of query terms.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)  (the Lucene-style
    always-positive variant). Returns (id, bm25, rank) for the top-k docs,
    ties broken by id asc.

    Plan: the query-term filter lands BEFORE the statistics joins, so only
    matching (doc, term) rows flow — the stream is O(postings of the query
    terms), not O(corpus tokens). df/avgdl/N are broadcast scalars.
    """
    dtf = doc_term_freq(df, text_col, id_col).filter(
        F.col("term").isin(query_terms)
    )
    dlen = df.select(
        F.col(id_col).alias("id"),
        F.size(ws_tokens(text_col)).cast("double").alias("dl"),
    )
    stats = df.select(
        F.countDistinct(id_col).cast("double").alias("n_docs"),
        F.avg(F.size(ws_tokens(text_col))).alias("avgdl"),
    )
    dfreq = dtf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    per_term = (
        dtf.join(F.broadcast(dfreq), "term")
        .join(dlen, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    scored = per_term.groupBy("id").agg(F.round(F.sum("s"), 4).alias("bm25"))
    # distributed top-k FIRST (TakeOrderedAndProject — per-partition heads
    # merged on the driver), then rank only the k survivors; a bare global
    # row_number() window would funnel every scored doc to one partition
    top = scored.orderBy(F.desc("bm25"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def hash_embedding(text: Column | str, dim: int = 16) -> Column:
    """Feature-hashing (hashing-trick) document embedding as ONE pure
    column expression: every token maps to bucket h28('b:'+tok) % dim
    with sign h28('s:'+tok) % 2 → ±1; bucket sums are L2-normalized.
    The classic Weinberger et al. featurizer — deterministic, vocabulary-
    free, engine-portable — and the self-contained way to give documents
    an embedding column for the similarity stack (cosine / LSH / IVF
    operators) without an external model.

    Plan shape: zero shuffle, O(dim × tokens) cheap comparisons per row
    after hashing each token ONCE (the per-token (bucket, sign) array is
    let()-bound; without it Catalyst re-evaluates the hashing inside all
    `dim` lambda bodies — the no-CSE-across-HOFs rule)."""
    toks = ws_tokens(text)
    tok_bs = F.transform(
        toks,
        lambda t: F.struct(
            (h28(F.concat(F.lit("b:"), t)) % dim).alias("b"),
            ((h28(F.concat(F.lit("s:"), t)) % 2) * 2 - 1)
            .cast("double")
            .alias("s"),
        ),
    )
    raw = let(
        tok_bs,
        lambda bs: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.aggregate(
                bs,
                F.lit(0.0),
                lambda acc, x: acc
                + F.when(x["b"] == i, x["s"]).otherwise(F.lit(0.0)),
            ),
        ),
    )
    return let(
        raw,
        lambda v: let(
            F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)),
            lambda nrm: F.transform(
                v,
                lambda x: F.round(
                    F.when(nrm > 0, x / nrm).otherwise(F.lit(0.0)), 4
                ),
            ),
        ),
    )


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    train_df: DataFrame | None = None,
    ngram_bound: int | None = None,
) -> DataFrame:
    """Corpus-trained bigram LM quality score (the CCNet/KenLM filtering
    idea, self-contained: the LM *is* the corpus's own bigram statistics,
    so no external model file and the result is deterministic).

    Per document: mean over its bigrams (w1, w2) of
        ln( (C(w1 w2) + 1) / (C(w1) + V) )        [Laplace smoothing]
    where C are corpus counts and V the corpus vocabulary size. Higher =
    more typical of the corpus; the quality filter drops the low tail
    (gibberish scores low because its bigrams are unseen). Documents with
    fewer than 2 tokens have no bigrams and are excluded.

    Returns (id, n_bigrams, lm_score).

    Plan: one exploded bigram stream feeds BOTH the corpus counts (groupBy
    (w1, w2), vocab²-bounded) and the per-doc multiplicities (groupBy
    (id, w1, w2)); unigram counts and V come from the token stream. The
    scoring join is per-doc-distinct-bigram vs the count relations —
    both count relations are vocabulary-scale and broadcast.

    `train_df` trains the LM on a DIFFERENT corpus than the one scored
    (cross-split scoring — the train/test-leakage probe): counts and V
    come from train_df, scored bigrams unseen in training contribute the
    Laplace floor ln(1 / (C(w1) + V)) via left joins (coalesce to 0).
    With train_df=None (the default) every scored bigram exists in the
    counts, so the left joins reduce to the original inner semantics.

    `ngram_bound` (r12 broadcast audit): a known/measured bound on the
    OBSERVED distinct bigram count (which also bounds the unigram
    count) makes both count-relation hints adaptive — over the budget
    they become shuffle joins on the same n-gram keys their aggregates
    already shuffled on. Default None keeps the forced broadcast
    (Heaps-sublinear vocab — fine far past any tested scale).
    """

    def _toks(frame: DataFrame) -> DataFrame:
        return frame.select(
            F.col(id_col).alias("id"), ws_tokens(text_col).alias("t")
        )

    def _bigrams(tok_df: DataFrame) -> DataFrame:
        return tok_df.filter(F.size("t") >= 2).select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg"),
        ).select("id", "bg.w1", "bg.w2")

    toks = _toks(df)
    train_toks = toks if train_df is None else _toks(train_df)
    doc_bg = _bigrams(toks).groupBy("id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    corpus_bg = _bigrams(train_toks).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bg")
    )
    unigrams = train_toks.select(F.explode("t").alias("w1"))
    corpus_uni = unigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_uni"))
    vocab = unigrams.select(
        F.countDistinct("w1").cast("double").alias("v")
    )
    from .core import broadcast_if_bounded

    if ngram_bound is None:
        bg_h, uni_h = F.broadcast(corpus_bg), F.broadcast(corpus_uni)
    else:
        bg_h = broadcast_if_bounded(corpus_bg, bound_rows=ngram_bound)
        uni_h = broadcast_if_bounded(corpus_uni, bound_rows=ngram_bound)
    scored = (
        doc_bg.join(bg_h, ["w1", "w2"], "left")
        .join(uni_h, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "m",
            (
                F.col("m")
                * F.log(
                    (F.coalesce(F.col("c_bg"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("c_uni"), F.lit(0)) + F.col("v"))
                )
            ).alias("ll"),
        )
    )
    return scored.groupBy("id").agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        F.round(F.sum("ll") / F.sum("m"), 4).alias("lm_score"),
    )


#: Canonical RRF dampening constant (Cormack/Clarke/Buettcher 2009).
RRF_K = 60


def rrf_fuse(
    rankings: list[DataFrame],
    names: list[str] | None = None,
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 10,
    k_rrf: int = RRF_K,
    digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N independent rankings (hybrid retrieval).

    score(d) = sum over rankings r of 1 / (k_rrf + rank_r(d)), summed in
    the ORDER the rankings are passed (fixed-order IEEE addition over
    integer-derived terms — bit-identical in any engine, then rounded).
    Documents absent from a ranking contribute 0 for it. Returns the
    top-`k` ids by (rrf desc, id asc) with each source rank carried
    through as a nullable `rank_<name>` column.

    This is the standard lexical+semantic fusion step of a RAG /
    dataset-search stack (BM25 postings ranking fused with an ANN
    cosine ranking): rank-space fusion needs no score calibration
    between the two retrievers, which is exactly why RRF is the
    default in hybrid search engines.

    Plan shape: each input ranking is top-k'-sized (tiny — the k' of
    its retriever), so the N-way full outer join is a broadcast-able
    join of bounded relations; the corpus itself never flows through
    this operator. Scale lives in the upstream retrievers (bm25_search's
    postings-bounded scan, similarity's cell-bounded ANN).

    Reference provenance: no retrieval layer in the reference (Airflow
    ETL warehouse) — extension surface per the training-data-pipeline
    mandate; semantics from the public RRF literature (TREC).
    """
    if names is None:
        names = [f"r{i}" for i in range(len(rankings))]
    if len(names) != len(rankings):
        raise ValueError("names must parallel rankings")
    pruned = [
        r.select(
            F.col(id_col).alias("id"),
            F.col(rank_col).cast("int").alias(f"rank_{n}"),
        )
        for r, n in zip(rankings, names)
    ]
    fused = pruned[0]
    for nxt in pruned[1:]:
        fused = fused.join(nxt, "id", "full_outer")
    score = None
    for n in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"rank_{n}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    scored = fused.withColumn("rrf", F.round(score, digits))
    top = scored.orderBy(F.desc("rrf"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("rrf"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


# ------------------------------------------------ trigram substring index --
def trigram_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct (trigram, id) postings over normalized text — the
    pg_trgm-style index relation that turns `LIKE '%pattern%'` from a
    full-corpus scan into a posting intersection. One explode + one
    distinct exchange to build; production persists it as a txn table
    (the sim_ivf_persisted build-once/probe-many pattern) and maintains
    it incrementally with O(batch) appends."""
    from .dedup import let
    from .text import normalize_text

    # let-bind: referenced inside the per-trigram lambda, the regex
    # normalization would re-run once per CHARACTER of the document —
    # no CSE across HOF lambda bodies (measured 3.3x at sf0.1)
    grams = let(
        normalize_text(F.col(text_col)),
        lambda n: F.when(
            F.length(n) >= 3,
            # sequence() DESCENDS when start > stop — the >=3 guard keeps
            # it ascending (1-element texts would otherwise explode OOB)
            F.transform(
                F.sequence(F.lit(0), F.length(n) - F.lit(3)),
                lambda i: F.substr(n, i + F.lit(1), F.lit(3)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("trigram"))
        .distinct()
    )


def trigram_search(
    postings: DataFrame,
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring search through the trigram index: candidate ids must
    carry EVERY distinct trigram of the (normalized) pattern — an
    equi-join on the pattern's trigrams plus a count-distinct HAVING —
    then only candidates pay the exact `contains` verify. No false
    negatives (a true match contains every pattern trigram by
    definition); false candidates are culled by the verify. Cost is
    bounded by the rarest pattern trigram's posting list, never the
    corpus. Patterns shorter than 3 normalized chars have no trigrams
    to anchor on and raise rather than silently scanning."""
    import re as _re

    norm = _re.sub(r"\s+", " ", pattern.lower()).strip()
    pats = sorted({norm[i : i + 3] for i in range(len(norm) - 2)})
    if not pats:
        raise ValueError(
            f"pattern {pattern!r} normalizes to <3 chars — a trigram "
            "index cannot anchor it; use a full scan explicitly"
        )
    from .text import normalize_text

    cand = (
        postings.filter(F.col("trigram").isin(pats))
        .groupBy(id_col)
        .agg(F.countDistinct("trigram").alias("__k"))
        .filter(F.col("__k") == len(pats))
        .select(id_col)
    )
    return (
        docs.join(cand, id_col, "left_semi")
        .filter(F.contains(normalize_text(F.col(text_col)), F.lit(norm)))
    )


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, token) positional posting relation over normalized
    whitespace tokens — the inverted-index level that answers exact
    PHRASE queries (trigram postings answer substring, BM25 postings
    answer bag-of-words; neither sees adjacency). One explode, no
    distinct: positions are the payload. Production persists it as a
    txn table partitioned by token-hash (build-once/probe-many,
    O(batch) incremental appends)."""
    from .text import normalize_text

    toks = F.split(normalize_text(F.col(text_col)), " ")
    return df.select(F.col(id_col), F.posexplode(toks)).toDF(
        id_col, "pos", "token"
    )


def phrase_search(
    postings: DataFrame, phrase: str, id_col: str = "doc_id"
) -> DataFrame:
    """Exact phrase occurrence count per document via ANCHOR VOTING:
    an occurrence of phrase word i at position p votes for anchor
    p - i; an anchor collecting all k DISTINCT offsets is a phrase hit.
    ONE filtered aggregation — no k-way positional self-join, and the
    only rows that ever shuffle are postings of the phrase's own words
    (bounded by their document frequency), never the corpus. Repeated
    phrase words are correct by construction: a position serves every
    offset the word occupies, and distinct-offset counting demands all
    k. Overlapping occurrences count separately (anchor semantics).

    Returns (id, n_hits) for documents with >= 1 occurrence."""
    import re as _re

    words = _re.sub(r"\s+", " ", phrase.lower()).strip().split(" ")
    k = len(words)
    if k < 2:
        raise ValueError(
            f"phrase {phrase!r} has < 2 words — use a token lookup, not "
            "a phrase scan"
        )
    spark = postings.sparkSession
    offsets = spark.createDataFrame(
        [(w, i) for i, w in enumerate(words)], "token string, __off int"
    )
    anchors = (
        postings.filter(F.col("token").isin(words))
        .join(F.broadcast(offsets), "token")
        .select(
            F.col(id_col),
            (F.col("pos") - F.col("__off")).alias("__anchor"),
            "__off",
        )
        .filter(F.col("__anchor") >= 0)
    )
    return (
        anchors.groupBy(id_col, "__anchor")
        .agg(F.countDistinct("__off").alias("__nw"))
        .filter(F.col("__nw") == k)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
