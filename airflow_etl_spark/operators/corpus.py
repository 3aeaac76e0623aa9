"""Training-corpus assembly operators — the steps between "deduped
documents" and "token stream a trainer reads": deterministic splits,
stratified sampling, sequence packing, mixture re-weighting, and
train/test contamination checks.

The reference stops at warehouse tables; these extend the engine for the
LLM-data-pipeline workload (brief: first-class alongside SURVEY §2).
Every operator is a pure projection / standard shuffle over built-in
expressions — no UDFs, no driver loops — and every randomized decision
is a salted md5 hash of the row's id (`dedup.h28`), so results are
engine-portable (DuckDB oracle), reproducible across runs/cluster sizes,
and stable under repartitioning — properties random() cannot give at
100 TB (a retry or a different partitioning would reshuffle every
"random" decision).

Scale notes per operator live on the functions; the common theme:
assignment columns are O(1) expressions per row, groupings shuffle once
on their natural key, and the only window (sequence packing) partitions
by an explicit shard column so the cumulative sum parallelizes instead
of collapsing onto one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import h28, normalize_text, shingle_hashes

#: h28 yields 28-bit ints; dividing by 2^28 gives a uniform [0, 1) frac.
_H28_SPACE = float(2 ** 28)


def hash_frac(col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) fraction per value: salted md5 → 28-bit
    int → scale. The salt decorrelates decisions (split vs sample vs
    shard) made over the same ids."""
    return h28(F.concat(F.lit(salt + ":"), col.cast("string"))) / F.lit(_H28_SPACE)


def split_thresholds(splits: tuple) -> list[tuple[str, float]]:
    """Cumulative [0,1) thresholds for all but the last split. Shared by
    hash_split AND the oracle-SQL builders so both engines compare the
    hash fraction against BIT-IDENTICAL double literals (re-deriving the
    accumulation in SQL risks a one-ULP boundary disagreement)."""
    total = sum(w for _name, w in splits)
    acc, out = 0.0, []
    for name, w in splits[:-1]:
        acc += w / total
        out.append((name, acc))
    return out


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple = (("train", 0.98), ("val", 0.01), ("test", 0.01)),
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split by hashed id.

    The industry-standard split move for 100 TB corpora: a pure
    projection (zero shuffle, zero state), stable when the corpus grows
    (old rows keep their split; only new ids draw new assignments), and
    leak-proof under re-runs — unlike random() splits, which reshuffle on
    every retry and silently leak val into train. Weights need not sum to
    1; they are normalized."""
    frac = hash_frac(F.col(id_col), salt)
    expr = None
    for name, cum in split_thresholds(splits):
        cond = frac < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-group deterministic fraction of rows (down-sample
    over-represented languages/sources while keeping the tail).

    A filter over a salted hash — no shuffle, no sampling state, exact
    reproducibility. Groups absent from `fractions` keep
    `default_fraction` (0 drops them)."""
    frac = hash_frac(F.col(id_col), salt)
    thresh = None
    for g, f in sorted(fractions.items()):
        cond = F.col(group_col) == g
        thresh = F.when(cond, F.lit(f)) if thresh is None else thresh.when(cond, F.lit(f))
    thresh = (
        F.lit(default_fraction) if thresh is None
        else thresh.otherwise(F.lit(default_fraction))
    )
    return df.filter(frac < thresh)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end and
    cut the stream every `budget` tokens — each doc gets the bin that
    contains its FIRST token plus its offset inside that bin (GPT-style
    pretraining packing; a doc may span into the next bin, which the
    trainer's chunker handles by construction).

    The global "lay end-to-end" order is the scale trap: one total-order
    cumulative sum is a single-partition window. Instead documents
    hash-shard first (`n_shards` independent streams — exactly how
    distributed packers run), and the cumsum windows partition by shard:
    N parallel prefix sums, each over corpus/N rows, one shuffle total.
    Output: (id, shard, bin_id, bin_offset, n_tokens); bin ids are
    per-shard."""
    shard = F.pmod(
        h28(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    )
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return out.select(
        F.col(id_col),
        "shard",
        F.floor(cum_before / F.lit(budget)).alias("bin_id"),
        (cum_before % F.lit(budget)).alias("bin_offset"),
        F.col(token_col).alias("n_tokens"),
    )


def pack_sequences_ffd(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """First-fit-decreasing bin packing per shard — the HIGH-UTILIZATION
    packing variant: docs sort by token count descending and each takes
    the first bin with room, so bins waste far less tail space than
    concat-and-chunk (pack_sequences) at the cost of not preserving
    document order. Docs larger than the budget get a singleton bin.

    FFD is inherently sequential, so it runs per shard inside
    applyInPandas (Arrow-batched — the sanctioned custom-operator escape
    hatch): shards hash-partition the corpus into n_shards independent
    packing problems, each a single-pass greedy over its partition. One
    shuffle total; state per task is the shard's open-bin heap, O(bins).
    Deterministic: shard assignment is the salted id hash, the greedy
    orders by (tokens desc, id) — stable under any input partitioning.

    Output: (id, shard, bin_id, n_tokens, bin_fill) where bin_fill is the
    bin's final token total (= utilization evidence)."""
    import pandas as pd

    shard = F.pmod(
        h28(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    )
    narrow = df.select(
        F.col(id_col).alias("_id"),
        F.col(token_col).cast("long").alias("_tok"),
        shard.alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["_tok", "_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bins: list[int] = []  # bin -> used tokens
        assign = []
        for tok in pdf["_tok"]:
            placed = None
            for b, used in enumerate(bins):
                if used + tok <= budget:
                    placed = b
                    bins[b] = used + tok
                    break
            if placed is None:
                placed = len(bins)  # no room anywhere (or oversized doc)
                bins.append(tok)
            assign.append(placed)
        out = pdf.assign(bin_id=assign)
        out["bin_fill"] = out["bin_id"].map(lambda b: bins[b])
        return out

    schema = "_id long, _tok long, shard long, bin_id long, bin_fill long"
    packed = narrow.groupBy("shard").applyInPandas(pack, schema=schema)
    return packed.select(
        F.col("_id").alias(id_col),
        "shard",
        "bin_id",
        F.col("_tok").alias("n_tokens"),
        "bin_fill",
    )


def mixture_weights(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    target_shares: dict[str, float],
    digits: int = 6,
) -> DataFrame:
    """Per-domain sampling weights to move the corpus toward a target
    token mixture: weight = target_share / actual_share (>1 upsample,
    <1 downsample). One map-side-combinable aggregation over the corpus;
    the result is domain-count sized (control-plane). Domains without a
    target get weight 0 (excluded from the mix). Shares are rounded for
    engine-portable comparison."""
    totals = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(token_col).cast("long").alias("n_tokens")
    )
    grand = Window.partitionBy()
    tgt = None
    for d, s in sorted(target_shares.items()):
        cond = F.col("domain") == d
        tgt = F.when(cond, F.lit(s)) if tgt is None else tgt.when(cond, F.lit(s))
    tgt = F.lit(0.0) if tgt is None else tgt.otherwise(F.lit(0.0))
    share = F.col("n_tokens") / F.sum("n_tokens").over(grand)
    return totals.select(
        "domain",
        "n_tokens",
        F.round(share, digits).alias("corpus_share"),
        F.round(tgt, digits).alias("target_share"),
        F.round(tgt / share, digits).alias("weight"),
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb/C4 anti-spam rule): keep at
    most `cap` documents per domain, preferring the best by `order_col`
    descending (e.g. a quality score), ties broken by ascending id —
    fully deterministic.

    Skew-safe two-phase ranking: a plain window over the domain would put
    a mega-domain (the web's most-crawled hosts are exactly the ones
    being capped) on ONE task. Phase 1 salts each domain into `n_salts`
    buckets and keeps at most `cap` per (domain, salt) — every task's
    partition is corpus/n_salts-bounded, and the survivors per domain are
    bounded by n_salts*cap regardless of how large the domain is. Phase 2
    ranks exactly over those <= n_salts*cap survivors. Both shuffles are
    hash exchanges on (domain[, salt]); nothing corpus-sized broadcasts.
    The result is IDENTICAL to the single-window ranking (phase 1 can
    never drop a doc that the exact top-cap would keep, because a doc
    outranked by `cap` others within its own salt bucket is outranked by
    `cap` others in the full domain too)."""
    order = (
        [F.desc(order_col), F.asc(id_col)]
        if order_col
        else [F.asc(id_col)]
    )
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts))
    pre = df.withColumn("__salt", salt)
    w1 = Window.partitionBy(domain_col, "__salt").orderBy(*order)
    survivors = (
        pre.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= cap)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    return (
        survivors.withColumn("domain_rank", F.row_number().over(w2))
        .filter(F.col("domain_rank") <= cap)
    )


def exact_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Test docs whose normalized text appears verbatim in train — the
    first-line train/test leak check. Fingerprint both sides (md5 of
    normalized text — a projection), LEFT SEMI join test→train on the
    fingerprint: one equi-join shuffle on a 16-byte key, never text
    comparison. Returns (id, contaminated 0/1) for every test doc."""
    fp = lambda d: d.select(  # noqa: E731
        F.col(id_col), F.md5(normalize_text(text_col)).alias("fp")
    )
    hits = (
        fp(test).join(fp(train).select("fp").distinct(), "fp", "left_semi")
        .select(id_col)
    )
    return (
        test.select(id_col)
        .join(hits.withColumn("contaminated", F.lit(1)), id_col, "left")
        .select(id_col, F.coalesce("contaminated", F.lit(0)).alias("contaminated"))
    )


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 4,
) -> DataFrame:
    """Shingle-level contamination: the fraction of each test doc's
    distinct word n-grams that occur ANYWHERE in train (the standard
    n-gram-overlap decontamination metric). Shingles hash to h28 ints
    before the join, so the shuffle moves longs, not strings; the train
    side is a distinct hash set (map-side combinable); overlap is a
    semi-join + per-doc count. Everything shuffles on the shingle hash —
    no all-pairs, no broadcast of the big side."""
    test_sh = test.select(
        F.col(id_col),
        F.explode(shingle_hashes(text_col, n)).alias("sh"),
    ).distinct()
    train_sh = (
        train.select(F.explode(shingle_hashes(text_col, n)).alias("sh"))
        .distinct()
    )
    totals = test_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        test_sh.join(train_sh, "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_shingles"), digits
            ).alias("overlap"),
        )
    )


# --------------------------------------------------------------------------
# DSIR-style importance weighting (data selection)
# --------------------------------------------------------------------------

#: Feature-hash dimensionality for the DSIR bag-of-hashed-unigrams
#: distributions. Small on purpose: the two distribution relations are
#: D rows each — broadcast scalars relative to the corpus.
DSIR_DIM = 256

#: Fixed-point scale for per-feature log-ratios. Per-document totals sum
#: BIGINT fixed-point values, so the aggregation is EXACT and order-
#: independent — a double SUM would make the rounded weight depend on
#: partition merge order (see the engine-parity note in queries.py).
_DSIR_FP = 1_000_000


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DSIR_DIM,
    keep_frac: float = 0.25,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023):
    score every raw document by how much it resembles a target corpus,
    using hashed n-gram (here: unigram) bag distributions.

    weight(doc) = mean over tokens of ln(p_target(f) / p_raw(f)), with
    f = h28(token) % dim and both distributions add-one smoothed. Rows
    where `is_target` is true define the target distribution; the raw
    distribution is the whole input. Returns one row per document:
    (id, n_tokens, dsir_logw, selected) — `selected` keeps the top
    `keep_frac` of the corpus by weight (weights are RELATIVE: add-one
    smoothing shifts the zero point, so selection must be by rank /
    resampling, never by sign). A real pipeline resamples
    proportionally to exp(logw); the percentile cut is the
    deterministic equivalent used here.

    Plan shape (the 100 TB story): ONE explode of the corpus token
    stream feeds a single conditional groupBy producing BOTH
    distributions as one dim-row relation; per-doc scoring broadcast-
    joins that relation back onto the stream and sums EXACT fixed-point
    log-ratios per doc (no double-accumulation order sensitivity), then
    normalizes by doc length. Two shuffles total (feature agg, per-doc
    agg), both on natural keys; nothing corpus-sized ever broadcasts.
    """
    from .text import ws_tokens

    toks = df.select(
        F.col(id_col).alias("id"),
        is_target.alias("is_t"),
        F.explode(ws_tokens(text_col)).alias("term"),
    ).select("id", "is_t", (h28(F.col("term")) % dim).alias("f"))

    stats = toks.groupBy("f").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("c_t"),
    )
    totals = stats.select(
        F.sum("c_raw").cast("double").alias("n_raw"),
        F.sum("c_t").cast("double").alias("n_t"),
    )
    # per-feature fixed-point log-ratio: round(ln * FP) to a BIGINT once,
    # per feature — every downstream sum is integer-exact
    lr = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "f",
            F.round(
                F.log(
                    ((F.col("c_t") + 1.0) / (F.col("n_t") + float(dim)))
                    / ((F.col("c_raw") + 1.0) / (F.col("n_raw") + float(dim)))
                )
                * float(_DSIR_FP),
                0,
            )
            .cast("long")
            .alias("lr_fp"),
        )
    )
    per_doc = (
        toks.join(F.broadcast(lr), "f")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lr_fp").alias("lr_sum"),
        )
    )
    weighted = per_doc.select(
        "id",
        "n_tokens",
        F.round(
            F.col("lr_sum").cast("double")
            / float(_DSIR_FP)
            / F.col("n_tokens").cast("double"),
            4,
        ).alias("dsir_logw"),
    )
    # persist boundary: the threshold aggregate references the same
    # relation as the output — without it Catalyst expands the full
    # explode→stats→score pipeline TWICE (two corpus scans; seen in the
    # formatted plan). The weighted relation is doc-count-sized (3 narrow
    # columns), far smaller than the corpus it summarizes.
    weighted = weighted.persist()
    thr = weighted.agg(
        F.expr(f"percentile(dsir_logw, {1.0 - keep_frac!r})").alias("__thr")
    )
    return (
        weighted.crossJoin(F.broadcast(thr))
        .withColumn("selected", F.col("dsir_logw") >= F.col("__thr"))
        .drop("__thr")
    )


def span_dup_stats(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_frac: float = 0.5,
) -> DataFrame:
    """Cross-document repeated-span profiling — the n-gram-granularity
    form of exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    the fraction of its distinct word n-gram spans that occur in at
    least one OTHER document. Docs past `flag_frac` are boilerplate /
    template shells that survive doc-level dedup because their full
    text differs.

    Returns (id, n_spans, n_shared, shared_frac, flagged).

    Plan: one explode of per-doc distinct span hashes (longs, never
    text) → span-frequency relation keyed by hash → equi-join back on
    the hash → per-doc aggregate. Two shuffles on natural keys; the
    span-vocabulary relation is produced by a map-side-combinable count
    and is never broadcast or collected. The true suffix-array method
    dedups at arbitrary byte offsets; fixed-n spans are the standard
    distributed approximation (a duplicated run of >= n tokens always
    shares full n-gram spans, so recall for long duplicated runs is 1).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(text_col, n)).alias("h"),
    )
    counts = sh.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    shared = (F.col("nd") >= 2).cast("int")
    frac = F.round(
        F.sum(shared) / F.count(F.lit(1)), 4
    )
    return (
        sh.join(counts, "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(shared).cast("long").alias("n_shared"),
            frac.alias("shared_frac"),
        )
        .withColumn("flagged", F.col("shared_frac") >= F.lit(flag_frac))
    )


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the step that turns a
    curated corpus into the randomized, evenly-sized shards a trainer
    streams (every pretraining run needs one; see e.g. T5/GPT data
    pipelines' shard-shuffle stage).

    Each row gets `shuffle_key` (salted portable hash of its id),
    `shard = key % n_shards`, and `pos` (its rank inside the shard,
    ordered by key with the id as tiebreak). Reading shards in shard/pos
    order yields a reproducible uniform permutation of the corpus.

    Scale shape: the key/shard columns are a pure projection; the ONLY
    shuffle is the single hash exchange on `shard`, and the within-shard
    sort runs inside each reducer task (no global sort, no driver).
    Set n_shards to the target output file count (e.g. ~100k at 100 TB
    → ~1 GB shards), which also sets the reduce-side parallelism.
    Contrast the naive `orderBy(rand())`: not reproducible across
    retries, and a global range sort that needs a sampling pass. Being
    hash-of-id based, the permutation is stable under repartitioning,
    retries, and corpus growth (old rows keep their position stream).

    PRECONDITION: `id_col` must be unique. Duplicate ids tie on BOTH
    window sort keys (shuffle_key is a function of id), so their
    relative `pos` would be whatever order the shuffle happened to
    deliver — nondeterministic across retries. Dedup first (the normal
    pipeline order), or pass a composite id (e.g. doc_id + copy_idx
    when shuffling an epoch_plan expansion).
    """
    key = h28(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    out = df.withColumn("shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return out.withColumn("pos", F.row_number().over(w).cast("long"))


def epoch_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    salt: str = "epoch-v1",
) -> DataFrame:
    """Repetition-aware upsampling plan: materialize one row per copy a
    doc contributes to the training stream, where a fractional mixture
    weight w yields floor(w) copies plus one more iff the doc's salted
    hash fraction falls below frac(w) — so a domain weighted 2.3 is seen
    ~2.3 times per epoch in expectation, with EXACTLY reproducible
    per-doc decisions (a retry or cluster resize re-derives the same
    plan; random() would re-roll every doc).

    Scale shape: zero shuffles — a pure projection plus an explode whose
    output size is sum(weights) rows, i.e. the true size of the training
    plan itself. Compose with global_shuffle (id_col = doc_id + copy_idx)
    to interleave the copies across shards so repeated docs don't sit
    adjacent in the stream.
    """
    w = F.col(weight_col).cast("double")
    extra = (hash_frac(F.col(id_col), salt) < (w - F.floor(w))).cast("long")
    out = df.withColumn(
        "n_copies", (F.floor(w).cast("long") + extra)
    ).where(F.col("n_copies") > 0)
    return out.withColumn(
        "copy_idx", F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies")))
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    score_digits: int | None = None,
    max_score_buckets: int | None = 1_000_000,
) -> DataFrame:
    """Select the best documents until a token budget is exhausted —
    "take the top of the corpus by quality score until N tokens", the
    data-selection primitive behind fixed-budget pretraining mixes.
    Semantics: keep a doc iff the cumulative token sum over the global
    (score DESC, id) ordering is <= budget (ties broken by id, so the
    cut is deterministic and reproducible).

    Scale shape — the naive form is a cumulative-sum window over the
    whole corpus in one global order, i.e. a SinglePartition window:
    unusable at 100 TB. This implementation never globally sorts the
    corpus: (1) one map-side-combinable groupBy(score) builds the
    score-distinct relation, (2) the running total over SCORES runs as
    a window over that small relation (scores are score-granularity-
    bounded — thousands, not billions), (3) the per-score quota
    broadcasts back and only the boundary score's docs need a
    per-bucket (partitioned, not global) cumsum to place the cut.
    Output matches the naive semantics row-for-row, including `cum`,
    the global running total.

    The scale guarantee is CONTINGENT on bounded score cardinality: a
    continuous score column (raw LM log-perplexities) makes the "small"
    score relation corpus-sized — the broadcast explodes and the
    score-window degenerates into the global sort this operator exists
    to avoid. Two enforcement knobs:

    - `score_digits`: round the score to this many decimal digits
      before selecting (quantizes a continuous score into bounded
      bands; the output `score_col` carries the rounded value, and the
      budget cut is taken over the quantized ordering).
    - `max_score_buckets` (default 1e6): fail LOUDLY — one cheap
      map-side-combinable `approx_count_distinct` pre-check — instead
      of silently building a corpus-sized broadcast. 1e6 buckets is a
      ~16 MB broadcast and a single-task window over 1e6 rows: the
      safe ceiling. Pass None to skip the pre-check job when the score
      is known-bounded (e.g. an integer band)."""
    if score_digits is not None:
        df = df.withColumn(
            score_col, F.round(F.col(score_col).cast("double"), score_digits)
        )
    if max_score_buckets is not None:
        n_approx = df.agg(
            F.approx_count_distinct(score_col).alias("n")
        ).collect()[0]["n"]
        if n_approx > max_score_buckets:
            raise ValueError(
                f"token_budget_select: ~{n_approx} distinct values in "
                f"{score_col!r} exceeds max_score_buckets="
                f"{max_score_buckets}; a near-continuous score degrades "
                "this into a corpus-sized broadcast + global sort. Pass "
                "score_digits= to quantize the score into bounded bands, "
                "or raise/disable max_score_buckets if the cardinality "
                "is genuinely acceptable."
            )
    buckets = df.groupBy(score_col).agg(
        F.sum(token_col).cast("long").alias("bucket_tokens")
    )
    ws = Window.orderBy(F.col(score_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = buckets.withColumn(
        "cum_before", F.coalesce(F.sum("bucket_tokens").over(ws), F.lit(0))
    )
    joined = df.join(
        F.broadcast(cum.select(score_col, "cum_before")), score_col
    )
    wb = (
        Window.partitionBy(score_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn(
        "cum",
        (F.col("cum_before") + F.sum(token_col).over(wb)).cast("long"),
    )
    return out.where(F.col("cum") <= F.lit(budget)).drop("cum_before")


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    alpha: float = 0.3,
    digits: int = 6,
) -> DataFrame:
    """Temperature-scaled sampling mixture (the multilingual-pretraining
    standard, e.g. mBERT/XLM-R/mT5's alpha-sampling): sampled share of
    domain i is share_i^alpha / sum_j share_j^alpha. alpha=1 keeps the
    natural mixture, alpha->0 approaches uniform — the knob that keeps
    tail languages/domains from drowning.

    Returns (domain, n_tokens, corpus_share, sampled_share, weight) with
    weight = sampled_share / corpus_share (the per-domain up/down-sample
    factor a sampler applies). One map-side-combinable aggregation; the
    result relation is domain-count sized (control plane). The share
    normalization runs as a second tiny aggregate over the domain
    relation, never over the corpus. Domains whose token sum is zero
    are dropped before the share computation: they contribute nothing
    to the mixture and would otherwise yield a 0/0 weight row.
    """
    totals = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(token_col).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    grand = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(grand)
    powed = totals.select(
        "domain", "n_tokens", share.alias("corpus_share"),
        F.pow(share, F.lit(alpha)).alias("p"),
    )
    sampled = F.col("p") / F.sum("p").over(grand)
    return powed.select(
        "domain",
        "n_tokens",
        F.round("corpus_share", digits).alias("corpus_share"),
        F.round(sampled, digits).alias("sampled_share"),
        F.round(sampled / F.col("corpus_share"), digits).alias("weight"),
    )


def assign_global_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "ids-v1",
) -> DataFrame:
    """Contiguous deterministic global row ids WITHOUT a global sort —
    the id-assignment step for building row-aligned artifacts (embedding
    matrices, ANN index rows, token-offset files) over a corpus.

    Built on global_shuffle's (shard, pos): per-shard row counts (an
    n_shards-row control-plane relation) become cumulative offsets, and
    gid = offset[shard] + pos - 1 — contiguous 0..N-1, reproducible
    across runs/retries/partitionings (same unique-id precondition as
    global_shuffle). Equivalent naive plan: row_number() OVER (ORDER BY
    hash) — a SinglePartition global sort; here the corpus pays ONE hash
    exchange and the only window runs over the n_shards-row counts
    relation. monotonically_increasing_id() is the no-shuffle
    alternative but is neither contiguous nor stable across runs.

    Returns df's id column plus (shard, pos, gid)."""
    sh = global_shuffle(df.select(id_col), id_col, n_shards, salt)
    counts = sh.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    wo = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("n").over(wo), F.lit(0)).cast("long")
    ).select("shard", "offset")
    return (
        sh.join(F.broadcast(offsets), "shard")
        .select(
            id_col,
            "shard",
            "pos",
            (F.col("offset") + F.col("pos") - 1).cast("long").alias("gid"),
        )
    )


def token_budget_by_domain(
    df: DataFrame,
    total_budget: int,
    domain_col: str = "domain",
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    alpha: float = 0.3,
    score_digits: int | None = None,
    max_score_buckets: int | None = 1_000_000,
) -> DataFrame:
    """Build a fixed-token-budget TRAINING MIX in one relation: split
    `total_budget` across domains by the temperature mixture
    (`temperature_mixture`, sampled_share × budget per domain), then
    select each domain's best documents by score until its budget is
    exhausted — the "decide the mixture, then fill each bucket with the
    best data" recipe fixed-budget pretraining uses.

    Semantics per domain = token_budget_select's: keep a doc iff the
    cumulative token sum over the (score DESC, id) ordering within its
    domain stays <= the domain budget (floor(sampled_share *
    total_budget)); `cum` is the running total within the domain.

    Scale shape: token_budget_select's score-distinct trick with every
    window ADDITIONALLY partitioned by domain — the (domain, score)
    bucket relation stays control-plane sized, the running-total window
    partitions by domain (parallel across domains, never a global
    sort), and the per-boundary-bucket cumsum partitions by
    (domain, score). Same bounded-score-cardinality precondition as
    token_budget_select, enforced the same way: `score_digits`
    quantizes a continuous score, and `max_score_buckets` fails loudly
    (one approx_count_distinct pre-check over the (domain, score)
    pairs) before a corpus-sized bucket relation can broadcast."""
    if score_digits is not None:
        df = df.withColumn(
            score_col, F.round(F.col(score_col).cast("double"), score_digits)
        )
    if max_score_buckets is not None:
        n_approx = df.agg(
            F.approx_count_distinct(
                F.concat_ws("\x00", F.col(domain_col), F.col(score_col))
            ).alias("n")
        ).collect()[0]["n"]
        if n_approx > max_score_buckets:
            raise ValueError(
                f"token_budget_by_domain: ~{n_approx} distinct "
                f"({domain_col}, {score_col}) pairs exceeds "
                f"max_score_buckets={max_score_buckets}; pass "
                "score_digits= to quantize, or raise/disable the ceiling."
            )
    mix = temperature_mixture(df, domain_col, token_col, alpha=alpha)
    budgets = mix.select(
        F.col("domain").alias(domain_col),
        F.floor(F.col("sampled_share") * F.lit(float(total_budget)))
        .cast("long")
        .alias("__budget"),
    )
    buckets = df.groupBy(domain_col, score_col).agg(
        F.sum(token_col).cast("long").alias("bucket_tokens")
    )
    ws = (
        Window.partitionBy(domain_col)
        .orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = buckets.withColumn(
        "__cum_before", F.coalesce(F.sum("bucket_tokens").over(ws), F.lit(0))
    )
    joined = df.join(
        F.broadcast(cum.select(domain_col, score_col, "__cum_before")),
        [domain_col, score_col],
    ).join(F.broadcast(budgets), domain_col)
    wb = (
        Window.partitionBy(domain_col, score_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn(
        "cum",
        (F.col("__cum_before") + F.sum(token_col).over(wb)).cast("long"),
    )
    return (
        out.where(F.col("cum") <= F.col("__budget"))
        .withColumn("domain_budget", F.col("__budget"))
        .drop("__cum_before", "__budget")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str = "score",
    n_bands: int = 4,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "curric-v1",
    score_digits: int | None = None,
    max_score_buckets: int | None = 1_000_000,
) -> DataFrame:
    """Curriculum schedule: order the training stream by quality band
    (exact score quantiles → `n_bands` bands, band 0 = highest score),
    deterministically shuffled WITHIN each band — the easy-to-hard (or
    clean-to-noisy) curriculum, reproducible across retries.

    Returns (id, band, shard, pos): reading in (band, shard, pos) order
    yields band 0's docs in a uniform hash permutation, then band 1's,
    etc.

    Scale shape: band thresholds are ONE control-plane percentile
    aggregate broadcast back (a projection per row); the shuffle key is
    the salted id hash; `pos` windows partition by (band, shard) — the
    per-reducer sort of global_shuffle, never a global one.

    The percentile guard (same discipline as `token_budget_select`,
    VERDICT r5 #5 / r6 #3): Spark's EXACT `percentile` buffers one
    entry per distinct score value in a single aggregation buffer — a
    bounded/banded score is metadata-scale, but a CONTINUOUS score
    column (raw LM log-perplexities) makes that buffer corpus-sized and
    the "control-plane aggregate" a driver-killer at 100 TB. Knobs:

    - `score_digits`: round the score to this many decimal digits
      first (quantizes a continuous score into bounded bands; band
      thresholds and band assignment both use the rounded value).
    - `max_score_buckets` (default 1e6): one cheap map-side-combinable
      `approx_count_distinct` pre-check that fails LOUDLY instead of
      silently building the corpus-sized percentile buffer. Pass None
      to skip the pre-check job when the score is known-bounded."""
    if score_digits is not None:
        df = df.withColumn(
            score_col, F.round(F.col(score_col).cast("double"), score_digits)
        )
    if max_score_buckets is not None:
        n_approx = df.agg(
            F.approx_count_distinct(score_col).alias("n")
        ).collect()[0]["n"]
        if n_approx > max_score_buckets:
            raise ValueError(
                f"curriculum_order: ~{n_approx} distinct values in "
                f"{score_col!r} exceeds max_score_buckets="
                f"{max_score_buckets}; exact percentile over a near-"
                "continuous score buffers per-distinct-value — corpus-"
                "sized, not control-plane. Pass score_digits= to "
                "quantize the score into bounded bands, or raise/"
                "disable max_score_buckets if the cardinality is "
                "genuinely acceptable."
            )
    qs = [i / n_bands for i in range(1, n_bands)]
    thr = df.agg(
        F.expr(
            f"percentile({score_col}, array({', '.join(str(q) for q in qs)}))"
        ).alias("__qs")
    )
    key = h28(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    banded = (
        df.crossJoin(F.broadcast(thr))
        .withColumn(
            # count of thresholds the score exceeds → high score = low band
            "band",
            (
                F.lit(n_bands - 1)
                - F.aggregate(
                    F.col("__qs"),
                    F.lit(0),
                    lambda acc, t: acc
                    + (F.col(score_col) > t).cast("int"),
                )
            ).cast("int"),
        )
        .withColumn("shuffle_key", key)
        .withColumn(
            "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
        )
        .drop("__qs")
    )
    w = Window.partitionBy("band", "shard").orderBy("shuffle_key", id_col)
    return banded.select(
        F.col(id_col).alias("id"),
        "band",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k items with
    inclusion odds proportional to `weight_col` — the Efraimidis-
    Spirakis priority sample with the randomness replaced by the salted
    hash uniform (the module's no-RNG discipline): each row draws
    u = (h28(salt:id) + 1) / 2^28 in (0, 1] and priority
    e = -ln(u) / w (exponential with rate w); the k SMALLEST priorities
    are the sample. Exactly reproducible run-to-run and engine-to-engine
    — rerunning a corpus subsample for a training mix yields the same
    documents, and the DuckDB oracle replays it bit-for-bit.

    Rows with non-positive weight are excluded (they'd have inclusion
    probability 0). Returns (id, priority, rank), rank 1..k by
    (priority asc, id asc).

    Plan shape at 100 TB: the priority is a pure projection (one md5 +
    one ln per row, codegen'd) and the selection is orderBy().limit(k) —
    Spark plans TakeOrderedAndProject: per-partition k-row heaps merged
    on the driver, ZERO shuffle, O(k) driver memory. Never a global
    sort.

    Reference provenance: no sampling surface in the reference —
    extension per the training-data-pipeline mandate (quality- or
    length-weighted corpus subsampling); semantics from the public
    weighted-reservoir-sampling literature.
    """
    w = F.col(weight_col).cast("double")
    u = (
        h28(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        + F.lit(1)
    ) / F.lit(_H28_SPACE)
    scored = df.filter(w > 0).select(
        F.col(id_col).alias("id"), (-F.log(u) / w).alias("e")
    )
    top = scored.orderBy(F.asc("e"), F.asc("id")).limit(k)
    rw = Window.orderBy(F.asc("e"), F.asc("id"))
    return top.select(
        "id",
        F.round("e", 6).alias("priority"),
        F.row_number().over(rw).cast("int").alias("rank"),
    )


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "jsonl-v1",
) -> None:
    """Deliver the relation as `n_shards` JSONL shard files — the format
    training runs actually consume. Everything is DETERMINISTIC:

    - shard assignment = salted `h28(id) % n_shards` — stable under
      retries, cluster size, and input partitioning (never
      `spark.write.json`'s task-count-shaped output);
    - within-shard order = (h28 rank, id) — the same hash-order contract
      as `global_shuffle`, so a re-export produces IDENTICAL files and
      a resumed training job reads the same byte stream;
    - one file per shard: rows repartition BY the shard column and sort
      within partitions, then `partitionBy("shard")` writes each shard's
      rows (all co-located) as a single `shard=N/part-*.txt`.

    Lines are `to_json(struct(*))` of the input columns in their given
    order. Read back with `spark.read.json(out_dir)` (partition
    discovery restores `shard`). At 100 TB bump `n_shards` to the
    desired file size — cost is one hash exchange of the export set."""
    order = h28(F.concat(F.lit(salt + ":o:"), F.col(id_col).cast("string")))
    shard = (
        h28(F.concat(F.lit(salt + ":s:"), F.col(id_col).cast("string")))
        % n_shards
    ).cast("int")
    staged = (
        df.withColumn("__shard", shard)
        .withColumn("__ord", order)
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__ord", id_col)
    )
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    (
        staged.select(F.col("__shard").alias("shard"), line.alias("value"))
        .write.partitionBy("shard")
        .mode("overwrite")
        .text(out_dir)
    )
