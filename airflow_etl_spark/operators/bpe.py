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


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 16
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` BPE merges from the corpus.

    Returns (merges, vocab): `merges` is the ranked list of (left, right)
    symbol pairs; `vocab` the (word, cnt, tokens array<string>) relation
    with every word segmented under the learned merges — the artifact
    `bpe_encode` broadcasts.

    Each iteration persists the (small) vocabulary relation and unpersists
    its parent, so lineage stays one merge deep and the per-iteration cost
    is one vocab-sized pair aggregation. A merge whose best pair count
    reaches 1 stops early (nothing left worth merging)."""
    from pyspark import StorageLevel

    wc = word_counts(df, text_col).withColumn(
        "syms", _init_symbols(F.col("word"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    merges: list[tuple[str, str]] = []
    current = wc
    try:
        for _ in range(n_merges):
            pairs = (
                current.select(
                    "cnt", F.explode(_adjacent_pairs("syms")).alias("p")
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("n"))
            )
            best = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(
                1
            ).collect()
            if not best or best[0]["n"] <= 1:
                break
            left, right = best[0]["l"], best[0]["r"]
            merges.append((left, right))
            nxt = current.withColumn(
                "syms", _apply_merge(F.col("syms"), left, right)
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()
            current.unpersist()
            current = nxt
        return merges, current.select(
            "word", "cnt", F.col("syms").alias("tokens")
        )
    except Exception:
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
