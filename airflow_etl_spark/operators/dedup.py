"""Deduplication operators for the training-data pipeline (extension
surface; BASELINE.json north star).

Four families, all shuffle-frugal and engine-portable (no Python UDFs):

- **exact**: hash-groupBy on a normalized-text fingerprint; keeps the
  min-id representative. One shuffle on the 128-bit hash — at 100 TB this is
  the canonical map-side-combinable dedup.
- **MinHash + LSH**: shingle → portable 28-bit token hash → k permutations
  `(a*h + b) mod p` → banding → candidate pairs via bucket self-join.
  Parameters are module-level constants so any SQL engine can recompute the
  identical signature (oracle-checkable). The bucket join shuffles only
  (band_idx, band_hash) keys; giant buckets (degenerate shingle sets) are
  the skew risk — cap with `max_bucket` salting if observed.
- **SimHash**: bitwise weighted-majority over token hashes → 24-bit
  signature; near-dups = signatures within small Hamming distance.
- **n-gram Jaccard**: exact token-set Jaccard for candidate verification
  (array_intersect/array_union — JVM-side).
- **clusters**: `connected_components` turns candidate pairs into dedup
  groups (min-label propagation; keep one doc per component).

The portable hash base is `h28(s)` = first 7 hex chars of md5 as int
(0 .. 2^28-1) so `a*h + b` stays < 2^63 for 31-bit `a` — no overflow in
engines that raise on int64 overflow (DuckDB) and identical wrap-free
results everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions import normalize_text
from .core import spread

#: MinHash parameters — FIXED; shared with oracle SQL. 16 permutations.
MINHASH_P = 2147483647  # 2^31 - 1 (prime)
MINHASH_AB: list[tuple[int, int]] = [
    (1299721, 104729), (1299743, 104743), (1299763, 104759), (1299791, 104773),
    (1299811, 104779), (1299817, 104789), (1299821, 104801), (1299827, 104803),
    (1299833, 104827), (1299841, 104831), (1299853, 104849), (1299869, 104851),
    (1299871, 104869), (1299887, 104879), (1299893, 104891), (1299901, 104911),
]
#: LSH banding: 16 signature slots → 4 bands × 4 rows.
LSH_BANDS = 4
LSH_ROWS = 4
SIMHASH_BITS = 48


def h28(col: Column) -> Column:
    """Portable 28-bit hash of a string (first 7 hex chars of md5)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def h48(col: Column) -> Column:
    """Portable 48-bit hash of a string (first 12 hex chars of md5) — the
    simhash token hash: 48 signature bits give the pigeonhole block join
    16-bit blocks (65536 values), where 24-bit signatures left 8-bit
    blocks whose 256 bucket values made candidate volume n^2/256 — the
    r10 sf10 sweep measured one giant-bucket straggler task dominating
    dedup_simhash_pairs (Manku et al. 2007 use 64-bit simhash for the
    same reason; 48 keeps the bit terms inside the md5-prefix integer
    range both engines parse exactly)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def let(value: Column, body) -> Column:
    """Single-evaluation let-binding for expression trees.

    Catalyst does no common-subexpression elimination across a lambda
    body: an expression referenced N times is EVALUATED N times per row
    (measured: composing the 16-permutation MinHash directly over the
    shingle+md5 expression re-ran the hashing 16x — ~100s instead of ~7s
    at sf0.1). `transform` binds its lambda variable to the element VALUE,
    so wrapping the subexpression in a one-element array evaluates it
    exactly once and lets `body` reference the bound value freely."""
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles over normalized text (array<string>).
    Documents shorter than n words yield their full token string as the
    single shingle. The token array is let-bound: referenced inside the
    per-shingle lambda it would re-run normalize+split once per shingle."""
    c = F.col(text) if isinstance(text, str) else text
    return let(
        F.split(normalize_text(c), " "),
        lambda toks: F.array_distinct(
            F.when(
                F.size(toks) - F.lit(n - 1) >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", toks)))
        ),
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact (whitespace-insensitive) dedup: one representative row id per
    normalized-text hash, with the duplicate count.

    Output: (fingerprint, keep_id, n_dupes). Map-side combinable aggregate —
    the optimal distributed plan for exact dedup."""
    return (
        df.select(F.md5(normalize_text(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """array<bigint> of h28 hashes over the distinct shingles — computed
    once; every MinHash permutation is then a cheap affine pass over it."""
    return F.transform(shingles(text, n), h28)


def signature_from_hashes(hashes: Column | str) -> Column:
    """MinHash signature (array<bigint>) from a pre-hashed shingle array.

    The 16 permutation constants enter the plan as TWO array literals
    walked with `transform` — O(1) plan nodes. The round-1 form expanded
    one `array_min(transform(...))` subtree per permutation; combined with
    projection collapse re-inlining the shingle expression into each slot,
    whole-stage codegen emitted a megamethod whose janino+JIT compile time
    dominated the query (observed: 10s+ JIT storms per stage shape). The
    literal-array form keeps plan size constant; the let() binding
    evaluates the (possibly expensive) `hashes` expression ONCE per row
    even when composed directly over shingle_hashes — callers should
    still persist between shingle hashing and multi-consumer signature
    use (see lsh_candidate_pairs)."""
    h = F.col(hashes) if isinstance(hashes, str) else hashes
    a_lit = F.lit([a for a, _ in MINHASH_AB])
    b_lit = F.lit([b for _, b in MINHASH_AB])
    return let(
        h,
        lambda hh: F.transform(
            a_lit,
            lambda a, i: F.array_min(
                F.transform(
                    hh,
                    lambda x: (a * x + F.element_at(b_lit, i + 1))
                    % F.lit(MINHASH_P),
                )
            ),
        ),
    )


def minhash_signature(text: Column | str, n: int = 3) -> Column:
    """MinHash signature (array<bigint>, one slot per permutation) as a
    single column expression. Fine for one-shot projection; multi-consumer
    plans should go through shingle_hashes + signature_from_hashes with a
    persist boundary (see lsh_candidate_pairs)."""
    return signature_from_hashes(shingle_hashes(text, n))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sig_0..sig_15) — the signature matrix, one row per document."""
    from pyspark import StorageLevel

    hashed = spread(df).select(
        F.col(id_col), shingle_hashes(text_col, n).alias("__hashes")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sig = signature_from_hashes("__hashes")
    return hashed.select(F.col(id_col), sig.alias("__sig")).select(
        id_col, *[F.element_at("__sig", i + 1).alias(f"sig_{i}") for i in range(len(MINHASH_AB))]
    )


def band_array(sig_col: str = "sig") -> Column:
    """array<struct<band_idx, band_hash>> over a signature column — each
    band's hash is the md5 of its LSH_ROWS signature slots. Exposed
    separately so callers that must CARRY other columns through the band
    explosion (e.g. the streaming side of incremental dedup, which keeps
    its signature for the verify step) can explode it themselves."""
    return F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig_col, b * LSH_ROWS + r + 1).cast("string")
                        for r in range(LSH_ROWS)
                    ],
                )
            ).alias("band_hash"),
        )
        for b in range(LSH_BANDS)
    ])


def sig_bands(sigs: DataFrame) -> DataFrame:
    """(id, band_idx, band_hash) LSH band index from an (id, sig)
    relation — each signature explodes into LSH_BANDS rows whose band_hash
    is the md5 of that band's LSH_ROWS signature slots. This relation IS
    the persistent dedup index: in production it is txn-committed once per
    corpus snapshot and incremental batches join against it (see
    incremental_neardup) instead of re-hashing the corpus."""
    return sigs.select("id", F.explode(band_array("sig")).alias("band")).select(
        "id", "band.band_idx", "band.band_hash"
    )


def est_jaccard(sig_a: Column | str, sig_b: Column | str) -> Column:
    """Estimated Jaccard similarity = fraction of agreeing MinHash slots."""
    a = F.col(sig_a) if isinstance(sig_a, str) else sig_a
    b = F.col(sig_b) if isinstance(sig_b, str) else sig_b
    return F.round(
        F.size(
            F.filter(
                F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(float(len(MINHASH_AB))),
        4,
    )


def incremental_neardup(
    batch: DataFrame, corpus: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 3, max_bucket: int | None = None,
) -> DataFrame:
    """Incremental batch-vs-corpus near-dedup: which documents of `batch`
    are near-duplicates of something ALREADY IN `corpus`.

    Output: (batch_id, match_id, est_jaccard) — one row per LSH band match
    between a batch doc and a corpus doc (exact duplicates surface
    automatically with est_jaccard 1.0: identical text → identical
    signature → every band matches). The caller drops matched batch ids
    before appending the batch to the corpus.

    This is THE shape of dedup at 100 TB: the corpus is never re-hashed —
    its (id, band_idx, band_hash) index (`sig_bands`) and signature matrix
    are materialized once per snapshot (txn-committed tables, bucketed by
    band_hash), and each day's batch computes only ITS OWN signatures
    (O(batch)) and equi-joins the index. Work per ingest is proportional
    to the new data, not the corpus. Here both sides are computed from
    raw text so the operator is self-contained and oracle-checkable; the
    production wiring swaps `corpus` for the stored index relations.

    `max_bucket` is the same skew guard as lsh_candidate_pairs: corpus
    band buckets larger than the cap (boilerplate hashing together) are
    dropped from the join — their members belong to the exact-dedup pass.
    None (default) keeps exact LSH semantics (oracle parity).
    """
    from pyspark import StorageLevel

    def _sigs(df: DataFrame) -> DataFrame:
        hashed = spread(df).select(
            F.col(id_col).alias("id"), shingle_hashes(text_col, n).alias("hashes")
        )
        s = hashed.select(
            "id", signature_from_hashes("hashes").alias("sig")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        s.count()
        return s

    bs, cs = _sigs(batch), _sigs(corpus)
    corpus_bands = sig_bands(cs)
    if max_bucket is not None:
        w = Window.partitionBy("band_idx", "band_hash")
        corpus_bands = (
            corpus_bands.withColumn("__bsize", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsize") <= max_bucket)
            .drop("__bsize")
        )
    b, c = sig_bands(bs).alias("b"), corpus_bands.alias("c")
    cand = (
        b.join(
            c,
            on=[
                F.col("b.band_idx") == F.col("c.band_idx"),
                F.col("b.band_hash") == F.col("c.band_hash"),
            ],
        )
        .select(F.col("b.id").alias("batch_id"), F.col("c.id").alias("match_id"))
        .distinct()
    )
    return (
        cand.join(
            bs.select(F.col("id").alias("batch_id"), F.col("sig").alias("sig_a")),
            "batch_id",
        )
        .join(
            cs.select(F.col("id").alias("match_id"), F.col("sig").alias("sig_b")),
            "match_id",
        )
        .select("batch_id", "match_id", est_jaccard("sig_a", "sig_b").alias("est_jaccard"))
    )


def lsh_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3,
    max_bucket: int | None = None,
    return_bound: bool = False,
    ids_only: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """LSH candidate pairs: documents agreeing on all rows of ≥1 band.

    Output: (id_a, id_b, est_jaccard) with id_a < id_b; est_jaccard =
    fraction of agreeing signature slots. Plan: explode to (doc, band) →
    self-join on (band_idx, band_hash) → distinct pairs → one compare join.

    `ids_only=True` returns (id_a, id_b) WITHOUT the two signature-attach
    joins that only exist to compute est_jaccard (r12, guide §2.3 "don't
    compute what you throw away"): every pair id comes from `bands` ⊆
    `sigs`, each id has exactly one signature row, so the inner joins are
    row-preserving by construction and dropping them cannot change the
    pair set. Callers that immediately `.select("id_a", "id_b")` (the
    connected-components / verify-by-text consumers) were paying two
    joins per plan for a column the optimizer cannot prune (it can't
    prove an inner join row-preserving).

    `max_bucket` is the skew guard: a degenerate bucket (boilerplate or
    near-empty shingle sets hashing together) makes the self-join quadratic
    in that bucket's size. Buckets larger than the cap are dropped — their
    members are by construction near-identical to hundreds of others, so
    exact-dedup or a dedicated pass handles them; everything else keeps
    exact LSH semantics. None (default) disables the cap (oracle parity).

    `return_bound=True` additionally returns a PROVEN upper bound on the
    candidate-pair count: Σ_buckets C(m, 2) over the (post-cap) band
    buckets — every emitted pair shares ≥1 bucket, and the per-band sums
    only over-count cross-band duplicates that `distinct` removes. The
    bound costs one small aggregation over the already-persisted
    signature relation (NOT a materialization of the pair self-join), so
    callers can hand it to `verify_candidates(static_bound_pairs=...)`
    and skip that function's persist+count barrier whenever the bound
    already fits the broadcast budget (r11 verdict #4 — the adaptive
    decision's toll at sf0.1 was 1.44 → 2.17 s; the proven bound makes
    the broadcast decision free in the common small-candidate regime
    while keeping the oversized path impossible to ship silently).
    """
    from pyspark import StorageLevel

    # Materialize the expensive md5 shingle hashing ONCE (eagerly — lazy
    # cache builds get raced by concurrent broadcast-exchange jobs). The
    # persist boundary also stops projection collapse from re-inlining the
    # big hash expression into every downstream stage's codegen.
    hashed = spread(df).select(
        F.col(id_col).alias("id"), shingle_hashes(text_col, n).alias("hashes")
    )
    # sigs is consumed three times below (bands + both compare sides): the
    # persist boundary computes the 16-permutation signature once and stops
    # projection collapse from re-inlining it into every join stage.
    sigs = hashed.select(
        "id", signature_from_hashes("hashes").alias("sig")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    bands = sig_bands(sigs)

    if max_bucket is not None:
        w = Window.partitionBy("band_idx", "band_hash")
        bands = (
            bands.withColumn("__bsize", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsize") <= max_bucket)
            .drop("__bsize")
        )

    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    if ids_only:
        out = pairs
    else:
        sa = sigs.select(
            F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
        )
        sb = sigs.select(
            F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
        )
        out = (
            pairs.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a", "id_b",
                est_jaccard("sig_a", "sig_b").alias("est_jaccard"),
            )
        )
    if not return_bound:
        return out
    # Σ C(m, 2) over post-cap buckets, exact integer arithmetic; one
    # shuffle of (band, hash) keys over the CACHED sigs — no pair
    # materialization, no distinct exchange.
    row = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(
            F.coalesce(
                F.sum(F.col("m") * (F.col("m") - 1)), F.lit(0).cast("long")
            ).alias("twice_bound")
        )
        .collect()[0]
    )
    return out, int(row["twice_bound"]) // 2


def simhash_sig(text: Column | str) -> Column:
    """48-bit SimHash over whitespace tokens: bit b set iff the count of
    tokens whose h48 has bit b set is >= half the token count (weighted
    majority with deterministic >= tie-rule)."""
    toks = F.array_distinct(F.split(normalize_text(
        F.col(text) if isinstance(text, str) else text), " "))
    # let() binds the token-hash array once — referenced per bit it would
    # re-run normalize+split+md5 SIMHASH_BITS (48) times per row.
    # Then one struct-free pass per bit via a literal bit-index array
    # (constant plan size — same codegen-blowup avoidance as
    # signature_from_hashes); bit b of h tested as h AND 2^b != 0
    # ≡ shiftright(h, b) % 2 == 1
    return let(
        F.transform(toks, h48),
        lambda hashes: F.aggregate(
            F.transform(
                F.lit(list(range(SIMHASH_BITS))),
                lambda b: F.when(
                    F.aggregate(
                        hashes,
                        F.lit(0).cast("long"),
                        lambda acc, h: acc
                        + F.when(
                            h.bitwiseAND(F.pow(F.lit(2.0), b).cast("long")) != 0,
                            F.lit(1).cast("long"),
                        ).otherwise(F.lit(0).cast("long")),
                    )
                    * 2
                    >= F.size(hashes),
                    F.pow(F.lit(2.0), b).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        ),
    )


def ngram_jaccard(text_a: Column, text_b: Column, n: int = 3) -> Column:
    """Exact n-gram-shingle Jaccard similarity between two text columns
    (rounded to 4 for cross-engine stability). Both shingle sets are
    let-bound — referenced twice (intersect + union) they'd otherwise be
    built twice per row."""
    return let(
        shingles(text_a, n),
        lambda sa: let(
            shingles(text_b, n),
            lambda sb: F.round(
                F.size(F.array_intersect(sa, sb)).cast("double")
                / F.size(F.array_union(sa, sb)).cast("double"),
                4,
            ),
        ),
    )


def ngram_containment(text_a: Column, text_b: Column, n: int = 3) -> Column:
    """Exact n-gram-shingle CONTAINMENT of a in b: |S(a) & S(b)| / |S(a)|
    (rounded to 4). The asymmetric companion to ngram_jaccard — a short
    document fully quoted inside a long one scores containment ~1.0 while
    its Jaccard stays low (|union| is dominated by the long side), so
    near-SUBSET duplication (boilerplate wrappers, quoted articles,
    prepended licenses) slips every symmetric threshold. Shingle sets are
    let-bound (built once per row despite the double reference)."""
    return let(
        shingles(text_a, n),
        lambda sa: let(
            shingles(text_b, n),
            lambda sb: F.round(
                F.size(F.array_intersect(sa, sb)).cast("double")
                / F.size(sa).cast("double"),
                4,
            ),
        ),
    )


def connected_components(
    edges: DataFrame, a_col: str = "id_a", b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a candidate-
    pair graph (LSH/Jaccard output) by iterative min-label propagation.

    Output: (id, component) where component = min doc id reachable. This is
    the step that turns near-dup PAIRS into dedup GROUPS (keep one doc per
    component). Iterative by nature (not SQL-expressible in one pass): each
    round every node adopts the smallest label among itself and its
    neighbors, then labels shortcut through their current component's label
    (pointer jumping) — the shortcut doubles the propagation radius per
    round, so convergence takes O(log diameter) iterations. Each round
    shuffles only the (small) edge set — the corpus is never touched.
    Raises RuntimeError instead of returning silently wrong components if
    max_iter is exhausted before convergence.
    """
    from pyspark import StorageLevel

    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # localCheckpoint (not persist) each round: an iterative plan that keeps
    # its lineage DOUBLES per iteration (two self-joins a round) and blows
    # the driver up around iteration ~8; checkpointing truncates the logical
    # plan so every round plans against a constant-size input.
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=False)
    )

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
        )
        stepped = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: follow my component's own label one more hop —
        # this is what turns O(diameter) propagation into O(log diameter)
        lbl_map = stepped.select(
            F.col("id").alias("__mid"), F.col("component").alias("__mcomp")
        )
        # LAZY checkpoint + FULL convergence count (r12): the old eager
        # checkpoint spent one job materializing labels and a second on
        # the changed-row probe. The count below scans every partition
        # of new_labels (no limit — an early-terminating probe could
        # leave the lazy checkpoint partially materialized), so it fills
        # the checkpoint AND decides convergence in a single job.
        new_labels = (
            stepped.join(lbl_map, stepped.component == F.col("__mid"), "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__mcomp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels


def simhash_neardup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 2, bits: int = SIMHASH_BITS, n_blocks: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: signatures within `max_hamming` bits.

    Scale plan — the pigeonhole block trick: split the signature into
    `n_blocks` bit-blocks; two signatures within d < n_blocks differing
    bits MUST agree exactly on at least one block, so candidates come from
    `n_blocks` equi-joins on block values (one shuffle of (block_idx,
    block_val) keys) instead of an all-pairs comparison; the exact Hamming
    check then filters. Requires max_hamming < n_blocks for completeness.

    Output: (id_a, id_b, hamming), id_a < id_b.
    """
    if max_hamming >= n_blocks:
        raise ValueError("pigeonhole requires max_hamming < n_blocks")
    from pyspark import StorageLevel

    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    sigs = (
        spread(df)
        .select(F.col(id_col).alias("id"), simhash_sig(text_col).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sigs.count()
    blocks = sigs.select(
        "id",
        "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("block_idx"),
                    (
                        F.shiftright("sh", i * block_bits)
                        .bitwiseAND(F.lit(mask))
                    ).alias("block_val"),
                )
                for i in range(n_blocks)
            ])
        ).alias("b"),
    ).select("id", "sh", "b.block_idx", "b.block_val")

    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.block_idx") == F.col("b.block_idx"),
                F.col("a.block_val") == F.col("b.block_val"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def verify_candidates(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    prefix: int = 512,
    broadcast_pairs: bool | None = None,
    max_broadcast_pairs: int = 500_000,
    static_bound_pairs: int | None = None,
) -> DataFrame:
    """Edit-similarity verification of candidate pairs — the second half
    of the standard two-phase near-dedup (MinHash/LSH proposes, edit
    similarity confirms; the deduplicating-training-data literature's
    verify step). For each (id_a, id_b) candidate:

        edit_sim = 1 - levenshtein(na, nb) / max(len(na), len(nb))

    over the NORMALIZED texts truncated to `prefix` chars (the truncation
    bounds per-pair cost by a constant, the same discipline as shingle
    hashing's fixed n), computed with the BANDED levenshtein (see the
    band note below): pairs whose distance exceeds the verification band
    report edit_sim = NULL — provably below `threshold`, exact value not
    paid for. Both-empty pairs are defined as edit_sim = 1.0. Adds
    (edit_sim, verified) to whatever columns `pairs` carries; `verified`
    = edit_sim >= threshold (false on NULL).

    Plan shape at 100 TB: the candidate relation is LSH-bounded (bands x
    max_bucket), usually orders of magnitude smaller than the corpus, so
    BOTH text-attach joins broadcast the candidate side — the corpus is
    scanned once per side with zero shuffle, and levenshtein runs
    JVM-side inside codegen on the candidate-sized result. But on a
    corpus WHOSE DUP RATE is high the candidate relation grows with the
    corpus (every real near-dup is a candidate), and the second
    broadcast carries a 512-char prefix per pair: the r11 sf100 probe
    (5M docs, ~10% near-dup families) measured it PAST
    spark.driver.maxResultSize — a planned broadcast of an
    unbounded-by-design relation is a latent OOM, not a plan choice.
    `broadcast_pairs=None` therefore decides ADAPTIVELY: ONE count of
    the candidate relation decides (<= `max_broadcast_pairs`,
    default 500k — x512B prefix keeps the fat broadcast ~256MB), and
    oversized candidate sets take plain shuffle hash joins on the id
    keys instead (the corpus side ships only (id, prefix) — narrow).
    Results are identical either way; True/False forces a side.

    `static_bound_pairs` (r11 verdict #4): a caller-supplied PROVEN
    upper bound on the pair count (e.g. `lsh_candidate_pairs(...,
    return_bound=True)`'s Σ C(bucket, 2)). When the bound already fits
    `max_broadcast_pairs` the broadcast is safe by construction and the
    persist+count barrier is skipped entirely; a bound that does NOT
    fit falls back to the precise adaptive count (the bound is loose —
    cross-band duplicates — so a large bound does not prove a large
    pair set, and the count's relative toll is smallest exactly there).

    Cache discipline (advisor r11): the adaptive decision persists the
    candidate relation only for its one count and unpersists before
    returning — the decision therefore costs ONE extra computation of
    the candidate lineage at materialization time. Callers on a hot
    path should either pass a bound/explicit side, or persist `pairs`
    themselves (a caller-cached relation is left untouched and reused
    by both the count and the joins).
    """
    t = df.select(
        F.col(id_col).alias("__vid"),
        F.substring(normalize_text(text_col), 1, prefix).alias("__vt"),
    )
    if broadcast_pairs is None and static_bound_pairs is not None:
        if static_bound_pairs <= max_broadcast_pairs:
            broadcast_pairs = True
    if broadcast_pairs is None:
        # No persist here (advisor r11): the r11 persist was never
        # unpersisted — a leaked CacheManager entry per call in
        # long-lived sessions — and persist-for-one-count followed by
        # an immediate unpersist is strictly worse than counting the
        # lineage directly (same single computation, plus the cache
        # write). A caller-persisted `pairs` is used by both the count
        # and the joins automatically.
        broadcast_pairs = pairs.count() <= max_broadcast_pairs
    hint = F.broadcast if broadcast_pairs else (lambda x: x)
    with_a = t.join(
        hint(pairs), F.col("__vid") == F.col("id_a")
    ).select(
        *[F.col(c) for c in pairs.columns], F.col("__vt").alias("__ta")
    )
    both = t.join(
        hint(with_a), F.col("__vid") == F.col("id_b")
    ).select(
        *[F.col(c) for c in pairs.columns], "__ta",
        F.col("__vt").alias("__tb"),
    )
    # Banded DP: a pair can only verify if its distance is at most
    # (1 - threshold) * maxlen <= (1 - threshold) * prefix = band, so the
    # threshold variant of levenshtein (O(len x band) cells instead of
    # O(len^2), early-terminating) decides every pair. Beyond the band it
    # returns -1: edit_sim is then NULL (provably < threshold, exact
    # value unknown) and verified is false. The r7 scale sweep measured
    # the unbanded form 13x superlinear on an amplified near-dup corpus
    # (LSH candidates grow with the dup rate; full 512^2 DP per pair) —
    # the band caps per-pair cost at prefix x band cells.
    band = max(1, int((1.0 - threshold) * prefix))
    mlen = F.greatest(F.length("__ta"), F.length("__tb"))
    d = F.levenshtein("__ta", "__tb", band)
    sim = F.when(mlen == F.lit(0), F.lit(1.0)).otherwise(
        F.when(
            d >= 0,
            F.round(F.lit(1.0) - d.cast("double") / mlen, 4),
        ).otherwise(F.lit(None).cast("double"))
    )
    return both.withColumn("edit_sim", sim).select(
        *[F.col(c) for c in pairs.columns],
        "edit_sim",
        F.coalesce(
            F.col("edit_sim") >= F.lit(threshold), F.lit(False)
        ).alias("verified"),
    )


def set_similarity_join(
    df: DataFrame, id_col: str, tokens_col: str, t_pct: int = 60
) -> DataFrame:
    """EXACT Jaccard >= t_pct/100 self-join via PPJoin-style prefix
    filtering — the deterministic sibling of the probabilistic MinHash
    LSH path: no false negatives, no false positives, and still never
    the all-pairs join.

    Filter chain (each provably keeps every qualifying pair):
    1. global token order: documents' token sets sort by (corpus
       document-frequency ASC, token ASC) — rarest first, ties broken
       deterministically so both engines and every retry agree;
    2. prefix filter: two sets with Jaccard >= t MUST share a token in
       their first `n - ceil(t*n) + 1` ordered tokens (pigeonhole: the
       suffixes alone are too small to reach t) — candidate generation
       is an EQUI-join on prefix tokens only;
    3. length filter: t * max(|a|, |b|) <= min(|a|, |b|), in exact
       integer arithmetic;
    4. verify: exact intersection on the full ordered-token arrays.

    Cost shape at 100 TB: candidate fan-out is bounded by prefix-token
    co-occurrence, and the prefix is dominated by RARE tokens (the sort
    puts high-df stopwords at the END, outside every prefix), so hot
    tokens never generate candidate floods — the same discipline as
    LSH's max_bucket, achieved by ordering instead of capping. Input
    arrays must be distinct (pass through array_distinct upstream).

    Output: (id_a, id_b, inter, n_a, n_b, jacc) with id_a < id_b.

    Reference provenance: no similarity surface in the reference —
    dedup-family extension (SURVEY.md); the prefix-filter decomposition
    follows the published PPJoin family of set-similarity joins."""
    base = df.select(
        F.col(id_col).alias("sid"), F.col(tokens_col).alias("toks")
    ).filter(F.size("toks") > 0)
    toks = base.select("sid", F.explode("toks").alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        toks.join(freq, "tok")
        .groupBy("sid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("stoks")
        )
    )
    n = F.size("stoks")
    # ceil(t_pct*n/100) in exact integer arithmetic
    ceil_t = F.floor((F.lit(t_pct) * n + F.lit(99)) / F.lit(100)).cast("int")
    pref = ordered.select(
        "sid",
        n.alias("n"),
        F.explode(F.slice("stoks", 1, n - ceil_t + 1)).alias("tok"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.sid") < F.col("b.sid")),
        )
        .select(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .filter(
            F.lit(t_pct) * F.greatest("n_a", "n_b")
            <= F.lit(100) * F.least("n_a", "n_b")
        )
        .distinct()
    )
    sa = ordered.select(F.col("sid").alias("id_a"), F.col("stoks").alias("ta"))
    sb = ordered.select(F.col("sid").alias("id_b"), F.col("stoks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.col("n_a") + F.col("n_b") - F.col("inter")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", inter)
        .filter(F.col("inter") * 100 >= F.lit(t_pct) * union)
        .select(
            "id_a", "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(F.col("inter") / union, 4).alias("jacc"),
        )
    )


def hamming_pairs(
    df: DataFrame,
    hash_col: str,
    id_col: str,
    bits: int,
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-pairs of PRE-COMPUTED integer fingerprints within
    `max_hamming` bits — the pigeonhole block join
    (simhash_neardup_pairs) factored out from hashing, so any
    fingerprint family reuses it: SimHash (text), dHash (images,
    operators/multimodal), any future audio fingerprint. Candidates
    come from n_blocks equi-joins on block values (one shuffle of
    (block_idx, block_val) keys), never an all-pairs comparison; exact
    popcount verifies. Completeness needs max_hamming < n_blocks
    (d < n_blocks differing bits must leave >= 1 block untouched).

    Output: (id_a, id_b, hamming), id_a < id_b, distinct."""
    if max_hamming >= n_blocks:
        raise ValueError("pigeonhole requires max_hamming < n_blocks")
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    sigs = df.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("sh")
    )
    blocks = sigs.select(
        "id",
        "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("block_idx"),
                    (
                        F.shiftright("sh", i * block_bits)
                        .bitwiseAND(F.lit(mask))
                    ).alias("block_val"),
                )
                for i in range(n_blocks)
            ])
        ).alias("b"),
    ).select("id", "sh", "b.block_idx", "b.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(
        F.col("a.sh").bitwiseXOR(F.col("b.sh"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
