"""Mergeable sketch operators: HyperLogLog distinct-count registers,
Count-Min frequency estimation, and a Bloom-filter membership pre-filter.

Why sketches are a first-class family at 100 TB: the exact forms of
"distinct keys per group", "frequency of key k", and "does key k exist on
the build side" all shuffle the FULL key space — the exchange is O(keys),
and a 100 TB corpus has billions of keys. Each sketch here is a
bounded-size, map-side-combinable partial aggregate:

- HLL: m registers per group. A partition's partial is at most
  groups x m rows regardless of row count; registers merge with max().
  The exchange carries register rows, never keys.
- CMS: a d x w counter grid. Partials combine by cell addition; the
  exchange carries at most d*w rows per partition.
- Bloom: m bits. The build side reduces to a <=m-row distinct-position
  relation (map-side combinable), collapses to ONE array row, and rides
  a broadcast to the probe side — the probe never shuffles at all.

All three use the portable 28-bit md5 hash (operators/dedup.h28), so a
DuckDB oracle replays register/counter/bit arithmetic bit-for-bit; the
only floats are one final division (HLL) and ln() (both sides libm).

Reference provenance: the reference has no sketch surface (its Trino SQL
uses exact count(distinct) only, e.g. models/marts/*.sql) — this is
extension surface per the training-data-pipeline mandate, semantics from
the public HLL (Flajolet et al. 2007), CMS (Cormode-Muthukrishnan 2005)
and Bloom (1970) literature as popularized by Apache DataSketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import h28

# HLL geometry: p=6 index bits -> m=64 registers; the remaining W=22 bits
# of the 28-bit hash feed the leading-zero rank, so rho in [1, W+1].
HLL_P = 6
HLL_M = 1 << HLL_P  # 64
HLL_W = 28 - HLL_P  # 22
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007, Fig. 3)
# Register terms 2^-rho are summed EXACTLY as integers scaled by 2^55:
# term = 2^(55-rho) (rho <= 23 -> term >= 2^32, exact; 64 zero-registers
# contribute 64 * 2^55 = 2^61 < 2^63, no overflow). One final double
# division keeps the estimate bit-identical across engines.
HLL_SCALE = 55

CMS_DEPTH = 4
CMS_WIDTH = 256

BLOOM_BITS = 4096
BLOOM_K = 3


# ------------------------------------------------------------------ HLL --
def hll_register_cols(key_col: str, salt: str = "hll-v1:") -> tuple[Column, Column]:
    """(idx, rho) column pair for one key: register index = top-6 hash
    bits, rho = leading-zero rank of the bottom-22 bits. Shared by the
    batch registers below and streaming.windowed_hll_registers."""
    h = h28(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = h % (1 << HLL_W)
    rho = (
        F.when(w == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return F.floor(h / F.lit(1 << HLL_W)).cast("long"), rho


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    salt: str = "hll-v1:",
) -> DataFrame:
    """Per-group HLL register relation: (group..., idx, r) with
    idx = top-6 hash bits, r = max over keys of (leading-zero rank of the
    bottom-22 bits). Absent registers (rho 0) are implicit — the partial
    per partition is at most groups x 64 rows, and two relations covering
    different slices of the data MERGE by unioning and re-taking max(r)
    (see hll_merge) — the property that lets a 1000-executor cluster
    pre-aggregate per partition and per day, then combine."""
    idx, rho = hll_register_cols(key_col, salt)
    return (
        df.select(*group_cols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(regs_a: DataFrame, regs_b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two register relations (union semantics over the underlying
    key sets): union + max per register. Lossless for HLL — estimate of
    the merge == estimate over the concatenated inputs."""
    return (
        regs_a.unionByName(regs_b)
        .groupBy(*group_cols, "idx")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Collapse a register relation to per-group estimates:
    (group..., v_used, zeros, est). est is the HLL raw estimate
    alpha * m^2 / sum(2^-rho) with the standard small-range linear-counting
    correction (est <= 2.5m and zero registers present -> m * ln(m/zeros)).
    The 2^-rho sum is exact integer arithmetic (see HLL_SCALE); doubles
    appear only in the final division / ln, so the rounded estimate
    value-hashes across engines."""
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("v_used"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_SCALE} - r)")).alias("denom_scaled"),
    )
    zeros = F.lit(HLL_M) - F.col("v_used")
    denom_total = F.col("denom_scaled") + zeros.cast("long") * F.lit(
        1 << HLL_SCALE
    ).cast("long")
    raw = F.lit(float(HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_SCALE))) / denom_total
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), linear).otherwise(raw)
    return per_group.select(
        *group_cols,
        "v_used",
        zeros.cast("int").alias("zeros"),
        F.round(est, 4).alias("est"),
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    salt: str = "hll-v1:",
) -> DataFrame:
    """Approximate distinct `key_col` per group via HLL (m=64, portable
    md5 hashing). Two map-side-combined aggregations; the exchange carries
    at most groups x 64 register rows regardless of input cardinality —
    vs exact count(distinct)'s keys-sized shuffle."""
    return hll_estimate_from_registers(
        hll_registers(df, key_col, group_cols, salt), group_cols
    )


# ------------------------------------------------------------------ CMS --
def _cms_idx(key: Column, depth: int, salt: str) -> Column:
    return h28(F.concat(F.lit(f"{salt}{depth}:"), key.cast("string"))) % CMS_WIDTH


def cms_sketch(
    df: DataFrame, key_col: str, salt: str = "cms-v1:"
) -> DataFrame:
    """Count-Min sketch of `key_col` frequencies: a (depth, idx, n) counter
    relation of at most CMS_DEPTH x CMS_WIDTH rows. Each input row lands in
    one cell per depth; the groupBy partial per partition is bounded by the
    grid size, so the exchange is O(d*w), never O(keys). Two sketches over
    disjoint data merge by cell-wise addition (union semantics)."""
    key = F.col(key_col)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cms_idx(key, d, salt).alias("idx"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("c")
    )
    return rows.groupBy(
        F.col("c.depth").alias("depth"), F.col("c.idx").alias("idx")
    ).agg(F.count(F.lit(1)).alias("n"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS counter relations over disjoint inputs: cell-wise sum."""
    return (
        a.unionByName(b).groupBy("depth", "idx").agg(F.sum("n").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, salt: str = "cms-v1:"
) -> DataFrame:
    """Point-frequency estimates for the keys in `probes`: est(k) =
    min over depths of the addressed cell. The sketch relation is grid-
    bounded, so it BROADCASTS to the probe side; the probe's only exchange
    is its own groupBy(key) over d rows per key. CMS guarantee: est >=
    true count always (one-sided error) — property-tested."""
    key = F.col(key_col)
    addressed = probes.select(
        key.alias(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cms_idx(key, d, salt).alias("idx"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.depth").alias("depth"), F.col("c.idx").alias("idx"))
    joined = addressed.join(F.broadcast(sketch), ["depth", "idx"], "inner")
    return joined.groupBy(key_col).agg(F.min("n").alias("est"))


# ------------------------------------------------------------------ KMV --
KMV_K = 64
KMV_RANGE = 1 << 28  # h28's hash range; theta normalizes against it


def kmv_sketch(df: DataFrame, hash_col: str, k: int = KMV_K) -> DataFrame:
    """KMV (k minimum values / theta) sketch of a hashed set: the k
    smallest DISTINCT hash values, as a <=k-row relation (column `h`).
    Plans as distinct + TakeOrderedAndProject — per-partition k-heaps,
    never a global sort (plan-gated). Cardinality estimate: (k-1) *
    RANGE / kth-smallest. Unlike HLL, two KMV sketches support SET
    INTERSECTION estimates (kmv_overlap) — the sketch that answers
    "how much do these two corpora overlap" without joining them."""
    return df.select(F.col(hash_col).alias("h")).distinct().orderBy("h").limit(k)


def _kmv_thetas(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """One broadcastable row with per-sketch counts, saturated kth values,
    and the EXACT-MODE-aware thetas: a sketch holding fewer than k distinct
    values has seen its whole set, so its theta is the full hash range
    (sampling rate 1 — estimates become exact counts), never the set max
    (which would bias every downstream estimate); an EMPTY sketch (max(h)
    NULL) likewise coalesces to the full range so estimates come out 0,
    not NULL (ADVICE r8). Standard Apache-DataSketches exact-mode rule."""
    full = F.lit(KMV_RANGE).cast("long")

    def side(sk: DataFrame, tag: str) -> DataFrame:
        return sk.agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.max("h").cast("long").alias(f"max_{tag}"),
        ).select(
            f"n_{tag}",
            f"max_{tag}",
            F.when(F.col(f"n_{tag}") < k, full)
            .otherwise(F.col(f"max_{tag}"))
            .alias(f"th_{tag}"),
        )

    return (
        side(sk_a, "a")
        .crossJoin(side(sk_b, "b"))
        .withColumn("theta", F.least("th_a", "th_b"))
    )


def kmv_overlap(sk_a: DataFrame, sk_b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Theta-sketch set algebra over two KMV sketches: one row with
    cardinality estimates for A, B, A|B, A&B and the Jaccard estimate.
    theta = min(theta_a, theta_b); both sketches are cut back to values
    below theta (each survivor is a uniform sample of its set at rate
    theta/RANGE), so |sample intersection| / (theta/RANGE) estimates the
    true intersection — the Apache-DataSketches theta construction,
    including its exact mode: an unsaturated sketch (<k values) holds its
    WHOLE set, so its theta is the full range and its cardinality estimate
    is the exact count (the (k-1)·RANGE/kth estimator only applies once
    saturated). Every relation here is <=k rows (control plane);
    arithmetic is integer until one final double division per estimate,
    so the rounded row value-hashes across engines."""
    rng = float(KMV_RANGE)
    th = _kmv_thetas(sk_a, sk_b, k)
    theta_row = F.broadcast(th.select("theta"))
    sa = sk_a.crossJoin(theta_row).filter(F.col("h") < F.col("theta")).select("h")
    sb = sk_b.crossJoin(theta_row).filter(F.col("h") < F.col("theta")).select("h")
    inter = sa.join(sb, "h").agg(F.count(F.lit(1)).alias("n_inter"))
    union = (
        sa.unionByName(sb).distinct().agg(F.count(F.lit(1)).alias("n_union"))
    )
    kn = F.lit(float((k - 1) * KMV_RANGE))

    def est_side(tag: str) -> Column:
        return F.when(
            F.col(f"n_{tag}") < k, F.col(f"n_{tag}").cast("double")
        ).otherwise(F.round(kn / F.col(f"max_{tag}"), 4))

    return (
        th.crossJoin(inter)
        .crossJoin(union)
        .select(
            F.lit(k).cast("int").alias("k"),
            est_side("a").alias("est_a"),
            est_side("b").alias("est_b"),
            F.round(F.col("n_union") * F.lit(rng) / F.col("theta"), 4).alias(
                "est_union"
            ),
            F.round(F.col("n_inter") * F.lit(rng) / F.col("theta"), 4).alias(
                "est_inter"
            ),
            F.when(F.col("n_union") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_inter") / F.col("n_union"), 4))
            .alias("est_jaccard"),
        )
    )


def kmv_difference(sk_a: DataFrame, sk_b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Theta-sketch SET DIFFERENCE estimates |A\\B| and |B\\A| — the
    "how many NEW keys did this batch bring" / "what fraction of train
    is absent from eval" question, answered at sketch cost. Same theta
    construction as kmv_overlap: cut both sketches below
    theta = min(theta_a, theta_b), where each survivor is a uniform sample
    of its set at rate theta/RANGE; the A-side survivors absent from
    B's survivors (one <=k-row broadcast anti-join each way) estimate
    the true difference when divided by the sampling rate. Unsaturated
    sketches (<k values) run in exact mode — theta coalesces to the full
    hash range so the estimate IS the exact count — and empty sketches
    yield 0 rather than NULL (ADVICE r8). Every
    relation is <=k rows; one double division per estimate at the end."""
    rng = float(KMV_RANGE)
    th = _kmv_thetas(sk_a, sk_b, k)
    theta_row = F.broadcast(th.select("theta"))
    sa = sk_a.crossJoin(theta_row).filter(F.col("h") < F.col("theta")).select("h")
    sb = sk_b.crossJoin(theta_row).filter(F.col("h") < F.col("theta")).select("h")
    a_only = sa.join(F.broadcast(sb), "h", "left_anti").agg(
        F.count(F.lit(1)).alias("n_a_only")
    )
    b_only = sb.join(F.broadcast(sa), "h", "left_anti").agg(
        F.count(F.lit(1)).alias("n_b_only")
    )
    return (
        th.crossJoin(a_only)
        .crossJoin(b_only)
        .select(
            F.lit(k).cast("int").alias("k"),
            F.round(F.col("n_a_only") * F.lit(rng) / F.col("theta"), 4).alias(
                "est_a_minus_b"
            ),
            F.round(F.col("n_b_only") * F.lit(rng) / F.col("theta"), 4).alias(
                "est_b_minus_a"
            ),
        )
    )


# ---------------------------------------------------------------- Bloom --
def bloom_positions(key: Column, salt: str = "bloom-v1:") -> Column:
    """The BLOOM_K bit positions (array<long>) a key sets/probes."""
    return F.array(
        *[
            h28(F.concat(F.lit(f"{salt}{i}:"), key.cast("string"))) % BLOOM_BITS
            for i in range(BLOOM_K)
        ]
    )


def bloom_build(df: DataFrame, key_col: str, salt: str = "bloom-v1:") -> DataFrame:
    """Build a Bloom bitset over the build side's keys: a ONE-row relation
    (bits array<long>, sorted; <= BLOOM_BITS entries). The distinct over
    bit positions is map-side combinable and bounded by the bitset size, so
    building the filter never shuffles more than BLOOM_BITS rows — this is
    what makes bloom pre-filtering cheaper than the semi-join it elides."""
    return (
        df.select(
            F.explode(bloom_positions(F.col(key_col), salt)).alias("pos")
        )
        .distinct()
        .groupBy()
        .agg(F.sort_array(F.collect_set("pos")).alias("bits"))
    )


def bloom_probe(
    probes: DataFrame, bits: DataFrame, key_col: str, salt: str = "bloom-v1:"
) -> DataFrame:
    """Mark each probe row with bloom_pass: all K positions set. The bitset
    row rides a broadcast cross join, membership is array_contains — the
    probe side keeps its partitioning and NEVER shuffles (plan-gated).
    No false negatives (property-tested); false positives bounded by the
    standard (1 - e^{-kn/m})^k rate."""
    pos = bloom_positions(F.col(key_col), salt)
    passed = None
    for i in range(BLOOM_K):
        term = F.array_contains(F.col("bits"), pos[i])
        passed = term if passed is None else (passed & term)
    return probes.crossJoin(F.broadcast(bits)).withColumn(
        "bloom_pass", passed
    ).drop("bits")


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join CARDINALITY estimate from two Count-Min sketches built
    with the same salt: |A JOIN B on k| = sum_k fA(k)*fB(k), estimated
    per depth as the cell-wise inner product and taken as the MIN across
    depths (AMS/CMS inner-product estimator — one-sided, never an
    underestimate, since colliding keys only ADD cross terms).

    This is the planner primitive: both sides reduce to grid-bounded
    counter relations (at most d*w rows each), so deciding whether a
    join explodes costs two O(input) scans with map-side-combined
    partials and a broadcast of one grid — the join itself never runs.

    Output: one row `(est_join_rows BIGINT)`."""
    dots = (
        a.join(F.broadcast(b.withColumnRenamed("n", "nb")), ["depth", "idx"])
        .groupBy("depth")
        .agg(F.sum(F.col("n") * F.col("nb")).alias("dot"))
    )
    return dots.agg(F.min("dot").cast("long").alias("est_join_rows"))
