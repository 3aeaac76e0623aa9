"""Join operators beyond Spark's built-ins (extension surface).

The reference has only equi/anti/semi joins (SURVEY.md §2.3) — these are the
scale-path join shapes a training-data pipeline needs that Spark's planner
does not provide natively:

- **as-of join** (`asof_join`): each left row matched to the single latest
  right row with right_ts <= (or <) left_ts per key. Implemented as the
  union + sort + last-carry-forward window — ONE shuffle on the key, no
  range-explosion, no per-row subquery. At 100 TB this is the only shape
  that survives: both sides hash-partition by key once and the window is a
  single sort within partitions.
- **range join** (`range_join_bucketed`): points joined to (lo, hi)
  intervals. Spark plans a non-equi join as BroadcastNestedLoop — quadratic.
  Bucket decomposition turns it into an equi-join: each interval explodes
  into the fixed-width buckets it covers, each point hashes to its bucket,
  join on bucket, refine with the exact predicate. Shuffle volume =
  |points| + |intervals| * avg_buckets_per_interval.

Both are pure DataFrame compositions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_MATCH_TS = "__asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str] | None = None,
    strict: bool = False,
    how: str = "inner",
    salt: int = 0,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    `tolerance` (an interval string, e.g. '30 minutes') bounds match
    staleness the way pandas merge_asof's tolerance does: a right row
    older than left_ts − tolerance is NO match (dropped under 'inner',
    NULL payload under 'left'). The filter is applied to the carried
    match struct — same single-shuffle plan, no extra pass.

    `salt=N` (N > 1) is the skew escape hatch: a hot key (one user with
    10% of all events) otherwise lands its entire sort on ONE reducer.
    Each LEFT row is assigned a deterministic content-hash salt and the
    window partitions on (keys, salt); every RIGHT row replicates across
    all N salts so each salt partition still sees the full right history —
    results are bit-identical to unsalted (property-tested), at the cost
    of right × N replication. Use when right is modest relative to left
    (the common events × dimension-history shape).

    `strict=True` uses right_ts <  left_ts (a row never matches itself via
    an equal timestamp); default is the inclusive <=. `how` is 'inner' or
    'left'. `payload` lists the right columns carried to matches (default:
    every right column except keys and right_ts); the matched right
    timestamp is always emitted as `as_of_ts`.

    Right rows must be unique per (keys, right_ts) — pre-aggregate
    otherwise, or which duplicate wins is undefined (the same caveat every
    engine's ASOF join has).

    Plan shape: union both sides → one hash shuffle on `on` → per-key sort
    by (ts, side) → `last(col, ignorenulls=True)` running window carries the
    most recent right values into each left row. No join node at all.
    """
    keys = list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in keys and c != right_ts]
    payload = list(payload)
    overlap = (set(payload) | {"as_of_ts"}) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left side: {overlap}")

    left_cols = [c for c in left.columns if c not in keys and c != left_ts]

    # Equal timestamps: inclusive ⇒ right sorts first (visible to the left
    # row); strict ⇒ right sorts after (invisible).
    l_side, r_side = (0, 1) if strict else (1, 0)

    # The matched right row is carried as ONE struct: carrying each payload
    # column through its own last(ignorenulls) would skip a matched row's
    # legitimate NULL value and splice in an older row's value — a chimera
    # row no real right record contained. The struct is non-null exactly
    # when a right row exists, so all fields stay from the same row.
    match_struct = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in payload],
    )
    null_struct = F.lit(None).cast(
        "struct<__ts:" + right.schema[right_ts].dataType.simpleString()
        + "".join(
            f",{c}:{right.schema[c].dataType.simpleString()}" for c in payload
        )
        + ">"
    )
    l_u = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(l_side).alias(_SIDE),
        *[F.col(c) for c in left_cols],
        null_struct.alias(_MATCH_TS),
    )
    r_u = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(r_side).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        match_struct.alias(_MATCH_TS),
    )

    part_keys = list(keys)
    if salt > 1:
        _SALT = "__asof_salt"
        l_u = l_u.withColumn(
            _SALT,
            F.pmod(F.hash(*[F.col(c) for c in l_u.columns]), F.lit(salt)),
        )
        r_u = r_u.join(
            F.broadcast(
                right.sparkSession.range(salt).select(
                    F.col("id").cast("int").alias(_SALT)
                )
            )
        )
        part_keys.append(_SALT)

    w = (
        Window.partitionBy(*part_keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_MATCH_TS, ignorenulls=True).over(w)
    if tolerance is not None:
        # stale matches (older than left_ts - tolerance) are no match;
        # nulling the whole struct keeps payload fields row-consistent
        matched = F.when(
            matched["__ts"] >= F.col(_TS) - F.expr(f"INTERVAL {tolerance}"),
            matched,
        )
    carried = l_u.unionByName(r_u).select(
        *keys,
        F.col(_TS),
        F.col(_SIDE),
        *[F.col(c) for c in left_cols],
        matched["__ts"].alias("as_of_ts"),
        *[matched[c].alias(c) for c in payload],
    )
    out = carried.filter(F.col(_SIDE) == l_side).drop(_SIDE)
    if how == "inner":
        out = out.filter(F.col("as_of_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.withColumnRenamed(_TS, left_ts)


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join points to half-open intervals [lo, hi) as an equi-join.

    Each interval is exploded into every bucket of `bucket_width` it
    overlaps; each point maps to one bucket; the bucket equi-join then
    refines with the exact range predicate. Pick `bucket_width` near the
    median interval width: narrower ⇒ more interval replication, wider ⇒
    more false candidates per bucket. Interval columns survive the join, so
    the output is one row per (point, containing interval).
    """
    b = F.lit(bucket_width)
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b)
            )
        ),
    )
    # Broadcast the exploded interval side explicitly: it is small by
    # contract, and left to its own statistics Spark may decide to build
    # the hash relation from the POINTS side instead — fatal at scale.
    return (
        p.join(F.broadcast(r), "__bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed left keys.

    A hash-partitioned join sends every row of a hot key to ONE reducer;
    one pathological key (null-ish ids, default values) then dominates the
    stage. Salting splits each left key into `salt` synthetic sub-keys and
    replicates each right row once per sub-key, so a hot key fans out over
    `salt` reducers. Cost: right side × salt — use for large-left ×
    modest-right joins where AQE's skew handling isn't available (e.g.
    non-sort-merge plans) or isn't aggressive enough.

    The salt column is derived from a hash of the whole left row (cheap,
    deterministic per row content, uniform), not rand(), so retried tasks
    produce identical output.
    """
    if how not in ("inner", "left"):
        # right/full-outer would emit each unmatched right row once per
        # replica — `salt` copies instead of one
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    keys = list(on)
    lsalt = F.pmod(
        F.hash(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).alias("__salt")
    l_s = left.select("*", lsalt)
    r_s = right.join(
        F.broadcast(
            right.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    return l_s.join(r_s, keys + ["__salt"], how).drop("__salt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Interval x interval OVERLAP join ([lo, hi] closed intervals,
    overlap iff lo_a <= hi_b AND lo_b <= hi_a) as a banded EQUI-join —
    Spark plans the raw non-equi predicate as a BroadcastNestedLoop
    (quadratic, fatal at scale).

    Both sides explode into every `bucket_width` band they cover and
    equi-join on the band; the exact predicate then refines. Candidate
    pairs sharing several bands are NOT deduplicated with a distinct:
    a pair is emitted only in the FIRST band both intervals cover
    (band == max(floor(lo_a/w), floor(lo_b/w))) — each overlapping pair
    survives exactly once by construction, so the plan has no post-join
    dedup shuffle at all (the standard first-common-tile trick from
    banded spatial joins).

    Every column survives with its side's suffix. Pick `bucket_width`
    near the median interval length: narrower -> more replication,
    wider -> more false candidates. Skew discipline: one interval
    spanning B bands replicates B times — cap pathological interval
    lengths upstream (the LSH max_bucket discipline) if the domain
    allows unbounded spans.

    Reference provenance: no interval algebra in the reference (equi
    joins only, SURVEY.md §2.3) — extension surface; the banding is the
    same decomposition as range_join_bucketed above, extended to the
    interval-interval case.
    """
    sa, sb = suffixes
    a = left.select([F.col(c).alias(c + sa) for c in left.columns])
    b = right.select([F.col(c).alias(c + sb) for c in right.columns])
    w = int(bucket_width)
    lo_a, hi_a = F.col(lo_col + sa), F.col(hi_col + sa)
    lo_b, hi_b = F.col(lo_col + sb), F.col(hi_col + sb)
    ae = a.withColumn(
        "__band",
        F.explode(F.sequence(F.floor(lo_a / w), F.floor(hi_a / w))),
    )
    be = b.withColumn(
        "__band",
        F.explode(F.sequence(F.floor(lo_b / w), F.floor(hi_b / w))),
    )
    return (
        ae.join(be, "__band")
        .filter((lo_a <= hi_b) & (lo_b <= hi_a))
        .filter(
            F.col("__band")
            == F.greatest(F.floor(lo_a / w), F.floor(lo_b / w))
        )
        .drop("__band")
    )
