"""Distributed exact global ranking — the scale-safe replacement for
unpartitioned ``row_number()`` / ``ntile()`` windows.

A window with no ``partitionBy`` plans as ``Exchange SinglePartition`` →
``Sort`` → ``Window``: every row funnels through ONE task, which is fine at
sf0.1 and fatal at 100 TB. The classic fix is the two-phase "zone" rank
(TeraSort's bookkeeping, Goetz Graefe's rank decomposition): range-partition
on the sort key so zone *i* holds keys strictly below zone *i+1*, rank
locally within each zone in parallel, then add each zone's global offset
(the sum of all earlier zones' row counts). The per-zone count relation is
shuffle-partition-sized — control-plane, broadcastable — so the cross-zone
prefix sum costs a triangular join over ≤ a few hundred rows, never a
single-partition pass over the data.

Correctness hinges on one physical property: the zone id must be the SAME
for the local-rank branch and the zone-count branch. Both branches consume
the same ``repartitionByRange`` exchange, which Spark's ReuseExchange rule
(and AQE's stage reuse) materializes ONCE, so ``spark_partition_id()`` reads
identical partition layouts in both. ``tests/test_rank.py`` pins this with
value-for-value comparison against a global window under AQE.

Reference parity note: the reference computes NTILE/rank in Trino, which
distributes final sorts across workers; this module is the Spark-side
equivalent discipline (reference `sql_query/` rank usage). Oracle SQL in
queries.py keeps the plain ``row_number()/ntile()`` formulation — results
are value-identical, only the physical plan differs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["zone_rank", "zone_cumsum", "ntile_from_rank"]


def _zoned(
    df: DataFrame, order_by: Sequence[Column], zones: int | None
) -> DataFrame:
    n = zones or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(n, *order_by).withColumn(
        "__zone", F.spark_partition_id()
    )


def _zone_offsets(base: DataFrame, value: Column) -> DataFrame:
    """Per-zone exclusive prefix totals of `value`, via a triangular join
    over the zone-count relation (shuffle-partition-sized — never a
    single-partition window)."""
    totals = base.groupBy("__zone").agg(value.alias("__zt"))
    a, b = totals.alias("a"), totals.alias("b")
    return (
        a.join(b, F.col("b.__zone") < F.col("a.__zone"), "left")
        .groupBy(F.col("a.__zone").alias("__zone"))
        .agg(
            F.coalesce(F.sum("b.__zt"), F.lit(0)).cast("long").alias("__off")
        )
    )


def zone_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    alias: str = "rank",
    zones: int | None = None,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY *order_by)`` without a
    single-partition sort.

    `order_by` must be a TOTAL order (include a unique tie-break column) or
    the rank is partition-placement-dependent for tied rows — same contract
    as an unpartitioned row_number, where ties are likewise nondeterministic.
    """
    base = _zoned(df, order_by, zones)
    local = base.withColumn(
        "__lrank",
        F.row_number()
        .over(Window.partitionBy("__zone").orderBy(*order_by))
        .cast("long"),
    )
    offs = _zone_offsets(base, F.count(F.lit(1)).cast("long"))
    return (
        local.join(F.broadcast(offs), "__zone")
        .withColumn(alias, (F.col("__lrank") + F.col("__off")).cast("long"))
        .drop("__zone", "__lrank", "__off")
    )


def zone_cumsum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    alias: str = "cumsum",
    inclusive: bool = True,
    zones: int | None = None,
) -> DataFrame:
    """Exact global running ``sum(value_col) OVER (ORDER BY *order_by ROWS
    UNBOUNDED PRECEDING [AND CURRENT ROW])`` — `inclusive=False` gives the
    exclusive prefix sum (rows strictly before, 0 for the first row). Same
    total-order contract as :func:`zone_rank`."""
    base = _zoned(df, order_by, zones)
    frame_end = 0 if inclusive else -1
    local = base.withColumn(
        "__lsum",
        F.sum(value_col)
        .over(
            Window.partitionBy("__zone")
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, frame_end)
        )
        .cast("long"),
    )
    offs = _zone_offsets(base, F.sum(value_col).cast("long"))
    return (
        local.join(F.broadcast(offs), "__zone")
        .withColumn(
            alias,
            (F.coalesce(F.col("__lsum"), F.lit(0)) + F.col("__off")).cast(
                "long"
            ),
        )
        .drop("__zone", "__lsum", "__off")
    )


def _fdiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative longs — (a - a%b)/b is an
    exactly-divisible quotient, so the double division is lossless below
    2^53 (repo-wide discipline; see queries.py parity notes)."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL-standard ``ntile(k)`` computed in closed form from an exact
    1-based global rank and the total row count: the first ``n % k`` tiles
    get ``n div k + 1`` rows, the rest ``n div k`` — bit-for-bit the Spark
    AND DuckDB ntile semantics, so oracles can keep the plain ntile()
    formulation. ``greatest(q, 1)`` keeps the small-tile division ANSI-safe
    when n < k (that branch is unreachable then: `big` covers every rank)."""
    kl = F.lit(k).cast("long")
    q = _fdiv(n.cast("long"), kl)
    r = (n.cast("long") % kl).cast("long")
    big = (r * (q + F.lit(1))).cast("long")
    q_safe = F.greatest(q, F.lit(1).cast("long"))
    in_big = _fdiv(rank - 1, q + F.lit(1)) + F.lit(1)
    in_small = r + _fdiv(rank - big - 1, q_safe) + F.lit(1)
    return F.when(rank <= big, in_big).otherwise(in_small).cast("int")
