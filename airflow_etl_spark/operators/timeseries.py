"""Time-series resampling — the hypertable continuous-rollup shape:
collapse an event stream into per-bucket OHLC (open/high/low/close)
bars with counts and sums, in ONE map-side-combined aggregation.

Why min_by/max_by instead of a window: a row_number() window sorts
every partition of the raw stream; OHLC needs only four combinable
extremes per bucket, so the exchange should carry one partial bar per
(group, bucket) per task — at 100 TB that is the difference between
shuffling the stream and shuffling the rollup. min_by/max_by ARE
combinable aggregates (Spark merges partials by comparing keys), so
whole-stage codegen keeps the scan→partial-agg pipeline fused.

Determinism: "first value in the bucket" needs a TOTAL order. Wall
clocks collide, so the order key is the zero-padded
'<epoch_micros>-<tie_id>' string — lexicographic order equals
(ts, tie) numeric order, portable to any engine with arg_min/min_by
over VARCHAR (a struct ordering key is Spark-only; DuckDB's arg_min
takes scalars). Values travel as exact integer cents.

This is the operator behind incremental bar maintenance too: OHLC
partials merge associatively, so per-batch bars fold into stored bars
the same way map-side partials fold into the final — the matview
refresh path needs no retraction logic for append-only streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: supported bucket widths -> Spark date_trunc unit
_UNITS = {"day": "day", "hour": "hour", "week": "week", "month": "month"}


def order_key(ts_micros, tie) -> "F.Column":
    """Zero-padded '<micros>-<tie>' total-order string (portable)."""
    return F.concat_ws(
        "-",
        F.lpad(ts_micros.cast("string"), 20, "0"),
        F.lpad(tie.cast("string"), 12, "0"),
    )


def resample_ohlc(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    group_cols: list[str],
    tie_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Per-(group, bucket) OHLC bars over an integer-valued column.

    Returns (group..., bucket_start, open_v, high_v, low_v, close_v,
    n, sum_v) with bucket_start a 'yyyy-MM-dd HH:mm:ss' string. ONE
    aggregation; open/close use min_by/max_by over the total-order
    key."""
    if bucket not in _UNITS:
        raise ValueError(
            f"bucket {bucket!r} not in {sorted(_UNITS)} — arbitrary "
            "widths belong to the caller via a precomputed bucket column"
        )
    ts = F.col(ts_col)
    key = order_key(F.unix_micros(ts), F.col(tie_col))
    v = F.col(val_col)
    return (
        df.select(
            *group_cols,
            F.date_format(
                F.date_trunc(_UNITS[bucket], ts), "yyyy-MM-dd HH:mm:ss"
            ).alias("bucket_start"),
            v.alias("__v"),
            key.alias("__k"),
        )
        .groupBy(*group_cols, "bucket_start")
        .agg(
            F.min_by("__v", "__k").alias("open_v"),
            F.max("__v").alias("high_v"),
            F.min("__v").alias("low_v"),
            F.max_by("__v", "__k").alias("close_v"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__v").cast("long").alias("sum_v"),
        )
    )


def ewma_fixed(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_col: str,
    val_col: str,
    halvings: int = 1,
) -> DataFrame:
    """Per-key exponentially-weighted moving average in EXACT integer
    arithmetic: the fold e_t = (e_{t-1}·(2^h − 1) + x_t) DIV 2^h
    (alpha = 2^-h), seeded with the first value. Power-of-two alphas
    keep every step an integer shift — no float accumulation, so the
    result is bit-identical across engines, partitionings, and retries
    (a float EWMA is none of those). Truncation is part of the operator
    definition, bounded by 1 per step.

    Returns (key..., n_events, ewma_v, last_v).

    Scale shape: ONE groupBy collecting each key's ordered value array,
    then a per-row fold — sequential state never crosses rows, so there
    is no window sort of the stream and no driver loop. The per-key
    history must fit an array (fine for user/session grains); for
    unbounded keys, fold per time-chunk and carry the seed — the same
    associative-resume trick as the incremental OHLC bars."""
    if halvings < 1:
        raise ValueError("halvings must be >= 1 (alpha = 2^-halvings)")
    w = 2**halvings
    key = order_key(F.unix_micros(F.col(ts_col)), F.col(tie_col))
    arr = (
        df.select(
            *key_cols,
            F.struct(key.alias("k"), F.col(val_col).alias("v")).alias("__s"),
        )
        .groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("__s")).alias("__ss"))
        .withColumn("__vs", F.expr("transform(__ss, s -> s.v)"))
    )
    fold = (
        f"aggregate(slice(__vs, 2, size(__vs) - 1), element_at(__vs, 1), "
        f"(acc, x) -> (acc * {w - 1} + x) DIV {w})"
    )
    return arr.select(
        *key_cols,
        F.size("__vs").cast("long").alias("n_events"),
        F.expr(fold).cast("long").alias("ewma_v"),
        F.element_at("__vs", -1).cast("long").alias("last_v"),
    )


def holt_fixed(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_col: str,
    val_col: str,
    halvings: int = 2,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + linear trend)
    in EXACT integer arithmetic — `ewma_fixed`'s big sibling for series
    with drift, where a plain EWMA lags the trend forever.

        pred_t  = level_{t-1} + trend_{t-1}
        level_t = trunc((x_t + (2^h - 1) * pred_t)      / 2^h)
        trend_t = trunc(((level_t - level_{t-1})
                          + (2^h - 1) * trend_{t-1})    / 2^h)

    (alpha = beta = 2^-h), seeded level_1 = x_1, trend_1 = 0. Every
    step is integer; divisions TRUNCATE TOWARD ZERO — exactly what both
    Spark's `DIV` and DuckDB's `//` do, including on the negative level
    deltas and trends, so the definition is portable with no floor-div
    gymnastics. (DuckDB's `list_reduce` corrupts struct accumulators in
    1.0.0, so the oracle replays this recurrence with a recursive CTE
    instead of a fold — same arithmetic.) The two-component state rides
    a struct accumulator through one per-key array fold: same
    single-exchange shape, same bit-identical-under-repartitioning
    guarantee, same chunk-and-carry resume story as ewma_fixed.

    Returns (key..., n_events, level_v, trend_v, forecast_v) with
    forecast_v = level + trend (the one-step-ahead prediction).
    """
    if halvings < 1:
        raise ValueError("halvings must be >= 1 (alpha = 2^-halvings)")
    w = 2**halvings
    key = order_key(F.unix_micros(F.col(ts_col)), F.col(tie_col))
    arr = (
        df.select(
            *key_cols,
            F.struct(key.alias("k"), F.col(val_col).alias("v")).alias("__s"),
        )
        .groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("__s")).alias("__ss"))
        .withColumn("__vs", F.expr("transform(__ss, s -> s.v)"))
    )

    lvl = f"(x + {w - 1} * (acc.l + acc.t)) DIV {w}"
    fold = (
        f"aggregate(slice(__vs, 2, size(__vs) - 1), "
        f"named_struct('l', element_at(__vs, 1), 't', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct("
        f"'l', {lvl}, "
        f"'t', ((({lvl}) - acc.l) + {w - 1} * acc.t) DIV {w}))"
    )
    # CollapseProject will inline __st into its three uses (no CSE across
    # HOF lambdas), so the fold runs up to 3x per KEY — acceptable here
    # because the fold is per-key-array-sized, not corpus-sized; callers
    # folding huge arrays should persist `st` first
    st = arr.withColumn("__st", F.expr(fold))
    return st.select(
        *key_cols,
        F.size("__vs").cast("long").alias("n_events"),
        F.col("__st.l").cast("long").alias("level_v"),
        F.col("__st.t").cast("long").alias("trend_v"),
        (F.col("__st.l") + F.col("__st.t")).cast("long").alias("forecast_v"),
    )


def acf_lags(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-key autocorrelation function at small lags — the seasonality /
    persistence probe a forecasting pipeline runs before picking model
    order (reference `sql_query/` trend checks generalized): for each lag
    L the Pearson correlation between the series and itself shifted by L,
    over the (order_by)-sorted per-key sequence.

    Exact-moment discipline (stats.corr_pairs): one lead() per lag inside
    ONE per-key window (hash-partition + per-key sort — no global sort),
    stack() to long form (a per-row Expand, no exchange), then a single
    map-side-combined aggregate carrying DECIMAL(38,0) moments; the only
    float ops are one IEEE divide/sqrt per (key, lag) output row, so
    floor(r*1e6) is engine-identical. Constant windows yield NULL corr.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    sel: list[Column] = [*[F.col(k) for k in keys], F.col(value_col).alias("__x")]
    for lag in lags:
        sel.append(F.lead(value_col, lag).over(w).alias(f"__y{lag}"))
    led = df.select(*sel)
    stacked = led.selectExpr(
        *keys,
        "__x",
        "stack({}, {}) AS (lag, __y)".format(
            len(lags), ", ".join(f"{lag}, __y{lag}" for lag in lags)
        ),
    ).filter(F.col("__y").isNotNull())

    def dec(c: str) -> Column:
        return F.col(c).cast("decimal(38,0)")

    g = stacked.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("__x")).alias("sx"),
        F.sum(dec("__y")).alias("sy"),
        F.sum(dec("__x") * dec("__y")).alias("sxy"),
        F.sum(dec("__x") * dec("__x")).alias("sxx"),
        F.sum(dec("__y") * dec("__y")).alias("syy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    da = n * F.col("sxx") - F.col("sx") * F.col("sx")
    db = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (da != 0) & (db != 0),
        F.floor(
            num.cast("double")
            / F.sqrt(da.cast("double") * db.cast("double"))
            * 1000000
        ).cast("long"),
    )
    return g.select(
        *keys,
        F.col("lag").cast("int").alias("lag"),
        "n",
        corr.alias("corr_ppm"),
    )
