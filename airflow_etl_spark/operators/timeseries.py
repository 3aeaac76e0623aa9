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


def lttb_downsample(
    df: DataFrame,
    keys: list[str],
    t_col: str,
    tie_col: str,
    v_col: str,
    buckets: int = 8,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
    the perceptual line-chart reduction that keeps the visually dominant
    point per bucket: the point maximizing the triangle area with the
    PREVIOUSLY SELECTED point and the NEXT bucket's centroid. That
    previous-selected-point dependency makes LTTB a SEQUENTIAL fold per
    series (contrast ts_downsample_m4, the associative aggregate), so it
    runs as a per-key array fold: collect each key's (t, v) series once,
    then one O(n) SQL-expression fold selects first + one-per-bucket +
    last. Series with <= buckets+2 points are kept whole.

    Exactness: areas are 2x-triangle integer cross products with the
    next-bucket centroid SCALED BY ITS COUNT (area·c — the division-free
    form), time in whole seconds; ties keep the lowest index (strict >
    against a running best seeded at -1). Envelope: |area·c| <
    (points-per-key/buckets)·t-span-seconds·value-range must stay inside
    BIGINT — fine to ~1e6 points/key at centi-precision values; the
    DuckDB oracle shares the same envelope (its INT64 multiply does not
    promote). Catalyst does no CSE across lambda bodies, so the bucket
    centroid and the prev-dependent terms are let-bound via the
    one-element-transform trick (dedup.let) INSIDE the fold — per-bucket
    sums evaluate once per bucket, never per candidate.

    Returns (keys..., idx, t, v) — idx is the 1-based position in the
    key's time-ordered series (first=1, last=n).
    """
    B = int(buckets)
    arr = (
        df.select(
            *keys,
            F.struct(
                F.col(t_col).cast("long").alias("t"),
                F.col(tie_col).cast("long").alias("k"),
                F.col(v_col).cast("long").alias("v"),
            ).alias("__s"),
        )
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__s")).alias("__ss"))
        .select(
            *keys,
            F.expr("transform(__ss, s -> s.t)").alias("__tm"),
            F.expr("transform(__ss, s -> s.t DIV 1000000)").alias("__ts"),
            F.expr("transform(__ss, s -> s.v)").alias("__vs"),
            F.size("__ss").alias("__n"),
        )
        # Materialization boundary: without it the optimizer inlines the
        # transforms above into every element_at() inside the fold lambdas
        # (no CSE across lambda bodies), turning each O(1) array index into
        # an O(n) re-map — measured O(n^2) per key (482 s at 30k points/key;
        # 1.4 s with the boundary). A repartition is NOT enough — the
        # project pushes through it — so persist the key-grain array
        # relation (one row per key), the dedup.py precedent.
        .persist()
    )
    lo = f"CAST((j - 1) * (__n - 2) DIV {B} + 2 AS INT)"
    hi = f"CAST(j * (__n - 2) DIV {B} + 1 AS INT)"
    lo2 = f"CAST(j * (__n - 2) DIV {B} + 2 AS INT)"
    hi2 = f"CAST((j + 1) * (__n - 2) DIV {B} + 1 AS INT)"
    # next-bucket centroid (count-scaled) — last point when j = B
    nxt = (
        f"IF(j < {B}, named_struct("
        f"  'c', CAST({hi2} - ({lo2}) + 1 AS BIGINT),"
        f"  'st', aggregate(sequence({lo2}, {hi2}), CAST(0 AS BIGINT),"
        f"        (sa, si) -> sa + element_at(__ts, si)),"
        f"  'sv', aggregate(sequence({lo2}, {hi2}), CAST(0 AS BIGINT),"
        f"        (sa, si) -> sa + element_at(__vs, si))),"
        f" named_struct('c', CAST(1 AS BIGINT),"
        f"  'st', element_at(__ts, __n), 'sv', element_at(__vs, __n)))"
    )
    # prev-dependent terms, computed once per bucket (let-bound): the
    # 2x area vs candidate i is then ta*(vs[i]-pv) - (pt-ts[i])*tc
    pre = (
        "named_struct("
        " 'ta', element_at(__ts, acc.prev) * nx.c - nx.st,"
        " 'tc', nx.sv - element_at(__vs, acc.prev) * nx.c,"
        " 'pt', element_at(__ts, acc.prev),"
        " 'pv', element_at(__vs, acc.prev))"
    )
    area = (
        "abs(p.ta * (element_at(__vs, i) - p.pv)"
        " - (p.pt - element_at(__ts, i)) * p.tc)"
    )
    best = (
        f"aggregate(sequence({lo}, {hi}),"
        f" named_struct('bi', CAST(0 AS INT), 'ba', CAST(-1 AS BIGINT)),"
        f" (a2, i) -> IF({area} > a2.ba,"
        f"   named_struct('bi', CAST(i AS INT), 'ba', CAST({area} AS BIGINT)),"
        f"   a2))"
    )
    fold = (
        f"aggregate(sequence(1, {B}),"
        f" named_struct('prev', 1, 'sel', array(CAST(1 AS INT))),"
        f" (acc, j) -> element_at(transform(array({nxt}), nx ->"
        f"   element_at(transform(array({pre}), p ->"
        f"     element_at(transform(array({best}), b ->"
        f"       named_struct('prev', CAST(b.bi AS INT),"
        f"                    'sel', concat(acc.sel, array(b.bi)))"
        f"     ), 1)"
        f"   ), 1)"
        f" ), 1))"
    )
    selected = (
        f"CASE WHEN __n <= {B} + 2 THEN"
        f" transform(sequence(1, __n), x -> CAST(x AS INT))"
        f" ELSE concat(({fold}).sel, array(CAST(__n AS INT))) END"
    )
    return (
        arr.select(*keys, "__tm", "__vs", F.expr(selected).alias("__sel"))
        .select(*keys, F.explode("__sel").alias("idx"), "__tm", "__vs")
        .select(
            *keys,
            F.col("idx").cast("int").alias("idx"),
            F.expr("element_at(__tm, idx)").cast("long").alias("t"),
            F.expr("element_at(__vs, idx)").cast("long").alias("v"),
        )
    )
