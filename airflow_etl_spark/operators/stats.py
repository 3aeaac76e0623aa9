"""Closed-form statistics over exact integer moments — group-wise OLS
trend lines and pairwise Pearson correlation, each ONE map-side-combined
aggregation pass.

Why exact moments: distributed float accumulation is fold-order
dependent, so float covariances are not reproducible across engines (or
retries). Here the caller supplies INTEGER-valued columns (cents, days,
basis points — the registry's portability conventions) and every moment
(n, Σx, Σy, Σxy, Σx², Σy²) accumulates in DECIMAL(38,0): exact,
associative, map-side combinable, immune to the BIGINT overflow a
100 TB Σxy would hit (ANSI mode faults at 2^63; decimal headroom is
10^38). Final ratios convert the EXACT moments to IEEE doubles once —
correctly-rounded conversion and division are deterministic given
identical inputs, so Spark and an oracle engine produce identical
floor(ratio * 1e6) longs with no round-boundary coin flips.

Scale shape: a group-wise OLS over 100 TB is one partial-aggregated
exchange carrying six decimals per group; the correlation matrix is ONE
pass producing a single row of k + k(k+1)/2 sums (no per-pair scans, no
unpivot shuffle of the data), then a literal explode of pair stats.

Reference parity: the reference has no regression/correlation surface —
this extends the diagnostics family (SURVEY §2 A-rows) with the trend
and redundancy checks a feature-engineering pipeline runs before
training.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame, functions as F

#: parts-per-million fixed point for emitted ratios
PPM = 1_000_000


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _ppm(x: Column) -> Column:
    return F.floor(x * PPM).cast("long")


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares line y = a + b*x over integer-valued
    columns. Returns (group..., n, slope_ppm, intercept_ppm, r2_ppm):
    b and a in parts-per-million, plus the fit's R². Closed form over
    exact decimal moments:

        b = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²)
        a = (Σy·den - num·Σx) / (n·den)
        R² = num² / (den · (nΣy² - (Σy)²))

    Degenerate groups (constant x, or constant y for R²) yield NULL
    ppm values rather than a division fault."""
    x, y = _dec(F.col(x_col)), _dec(F.col(y_col))
    sums = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = _dec(F.col("n"))
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    eyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    inum = F.col("sy") * den - num * F.col("sx")
    num_d, den_d = num.cast("double"), den.cast("double")
    eyy_d = eyy.cast("double")
    return sums.select(
        *group_cols,
        "n",
        F.when(den != 0, _ppm(num_d / den_d)).alias("slope_ppm"),
        F.when(
            den != 0, _ppm(inum.cast("double") / (n * den).cast("double"))
        ).alias("intercept_ppm"),
        F.when(
            (den != 0) & (eyy != 0), _ppm(num_d * num_d / (den_d * eyy_d))
        ).alias("r2_ppm"),
    )


def corr_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation of integer-valued columns in ONE
    aggregation pass: a single row of k sums, k squares, and k(k+1)/2
    cross products, exploded to (col_x, col_y, n, corr_ppm) pair rows
    driver-free via a literal projection union. corr in ppm:

        r = (nΣxy - ΣxΣy) / sqrt((nΣx² - (Σx)²)(nΣy² - (Σy)²))

    sqrt over a double is correctly rounded (IEEE), so parity holds.
    Constant columns yield NULL corr for their pairs."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(_dec(F.col(c))).alias(f"s_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(_dec(F.col(a)) * _dec(F.col(b))).alias(f"p_{a}_{b}"))
    for c in cols:
        aggs.append(F.sum(_dec(F.col(c)) * _dec(F.col(c))).alias(f"p_{c}_{c}"))
    one = df.agg(*aggs)

    n = _dec(F.col("n"))

    def var_term(c: str) -> Column:
        return n * F.col(f"p_{c}_{c}") - F.col(f"s_{c}") * F.col(f"s_{c}")

    # ONE select over the single agg row: pair stats as a literal struct
    # array, exploded — a per-pair union would re-plan (and re-run) the
    # aggregation once per branch
    structs = []
    for a, b in combinations(cols, 2):
        num = (n * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
        da, db = var_term(a), var_term(b)
        corr = F.when(
            (da != 0) & (db != 0),
            _ppm(
                num.cast("double")
                / F.sqrt(da.cast("double") * db.cast("double"))
            ),
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n"),
                corr.cast("long").alias("corr_ppm"),
            )
        )
    return one.select(
        F.explode(F.array(*structs)).alias("pair")
    ).select("pair.col_x", "pair.col_y", "pair.n", "pair.corr_ppm")


def target_encode_loo(
    df: DataFrame,
    cat_cols: list[str],
    y_col: str,
    out_col: str = "loo_mean",
) -> DataFrame:
    """LEAVE-ONE-OUT target encoding of a categorical key: each row gets
    the mean target of the OTHER rows sharing its category —
    (Σy_cat − y_row) / (n_cat − 1) — the standard leakage guard (a
    plain category mean lets every row see its own label; at training
    time that overfits exactly the rare categories that matter).

    EXACT arithmetic end to end: y must be integer-valued (cents);
    sums accumulate in DECIMAL(38,0) and the mean is emitted as an
    exact floor division ((a − a mod b) / b — divisible by
    construction, so the decimal division is lossless), never a
    float. Singleton categories (n=1) yield NULL: there is no
    leave-one-out evidence, and imputing the global mean silently is
    how category leakage audits get fooled — callers impute
    explicitly.

    Scale shape: ONE partial-aggregated exchange on the category key
    (six-figure cardinality is fine; the exchange carries (Σy, n)
    partials) + a broadcast-eligible join back. No window over the fact
    table — a Window.partitionBy would sort the whole corpus inside
    each category; the groupBy+join shape only shuffles the aggregate."""
    y = _dec(F.col(y_col))
    sums = df.groupBy(*cat_cols).agg(
        F.sum(y).alias("__sy"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    joined = df.join(sums, cat_cols, "left")
    a = F.col("__sy") - y
    b = _dec(F.col("__n") - 1)
    loo = ((a - F.pmod(a, b)) / b).cast("long")
    return joined.withColumn(
        out_col, F.when(F.col("__n") > 1, loo)
    ).drop("__sy", "__n")


def _floor_div(a: Column, b: Column) -> Column:
    """Exact floor division of non-negative decimals: (a − a mod b) / b
    is divisible by construction, so the decimal division is lossless."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def woe_bins(
    df: DataFrame,
    value_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence-style binned odds of a binary label over an
    integer-valued feature: equal-width bins over the GLOBAL [min, max],
    per bin (n, n_pos) and the odds ratio

        odds_ppm = floor( (pos_i / pos_total) / (neg_i / neg_total) · 1e6 )

    computed as one exact integer floor division (decimal headroom —
    pos_i·neg_total·1e6 overflows BIGINT at corpus scale). WOE itself is
    ln(odds); ln is a client-side monotone transform and the only
    non-portable step (libm last-ulp), so the operator emits the exact
    ratio and leaves the log to the consumer. Bins with zero positives
    or zero negatives yield NULL — silent additive smoothing is a
    modeling decision, not a default.

    Shape: two passes (global min/max, then the bin aggregate — the
    classic two-scan histogram; data-independent bin edges make it one)
    with the 1-row extrema crossJoin-broadcast; the bin relation is
    n_bins rows, totals ride a second tiny broadcast. Returns
    (bin, lo_v, n, n_pos, odds_ppm)."""
    v = F.col(value_col)
    lab = F.col(label_col).cast("int")
    mm = df.agg(
        F.min(v).cast("long").alias("__mn"),
        F.max(v).cast("long").alias("__mx"),
    )
    binned = df.select(v.alias("__v"), lab.alias("__y")).crossJoin(
        F.broadcast(mm)
    )
    width = F.col("__mx") - F.col("__mn") + 1
    bin_id = F.expr(f"((__v - __mn) * {n_bins}) DIV (__mx - __mn + 1)")
    per_bin = (
        binned.groupBy(bin_id.cast("long").alias("bin"))
        .agg(
            F.min("__mn").alias("__mn"),
            F.min(width).alias("__w"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
        )
        .withColumn(
            "lo_v",
            (F.col("__mn") + _floor_div(
                _dec(F.col("bin") * F.col("__w")), _dec(F.lit(n_bins))
            )).cast("long"),
        )
    )
    totals = per_bin.agg(
        F.sum("n_pos").cast("long").alias("__tp"),
        (F.sum("n") - F.sum("n_pos")).cast("long").alias("__tn"),
    )
    out = per_bin.crossJoin(F.broadcast(totals))
    n_neg = F.col("n") - F.col("n_pos")
    odds = F.when(
        (F.col("n_pos") > 0) & (n_neg > 0)
        & (F.col("__tp") > 0) & (F.col("__tn") > 0),
        _floor_div(
            _dec(F.col("n_pos")) * _dec(F.col("__tn")) * _dec(F.lit(PPM)),
            _dec(n_neg) * _dec(F.col("__tp")),
        ),
    )
    return out.select(
        "bin", "lo_v", "n", "n_pos", odds.alias("odds_ppm")
    )
