"""Similarity search over embedding columns (extension surface).

- `cosine_topk`: brute-force exact top-k — broadcast the (small) query set
  against the corpus, JVM-side dot products via `F.zip_with`/`F.aggregate`
  (no Python UDF), window top-k per query. Linear scan of the corpus: the
  right baseline, and at 100 TB it is embarrassingly parallel with zero
  corpus shuffle (only the tiny per-query top-k combine).
- `lsh_bucket_topk`: sign-random-projection (SRP) LSH variant — corpus and
  queries hash to sign-bit buckets over deterministic pseudo-random
  hyperplanes (derived from md5, so engine-portable); candidates = same
  bucket; exact re-rank inside buckets. Scale path: bucket count grows with
  corpus size, probing cost stays ~corpus/2^bits.

All similarity math is done in double precision after an explicit cast from
the stored float32 — keeps results deterministic and comparable across
engines (float arithmetic order would not be).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SRP_BITS = 8  # 256 buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column, digits: int = 4) -> Column:
    """Cosine similarity in double precision, rounded for stability."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), digits)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k.

    Output: (query_id, neighbor_id, cos_sim, rank), self-matches excluded.
    Ranking uses the *rounded* similarity with neighbor-id tie-break so the
    result is totally ordered and engine-reproducible.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    from .core import spread

    # Norms are computed once per row BEFORE the broadcast join — inlined
    # after it they'd be re-evaluated per (query, corpus) pair, tripling the
    # arithmetic. Same expressions on the same rows → bit-identical scores.
    # spread() first so the norm pass runs on all cores, not the single
    # partition a small parquet file arrives as.
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_bucket(vec: Column, dim: int, bits: int = SRP_BITS) -> Column:
    """Sign-random-projection bucket id (0 .. 2^bits-1).

    Hyperplane h_b component j = (md5-derived int of "b:j") centered to
    ±range — deterministic, no stored model. Engine-portable (md5 only).
    """
    acc = F.lit(0).cast("long")
    for b in range(bits):
        # projection of vec onto hyperplane b
        proj = F.lit(0.0)
        comps = [
            F.lit(
                _plane_component(b, j)
            )
            for j in range(dim)
        ]
        plane = F.array(*comps)
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(proj >= 0, F.lit(2 ** b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def _plane_component(b: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1): derived
    from md5(f"{b}:{j}") — stable across runs/engines/partitions."""
    import hashlib

    h = int(hashlib.md5(f"{b}:{j}".encode()).hexdigest()[:7], 16)
    return (h / float(2 ** 28)) * 2.0 - 1.0


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SRP_BITS,
) -> DataFrame:
    """Approximate top-k: exact re-rank within the query's SRP bucket.

    Recall is bucket-limited (single-probe); the scale story is that the
    corpus is hash-partitioned by bucket once, and each query touches one
    partition. Output schema matches cosine_topk.
    """
    from .core import spread

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
        srp_bucket(F.col(vec_col), dim, bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        srp_bucket(F.col(vec_col), dim, bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


IVF_K = 16       # coarse cells
IVF_NPROBE = 2   # cells probed per query


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into `n_cells` cells, probe the query's `nprobe` nearest cells, exact
    re-rank inside.

    Centroids are the corpus vectors with id < n_cells — deterministic (no
    trained model), collected driver-side (control-plane scale: n_cells ×
    dim doubles) and inlined as literal arrays, so cell assignment is a
    PURE PROJECTION over the corpus: zero shuffle, embarrassingly parallel.
    The only joins are a broadcast of (query, probed-cell) pairs against the
    cell-assigned corpus and the tiny final top-k window per query.

    Assignment ranking uses the same rounded cosine + min-centroid-id
    tie-break as the re-rank, so results are engine-reproducible.
    """
    from .core import spread

    cents = sorted(
        (r[0], list(r[1]))
        for r in corpus.filter(F.col(id_col) < n_cells)
        .select(id_col, vec_col)
        .collect()
    )

    def cell_structs(vec: Column, nrm: Column) -> list[Column]:
        out = []
        for cid, cvec in cents:
            lit = F.array(*[F.lit(float(x)) for x in cvec])
            sim = F.round(_dot(vec, lit) / (nrm * _norm(lit)), 4)
            out.append(
                F.struct(
                    sim.alias("sim"),
                    F.lit(-cid).alias("negk"),
                    F.lit(cid).alias("cid"),
                )
            )
        return out

    def with_cells(df: DataFrame, id_alias: str, vec_alias: str, n_alias: str,
                   n_top: int) -> DataFrame:
        # materialize the norm as a column FIRST: referenced as a
        # subexpression inside all 16 cell structs it would be recomputed
        # per centroid (16 passes over the vector instead of one)
        base = df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            _norm(F.col(vec_col)).alias(n_alias),
        )
        # lexicographic struct sort on (sim, negk) ⇒ reversed = sim desc,
        # centroid id asc on ties — deterministic in any engine
        top = F.reverse(
            F.array_sort(
                F.array(*cell_structs(F.col(vec_alias), F.col(n_alias)))
            )
        )
        return base.select(
            id_alias,
            vec_alias,
            n_alias,
            F.explode(
                F.transform(F.slice(top, 1, n_top), lambda s: s["cid"])
            ).alias("cell"),
        )

    assigned = with_cells(spread(corpus), "neighbor_id", "c_vec", "c_norm", 1)
    probes = with_cells(queries, "query_id", "q_vec", "q_norm", nprobe)

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
