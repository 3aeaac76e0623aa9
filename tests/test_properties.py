"""Property-based tests (hypothesis): the custom join operators against
brute-force reference implementations on arbitrary inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from airflow_etl_spark.operators import joins, similarity, text

_key = st.sampled_from(["k1", "k2", "k3"])
_ts = st.integers(min_value=0, max_value=50)


@st.composite
def _asof_case(draw):
    left = draw(st.lists(st.tuples(_key, _ts), min_size=0, max_size=12))
    # right rows must be unique per (key, ts) — the operator's contract
    right = draw(
        st.lists(st.tuples(_key, _ts), min_size=0, max_size=12, unique=True)
    )
    return left, right


def _brute_asof(left, right, strict):
    out = []
    for k, t in left:
        cands = [
            rt for rk, rt in right if rk == k and (rt < t if strict else rt <= t)
        ]
        out.append((k, t, max(cands) if cands else None))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_asof_case(), strict=st.booleans())
def test_asof_join_matches_brute_force(spark, case, strict):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)] or [("zz", -1, -1)],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, float(t)) for k, t in right_rows] or [("zz", -99, 0.0)],
        "k string, t long, rv double",
    )
    got = sorted(
        (r.k, r.t, r.as_of_ts)
        for r in joins.asof_join(
            left, right, ["k"], "t", "t", strict=strict, how="left"
        ).collect()
    )
    want = _brute_asof(
        [(k, t) for k, t, _ in left.collect()],
        [(k, t) for k, t, _ in right.collect()],
        strict,
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False), max_size=15
    ),
    ranges=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        ),
        max_size=5,
    ),
    width=st.sampled_from([7.0, 25.0, 120.0]),
)
def test_range_join_matches_brute_force(spark, points, ranges, width):
    pdf = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(points)] or [(-1.0, -1)],
        "v double, pid long",
    )
    rdf = spark.createDataFrame(
        [(f"r{i}", min(lo, hi), max(lo, hi)) for i, (lo, hi) in enumerate(ranges)]
        or [("rz", -5.0, -4.0)],
        "band string, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.band)
        for r in joins.range_join_bucketed(pdf, rdf, "v", "lo", "hi", width).collect()
    )
    want = sorted(
        (i, f"r{j}")
        for i, v in enumerate(points)
        for j, (lo, hi) in enumerate(ranges)
        if min(lo, hi) <= v < max(lo, hi)
    )
    assert got == want


_mkey = st.sampled_from(["a", "b", "c", "d"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    target=st.lists(st.tuples(_mkey, st.integers(0, 9)), max_size=8, unique_by=lambda t: t[0]),
    source=st.lists(st.tuples(_mkey, st.integers(0, 9)), max_size=8, unique_by=lambda t: t[0]),
)
def test_upsert_matches_dict_semantics(spark, target, source):
    from airflow_etl_spark.operators.merge import upsert

    tdf = spark.createDataFrame(target or [("zz", -1)], "k string, v int")
    sdf = spark.createDataFrame(source or [("zy", -2)], "k string, v int")
    got = {r.k: r.v for r in upsert(tdf, sdf, ["k"]).collect()}
    want = dict(target or [("zz", -1)])
    want.update(dict(source or [("zy", -2)]))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    history=st.lists(
        st.tuples(_mkey, st.integers(0, 6), st.integers(0, 2)),
        max_size=14,
        unique_by=lambda t: (t[0], t[1]),  # one observation per (key, time)
    )
)
def test_scd2_compress_invariants(spark, history):
    """Intervals per key: start at first observation, non-overlapping,
    chained end==next start, exactly one open row, values change between
    consecutive intervals."""
    from airflow_etl_spark.operators.scd2 import scd2_compress

    df = spark.createDataFrame(
        history or [("zz", 0, 0)], "k string, t int, v int"
    )
    out = scd2_compress(df, ["k"], "t", ["v"]).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    rows = history or [("zz", 0, 0)]
    for k, ivals in by_key.items():
        ivals.sort(key=lambda r: r.t)
        obs = sorted((t, v) for kk, t, v in rows if kk == k)
        assert ivals[0].t == obs[0][0]            # starts at first obs
        assert ivals[-1].load_end_date is None    # one open interval
        for a, b in zip(ivals, ivals[1:]):
            assert a.load_end_date == b.t         # chained intervals
            assert a.v != b.v                     # only real changes kept
        # replaying the intervals reproduces each observation's value
        for t, v in obs:
            active = [r for r in ivals if r.t <= t and (r.load_end_date is None or t < r.load_end_date)]
            assert len(active) == 1 and active[0].v == v


# ---------------------------------------------------------------- txn ----

_txn_op = st.one_of(
    st.tuples(st.just("commit"), st.lists(st.integers(0, 99), max_size=6)),
    st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=4)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_txn_op, min_size=1, max_size=5))
def test_txn_sequences_match_model(spark, tmp_path_factory, ops):
    """Any sequence of commits/appends must leave the table equal to the
    obvious list model — snapshot replace + row append semantics hold under
    arbitrary interleavings (single process)."""
    from airflow_etl_spark.sources import read_table, txn

    path = str(tmp_path_factory.mktemp("txnprop") / "t")
    model: list[int] = []
    exists = False
    for op, vals in ops:
        df = spark.createDataFrame([(v,) for v in vals] or [], "v int")
        if op == "commit":
            txn.commit(df, path)
            model = list(vals)
        else:
            txn.append(df, path)  # creates the table when absent
            model = (model + list(vals)) if exists else list(vals)
        exists = True
    got = sorted(r.v for r in read_table(spark, path).collect())
    assert got == sorted(model)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_asof_case(), strict=st.booleans(), salt=st.sampled_from([2, 4, 7]))
def test_salted_asof_matches_unsalted(spark, case, strict, salt):
    """The skew-salted as-of join must be bit-identical to the unsalted
    plan on arbitrary inputs (right rows replicate across salts, so every
    salt partition sees the full right history)."""
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)] or [("zz", -1, -1)],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, float(t)) for k, t in right_rows] or [("zz", -99, 0.0)],
        "k string, t long, rv double",
    )
    base = sorted(
        map(tuple, joins.asof_join(
            left, right, ["k"], "t", "t", strict=strict, how="left"
        ).collect())
    )
    salted = sorted(
        map(tuple, joins.asof_join(
            left, right, ["k"], "t", "t", strict=strict, how="left", salt=salt
        ).collect())
    )
    assert salted == base


# ---------------------------------------------------------------- corpus --

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=30),
    budget=st.integers(min_value=100, max_value=1000),
    n_shards=st.integers(min_value=1, max_value=4),
)
def test_pack_ffd_properties(spark, sizes, budget, n_shards):
    """FFD packing on arbitrary size distributions: exactly-once
    assignment; every bin within budget unless a singleton holding an
    oversized doc; reported fills consistent."""
    from collections import defaultdict

    from airflow_etl_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, n long"
    )
    rows = corpus.pack_sequences_ffd(
        df, "n", budget, n_shards=n_shards
    ).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(sizes)))
    fills = defaultdict(int)
    counts = defaultdict(int)
    for r in rows:
        fills[(r.shard, r.bin_id)] += r.n_tokens
        counts[(r.shard, r.bin_id)] += 1
    for key, tot in fills.items():
        assert tot <= budget or counts[key] == 1
    for r in rows:
        assert r.bin_fill == fills[(r.shard, r.bin_id)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(
        st.floats(min_value=0.05, max_value=10.0, allow_nan=False),
        min_size=1, max_size=4,
    ),
    n=st.integers(min_value=20, max_value=80),
)
def test_hash_split_partitions_rows_exactly_once(spark, weights, n):
    """hash_split with arbitrary positive weights: every row lands in
    exactly one split, and split names are the declared ones."""
    from airflow_etl_spark.operators import corpus

    names = [f"s{i}" for i in range(len(weights))]
    splits = tuple(zip(names, weights))
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    rows = corpus.hash_split(df, splits=splits).collect()
    assert len(rows) == n
    assert {r.split for r in rows} <= set(names)
    # deterministic: a second evaluation agrees row-for-row
    again = corpus.hash_split(df, splits=splits).collect()
    assert {(r.doc_id, r.split) for r in rows} == {
        (r.doc_id, r.split) for r in again
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]), st.integers(-50, 50)),
        min_size=0, max_size=20,
    ),
    keep=st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]), st.integers(-50, 50)),
        min_size=0, max_size=20,
    ),
)
def test_incremental_refresh_equals_recompute_property(
    spark, tmp_path_factory, vals, keep
):
    """For ANY v1 multiset and ANY v2 multiset, refreshing the v1 mart
    with snapshot_diff(v1→v2) equals aggregating v2 directly."""
    from airflow_etl_spark.operators.merge import incremental_agg_refresh
    from airflow_etl_spark.sources import txn

    p = str(tmp_path_factory.mktemp("cdcprop") / "t")
    v1 = spark.createDataFrame(vals or [("zz", 0)], "g string, v long")
    v2 = spark.createDataFrame(keep or [("zz", 0)], "g string, v long")
    txn.commit(v1, p, keep_versions=3)
    txn.commit(v2, p, keep_versions=3)
    mart1 = v1.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_value")
    )
    inc = {
        (r.g, r.n_rows, int(r.sum_value))
        for r in incremental_agg_refresh(
            mart1, txn.snapshot_diff(spark, p), ["g"], "v"
        ).collect()
    }
    direct = {
        (r.g, r.n_rows, int(r.sum_value))
        for r in v2.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_value")
        ).collect()
    }
    assert inc == direct


_kv_rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 99)), max_size=5
)
_mor_op = st.one_of(
    st.tuples(st.just("commit"), _kv_rows),
    st.tuples(st.just("append"), _kv_rows.filter(len)),
    st.tuples(st.just("delete"), st.lists(st.integers(0, 20), min_size=1, max_size=5)),
    st.tuples(st.just("upsert"), _kv_rows.filter(len)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_mor_op, min_size=1, max_size=6))
def test_mor_sequences_match_multiset_model(spark, tmp_path_factory, ops):
    """Any interleaving of commit / append / merge-on-read delete / MoR
    upsert must equal the obvious multiset model: delete removes every
    current row of the key, upsert replaces the key's rows with the
    source rows, append never loses anything. This pins the sequence-
    number semantics (deletes govern only older files) under arbitrary
    op orders."""
    from airflow_etl_spark.sources import txn

    path = str(tmp_path_factory.mktemp("morprop") / "t")
    model: list[tuple[int, int]] = []
    exists = False
    for op, data in ops:
        if op != "delete":
            df = spark.createDataFrame(list(data) or [], "k int, v int")
        if op == "commit":
            txn.commit(df, path)
            model, exists = list(data), True
        elif op == "append":
            txn.append_files(df, path)
            model = (model + list(data)) if exists else list(data)
            exists = True
        elif op == "delete":
            if not exists:
                continue
            keys = spark.createDataFrame([(k,) for k in data], "k int")
            txn.delete_keys(keys, path, ["k"])
            model = [r for r in model if r[0] not in set(data)]
        else:  # upsert
            if not exists:
                txn.commit(df, path)
                model, exists = list(data), True
            else:
                txn.upsert_mor(df, path, ["k"])
                ks = {k for k, _v in data}
                model = [r for r in model if r[0] not in ks] + list(data)
    if not exists:  # e.g. a lone delete against a never-created table
        return
    got = sorted((r.k, r.v) for r in txn.read(spark, path).collect())
    assert got == sorted(model)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(0, 500), min_size=1, max_size=60),
    probes=st.lists(st.integers(0, 600), min_size=1, max_size=4),
)
def test_bloom_point_reads_never_lose_rows(spark, tmp_path_factory, keys, probes):
    """For ANY key set and ANY probe (present or absent), the bloom-pruned
    point read equals the unpruned filter — pruning may only skip files
    that provably lack the key."""
    from airflow_etl_spark.sources import txn

    path = str(tmp_path_factory.mktemp("bloomprop") / "t")
    df = spark.createDataFrame([(k,) for k in keys], "k int")
    txn.commit(df.repartition(4, "k"), path, bloom_cols=["k"])
    for p in probes:
        got = sorted(r.k for r in txn.read_point(spark, path, "k", p).collect())
        want = [k for k in sorted(keys) if k == p]
        assert got == want


def test_semantic_neardup_single_cell_matches_bruteforce_reference(spark):
    """With ONE cell, semantic_neardup degenerates to exact threshold
    dedup — its (threshold filter + connected components + keep-min-id)
    pipeline must match an independent pure-Python union-find over
    brute-force cosines, across several seeded random geometries."""
    import math
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n, dim, thr = 40, 8, 0.9
        # half the points are jittered copies of a few anchors (dup
        # clusters), half are independent
        anchors = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(5)]
        vecs = {}
        for i in range(n):
            if i % 2 == 0:
                a = anchors[rng.randrange(5)]
                vecs[i] = [x + rng.gauss(0, 0.02) for x in a]
            else:
                vecs[i] = [rng.gauss(0, 1) for _ in range(dim)]

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return round(d / (na * nb), 4)

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for i in range(n):
            for j in range(i + 1, n):
                if cos(vecs[i], vecs[j]) >= thr:
                    union(i, j)
        # canonicalize: component = min member id
        members = {}
        for i in range(n):
            members.setdefault(find(i), []).append(i)
        expect = {}
        for comp in members.values():
            root = min(comp)
            for i in comp:
                expect[i] = (root, i == root)

        emb = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<double>",
        )
        out = similarity.semantic_neardup(
            emb, threshold=thr, n_cells=1,
            centroids=[(0, [1.0] + [0.0] * (dim - 1))],
        )
        got = {r.id: (r.component, r.is_kept) for r in out.collect()}
        assert got == expect, f"seed {seed}"


def test_classifier_matches_pure_python_reference(spark):
    """classifier_score vs an independent pure-Python scorer using the
    same published construction (md5 h28 bucket, Knuth-hash weights,
    sequential mean fold, sigmoid)."""
    import hashlib
    import math
    import re

    texts = [
        (0, "The quick brown fox JUMPS over   the lazy dog"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one"),
        (3, "  Repeated repeated REPEATED words words words  "),
    ]

    def h28(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    def ref(text, dim=512):
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ")
        acc = 0.0
        for t in toks:
            j = h28(t) % dim
            acc += ((j + 1) * 2654435761 % 1000) / 1000.0 - 0.5
        margin = round(acc / len(toks), 4)
        prob = round(1.0 / (1.0 + math.exp(-8.0 * margin)), 4)
        return len(toks), margin, prob, prob >= 0.5

    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.margin, r.prob, r.pred_quality)
        for r in text.classifier_score(docs).collect()
    }
    for i, t in texts:
        assert got[i] == ref(t), (i, got[i], ref(t))


def test_chunkers_tile_documents_property(spark):
    """Property over pseudo-random documents: BOTH chunkers (fixed-stride
    and content-defined) tile every document exactly — concatenating
    chunk texts in order reproduces the normalized token stream, with no
    gap, overlap error, or dropped tail."""
    import random

    from airflow_etl_spark.operators.text import (
        chunk_content_defined,
        chunk_windows,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 200))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    toks = {i: t.split(" ") for i, t in docs}

    for out, overlapping in (
        (chunk_windows(df, chunk_tokens=16, overlap=3), True),
        (chunk_content_defined(df, divisor=8), False),
    ):
        by_doc: dict[int, list] = {}
        for r in out.collect():
            by_doc.setdefault(r["id"], []).append(r)
        assert set(by_doc) == set(toks)
        for d, rs in by_doc.items():
            rs.sort(key=lambda r: r["chunk_idx"])
            expect = toks[d]
            if overlapping:
                stride = 13
                for r in rs:
                    assert r["start_token"] == r["chunk_idx"] * stride
                    assert r["chunk_text"].split(" ") == expect[
                        r["start_token"]: r["start_token"] + r["n_chunk_tokens"]
                    ]
                covered = set()
                for r in rs:
                    covered |= set(
                        range(r["start_token"], r["start_token"] + r["n_chunk_tokens"])
                    )
                assert covered == set(range(len(expect)))
            else:
                pos = 0
                for r in rs:
                    assert r["start_token"] == pos
                    assert r["chunk_text"].split(" ") == expect[
                        pos: pos + r["n_chunk_tokens"]
                    ]
                    pos += r["n_chunk_tokens"]
                assert pos == len(expect)


def test_batched_bpe_property_random_corpora(spark):
    """Property: on pseudo-random small corpora, bpe_train(batch=k)
    reproduces the pure-Python batched reference exactly for several
    (corpus, batch) draws — merges AND final vocabulary."""
    import random

    from pyspark.sql import Row

    from airflow_etl_spark.operators import bpe
    from tests.test_bpe import _py_bpe_batched

    rng = random.Random(7)
    letters = "abcdef"
    for trial in range(3):
        words = [
            "".join(rng.choice(letters) for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        docs = [
            Row(doc_id=i, text=" ".join(rng.choice(words) for _ in range(12)))
            for i in range(10)
        ]
        df = spark.createDataFrame(docs)
        batch = rng.choice([2, 4, 8])
        merges, vocab = bpe.bpe_train(df, n_merges=24, batch=batch)
        wc = {r["word"]: r["cnt"] for r in bpe.word_counts(df).collect()}
        ref_merges, ref_vocab = _py_bpe_batched(wc, 24, batch)
        assert merges == ref_merges, (trial, batch)
        got = {r["word"]: list(r["tokens"]) for r in vocab.collect()}
        assert got == ref_vocab, (trial, batch)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0,
                      allow_nan=False, allow_infinity=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=3, max_size=20,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_kmedoids_matches_pure_python_replay(spark, vecs, k):
    """kmedoids_assign vs an independent pure-python replay of its spec
    on arbitrary float32 vectors."""
    import math
    import struct as _s

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.medoid_id: (r.n_members, r.wss)
           for r in similarity.kmedoids_assign(df, k=k).collect()}

    def f32(x):
        return _s.unpack("f", _s.pack("f", x))[0]

    qv = {i: [int(math.floor(f32(x) * 1000.0 + 0.5)) for x in v]
          for i, v in enumerate(vecs)}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seeds = [i for i in sorted(qv) if i < k]
    a1 = {i: min(seeds, key=lambda s: (d2(qv[i], qv[s]), s)) for i in qv}
    meds = []
    for s in seeds:
        mem = [i for i, c in a1.items() if c == s]
        if mem:
            meds.append(min(
                mem, key=lambda m: (sum(d2(qv[m], qv[j]) for j in mem), m)
            ))
    a2 = {i: min(meds, key=lambda m: (d2(qv[i], qv[m]), m)) for i in qv}
    want = {}
    for m in meds:
        mem = [i for i, c in a2.items() if c == m]
        if mem:
            want[m] = (len(mem), sum(d2(qv[i], qv[m]) for i in mem))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=30),
                  min_size=1, max_size=200),
    phi_pct=st.integers(min_value=5, max_value=50),
    parts=st.integers(min_value=1, max_value=8),
)
def test_heavy_hitters_matches_groupby_having(spark, keys, phi_pct, parts):
    """heavy_hitters == groupBy+HAVING on arbitrary key multisets under
    arbitrary partitionings — the exactness property, including at the
    default minimum capacity."""
    import math
    from collections import Counter

    from airflow_etl_spark.operators import checks

    phi = phi_pct / 100.0
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(parts)
    got = {(r.k, r.cnt) for r in checks.heavy_hitters(df, "k", phi=phi).collect()}
    thr = math.ceil(phi * float(len(keys)))
    want = {(k, c) for k, c in Counter(keys).items() if c >= thr}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    ranks_a=st.lists(st.integers(min_value=0, max_value=40),
                     min_size=0, max_size=12, unique=True),
    ranks_b=st.lists(st.integers(min_value=0, max_value=40),
                     min_size=0, max_size=12, unique=True),
    k=st.integers(min_value=1, max_value=8),
)
def test_rrf_fuse_matches_brute_force(spark, ranks_a, ranks_b, k):
    """rrf_fuse vs a dict-based reference on arbitrary id sets: scores,
    selection, and deterministic (score desc, id asc) ordering."""
    from airflow_etl_spark.operators import retrieval

    a = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ranks_a)] or [(-1, 1)],
        "id long, rank int",
    )
    b = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ranks_b)] or [(-1, 1)],
        "id long, rank int",
    )
    la = {i: r + 1 for r, i in enumerate(ranks_a)} or {-1: 1}
    lb = {i: r + 1 for r, i in enumerate(ranks_b)} or {-1: 1}
    scores = {
        i: round(
            (1.0 / (60.0 + la[i]) if i in la else 0.0)
            + (1.0 / (60.0 + lb[i]) if i in lb else 0.0),
            6,
        )
        for i in set(la) | set(lb)
    }
    order = sorted(scores, key=lambda i: (-scores[i], i))[:k]
    got = [(r.id, r.rrf, r.rank) for r in sorted(
        retrieval.rrf_fuse([a, b], k=k).collect(), key=lambda r: r.rank
    )]
    want = [(i, scores[i], n + 1) for n, i in enumerate(order)]
    assert got == want


# ------------------------------------------- interval overlap (r7 s4) --
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 300)),
        min_size=1,
        max_size=25,
    ),
    width=st.sampled_from([1, 7, 100, 1000]),
)
def test_interval_overlap_matches_naive_for_any_width(spark, iv, width):
    """Banded overlap join == naive quadratic non-equi join for random
    closed intervals under ANY bucket width (width only shifts the
    replication/false-candidate trade, never the result), each
    qualifying pair exactly once."""
    from airflow_etl_spark.operators.joins import interval_overlap_join

    rows = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(iv)]
    df = spark.createDataFrame(rows, "iid int, st long, en long")
    got = sorted(
        (r.iid_a, r.iid_b)
        for r in interval_overlap_join(df, df, "st", "en", width).collect()
    )
    want = sorted(
        (a[0], b[0])
        for a in rows
        for b in rows
        if a[1] <= b[2] and b[1] <= a[2]
    )
    assert got == want


# ------------------------------------------- two-sided join IVM (r7 s4) --
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    steps=st.lists(
        st.tuples(
            st.sampled_from(["append_a", "append_b", "del_a", "del_b"]),
            st.integers(0, 4),  # join-key index
            st.integers(1, 50),  # measure / id seed
        ),
        min_size=1,
        max_size=5,
    )
)
def test_join_ivm_random_mutation_sequence(spark, steps):
    """Random interleavings of appends and MoR deletes on BOTH sides of
    a join view, refreshed after every step, must always equal the full
    recompute — the signed product rule has no order-dependent state."""
    import atexit
    import shutil
    import tempfile

    from airflow_etl_spark.operators import matview
    from airflow_etl_spark.sources import txn
    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="mv_prop_")
    atexit.register(shutil.rmtree, root, True)
    a, b, mv = root + "/a", root + "/b", root + "/mv"
    keys = [f"k{i}" for i in range(5)]
    txn.commit(
        spark.createDataFrame(
            [(keys[0], 1, 1), (keys[1], 2, 2)], "ak string, av long, aid long"
        ),
        a,
        keep_versions=10,
    )
    txn.commit(
        spark.createDataFrame(
            [(keys[0], "g0", 1), (keys[1], "g1", 2), (keys[2], "g2", 3)],
            "bk string, grp string, bid long",
        ),
        b,
        keep_versions=10,
    )
    matview.create_join(
        spark, a, b, mv, on=[("ak", "bk")], keys=["grp"], sums={"s": "av"}
    )
    next_id = 100
    live_b_ids = [1, 2, 3]
    for op, ki, seed in steps:
        next_id += 1
        if op == "append_a":
            txn.append_files(
                spark.createDataFrame(
                    [(keys[ki], seed, next_id)], "ak string, av long, aid long"
                ),
                a,
            )
        elif op == "append_b":
            txn.append_files(
                spark.createDataFrame(
                    [(keys[ki], f"g{seed % 3}", next_id)],
                    "bk string, grp string, bid long",
                ),
                b,
            )
            live_b_ids.append(next_id)
        elif op == "del_a":
            txn.delete_keys(
                spark.createDataFrame([(seed % next_id,)], "aid long"), a, ["aid"]
            )
        else:
            victim = live_b_ids[seed % len(live_b_ids)]
            txn.delete_keys(
                spark.createDataFrame([(victim,)], "bid long"), b, ["bid"]
            )
        matview.refresh_join(spark, mv)
        fa, fb = txn.read(spark, a), txn.read(spark, b)
        want = sorted(
            map(
                tuple,
                fa.join(fb, fa["ak"] == fb["bk"])
                .groupBy("grp")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("mv_n"),
                    F.sum(F.coalesce("av", F.lit(0))).alias("s"),
                )
                .collect(),
            )
        )
        got = sorted(map(tuple, txn.read(spark, mv).collect()))
        assert got == want, f"after {op}: {got} != {want}"


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    steps=st.lists(
        st.tuples(
            st.sampled_from(["append", "delete", "rewrite"]),
            st.integers(0, 3),   # group-key index
            st.integers(1, 99),  # measure seed
        ),
        min_size=1,
        max_size=5,
    )
)
def test_single_matview_random_mutation_sequence(spark, steps):
    """Random appends, MoR key deletes, and full rewrites against a
    single-base roll-up, refreshed after every step, must always equal
    the full recompute — fast path and differential path interleaved in
    any order."""
    import atexit
    import shutil
    import tempfile

    from airflow_etl_spark.operators import matview
    from airflow_etl_spark.sources import txn
    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="mv_prop1_")
    atexit.register(shutil.rmtree, root, True)
    base, mv = root + "/b", root + "/mv"
    keys = [f"k{i}" for i in range(4)]
    txn.commit(
        spark.createDataFrame(
            [(keys[0], 1, 1), (keys[1], 2, 2)], "k string, v long, id long"
        ),
        base,
        keep_versions=10,
    )
    matview.create(spark, base, mv, ["k"], {"s": "v"})
    next_id = 10
    for op, ki, seed in steps:
        next_id += 1
        if op == "append":
            txn.append_files(
                spark.createDataFrame(
                    [(keys[ki], seed, next_id)], "k string, v long, id long"
                ),
                base,
            )
        elif op == "delete":
            txn.delete_keys(
                spark.createDataFrame([(seed % next_id,)], "id long"),
                base, ["id"],
            )
        else:  # copy-on-write rewrite: bump every v for one key
            cur = txn.read(spark, base).withColumn(
                "v",
                F.when(F.col("k") == keys[ki], F.col("v") + seed).otherwise(
                    F.col("v")
                ),
            )
            txn.commit(cur, base, keep_versions=10)
        matview.refresh(spark, mv)
        want = sorted(
            map(
                tuple,
                txn.read(spark, base)
                .groupBy("k")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("mv_n"),
                    F.sum(F.coalesce("v", F.lit(0))).alias("s"),
                )
                .collect(),
            )
        )
        got = sorted(map(tuple, txn.read(spark, mv).collect()))
        assert got == want, f"after {op}: {got} != {want}"


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vs=st.lists(st.integers(min_value=-100000, max_value=100000),
                min_size=1, max_size=30),
)
def test_holt_fixed_matches_replay_on_arbitrary_series(spark, vs):
    """holt_fixed vs the documented truncating recurrence on arbitrary
    integer series, including sign flips and single points."""
    from datetime import datetime

    from airflow_etl_spark.operators.timeseries import holt_fixed

    rows = [("k", datetime(2024, 1, 1, 0, 0, 0, i), i, v)
            for i, v in enumerate(vs)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v long"
    )
    got = holt_fixed(df, ["k"], "ts", "id", "v").collect()[0]

    def tdiv(a, w=4):
        return a // w if a >= 0 else -((-a) // w)

    l, t = vs[0], 0
    for x in vs[1:]:
        l2 = tdiv(x + 3 * (l + t))
        t2 = tdiv((l2 - l) + 3 * t)
        l, t = l2, t2
    assert (got.n_events, got.level_v, got.trend_v, got.forecast_v) == (
        len(vs), l, t, l + t
    )


@given(
    seq=st.lists(st.integers(min_value=0, max_value=255), min_size=0,
                 max_size=2000),
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_property(seq):
    """_lzw_encode → _lzw_decode is the identity on ARBITRARY byte
    sequences (hypothesis): covers degenerate runs, alternations that
    provoke the KwKwK code, and dictionary growth across width bumps."""
    from airflow_etl_spark.operators import multimodal as M

    assert M._lzw_decode(M._lzw_encode(seq, 8), 8) == seq


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=18),
)
@settings(max_examples=40, deadline=None)
def test_gif_container_roundtrip_property(seed, w, h):
    """gif_bytes → parse_gif is pixel-exact for arbitrary dimensions and
    seeds — odd seeds exercise the 4-pass interlace at every height,
    including the degenerate 1-2 row cases where later passes are
    empty."""
    from airflow_etl_spark.operators import multimodal as M

    gw, gh, rgb = M.parse_gif(M.gif_bytes(seed, w, h))
    assert (gw, gh) == (w, h)
    assert rgb == bytes(
        (seed * 31 + x * 7 + y * 13 + c * 5) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
