"""SemDeDup (operators/semdedup.py): the greedy within-cluster
cosine kept-set is pinned against an independent numpy reference,
edge eps values, overflow behavior, and partitioning independence."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from finance_etl_system_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
)
from finance_etl_system_spark.operators.semdedup import semantic_dedup


def _dup_blobs_df(spark, *, seed=7):
    """Two separated blobs where some vectors are near-copies of
    others (same direction, tiny perturbation) — known semantic
    duplicates under cosine."""
    rng = np.random.RandomState(seed)
    base = {0: np.array([4.0, 0.0, 0.0]), 1: np.array([0.0, 4.0, 0.0])}
    rows = []
    vid = 0
    for b, c in base.items():
        originals = []
        for _ in range(10):
            v = c + 0.6 * rng.randn(3)
            originals.append(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        # 5 near-duplicates: tiny angular perturbation of an original
        for j in range(5):
            v = originals[j] * (1.0 + 0.001 * rng.randn())
            v = v + 0.0005 * rng.randn(3)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _reference_kept(assigned_rows, eps):
    """Independent greedy reference: per cluster, (round(dist2,9)
    DESC, vec_id ASC) order, keep iff max cosine to kept < eps."""
    by_cluster = {}
    for r in assigned_rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    kept = set()
    for rows in by_cluster.values():
        rows = sorted(
            rows, key=lambda r: (-round(r["dist2"], 9), r["vec_id"])
        )
        kept_vecs = []
        for r in rows:
            x = np.asarray(r["embedding"], dtype=np.float64)
            n = np.linalg.norm(x)
            xn = x / n if n else x
            if kept_vecs and max(
                float(xn @ k) for k in kept_vecs
            ) >= eps:
                continue
            kept.add(r["vec_id"])
            kept_vecs.append(xn)
    return kept


def _fit_assign(spark, df):
    model = kmeans_fit(df, k=2, max_iter=8)
    return kmeans_assign(df, model.centroids)


def test_semdedup_matches_numpy_reference(spark):
    df = _dup_blobs_df(spark)
    assigned = _fit_assign(spark, df)
    rows = assigned.select(
        "vec_id", "embedding", "cluster", "dist2"
    ).collect()
    for eps in (0.9, 0.99, 0.9995):
        want = _reference_kept(rows, eps)
        got = {
            r["vec_id"]
            for r in semantic_dedup(assigned, eps=eps)
            .filter("kept")
            .collect()
        }
        assert got == want, f"eps={eps}"


def test_semdedup_drops_planted_duplicates(spark):
    """The 10 planted near-copies must be pruned at a tight eps while
    most originals survive."""
    df = _dup_blobs_df(spark)
    assigned = _fit_assign(spark, df)
    out = semantic_dedup(assigned, eps=0.9995)
    n_kept = out.filter("kept").count()
    assert 15 <= n_kept <= 22  # 30 total, 10 planted dups
    assert out.count() == 30


def test_semdedup_eps_extremes(spark):
    df = _dup_blobs_df(spark)
    assigned = _fit_assign(spark, df)
    # eps above any cosine: everything kept
    assert semantic_dedup(assigned, eps=1.5).filter("kept").count() == 30
    # eps below any cosine: exactly one survivor per cluster
    one = semantic_dedup(assigned, eps=-1.5)
    per = one.filter("kept").groupBy("cluster").count().collect()
    assert all(r["count"] == 1 for r in per) and len(per) == 2


def test_semdedup_partitioning_independent(spark):
    df = _dup_blobs_df(spark)
    assigned = _fit_assign(spark, df).localCheckpoint(eager=True)
    a = {
        r["vec_id"]
        for r in semantic_dedup(assigned.repartition(13), eps=0.99)
        .filter("kept")
        .collect()
    }
    b = {
        r["vec_id"]
        for r in semantic_dedup(assigned.coalesce(1), eps=0.99)
        .filter("kept")
        .collect()
    }
    assert a == b


def test_semdedup_overflow_keeps_rows_verbatim(spark):
    df = _dup_blobs_df(spark)
    assigned = _fit_assign(spark, df)
    out = semantic_dedup(assigned, eps=0.9, max_cluster=3)
    flagged = out.filter("overflow")
    # every cluster here exceeds 3 rows -> all flagged, all kept
    assert flagged.count() == 30
    assert flagged.filter(~F.col("kept")).count() == 0


def test_semdedup_zero_vector_safe(spark):
    rows = [
        (1, [0.0, 0.0]),
        (2, [0.0, 0.0]),
        (3, [1.0, 0.0]),
        (4, [1.0, 0.001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = df.withColumn("cluster", F.lit(0)).withColumn(
        "dist2", F.lit(0.0)
    )
    out = semantic_dedup(assigned, eps=0.999)
    kept = {r["vec_id"] for r in out.filter("kept").collect()}
    # zero vectors have sim 0 to everything -> both kept; the two
    # near-parallel unit vectors collapse to one survivor
    assert {1, 2}.issubset(kept)
    assert len(kept & {3, 4}) == 1


def _naive_greedy(x, eps):
    """O(n²)-memory reference: full sims matrix + the original loop."""
    sims = x @ x.T
    n = x.shape[0]
    kept = np.zeros(n, dtype=bool)
    max_sim = np.full(n, np.nan)
    kept_idx = []
    for i in range(n):
        if kept_idx:
            s = float(sims[i, kept_idx].max())
            max_sim[i] = s
            if s >= eps:
                continue
        kept[i] = True
        kept_idx.append(i)
    return kept, max_sim


def test_blockwise_kernel_matches_naive_full_matrix():
    """The blockwise greedy must reproduce the n×n-matrix greedy
    exactly — kept set AND max_sim — across block sizes that split
    kept rows within and across blocks."""
    from finance_etl_system_spark.operators.semdedup import (
        _greedy_blockwise,
    )

    rng = np.random.RandomState(11)
    # duplicate-heavy: 120 rows drawn from 25 base directions
    base = rng.randn(25, 8)
    x = base[rng.randint(0, 25, 120)] + 0.01 * rng.randn(120, 8)
    x = x / np.linalg.norm(x, axis=1)[:, None]
    for eps in (0.8, 0.99, 0.999999):
        want_kept, want_sim = _naive_greedy(x, eps)
        for block in (1, 7, 32, 1000):
            got_kept, got_sim = _greedy_blockwise(x, eps, block=block)
            assert (got_kept == want_kept).all(), (eps, block)
            assert np.allclose(got_sim, want_sim, equal_nan=True), (
                eps,
                block,
            )


def test_blockwise_kernel_peak_memory_is_not_quadratic():
    """The scale contract: a cluster near the cap must NOT allocate
    an n×n sims matrix (the 80 GB cliff at the old 100k cap). With
    n=4000, d=8 the naive matrix is 128 MB; the blockwise panels are
    ≤ block×n×8 ≈ 8 MB. tracemalloc sees numpy's allocations
    (numpy ≥1.22 routes through PyMem), so assert peak well under
    the quadratic footprint."""
    import tracemalloc

    from finance_etl_system_spark.operators.semdedup import (
        _greedy_blockwise,
    )

    rng = np.random.RandomState(5)
    n, d, block = 4000, 8, 256
    x = rng.randn(n, d)
    x = x / np.linalg.norm(x, axis=1)[:, None]
    naive_bytes = n * n * 8
    tracemalloc.start()
    base, _ = tracemalloc.get_traced_memory()
    kept, _sim = _greedy_blockwise(x, 0.99, block=block)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert kept.any()
    # generous 4x headroom over the true panel bound, still ~8x below
    # the quadratic matrix
    assert peak - base < naive_bytes / 8, (peak - base, naive_bytes)


def test_semdedup_default_cap_is_bounded():
    from finance_etl_system_spark.operators import semdedup as m
    import inspect

    cap = inspect.signature(m.semantic_dedup).parameters["max_cluster"]
    assert cap.default <= 20_000


def test_boilerplate_skew_cluster_overflows_not_drops(spark):
    """Round-8 skew rehearsal (tools/skew_cluster_check.py at 10x/
    100x): a boilerplate family 40% of the corpus lands in ONE
    cluster; over the cap it must pass through kept=True +
    overflow=True — flagged verbatim, never silently dropped, never
    an n^2 panel."""
    import numpy as np

    from finance_etl_system_spark.operators.semdedup import semantic_dedup

    rng = np.random.RandomState(11)
    d = 16
    base = rng.randn(d)
    rows = []
    for i in range(400):  # the boilerplate family, cluster 0
        v = base.copy()
        v[i % d] += (i % 97) * 1e-9
        rows.append((int(i), 0, 0.5, [float(x) for x in v]))
    for i in range(400, 500):  # organic rows, cluster 1
        rows.append(
            (int(i), 1, 0.1, [float(x) for x in rng.randn(d)])
        )
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, dist2 double,"
        " embedding array<double>"
    )
    out = semantic_dedup(df, eps=0.95, max_cluster=300).collect()
    fam = [r for r in out if r["cluster"] == 0]
    org = [r for r in out if r["cluster"] == 1]
    assert len(fam) == 400
    assert all(r["overflow"] and r["kept"] for r in fam)  # verbatim
    assert all(not r["overflow"] for r in org)
    assert sum(r["kept"] for r in org) >= 1
    # same family UNDER the cap: greedy keeps exactly one of the
    # near-identical rows (cos ~ 1 > eps)
    under = semantic_dedup(df, eps=0.95, max_cluster=1000).collect()
    fam_kept = [r for r in under if r["cluster"] == 0 and r["kept"]]
    assert len(fam_kept) == 1
