"""Hard-negative triplet mining (operators/mining.py): band
invariants, anchor contract, partitioning invariance, and the
truncation flag — the ground-truth surface a rows-only registry entry
requires.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.operators.mining import mine_triplets
from tests.conftest import SF_SMOKE

KW = dict(k_clusters=4, pos_threshold=0.2, neg_lo=0.08, neg_hi=0.2)


def _vecs(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    x = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in e.collect()
    }
    return e, {
        k: v / (np.linalg.norm(v) or 1.0) for k, v in x.items()
    }


def test_triplet_bands_and_anchor_contract(spark):
    e, unit = _vecs(spark)
    rows = mine_triplets(e, **KW).collect()
    assert rows
    for r in rows:
        assert len({r["anchor_id"], r["pos_id"], r["neg_id"]}) == 3
        # reported cosines live in their bands and match recompute
        assert r["pos_cos"] >= 0.2 > r["neg_cos"] >= 0.08
        a = unit[r["anchor_id"]]
        assert abs(float(a @ unit[r["pos_id"]]) - r["pos_cos"]) < 1e-5
        assert abs(float(a @ unit[r["neg_id"]]) - r["neg_cos"]) < 1e-5
    # every anchor satisfies the content-hash rule (mod 5 == 0)
    anchors = {r["anchor_id"] for r in rows}
    flagged = {
        r["vec_id"]
        for r in e.select(
            "vec_id",
            (F.pmod(F.xxhash64("vec_id"), F.lit(5)) == 0).alias("a"),
        ).collect()
        if r["a"]
    }
    assert anchors <= flagged


def test_triplets_are_partitioning_invariant(spark):
    e, _ = _vecs(spark)
    key = lambda df: sorted(  # noqa: E731
        (r["anchor_id"], r["pos_id"], r["neg_id"]) for r in df.collect()
    )
    a = key(mine_triplets(e, **KW))
    b = key(mine_triplets(e.repartition(13, "label"), **KW))
    assert a == b and a


def test_truncation_flag_surfaces(spark):
    e, _ = _vecs(spark)
    rows = mine_triplets(e, max_cluster=50, **KW).collect()
    assert rows and all(r["truncated"] for r in rows)


def test_pure_boilerplate_cluster_truncation_is_reported(spark):
    """Round-8 skew rehearsal: a truncated cluster that emits ZERO
    triplets (pure boilerplate family — every member is a positive,
    the in-cluster negative band is empty) must still surface through
    the with_report frame; the per-triplet flag alone would be
    silent."""
    import numpy as np

    rng = np.random.RandomState(13)
    d = 16
    base = rng.randn(d)
    rows = []
    for i in range(300):  # near-identical family
        v = base.copy()
        v[i % d] += (i % 97) * 1e-9
        rows.append((int(i), [float(x) for x in v]))
    for i in range(300, 400):  # organic rows
        rows.append((int(i), [float(x) for x in rng.randn(d)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    triplets, report = mine_triplets(
        df,
        k_clusters=4,
        max_cluster=200,
        pos_threshold=0.99,
        neg_lo=-1.0,
        neg_hi=0.99,
        with_report=True,
        anchor_mod=5,
        max_iter=4,
    )
    rep = {r["cluster"]: r for r in report.collect()}
    trunc = [r for r in rep.values() if r["truncated"]]
    # the family cluster (300 planted + possible organic stragglers)
    # is reported truncated even if it emits no triplets at all
    assert len(trunc) == 1 and trunc[0]["n_members"] >= 300
    t = triplets.collect()
    fam_ids = set(range(300))
    fam_triplets = [r for r in t if r["anchor_id"] in fam_ids]
    # family triplets exist ONLY if an organic straggler survived the
    # hash truncation as a negative; whenever they exist they carry
    # the flag — and when none exist, the report is the only signal
    assert all(r["truncated"] for r in fam_triplets)
    assert report.columns == ["cluster", "n_members", "n_anchors", "truncated"]
