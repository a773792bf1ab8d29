"""VARIANT + Python-UDTF surface (queries/variantq.py, queries/udtfq.py,
functions/udtfs.py): typed extraction must agree with the string-path
extraction already proven, and UDTF chunks must reconstruct the source
text exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.queries.udtfq import _CHUNK, q_udtf_chunk_text
from finance_etl_system_spark.queries.variantq import q_variant_agg
from tests.conftest import SF_SMOKE


def test_variant_agg_matches_get_json_object(spark):
    got = {r.event_type: r for r in q_variant_agg(spark, SF_SMOKE).collect()}
    want = {
        r.event_type: r
        for r in (
            load_table(spark, SF_SMOKE, "events")
            .filter(F.col("props").isNotNull())
            .select(
                "event_type",
                F.get_json_object("props", "$.k").cast("long").alias("k"),
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("k").alias("sum_k"),
                F.max("k").alias("max_k"),
            )
            .collect()
        )
    }
    assert set(got) == set(want)
    for et, w in want.items():
        g = got[et]
        assert (g.n_events, g.sum_k, g.max_k) == (w.n_events, w.sum_k, w.max_k)
        # '$.missing' is absent from every props payload
        assert g.n_missing == g.n_events


def test_hll_rollup_accuracy_and_parquet_mergeability(spark, tmp_path):
    from pyspark.sql import functions as F2

    from finance_etl_system_spark.queries.hllq import (
        daily_user_sketches,
        q_hll_rollup,
    )

    rows = q_hll_rollup(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_days >= 1
        # lg_k=12 → ~1.6% RSE; allow 5% at these cardinalities
        assert abs(r.est_users - r.exact_users) <= max(3, 0.05 * r.exact_users)

    # the partial layer must survive a parquet round-trip and re-union
    # to the same estimates (mergeable-rollup contract)
    path = str(tmp_path / "sketches")
    daily_user_sketches(spark, SF_SMOKE).write.parquet(path)
    reread = (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
            F2.hll_sketch_estimate(F2.hll_union_agg("sketch")).alias("est_users")
        )
    )
    got = {r.event_type: r.est_users for r in reread.collect()}
    want = {r.event_type: r.est_users for r in rows}
    assert got == want


def test_udtf_chunks_reconstruct_text(spark):
    chunks = q_udtf_chunk_text(spark, SF_SMOKE).collect()
    assert chunks
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter((F.col("doc_id") % 20 == 0) & (F.length("text") > 0))
        .collect()
    }
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.idx)
        assert [r.idx for r in rows] == list(range(len(rows)))
        assert "".join(r.chunk for r in rows) == texts[doc_id]
        assert all(r.chunk_len == len(r.chunk) for r in rows)
        assert all(r.chunk_len == _CHUNK for r in rows[:-1])


def test_weighted_median_udaf_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd

    from finance_etl_system_spark.queries.udafq import q_weighted_median

    got = {r.event_type: r for r in q_weighted_median(spark, SF_SMOKE).collect()}
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").dropna(subset=["value"])
    ev = ev[~np.isnan(ev["value"])]
    ev["ticks"] = np.round(ev["value"] * 100).astype("int64")
    ev["w"] = (ev["event_id"] % 97 + 1).astype("int64")
    for et, g in ev.groupby("event_type"):
        g = g.sort_values("ticks", kind="stable")
        cum = g["w"].cumsum()
        total = int(g["w"].sum())
        want = int(g["ticks"].to_numpy()[int((cum * 2 >= total).values.argmax())])
        assert got[et].wmed_ticks == want, et
        assert got[et].total_w == total
        assert got[et].n == len(g)
