"""Content-defined chunking (operators/chunking.py): boundaries must
be content-stable (THE CDC property — a prefix edit leaves suffix
chunks identical), chunks must tile the byte range within the size
band, hashing must be deterministic, and the dup-stats report must
count shared bytes exactly."""

from __future__ import annotations

import hashlib

from finance_etl_system_spark.operators.chunking import (
    _chunk_bounds,
    chunk_dedup_stats,
    content_defined_chunks,
)

MIN, AVG, MAX = 16, 64, 256


def _long_text(seed_word: str, n: int = 400) -> str:
    # varied content so gear boundaries actually fire
    return " ".join(f"{seed_word}{i * 7919 % 1000}" for i in range(n))


def test_bounds_tile_and_respect_size_band():
    data = _long_text("w").encode("utf-8")
    bounds = _chunk_bounds(data, min_size=MIN, avg_size=AVG, max_size=MAX)
    assert bounds[0][0] == 0
    pos = 0
    for s, ln in bounds:
        assert s == pos
        pos += ln
    assert pos == len(data)
    for s, ln in bounds[:-1]:  # tail chunk may be short
        assert MIN <= ln <= MAX
    assert len(bounds) > 3  # boundaries actually fired


def test_prefix_edit_resynchronizes():
    """Insert bytes near the head: chunk hashes must re-align after
    the first boundary past the edit — the whole point of CDC (a
    fixed-size chunker would shift EVERY later chunk)."""
    base = _long_text("w").encode("utf-8")
    edited = b"EDITED! " + base
    hb = [
        hashlib.sha256(base[s : s + ln]).hexdigest()
        for s, ln in _chunk_bounds(
            base, min_size=MIN, avg_size=AVG, max_size=MAX
        )
    ]
    he = [
        hashlib.sha256(edited[s : s + ln]).hexdigest()
        for s, ln in _chunk_bounds(
            edited, min_size=MIN, avg_size=AVG, max_size=MAX
        )
    ]
    shared = set(hb) & set(he)
    # all but the first couple of chunks re-align
    assert len(shared) >= len(hb) - 3, (len(shared), len(hb))
    assert hb[-1] == he[-1]  # suffix identical


def test_spark_chunks_match_local_and_are_deterministic(spark):
    rows = [(1, _long_text("a")), (2, _long_text("b")), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_len, r.chunk_hash)
        for r in content_defined_chunks(
            df, min_size=MIN, avg_size=AVG, max_size=MAX
        ).collect()
    }
    for doc_id, text in rows:
        data = text.encode("utf-8")
        bounds = _chunk_bounds(
            data, min_size=MIN, avg_size=AVG, max_size=MAX
        )
        assert (
            len([k for k in got if k[0] == doc_id]) == len(bounds)
        )
        for idx, (s, ln) in enumerate(bounds):
            assert got[(doc_id, idx)] == (
                s,
                ln,
                hashlib.sha256(data[s : s + ln]).hexdigest(),
            )


def test_dedup_stats_counts_shared_bytes(spark):
    """Two docs sharing a long middle region: the shared region's
    interior chunks count as shared bytes for BOTH docs; a unique doc
    reports zero."""
    common = _long_text("shared", 300)
    rows = [
        (1, "unique head one " + common + " unique tail one"),
        (2, "different head " + common + " other tail"),
        (3, _long_text("solo", 100)),
        (4, ""),  # empty doc must still appear in the report
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r.doc_id: r
        for r in chunk_dedup_stats(
            df, min_size=MIN, avg_size=AVG, max_size=MAX
        ).collect()
    }
    assert stats[3].shared_chunks == 0
    assert stats[3].shared_frac == 0.0
    # empty docs are reported, not silently dropped
    assert stats[4].n_chunks == 0
    assert stats[4].n_bytes == 0
    assert stats[4].shared_frac is None
    for d in (1, 2):
        assert stats[d].shared_chunks > 0
        assert 0 < stats[d].shared_bytes < stats[d].n_bytes
        assert stats[d].n_chunks > 0
        # exact accounting: shared + unshared == total
        assert stats[d].shared_frac == round(
            stats[d].shared_bytes / stats[d].n_bytes, 6
        )
