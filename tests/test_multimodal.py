"""Multimodal plumbing: Arrow-batched mapInPandas over binary columns.
Decode is stubbed (no codecs in container) but schema, batch flow, and
determinism are real."""

import pytest

from etl_api_bigquery_spark.functions.multimodal import (
    _decode_stub, extract_features, synthetic_media)


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=30)
    out = extract_features(media)
    rows = {r.asset_id: r for r in out.collect()}
    assert len(rows) == 30
    assert all(len(r.feature) == 8 for r in rows.values())
    assert all(r.n_bytes == 64 for r in rows.values())  # sha512 hex -> 64 bytes
    # deterministic across runs
    again = {r.asset_id: r for r in extract_features(media).collect()}
    assert all(rows[i].sha256 == again[i].sha256 for i in rows)


def test_decode_stub_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        _decode_stub(b"x", "hologram")
