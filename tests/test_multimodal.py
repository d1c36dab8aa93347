"""Multimodal plumbing tests: binary envelope, frame sampling, and the
Arrow-batched feature-extraction path (deterministic fake decode)."""

from __future__ import annotations

import pytest

from propulsion_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_BYTES,
    decode_image_batch,
    extract_features,
    media_table,
)

SF = "/root/testdata/sf0.001"


class TestMultimodal:
    def test_media_schema(self, spark):
        m = media_table(spark, SF)
        assert dict(m.dtypes)["media"] == "binary"
        row = m.filter("doc_id = 0").collect()[0]
        assert row.meta.n_bytes == len(row.media)
        assert row.meta.n_frames == len(row.media) // FRAME_BYTES

    def test_metadata_only_plan_prunes_blob(self, spark):
        m = media_table(spark, SF).select("doc_id", "meta.n_bytes")
        plan = m._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema" in plan  # sanity: physical scan present
        # the scan should not read the text column twice nor keep media;
        # ReadSchema contains only what's needed to compute n_bytes
        assert "doc_id" in plan

    def test_feature_extraction_batched(self, spark):
        feats = extract_features(media_table(spark, SF)).collect()
        assert len(feats) == 500
        by_id = {r.doc_id: r for r in feats}
        assert all(len(r.features) == FEATURE_DIM for r in feats)
        assert all(0.0 <= v <= 1.0 for r in feats for v in r.features)
        # deterministic: rerun produces identical vectors
        again = {r.doc_id: r for r in extract_features(media_table(spark, SF)).collect()}
        assert again[0].features == by_id[0].features

    def test_real_decode_is_gated(self):
        import pandas as pd

        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image_batch(pd.Series([b"\x89PNG"]))
