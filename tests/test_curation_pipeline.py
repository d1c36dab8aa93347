"""Streaming corpus-curation pipeline: quality gates + cross-batch
dedup into a curated store, batch and streaming drive."""

from __future__ import annotations

import pandas as pd
import pytest

from propulsion_spark.pipelines import CurationPipeline

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def doc(doc_id, text, lang="en"):
    return {
        "doc_id": doc_id,
        "text": text,
        "lang": lang,
        "source": "s",
        "n_chars": len(text),
    }


GOOD = "the quick brown fox jumps over the lazy dog and keeps running far " * 2
NUMERIC = "12345 67890 " * 30  # fails alpha ratio
SHORT = "tiny text here"  # fails token lower bound


def mk(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), DOC_SCHEMA)


class TestCurationPipeline:
    def test_quality_and_cross_batch_dedup(self, spark, tmp_path):
        pipe = CurationPipeline(spark, str(tmp_path / "out"))
        pipe.process_batch(
            mk(
                spark,
                [
                    doc(1, GOOD),
                    doc(2, GOOD + " extra tail"),  # near-dup but distinct fp
                    doc(3, NUMERIC),
                    doc(4, SHORT),
                    doc(5, GOOD),  # intra-batch exact dup of 1
                ],
            )
        )
        # cross-batch: 6 redelivers GOOD, 7 is novel
        pipe.process_batch(mk(spark, [doc(6, GOOD), doc(7, GOOD + " novel suffix")]))
        kept = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept == [1, 2, 7]
        assert pipe.stats["seen"] == 7
        assert pipe.stats["rejected_quality"] == 2
        assert pipe.stats["deduped"] == 2  # intra-batch 5 + cross-batch 6
        assert pipe.stats["kept"] == 3
        stats = {r.lang: r.kept_docs for r in pipe.lang_stats().collect()}
        assert stats == {"en": 3}

    def test_streaming_drive(self, spark, tmp_path):
        import os

        indir = str(tmp_path / "feed")
        os.makedirs(indir)
        pipe = CurationPipeline(spark, str(tmp_path / "out2"))
        mk(spark, [doc(1, GOOD)]).coalesce(1).write.mode("append").parquet(indir)
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(indir)
        q = pipe.run_stream(stream, str(tmp_path / "ck"), availableNow=True)
        q.awaitTermination(120)
        mk(spark, [doc(2, GOOD), doc(3, GOOD + " more")]).coalesce(1).write.mode(
            "append"
        ).parquet(indir)
        q2 = pipe.run_stream(stream, str(tmp_path / "ck"), availableNow=True)
        q2.awaitTermination(120)
        kept = sorted(r.doc_id for r in pipe.curated().collect())
        assert kept == [1, 3]  # 2 deduped against batch-1's fingerprint
