"""Perceptual media dedup (operators/perceptual.py) — the test-pinned
contract (this family is not SQL-expressible, so like BPE the gate is
exact equivalence to from-scratch definitions plus robustness /
distinctness properties and a planted-dupe distributed e2e)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from propulsion_spark.operators.perceptual import (
    audio_fp64,
    dct2,
    image_phash64,
    media_fingerprints,
    perceptual_dedup_pairs,
    phash64,
    resize_bilinear,
    resize_images,
    wav_fp64,
)
from tests.test_multimodal_real import bmp_bytes, wav_bytes


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def rand_img(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    """Smooth random grayscale image (low-pass so it has perceptual
    structure; pure white noise has no stable low-freq content for ANY
    perceptual hash)."""
    rng = np.random.RandomState(seed)
    base = rng.rand(8, 8) * 255.0
    return resize_bilinear(base, h, w)


def to_bmp(gray: np.ndarray) -> bytes:
    px = np.clip(gray, 0, 255).astype(int)
    return bmp_bytes([[(v, v, v) for v in row] for row in px.tolist()])


class TestKernels:
    def test_dct2_matches_direct_definition(self):
        rng = np.random.RandomState(7)
        a = rng.rand(8, 8)
        n = 8
        direct = np.zeros((n, n))
        for k in range(n):
            for l in range(n):  # noqa: E741
                s = 0.0
                for i in range(n):
                    for j in range(n):
                        s += (
                            a[i, j]
                            * math.cos(math.pi * (2 * i + 1) * k / (2 * n))
                            * math.cos(math.pi * (2 * j + 1) * l / (2 * n))
                        )
                ck = math.sqrt(1 / n) if k == 0 else math.sqrt(2 / n)
                cl = math.sqrt(1 / n) if l == 0 else math.sqrt(2 / n)
                direct[k, l] = ck * cl * s
        assert np.allclose(dct2(a), direct, atol=1e-10)

    def test_dct2_orthonormal(self):
        """Orthonormal DCT preserves energy (Parseval)."""
        rng = np.random.RandomState(3)
        a = rng.rand(32, 32)
        assert np.isclose((dct2(a) ** 2).sum(), (a**2).sum())

    def test_resize_identity(self):
        rng = np.random.RandomState(1)
        img = rng.rand(16, 16)
        assert np.allclose(resize_bilinear(img, 16, 16), img)

    def test_resize_constant_stays_constant(self):
        img = np.full((10, 7, 3), 42.0)
        out = resize_bilinear(img, 33, 19)
        assert out.shape == (33, 19, 3)
        assert np.allclose(out, 42.0)

    def test_resize_2x2_known_values(self):
        """Upscale [[0,1],[2,3]] to 4×4 — centers interpolate, edges
        clamp (align-corners=False arithmetic, hand-checked)."""
        img = np.array([[0.0, 1.0], [2.0, 3.0]])
        out = resize_bilinear(img, 4, 4)
        assert np.allclose(out[0], [0.0, 0.25, 0.75, 1.0])
        assert np.allclose(out[:, 0], [0.0, 0.5, 1.5, 2.0])
        assert np.isclose(out[1, 1], 0.75)  # 0.25 x + 0.5 y blend


class TestPhash:
    def test_brightness_shift_within_small_ball(self):
        g = rand_img(11)
        assert hamming(phash64(g), phash64(g + 25.0)) <= 2

    def test_small_noise_within_small_ball(self):
        g = rand_img(12)
        noisy = g + np.random.RandomState(0).normal(0, 2.0, g.shape)
        assert hamming(phash64(g), phash64(noisy)) <= 3

    def test_rescale_within_small_ball(self):
        """The same image rendered at two sizes — pHash normalizes
        through the 32×32 resize."""
        base = rand_img(13, 64, 64)
        other = resize_bilinear(base, 48, 48)
        assert hamming(phash64(base), phash64(other)) <= 3

    def test_different_images_far_apart(self):
        fps = [phash64(rand_img(s)) for s in range(20, 30)]
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                assert hamming(fps[i], fps[j]) > 10

    def test_bmp_roundtrip_matches_array_hash(self):
        """Hash of decode(encode(img)) equals hash of the int-truncated
        array — the BMP path adds no drift."""
        g = np.clip(rand_img(14), 0, 255).astype(int).astype(np.float64)
        assert image_phash64(to_bmp(g)) == phash64(g)

    def test_deterministic(self):
        g = rand_img(15)
        assert phash64(g) == phash64(g.copy())

    def test_encode_bmp_roundtrip_and_matches_test_helper(self):
        from propulsion_spark.operators.multimodal import (
            decode_bmp_pixels,
            encode_bmp,
        )

        rng = np.random.RandomState(16)
        for w in (7, 8):  # 7 exercises the 4-byte row padding
            px = rng.randint(0, 256, (5, w, 3)).astype(np.float64)
            assert np.array_equal(decode_bmp_pixels(encode_bmp(px)), px)
        px = rng.randint(0, 256, (4, 6, 3))
        assert encode_bmp(px) == bmp_bytes(
            [[tuple(int(c) for c in p) for p in row] for row in px]
        )


class TestAudioFp:
    def test_gain_invariant(self):
        rng = np.random.RandomState(5)
        x = rng.normal(0, 0.3, 8000)
        assert audio_fp64(x, 8000) == audio_fp64(x * 0.25, 8000)

    @staticmethod
    def _broadband(seed: int, n: int = 8000) -> np.ndarray:
        """Amplitude-modulated white noise — broadband content with
        energy in every fingerprint band (the robustness contract
        assumes broadband audio; a pure tone leaves bands empty and
        their bits noise-driven — see audio_fp64's docstring)."""
        rng = np.random.RandomState(seed)
        env = np.abs(
            np.convolve(rng.normal(0, 1, n + 500), np.hanning(400), "valid")
        )[:n]
        x = rng.normal(0, 1, n) * env
        return x / np.abs(x).max()

    def test_perturbations_within_small_ball(self):
        x = self._broadband(5)
        base = audio_fp64(x, 8000)
        # 16-bit quantization (the WAV encode round-trip)
        q = np.round(x * 32767) / 32767
        assert hamming(base, audio_fp64(q, 8000)) <= 2
        # additive noise at ~-46 dB
        xn = x + np.random.RandomState(1).normal(0, 0.005, len(x))
        assert hamming(base, audio_fp64(xn, 8000)) <= 3

    def test_identical_synth_identical_fp(self):
        blob = wav_bytes(freq_hz=440.0, seconds=0.5, amp=0.5)
        again = wav_bytes(freq_hz=440.0, seconds=0.5, amp=0.5)
        assert wav_fp64(blob) == wav_fp64(again)

    def test_distinct_broadband_clips_far_apart(self):
        fps = [audio_fp64(self._broadband(s), 8000) for s in range(60, 66)]
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                assert hamming(fps[i], fps[j]) > 10

    def test_different_tones_far_apart(self):
        a = wav_fp64(wav_bytes(freq_hz=440.0, seconds=0.5))
        b = wav_fp64(wav_bytes(freq_hz=1370.0, seconds=0.5))
        assert hamming(a, b) > 8

    def test_stereo_mixdown_matches_mono(self):
        """A clip duplicated to two channels fingerprints like mono."""
        import io
        import struct
        import wave

        sr, n = 8000, 4000
        mono = [
            int(0.4 * 32767 * math.sin(2 * math.pi * 523.0 * i / sr))
            for i in range(n)
        ]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(b"".join(struct.pack("<hh", v, v) for v in mono))
        mono_buf = io.BytesIO()
        with wave.open(mono_buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(b"".join(struct.pack("<h", v) for v in mono))
        assert wav_fp64(buf.getvalue()) == wav_fp64(mono_buf.getvalue())

    def test_too_short_raises(self):
        with pytest.raises(ValueError, match="too short"):
            audio_fp64(np.zeros(8), 8000)


class TestDistributed:
    def _rows(self):
        """6 images (3 perceptual-dupe pairs via brightness shift) + 2
        distinct images + 2 audio clips (1 dupe pair) + 1 unknown type."""
        rows = []
        for k in range(3):
            g = rand_img(40 + k)
            rows.append((10 + 2 * k, bytearray(to_bmp(g)), ("image/bmp", 0, 0)))
            rows.append(
                (11 + 2 * k, bytearray(to_bmp(g + 20.0)), ("image/bmp", 0, 0))
            )
        rows.append((30, bytearray(to_bmp(rand_img(90))), ("image/bmp", 0, 0)))
        rows.append((31, bytearray(to_bmp(rand_img(91))), ("image/bmp", 0, 0)))
        wav = wav_bytes(freq_hz=440.0, seconds=0.5)
        rows.append((40, bytearray(wav), ("audio/wav", 0, 0)))
        rows.append((41, bytearray(wav), ("audio/wav", 0, 0)))
        rows.append((50, bytearray(b"????"), ("video/mp4", 0, 0)))
        return rows

    def test_planted_dupes_found_exactly(self, spark):
        from tests.test_multimodal_real import _media_df

        df = _media_df(spark, self._rows()).repartition(4)
        fps = media_fingerprints(df)
        got = fps.collect()
        assert {r["doc_id"] for r in got if r["fp64"] is None} == {50}
        pairs = perceptual_dedup_pairs(fps, max_hamming=3).collect()
        found = {(r["a_id"], r["b_id"]) for r in pairs}
        assert {(10, 11), (12, 13), (14, 15), (40, 41)} <= found
        # no cross-modal pairs, no pairing with the distinct images
        for r in pairs:
            assert (r["a_id"] < 30) == (r["b_id"] < 30) or r["a_id"] >= 40
        assert not {p for p in found if 30 in p or 31 in p or 50 in p}

    def test_empty_fingerprint_table(self, spark):
        from tests.test_multimodal_real import _media_df

        df = _media_df(spark, [])
        out = perceptual_dedup_pairs(media_fingerprints(df))
        assert out.count() == 0
        assert set(out.columns) == {"a_id", "b_id", "hamming", "media_type"}

    def test_streaming_cross_batch_dedup(self, spark, tmp_path):
        """Batch 2 re-encodes of batch-1 keepers are caught via the
        registry without rereading batch 1; in-batch clusters resolve
        to the min id; replays are idempotent end to end."""
        from propulsion_spark.pipelines.media_dedup import MediaDedupStream

        from tests.test_multimodal_real import _media_df

        eng = MediaDedupStream(spark, str(tmp_path / "reg"))
        g1, g2 = rand_img(70), rand_img(71)
        b1 = _media_df(
            spark,
            [
                (1, bytearray(to_bmp(g1)), ("image/bmp", 0, 0)),
                # in-batch near-dup cluster of 1: brightness shift
                (2, bytearray(to_bmp(g1 + 18.0)), ("image/bmp", 0, 0)),
                (3, bytearray(to_bmp(g2)), ("image/bmp", 0, 0)),
                (9, bytearray(b"??"), ("video/mp4", 0, 0)),  # kept as-is
            ],
        ).select("doc_id", "media", F.col("meta.media_type").alias("media_type"))
        out = str(tmp_path / "kept")
        eng.run_batch(b1, 1, out)
        kept1 = {
            r["doc_id"] for r in spark.read.parquet(out).collect()
        }
        assert kept1 == {1, 3, 9}
        assert eng.stats["deduped_in_batch"] == 1
        assert eng.stats["unfingerprintable"] == 1

        # batch 2: a noisy copy of keeper 1, plus genuinely new content
        g1n = g1 + np.random.RandomState(0).normal(0, 2.0, g1.shape)
        b2 = _media_df(
            spark,
            [
                (11, bytearray(to_bmp(g1n)), ("image/bmp", 0, 0)),
                (12, bytearray(to_bmp(rand_img(72))), ("image/bmp", 0, 0)),
            ],
        ).select("doc_id", "media", F.col("meta.media_type").alias("media_type"))
        eng.run_batch(b2, 2, out)
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {1, 3, 9, 12}  # 11 deduped against last batch's keeper
        assert eng.stats["deduped_cross_batch"] == 1

        # replay batch 2: keepers match only their own registry rows →
        # survive again; the batch partition is rewritten, not doubled
        eng.run_batch(b2, 2, out)
        kept_replay = [
            r["doc_id"] for r in spark.read.parquet(out).collect()
        ]
        assert sorted(kept_replay) == [1, 3, 9, 12]

        # stats ride the standard exporter
        from propulsion_spark.streaming.metrics import MetricsExporter

        text = (
            MetricsExporter(group="md").register_media_dedup(eng).render()
        )
        assert "propulsion_media_dedup_total" in text
        assert 'stage="deduped_cross_batch"' in text

    def test_streaming_rejects_unprovable_radius(self, spark, tmp_path):
        from propulsion_spark.pipelines.media_dedup import MediaDedupStream

        with pytest.raises(ValueError, match="pigeonhole"):
            MediaDedupStream(spark, str(tmp_path / "r"), max_hamming=4)

    def test_resize_images_distributed(self, spark):
        from tests.test_multimodal_real import _media_df

        rows = [
            (1, bytearray(to_bmp(rand_img(60, 32, 48))), ("image/bmp", 0, 0)),
            (2, bytearray(to_bmp(rand_img(61, 64, 64))), ("image/bmp", 0, 0)),
        ]
        out = resize_images(_media_df(spark, rows), 16, 16).collect()
        assert len(out) == 2
        for r in out:
            assert (r["height"], r["width"]) == (16, 16)
            assert len(r["pixels"]) == 16 * 16 * 3
            assert all(0.0 <= v <= 255.0 for v in r["pixels"])
