"""REAL multimodal decode paths (round 6): PCM WAV via stdlib wave,
uncompressed 24-bit BMP via struct — no external libraries, decoded
distributed through the same mapInPandas plumbing as the stubbed
formats.
"""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest
from pyspark.sql import functions as F

from propulsion_spark.operators.multimodal import MEDIA_SCHEMA, media_features


def wav_bytes(freq_hz=440.0, sr=8000, seconds=0.25, amp=0.5):
    buf = io.BytesIO()
    n = int(sr * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = b"".join(
            struct.pack(
                "<h", int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / sr))
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def bmp_bytes(pixels):
    """pixels: rows (top-down) of (r, g, b) tuples."""
    h, w = len(pixels), len(pixels[0])
    row_bytes = ((w * 3 + 3) // 4) * 4
    body = b""
    for row in reversed(pixels):  # BMP stores bottom-up
        line = b"".join(struct.pack("BBB", b, g, r) for (r, g, b) in row)
        body += line + b"\x00" * (row_bytes - len(line))
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def _media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestRealDecoders:
    def test_wav_decode_exact(self, spark):
        blob = wav_bytes(freq_hz=100.0, sr=8000, seconds=0.5, amp=0.25)
        df = _media_df(
            spark,
            [(1, bytearray(blob), ("audio/wav", len(blob), 0))],
        )
        r = media_features(df).collect()[0]
        assert r["media_type"] == "audio/wav"
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1
        assert abs(r["duration_s"] - 0.5) < 1e-9
        # a sine's RMS is amp/sqrt(2); integer quantization costs <1%
        assert abs(r["rms"] - 0.25 / math.sqrt(2)) < 0.005
        assert 0.24 < r["peak"] <= 0.2501
        assert r["width"] is None  # image features null for audio

    def test_bmp_decode_exact(self, spark):
        px = [
            [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
            [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
        ]
        blob = bmp_bytes(px)
        df = _media_df(
            spark, [(2, bytearray(blob), ("image/bmp", len(blob), 0))]
        )
        r = media_features(df).collect()[0]
        assert (r["width"], r["height"]) == (3, 2)
        flat = [c for row in px for c in row]
        assert abs(r["mean_r"] - sum(c[0] for c in flat) / 6) < 1e-9
        assert abs(r["mean_g"] - sum(c[1] for c in flat) / 6) < 1e-9
        assert abs(r["mean_b"] - sum(c[2] for c in flat) / 6) < 1e-9
        assert r["rms"] is None  # audio features null for images

    def test_mixed_batch_distributed(self, spark):
        """WAV + BMP rows in one distributed frame decode side by side;
        an unsupported type still hits the Pillow gate."""
        wav = wav_bytes()
        bmp = bmp_bytes([[(1, 2, 3)]])
        df = _media_df(
            spark,
            [
                (i, bytearray(wav if i % 2 else bmp),
                 ("audio/wav" if i % 2 else "image/bmp", 0, 0))
                for i in range(8)
            ],
        ).repartition(4)
        rows = media_features(df).collect()
        assert len(rows) == 8
        assert all(
            (r["rms"] is not None) == (r["media_type"] == "audio/wav")
            for r in rows
        )
        bad = _media_df(
            spark, [(99, bytearray(b"xx"), ("image/jpeg", 2, 0))]
        )
        with pytest.raises(Exception) as exc_info:
            media_features(bad).collect()
        assert "Pillow" in str(exc_info.value) or "NotImplementedError" in str(
            exc_info.value
        )
