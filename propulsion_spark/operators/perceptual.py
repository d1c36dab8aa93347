"""Perceptual media fingerprints + near-duplicate media detection —
the image/audio leg of the dedup family (training-data pipelines dedup
media by CONTENT, not bytes: a re-encoded, brightness-shifted or
slightly-noised copy must collide).

Three real, stdlib+numpy-only kernels (no Pillow/scipy/librosa):

- :func:`phash64` — classic perceptual image hash (pHash, as described
  publicly by Zauner 2010 "Implementation and Benchmarking of
  Perceptual Image Hash Functions"): grayscale → 32×32 bilinear resize
  → 2-D DCT-II (orthonormal basis matmul, cached per size) → low-freq
  8×8 block → threshold at the median of the 63 AC coefficients →
  64-bit fingerprint. Brightness shifts move only the DC coefficient,
  small noise perturbs mostly high frequencies — both leave the hash
  within a small hamming ball.
- :func:`audio_fp64` — spectral fingerprint in the shape of
  Haitsma-Kalker 2002 ("A Highly Robust Audio Fingerprinting System"):
  frame the mono signal (hann window), rFFT power spectrum, 5
  log-spaced band energies in 300-2000 Hz, and each bit is the sign of
  the time-and-band double difference — invariant to global gain,
  robust to low-amplitude noise. 17 frames × 4 band-pairs = 64 bits.
- :func:`resize_bilinear` — pure-numpy separable bilinear resize
  (align-corners=False, the convention of every DL preprocessing
  stack), the real "resize" op of the multimodal surface; pHash uses
  it, and :func:`resize_images` exposes it over the corpus.

Distribution shape (the part that must survive 100 TB):

- :func:`media_fingerprints` is MAP-ONLY — decode + hash per blob
  inside Arrow-batched ``mapInPandas``; blobs never cross a shuffle,
  and metadata-only plans prune the blob column at the parquet scan.
  Per-blob Python is the standard decode-UDF shape: each iteration is
  vectorized numpy over that blob's pixels/samples.
- :func:`perceptual_dedup_pairs` reuses
  :func:`propulsion_spark.operators.dedup.hamming_pairs64` — the
  multi-index pigeonhole equi-join (Manku WWW'07), so media near-dup
  pairing has exact recall at ``max_hamming ≤ n_chunks − 1`` and NO
  all-pairs product; only (id, fp64) rows shuffle, never media bytes.

jet/propulsion has no media analogue — this module extends the
LLM-data-pipeline surface (SURVEY §2.8) alongside dedup/decontam.
Not oracle-attested: DCT/FFT over decoded blobs is not expressible in
DuckDB SQL; correctness is pinned by ``tests/test_perceptual.py``
(resize/DCT vs from-scratch O(n²) definitions, perturbation-
robustness and distinctness properties, planted-dupe e2e recall) —
the same test-pinned contract as ``operators/bpe.py``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PHASH_RESIZE = 32  # grayscale working size fed to the DCT
PHASH_BLOCK = 8  # low-frequency block → 8×8 = 64 bits

AUDIO_BANDS = 5  # band edges → AUDIO_BANDS-1 band-pair deltas
AUDIO_FRAMES = 17  # frames → AUDIO_FRAMES-1 time deltas
AUDIO_FMIN = 300.0  # Hz (Haitsma-Kalker's speech-robust band)
AUDIO_FMAX = 2000.0


# --------------------------------------------------------------- resize
def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bilinear resize of a (h, w) or (h, w, c) float array,
    align-corners=False (pixel centers at (i + 0.5) · scale − 0.5,
    edge-clamped) — matches the default of the mainstream DL resize
    stacks, written from the definition."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)
    wx = np.clip(xs - x0, 0.0, 1.0)
    if img.ndim == 3:
        wy = wy[:, None, None]
        wxr = wx[None, :, None]
    else:
        wy = wy[:, None]
        wxr = wx[None, :]
    top = img[y0][:, x0] * (1 - wxr) + img[y0][:, x1] * wxr
    bot = img[y1][:, x0] * (1 - wxr) + img[y1][:, x1] * wxr
    return top * (1 - wy) + bot * wy


# ------------------------------------------------------------------ DCT
_DCT_BASIS: dict[int, np.ndarray] = {}


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix D (D @ x applies the 1-D DCT);
    cached per size — pHash reuses the 32×32 basis for every image."""
    b = _DCT_BASIS.get(n)
    if b is None:
        k = np.arange(n)[:, None]
        m = np.arange(n)[None, :]
        b = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
        b[0] /= np.sqrt(2.0)
        _DCT_BASIS[n] = b
    return b


def dct2(a: np.ndarray) -> np.ndarray:
    """2-D orthonormal DCT-II of a square float matrix: D @ a @ D.T."""
    d = _dct_basis(a.shape[0])
    return d @ a @ _dct_basis(a.shape[1]).T


# ---------------------------------------------------------------- pHash
def _pack_bits64(bits: np.ndarray) -> int:
    """64 bools (bit i = weight 2^i) → signed int64 (Spark LongType);
    bit 63 wraps to the sign bit, exactly like the SimHash packing."""
    u = np.uint64(0)
    for i in np.nonzero(bits)[0]:
        u |= np.uint64(1) << np.uint64(i)
    return int(u.astype(np.int64))


def phash64(gray: np.ndarray) -> int:
    """Perceptual hash of a (h, w) grayscale float array (see module
    docstring for the pipeline). Bit i is coefficient i (row-major over
    the low-frequency block) > median of the 63 AC coefficients — the
    DC coefficient is excluded from the threshold so a global
    brightness shift cannot move it."""
    g = resize_bilinear(gray.astype(np.float64), PHASH_RESIZE, PHASH_RESIZE)
    block = dct2(g)[:PHASH_BLOCK, :PHASH_BLOCK].ravel()
    med = np.median(block[1:])
    return _pack_bits64(block > med)


def image_phash64(blob: bytes) -> int:
    """pHash of a 24-bit BMP blob (real stdlib decode): RGB → ITU-R
    BT.601 luma → :func:`phash64`."""
    from propulsion_spark.operators.multimodal import decode_bmp_pixels

    px = decode_bmp_pixels(blob)
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return phash64(luma)


# ----------------------------------------------------- audio fingerprint
def audio_fp64(x: np.ndarray, sr: int) -> int:
    """Spectral fingerprint of a mono signal (Haitsma-Kalker shape):
    sign of the time-and-band double difference of log-spaced band
    energies. Gain-invariant (a global scale multiplies every energy,
    cancelling in both differences); 17 hann frames × 5 bands → 64
    bits.

    Robustness contract assumes BROADBAND content (speech/music-like:
    energy in every 300-2000 Hz band) — measured ≤2 bit flips under
    16-bit quantization and −46 dB additive noise, ~30/64 for distinct
    clips. A pure tone leaves most bands empty and their bits are then
    noise-driven; that degrades gracefully to random-per-copy bits
    (missed dupes, never false merges — the safe direction for
    dedup)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < AUDIO_FRAMES * 2:
        raise ValueError(
            f"audio too short for fingerprinting ({n} samples; "
            f"need ≥ {AUDIO_FRAMES * 2})"
        )
    # 50%-overlapping frames covering the whole clip
    flen = max(4, (2 * n) // (AUDIO_FRAMES + 1))
    hop = max(1, (n - flen) // (AUDIO_FRAMES - 1)) if AUDIO_FRAMES > 1 else 1
    win = np.hanning(flen)
    frames = np.stack(
        [x[i * hop : i * hop + flen] * win for i in range(AUDIO_FRAMES)]
    )
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(flen, d=1.0 / sr)
    fmax = min(AUDIO_FMAX, sr / 2.0)
    edges = np.geomspace(AUDIO_FMIN, fmax, AUDIO_BANDS + 1)
    e = np.empty((AUDIO_FRAMES, AUDIO_BANDS))
    for b in range(AUDIO_BANDS):
        sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
        # an empty band (tiny clips / low sr) contributes silence
        e[:, b] = power[:, sel].sum(axis=1) if sel.any() else 0.0
    d_band = e[:, :-1] - e[:, 1:]  # (frames, bands-1)
    d2 = d_band[1:] - d_band[:-1]  # (frames-1, bands-1) = 16×4
    return _pack_bits64((d2 > 0).ravel())


def wav_fp64(blob: bytes) -> int:
    """Fingerprint of a PCM WAV blob (real stdlib decode); channels are
    mixed down to mono first (fingerprints must not depend on the
    channel count of an otherwise-identical clip)."""
    from propulsion_spark.operators.multimodal import decode_wav_samples

    x, sr, nch = decode_wav_samples(blob)
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return audio_fp64(x, sr)


# ------------------------------------------------------ Spark operators
FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("fp64", T.LongType()),
    ]
)


def media_fingerprints(
    df: DataFrame,
    media_col: str = "media",
    type_col: str = "meta.media_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, media_type, fp64) per media row — map-only Arrow-batched
    decode+hash, dispatched on the media type (``image/bmp`` → pHash,
    ``audio/wav`` → spectral fingerprint, anything else → null fp64 so
    an unknown container degrades to "never collides", not an abend;
    callers gate on ``fp64 IS NOT NULL``)."""
    narrow = df.select(
        F.col(id_col).alias("_id"),
        F.col(media_col).alias("_media"),
        F.col(type_col).alias("_mtype"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for media, mtype in zip(pdf["_media"], pdf["_mtype"]):
                if media is None:
                    fps.append(None)
                elif mtype == "image/bmp":
                    fps.append(image_phash64(media))
                elif mtype == "audio/wav":
                    fps.append(wav_fp64(media))
                else:
                    fps.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["_id"],
                    "media_type": pdf["_mtype"],
                    "fp64": pd.array(fps, dtype="Int64"),
                }
            )

    return narrow.mapInPandas(run, FP_SCHEMA)


def perceptual_dedup_pairs(
    fps: DataFrame, max_hamming: int = 3, n_chunks: int = 4
) -> DataFrame:
    """Near-duplicate media pairs from a fingerprint table (the output
    of :func:`media_fingerprints`): multi-index pigeonhole equi-join +
    ``bit_count`` verify via :func:`dedup.hamming_pairs64` — exact
    recall within the ball, no all-pairs, only (id, fp64) rows shuffle.
    Fingerprints are partitioned by media type first: a pHash and an
    audio fingerprint colliding numerically is meaningless, so pairs
    never cross modalities (one reused plan per type; the type list is
    a bounded control-plane collect)."""
    from propulsion_spark.operators.dedup import hamming_pairs64

    typed = fps.filter(F.col("fp64").isNotNull())
    # one pass per media type keeps the bucket keyspace per-modality;
    # media_type values are bounded (a handful), so this is a fixed
    # number of reused plans, not per-row work
    types = [r["media_type"] for r in typed.select("media_type").distinct().collect()]
    out = None
    for t in sorted(types):
        pairs = hamming_pairs64(
            typed.filter(F.col("media_type") == t),
            max_hamming=max_hamming,
            n_chunks=n_chunks,
            fp_col="fp64",
        ).withColumn("media_type", F.lit(t))
        out = pairs if out is None else out.unionByName(pairs)
    if out is None:
        spark = fps.sparkSession
        return spark.createDataFrame(
            [], "a_id long, b_id long, hamming long, media_type string"
        )
    return out


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode + bilinear-resize BMP blobs to a fixed (out_h, out_w, 3)
    float tensor, flattened row-major — the preprocessing shape a
    vision-model embedder consumes. Map-only; the tensor column is
    out_h·out_w·3 doubles, so project it away before any shuffle."""
    narrow = df.select(
        F.col(id_col).alias("_id"), F.col(media_col).alias("_media")
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("pixels", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from propulsion_spark.operators.multimodal import decode_bmp_pixels

        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["_id"], pdf["_media"]):
                px = resize_bilinear(decode_bmp_pixels(media), out_h, out_w)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "height": out_h,
                        "width": out_w,
                        "pixels": px.ravel().tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return narrow.mapInPandas(run, schema)
