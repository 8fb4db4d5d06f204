"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, Arrow batching, partitioning, UDF
signatures, frame explosion — is real and tested.  The actual
decode/feature steps are STUBS: the container has no image/audio codecs,
so `decode_image`/`decode_audio` either use a real library if importable
or fall back to a clearly-marked deterministic fake derived from the raw
bytes (so tests are reproducible).  Swapping in PIL/torchaudio changes
~10 lines inside the batch functions and nothing else."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_N_FEATURES = 8


def _fake_decode_image(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """DETERMINISTIC FAKE decode — stands in for PIL.Image.open().
    Derives pseudo (w, h, c) + a byte-histogram feature vector from the
    raw payload.  Marked fake on purpose: the plumbing around it is the
    deliverable here."""
    arr = np.frombuffer(raw, dtype=np.uint8)
    w = 16 + int(arr[:4].sum()) % 240 if arr.size else 16
    h = 16 + int(arr[4:8].sum()) % 240 if arr.size >= 8 else 16
    hist = np.bincount(arr >> 5, minlength=_N_FEATURES).astype(np.float64)
    total = max(hist.sum(), 1.0)
    return w, h, 3, hist / total


def _pil_decoder():
    """Resolve the REAL image decoder: PIL-backed when importable, else
    None (callers fall back to the deterministic fake).  Resolved inside
    each task so a cluster with PIL on the executors uses it even if the
    driver lacks it.  This round's autodetect check: the sandbox has no
    PIL (and installs are off), so the fake path is what runs here; the
    real path is unit-tested against a synthetic PIL module."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError:
        return None

    def decode(raw):
        img = Image.open(BytesIO(raw))
        a = np.asarray(img, dtype=np.uint8).reshape(-1)
        hist = np.bincount(a >> 5, minlength=_N_FEATURES).astype(float)
        return (img.width, img.height, len(img.getbands()),
                hist / max(hist.sum(), 1.0))

    return decode


def extract_image_features(
    df: DataFrame, bin_col: str, id_col: str
) -> DataFrame:
    """mapInPandas over Arrow batches: binary -> (id, width, height,
    channels, features array<double>).  One Python pass, vectorized per
    batch, no per-row Spark round trips."""
    schema = (
        f"{id_col} long, width int, height int, channels int,"
        " n_bytes long, features array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _pil_decoder()  # None -> deterministic fake
        for pdf in batches:
            if pdf.empty:
                continue
            out = {id_col: [], "width": [], "height": [],
                   "channels": [], "n_bytes": [], "features": []}
            for rid, raw in zip(pdf[id_col], pdf[bin_col]):
                if decode is not None:
                    try:
                        w, h, c, feats = decode(raw or b"")
                    except Exception:
                        w, h, c, feats = _fake_decode_image(raw or b"")
                else:
                    w, h, c, feats = _fake_decode_image(raw or b"")
                out[id_col].append(rid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["n_bytes"].append(len(raw or b""))
                out["features"].append(feats.tolist())
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame, bin_col: str, id_col: str, n_frames: int = 4
) -> DataFrame:
    """Video-frame-sampling plumbing: split the binary payload into
    n_frames evenly-spaced chunks and explode to one row per frame —
    the partition/explode shape of real frame sampling, with byte
    slicing standing in for codec seeks.  Built-ins only."""
    length = F.length(F.col(bin_col))
    step = F.greatest(
        (length / n_frames).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.substring(
                F.col(bin_col), (i * step + 1).cast("int"), 64
            ).alias("frame_bytes"),
        ),
    )
    return df.select(
        id_col, F.explode(frames).alias("f")
    ).select(
        id_col,
        F.col("f.frame_idx").alias("frame_idx"),
        F.col("f.frame_bytes").alias("frame_bytes"),
    )


_AUDIO_WINDOW = 256


def _fake_decode_audio(raw: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode — stands in for torchaudio/soundfile
    load().  Treats the payload bytes as unsigned 8-bit PCM samples.
    Marked fake on purpose: real codecs swap in behind the same window
    framing below and nothing else changes."""
    return np.frombuffer(raw, dtype=np.uint8)


def _audio_decoder():
    """Resolve a REAL audio decoder (soundfile) when importable, else
    None — same executor-side autodetect contract as _pil_decoder."""
    try:
        from io import BytesIO

        import soundfile  # noqa: F401
    except ImportError:
        return None

    def decode(raw):
        import soundfile as sf

        data, _rate = sf.read(BytesIO(raw), dtype="int16")
        # fold to mono unsigned 8-bit so the framing below is uniform
        mono = np.asarray(data, dtype=np.float64).reshape(len(data), -1)
        return ((mono.mean(axis=1) / 256) + 128).astype(np.uint8)

    return decode


def extract_audio_features(
    df: DataFrame, bin_col: str, id_col: str, window: int = _AUDIO_WINDOW,
    decoder: str = "auto",
) -> DataFrame:
    """Audio framing plumbing: binary -> one row per fixed-size sample
    window with integer energy stats (id, window_idx, n_samples,
    code_sum) — the frame/hop shape of real feature extraction (MFCC,
    log-mel) with byte-sum energy standing in for the DSP.  Integer
    outputs keep the cross-engine gate exact.  mapInPandas over Arrow
    batches, one Python pass, windows vectorized per row via one
    reduceat (no per-sample Python).

    decoder: "auto" (default) resolves a real decoder (soundfile)
    when importable and falls back to the deterministic byte decoder
    per payload; "fake" forces the byte decoder so the output is a
    pure function of the bytes regardless of the environment — what
    deterministic gates should pin."""
    if decoder not in ("auto", "fake"):
        raise ValueError(f"decoder must be auto|fake: {decoder!r}")
    schema = f"{id_col} long, window_idx int, n_samples int, code_sum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = (
            _audio_decoder() if decoder == "auto" else None
        )  # None -> deterministic fake
        for pdf in batches:
            if pdf.empty:
                continue
            out = {id_col: [], "window_idx": [], "n_samples": [],
                   "code_sum": []}
            for rid, raw in zip(pdf[id_col], pdf[bin_col]):
                raw = raw or b""
                if decode is not None:
                    try:
                        samples = decode(raw)
                    except Exception:
                        samples = _fake_decode_audio(raw)
                else:
                    samples = _fake_decode_audio(raw)
                n = samples.size
                n_win = max((n + window - 1) // window, 1)
                cuts = np.arange(0, n_win * window, window)
                sums = (
                    np.add.reduceat(samples.astype(np.int64), cuts)
                    if n else np.zeros(1, dtype=np.int64)
                )
                # reduceat quirk: a cut at/after the end repeats the
                # previous slice — zero out windows with no samples
                sizes = np.minimum(np.maximum(n - cuts, 0), window)
                sums = np.where(sizes > 0, sums, 0)
                out[id_col].extend([rid] * n_win)
                out["window_idx"].extend(range(n_win))
                out["n_samples"].extend(sizes.astype(int).tolist())
                out["code_sum"].extend(sums.astype(int).tolist())
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
