"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns; every transform is an
Arrow-batched mapInPandas operator with a real schema, partitioning story,
and batch shape.  Image decoders are real (customer_er_spark.codecs:
png/raw/qpng plus a pure-numpy baseline JPEG), and WAV PCM audio is real
(customer_er_spark.audio, pure stdlib); formats needing external libs
(mp3, mp4, webm) are STUBBED behind NotImplementedError — their Spark-side
plumbing is what's tested.

Operators:
  decode_meta      bytes -> (ok, height, width, channels, mean_luma)
  resize_images    bytes -> re-encoded bytes at new size (area resampling)
  image_features   bytes -> fixed-width float vector (luma histogram), the
                   embedding-extraction stand-in
  audio_meta       bytes -> (ok, sample_rate, channels, n_samples,
                   duration_s, rms) — WAV real, others poison-safe false
  frame_sample     stub for video: deterministic frame-index plan only
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customer_er_spark import codecs

_STUB_FORMATS = {"mp3", "mp4", "webm"}


def _decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt in _STUB_FORMATS:
        raise NotImplementedError(
            f"codec for {fmt!r} requires external libraries not present in "
            "this container; plumbing is exercised with png/raw/qpng"
        )
    return codecs.decode(data, fmt)


def decode_meta(images: DataFrame) -> DataFrame:
    """bytes/fmt -> typed metadata; undecodable rows get ok=false, not a
    job failure (at 10^12 rows a poison row must never kill the stage)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, fmt in zip(pdf.image_id, pdf.bytes, pdf.fmt):
                try:
                    img = _decode(bytes(data), fmt)
                    c = 1 if img.ndim == 2 else img.shape[2]
                    rows.append((iid, True, img.shape[0], img.shape[1], c,
                                 float(np.mean(img))))
                except Exception:
                    rows.append((iid, False, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "ok", "height", "width", "channels", "mean_luma"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        op,
        schema="image_id string, ok boolean, height int, width int, "
               "channels int, mean_luma double",
    )


def resize_images(images: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Deterministic area resize; output re-encoded in the same fmt."""
    from customer_er_spark.phash import resize_area, to_gray

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, fmts = [], [], []
            for iid, data, fmt in zip(pdf.image_id, pdf.bytes, pdf.fmt):
                img = _decode(bytes(data), fmt)
                small = np.clip(
                    resize_area(to_gray(img), out_h, out_w), 0, 255
                ).astype(np.uint8)
                ids.append(iid)
                blobs.append(codecs.encode(small, fmt))
                fmts.append(fmt)
            yield pd.DataFrame(
                {"image_id": ids, "bytes": blobs, "fmt": fmts,
                 "h": out_h, "w": out_w}
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        op, schema="image_id string, bytes binary, fmt string, h int, w int"
    )


def image_features(images: DataFrame, n_bins: int = 16) -> DataFrame:
    """Fixed-width feature vector per image (normalized luma histogram) —
    the shape/partitioning stand-in for a real embedding extractor."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for iid, data, fmt in zip(pdf.image_id, pdf.bytes, pdf.fmt):
                img = _decode(bytes(data), fmt)
                hist, _ = np.histogram(img, bins=n_bins, range=(0, 256))
                total = max(int(hist.sum()), 1)
                ids.append(iid)
                feats.append([float(x) / total for x in hist])
            yield pd.DataFrame({"image_id": ids, "features": feats})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        op, schema="image_id string, features array<double>"
    )


def audio_meta(audio: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """bytes/fmt -> typed audio metadata.  WAV decodes for real
    (customer_er_spark.audio.decode_wav); stubbed formats (mp3/mp4/webm)
    and malformed payloads get ok=false, never a stage failure."""
    from customer_er_spark.audio import decode_wav

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data, fmt in zip(pdf[id_col], pdf.bytes, pdf.fmt):
                try:
                    if fmt != "wav":
                        raise NotImplementedError(
                            f"codec for {fmt!r} requires external libraries"
                        )
                    samples, rate = decode_wav(bytes(data))
                    rows.append((
                        aid, True, rate, samples.shape[1], samples.shape[0],
                        samples.shape[0] / rate,
                        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))),
                    ))
                except Exception:
                    rows.append((aid, False, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "ok", "sample_rate", "channels",
                         "n_samples", "duration_s", "rms"],
            )

    return audio.select(F.col(id_col), "bytes", "fmt").mapInPandas(
        op,
        schema=f"{id_col} string, ok boolean, sample_rate int, channels int, "
               "n_samples long, duration_s double, rms double",
    )


def frame_sample_plan(
    videos: DataFrame, every_n: int = 30, id_col: str = "image_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Video frame sampling *plan* (decode itself is stubbed): one row per
    sampled frame index — pure Catalyst sequence/explode, no UDF."""
    return videos.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
