"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched mapInPandas.

The Spark-side plumbing (schema, batch shape, partition sizing, UDF
signatures) is real and tested; the actual media decode is STUBBED --
image/audio codecs are not in this container. ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (derived from the payload's sha256) stands in so the
pipeline's dataflow can be exercised end-to-end.

At 100 TB scale the important properties are already in place here:
- payloads stay in executor memory as Arrow binary buffers, never
  driver-collected;
- metadata extraction is columnar (one Python call per batch);
- downstream ops (filtering by size/kind, grouping) are plain Column
  expressions on the typed metadata struct.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary"
)
META_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int"
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. STUB: real decoding needs
    an image codec not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic stand-in decoder"
        )
    h = hashlib.sha256(payload).digest()
    width = 4 + h[0] % 13
    height = 4 + h[1] % 7
    rng = np.frombuffer((h * ((width * height * 3) // len(h) + 1))[: width * height * 3],
                        dtype=np.uint8)
    return rng.reshape(height, width, 3)


def extract_metadata(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """(media_id, kind, n_bytes, sha256, width, height, n_frames):
    Arrow-batched metadata extraction over binary payloads."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            # one sha256 per payload (C-speed); the fake decoder's
            # dimensions are derived from the same digest, so nothing is
            # hashed twice
            digests = [hashlib.sha256(p).digest() for p in payloads]
            n_bytes = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n
            )
            is_img = (pdf["kind"] == "image").to_numpy(dtype=bool)
            if is_img.any() and not fake_decode:
                # preserve the stub contract for real decoding
                decode_image(payloads[int(np.argmax(is_img))], fake=False)
            b0 = np.fromiter((d[0] for d in digests), dtype=np.int64, count=n)
            b1 = np.fromiter((d[1] for d in digests), dtype=np.int64, count=n)
            width = pd.Series(4 + b0 % 13, dtype="Int32").where(is_img)
            height = pd.Series(4 + b1 % 7, dtype="Int32").where(is_img)
            # audio/video: frame count stub from payload length
            n_frames = np.where(is_img, 1, np.maximum(1, n_bytes // 64))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": n_bytes,
                    "sha256": [d.hex() for d in digests],
                    "width": width,
                    "height": height,
                    "n_frames": n_frames.astype(np.int32),
                }
            )

    return df.mapInPandas(extract, schema=META_SCHEMA)


def resize_images(df: DataFrame, target: tuple[int, int] = (8, 8),
                  fake_decode: bool = True) -> DataFrame:
    """(media_id, pixels array<int>): nearest-neighbour resize -- the
    Spark-side shape of a feature-extraction UDF (decode stubbed)."""
    th, tw = target

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batched like extract_metadata: one digest pass over the column,
        # dimensions vectorized in numpy; the per-image gather is a pair
        # of fancy-index ops on a contiguous buffer, never a row loop
        # over DataFrame records
        ys_base = np.arange(th)
        xs_base = np.arange(tw)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            if not fake_decode and payloads:
                decode_image(payloads[0], fake=False)  # stub contract
            digests = [hashlib.sha256(p).digest() for p in payloads]
            b0 = np.fromiter((d[0] for d in digests), dtype=np.int64, count=n)
            b1 = np.fromiter((d[1] for d in digests), dtype=np.int64, count=n)
            widths = (4 + b0 % 13).astype(np.int64)
            heights = (4 + b1 % 7).astype(np.int64)
            pix = []
            for d, w, h in zip(digests, widths, heights):
                nbytes = int(w * h * 3)
                buf = np.frombuffer(
                    (d * (nbytes // len(d) + 1))[:nbytes], dtype=np.uint8
                ).reshape(int(h), int(w), 3)
                small = (
                    buf[ys_base * int(h) // th][:, xs_base * int(w) // tw]
                    .mean(axis=2)
                    .astype(np.int64)
                )
                pix.append(small.ravel().tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "pixels": pix}
            )

    return df.filter(F.col("kind") == "image").mapInPandas(
        resize, schema="media_id long, pixels array<bigint>"
    )


def synthesize_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary payloads from a text column (test fixture:
    the container has no real media files)."""
    kind = F.when(F.col(id_col) % 3 == 0, "image").when(
        F.col(id_col) % 3 == 1, "audio"
    ).otherwise("video")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
