from __future__ import annotations

import hashlib

import pytest

from go_search_engine_spark.pipeline.multimodal import (
    decode_image,
    extract_metadata,
    resize_images,
    synthesize_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")


def test_decode_fake_deterministic():
    a = decode_image(b"hello", fake=True)
    b = decode_image(b"hello", fake=True)
    assert a.shape == b.shape and (a == b).all()
    assert a.ndim == 3 and a.shape[2] == 3


def test_metadata_extraction(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = synthesize_media(docs)
    meta = extract_metadata(media, fake_decode=True)
    rows = {r["media_id"]: r for r in meta.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(src)
    for mid, r in rows.items():
        payload = src[mid].encode()
        assert r["n_bytes"] == len(payload)
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        if r["kind"] == "image":
            assert r["width"] is not None and r["height"] is not None
        else:
            assert r["n_frames"] >= 1


def test_resize_shapes(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = synthesize_media(docs)
    out = resize_images(media, target=(4, 4), fake_decode=True).collect()
    assert len(out) > 0
    for r in out:
        assert len(r["pixels"]) == 16
