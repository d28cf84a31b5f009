"""Compressed block-max posting blocks.

Flat postings -> per-(term, field, salt) docID-ordered blocks of
``block_size`` entries: doc_ids delta+varint, tfs/dls varint, positions
nested-varint, plus block metadata (n, first/last doc, max_tf and the exact
block-max BM25 score) enabling WAND block skipping without decode.

The reference keeps impact-ordered (tf desc) uncompressed lists
(/root/reference/internal/indexing/service.go:290-298); docID-ordered
block-max lists are deliberate new work (SURVEY.md section 4) -- they
support both sorted-merge segment union and block-max WAND.

Grouping runs inside mapInPandas with carry-over buffering across Arrow
batches: rows arrive hash-partitioned by (term, salt) and sorted by
(term, field, salt, doc_id), so each group is contiguous within its
partition and only the trailing (possibly incomplete) group is carried to
the next batch. This avoids applyInPandas' per-group scheduling overhead
over millions of tiny vocabulary groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..config import BM25_B, BM25_K1, IndexSettings
from ..functions.codec import (
    decode_positions,
    delta_decode,
    delta_encode,
    encode_positions,
    varint_decode,
    varint_encode,
)

BLOCKS_SCHEMA = (
    "bucket int, term string, field string, salt int, block_id int, n int, "
    "first_doc long, last_doc long, doc_ids binary, tfs binary, dls binary, "
    "positions binary, max_tf double, max_score double"
)

GROUP_COLS = ["term", "field", "salt"]


def bm25_score(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    """Exact BM25 per entry (reference bm25.go:59-83; k1=1.2, b=0.75)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
    return idf * (tf * (BM25_K1 + 1.0)) / denom


def _encode_group(g: pd.DataFrame, block_size: int, avgdl: float) -> list[tuple]:
    term = g["term"].iloc[0]
    field = g["field"].iloc[0]
    salt = int(g["salt"].iloc[0])
    bucket = int(g["bucket"].iloc[0])
    idf = float(g["idf"].iloc[0])
    doc_ids = g["doc_id"].to_numpy(dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfs = g["tf"].to_numpy(dtype=np.float64)[order]
    dls = g["dl"].to_numpy(dtype=np.int64)[order]
    positions = g["positions"].to_numpy()[order]
    scores = bm25_score(tfs, dls, idf, avgdl)
    out = []
    for b, start in enumerate(range(0, len(doc_ids), block_size)):
        sl = slice(start, start + block_size)
        ids = doc_ids[sl]
        out.append(
            (
                bucket,
                term,
                field,
                salt,
                b,
                int(len(ids)),
                int(ids[0]),
                int(ids[-1]),
                delta_encode(ids.astype(np.uint64)),
                varint_encode(tfs[sl].astype(np.uint64)),
                varint_encode(dls[sl].astype(np.uint64)),
                encode_positions([list(p) for p in positions[sl]]),
                float(tfs[sl].max()),
                float(scores[sl].max()),
            )
        )
    return out


_COLS = [
    "bucket", "term", "field", "salt", "block_id", "n", "first_doc",
    "last_doc", "doc_ids", "tfs", "dls", "positions", "max_tf", "max_score",
]


def make_block_builder(settings: IndexSettings, avgdl: float):
    """mapInPandas fn: sorted flat postings (+idf, bucket, salt) -> blocks."""
    block_size = settings.block_size

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: pd.DataFrame | None = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_key = tuple(pdf.iloc[-1][c] for c in GROUP_COLS)
            tail_mask = np.ones(len(pdf), dtype=bool)
            for c, v in zip(GROUP_COLS, last_key):
                tail_mask &= (pdf[c] == v).to_numpy()
            leftover = pdf[tail_mask]
            done = pdf[~tail_mask]
            if len(done):
                yield _encode_batch(done, block_size, avgdl)
        if leftover is not None and len(leftover):
            yield _encode_batch(leftover, block_size, avgdl)

    def _encode_batch(pdf: pd.DataFrame, block_size: int, avgdl: float):
        rows: list[tuple] = []
        for _, g in pdf.groupby(GROUP_COLS, sort=False):
            rows.extend(_encode_group(g, block_size, avgdl))
        return pd.DataFrame(rows, columns=_COLS)

    return build


def decode_block(row) -> pd.DataFrame:
    """Decode one block row back to flat entries (debug/tests)."""
    ids = delta_decode(bytes(row["doc_ids"])).astype(np.int64)
    tfs = varint_decode(bytes(row["tfs"])).astype(np.float64)
    dls = varint_decode(bytes(row["dls"])).astype(np.int64)
    pos = decode_positions(bytes(row["positions"]), len(ids))
    return pd.DataFrame(
        {
            "term": row["term"],
            "field": row["field"],
            "doc_id": ids,
            "tf": tfs,
            "dl": dls,
            "positions": [p.astype(np.int64).tolist() for p in pos],
        }
    )
