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
from ..functions.codec import decode_positions, delta_decode, varint_decode

# block-max metadata is (max_tf, min_dl): since BM25 is increasing in tf
# and decreasing in dl, score(tf, dl) <= score(max_tf, min_dl) for every
# entry in the block -- a valid (slightly looser) WAND upper bound that
# does NOT require idf at build time, which lets the blocks job run
# concurrently with the term-stats job (see builder._finalize).
BLOCKS_SCHEMA = (
    "bucket int, term string, field string, salt int, block_id int, n int, "
    "first_doc long, last_doc long, doc_ids binary, tfs binary, dls binary, "
    "positions binary, fws binary, max_tf double, min_dl long"
)

GROUP_COLS = ["term", "field", "salt"]


def bm25_score(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    """Exact BM25 per entry (reference bm25.go:59-83; k1=1.2, b=0.75).
    Also the block upper-bound formula: score(max_tf, min_dl) bounds every
    entry because BM25 is monotone increasing in tf, decreasing in dl."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
    return idf * (tf * (BM25_K1 + 1.0)) / denom


def _encode_partition(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Whole-partition vectorized encoder.

    Rows arrive sorted by (term, field, salt, doc_id) with groups
    contiguous, so group and block boundaries are numpy boundary masks;
    doc-id deltas, per-entry BM25 scores, block maxima (reduceat) and the
    three varint streams are computed over the WHOLE partition at once,
    then sliced per block at value boundaries. The only Python-level loop
    is over blocks (n_rows / block_size) to cut the byte buffers.
    """

    from ..functions.codec import varint_encode_with_widths

    n = len(pdf)
    term = pdf["term"].to_numpy(dtype=object)
    field = pdf["field"].to_numpy(dtype=object)
    salt = pdf["salt"].to_numpy(dtype=np.int64)
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.float64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    buckets = pdf["bucket"].to_numpy(dtype=np.int64)

    ng = np.empty(n, dtype=bool)
    ng[0] = True
    ng[1:] = (term[1:] != term[:-1]) | (field[1:] != field[:-1]) | (
        salt[1:] != salt[:-1]
    )
    gstart_idx = np.nonzero(ng)[0]
    gid = np.cumsum(ng) - 1
    row_in_g = np.arange(n) - gstart_idx[gid]
    blk_in_g = row_in_g // block_size
    nb = np.empty(n, dtype=bool)
    nb[0] = True
    nb[1:] = ng[1:] | (blk_in_g[1:] != blk_in_g[:-1])
    bstart = np.nonzero(nb)[0]
    n_blocks = len(bstart)
    bcount = np.diff(np.append(bstart, n))
    bend = bstart + bcount - 1

    max_tf = np.maximum.reduceat(tfs, bstart)
    min_dl = np.minimum.reduceat(dls, bstart)

    # doc-id deltas restart at each block
    deltas = np.empty(n, dtype=np.uint64)
    deltas[nb] = doc_ids[nb].astype(np.uint64)
    prev = np.empty(n, dtype=np.int64)
    prev[1:] = doc_ids[:-1]
    prev[0] = 0
    deltas[~nb] = (doc_ids - prev)[~nb].astype(np.uint64)

    def per_block_bufs(values: np.ndarray, item_starts: np.ndarray):
        """varint-encode once; slice at per-block value boundaries."""
        data, widths = varint_encode_with_widths(values)
        wcum = np.zeros(len(widths) + 1, dtype=np.int64)
        np.cumsum(widths, out=wcum[1:])
        byte_offs = wcum[item_starts]
        ends = np.append(byte_offs[1:], len(data))
        raw = data.tobytes()
        return [raw[byte_offs[i] : ends[i]] for i in range(len(item_starts))]

    doc_bufs = per_block_bufs(deltas, bstart)
    tf_bufs = per_block_bufs(tfs.astype(np.uint64), bstart)
    dl_bufs = per_block_bufs(dls.astype(np.uint64), bstart)

    # positions arrive ALREADY varint-encoded per row (flatmap.py records
    # [count, first, deltas...]); a block's positions stream is just the
    # concatenation of its rows' buffers -- no re-encode on the hot path
    pos_rows = [bytes(b) for b in pdf["positions"].to_numpy(dtype=object)]
    all_pos = b"".join(pos_rows)
    plens = np.fromiter((len(b) for b in pos_rows), dtype=np.int64, count=n)
    poffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(plens, out=poffs[1:])
    bpos_start = poffs[bstart]
    bpos_end = np.append(bpos_start[1:], len(all_pos))
    pos_bufs = [all_pos[bpos_start[i] : bpos_end[i]] for i in range(n_blocks)]

    # is_full_word bitmask (1 bit/entry): the reference declares this flag
    # but never writes it (index/posting.go:9-10); the A3 exact-word
    # accounting (service.go:443-509) needs it at query time
    fw = pdf["is_full_word"].to_numpy(dtype=bool)
    bend_excl = np.append(bstart[1:], n)
    fw_bufs = [
        np.packbits(fw[bstart[i] : bend_excl[i]]).tobytes()
        for i in range(n_blocks)
    ]

    return pd.DataFrame(
        {
            "bucket": buckets[bstart].astype(np.int32),
            "term": term[bstart],
            "field": field[bstart],
            "salt": salt[bstart].astype(np.int32),
            "block_id": (blk_in_g[bstart]).astype(np.int32),
            "n": bcount.astype(np.int32),
            "first_doc": doc_ids[bstart],
            "last_doc": doc_ids[bend],
            "doc_ids": doc_bufs,
            "tfs": tf_bufs,
            "dls": dl_bufs,
            "positions": pos_bufs,
            "fws": fw_bufs,
            "max_tf": max_tf,
            "min_dl": min_dl,
        }
    )


def make_block_builder(settings: IndexSettings):
    """mapInPandas fn: sorted flat postings (+bucket, salt) -> blocks."""
    block_size = settings.block_size

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry-over buffering: a group split across Arrow batches must be
        # encoded whole, or block_ids would collide/restart mid-group
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
                yield _encode_partition(done, block_size)
        if leftover is not None and len(leftover):
            yield _encode_partition(leftover, block_size)

    return build


def decode_block(row) -> pd.DataFrame:
    """Decode one block row back to flat entries (debug/tests)."""
    ids = delta_decode(bytes(row["doc_ids"])).astype(np.int64)
    tfs = varint_decode(bytes(row["tfs"])).astype(np.float64)
    dls = varint_decode(bytes(row["dls"])).astype(np.int64)
    pos = decode_positions(bytes(row["positions"]), len(ids))
    fw = np.unpackbits(np.frombuffer(bytes(row["fws"]), dtype=np.uint8))[
        : len(ids)
    ].astype(bool)
    return pd.DataFrame(
        {
            "term": row["term"],
            "field": row["field"],
            "doc_id": ids,
            "tf": tfs,
            "dl": dls,
            "positions": [p.astype(np.int64).tolist() for p in pos],
            "is_full_word": fw,
        }
    )
