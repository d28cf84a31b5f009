"""Document -> postings flatMap (Arrow-batched mapInPandas).

This is the engine's analogue of the reference's per-document indexing loop
(/root/reference/internal/indexing/service.go:220-305 and the bulk worker
bulk_operations.go:157-248): per searchable field, tokenize (with or
without edge n-grams per field settings, service.go:310-320), count term
frequencies, and emit one posting row per (doc, field, unique term).

Faithful semantics notes:
- In prefix-n-gram mode the reference dedups tokens globally before
  counting (tokenizer.go:56-78), so every term's tf is 1 -- preserved here.
- In no-prefix mode tf is the real occurrence count (service.go:258-261).
- ``positions`` (token offsets in the field's token stream) and
  ``is_full_word`` are declared-but-dead in the reference
  (index/posting.go:9-10, never written); the north rule requires them, so
  this engine actually populates them: positions of every occurrence for
  full words, position of the first generating token for n-gram-only
  terms.
- ``dl`` is the BM25 document length: whitespace word count summed over
  searchable fields (bm25.go:109-158), carried on every posting row so the
  block builder can precompute exact per-entry BM25 scores without a
  postings-by-doc join.

The heavy regex passes run vectorized over the whole Arrow batch
(pandas .str ops in C). No-prefix fields (file bodies -- the bulk of the
corpus) are then fully numpy-vectorized (factorize + lexsort + boundary
masks), including the varint position records; only prefix-n-gram fields
(short: titles/paths) keep a per-doc Python loop, because their
order-preserving dedup interleave is inherently sequential. Arrow-batched
throughout, never per-row Spark Python.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..config import IndexSettings
from ..functions.codec import encode_positions
from ..functions.tokenizer import prefix_ngrams, tokenize_series

# ``positions`` is ALREADY varint-encoded per row ([count, first,
# deltas...] -- functions.codec.encode_positions record format): the codec
# runs at the earliest point so the big (term, salt) shuffle moves compact
# bytes, and the block builder concatenates buffers instead of re-encoding.
# Decode with functions.codec.decode_positions(buf, 1).
POSTINGS_SCHEMA = (
    "doc_id long, field string, term string, tf double, "
    "positions binary, is_full_word boolean, dl long"
)


_EMPTY_POS = b"\x00"  # varint record [count=0]: positions not stored


def _doc_postings(
    doc_id: int,
    field: str,
    tokens: list[str],
    use_prefix: bool,
    dl: int,
    max_ngram_len: int | None = None,
    store_positions: bool = True,
):
    """Yield posting tuples for one (doc, field)."""
    if not tokens:
        return
    if not store_positions:
        enc = lambda _pos: _EMPTY_POS  # noqa: E731
    else:
        enc = lambda pos: encode_positions([pos])  # noqa: E731
    counts = Counter(tokens)
    first_pos: dict[str, int] = {}
    all_pos: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        if t not in first_pos:
            first_pos[t] = i
            all_pos[t] = [i]
        else:
            all_pos[t].append(i)
    if use_prefix:
        # reference T3: global order-preserving dedup across tokens and
        # their edge n-grams => tf = 1 for every emitted term
        seen: set[str] = set()
        for i, t in enumerate(tokens):
            if t not in seen:
                seen.add(t)
                yield (doc_id, field, t, 1.0, enc(all_pos[t]), True, dl)
            grams = prefix_ngrams(t)
            if max_ngram_len is not None:
                grams = grams[:max_ngram_len]
            for g in grams:
                if g not in seen:
                    seen.add(g)
                    full = g in counts
                    pos = all_pos[g] if full else [i]
                    yield (doc_id, field, g, 1.0, enc(pos), full, dl)
    else:
        for t, c in counts.items():
            yield (doc_id, field, t, float(c), enc(all_pos[t]), True, dl)


_COLS = ["doc_id", "field", "term", "tf", "positions", "is_full_word", "dl"]


def _field_postings_vectorized(
    doc_ids: np.ndarray, dls: np.ndarray, token_lists, field: str,
    store_positions: bool = True,
) -> pd.DataFrame:
    """No-prefix path, numpy-vectorized: factorize tokens, lexsort on
    (doc, token-code), group boundaries -> tf + position lists. No
    per-document Python loop -- this field path carries the bulk of a
    source-code corpus (file bodies)."""
    counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                         count=len(token_lists))
    total = int(counts.sum())
    if total == 0:
        return pd.DataFrame(columns=_COLS)
    flat = np.empty(total, dtype=object)
    off = 0
    for toks in token_lists:  # list concatenation only; no counting logic
        flat[off : off + len(toks)] = toks
        off += len(toks)
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    offsets = np.zeros(len(counts), dtype=np.int64)
    offsets[1:] = np.cumsum(counts)[:-1]
    pos_in_doc = np.arange(total) - np.repeat(offsets, counts)

    codes, uniques = pd.factorize(flat)  # C-speed string interning
    order = np.lexsort((codes, doc_idx))  # stable: positions stay ascending
    sd, sc, sp = doc_idx[order], codes[order], pos_in_doc[order]
    new_group = np.empty(total, dtype=bool)
    new_group[0] = True
    new_group[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
    starts = np.nonzero(new_group)[0]
    counts = np.diff(np.append(starts, total))
    tf = counts.astype(np.float64)
    if store_positions:
        positions = _encode_position_records(sp, starts, counts)
    else:
        positions = [_EMPTY_POS] * len(starts)
    return pd.DataFrame(
        {
            "doc_id": doc_ids[sd[starts]],
            "field": field,
            "term": uniques[sc[starts]],
            "tf": tf,
            "positions": positions,
            "is_full_word": True,
            "dl": dls[sd[starts]],
        }
    )


def _encode_position_records(
    sp: np.ndarray, starts: np.ndarray, counts: np.ndarray
) -> list[bytes]:
    """Per-group [count, first, deltas...] varint records, built from the
    flat sorted position stream without materializing per-group lists."""
    from ..functions.codec import varint_encode_with_widths

    n = len(starts)
    total = len(sp)
    rec_starts = np.arange(n, dtype=np.int64)  # one count slot per group
    rec_starts += np.cumsum(np.append(0, counts[:-1]).astype(np.int64))
    stream = np.zeros(n + total, dtype=np.uint64)
    stream[rec_starts] = counts.astype(np.uint64)
    gid = np.repeat(np.arange(n), counts)
    within = np.arange(total) - np.repeat(starts, counts)
    deltas = np.empty(total, dtype=np.uint64)
    first = within == 0
    deltas[first] = sp[first].astype(np.uint64)
    prev = np.empty(total, dtype=np.int64)
    prev[1:] = sp[:-1]
    prev[0] = 0
    deltas[~first] = (sp - prev)[~first].astype(np.uint64)
    stream[rec_starts[gid] + 1 + within] = deltas
    data, widths = varint_encode_with_widths(stream)
    wcum = np.zeros(len(widths) + 1, dtype=np.int64)
    np.cumsum(widths, out=wcum[1:])
    offs = wcum[rec_starts]
    ends = np.append(offs[1:], len(data))
    raw = data.tobytes()
    return [raw[offs[i] : ends[i]] for i in range(n)]


def make_flatmap(settings: IndexSettings):
    """Return a mapInPandas function emitting POSTINGS_SCHEMA rows.

    Expects input batches with columns: doc_id, doc_len, plus one string
    column per searchable field. No-prefix fields take the fully
    vectorized path; prefix-n-gram fields keep the per-doc loop (their
    dedup-interleaved ordering is inherently sequential, and such fields
    are short -- titles/paths).
    """
    fields = list(settings.searchable_fields)
    prefix_flags = {f: settings.uses_prefix(f) for f in fields}
    store_pos = settings.store_positions

    def flat_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = pdf["doc_id"].to_numpy()
            dls = pdf["doc_len"].to_numpy()
            frames: list[pd.DataFrame] = []
            for field in fields:
                token_lists = tokenize_series(pdf[field])
                if not prefix_flags[field]:
                    frames.append(
                        _field_postings_vectorized(
                            doc_ids, dls, list(token_lists), field,
                            store_pos,
                        )
                    )
                else:
                    rows: list[tuple] = []
                    for did, dl, toks in zip(doc_ids, dls, token_lists):
                        rows.extend(
                            _doc_postings(
                                int(did), field, toks, True, int(dl),
                                settings.max_ngram_len, store_pos,
                            )
                        )
                    frames.append(pd.DataFrame(rows, columns=_COLS))
            yield pd.concat(frames, ignore_index=True)

    return flat_map
