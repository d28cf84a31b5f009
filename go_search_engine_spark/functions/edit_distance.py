"""Damerau-Levenshtein edit distance (optimal string alignment variant),
batch-vectorized with numpy.

Semantics match the reference (/root/reference/internal/typoutil/
levenshtein.go:6-87): 3-row DP with adjacent transpositions, a length-diff
pre-filter, and ``maxDistance + 1`` returned when the true distance exceeds
``max_distance``. Spark's built-in ``levenshtein()`` has no transpositions,
so this is custom -- but Arrow-batched (one Python call per vocab batch),
never per-row Spark Python.

The DP here runs over a whole batch of candidate terms at once: strings are
packed into a 2-D uint32 code matrix and the DP advances column-by-column
across all rows simultaneously (numpy ops over the batch axis), so the
Python-level loop is O(max_len), not O(batch * len_a * len_b).
"""

from __future__ import annotations

import numpy as np


def damerau_levenshtein(a: str, b: str, max_distance: int = 2**30) -> int:
    """Scalar reference implementation (used by the oracle + tests)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_distance:
        return max_distance + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev_prev = [0] * (lb + 1)
    prev = list(range(lb + 1))
    curr = [0] * (lb + 1)
    for i in range(1, la + 1):
        curr[0] = i
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d = min(d, prev_prev[j - 2] + cost)
            curr[j] = d
            row_min = min(row_min, d)
        if row_min > max_distance:
            return max_distance + 1
        prev_prev, prev, curr = prev, curr, prev_prev
    return prev[lb]


def _pack(strs: np.ndarray, width: int) -> np.ndarray:
    """Pack an array of strings into an (n, width) uint32 codepoint matrix
    padded with 0 (codepoint 0 never appears in tokens)."""
    n = len(strs)
    out = np.zeros((n, width), dtype=np.uint32)
    for i, s in enumerate(strs):  # per-string, but just a memcpy each
        if s:
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            out[i, : len(cp)] = cp
    return out


def damerau_levenshtein_batch(
    query: str, terms: np.ndarray, max_distance: int
) -> np.ndarray:
    """Distance of ``query`` to every term in ``terms`` (array of str),
    clipped to ``max_distance + 1``. Vectorized over the batch axis."""
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = len(query)
    lens = np.char.str_len(terms.astype(str))
    cap = max_distance + 1
    out = np.full(n, cap, dtype=np.int64)

    # length-diff pre-filter (levenshtein.go:13-20)
    active = np.abs(lens - la) <= max_distance
    if la == 0:
        out[active] = lens[active]
        return out
    empty = active & (lens == 0)
    out[empty] = la
    active &= lens > 0
    idx = np.nonzero(active)[0]
    if idx.size == 0:
        return out

    sub = terms[idx].astype(str)
    sub_lens = lens[idx]
    lb = int(sub_lens.max())
    bm = _pack(sub, lb)  # (m, lb) candidate codepoints
    am = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)  # (la,)

    m = len(idx)
    big = np.int64(1 << 30)
    prev_prev = np.zeros((m, lb + 1), dtype=np.int64)
    prev = np.tile(np.arange(lb + 1, dtype=np.int64), (m, 1))
    curr = np.zeros((m, lb + 1), dtype=np.int64)
    # mask out j positions beyond each candidate's own length
    jgrid = np.arange(1, lb + 1)
    valid = jgrid[None, :] <= sub_lens[:, None]  # (m, lb)

    alive = np.ones(m, dtype=bool)
    for i in range(1, la + 1):
        curr[:, 0] = i
        ai = am[i - 1]
        cost = (bm != ai).astype(np.int64)  # (m, lb)
        # deletion: prev[:, j] + 1 -- fully vectorized
        dele = prev[:, 1:] + 1
        subst = prev[:, :-1] + cost
        if i > 1:
            # transposition candidates: a[i-1]==b[j-2] and a[i-2]==b[j-1]
            t_ok = np.zeros((m, lb), dtype=bool)
            t_ok[:, 1:] = (bm[:, :-1] == ai) & (bm[:, 1:] == am[i - 2])
            trans = np.where(
                t_ok,
                np.concatenate(
                    [np.full((m, 2), big), prev_prev[:, :-2]], axis=1
                )[:, 1:]
                + cost,
                big,
            )
        else:
            trans = np.full((m, lb), big)
        base = np.minimum(np.minimum(dele, subst), trans)
        # insertion needs a left-to-right scan: curr[j-1] + 1.
        # min-plus prefix scan: curr[j] = min(base[j], curr[j-1]+1)
        # = min over k<=j of base[k] + (j-k); compute via cummin of
        # (base[k] - k) then add j.
        shifted = base - jgrid[None, :]
        np.minimum.accumulate(shifted, axis=1, out=shifted)
        row = np.minimum(base, shifted + jgrid[None, :])
        # account for insertion from column 0 (curr[:,0]=i): i + j
        row = np.minimum(row, i + jgrid[None, :])
        curr[:, 1:] = row
        # early termination per candidate (levenshtein.go:76-80)
        row_min = np.where(valid, row, big).min(axis=1)
        row_min = np.minimum(row_min, i)
        alive &= row_min <= max_distance
        if not alive.any():
            return out
        prev_prev, prev, curr = prev, curr, prev_prev

    final = prev[np.arange(m), sub_lens]
    final = np.where(alive, np.minimum(final, cap), cap)
    out[idx] = final
    return out
