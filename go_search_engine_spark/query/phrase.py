"""Positional phrase search over the stored posting positions.

The reference DECLARES per-posting token positions (index/posting.go:10,
"Added to store token positions") but never writes or reads them; this
engine populates them at build (build/flatmap.py) and makes them
load-bearing here -- new work the reference lacks, enabled by the stored
index rather than a document rescan.

Semantics: a phrase "t1 t2 ... tn" matches a document iff some field's
token stream contains t1..tn at consecutive offsets (tokens from the
standard tokenizer, so "HTTPRequest" matches the phrase "http request").
Matches never span fields. On prefix-n-gram fields only FULL-WORD entries
participate (an edge n-gram is not a word occurrence; its stored position
is the generating token's).

Plan shape (scale notes):
  phrase tokens --exact terms--> bucket-pruned block scan (zero-job
  partition pruning + ``term IN`` row-group pushdown, same path as the
  BM25 engine) --> Arrow-batched decode WITH positions --> broadcast join
  against the (term, slot) phrase table --> explode positions -->
  anchor = position - slot --> groupBy(doc, field, anchor) having
  countDistinct(slot) == n --> per-doc occurrence count.
All shuffles are candidate-sized (postings of the phrase terms only);
the anchor trick turns adjacency into an equi-key aggregation -- no
self-join per adjacent pair, no window over the token stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.codec import decode_positions, delta_decode
from ..functions.tokenizer import tokenize

POS_DECODED_SCHEMA = (
    "term string, field string, doc_id long, fw boolean, positions array<int>"
)


def decode_blocks_pos_fn(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas: block rows -> (term, field, doc_id, fw, positions)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        frames = []
        for rec in pdf.itertuples():
            ids = delta_decode(bytes(rec.doc_ids)).astype(np.int64)
            pos = decode_positions(bytes(rec.positions), len(ids))
            fw = np.unpackbits(
                np.frombuffer(bytes(rec.fws), dtype=np.uint8)
            )[: len(ids)].astype(bool)
            frames.append(
                pd.DataFrame(
                    {
                        "term": rec.term,
                        "field": rec.field,
                        "doc_id": ids,
                        "fw": fw,
                        "positions": [p.astype("int32").tolist() for p in pos],
                    }
                )
            )
        yield pd.concat(frames, ignore_index=True)


def phrase_search(
    engine,
    phrase: str,
    k: int = 10,
    fields: list[str] | None = None,
) -> DataFrame:
    """Top-k documents containing the exact phrase, ranked by occurrence
    count (desc) then doc_id (asc). Returns (rank, doc_id, documentID,
    n_occurrences)."""
    s = engine.settings
    fields = fields or s.searchable_fields
    bad = set(fields) - set(s.searchable_fields)
    if bad:
        raise ValueError(f"non-searchable fields: {sorted(bad)}")
    tokens = tokenize(phrase)  # order AND duplicates both matter here
    if not tokens:
        return _empty(engine)
    n = len(tokens)

    cand = pd.DataFrame({"term": sorted(set(tokens))})
    # driver-side df stats (vocab cache / tiny term IN collect): a phrase
    # containing an unindexed term matches nothing -- zero jobs
    meta = engine._with_stats(cand)
    dfs = dict(zip(meta["term"], (int(x) for x in meta["df"])))
    if min(dfs.values()) == 0:
        return _empty(engine)

    blk = engine.candidate_blocks(cand, fields)
    # project before the decode UDF (column pruning cannot reach through
    # mapInPandas): phrase needs no tf/dl/bound columns
    blk = blk.select("term", "field", "doc_ids", "positions", "fws")
    decoded = blk.mapInPandas(decode_blocks_pos_fn, schema=POS_DECODED_SCHEMA)
    # full-word entries only: an edge n-gram is not a word occurrence
    decoded = decoded.filter(F.col("fw"))

    # rare-term doc pruning: every occurrence lives in a (doc, field)
    # that contains the RAREST phrase term, so when df is skewed (phrase
    # contains a stopword-ish term) semi-join the entries down BEFORE the
    # position explode. The pair set comes from a second scan of the rare
    # term's blocks only -- bucket-pruned and cheap by definition.
    if len(dfs) > 1 and max(dfs.values()) >= 4 * min(dfs.values()):
        rare_t = min(dfs, key=lambda t: (dfs[t], t))
        rb = engine.candidate_blocks(
            pd.DataFrame({"term": [rare_t]}), fields
        ).select("term", "field", "doc_ids", "positions", "fws")
        rare_pairs = (
            rb.mapInPandas(decode_blocks_pos_fn, schema=POS_DECODED_SCHEMA)
            .filter(F.col("fw"))
            .select("doc_id", "field")
            .distinct()
        )
        decoded = decoded.join(rare_pairs, ["doc_id", "field"], "left_semi")

    qidx = F.broadcast(
        engine.spark.createDataFrame(
            [(t, i) for i, t in enumerate(tokens)], "term string, slot int"
        )
    )
    anchors = (
        decoded.join(qidx, "term")
        .select(
            "doc_id",
            "field",
            "slot",
            F.explode("positions").alias("pos"),
        )
        .withColumn("anchor", F.col("pos") - F.col("slot"))
        .groupBy("doc_id", "field", "anchor")
        .agg(F.countDistinct("slot").alias("_ns"))
        .filter(F.col("_ns") == n)
    )
    hits = anchors.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    out = (
        hits.join(engine.docs.select("doc_id", "documentID"), "doc_id")
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
    return out.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "documentID", "n_occurrences"
    )


def _empty(engine) -> DataFrame:
    return engine.spark.createDataFrame(
        [],
        schema="rank int, doc_id long, documentID string, n_occurrences long",
    )
