"""BM25 top-k query engine over the built index.

One declarative DataFrame DAG per query, mirroring the reference's search
pipeline (/root/reference/internal/search/service.go:76-674, mapped in
SURVEY.md section 3.1):

  query --tokenize(driver)--> candidate terms (exact + typo scan over the
  vocab, deterministic cap) --> block scan (term-bucket partition pruning +
  term pushdown) --> Arrow-batched block decode --> exact-skip /
  best-distance-wins (window) --> per-token max penalized BM25 -->
  AND intersection (groupBy doc having countDistinct(token) == n) -->
  join docs --> total-order top-k (score desc, doc_id asc).

Scale notes:
- the vocabulary typo scan is a distributed mapInPandas over term_stats
  with a length-band pushdown filter (the reference scans the whole vocab
  single-threaded, typo_finder.go:79-124);
- candidate terms are bounded (n_tokens x MAX_TYPO_CANDIDATES), so
  collecting them to the driver and broadcasting is O(KB) -- the postings
  themselves never leave the cluster;
- the blocks scan prunes partitions via the term-bucket directory key and
  pushes ``term IN (...)`` to parquet row-group stats;
- shuffles: candidate-sized only -- (token,term,doc) agg, (token,doc)
  window+agg (one exchange, reused), (doc) agg, then TakeOrdered(k).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..build.builder import load_settings, load_stats
from ..config import (
    BM25_B,
    BM25_K1,
    MAX_TYPO_CANDIDATES,
    TYPO_PENALTY_1,
    TYPO_PENALTY_2,
)
from ..functions.codec import varint_decode, delta_decode
from ..functions.edit_distance import damerau_levenshtein_batch
from ..functions.tokenizer import tokenize

DECODED_SCHEMA = "term string, field string, doc_id long, tf double, dl long"


def decode_blocks_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: block rows -> flat (term, field, doc_id, tf, dl)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        terms, fields, dids, tfs, dls = [], [], [], [], []
        for rec in pdf.itertuples():
            ids = delta_decode(bytes(rec.doc_ids)).astype(np.int64)
            terms.append(np.repeat(rec.term, len(ids)))
            fields.append(np.repeat(rec.field, len(ids)))
            dids.append(ids)
            tfs.append(varint_decode(bytes(rec.tfs)).astype(np.float64))
            dls.append(varint_decode(bytes(rec.dls)).astype(np.int64))
        yield pd.DataFrame(
            {
                "term": np.concatenate(terms),
                "field": np.concatenate(fields),
                "doc_id": np.concatenate(dids),
                "tf": np.concatenate(tfs),
                "dl": np.concatenate(dls),
            }
        )


class SearchEngine:
    def __init__(self, spark: SparkSession, warehouse: str, name: str):
        self.spark = spark
        self.base = os.path.join(warehouse, name)
        self.settings = load_settings(self.base)
        self.stats = load_stats(self.base)
        self.blocks = spark.read.parquet(os.path.join(self.base, "blocks"))
        self.term_stats = spark.read.parquet(os.path.join(self.base, "term_stats"))
        self.docs = spark.read.parquet(os.path.join(self.base, "docs"))

    # ------------------------------------------------------------------
    def _token_gates(self, tokens: list[str], typo_tolerance: bool):
        """Max typo distance per token (reference Q7 gates,
        service.go:176-226; defaults config/settings.go:141-153)."""
        s = self.settings
        gates = {}
        for tok in tokens:
            maxd = 0
            if typo_tolerance and tok not in s.non_typo_tolerant_words:
                if len(tok) >= s.min_word_size_for_2_typos:
                    maxd = 2
                elif len(tok) >= s.min_word_size_for_1_typo:
                    maxd = 1
            gates[tok] = maxd
        return gates

    def candidate_terms(
        self, tokens: list[str], typo_tolerance: bool = True
    ) -> pd.DataFrame:
        """(token, term, distance, penalty) candidate table; bounded by
        n_tokens x (1 + MAX_TYPO_CANDIDATES)."""
        gates = self._token_gates(tokens, typo_tolerance)
        eligible = [(t, d) for t, d in gates.items() if d > 0]
        rows = [(t, t, 0, 1.0) for t in tokens]
        if eligible:
            non_typo = list(self.settings.non_typo_tolerant_words)
            # length-band pushdown: only vocab terms within +-maxd of some
            # eligible token length ever reach the distance UDF
            band = reduce(
                lambda a, b: a | b,
                [
                    (F.abs(F.col("term_len") - len(t)) <= d)
                    for t, d in eligible
                ],
            )
            vocab = self.term_stats.select("term").filter(band)

            def dist_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    terms = pdf["term"].to_numpy(dtype=object)
                    if len(terms) == 0:
                        continue
                    out = []
                    for tok, maxd in eligible:
                        dist = damerau_levenshtein_batch(tok, terms, maxd)
                        m = (dist > 0) & (dist <= maxd)
                        if m.any():
                            out.append(
                                pd.DataFrame(
                                    {
                                        "token": tok,
                                        "term": terms[m],
                                        "distance": dist[m].astype("int32"),
                                    }
                                )
                            )
                    if out:
                        yield pd.concat(out, ignore_index=True)

            cands = vocab.mapInPandas(
                dist_fn, schema="token string, term string, distance int"
            )
            # prefix guard (service.go:204-218)
            if non_typo:
                guard = reduce(
                    lambda a, b: a | b,
                    [
                        (F.length("term") >= 3) & F.lit(w).startswith(F.col("term"))
                        for w in non_typo
                    ],
                )
                cands = cands.filter(~guard)
            # deterministic replacement of the 500/50ms wall-clock cutoff
            w = Window.partitionBy("token").orderBy("distance", "term")
            cands = (
                cands.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= MAX_TYPO_CANDIDATES)
                .drop("rn")
            )
            for r in cands.collect():  # bounded, tiny
                pen = TYPO_PENALTY_1 if r["distance"] == 1 else TYPO_PENALTY_2
                rows.append((r["token"], r["term"], r["distance"], pen))
        return pd.DataFrame(rows, columns=["token", "term", "distance", "penalty"])

    # ------------------------------------------------------------------
    def _term_buckets(self, terms: list[str]) -> list[int]:
        """Bucket of each candidate term via the pure-Python XXH64 replica
        of Spark's xxhash64 (bit-identical, tests/test_xxhash.py) -- exact
        partition pruning with zero Spark jobs."""
        from ..functions.xxhash import term_bucket

        nb = self.settings.term_buckets
        return sorted({term_bucket(t, nb) for t in terms})

    def scan_candidates(
        self, cand: pd.DataFrame, fields: list[str]
    ) -> DataFrame:
        """Decoded postings of candidate terms joined with candidate meta:
        (token, term, distance, penalty, idf, field, doc_id, tf, dl)."""
        terms = sorted(set(cand["term"]))
        buckets = self._term_buckets(terms)
        blk = self.blocks.filter(
            F.col("bucket").isin(buckets)
            & F.col("term").isin(terms)
            & F.col("field").isin(fields)
        )
        decoded = blk.mapInPandas(decode_blocks_fn, schema=DECODED_SCHEMA)
        cand_df = F.broadcast(
            self.spark.createDataFrame(
                cand, schema="token string, term string, distance int, penalty double"
            ).join(
                self.term_stats.select("term", "idf"), "term", "left"
            )
        )
        return decoded.join(cand_df, "term")

    # ------------------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        fields: list[str] | None = None,
        typo_tolerance: bool = True,
    ) -> DataFrame:
        """Top-k BM25 search; returns (doc_id, documentID, score, num_typos,
        rank) rank-identical to the oracle."""
        s = self.settings
        fields = fields or s.searchable_fields
        bad = set(fields) - set(s.searchable_fields)
        if bad:
            # reference errors on restriction outside searchable fields
            # (service.go:82-122)
            raise ValueError(f"non-searchable fields: {sorted(bad)}")
        tokens = list(dict.fromkeys(tokenize(query)))
        if not tokens:
            return self._empty_result()

        cand = self.candidate_terms(tokens, typo_tolerance)
        matched = self.scan_candidates(cand, fields)
        scored = self.score_and_intersect(matched, n_tokens=len(tokens))
        out = (
            scored.join(self.docs.select("doc_id", "documentID"), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "documentID", "score", "num_typos"
        )

    def score_and_intersect(self, matched: DataFrame, n_tokens: int) -> DataFrame:
        """exact-skip + best-distance-wins + max-per-token BM25 + AND."""
        avgdl = float(self.stats["avgdl"])
        # doc-level tf per candidate term: sum over allowed fields
        g1 = matched.groupBy(
            "token", "term", "distance", "penalty", "idf", "doc_id"
        ).agg(F.sum("tf").alias("tf"), F.first("dl").alias("dl"))
        bm25 = (
            F.col("idf")
            * F.col("tf")
            * F.lit(BM25_K1 + 1.0)
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl)
                )
            )
        )
        g1 = g1.withColumn("contrib", F.col("penalty") * bm25)
        # exact-skip + best-distance-wins (service.go:234-257): keep only
        # entries at the minimum distance per (token, doc)
        w = Window.partitionBy("token", "doc_id")
        g2 = g1.withColumn("best_d", F.min("distance").over(w)).filter(
            F.col("distance") == F.col("best_d")
        )
        g3 = g2.groupBy("token", "doc_id").agg(
            F.max("contrib").alias("contrib"), F.min("distance").alias("dist")
        )
        # AND intersection: doc must match every query token
        return (
            g3.groupBy("doc_id")
            .agg(
                F.countDistinct("token").alias("_nt"),
                F.sum("contrib").alias("score"),
                F.sum(F.when(F.col("dist") > 0, 1).otherwise(0))
                .cast("int")
                .alias("num_typos"),
            )
            .filter(F.col("_nt") == n_tokens)
            .drop("_nt")
        )

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame(
            [],
            schema="rank int, doc_id long, documentID string, score double, num_typos int",
        )
