"""Block-max pruned top-k (WAND-style), adapted to this engine's
AND-over-tokens + summed-BM25 semantics.

The reference has no equivalent: it keeps impact-ordered uncompressed
lists and scores every candidate (service.go:328-438). This module is the
scale path the north rule asks for -- skip decoding posting blocks that
provably cannot contribute to the top-k, using block metadata only, while
staying rank-identical to the exhaustive engine (tests/test_wand.py).

Key idea for AND semantics: every result doc occurs in the postings of
the *rarest* query token R, so R's candidate postings (cheap by
definition) are decoded in full and anchor everything:

  1. rare_contrib(d): R's exact per-doc contribution (exact-skip +
     best-distance + max penalized BM25) -- computable exactly because
     ALL of R's entries are present; no cross-phase split of a token's
     exact/typo entries (that split would break exact-skip soundness).
  2. block-max upper bound: UB(d) = rare_contrib(d) + sum over other
     tokens of max(penalty * block upper bound, where the bound is
     idf * bm25(max_tf, min_dl) -- monotone BM25). Since the true score is
     rare_contrib(d) + sum of other-token contributions <= UB(d), any doc
     with UB(d) < theta (strictly) cannot reach the top-k, even on
     tie-break.
  3. theta = k-th best fully-scored AND result among the 4k docs with the
     highest rare_contrib (phase 1, exact scores).
  4. the *common* tokens' blocks -- the expensive ones -- are decoded only
     if they overlap a doc-space chunk containing a surviving rare doc
     (distributed chunk equi-join, never a driver-side interval scan).

Every emitted score is computed from the complete entry set of its doc,
so correctness never depends on the pruning arithmetic being tight --
only the prune direction (upper bounds are maxima over penalized exact
per-entry BM25 scores precomputed at build time, build/blocks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize
from .engine import DECODED_SCHEMA, decode_blocks_fn

CHUNK_SHIFT = 16  # doc-space chunk = 65536 ids


def _span_chunks(first, last):
    return F.sequence(
        F.shiftright(first, CHUNK_SHIFT), F.shiftright(last, CHUNK_SHIFT)
    )


def wand_topk(
    engine,
    query: str,
    k: int = 10,
    fields: list[str] | None = None,
    typo_tolerance: bool = True,
    report: dict | None = None,
) -> DataFrame:
    """Rank-identical to ``engine.search``; ``report`` receives pruning
    statistics (blocks decoded vs alive vs total)."""
    s = engine.settings
    fields = fields or s.searchable_fields
    tokens = list(dict.fromkeys(tokenize(query)))
    if not tokens:
        return engine._empty_result()

    cand = engine.candidate_terms(tokens, typo_tolerance)
    terms = sorted(set(cand["term"]))
    buckets = engine._term_buckets(terms)
    blk = engine.blocks.filter(
        F.col("bucket").isin(buckets)
        & F.col("term").isin(terms)
        & F.col("field").isin(fields)
    )

    cand_meta = F.broadcast(
        engine.spark.createDataFrame(
            cand, schema="token string, term string, distance int, penalty double"
        ).join(engine.term_stats.select("term", "idf"), "term", "left")
    )

    # rarest token by summed candidate df
    tstats = {
        r["term"]: r["df"]
        for r in engine.term_stats.filter(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    }
    tok_df = {
        tok: int(sum(tstats.get(t, 0) for t in g["term"]))
        for tok, g in cand.groupby("token")
    }
    if len(tok_df) < len(tokens) or min(tok_df.values(), default=0) == 0:
        return engine._empty_result()  # some token matches nothing => AND empty
    rare = min(tok_df, key=lambda t: (tok_df[t], t))
    rare_terms = sorted(cand[cand["token"] == rare]["term"])
    single_token = len(tokens) == 1

    # ---- decode ALL rare-token candidate blocks (cheap by construction)
    rare_blk = blk.filter(F.col("term").isin(rare_terms))
    rare_decoded = rare_blk.mapInPandas(decode_blocks_fn, schema=DECODED_SCHEMA)
    rare_matched = rare_decoded.join(cand_meta, "term")
    # exact per-doc contribution of the rare token (full entry set present)
    rare_contrib = (
        engine.score_and_intersect(rare_matched, n_tokens=1)
        .withColumnRenamed("score", "rare_score")
        .withColumnRenamed("num_typos", "rare_typos")
    ).persist()

    if single_token:
        out = rare_contrib.select(
            "doc_id",
            F.col("rare_score").alias("score"),
            F.col("rare_typos").alias("num_typos"),
        )
        return _finish(engine, out, k)

    # ---- block-max upper bound of every other token. Blocks store
    # (max_tf, min_dl); BM25 is monotone (increasing in tf, decreasing in
    # dl) so idf * bm25_tf(max_tf, min_dl) bounds every entry's score.
    from ..config import BM25_B, BM25_K1

    avgdl = float(engine.stats["avgdl"])
    block_ub = (
        F.col("idf")
        * F.col("max_tf")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("max_tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("min_dl") / F.lit(avgdl))
        )
    )
    meta = blk.select("term", "max_tf", "min_dl")
    ub_rows = (
        meta.join(cand_meta.select("term", "token", "penalty", "idf"), "term")
        .filter(F.col("token") != rare)
        .groupBy("token")
        .agg(F.max(block_ub * F.col("penalty")).alias("ub"))
        .collect()
    )
    tok_ub = {r["token"]: float(r["ub"]) for r in ub_rows}
    if len(tok_ub) < len(tokens) - 1:
        rare_contrib.unpersist()
        return engine._empty_result()  # a non-rare token has no blocks
    others_ub = float(sum(tok_ub.values()))

    other_blk_all = blk.filter(~F.col("term").isin(rare_terms))
    other_alive = other_blk_all.withColumn(
        "chunk", F.explode(_span_chunks(F.col("first_doc"), F.col("last_doc")))
    )

    def exact_scores(rare_docs: DataFrame) -> DataFrame:
        """Full exact AND scores restricted to the given rare docs."""
        rare_docs = rare_docs.persist()
        doc_chunks = rare_docs.select(
            F.shiftright(F.col("doc_id"), CHUNK_SHIFT).alias("chunk")
        ).distinct()
        oblk = (
            other_alive.join(F.broadcast(doc_chunks), "chunk", "left_semi")
            .drop("chunk")
            .dropDuplicates(["term", "field", "salt", "block_id"])
        )
        other_decoded = oblk.mapInPandas(decode_blocks_fn, schema=DECODED_SCHEMA)
        other_matched = other_decoded.join(cand_meta, "term").join(
            F.broadcast(rare_docs.select("doc_id")), "doc_id", "left_semi"
        )
        other_scored = engine.score_and_intersect(
            other_matched, n_tokens=len(tokens) - 1
        ).withColumnRenamed("score", "other_score").withColumnRenamed(
            "num_typos", "other_typos"
        )
        return (
            rare_docs.join(other_scored, "doc_id")
            .select(
                "doc_id",
                (F.col("rare_score") + F.col("other_score")).alias("score"),
                (F.col("rare_typos") + F.col("other_typos"))
                .cast("int")
                .alias("num_typos"),
            )
        )

    # ---- phase 1: top-4k docs by rare contribution, scored exactly
    seed = rare_contrib.orderBy(
        F.desc("rare_score"), F.asc("doc_id")
    ).limit(4 * k)
    phase1 = exact_scores(seed).persist()
    top = phase1.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    theta = float(top[-1]["score"]) if len(top) >= k else None

    # ---- phase 2: threshold-prune the remaining rare docs
    rest = rare_contrib.join(seed.select("doc_id"), "doc_id", "left_anti")
    if theta is not None:
        rest = rest.filter(F.col("rare_score") + F.lit(others_ub) >= F.lit(theta))
    phase2 = exact_scores(rest)

    if report is not None:  # extra jobs only when stats were asked for
        report.update(
            {
                "rare_token": rare,
                "theta": theta,
                "others_ub": others_ub,
                "n_rare_docs": rare_contrib.count(),
                "n_phase2_docs": rest.count(),
                "n_other_blocks_total": other_blk_all.count(),
            }
        )

    union = phase1 if phase2 is None else phase1.unionByName(phase2)
    out = union.groupBy("doc_id").agg(
        F.max("score").alias("score"), F.max("num_typos").alias("num_typos")
    )
    res = _finish(engine, out, k)
    return res


def _finish(engine, scored: DataFrame, k: int) -> DataFrame:
    out = (
        scored.join(engine.docs.select("doc_id", "documentID"), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "documentID", "score", "num_typos"
    )
