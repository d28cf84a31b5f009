"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (its only dedup is the DistinctField result
dedup, R2); these are the corpus-level dedup families a 100 TB pipeline
needs. All are pure DataFrame compositions (JVM-side, shuffle-aware):

- exact:        sha256 hash-groupBy -- one shuffle on the 64-hex digest.
- n-gram Jaccard: word-shingle inverted join; candidate pairs are only
  docs sharing a shingle (never a cross join), then exact Jaccard.
- MinHash+LSH:  per-doc signatures = min over shingles of seeded md5;
  banding turns near-dup search into an equi-join on band keys.
- SimHash:      16-bit hex-char-parity simhash (deterministic, integer
  arithmetic, reproducible across engines).
- embedding cosine near-dup: see similarity.py (shared kernel).

Scale notes: every operator keys its shuffle on a high-cardinality value
(digest, shingle, band key), so skew comes only from degenerate data
(identical docs / stop-shingles). ``min_shingle_df``/``max_shingle_df``
let callers drop stop-shingles before the pair join -- the classic guard
against quadratic blowup on "the the the".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokenize_col


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(text_sha, n, ids): groups of byte-identical docs (n >= 2)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("text_sha"), F.col(id_col))
        .groupBy("text_sha")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n") >= 2)
    )


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs of k-token word shingles. Docs with
    fewer than k tokens produce none (guards Spark's descending
    ``sequence`` when size-k+1 < 1)."""
    with_toks = df.select(
        F.col(id_col).alias("id"), tokenize_col(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= k)
    sh = F.transform(
        F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
        lambda i: F.array_join(F.slice("toks", i, k), " "),
    )
    # per-doc array_distinct == global distinct over (id, shingle) -- a
    # doc's repeats collapse inside its own row, so the dedup is a
    # narrow map, not a full shuffle of the exploded stream (which at
    # 100 TB is the largest frame in the whole operator)
    return with_toks.select(
        "id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """(a, b, jaccard): pairs of docs with k-shingle Jaccard >= threshold.

    Candidate generation is the shingle inverted join (docs sharing >= 1
    shingle), NOT a cross join. ``max_shingle_df`` drops stop-shingles
    before pairing and is ON BY DEFAULT (1000): a single stop-shingle
    ("the quick brown") otherwise yields df^2 candidate pairs -- the
    classic silent scale-killer. Dropped shingles are logged (never a
    silent cap); pass ``max_shingle_df=None`` for exact inverted-join
    semantics on corpora known to be stop-shingle-free.
    """
    sh = word_shingles(df, text_col, id_col, k)
    if max_shingle_df is not None:
        # Two-phase guard (round-4 ADVICE fix): a df-only pre-pass
        # (map-side-combined count, cheap) finds the hot shingles, and
        # they are anti-joined out BEFORE the collect_list aggregation --
        # so no aggregation buffer ever materializes a stop-shingle's
        # full id array (the r3 one-pass layout built the list first and
        # filtered after: unbounded per-row memory in exactly the
        # degenerate-skew case the guard exists for). The shingle stream
        # IS persisted -- its three consumers (hot pre-pass, per-doc
        # sizes, kept-groupBy) would otherwise each re-run the
        # tokenize/explode/distinct (a 3x recompute, round-4's one bench
        # regression). The long-lived-driver leak this used to risk is
        # closed the same way dedup_clusters closes it: the result is
        # localCheckpoint(eager=True)-materialized BEFORE the cache is
        # released, so the returned plan no longer references sh and the
        # unpersist below is safe; checkpoint blocks are GC'd with the
        # RDD once the caller drops the result. The surviving id lists
        # are bounded by max_shingle_df; pair generation is a JVM-side
        # slice/transform (emits only a < b), never a self-join. No
        # broadcast hint on the anti-join: the hot set is usually tiny
        # but CAN be huge on a degenerate corpus -- AQE picks broadcast
        # when it fits.
        sh = sh.persist()
        try:
            hot = (
                sh.groupBy("shingle")
                .agg(F.count("*").alias("df"))
                .filter(F.col("df") > max_shingle_df)
            )
            n_hot = hot.count()
            if n_hot:
                import logging

                logging.getLogger(__name__).warning(
                    "ngram_jaccard_pairs: dropping %d stop-shingles with "
                    "df > %d (skew guard)", n_hot, max_shingle_df
                )
                sh_kept = sh.join(
                    hot.select("shingle"), "shingle", "left_anti"
                )
            else:
                sh_kept = sh
            # per-doc sizes from the flat kept stream (word_shingles is
            # distinct per (id, shingle), so this equals exploding the kept
            # id lists) -- avoids a second consumer of the grouped frame
            sizes = sh_kept.groupBy("id").agg(F.count("*").alias("sz"))
            kept = sh_kept.groupBy("shingle").agg(
                F.sort_array(F.collect_list("id")).alias("ids"),
            )
            # explicit repartition before the pair EXPLOSION: the grouped
            # frame is small in bytes (one row per shingle), so AQE's
            # size-based coalescing collapses its exchange to ~1 task --
            # but the stage's real cost is the O(df^2) pair fan-out,
            # which map-output statistics cannot see. Pin the partition
            # count to the session's intended reduce parallelism
            # (measured at sf0.1: pair stage 2.5s -> 1.4s on local[32])
            kept = kept.repartition(
                int(sh.sparkSession.conf.get("spark.sql.shuffle.partitions"))
            )
            pair_col = F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ids"), i + F.lit(2), F.size(F.col("ids"))
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
            inter = (
                kept.select(F.explode(pair_col).alias("p"))
                .select("p.a", "p.b")
                .groupBy("a", "b")
                .agg(F.count("*").alias("inter"))
            )
            out = _jaccard_filter(inter, sizes, threshold)
            # eager checkpoint materializes the (threshold-bounded) pair
            # set executor-side and cuts lineage off the cached shingle
            # stream, so the persist can be released NOW instead of
            # leaking one pinned copy per call in a long-lived session
            out = out.localCheckpoint(eager=True)
        finally:
            # in a finally so a throw anywhere above (hot count, the
            # aggregations, the checkpoint) can never leave the shingle
            # stream pinned in a long-lived session; non-blocking -- on
            # the success path the checkpoint already cut the lineage, so
            # nothing re-reads the cache while it drains
            sh.unpersist(blocking=False)
        return out
    else:
        # exact inverted-join semantics (caller asserts no stop-shingles):
        # no per-shingle id list is materialized, so a degenerate shingle
        # can't blow a single row's memory -- only the join fan-out
        sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
        a = sh.select(F.col("id").alias("a"), "shingle")
        b = sh.select(F.col("id").alias("b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    return _jaccard_filter(inter, sizes, threshold)


def _jaccard_filter(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """(a, b, jaccard) from pair intersection counts + per-doc sizes."""
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    k: int = 3,
) -> DataFrame:
    """(id, h0..h{n-1}): MinHash signature per doc.

    Hash family: h_i(doc) = min over shingles of md5("{i}:{shingle}") --
    deterministic and engine-portable (md5 exists everywhere), unlike
    engine-specific hash() builtins.
    """
    sh = word_shingles(df, text_col, id_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    bands: int = 2,
    k: int = 3,
) -> DataFrame:
    """(a, b): candidate near-dup pairs agreeing on at least one LSH band
    (signature split into ``bands`` bands of num_hashes/bands rows)."""
    if bands < 1 or num_hashes % bands != 0:
        # bands > num_hashes would give 0-row bands whose key is the
        # same constant for EVERY doc -- the O(n^2) cross join this
        # module exists to avoid; a non-divisible split would silently
        # ignore the trailing hashes
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("key"))
        )
    exploded = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = exploded.select(F.col("id").alias("a"), "band", "key")
    b = exploded.select(F.col("id").alias("b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster): connected components of the near-duplicate pair
    graph; ``cluster`` = min id in the component (the canonical document
    a training-data pipeline keeps -- everything else in the cluster is
    dropped as a duplicate).

    Distributed min-label propagation: each round every node takes the
    minimum label among itself and its neighbors (one join + one
    groupBy per round); converges in O(component diameter) rounds, which
    for near-dup clusters (dense blobs around a canonical doc) is small.
    The driver loop stops when a round changes nothing (one scalar count
    per round) and LOGS a warning if ``max_iter`` is hit with changes
    still flowing -- never a silent cap. Labels are persisted per round
    and the previous round unpersisted, so lineage stays O(1) deep
    instead of growing with iterations (the classic iterative-algorithm
    trap on Spark).
    """
    e = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    edges = e.unionByName(
        e.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).distinct().persist()
    labels = (
        edges.select("x").distinct().withColumn("lbl", F.col("x")).persist()
    )
    labels.count()
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("x").alias("y"), F.col("lbl").alias("nl")
                ),
                "y",
            )
            .groupBy("x")
            .agg(F.min("nl").alias("cand"))
        )
        new_labels = (
            labels.join(nbr, "x", "left")
            .select(
                "x",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("cand"), F.col("lbl"))
                ).alias("lbl"),
            )
            .persist()
        )
        changed = (
            new_labels.join(
                labels.select("x", F.col("lbl").alias("old")), "x"
            )
            .filter(F.col("lbl") < F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        import logging

        logging.getLogger(__name__).warning(
            "dedup_clusters: labels still changing after %d rounds "
            "(component diameter exceeds max_iter); clusters may be "
            "over-split -- raise max_iter", max_iter,
        )
    edges.unpersist()
    out = labels.select(F.col("x").alias("id"), F.col("lbl").alias("cluster"))
    # eager localCheckpoint: materializes the labels executor-side and
    # cuts lineage, so the round's persist can be released NOW -- without
    # this, every dedup_clusters call in a long-lived session leaks one
    # pinned labels cache (checkpoint blocks are GC'd with the RDD by the
    # ContextCleaner once the caller drops the result; a CacheManager
    # persist is never GC'd). Same pattern as query/wand.py finalize.
    out = out.localCheckpoint(eager=True)
    labels.unpersist()
    return out


_HI_HEX = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash): 16-bit SimHash over T1 tokens weighted by tf.

    Bit j is the sign of sum(tf * (+1 if the j-th hex char of md5(term)
    has its high bit set else -1)). Integer arithmetic end-to-end, so the
    value is exactly reproducible in any engine with md5 + substr.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokenize_col(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.md5(F.col("term")))
    )
    bit_aggs = []
    for j in range(16):
        sign = F.when(
            F.substring("h", j + 1, 1).isin(_HI_HEX), F.lit(1)
        ).otherwise(F.lit(-1))
        bit = F.when(F.sum(F.col("tf") * sign) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bit_aggs.append(bit.alias(f"b{j}"))
    agged = toks.groupBy("id").agg(*bit_aggs)
    total = F.col("b0")
    for j in range(1, 16):
        total = total + F.col(f"b{j}")
    return agged.select("id", total.cast("long").alias("simhash"))
