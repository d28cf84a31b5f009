"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine against a literal query vector --
  the exactness baseline. JVM-side ``zip_with`` + ``aggregate`` (no Python
  in the hot path); one TakeOrdered(k), no shuffle beyond the scan.
- ``hyperplane_lsh_buckets`` / ``lsh_topk``: random-hyperplane (SRP) LSH:
  sign-bit sketch against ``n_planes`` deterministic hyperplanes =>
  bucket key. At scale the bucket key becomes the partition/bucket column
  so a query probes one bucket (plus optional multi-probe neighbours)
  instead of scanning 100 TB of vectors.
- ``embedding_cosine_pairs``: near-duplicate pairs via LSH-bucketed
  pairwise cosine (bucket equi-join, never a cross join).

Hyperplanes are generated from a seeded numpy Generator on the driver and
shipped as literals -- deterministic across runs and parallelism levels.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_cols(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine (score desc, id asc tiebreak)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_cols(F.col(vec_col), q).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _srp_bucket_col(planes: np.ndarray, vec_col: str):
    """SRP bucket as a Column expression over ``vec_col`` -- shared so
    callers can attach the bucket with withColumn instead of computing it
    on a projected frame and joining it back on id (which costs a full
    shuffle join of the vectors for nothing; same arithmetic, same
    values)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(v)) for v in p])
        bucket = bucket + F.when(
            _dot(F.col(vec_col), pl) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


def hyperplane_lsh_buckets(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket): sign-bit SRP sketch. bucket in [0, 2^n_planes)."""
    return df.select(
        F.col(id_col).alias("id"),
        _srp_bucket_col(planes, vec_col).alias("bucket"),
    )


def query_bucket(query_vec: list[float], planes: np.ndarray) -> int:
    """Driver-side SRP bucket of a query vector (sequential fold matches
    the executor-side ``_dot`` to float precision for the sign test)."""
    qb = 0
    for i, p in enumerate(planes):
        acc = 0.0
        for x, y in zip(query_vec, p):
            acc += float(x) * float(y)
        if acc > 0:
            qb |= 1 << i
    return qb


def probe_buckets(qb: int, n_planes: int, n_probe: int = 1) -> list[int]:
    """Multi-probe set: the query bucket plus (n_probe - 1) single-bit
    flips -- the standard recall knob for SRP-LSH."""
    out = [qb]
    for i in range(min(n_probe - 1, n_planes)):
        out.append(qb ^ (1 << i))
    return sorted(set(out))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over an UNINDEXED frame: computes every vector's bucket at
    query time (a full scan -- correct but not sublinear). For the scale
    path, materialize buckets once with ``build_lsh_index`` and probe with
    ``lsh_topk_indexed`` (partition pruning reads ~1/2^n_planes of input)."""
    qb = query_bucket(query_vec, planes)
    # the bucket side's id is aliased to a reserved name: a caller whose
    # id_col is itself named 'id' would otherwise make F.col("id")
    # ambiguous across the join (AMBIGUOUS_REFERENCE at plan time)
    buckets = hyperplane_lsh_buckets(
        df, planes, vec_col, id_col
    ).withColumnRenamed("id", "_lsh_id")
    cand = df.join(
        buckets.filter(F.col("bucket") == qb),
        df[id_col] == buckets["_lsh_id"],
    ).drop("_lsh_id", "bucket")
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def build_lsh_index(
    df: DataFrame,
    planes: np.ndarray,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the SRP bucket as a parquet PARTITION column. One pass
    over the vectors at build time; afterwards a query probes only its
    bucket directory -- at 100 TB this is the difference between scanning
    everything per query (lsh_topk) and reading ~1/2^n_planes of it."""
    bk = hyperplane_lsh_buckets(
        df, planes, vec_col, id_col
    ).withColumnRenamed("id", "_lsh_id")  # see lsh_topk: id_col == 'id'
    with_b = df.join(bk, df[id_col] == bk["_lsh_id"]).drop("_lsh_id")
    with_b.write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 1,
) -> DataFrame:
    """ANN top-k over a bucket-partitioned index built by
    ``build_lsh_index``: the bucket filter is a partition filter (zero
    rows outside the probed directories are read)."""
    probes = probe_buckets(query_bucket(query_vec, planes), len(planes), n_probe)
    df = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    return cosine_topk(df, query_vec, k, vec_col, id_col)


def ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    iters: int = 2,
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: centroids seeded from a
    hash-keyed sample (xxhash64(id) ordering -- partitioning-independent)
    then refined with ``iters`` Lloyd steps computed DISTRIBUTED (one
    groupBy(cell) mean per step; only k x dim floats ever reach the
    driver)."""
    k = n_cells
    seeds = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id") + F.lit(seed)), F.col("id"))
        .limit(k)
        .collect()
    )
    cents = np.array([list(r["v"]) for r in seeds], dtype=np.float64)
    for _ in range(iters):
        assigned = ivf_assign(df, cents, vec_col, id_col)
        assigned = assigned.withColumnRenamed("id", "_ivf_id")
        with_v = df.join(
            assigned, df[id_col] == assigned["_ivf_id"]
        ).drop("_ivf_id")
        means = (
            with_v.select("cell", F.posexplode(F.col(vec_col)))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("m"))
            .collect()  # k x dim rows -- the only driver traffic per step
        )
        new = cents.copy()
        for r in means:
            new[r["cell"], r["pos"]] = r["m"]
        cents = new
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell): nearest centroid by squared L2 (ties -> lowest cell id),
    centroids shipped as literals -- pure Column expressions."""
    v = F.col(vec_col)
    best_d, best_c = None, None
    for ci, c in enumerate(centroids):
        cl = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, cl, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if best_d is None:
            best_d, best_c = d, F.lit(ci)
        else:
            better = d < best_d
            best_c = F.when(better, F.lit(ci)).otherwise(best_c)
            best_d = F.when(better, d).otherwise(best_d)
    return df.select(
        F.col(id_col).alias("id"), best_c.cast("int").alias("cell")
    )


def build_ivf_index(
    df: DataFrame,
    centroids: np.ndarray,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF cell as a parquet PARTITION column (the
    inverted-file layout): queries probe n_probe cell directories via
    partition pruning instead of scanning every vector."""
    asg = ivf_assign(
        df, centroids, vec_col, id_col
    ).withColumnRenamed("id", "_ivf_id")  # see lsh_topk: id_col == 'id'
    with_c = df.join(asg, df[id_col] == asg["_ivf_id"]).drop("_ivf_id")
    with_c.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_query_cells(
    query_vec: list[float], centroids: np.ndarray, n_probe: int = 1
) -> list[int]:
    """The n_probe nearest cells to the query (squared L2, ties by id)."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(len(d)), d))
    return sorted(int(i) for i in order[:n_probe])


def ivf_topk(
    spark,
    path: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 1,
) -> DataFrame:
    """ANN top-k over a cell-partitioned IVF index built by
    ``build_ivf_index``: the cell filter is a partition filter (only the
    probed directories are read), exact cosine within."""
    cells = ivf_query_cells(query_vec, centroids, n_probe)
    df = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return cosine_topk(df, query_vec, k, vec_col, id_col)


def embedding_cosine_pairs(
    df: DataFrame,
    planes: np.ndarray,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket_size: int | None = 10_000,
    split_seed: int = 99,
    max_split_rounds: int = 8,
    report: dict | None = None,
) -> DataFrame:
    """(a, b, cos): near-duplicate embedding pairs inside shared LSH
    buckets (equi-join on bucket key, exact cosine verify).

    Within-bucket pairing is O(bucket^2), and with a FIXED plane count
    buckets grow linearly with the corpus -- the one quadratic risk of
    the design. ``max_bucket_size`` (ON by default) bounds it: buckets
    above the cap are recursively split with 2 extra deterministic
    hyperplanes per round; when a round makes no progress (a cluster of
    near-identical DIRECTIONS lies on the same side of every plane, so
    no hyperplane can separate it), the round hash-salts the stuck
    buckets instead -- pmod(xxhash64(id), ceil(pop/cap)) -- which
    always converges. Every round logs the bucket-size histogram and
    what it did; never a silent cap. Plane splits lose only
    across-boundary pairs (the standard LSH depth/recall knob); salt
    splits are recall-lossy within the stuck bucket, which is exactly
    the degenerate case whose full output would itself be quadratic.
    Pass ``None`` to disable on corpora known to be balanced. The
    default cap never triggers below ~10k same-bucket vectors, so
    small-scale results are bit-identical to the unguarded operator.
    """
    # bucket attached in place (withColumn) -- the old projected-frame +
    # join-back-on-id layout shuffled every vector through a join whose
    # only output was this column. String bucket keys: split refinements
    # append "/bits", which can never collide with an unsplit sibling
    # bucket's key
    with_b = df.withColumn(
        "bucket", _srp_bucket_col(planes, vec_col).cast("string")
    )
    if max_bucket_size is not None:
        import logging

        log = logging.getLogger(__name__)
        dim = planes.shape[1]
        prev_max: int | None = None
        prev_wb = None
        for rnd in range(max_split_rounds):
            counts = with_b.groupBy("bucket").count().persist()
            # ONE action per round: histogram + hot-bucket count together
            # (the common no-skew case pays exactly one aggregation job)
            hist = counts.agg(
                F.count("*").alias("n_buckets"),
                F.max("count").alias("max_pop"),
                F.avg("count").alias("avg_pop"),
                F.sum(
                    F.when(F.col("count") > max_bucket_size, 1).otherwise(0)
                ).alias("n_hot"),
            ).collect()[0]
            # an empty input yields NULL max/sum aggregates -- coalesce
            # to 0 so an empty corpus slice returns an empty pairs frame
            # instead of a TypeError
            n_hot = int(hist["n_hot"] or 0)
            hot = counts.filter(F.col("count") > max_bucket_size)
            if report is not None:
                report["rounds"] = rnd + 1
                report["final_max_pop"] = int(hist["max_pop"] or 0)
                report["final_n_buckets"] = int(hist["n_buckets"] or 0)
            if n_hot == 0:
                counts.unpersist()
                break
            # "stuck" = the previous plane split shrank the hottest bucket
            # by less than 25%: near-identical directions barely split on
            # hyperplanes, so marginal progress would burn every round
            # without ever reaching the cap
            stuck = (
                prev_max is not None
                and int(hist["max_pop"]) > 0.75 * prev_max
            )
            prev_max = int(hist["max_pop"])
            log.warning(
                "embedding_cosine_pairs: round %d bucket histogram "
                "n_buckets=%d max_pop=%d avg_pop=%.1f; %s %d bucket(s) "
                "above %d",
                rnd, hist["n_buckets"], hist["max_pop"],
                float(hist["avg_pop"]),
                "hash-salting (planes made no progress; recall-lossy "
                "within the stuck bucket)" if stuck
                else "splitting with 2 extra planes",
                n_hot, max_bucket_size,
            )
            is_hot = F.col("count").isNotNull()
            if stuck:
                # target 75% of the cap so hash variance across salt
                # groups doesn't leave a group marginally above it
                g = F.ceil(
                    F.col("count") / F.lit(0.75 * max_bucket_size)
                ).cast("int")
                refine = F.pmod(F.xxhash64(F.col(id_col)), g).cast("string")
                sep = "#"
            else:
                extra = hyperplanes(dim, 2, seed=split_seed + rnd)
                bits = F.lit(0)
                for i, p in enumerate(extra):
                    pl = F.array(*[F.lit(float(v)) for v in p])
                    bits = bits + F.when(
                        _dot(F.col(vec_col), pl) > 0, F.lit(1 << i)
                    ).otherwise(F.lit(0))
                refine = bits.cast("string")
                sep = "/"
            new_wb = (
                with_b.join(F.broadcast(hot), "bucket", "left")
                .withColumn(
                    "bucket",
                    F.when(
                        is_hot,
                        F.concat(F.col("bucket"), F.lit(sep), refine),
                    ).otherwise(F.col("bucket")),
                )
                .drop("count")
                .persist()
            )
            # materialize BEFORE releasing the caches this round's plan
            # reads: unpersisting counts first would re-derive every
            # prior round's counts on each later evaluation of with_b
            # (~2^rounds recomputations of the base bucket scan -- and
            # the final pair join evaluates with_b twice). One extra
            # count() per SPLIT round only; the no-skew path never
            # enters this branch.
            new_wb.count()
            counts.unpersist()
            if prev_wb is not None:
                prev_wb.unpersist()
            with_b, prev_wb = new_wb, new_wb
        if prev_wb is not None:
            # cut lineage executor-side so the returned plan neither
            # pins the cached frame for the session's lifetime nor
            # re-derives the split rounds (ContextCleaner reclaims the
            # checkpoint blocks when the frame is GC'd -- the WAND
            # finalizer's pattern)
            with_b = with_b.localCheckpoint(eager=True)
            prev_wb.unpersist()
    # per-VECTOR norm computed once before the pair join: cosine_cols
    # would re-evaluate both norms per PAIR (an O(dim) interpreted fold
    # each), tripling the per-pair work; same expression over the same
    # floats, so the quotient is bit-identical
    with_n = with_b.withColumn("_nrm", _norm(F.col(vec_col)))
    a = with_n.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
        F.col("_nrm").alias("_na"), "bucket",
    )
    b = with_n.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
        F.col("_nrm").alias("_nb"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cos",
            _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")),
        )
        .filter(F.col("cos") >= threshold)
        # no distinct: every vector carries exactly ONE bucket key, so a
        # pair can appear at most once -- the old distinct was a full
        # shuffle + aggregation of the result for nothing
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )
