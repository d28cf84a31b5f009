"""ANN indexed-bucket path: partition pruning is real (files read ~
1/2^n_planes of the index) and in-bucket results equal brute-force cosine
restricted to the probed bucket. Plus the default-on stop-shingle guard.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from go_search_engine_spark.pipeline.similarity import (
    build_lsh_index,
    cosine_topk,
    hyperplane_lsh_buckets,
    hyperplanes,
    lsh_topk_indexed,
    probe_buckets,
    query_bucket,
)


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_indexed_probe_matches_in_bucket_bruteforce(spark, emb):
    planes = hyperplanes(dim=16, n_planes=3, seed=42)
    path = os.path.join(tempfile.mkdtemp(prefix="gse_lsh_t_"), "idx")
    build_lsh_index(emb, planes, path)
    qv = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]

    got = lsh_topk_indexed(spark, path, qv, planes, k=10).collect()

    qb = query_bucket(qv, planes)
    in_bucket_ids = {
        r["id"]
        for r in hyperplane_lsh_buckets(emb, planes).filter(
            F.col("bucket") == qb
        ).collect()
    }
    want = cosine_topk(
        emb.filter(F.col("vec_id").isin(list(in_bucket_ids))), qv, k=10
    ).collect()
    assert [(r["vec_id"], round(r["cos"], 9)) for r in got] == [
        (r["vec_id"], round(r["cos"], 9)) for r in want
    ]
    # every returned id really is in the probed bucket
    assert all(r["vec_id"] in in_bucket_ids for r in got)


def test_indexed_probe_prunes_partitions(spark, emb):
    planes = hyperplanes(dim=16, n_planes=3, seed=42)
    path = os.path.join(tempfile.mkdtemp(prefix="gse_lsh_t_"), "idx")
    build_lsh_index(emb, planes, path)
    qv = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]
    qb = query_bucket(qv, planes)

    total_files = glob.glob(os.path.join(path, "bucket=*", "*.parquet"))
    bucket_files = glob.glob(os.path.join(path, f"bucket={qb}", "*.parquet"))
    assert len(bucket_files) < len(total_files)

    probed = spark.read.parquet(path).filter(F.col("bucket") == qb)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must be a PARTITION filter (directory pruning),
    # not a post-scan data filter
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1].split("]")[0]


def test_probe_buckets_multiprobe():
    assert probe_buckets(0b101, 3, 1) == [0b101]
    assert sorted(probe_buckets(0b101, 3, 3)) == sorted([0b101, 0b100, 0b111])


def test_ngram_guard_drops_stop_shingles(spark):
    from go_search_engine_spark.pipeline.dedup import ngram_jaccard_pairs

    # 30 docs all sharing one stop-shingle; two genuinely-near docs
    stop = [(i, f"alpha beta gamma unique{i} tail{i}") for i in range(30)]
    near = [
        (100, "red green blue cyan magenta yellow"),
        (101, "red green blue cyan magenta olive"),
    ]
    df = spark.createDataFrame(stop + near, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, threshold=0.2, max_shingle_df=10).collect()
    ids = {(r["a"], r["b"]) for r in pairs}
    # the stop-shingle 'alpha beta gamma' (df=30 > 10) is dropped, so no
    # pair among the 30 filler docs survives; the near pair does
    assert (100, 101) in ids
    assert all(a >= 100 for a, b in ids)


def test_ngram_guard_leaves_no_cached_frames(spark):
    """The guarded path must not pin the (larger-than-corpus) shingle
    stream in executor storage: a long-lived session calling the
    operator repeatedly would otherwise accumulate one cached copy per
    call with no safe unpersist point."""
    from go_search_engine_spark.pipeline.dedup import ngram_jaccard_pairs

    import gc
    import time

    def rdd_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    docs = [(i, f"red green blue token{i} extra words here") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    before = rdd_ids()
    out = ngram_jaccard_pairs(df, threshold=0.1, max_shingle_df=5)
    out.collect()
    # set-difference, not absolute counts: other modules' caches come
    # and go asynchronously mid-suite. The discriminating invariant is
    # that AT MOST ONE new persistent RDD exists after the call -- the
    # small eager-checkpoint result -- never a second one (the shingle
    # stream), which is exactly what a persist-without-unpersist
    # regression would show. The checkpoint itself is released by the
    # ContextCleaner once the caller drops the frame (same contract as
    # dedup_clusters); that release is JVM-GC-async, so it is polled
    # best-effort and the hard assertion is only "never grew".
    assert len(rdd_ids() - before) <= 1
    del out
    gc.collect()
    deadline = time.time() + 30
    while time.time() < deadline:
        if not (rdd_ids() - before):
            break
        spark._jvm.System.gc()
        time.sleep(0.5)
    assert len(rdd_ids() - before) <= 1


def test_ngram_shingle_stream_computed_once(spark):
    """The guarded path's three consumers (hot pre-pass, sizes,
    kept-groupBy) must read ONE cached shingle stream, not recompute
    tokenize/explode/distinct per consumer (round-4's +22% bench
    regression). An accumulator on the RDD source counts source scans:
    exactly n_rows iff the stream is computed once."""
    from go_search_engine_spark.pipeline.dedup import ngram_jaccard_pairs

    sc = spark.sparkContext
    acc = sc.accumulator(0)
    rows = [(i, f"red green blue token{i} extra words here") for i in range(8)]

    def tag(r):
        acc.add(1)
        return r

    rdd = sc.parallelize(rows, 2).map(tag)
    df = spark.createDataFrame(rdd, "doc_id long, text string")
    ngram_jaccard_pairs(df, threshold=0.1, max_shingle_df=5).collect()
    assert acc.value == len(rows)


def test_bpe_ish_and_rolling_hash_edges(spark):
    """Edge semantics of the two fingerprint/count ops: empty and
    punctuation-heavy strings, known hand-computed rolling hash."""
    from go_search_engine_spark.pipeline.textstats import (
        ROLLING_MOD,
        bpe_ish_token_count,
        rolling_hash,
    )

    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "ab"),
            (3, "hello world"),
            (4, "x=1+2;  // ok"),
        ],
        "doc_id long, text string",
    )
    bpe = {r["id"]: r["n_bpe"] for r in bpe_ish_token_count(df).collect()}
    # "" -> 0; "ab" -> 1; "hello world" -> 2 (word, space+word);
    # "x=1+2;  // ok" -> x | = | 1 | + | 2 | ;  hmm: 'x','=','1','+','2',
    # ';', ' /'+'/', ' ok' => punct runs split at digits/letters
    assert bpe[1] == 0 and bpe[2] == 1 and bpe[3] == 2
    assert bpe[4] == 8

    rh = {r["id"]: r["rh"] for r in rolling_hash(df).collect()}
    assert rh[1] == 0
    want = 0
    for ch in "ab":
        want = (want * 31 + ord(ch)) % ROLLING_MOD
    assert rh[2] == want
    want = 0
    for ch in "hello world":
        want = (want * 31 + ord(ch)) % ROLLING_MOD
    assert rh[3] == want


def test_ivf_index_prunes_and_full_probe_is_exact(spark, tmp_path):
    """IVF: (a) the distributed Lloyd-refined quantizer yields a valid
    partition layout, (b) an n_probe=1 query reads fewer files than the
    index holds (partition pruning is real), (c) probing EVERY cell
    equals brute-force cosine exactly."""
    import glob
    import os

    from pyspark.sql import functions as F

    from go_search_engine_spark.pipeline.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_centroids,
        ivf_query_cells,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids(emb, n_cells=4, seed=7, iters=2)
    assert cents.shape == (4, 64)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") != 0), cents, path)

    cells = ivf_query_cells(qv, cents, n_probe=1)
    probed = glob.glob(os.path.join(path, f"cell={cells[0]}", "*.parquet"))
    total = glob.glob(os.path.join(path, "cell=*", "*.parquet"))
    assert 0 < len(probed) < len(total)

    full = ivf_topk(spark, path, qv, cents, k=10, n_probe=4).collect()
    brute = cosine_topk(
        emb.filter(F.col("vec_id") != 0), qv, k=10
    ).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in brute]
    # n_probe=1 results come from the probed cell only, exactly scored
    part = ivf_topk(spark, path, qv, cents, k=5, n_probe=1).collect()
    in_cell = {
        r["vec_id"]
        for r in spark.read.parquet(path)
        .filter(F.col("cell").isin(cells))
        .collect()
    }
    assert all(r["vec_id"] in in_cell for r in part)


def test_near_dup_bucket_split_bounds_hot_buckets(spark):
    """Skewed embeddings (many vectors in one SRP bucket) must not produce
    an O(bucket^2) pair join: the default guard recursively splits hot
    buckets with extra planes until every bucket fits the cap, logging
    each round. Pairs that survive are still exact-cosine-verified."""
    import numpy as np

    from go_search_engine_spark.pipeline.similarity import (
        embedding_cosine_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    # 120 vectors clustered around one direction -> one hot SRP bucket
    rows = [
        (int(i), [float(x) for x in (base + 0.05 * rng.standard_normal(16))])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = hyperplanes(dim=16, n_planes=2, seed=42)

    report: dict = {}
    bounded = embedding_cosine_pairs(
        df, planes, threshold=0.99, max_bucket_size=30, report=report
    ).collect()
    assert report["rounds"] >= 2  # the split actually triggered
    assert report["final_max_pop"] <= 30  # every bucket bounded
    # survivors are a subset of the unguarded exact-within-bucket pairs,
    # and each is a true near-duplicate
    unguarded = {
        (r["a"], r["b"])
        for r in embedding_cosine_pairs(
            df, planes, threshold=0.99, max_bucket_size=None
        ).collect()
    }
    got = {(r["a"], r["b"]) for r in bounded}
    assert got and got <= unguarded


def test_near_dup_guard_is_identity_below_cap(spark, emb):
    """With no bucket above the cap the guarded operator returns exactly
    the unguarded result (the default never changes small-scale gates)."""
    from go_search_engine_spark.pipeline.similarity import (
        embedding_cosine_pairs,
    )

    planes = hyperplanes(dim=16, n_planes=3, seed=42)
    a = embedding_cosine_pairs(emb, planes, threshold=0.5).collect()
    b = embedding_cosine_pairs(
        emb, planes, threshold=0.5, max_bucket_size=None
    ).collect()
    key = lambda r: (r["a"], r["b"], r["cos"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_dedup_clusters_components(spark, caplog):
    """Min-label propagation finds exact connected components: two
    separate blobs, one long chain (diameter > 2 forces multiple
    rounds), singletons absent from pairs get no cluster row."""
    import logging

    from go_search_engine_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        # blob {1,2,3}, blob {10,11}, chain 20-21-22-23-24-25
        [(1, 2), (2, 3), (10, 11),
         (20, 21), (21, 22), (22, 23), (23, 24), (24, 25)],
        "a long, b long",
    )
    got = {
        r["id"]: r["cluster"] for r in dedup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20, 24: 20, 25: 20}
    # max_iter hit on a long chain logs loudly (never a silent cap)
    with caplog.at_level(logging.WARNING,
                         logger="go_search_engine_spark.pipeline.dedup"):
        part = dedup_clusters(pairs, max_iter=1).collect()
    assert any("max_iter" in r.message for r in caplog.records)
    assert {r["id"]: r["cluster"] for r in part} != got  # visibly over-split


def test_chunk_documents_windows(spark):
    """Window arithmetic: every token lands in >= 1 chunk, overlap =
    chunk - stride, the last chunk is the final stride boundary with
    unseen tokens (no fully-duplicate tail), short/empty docs behave."""
    from go_search_engine_spark.pipeline.textstats import chunk_documents

    def doc(i, n):
        return (i, " ".join(f"w{j}" for j in range(n)))

    df = spark.createDataFrame(
        [doc(1, 5), doc(2, 64), doc(3, 65), doc(4, 112), doc(5, 113),
         (6, ""), (7, "   ")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    assert {6, 7}.isdisjoint(by_doc)  # empty docs produce nothing
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 5
    assert len(by_doc[2]) == 1  # exactly one full window
    assert len(by_doc[3]) == 2  # one extra token -> one extra chunk
    assert [r["n_tokens"] for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])] == [64, 17]
    assert len(by_doc[4]) == 2 and len(by_doc[5]) == 3
    # coverage: union of chunk tokens == all tokens (doc 5)
    seen = set()
    for r in by_doc[5]:
        seen.update(r["chunk"].split(" "))
    assert seen == {f"w{j}" for j in range(113)}
    # overlap: consecutive chunks share chunk-stride tokens
    c0, c1 = sorted(by_doc[4], key=lambda r: r["chunk_id"])[:2]
    assert set(c0["chunk"].split()) & set(c1["chunk"].split())


def test_redact_pii_behavior(spark):
    from go_search_engine_spark.pipeline.textstats import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org or ping 10.0.0.1"),
            (2, "call +1 555 0100 199 twice: +44 020 7946 0958"),
            (3, "clean text without identifiers"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in redact_pii(df).collect()}
    assert got[1]["redacted"] == "mail me at <EMAIL> or ping <IP>"
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) == (1, 1, 0)
    assert got[2]["n_phones"] == 2 and "<PHONE>" in got[2]["redacted"]
    assert "+44" not in got[2]["redacted"]
    assert got[3]["redacted"] == "clean text without identifiers"
    assert (got[3]["n_emails"], got[3]["n_ipv4"], got[3]["n_phones"]) == (0, 0, 0)


def test_embedding_pairs_empty_input(spark):
    """An empty corpus slice returns an empty pairs frame (NULL
    aggregates in the bucket histogram coalesce to 0), not a
    TypeError."""
    from go_search_engine_spark.pipeline.similarity import (
        embedding_cosine_pairs,
    )

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    planes = hyperplanes(dim=8, n_planes=4, seed=7)
    assert embedding_cosine_pairs(df, planes).count() == 0


def test_parameter_validation_raises(spark):
    """Round-4 review: degenerate parameters fail loud at the boundary
    instead of silently cross-joining (bands > num_hashes), dropping
    long docs (stride=0), or skipping tokens (stride > chunk)."""
    import pytest

    from go_search_engine_spark.pipeline.dedup import minhash_lsh_pairs
    from go_search_engine_spark.pipeline.textstats import chunk_documents

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="multiple of"):
        minhash_lsh_pairs(df, num_hashes=4, bands=8)
    with pytest.raises(ValueError, match="multiple of"):
        minhash_lsh_pairs(df, num_hashes=5, bands=2)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=64, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=64, stride=100)
