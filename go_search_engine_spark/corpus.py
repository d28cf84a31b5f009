"""Deterministic synthetic source-code corpus (FIXTURES.md section 1).

Schema fixed by BASELINE.json's input_hint:
(repo:string, path:string, commit:string, lang:string, content:string).

Content is a pure function of the row index (hash mixing, no RNG state),
so the corpus is identical for any partitioning / parallelism -- required
for resume tests and two-parallelism scaling runs. It exercises every
tokenizer rule (camelCase, PascalCase, acronym runs, underscores, digits,
punctuation), plants Damerau-Levenshtein distance-1/2 neighbours
(incl. transpositions) and gives head terms a Zipf-like frequency skew so
salting has something to chew on.

Generated distributively via spark.range(n).mapInPandas -- numpy-vectorized
per batch; never collected to the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["go", "py", "java", "ts", "rs", "c", "md"]

# vocabulary: identifiers chosen to hit every tokenizer rule + typo pairs
IDENTIFIERS = [
    "HTTPRequestManager", "parseJSONResponse", "myAPI1Test", "tokenizer",
    "tokenzier",  # distance-1 transposition of tokenizer
    "tokenizr",   # distance-1 deletion
    "toknizer",   # distance-1 deletion
    "indexBuilder", "index_builder", "BM25Scorer", "scoreDocument",
    "postingList", "posting_list", "invertedIndex", "searchEngine",
    "serachEngine",  # transposition of search
    "levenshtein", "levenshtien",  # transposition
    "performHTTPRequest", "state-of-the-art", "API_v1.0-beta",
    "1Password", "BIGAcronymThenCamel", "anotherCase", "word1!@#word2",
    "computeTermFrequency", "mergeSegments", "flushBuffer", "deltaEncode",
    "varintDecode", "blockMaxWand", "shardRouter", "checkpointWriter",
]
# Zipf head terms (the skew head for salting tests)
HEAD_TERMS = ["func", "the", "return", "if", "err", "var"]
TAIL_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "kappa",
    "lambda", "sigma", "omega", "buffer", "stream", "socket", "mutex",
    "channel", "context", "handler", "router", "parser", "lexer", "codec",
    "cursor", "offset", "payload", "schema", "column", "vector", "matrix",
    "tensor", "graph", "node", "edge", "queue", "stack", "heap", "trie",
]

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style deterministic hash of uint64 index."""
    salted = np.uint64((salt * int(_MIX1)) % (1 << 64))
    z = (x + salted).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _MIX2
    z = (z ^ (z >> np.uint64(27))) * _MIX3
    return z ^ (z >> np.uint64(31))


def _batch(
    idx: np.ndarray, seed: int, words_per_doc: int, vocab_size: int
) -> pd.DataFrame:
    n = len(idx)
    x = idx.astype(np.uint64) + np.uint64(seed) * np.uint64(1_000_003)
    repo_i = (_mix(x, 1) % np.uint64(7)).astype(np.int64)
    repo_j = (_mix(x, 2) % np.uint64(97)).astype(np.int64)
    lang_i = (_mix(x, 3) % np.uint64(len(LANGS))).astype(np.int64)
    pkg = (_mix(x, 4) % np.uint64(23)).astype(np.int64)
    fno = (_mix(x, 5) % np.uint64(311)).astype(np.int64)

    repos = [f"org{a}/repo{b}" for a, b in zip(repo_i, repo_j)]
    langs = [LANGS[i] for i in lang_i]
    paths = [
        f"src/pkg{p}/File{f}.{lg}" for p, f, lg in zip(pkg, fno, langs)
    ]
    commits = [
        hashlib.sha1(f"{r}/{p}".encode()).hexdigest() for r, p in zip(repos, paths)
    ]

    # content: words_per_doc words drawn deterministically. Mix shaped like
    # real source code: a Zipf head (keywords), shared camelCase
    # identifiers (incl. planted typo pairs), common library words, and a
    # long tail of corpus-unique identifiers (vocab grows with corpus size
    # like real identifiers do -- vital so term-keyed shuffles see a
    # realistic key space, not 80 terms).
    #
    # Fully vectorized over the (n, words_per_doc) matrix; only the final
    # per-row " ".join stays in Python. All modulos are ARRAY ops on
    # purpose: a numpy-1.x SCALAR uint64 % python-int silently promotes
    # to float64 and rounds away the low bits (an earlier per-row loop
    # did exactly that), whereas array uint64 % uint64 is exact.
    n_head, n_id, n_tail = len(HEAD_TERMS), len(IDENTIFIERS), len(TAIL_WORDS)
    hs = _mix(
        np.arange(words_per_doc, dtype=np.uint64)[None, :]
        + (x * np.uint64(7919))[:, None],
        9,
    )
    sel = hs % np.uint64(100)
    widx = _mix(hs, 11)
    head_arr = np.array(HEAD_TERMS)
    id_arr = np.array(IDENTIFIERS)
    tail_arr = np.array(TAIL_WORDS)
    cap_arr = np.array([w.capitalize() for w in TAIL_WORDS])
    u = (widx % np.uint64(max(vocab_size, 1))).astype(np.int64)
    sym = np.char.add(  # 25% unique-ish identifiers (long tail)
        np.char.add("sym", u.astype("U20")), cap_arr[u % n_tail]
    )
    words = np.select(
        [sel < 40, sel < 60, sel < 75],
        [
            # 40% head terms -> Zipf skew
            head_arr[(widx % np.uint64(n_head)).astype(np.int64)],
            # 20% camelCase identifiers
            id_arr[(widx % np.uint64(n_id)).astype(np.int64)],
            # 15% common library words
            tail_arr[(widx % np.uint64(n_tail)).astype(np.int64)],
        ],
        default=sym,
    )
    docs = [" ".join(row) for row in words]

    return pd.DataFrame(
        {
            "id": idx.astype(np.int64),
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": docs,
        }
    )


def generate_corpus(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    words_per_doc: int = 40,
    num_partitions: int | None = None,
    vocab_size: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus of ``n_rows`` files. The unique-
    identifier vocabulary defaults to n_rows/10 (grows with the corpus,
    like real code)."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    vocab = vocab_size if vocab_size is not None else max(n_rows // 10, 16)

    def gen(batches):
        for pdf in batches:
            yield _batch(pdf["id"].to_numpy(), seed, words_per_doc, vocab)

    from pyspark.sql import functions as F

    return (
        spark.range(0, n_rows, 1, parts)
        .mapInPandas(
            gen,
            schema="id long, repo string, path string, commit string, "
            "lang string, content string",
        )
        # reference requires a unique non-empty string documentID
        # (model/document.go:10-19); (repo,path) can repeat across rows, so
        # the stable row id disambiguates.
        .withColumn(
            "documentID",
            F.format_string(
                "%s/%s@%s#%d",
                F.col("repo"),
                F.col("path"),
                F.substring("commit", 1, 8),
                F.col("id"),
            ),
        )
        .drop("id")
    )
