"""Text analysis operators for training-data curation: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All pure Column expressions (JVM-side / codegen); no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokenize_col, whitespace_word_count_col

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_ws, n_tok): whitespace words vs tokenizer tokens."""
    return df.select(
        F.col(id_col).alias("id"),
        whitespace_word_count_col(F.col(text_col)).cast("long").alias("n_ws"),
        F.size(tokenize_col(F.col(text_col))).cast("long").alias("n_tok"),
    )


def stopword_ratio(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   stopwords: list[str] | None = None) -> DataFrame:
    """(id, ratio): fraction of tokens that are stopwords -- the core of
    an n-gram language-ID heuristic."""
    sw = stopwords or EN_STOPWORDS
    toks = tokenize_col(F.col(text_col))
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return df.select(
        F.col(id_col).alias("id"),
        F.round(
            F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0)), 6
        ).alias("ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, q): deterministic quality heuristic combining length saturation,
    lexical diversity, and alphanumeric density. All integer/ratio
    arithmetic -> reproducible across engines."""
    toks = tokenize_col(F.col(text_col))
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    alnum = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9]", ""))
    total = F.length(F.col(text_col))
    q = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok.cast("double") / F.lit(50.0))
        + F.lit(0.3)
        * F.when(n_tok > 0, n_distinct.cast("double") / n_tok).otherwise(F.lit(0.0))
        + F.lit(0.3)
        * F.when(total > 0, alnum.cast("double") / total).otherwise(F.lit(0.0))
    )
    return df.select(F.col(id_col).alias("id"), F.round(q, 6).alias("q"))


# GPT-2-shaped pretokenizer classes (public pattern shape): word runs
# with an optional leading space, digit runs, punctuation runs. Pure
# alternation of character classes so Java regex (Spark) and RE2 (DuckDB
# oracle) agree; whitespace itself is not a token.
BPE_ISH_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_ish_token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bpe): BPE-ish pretoken count -- the cheap LLM-token-budget
    estimator a curation pipeline sorts/filters by (a real BPE merges
    within these pretokens, so this upper-bounds word-level token counts
    while tracking punctuation/digit splits)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
        .cast("long")
        .alias("n_bpe"),
    )


ROLLING_MOD = 1 << 31  # keeps acc*31 + cp < 2^36: exact in 64-bit everywhere


def rolling_hash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, rh): polynomial rolling hash over the document's characters
    (h = (h*31 + codepoint) mod 2^31) -- the classic Rabin-Karp-style
    content fingerprint, as a pure JVM Column fold (no Python)."""
    text = F.col(text_col)
    h = F.aggregate(
        F.sequence(F.lit(1), F.length(text)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * F.lit(31) + F.ascii(text.substr(i, F.lit(1))))
        % F.lit(ROLLING_MOD),
    )
    # sequence(1, 0) DESCENDS in Spark -- empty/null text hashes to 0
    h = F.when(F.coalesce(F.length(text), F.lit(0)) > 0, h).otherwise(
        F.lit(0).cast("long")
    )
    return df.select(F.col(id_col).alias("id"), h.alias("rh"))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 3) -> DataFrame:
    """(id, fp): winnowing-style fingerprint = min md5 over k-token word
    shingles (docs shorter than k tokens fingerprint the whole text)."""
    toks = tokenize_col(F.col(text_col))
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - F.lit(k - 1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("fp"),
    )
