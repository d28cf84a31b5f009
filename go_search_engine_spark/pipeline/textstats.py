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


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk): fixed-token-window document
    chunking with overlap -- the standard pretraining-data shaping step
    (context-window-sized samples; stride < chunk_tokens overlaps
    consecutive chunks so no boundary context is lost).

    Whitespace-token windows, pure Column expressions: chunk i covers
    tokens [i*stride, i*stride + chunk_tokens); the last window starts at
    the final stride boundary that still contains unseen tokens, so every
    token lands in >= 1 chunk and no fully-duplicate tail chunk is
    emitted. Short docs (< min_tokens) produce nothing.
    """
    if stride < 1 or stride > chunk_tokens:
        # stride=0 divides by zero (NULL n_chunks -> long docs silently
        # VANISH); stride > chunk_tokens skips tokens between windows --
        # both violate the every-token-covered guarantee above
        raise ValueError(
            f"stride must be in [1, chunk_tokens={chunk_tokens}], "
            f"got {stride}"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "", F.array()).otherwise(toks)
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("_toks"),
        F.size(toks).alias("_n"),
    ).filter(F.col("_n") >= min_tokens)
    n = F.col("_n")
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1
    )
    chunks = base.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("long").alias("chunk_id"),
                    F.slice(
                        F.col("_toks"), i * stride + 1, chunk_tokens
                    ).alias("_ctoks"),
                ),
            )
        ).alias("c"),
    )
    return chunks.select(
        "id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c._ctoks").cast("long").alias("n_tokens"),
        F.array_join("c._ctoks", " ").alias("chunk"),
    )


# RE2-safe patterns (no backrefs/lookaround) so the Spark (Java regex)
# and DuckDB (RE2) sides agree character-for-character
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted, n_emails, n_ipv4, n_phones): PII scrubbing for
    training corpora -- emails, IPv4 literals, and international-format
    phone numbers replaced by typed placeholder tags, with per-doc match
    counts (the audit trail a curation pipeline logs). Order matters:
    emails first (an email can contain digit runs), then phones, then
    IPv4. Pure regexp Column expressions; patterns are RE2-compatible so
    independent engines reproduce the exact output."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL))
    step1 = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    n_phones = F.regexp_count(step1, F.lit(PII_PHONE))
    step2 = F.regexp_replace(step1, PII_PHONE, "<PHONE>")
    n_ipv4 = F.regexp_count(step2, F.lit(PII_IPV4))
    step3 = F.regexp_replace(step2, PII_IPV4, "<IP>")
    return df.select(
        F.col(id_col).alias("id"),
        step3.alias("redacted"),
        n_emails.cast("long").alias("n_emails"),
        n_ipv4.cast("long").alias("n_ipv4"),
        n_phones.cast("long").alias("n_phones"),
    )
