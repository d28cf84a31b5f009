"""BM25 top-k query engine over the built index.

One declarative DataFrame DAG per query, mirroring the reference's search
pipeline (/root/reference/internal/search/service.go:76-674, mapped in
SURVEY.md section 3.1):

  query --tokenize(driver)--> candidate terms (exact + typo scan over the
  vocab, deterministic cap) --> block scan (term-bucket partition pruning +
  term pushdown) --> Arrow-batched block decode --> exact-skip /
  best-distance-wins (window) --> per-token max penalized BM25 -->
  AND intersection (groupBy doc having token-count == n; rows are
  per-(token, doc) so a plain count is the distinct count) -->
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
from ..functions.codec import varint_decode
from ..functions.edit_distance import damerau_levenshtein_batch
from ..functions.tokenizer import tokenize

DECODED_SCHEMA = (
    "term string, field string, doc_id long, tf double, dl long, fw boolean"
)


def decode_blocks_arrow(
    batches: Iterator["pa.RecordBatch"],
) -> Iterator["pa.RecordBatch"]:
    """mapInArrow: block rows -> flat (term, field, doc_id, tf, dl, fw).

    Mirror of the build-side whole-batch Arrow encoder
    (build/blocks.py:_encode_batch). Each binary cell is a
    self-terminating varint stream, so a column's concatenated Arrow
    data buffer decodes in ONE vectorized varint_decode call per batch;
    per-block segmentation falls out of the ``n`` column with numpy
    boundary arithmetic, and the term/field strings are replicated with
    Arrow ``take`` (no Python string objects). Replaces the round-4
    itertuples loop (per-block-row bytes() copies + pandas concat) that
    dominated cold query latency.
    """
    import pyarrow as pa

    from ..build.blocks import _binary_parts

    for batch in batches:
        nb = batch.num_rows
        if nb == 0:
            continue
        col = lambda name: batch.column(batch.schema.get_field_index(name))
        counts = col("n").to_numpy(zero_copy_only=False).astype(np.int64)
        # the current encoder never writes n == 0 rows, but a future
        # writer doing so would make vstart index one past the decoded
        # delta array (cs[vstart] IndexError) -- fail loud instead
        assert (counts > 0).all(), "block row with n <= 0"
        total = int(counts.sum())
        vstart = np.zeros(nb, dtype=np.int64)
        np.cumsum(counts[:-1], out=vstart[1:])
        row_in_block = (
            np.arange(total, dtype=np.int64) - np.repeat(vstart, counts)
        )

        def stream(name: str) -> np.ndarray:
            offs, data = _binary_parts(col(name))
            return varint_decode(data[offs[0]:offs[-1]])

        deltas = stream("doc_ids")
        # segmented cumsum: each block's delta chain restarts at vstart.
        # Stays uint64 throughout -- the global cumsum may wrap, but the
        # (cs - base) difference is exact under mod-2^64 arithmetic.
        cs = np.cumsum(deltas, dtype=np.uint64)
        base = np.repeat(cs[vstart] - deltas[vstart], counts)
        doc_ids = (cs - base).astype(np.int64)
        tfs = stream("tfs").astype(np.float64)
        dls = stream("dls").astype(np.int64)
        fw_offs, fw_data = _binary_parts(col("fws"))
        bits = np.unpackbits(fw_data[fw_offs[0]:fw_offs[-1]])
        fw_idx = (
            np.repeat((fw_offs[:-1] - fw_offs[0]) * 8, counts) + row_in_block
        )
        fws = bits[fw_idx].astype(bool)
        rep = pa.array(np.repeat(np.arange(nb, dtype=np.int64), counts))
        yield pa.RecordBatch.from_arrays(
            [
                col("term").take(rep),
                col("field").take(rep),
                pa.array(doc_ids, type=pa.int64()),
                pa.array(tfs, type=pa.float64()),
                pa.array(dls, type=pa.int64()),
                pa.array(fws, type=pa.bool_()),
            ],
            names=["term", "field", "doc_id", "tf", "dl", "fw"],
        )


def decode_blocks(blk: DataFrame) -> DataFrame:
    """Block rows -> flat decoded postings via the module-level Arrow
    decoder (module attribute lookup at call time keeps the decode UDF
    monkeypatchable for the decode-count tests)."""
    import go_search_engine_spark.query.engine as _self

    return blk.select(
        "term", "field", "n", "doc_ids", "tfs", "dls", "fws"
    ).mapInArrow(_self.decode_blocks_arrow, schema=DECODED_SCHEMA)


def _esc(s: str) -> str:
    """Escape a term for embedding in a SQL string literal. Terms are
    tokenizer output ([a-z0-9]+ and prefixes), so this is belt and
    braces."""
    return str(s).replace("\\", "\\\\").replace("'", "\\'")


def _cand_entries(cand: pd.DataFrame) -> str:
    """The candidate table as one SQL array-of-named_struct literal --
    shared by the warm Column path (scan_candidates) and the warm SQL
    template (_warm_sql_topk). repr(float) round-trips exactly."""
    return ",".join(
        "named_struct('token','%s','cterm','%s','distance',%d,"
        "'penalty',CAST(%r AS DOUBLE),'idf',CAST(%r AS DOUBLE))"
        % (_esc(t), _esc(m), int(d), float(p), float(i))
        for t, m, d, p, i in zip(
            cand["token"], cand["term"], cand["distance"],
            cand["penalty"], cand["idf"],
        )
    )




class SearchEngine:
    """``vocab_cache_max``: when the index's vocabulary is at most this
    many terms, (term, df, idf, term_len) is pulled to the driver ONCE and
    typo scans + candidate stats run driver-side in numpy with ZERO Spark
    jobs per query -- the Spark analogue of the reference's in-memory
    vocabulary (typo_finder.go:10-76). Above the cap (billion-term
    corpora) the distributed scan path is used; both paths produce
    byte-identical candidate tables (tests/test_rank_identity.py)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        name: str,
        vocab_cache_max: int = 1_000_000,
    ):
        self.spark = spark
        self.base = os.path.join(warehouse, name)
        self._vocab_cache_max = vocab_cache_max
        self._open_frames()

    def _open_frames(self) -> None:
        """(Re)load settings, stats, and the table handles; clears the
        driver vocab cache. Called at open and on generation change."""
        # freshness signature captured BEFORE the loads: a commit landing
        # mid-reload then leaves sig older than the file, so the next
        # _ensure_fresh reloads again (one harmless extra reload) -- the
        # after-the-loads order would record the NEW file's sig against
        # the OLD loaded snapshot and never notice the commit
        st = os.stat(os.path.join(self.base, "stats.json"))
        self._stats_sig = (st.st_mtime_ns, st.st_size)
        self.settings = load_settings(self.base)
        self.stats = load_stats(self.base)
        from ..build.delta import table_path

        # every table resolves through the stats.json pointers
        # (build/delta.py table_path): refresh-mode maintenance commits
        # immutable tables_gen=R directories with one-commit grace, so a
        # query in flight across a concurrent rewrite keeps its complete
        # old-generation files
        self.blocks = self.spark.read.parquet(
            table_path(self.base, "blocks", self.stats)
        )
        if "fws" not in self.blocks.columns:
            # format v2 (adds the full-word bitmask per block); a v1 index
            # decodes wrongly everywhere, so fail loud at open
            raise ValueError(
                f"index at {self.base} predates the fws block column "
                "(format v2); rebuild it with the current builder"
            )
        from ..build.delta import term_stats_path

        # resolved through the stats.json pointer: delta commits write
        # generation-addressed term_stats dirs (build/delta.py protocol)
        self.term_stats = self.spark.read.parquet(
            term_stats_path(self.base, self.stats)
        )
        # pending delta state (LSM/NRT maintenance, build/delta.py): the
        # docs view is visibility-filtered, candidate scans union the
        # delta postings, WAND serves the exhaustive plan, positional
        # operators union visibility-filtered delta position records
        from ..build import delta as _delta_mod

        # every pointer below resolves from the ONE self.stats snapshot
        # loaded above -- per-call stats.json re-reads can tear across a
        # commit landing mid-reload (e.g. blocks from generation R but
        # docs from R+1), violating the pre-or-post-commit invariant
        self._delta = _delta_mod.has_delta(self.base, self.stats)
        if self._delta:
            self._delta_max_gen = _delta_mod.max_committed_gen(
                self.base, self.stats
            )
            self._tomb = _delta_mod.read_tombstones(
                self.spark, self.base, self._delta_max_gen, self.stats
            )
            self._delta_post = _delta_mod.read_delta_postings(
                self.spark, self.base, self._delta_max_gen, self.stats
            )
            self.docs = _delta_mod.read_visible_docs(
                self.spark, self.base, self.stats
            )
        else:
            self._tomb = None
            self._delta_post = None
            self.docs = self.spark.read.parquet(
                table_path(self.base, "docs", self.stats)
            )
        self._vocab_pd: pd.DataFrame | None = None
        self._generation = int(self.stats.get("generation", 0))
        # warm serving mode state (see warm()); dropped on reload so a
        # maintenance rewrite can never serve stale decoded postings
        self._drop_warm_state()
        self._expr_cache: dict | None = None  # per-generation Column cache

    def _drop_warm_state(self) -> None:
        """Unpersist and reset ALL warm serving state (decoded postings,
        slim docs side, membership boundary, SQL template views). Called
        on every reload AND at the top of warm() -- re-warming the same
        generation must not leak the previous persisted frames, and a
        re-warm that skips the docs_slim branch must not keep serving
        the stale one."""
        old_warm = getattr(self, "_warm_decoded", None)
        if old_warm is not None:
            old_warm.unpersist()
        old_docs = getattr(self, "_docs_slim", None)
        if old_docs is not None:
            old_docs.unpersist()
        self._warm_decoded: DataFrame | None = None
        # partial-warm membership boundary (df*, term*): a term is warm
        # iff (df, term) ranks at-or-before it under (df desc, term asc).
        # O(1) driver state -- NEVER a materialized warm-term set (a 200k
        # literal IN-list in every decode plan was the round-3 scale flaw)
        self._warm_boundary: tuple[int, str] | None = None
        self._warm_all = False
        self._docs_slim: DataFrame | None = None
        # cached warm SQL template (warm()); reload drops its temp views
        self._drop_warm_views()

    def _ensure_fresh(self) -> None:
        """Generation check before serving from cached driver state: every
        maintenance rewrite bumps ``generation`` in stats.json
        (builder._finalize), so a LIVE engine reloads its frames + vocab
        cache instead of serving stale stats or scanning deleted files --
        the reference invalidates its typo cache the same way on every
        index update (typo_finder.go:54-76). Fast path: one stat() call
        (mtime+size signature); stats.json is only re-read when that
        changes."""
        p = os.path.join(self.base, "stats.json")
        try:
            st = os.stat(p)
        except FileNotFoundError:
            raise RuntimeError(
                f"index at {self.base} was deleted under a live engine"
            ) from None
        sig = (st.st_mtime_ns, st.st_size)
        if sig == self._stats_sig:
            return
        if int(load_stats(self.base).get("generation", 0)) != self._generation:
            self._open_frames()
        else:
            self._stats_sig = sig

    # ------------------------------------------------------------------
    def _vocab(self) -> pd.DataFrame | None:
        """Driver-side vocabulary cache, or None when too large."""
        if self.stats.get("n_terms", 1 << 62) > self._vocab_cache_max:
            return None
        if self._vocab_pd is None:
            cols = ["term", "df", "idf", "term_len"]
            if "field_bounds" in self.term_stats.columns:
                cols.append("field_bounds")
            self._vocab_pd = (
                self.term_stats.select(*cols)
                .toPandas()
                .sort_values("term", ignore_index=True)
            )
        return self._vocab_pd

    def term_field_ub(
        self, terms: list[str], fields: list[str]
    ) -> dict[str, float] | None:
        """Per-term BM25 tf-part upper bound SUMMED over the queried
        fields, from the build-time per-(term, field) (max_tf, min_dl)
        bounds in term_stats -- driver-side, zero jobs when the vocab is
        cached, one tiny ``term IN`` collect otherwise. None for indexes
        built before field_bounds existed (callers fall back to the
        block-metadata job). The per-field SUM is required for soundness:
        scoring sums tf across fields before BM25 saturation, and
        sat(tf_a + tf_b) <= bound_a + bound_b (concave, sat(0) = 0)."""
        if "field_bounds" not in self.term_stats.columns:
            return None
        vocab = self._vocab()
        tset = set(terms)
        if vocab is not None:
            sub = vocab[vocab["term"].isin(tset)]
            pairs = zip(sub["term"], sub["field_bounds"])
        else:
            rows = (
                self.term_stats.filter(F.col("term").isin(sorted(tset)))
                .select("term", "field_bounds")
                .collect()
            )
            pairs = ((r["term"], r["field_bounds"]) for r in rows)
        avgdl = float(self.stats["avgdl"])
        out: dict[str, float] = {}
        for term, fb in pairs:
            tot = 0.0
            for f_name, b in (fb or {}).items():
                if f_name in fields:
                    mtf, mdl = float(b["max_tf"]), float(b["min_dl"])
                    tot += (
                        mtf
                        * (BM25_K1 + 1.0)
                        / (
                            mtf
                            + BM25_K1
                            * (1.0 - BM25_B + BM25_B * mdl / avgdl)
                        )
                    )
            if tot > 0.0:
                out[term] = tot
        return out

    def _token_gates(
        self,
        tokens: list[str],
        typo_tolerance: bool,
        min_word_size_for_1_typo: int | None = None,
        min_word_size_for_2_typos: int | None = None,
    ):
        """Max typo distance per token (reference Q7 gates,
        service.go:176-226; defaults config/settings.go:141-153).
        Per-query overrides mirror query.MinWordSizeFor1Typo/2Typos
        (service.go:191-200)."""
        s = self.settings
        min1 = (
            min_word_size_for_1_typo
            if min_word_size_for_1_typo is not None
            else s.min_word_size_for_1_typo
        )
        min2 = (
            min_word_size_for_2_typos
            if min_word_size_for_2_typos is not None
            else s.min_word_size_for_2_typos
        )
        gates = {}
        # the `> 0` guard applies to the RESOLVED value (index setting
        # or query override, service.go:192-202): a threshold of 0
        # DISABLES candidates at that distance. Membership in
        # non_typo_tolerant_words is case-insensitive
        # (strings.EqualFold, service.go:179-183); query tokens are
        # already lowercased by the tokenizer
        ntw = {w.lower() for w in s.non_typo_tolerant_words}
        for tok in tokens:
            maxd = 0
            t1 = min1 > 0 and len(tok) >= min1
            t2 = min2 > 0 and len(tok) >= min2
            if typo_tolerance and tok not in ntw:
                if t2:
                    maxd = 2
                elif t1:
                    maxd = 1
            # the reference penalizes by SCAN TIER, not true distance:
            # its 1-typo pass applies x0.8 and its 2-typo pass x0.6 to
            # everything it finds (service.go:246 / :316), and the
            # best-distance dedup only protects terms the 1-typo pass
            # actually found -- so when that pass is gated off (min1=0,
            # or min2 <= len < min1) a distance-1 term is found by the
            # 2-typo pass and penalized x0.6. ``pen1`` is the penalty a
            # distance-1 candidate gets for this token.
            pen1 = TYPO_PENALTY_1 if t1 else TYPO_PENALTY_2
            gates[tok] = (maxd, pen1)
        return gates

    def _guard_keep(self, terms: pd.Series) -> pd.Series:
        """Candidate guard mask (service.go:204-228, both
        case-insensitive; index terms are already lowercase): a candidate
        EQUAL to a non-typo-tolerant word is rejected at any length
        (strings.EqualFold), and a >=3-char candidate that is a prefix
        of one is rejected (strings.HasPrefix over lowered strings).
        The settings list is lowered ONCE per call -- the mask runs over
        every typo candidate of a query, so per-candidate re-lowering
        was O(candidates x words) of pure waste on the driver fast
        path."""
        words = [w.lower() for w in self.settings.non_typo_tolerant_words]
        wset = set(words)

        def ok(term: str) -> bool:
            if term in wset:
                return False
            if len(term) < 3:
                return True
            return not any(w.startswith(term) for w in words)

        return terms.map(ok)

    def typo_scan(self, eligible: list[tuple[str, int]]) -> pd.DataFrame:
        """(token, term, distance) typo candidates for the given
        (token, max_distance) pairs -- ONE pass over the vocabulary for
        ANY number of tokens (multi-search batches all its queries'
        tokens through a single call). Driver-side numpy when the vocab
        is cached; otherwise one distributed mapInPandas job."""
        self._ensure_fresh()
        if not eligible:
            return pd.DataFrame(columns=["token", "term", "distance"])
        vocab = self._vocab()
        if vocab is not None:
            terms = vocab["term"].to_numpy(dtype=object)
            tlen = vocab["term_len"].to_numpy()
            out = []
            for tok, maxd in eligible:
                band = np.abs(tlen - len(tok)) <= maxd
                cand_t = terms[band]
                if len(cand_t) == 0:
                    continue
                dist = damerau_levenshtein_batch(tok, cand_t, maxd)
                m = (dist > 0) & (dist <= maxd)
                if m.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "token": tok,
                                "term": cand_t[m],
                                "distance": dist[m].astype("int32"),
                            }
                        )
                    )
            cands = (
                pd.concat(out, ignore_index=True)
                if out
                else pd.DataFrame(columns=["token", "term", "distance"])
            )
            if len(cands) and self.settings.non_typo_tolerant_words:
                cands = cands[self._guard_keep(cands["term"])]
            # deterministic replacement of the 500/50ms wall-clock cutoff
            cands = (
                cands.sort_values(["token", "distance", "term"])
                .groupby("token", sort=False)
                .head(MAX_TYPO_CANDIDATES)
                .reset_index(drop=True)
            )
            return cands
        return self._typo_scan_distributed(eligible)

    def _typo_scan_distributed(
        self, eligible: list[tuple[str, int]]
    ) -> pd.DataFrame:
        non_typo = list(self.settings.non_typo_tolerant_words)
        # length-band pushdown: only vocab terms within +-maxd of some
        # eligible token length ever reach the distance UDF
        band = reduce(
            lambda a, b: a | b,
            [(F.abs(F.col("term_len") - len(t)) <= d) for t, d in eligible],
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
        # candidate guard (service.go:204-228): case-insensitive
        # equality at any length + >=3-char prefix rejection (index
        # terms are already lowercase, so lower only the settings side)
        if non_typo:
            guard = reduce(
                lambda a, b: a | b,
                [
                    (F.col("term") == F.lit(w.lower()))
                    | (
                        (F.length("term") >= 3)
                        & F.lit(w.lower()).startswith(F.col("term"))
                    )
                    for w in non_typo
                ],
            )
            cands = cands.filter(~guard)
        w = Window.partitionBy("token").orderBy("distance", "term")
        cands = (
            cands.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= MAX_TYPO_CANDIDATES)
            .drop("rn")
        )
        return cands.toPandas()

    def candidate_terms(
        self,
        tokens: list[str],
        typo_tolerance: bool = True,
        min_word_size_for_1_typo: int | None = None,
        min_word_size_for_2_typos: int | None = None,
    ) -> pd.DataFrame:
        """(token, term, distance, penalty, df, idf) candidate table;
        bounded by n_tokens x (1 + MAX_TYPO_CANDIDATES). Zero Spark jobs
        when the vocab is driver-cached."""
        self._ensure_fresh()
        gates = self._token_gates(
            tokens,
            typo_tolerance,
            min_word_size_for_1_typo,
            min_word_size_for_2_typos,
        )
        eligible = [(t, d) for t, (d, _) in gates.items() if d > 0]
        rows = [(t, t, 0, 1.0) for t in tokens]
        typos = self.typo_scan(eligible)
        for r in typos.itertuples():
            pen = (
                gates[r.token][1] if r.distance == 1 else TYPO_PENALTY_2
            )
            rows.append((r.token, r.term, int(r.distance), pen))
        cand = pd.DataFrame(rows, columns=["token", "term", "distance", "penalty"])
        return self._with_stats(cand)

    def _with_stats(self, cand: pd.DataFrame) -> pd.DataFrame:
        """Attach df/idf to a candidate table (driver cache or one tiny
        filtered collect over term_stats)."""
        vocab = self._vocab()
        terms = sorted(set(cand["term"]))
        if vocab is not None:
            sub = vocab[vocab["term"].isin(terms)][["term", "df", "idf"]]
        else:
            sub = (
                self.term_stats.filter(F.col("term").isin(terms))
                .select("term", "df", "idf")
                .toPandas()
            )
        out = cand.merge(sub, on="term", how="left")
        out["df"] = out["df"].fillna(0).astype("int64")
        out["idf"] = out["idf"].fillna(0.0).astype("float64")
        return out

    # ------------------------------------------------------------------
    def warm(
        self,
        max_postings: int = 20_000_000,
        docs_map_max: int = 50_000_000,
    ) -> dict:
        """Opt-in SERVING MODE: decode hot posting blocks ONCE into a
        persisted executor-side frame so queries skip the scan + Arrow
        decode stage, and persist the slim (doc_id, documentID) join side.

        Budgeted, never unbounded: when the whole index fits
        ``max_postings`` every term is warmed; otherwise the highest-df
        terms are warmed up to the budget (the classic hot-set cache --
        head terms dominate query traffic) and cold terms keep the normal
        pruned scan+decode path, unioned per query. The docs map is only
        persisted when N <= ``docs_map_max``. A maintenance rewrite
        (generation bump) drops all warm state on the next query.

        Returns {"warm_terms": n|"all", "warm_postings": n, "docs_slim":
        bool} plus storage telemetry measured from the block manager after
        materialization -- ``bytes_in_memory``, ``bytes_on_disk``,
        ``fraction_in_memory``, ``cached_partitions`` -- so a serving
        operator can size ``max_postings`` against executor memory (a
        ``fraction_in_memory`` < 1.0 means the warm set spilled and the
        budget is too big for the heap).
        """
        self._ensure_fresh()
        # a re-warm (e.g. re-tuning max_postings) must not leak the
        # previous persisted warm frames or keep a stale docs_slim
        self._drop_warm_state()
        n_post = int(self.stats.get("n_postings", 0))
        info: dict = {}
        pre_storage = set(self._storage_info())
        if self._delta and n_post > max_postings:
            # a partial warm set under pending deltas would mix a clean
            # (visibility-applied) warm frame with a cold path that must
            # re-apply visibility -- refuse instead of risking stale rows
            raise ValueError(
                "index has pending delta segments and exceeds the warm "
                "budget; compact_segments() first or raise max_postings"
            )
        if n_post <= max_postings:
            blk = self.blocks
            self._warm_boundary = None
            self._warm_all = True
            info["warm_terms"] = "all"
        else:
            # hot-set selection by cumulative df under the (df desc, term
            # asc) total order. The driver keeps only the BOUNDARY tuple
            # (last term inside the budget): membership is a pure
            # comparison, and the decode filter is a semi-join against
            # the boundary-filtered term_stats -- no giant IN-list in the
            # plan, no 200k-row collect (round-3 VERDICT #3)
            vocab = self._vocab()
            if vocab is not None:  # driver cache: zero jobs
                v = vocab.sort_values(["df", "term"], ascending=[False, True])
                # budget in POSTING ROWS, the unit of max_postings and of
                # the full-warm gate above: the decoded frame has one row
                # per (term, field, doc), so a term's cost is df x the
                # number of fields it appears in (a conservative upper
                # bound -- not every doc matches in every field), not df
                # alone. Single-field indexes are unchanged.
                if "field_bounds" in v.columns:
                    rows_est = v["df"] * v["field_bounds"].map(
                        lambda fb: max(1, len(fb or {}))
                    )
                else:
                    rows_est = v["df"]
                cum = rows_est.cumsum()
                k = int((cum <= max_postings).sum())
                boundary = (
                    (int(v["df"].iloc[k - 1]), str(v["term"].iloc[k - 1]))
                    if k > 0 else None
                )
                n_chosen = k
            else:  # big vocab: distributed selection, 3 tiny collects
                boundary, n_chosen = self._warm_boundary_distributed(
                    max_postings
                )
            if boundary is None:
                raise ValueError(
                    "warm budget is below the largest term's df; raise "
                    "max_postings"
                )
            self._warm_boundary = boundary
            self._warm_all = False
            blk = self.blocks.join(
                self._warm_chosen_terms(), "term", "left_semi"
            )
            info["warm_terms"] = n_chosen
        decoded = decode_blocks(blk)
        if self._delta:
            # fold pending deltas INTO the warm frame (visibility applied
            # once, at warm time); the generation check re-warms after the
            # next maintenance commit
            from ..build.delta import apply_visibility

            dp = self._delta_post.select(
                "term", "field", "doc_id", "tf", "dl",
                F.col("is_full_word").alias("fw"), "gen",
            )
            decoded = apply_visibility(
                decoded.withColumn("gen", F.lit(0)).unionByName(dp),
                "gen",
                self._tomb,
            ).drop("gen")
        decoded = (
            decoded
            # persist HASH-PARTITIONED BY doc_id: every aggregation and
            # window in score_and_intersect clusters on key sets that
            # CONTAIN doc_id, so a doc_id partitioning satisfies all of
            # them -- the whole score+intersect pipeline becomes
            # partition-local (ZERO query-time exchanges before top-k).
            # Partition count sized to the WARMED data (~100k postings per
            # partition): per-task launch overhead dominates sub-ms task
            # bodies, so defaulting to shuffle.partitions would pay ~32
            # task launches per stage to scan a few MB of memory. On a
            # partial warm the warmed subset is budget-bounded -- sizing
            # by the full index's n_post would re-pay the task-launch
            # overhead the cap exists to avoid
            .repartition(
                max(4, min(
                    self.spark.sparkContext.defaultParallelism,
                    min(n_post, max_postings) // 100_000 + 1,
                )),
                "doc_id",
            )
            .persist()
        )
        info["warm_postings"] = decoded.count()  # materialize
        self._warm_decoded = decoded
        n_parts = decoded.rdd.getNumPartitions()
        if int(self.stats.get("N", 0)) <= docs_map_max:
            # CO-PARTITIONED with the warm frame (same key, same partition
            # count): the final documentID join then satisfies both sides'
            # distribution -- no exchange, no per-query broadcast job
            self._docs_slim = (
                self.docs.select("doc_id", "documentID")
                .repartition(n_parts, "doc_id")
                .persist()
            )
            self._docs_slim.count()
            info["docs_slim"] = True
        else:
            info["docs_slim"] = False
        mem = disk = parts = 0
        for rid, (m, d, p) in self._storage_info().items():
            if rid not in pre_storage:
                mem, disk, parts = mem + m, disk + d, parts + p
        info["bytes_in_memory"] = mem
        info["bytes_on_disk"] = disk
        info["cached_partitions"] = parts
        total = mem + disk
        info["fraction_in_memory"] = round(mem / total, 4) if total else 1.0
        self._build_warm_sql_template()
        info["sql_template"] = self._warm_sql is not None
        return info

    def _build_warm_sql_template(self) -> None:
        """Cache a single SQL string for the whole warm top-k pipeline
        (any warm mode with a persisted docs_slim). The DataFrame path
        costs ~30 py4j round trips of plan construction PER QUERY (~45%
        of warm p50 -- measured plan-build 320ms of 749ms total on a
        degraded-window profile, same ratio idle); the template needs
        ONE spark.sql() call. The logical plan is identical -- same
        cached InMemoryRelations via temp views, same expression trees
        (see score_and_intersect for the semantics and reference
        citations) -- so Catalyst produces the same one-job physical
        plan, which tests/test_warm.py pins for both paths. Under a
        PARTIAL warm (the realistic big-index serving mode) the warm
        frame holds only the hot-set terms, so search_from_cand routes a
        query here only when every candidate term is warm (boundary
        membership is a driver-side O(1) check); queries touching cold
        terms keep the union path, which needs the decode UDF SQL cannot
        express."""
        self._drop_warm_views()
        if self._warm_decoded is None or self._docs_slim is None:
            return
        # uuid view names: two engines warming concurrently (the API
        # server runs per-index jobs on threads) must never allocate the
        # same names -- a shared counter read-then-increment races, and a
        # collision silently cross-wires one engine's cached SQL onto the
        # other index's frames
        import uuid

        seq = uuid.uuid4().hex[:12]
        post_v = f"gse_warm_post_{seq}"
        docs_v = f"gse_warm_docs_{seq}"
        self._warm_decoded.createOrReplaceTempView(post_v)
        self._docs_slim.createOrReplaceTempView(docs_v)
        # bare decimal literals parse as DECIMAL in Spark SQL (0.75 * dl
        # would run through decimal arithmetic and drift ~1e-9 from the
        # Column path's double math) -- emit explicit double casts, the
        # same form _cand_entries uses; repr round-trips exactly
        def _dbl(x: float) -> str:
            return f"CAST('{x!r}' AS DOUBLE)"

        avgdl = _dbl(float(self.stats["avgdl"]))
        k1, b = _dbl(float(BM25_K1)), _dbl(float(BM25_B))
        k1p1, one_b = _dbl(float(BM25_K1 + 1.0)), _dbl(float(1.0 - BM25_B))
        ntf = list(self.settings.no_typo_tolerance_fields)
        ntf_pred = (
            " AND (_c.distance = 0 OR field NOT IN (%s))"
            % ",".join(f"'{_esc(f)}'" for f in ntf)
            if ntf
            else ""
        )
        self._warm_sql = {
            "views": (post_v, docs_v),
            "template": f"""
WITH matched AS (
  SELECT term, field, doc_id, tf, dl, fw,
         _c.token AS token, _c.distance AS distance,
         _c.penalty AS penalty, _c.idf AS idf
  FROM (
    SELECT d.*, explode(filter(array({{cands}}), s -> s.cterm = d.term)) AS _c
    FROM {post_v} d
    WHERE d.term IN ({{terms}}) AND d.field IN ({{fields}})
  )
  WHERE true{ntf_pred}
),
g1 AS (
  SELECT token, term, distance, penalty, idf, doc_id,
         sum(tf) AS tf, first(dl) AS dl, max(cast(fw AS int)) AS fw_any
  FROM matched
  GROUP BY token, term, distance, penalty, idf, doc_id
),
g1c AS (
  SELECT *,
         penalty * (idf * tf * {k1p1}
                    / (tf + {k1} * ({one_b} + {b} * dl / {avgdl}))) AS contrib
  FROM g1
),
g2 AS (
  SELECT * FROM (
    SELECT *, min(distance) OVER (PARTITION BY token, doc_id) AS best_d
    FROM g1c
  ) WHERE distance = best_d
),
g3 AS (
  SELECT token, doc_id,
         max(contrib) AS contrib,
         min(distance) AS dist,
         max(CASE WHEN distance = 0 AND fw_any = 1 THEN 1 ELSE 0 END)
           AS exact_w
  FROM g2 GROUP BY token, doc_id
),
scored AS (
  SELECT doc_id, score, num_typos, number_exact_words FROM (
    SELECT doc_id,
           -- g3 rows are unique per (token, doc_id) (its GROUP BY), so
           -- count(*) IS the distinct-token count; mirrors final_aggs
           count(*) AS _nt,
           sum(contrib) AS score,
           cast(sum(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS int)
             AS num_typos,
           cast(sum(exact_w) AS int) AS number_exact_words
    FROM g3 GROUP BY doc_id
  ) WHERE _nt = {{n_tokens}}
),
topk AS (
  SELECT /*+ SHUFFLE_HASH(ds) */
         s.doc_id, ds.documentID, s.score, s.num_typos,
         s.number_exact_words
  FROM scored s JOIN {docs_v} ds ON s.doc_id = ds.doc_id
  ORDER BY s.score DESC, s.doc_id ASC LIMIT {{k}}
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, documentID, score, num_typos, number_exact_words
FROM topk
""",
        }

    def _drop_warm_views(self) -> None:
        """Drop this engine's warm temp views (a long-lived server warms
        once per generation; the catalog must not accumulate two dead
        views per maintenance commit)."""
        old = getattr(self, "_warm_sql", None)
        self._warm_sql = None
        if old:
            for v in old["views"]:
                self.spark.catalog.dropTempView(v)

    def _warm_sql_topk(
        self, cand: pd.DataFrame, fields: list[str], k: int, n_tokens: int
    ) -> DataFrame:
        """One spark.sql() call for the whole warm exhaustive top-k --
        rank-identical to the DataFrame path (tests/test_warm.py)."""
        terms = ",".join(
            f"'{_esc(t)}'" for t in sorted(set(cand["term"]))
        )
        sql = self._warm_sql["template"].format(
            cands=_cand_entries(cand),
            terms=terms,
            fields=",".join(f"'{_esc(f)}'" for f in fields),
            n_tokens=int(n_tokens),
            k=int(k),
        )
        return self.spark.sql(sql)

    def _storage_info(self) -> dict[int, tuple[int, int, int]]:
        """Block-manager storage per cached RDD: {rdd_id: (bytes_in_memory,
        bytes_on_disk, cached_partitions)}. Driver-side metadata lookup,
        zero Spark jobs."""
        out: dict[int, tuple[int, int, int]] = {}
        for i in self.spark.sparkContext._jsc.sc().getRDDStorageInfo():
            out[int(i.id())] = (
                int(i.memSize()), int(i.diskSize()),
                int(i.numCachedPartitions()),
            )
        return out

    def _warm_chosen_terms(self) -> DataFrame:
        """The warm hot-set as a FRAME (term_stats filtered by the
        boundary predicate) for semi-joins -- plan size O(1) regardless
        of how many terms are warm."""
        dstar, tstar = self._warm_boundary
        return self.term_stats.filter(
            (F.col("df") > F.lit(dstar))
            | ((F.col("df") == F.lit(dstar)) & (F.col("term") <= F.lit(tstar)))
        ).select("term")

    def _is_warm_term(self, term: str, df: int) -> bool:
        """Exact membership in the warm hot-set from the boundary tuple
        alone (the candidate table already carries each term's df)."""
        if self._warm_all:
            return True
        if self._warm_boundary is None:
            return False
        dstar, tstar = self._warm_boundary
        return df > dstar or (df == dstar and term <= tstar)

    def _warm_boundary_distributed(
        self, budget: int
    ) -> tuple[tuple[int, str] | None, int]:
        """Budget selection WITHOUT collecting the vocabulary: range-
        partition term_stats by (df desc, term), per-partition df sums ->
        prefix offsets (one tiny collect), within-partition cumulative
        sums (parallel windows, no single-reducer global window), then
        collect ONLY the boundary row. Returns ((df*, term*), n_chosen)."""
        from pyspark.sql import Window

        # same posting-row budget unit as the driver path: df x fields
        # present (see warm()); F.size on a NULL map is -1, greatest
        # clamps it
        if "field_bounds" in self.term_stats.columns:
            rows_col = (
                F.col("df")
                * F.greatest(F.lit(1), F.size("field_bounds"))
            ).alias("rows_est")
        else:
            rows_col = F.col("df").alias("rows_est")
        ts = self.term_stats.select("term", "df", rows_col)
        npart = max(1, self.spark.sparkContext.defaultParallelism)
        parted = ts.repartitionByRange(
            npart, F.col("df").desc(), F.col("term").asc()
        ).withColumn("_pid", F.spark_partition_id()).persist()
        try:
            psums = (
                parted.groupBy("_pid")
                .agg(F.sum("rows_est").alias("s"), F.count("*").alias("c"))
                .orderBy("_pid")
                .collect()
            )
            rows, off, coff = [], 0, 0
            for r in psums:
                rows.append((int(r["_pid"]), off, coff))
                off += int(r["s"])
                coff += int(r["c"])
            offs = F.broadcast(
                self.spark.createDataFrame(
                    rows, "_pid int, _off long, _coff long"
                )
            )
            w = Window.partitionBy("_pid").orderBy(
                F.col("df").desc(), F.col("term").asc()
            )
            withcum = (
                parted.join(offs, "_pid")
                .withColumn("cum", F.sum("rows_est").over(w) + F.col("_off"))
                .withColumn("rk", F.row_number().over(w) + F.col("_coff"))
            )
            hit = (
                withcum.filter(F.col("cum") <= budget)
                .orderBy(F.col("rk").desc())
                .limit(1)
                .select("df", "term", "rk")
                .collect()
            )
            if not hit:
                return None, 0
            r = hit[0]
            return (int(r["df"]), str(r["term"])), int(r["rk"])
        finally:
            parted.unpersist()

    def _term_buckets(self, terms: list[str]) -> list[int]:
        """Bucket of each candidate term via the pure-Python XXH64 replica
        of Spark's xxhash64 (bit-identical, tests/test_xxhash.py) -- exact
        partition pruning with zero Spark jobs."""
        from ..functions.xxhash import term_bucket

        nb = self.settings.term_buckets
        return sorted({term_bucket(t, nb) for t in terms})

    def candidate_blocks(self, cand: pd.DataFrame, fields: list[str]) -> DataFrame:
        """Block rows of the candidate terms: bucket partition pruning
        (zero-job xxhash64 replica) + ``term IN`` row-group pushdown."""
        terms = sorted(set(cand["term"]))
        buckets = self._term_buckets(terms)
        return self.blocks.filter(
            F.col("bucket").isin(buckets)
            & F.col("term").isin(terms)
            & F.col("field").isin(fields)
        )

    def cand_frame(self, cand: pd.DataFrame) -> DataFrame:
        """Broadcast-able Spark frame of the candidate table (df/idf come
        from the candidate table itself -- no term_stats join per query).
        Built from plain tuples: for a few-hundred-row table the Arrow
        pandas conversion costs more in per-query latency than it saves."""
        rows = [
            (str(t), str(m), int(d), float(p), float(i))
            for t, m, d, p, i in zip(
                cand["token"], cand["term"], cand["distance"],
                cand["penalty"], cand["idf"],
            )
        ]
        return F.broadcast(
            self.spark.createDataFrame(
                rows,
                schema="token string, term string, distance int, "
                "penalty double, idf double",
            )
        )

    # literal candidate-attach cap: the explode(filter(array-literal))
    # attach is O(len(cand)) PER DECODED ROW (interpreted higher-order
    # function), so it only beats the broadcast hash join for small
    # candidate tables -- exactly the non-typo serving case. Typo-heavy
    # queries (up to 500 candidates/token) keep the O(1)-per-row join.
    CAND_LITERAL_MAX = 64

    def attach_cand(self, decoded: DataFrame, cand: pd.DataFrame) -> DataFrame:
        """Attach candidate meta (token, distance, penalty, idf) to decoded
        postings by term: inner-join semantics (a term matching n (token,
        term) pairs fans out n times, no match -> dropped). Small candidate
        tables are injected as an array literal + explode(filter(...)) --
        no per-query BroadcastExchange sub-job, no driver->JVM
        createDataFrame (the warm path's trick, shared with the cold and
        WAND paths); larger ones fall back to the broadcast join."""
        if not len(cand) or len(cand) > self.CAND_LITERAL_MAX:
            return decoded.join(self.cand_frame(cand), "term")
        entries = _cand_entries(cand)
        matches = F.expr(f"filter(array({entries}), s -> s.cterm = term)")
        out = decoded.select("*", F.explode(matches).alias("_c"))
        return out.select(
            *decoded.columns,
            F.col("_c.token").alias("token"),
            F.col("_c.distance").alias("distance"),
            F.col("_c.penalty").alias("penalty"),
            F.col("_c.idf").alias("idf"),
        )

    def scan_candidates(
        self, cand: pd.DataFrame, fields: list[str]
    ) -> DataFrame:
        """Decoded postings of candidate terms joined with candidate meta:
        (token, term, distance, penalty, idf, field, doc_id, tf, dl, fw).

        Warm serving mode: terms covered by the persisted decoded frame
        are filtered from it (no scan, no Arrow decode); cold terms keep
        the pruned scan+decode path; the two unioned."""
        terms = sorted(set(cand["term"]))
        decoded = None
        cold = terms
        if self._warm_decoded is not None:
            dfmap = {
                str(t): int(d) for t, d in zip(cand["term"], cand["df"])
            }
            warm = [t for t in terms if self._is_warm_term(t, dfmap[t])]
            cold = [] if self._warm_all else [
                t for t in terms if not self._is_warm_term(t, dfmap[t])
            ]
            if warm:
                decoded = self._warm_decoded.filter(
                    F.col("term").isin(warm) & F.col("field").isin(fields)
                )
        if cold:
            blk = self.candidate_blocks(
                cand[cand["term"].isin(cold)], fields
            )
            # decode_blocks projects BEFORE the decode UDF: column
            # pruning cannot reach through mapInArrow, and the unused
            # ``positions`` stream is the bulk of a block row's bytes
            cold_dec = decode_blocks(blk)
            decoded = cold_dec if decoded is None else decoded.unionByName(cold_dec)
        if decoded is None:  # no candidate terms at all
            decoded = self.spark.createDataFrame([], schema=DECODED_SCHEMA)
        if self._delta and self._warm_decoded is None:
            # pending deltas: base blocks still hold the replaced docs'
            # postings (hidden by tombstones) and the new postings live
            # only in the flat delta files -- union candidate terms' delta
            # rows and apply generation visibility (build/delta.py)
            from ..build.delta import apply_visibility

            dp = self._delta_post.filter(
                F.col("term").isin(terms) & F.col("field").isin(fields)
            ).select(
                "term", "field", "doc_id", "tf", "dl",
                F.col("is_full_word").alias("fw"), "gen",
            )
            base = decoded.withColumn("gen", F.lit(0))
            decoded = apply_visibility(
                base.unionByName(dp), "gen", self._tomb
            ).drop("gen")
        if self._warm_decoded is not None and len(cand):
            # serving mode (and at least one candidate: an EMPTY array
            # literal fails analysis -- the join form below returns the
            # empty frame the cold path returns for the same input):
            # the candidate meta is injected as an ARRAY
            # LITERAL + explode(filter(...)) instead of a broadcast join --
            # identical inner-join semantics (a term matching n (token,
            # term) pairs fans out n times, no match -> dropped), but no
            # per-query BroadcastExchange job and no driver->JVM
            # createDataFrame. Built as ONE SQL expression string: a
            # python-side array-of-struct literal costs ~5 py4j round
            # trips PER candidate row, which dominated warm p50. Terms
            # are tokenizer output ([a-z0-9]+ and prefixes), safe to
            # embed; repr(float) round-trips exactly.
            entries = _cand_entries(cand)
            matches = F.expr(
                f"filter(array({entries}), s -> s.cterm = term)"
            )
            return (
                decoded.select("*", F.explode(matches).alias("_c"))
                .select(
                    "term", "field", "doc_id", "tf", "dl", "fw",
                    F.col("_c.token").alias("token"),
                    F.col("_c.distance").alias("distance"),
                    F.col("_c.penalty").alias("penalty"),
                    F.col("_c.idf").alias("idf"),
                )
            )
        # cold path: repartition by doc_id BEFORE the candidate attach --
        # the attach's interpreted filter(array)/explode would otherwise
        # run inside the decode stage's few scan splits (near-serial),
        # and the attach is narrow so the partitioning survives it,
        # leaving the whole downstream score pipeline exchange-free
        # (every clustering key set there contains doc_id)
        decoded = decoded.repartition(F.col("doc_id"))
        # literal attach for small candidate tables (no per-query
        # BroadcastExchange), broadcast join above the cap
        return self.attach_cand(decoded, cand)

    # ------------------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        fields: list[str] | None = None,
        typo_tolerance: bool = True,
        min_word_size_for_1_typo: int | None = None,
        min_word_size_for_2_typos: int | None = None,
    ) -> DataFrame:
        """Top-k BM25 search; returns (rank, doc_id, documentID, score,
        num_typos, number_exact_words) rank-identical to the oracle.
        Per-query ``min_word_size_for_*`` override the index's typo gates
        (reference Q7, service.go:191-200)."""
        self._ensure_fresh()
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

        cand = self.candidate_terms(
            tokens,
            typo_tolerance,
            min_word_size_for_1_typo,
            min_word_size_for_2_typos,
        )
        return self.search_from_cand(cand, fields, k, n_tokens=len(tokens))

    def search_from_cand(
        self, cand: pd.DataFrame, fields: list[str], k: int, n_tokens: int
    ) -> DataFrame:
        """Exhaustive scoring plan from a prepared candidate table (shared
        by search() and the WAND fallback path). In full warm mode the
        whole pipeline is one cached-SQL call (_warm_sql_topk) instead
        of ~30 py4j plan-construction round trips -- same logical plan,
        same single job, rank-identical (tests/test_warm.py)."""
        if (
            self._warm_sql is not None
            and len(cand)
            and (
                self._warm_all
                or all(
                    self._is_warm_term(str(t), int(d))
                    for t, d in zip(cand["term"], cand["df"])
                )
            )
        ):
            return self._warm_sql_topk(cand, fields, k, n_tokens)
        # cold mode arrives doc_id-partitioned from scan_candidates (one
        # exchange satisfying the whole score pipeline); warm mode from
        # its persisted partitioning -- neither needs an exchange here
        matched = self.scan_candidates(cand, fields)
        scored = self.score_and_intersect(matched, n_tokens=n_tokens)
        return self.finish_topk(scored, k)

    def finish_topk(self, scored: DataFrame, k: int) -> DataFrame:
        ex = self._exprs()
        if self._docs_slim is not None:
            # shuffle-hash hint vetoes the broadcast the planner would
            # otherwise pick: both sides are already HashPartitioning
            # (doc_id, N), so the hinted join inserts NO exchange and
            # spares the per-query BroadcastExchange job
            docs_slim = self._docs_slim.hint("shuffle_hash")
            out = (
                scored.join(docs_slim, "doc_id")
                .orderBy(*ex["order"])
                .limit(k)
            )
        else:
            # cold path: the total order needs only (score, doc_id), so
            # take the top-k BEFORE attaching documentID -- the docs
            # table then joins against k rows (broadcast build side, no
            # corpus-sized docs shuffle) instead of the full scored
            # frame. Sound because every scored doc_id exists in docs
            # (postings and docs commit atomically per generation, and
            # the delta path applies visibility before scoring).
            topk = scored.orderBy(*ex["order"]).limit(k)
            out = F.broadcast(topk).join(
                self.docs.select("doc_id", "documentID"), "doc_id"
            )
        return out.withColumn(
            "rank", F.row_number().over(ex["rank_w"])
        ).select(
            "rank",
            "doc_id",
            "documentID",
            "score",
            "num_typos",
            "number_exact_words",
        )

    def _exprs(self) -> dict:
        """Per-generation cache of the REUSABLE Column/Window objects of
        the scoring pipeline: Columns are immutable unresolved expression
        trees, so building them once removes ~40 py4j round trips from
        every query's plan construction (a measurable slice of warm-mode
        latency). Rebuilt on reload because avgdl and settings are baked
        into the expressions."""
        if self._expr_cache is not None:
            return self._expr_cache
        avgdl = float(self.stats["avgdl"])
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
        w = Window.partitionBy("token", "doc_id")
        ntf = list(self.settings.no_typo_tolerance_fields)
        self._expr_cache = {
            "ntf_keep": (
                (F.col("distance") == 0) | ~F.col("field").isin(ntf)
                if ntf
                else None
            ),
            "g1_aggs": [
                F.sum("tf").alias("tf"),
                F.first("dl").alias("dl"),
                F.max(F.col("fw").cast("int")).alias("fw_any"),
            ],
            "contrib": F.col("penalty") * bm25,
            "best_d": F.min("distance").over(w),
            "best_keep": F.col("distance") == F.col("best_d"),
            "g3_aggs": [
                F.max("contrib").alias("contrib"),
                F.min("distance").alias("dist"),
                F.max(
                    F.when(
                        (F.col("distance") == 0) & (F.col("fw_any") == 1), 1
                    ).otherwise(0)
                ).alias("exact_w"),
            ],
            "final_aggs": [
                # the final grouping consumes g3's output, which is
                # grouped by (token, doc_id) -- rows are unique per
                # (token, doc) BY CONSTRUCTION, so a plain count IS the
                # distinct-token count. countDistinct would plan an
                # extra partial-dedup aggregation level over the g3
                # frame on every query (cold, WAND phases, typo); the
                # warm SQL template mirrors this (count(*)), which the
                # bit-exact template-vs-DataFrame tests pin.
                F.count(F.lit(1)).alias("_nt"),
                F.sum("contrib").alias("score"),
                F.sum(F.when(F.col("dist") > 0, 1).otherwise(0))
                .cast("int")
                .alias("num_typos"),
                F.sum("exact_w").cast("int").alias("number_exact_words"),
            ],
            "rank_w": Window.orderBy(F.desc("score"), F.asc("doc_id")),
            "order": [F.desc("score"), F.asc("doc_id")],
        }
        return self._expr_cache

    def score_and_intersect(self, matched: DataFrame, n_tokens: int) -> DataFrame:
        """exact-skip + best-distance-wins + max-per-token BM25 + AND,
        plus the A3 hit-info accounting: ``num_typos`` = tokens matched
        only via typo, ``number_exact_words`` = distinct tokens whose
        exact term occurs as a FULL word in some allowed field of the doc
        (reference service.go:443-509 -- the is_full_word flag the
        reference declares but never writes is populated at build here).

        ``no_typo_tolerance_fields``: typo-matched entries in these fields
        are dropped -- only exact matches count there. The reference
        DECLARES this setting (config/settings.go:39: "Fields for which
        typo tolerance is disabled (only exact matches)") but its search
        path never reads it; this engine implements the documented
        semantics (the pure-Python oracle mirrors it)."""
        ex = self._exprs()
        if ex["ntf_keep"] is not None:
            matched = matched.filter(ex["ntf_keep"])
        # doc-level tf per candidate term: sum over allowed fields;
        # fw_any: the term occurs as a full word in >= 1 allowed field
        g1 = matched.groupBy(
            "token", "term", "distance", "penalty", "idf", "doc_id"
        ).agg(*ex["g1_aggs"])
        g1 = g1.withColumn("contrib", ex["contrib"])
        # exact-skip + best-distance-wins (service.go:234-257): keep only
        # entries at the minimum distance per (token, doc)
        g2 = g1.withColumn("best_d", ex["best_d"]).filter(ex["best_keep"])
        # exact full-word match per token: distance-0 rows only ever
        # survive the best-distance filter when they exist (g3_aggs)
        g3 = g2.groupBy("token", "doc_id").agg(*ex["g3_aggs"])
        # AND intersection: doc must match every query token
        return (
            g3.groupBy("doc_id")
            .agg(*ex["final_aggs"])
            .filter(F.col("_nt") == n_tokens)
            .drop("_nt")
        )

    def _display_survivors(
        self, matched: DataFrame, doc_ids: list[int] | None = None
    ) -> DataFrame:
        """Shared survivor pipeline for the display surfaces
        (field_matches, highlight): optional doc restriction BEFORE the
        aggregation, no_typo_tolerance_fields exclusion, best-distance
        per (token, doc), and the 'term(typo)' display column."""
        if doc_ids is not None:
            matched = matched.filter(F.col("doc_id").isin(list(doc_ids)))
        ntf = list(self.settings.no_typo_tolerance_fields)
        if ntf:
            # same per-field typo exclusion as score_and_intersect
            matched = matched.filter(
                (F.col("distance") == 0) | ~F.col("field").isin(ntf)
            )
        w = Window.partitionBy("token", "doc_id")
        best = matched.withColumn("best_d", F.min("distance").over(w)).filter(
            F.col("distance") == F.col("best_d")
        )
        return best.withColumn(
            "display",
            F.when(F.col("distance") == 0, F.col("term")).otherwise(
                F.concat(F.col("term"), F.lit("(typo)"))
            ),
        )

    def field_matches(
        self,
        cand: pd.DataFrame,
        fields: list[str],
        doc_ids: list[int] | None = None,
    ) -> DataFrame:
        """(doc_id, field_matches map<field, array<display>>) -- the
        reference's FieldMatches rendering: exact matches display as the
        query token, typo matches as 'term(typo)' (service.go:425-432,
        481-486), restricted to best-distance survivors per (token, doc).
        ``doc_ids`` (e.g. one result page) restricts the frame BEFORE the
        aggregation -- rendering 10 hits must not pay a corpus-scale
        groupBy."""
        matched = self.scan_candidates(cand, fields)
        best = self._display_survivors(matched, doc_ids)
        disp = best.select("doc_id", "field", "display").distinct()
        per_field = disp.groupBy("doc_id", "field").agg(
            F.sort_array(F.collect_set("display")).alias("terms")
        )
        return per_field.groupBy("doc_id").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("field", "terms")))
            ).alias("field_matches")
        )

    def highlight(
        self,
        cand: pd.DataFrame,
        fields: list[str],
        doc_ids: list[int] | None = None,
    ) -> DataFrame:
        """(doc_id, field, term, display, positions): matched terms with
        their token offsets per (doc, field) -- the stored positions
        (declared dead in the reference, index/posting.go:10) surfaced for
        hit highlighting. Same survivor semantics as field_matches (shared
        ``_display_survivors`` pipeline)."""
        from .phrase import positional_rows

        if not getattr(self.settings, "store_positions", True):
            raise ValueError(
                "index was built with store_positions=False; highlight "
                "needs stored positions -- rebuild with store_positions=True"
            )

        # delta-aware (positional_rows unions visibility-filtered delta
        # rows): highlight works under pending NRT deltas
        decoded = positional_rows(self, cand, fields)
        matched = decoded.join(self.cand_frame(cand), "term")
        best = self._display_survivors(matched, doc_ids)
        return best.select(
            "doc_id", "field", "term", "display", "positions"
        ).distinct()

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame(
            [],
            schema="rank int, doc_id long, documentID string, score double, "
            "num_typos int, number_exact_words int",
        )
