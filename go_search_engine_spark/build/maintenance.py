"""Index lifecycle + document maintenance operators.

Reference equivalents:
- T11 delete document: strips the doc's entries from every posting list
  and drops empty terms (/root/reference/internal/indexing/
  service.go:344-427). Here: anti-join on the segments + docs tables,
  then a stats/blocks refresh -- the batch expression of the same
  mutation. On Iceberg this would be a MERGE/DELETE commit; on local
  parquet it rewrites the affected tables.
- T13 update document: delete-then-add (service.go:166-215) => here
  upsert = anti-join + union + refresh.
- T12 delete all / T14 bulk reindex: clear + rebuild
  (service.go:324-340, bulk_operations.go:427-467) => builder re-run with
  resume=False.
- O1/O2/O3 create/delete/rename index (internal/engine/
  index_management.go:15-114) => warehouse directory/manifest ops
  (Iceberg: CREATE/DROP/ALTER TABLE).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexSettings
from .builder import IndexBuilder, load_settings


# --- O1/O2/O3: index lifecycle --------------------------------------------

def create_index(warehouse: str, settings: IndexSettings) -> str:
    base = os.path.join(warehouse, settings.name)
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "settings.json"), "w") as f:
        json.dump(settings.to_dict(), f, indent=2)
    return base


def delete_index(warehouse: str, name: str) -> None:
    shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)


def rename_index(warehouse: str, old: str, new: str) -> None:
    src = os.path.join(warehouse, old)
    dst = os.path.join(warehouse, new)
    os.rename(src, dst)
    settings = load_settings(dst)
    settings.name = new
    with open(os.path.join(dst, "settings.json"), "w") as f:
        json.dump(settings.to_dict(), f, indent=2)


def list_indexes(warehouse: str) -> list[str]:
    """S4: index discovery -- directories holding a settings manifest."""
    if not os.path.isdir(warehouse):
        return []
    return sorted(
        d
        for d in os.listdir(warehouse)
        if os.path.exists(os.path.join(warehouse, d, "settings.json"))
    )


# --- O5: settings update with reindex detection ----------------------------

CORE_SETTINGS = {
    "searchable_fields",
    "filterable_fields",
    "min_word_size_for_1_typo",
    "min_word_size_for_2_typos",
    "fields_without_prefix_search",
    "block_size",
    "term_buckets",
    "store_positions",
}


def requires_full_reindex(old: IndexSettings, new: IndexSettings) -> bool:
    """Core-setting diff => rebuild; else metadata-only commit (reference
    settings_management.go:119-138 -- note the reference docs claim typo
    thresholds are search-time-only but the code forces reindex; code
    wins, mirrored here)."""
    a, b = old.to_dict(), new.to_dict()
    return any(a.get(k) != b.get(k) for k in CORE_SETTINGS)


def update_settings(
    spark: SparkSession,
    warehouse: str,
    new_settings: IndexSettings,
    corpus: DataFrame | None = None,
    id_col: str = "documentID",
) -> bool:
    """Apply a settings update; returns True if a full reindex ran."""
    base = os.path.join(warehouse, new_settings.name)
    old = load_settings(base)
    if requires_full_reindex(old, new_settings):
        if corpus is None:
            raise ValueError("core settings changed: corpus required for reindex")
        IndexBuilder(spark, new_settings, warehouse).build(
            corpus, id_col=id_col, resume=False
        )
        return True
    with open(os.path.join(base, "settings.json"), "w") as f:
        json.dump(new_settings.to_dict(), f, indent=2)
    return False


# --- T11/T13: document-level maintenance ------------------------------------

class IndexMaintenance:
    def __init__(self, spark: SparkSession, warehouse: str, name: str):
        self.spark = spark
        self.warehouse = warehouse
        self.base = os.path.join(warehouse, name)
        self.settings = load_settings(self.base)
        self.builder = IndexBuilder(self.spark, self.settings, warehouse)

    def _refresh(
        self, docs: DataFrame, segments: DataFrame,
        num_shards: int | None = None,
    ) -> None:
        """Rewrite docs + segments, then recompute stats/blocks via the
        builder's finalize (the sorted-merge). Two-phase via temp dirs so a
        crash mid-rewrite leaves the old tables readable."""
        if num_shards is None:
            # resolve BEFORE the rewrite: the fallback reads the OLD docs
            # table, which is about to be replaced (and may become empty)
            num_shards = self._num_shards()
        tmp_docs = self.base + "/_docs_new"
        tmp_seg = self.base + "/_segments_new"
        # builder._write preserves schema when the frame is empty (a
        # delete of every document must leave a readable empty table)
        self.builder._write(docs, tmp_docs, partition_by=["shard"])
        segments.write.mode("overwrite").parquet(tmp_seg)
        for sub, tmp in (("docs", tmp_docs), ("segments", tmp_seg)):
            final = os.path.join(self.base, sub)
            shutil.rmtree(final, ignore_errors=True)
            os.rename(tmp, final)
        # the rewritten tables no longer correspond to any build's shard
        # fingerprints: invalidate resume state so the next
        # build(resume=True) re-verifies shard contents instead of
        # silently skipping (e.g. never re-adding deleted documents)
        shutil.rmtree(os.path.join(self.base, "_checkpoints"), ignore_errors=True)
        marker = os.path.join(self.base, "_docs_complete.json")
        if os.path.exists(marker):
            os.remove(marker)
        from .builder import BuildReport

        report = BuildReport()
        self.builder._finalize(report, num_shards=num_shards)

    def _num_shards(self) -> int:
        """The build's shard-hash modulus from stats.json; fallback for
        stats written before the field existed: max(docs.shard)+1 (an
        under-count only when the highest shards got no documents)."""
        from .builder import load_stats

        try:
            n = int(load_stats(self.base).get("num_shards", 0))
        except FileNotFoundError:
            n = 0
        if n > 0:
            return n
        docs = self.spark.read.parquet(os.path.join(self.base, "docs"))
        m = docs.agg(F.max("shard")).collect()[0][0]
        return int(m) + 1 if m is not None else 1

    def delete_documents(self, document_ids: list[str]) -> int:
        """T11: remove docs + their postings; empty terms disappear from
        term_stats/blocks in the refresh (the reference's empty-term
        cleanup, service.go:407-416)."""
        docs = self.spark.read.parquet(os.path.join(self.base, "docs"))
        victims = docs.filter(F.col("documentID").isin(document_ids)).select(
            "doc_id"
        )
        n = victims.count()
        if n == 0:
            return 0
        segments = self.spark.read.parquet(os.path.join(self.base, "segments"))
        new_docs = docs.join(F.broadcast(victims), "doc_id", "left_anti")
        new_segments = segments.drop("shard").join(
            F.broadcast(victims), "doc_id", "left_anti"
        )
        self._refresh(new_docs, new_segments)
        return n

    def upsert_documents(
        self, new_corpus: DataFrame, id_col: str = "documentID"
    ) -> dict:
        """T13: document-level update/insert WITHOUT a full rebuild,
        matching the reference's delete-then-add update path
        (/root/reference/internal/indexing/service.go:166-215):

        - existing documentIDs keep their internal doc_id (the reference
          reuses the internal ID on update, service.go:150-163);
        - new documentIDs get ids above the current maximum (NextID++);
        - the updated docs' old postings are anti-joined out of the
          segments, the new flatMap output is unioned in, and
          stats/term_stats/blocks are recomputed by _refresh -- untouched
          documents' postings are never re-derived.

        Returns {"updated": n, "inserted": n}.
        """
        from ..functions.tokenizer import whitespace_word_count_col
        from .builder import _norm_field
        from .flatmap import POSTINGS_SCHEMA, make_flatmap

        s = self.settings
        docs = self.spark.read.parquet(os.path.join(self.base, "docs"))
        segments = self.spark.read.parquet(os.path.join(self.base, "segments"))
        if "shard" in segments.columns:
            segments = segments.drop("shard")

        nc = new_corpus
        if id_col != "documentID":
            nc = nc.withColumnRenamed(id_col, "documentID")
        # the docs table is TYPED (unlike the reference's schema-free doc
        # maps): an upsert batch must carry every passthrough column or the
        # final projection dies with an unresolved-column error mid-plan --
        # validate upfront with an actionable message instead
        derived = {"doc_id", "doc_len", "content_sha256", "shard"}
        missing = set(docs.columns) - set(nc.columns) - derived
        if missing:
            raise ValueError(
                "upsert batch lacks columns present in the docs table: "
                f"{sorted(missing)} (the index schema is fixed at build; "
                "supply every non-derived column)"
            )
        dl = None
        for f_name in s.searchable_fields:
            c = whitespace_word_count_col(
                F.coalesce(_norm_field(nc, f_name), F.lit(""))
            )
            dl = c if dl is None else dl + c
        sha_src = (
            F.col("content")
            if "content" in nc.columns
            else F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(_norm_field(nc, f), F.lit(""))
                    for f in s.searchable_fields
                ],
            )
        )
        nc = nc.withColumn("doc_len", dl.cast("long")).withColumn(
            "content_sha256", F.sha2(sha_src, 256)
        )

        # coalesce: an index whose docs were all deleted has max(doc_id)
        # NULL -- the whole batch is then inserts starting at doc_id 0
        row = docs.agg(F.max("doc_id")).collect()[0][0]
        max_id = int(row) if row is not None else -1
        num_shards = self._num_shards()
        joined = nc.join(
            docs.select("documentID", "doc_id"), "documentID", "left"
        ).persist()
        n_upd = joined.filter(F.col("doc_id").isNotNull()).count()
        n_ins = joined.filter(F.col("doc_id").isNull()).count()
        n_distinct = joined.select("documentID").distinct().count()
        if n_upd + n_ins != n_distinct:
            joined.unpersist()
            # additive duplicates would double postings / fork insert ids;
            # the reference's update path is strictly one-doc-at-a-time
            raise ValueError(
                "upsert batch contains duplicate documentIDs; dedupe it "
                "(e.g. dropDuplicates(['documentID'])) before upserting"
            )
        # inserts: dense ids appended after the current maximum via the
        # builder's range-partition + offset composition (build/ids.py) --
        # NO single-partition global window, so a bulk insert of 10^8 new
        # docs parallelizes like a fresh build (the reference pre-allocates
        # contiguous NextID ranges per batch, bulk_operations.go:168-202)
        from .ids import assign_doc_ids

        par = self.spark.sparkContext.defaultParallelism
        news = assign_doc_ids(
            joined.filter(F.col("doc_id").isNull()).drop("doc_id"),
            "documentID",
            max(1, par),
        ).withColumn("doc_id", (F.col("doc_id") + F.lit(max_id + 1)).cast("long"))
        upserted = (
            joined.filter(F.col("doc_id").isNotNull())
            .unionByName(news)
            .withColumn(
                "shard",
                F.pmod(F.xxhash64("documentID"), F.lit(num_shards)).cast("int"),
            )
            .select(*docs.columns)
            .persist()
        )

        new_docs = docs.join(
            upserted.select("documentID"), "documentID", "left_anti"
        ).unionByName(upserted)
        flat_in = upserted.select(
            "doc_id",
            "doc_len",
            *[_norm_field(upserted, f).alias(f) for f in s.searchable_fields],
        )
        new_seg = flat_in.mapInPandas(make_flatmap(s), schema=POSTINGS_SCHEMA)
        kept = segments.join(
            upserted.select("doc_id"), "doc_id", "left_anti"
        )
        self._refresh(new_docs, kept.unionByName(new_seg), num_shards)
        joined.unpersist()
        upserted.unpersist()
        return {"updated": int(n_upd), "inserted": int(n_ins)}

    def compact_segments(self, target_partitions: int | None = None) -> int:
        """Rewrite the segments table into a bounded number of files.

        Every upsert/delete unions or anti-joins rows into segments, so a
        long-lived index accumulates small files -- the classic
        small-files degradation (each scan pays per-file open/footer
        costs). Compaction is the engine's analogue of an LSM/Lucene
        segment merge: one repartition-by-(term)-rewrite, stats/blocks
        refreshed from the compacted table. Returns the file count after
        compaction."""
        import glob

        seg_path = os.path.join(self.base, "segments")
        segments = self.spark.read.parquet(seg_path)
        if "shard" in segments.columns:
            segments = segments.drop("shard")
        docs = self.spark.read.parquet(os.path.join(self.base, "docs"))
        if target_partitions is None:
            target_partitions = int(
                self.spark.conf.get("spark.sql.shuffle.partitions")
            )
        # repartition on term: co-locates each term's postings so the
        # finalize's blocks job shuffles less
        compacted = segments.repartition(target_partitions, "term")
        self._refresh(docs, compacted)
        return len(glob.glob(os.path.join(seg_path, "*.parquet")))

    def delete_all(self) -> None:
        """T12: clear everything; next build starts fresh."""
        for sub in ("docs", "segments", "term_stats", "blocks", "_checkpoints"):
            shutil.rmtree(os.path.join(self.base, sub), ignore_errors=True)
        for f in ("stats.json", "metrics.json", "_docs_complete.json"):
            p = os.path.join(self.base, f)
            if os.path.exists(p):
                os.remove(p)
