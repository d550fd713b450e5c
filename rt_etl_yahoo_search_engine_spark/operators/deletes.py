"""Document deletion: tombstone sidecar + query-time masking + physical
reclaim at compaction — the Lucene live-docs lifecycle, Spark-first.

The reference system has no deletes (its Postgres store only appends —
ref src/services/daos/raw_search_results_dao.py); a production index
cannot live without them, so this module completes the CRUD story that
streaming ingest (extend_index) started:

  * ``delete_docs`` resolves urls -> index doc ids against the docmap
    (scan-side join, nothing collected), writes them as a doc-id-SORTED,
    range-partitioned parquet dir, and commits it into the registry
    (``deleted_dirs`` list, version bump — same atomic-rename commit as
    extensions).  Deleting is metadata-scale: postings are untouched.
  * query paths mask tombstoned docs BEFORE top-k selection (the kth
    surviving result is exact, same contract as minus-terms): each
    scan-side unit reads only ITS doc range of the tombstone table
    (doc_id min/max row-group pruning against the sorted files), so the
    mask is unit-local — never broadcast corpus-wide, never shuffled.
    The serving path loads the deleted set once per searcher process
    (the live-docs bitmap a Lucene searcher keeps in RAM).
  * BM25 statistics (N, avgdl, df/idf) intentionally DO NOT change on
    delete — exactly Lucene's semantics: deleted docs stop appearing but
    keep counting until a merge.  This is also what makes the semantics
    SQL-expressible for the oracle gate: score with full-corpus stats,
    remove the deleted set, then rank.
  * ``compact_index`` physically reclaims: posting rows, docmap rows and
    staged token rows of deleted docs are dropped, stats are recomputed
    over the live corpus, and the registry's deleted list resets — after
    which queries equal a FRESH build over the live documents.  Doc ids
    are NOT renumbered (the id space keeps its holes): ids are referenced
    by sidecars, caches and external systems, and ``reg["n_docs"]`` stays
    the id high-water mark so later extensions never reuse an id.

At 10^12 docs the tombstone table is <=8 bytes per deleted doc — docmap
scale, orders below the postings — and each query unit touches only the
row groups covering its own doc range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Catalog


def delete_docs(
    spark: SparkSession,
    index_root: str,
    urls: DataFrame | list[str] | None = None,
    doc_ids: DataFrame | list[int] | None = None,
) -> int:
    """Tombstone documents by url or by index doc id; returns the total
    number of distinct deleted docs now in force (``n_deleted``).

    urls: a list, or a DataFrame with a ``url`` column; unknown urls are
    ignored (relational join semantics — deleting an absent doc is a
    no-op, which also makes replayed deletes idempotent).  doc_ids: a
    list, or a DataFrame with a ``doc_id`` column.  Exactly one of the
    two must be given.
    """
    if (urls is None) == (doc_ids is None):
        raise ValueError("give exactly one of urls= or doc_ids=")
    cat = Catalog(index_root)
    reg = cat.read_registry()
    if doc_ids is not None:
        ids = (
            spark.createDataFrame(
                [(int(i),) for i in doc_ids], "doc_id long"
            )
            if isinstance(doc_ids, list)
            else doc_ids.select(F.col("doc_id").cast("long"))
        )
        # only ids that exist can be tombstoned: an out-of-range id would
        # sit in the sidecar forever (never matched, never purged)
        docmap = cat.read(spark, *reg.get("docmap_dirs", ["docmap"]))
        ids = ids.join(docmap.select("doc_id"), "doc_id", "left_semi")
    else:
        u = (
            spark.createDataFrame([(x,) for x in urls], "url string")
            if isinstance(urls, list)
            else urls.select("url")
        )
        docmap = cat.read(spark, *reg.get("docmap_dirs", ["docmap"]))
        # urls-to-delete is the (typically) small side; semi join keeps
        # the docmap scan one-pass and nothing is collected
        ids = docmap.join(u, "url", "left_semi").select("doc_id")

    ids = ids.distinct()
    already = deleted_ids_df(spark, cat, reg)
    if already is not None:
        # replaying a delete must be a TRUE no-op (no version burn, no
        # redundant sidecar dir): only ids not yet tombstoned count
        ids = ids.join(already, "doc_id", "left_anti")
    if not ids.count():
        # nothing new resolved (unknown urls/ids or already tombstoned):
        # no tombstone dir, no version bump — an empty dir would break
        # later sidecar reads
        return int(reg.get("n_deleted", 0))
    ver = reg["version"] + 1
    dirname = f"deleted_v{ver}"
    # doc-id-sorted, range-partitioned files: a query unit's tombstone
    # read prunes to its own doc range via parquet min/max stats
    n_files = max(1, min(32, spark.sparkContext.defaultParallelism))
    cat.write(
        ids.repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id"),
        dirname,
    )
    dirs = reg.get("deleted_dirs", []) + [dirname]
    # exact distinct count across all tombstone dirs (overlapping deletes
    # collapse); one narrow-column scan of a metadata-scale table
    n_deleted = cat.read(spark, *dirs).select("doc_id").distinct().count()
    cat.write_registry(
        {**reg, "version": ver, "deleted_dirs": dirs, "n_deleted": n_deleted}
    )
    return n_deleted


def delete_by_query(
    spark: SparkSession,
    index_root: str,
    query: str,
    mode: str | None = None,
) -> int:
    """Tombstone every document matching a search — Lucene's
    deleteByQuery, the bulk-curation primitive (purge a spam term, a
    leaked token, a recalled source).  Returns the number of docs newly
    tombstoned by this call.

    The match set comes from ``plans.stats.match_docs`` (the exact FULL
    match relation, computed unit-locally — already masked by earlier
    tombstones, so repeating a delete_by_query is a no-op), then rides
    the ordinary ``delete_docs`` commit.  Statistics stay frozen until
    compaction, like every other delete.  mode defaults to conjunctive —
    "delete docs containing ALL these terms" is the curation intent;
    pass spec.MODE_DISJUNCTIVE for "ANY of these terms".
    """
    from .. import spec as _spec
    from ..plans.stats import match_docs

    cat = Catalog(index_root)
    n0 = int(cat.read_registry().get("n_deleted", 0))
    ids = match_docs(
        spark,
        index_root,
        {"q": query},
        mode=mode or _spec.MODE_CONJUNCTIVE,
    ).select("doc_id")
    return delete_docs(spark, index_root, doc_ids=ids) - n0


def update_docs(
    spark: SparkSession,
    index_root: str,
    pages,
    tokenizer: str = "html",
    url_ordered: bool = False,
    source_id: str | None = None,
) -> int:
    """Upsert: re-index documents by url.  The batch's pages are appended
    as a fresh segment (``extend_index`` — new doc ids, rank-exact), then
    every PRE-EXISTING doc whose url appears in the batch is tombstoned,
    so queries see exactly the newest version of each url from then on.
    Returns the number of stale docs tombstoned BY THIS CALL (0 = the
    batch was pure inserts, or a replay whose tombstones already exist).  The reference's model is literally "an update is an insert"
    into an append-only PIT ledger with latest-wins reads (ref
    src/models/dto_data_classes/status_dto.py:10-15,
    src/services/daos/status_dao.py) — this is that contract at index
    granularity: append-only segments, latest version wins, history
    reclaimed at compaction.

    pages: parquet path or DataFrame, same shape as build/extend input.
    The batch is the new TRUTH for its urls: a url whose new content
    extracts to nothing (filtered out by the tokenizer gates) still gets
    its old versions tombstoned.  Urls should be unique within a batch
    (duplicates would all be appended, all visible).

    Crash safety: append commits BEFORE tombstone, so a failure between
    the two leaves BOTH versions searchable (at-least-once — never
    document loss) and a rerun completes the tombstone idempotently
    (``delete_docs`` replays are no-ops).  Pass ``source_id`` (as for
    ``extend_index``) to make the whole operation exactly-once on replay:
    the append leg no-ops on a seen source_id and the delete leg resolves
    to already-tombstoned ids.
    """
    from .index_build import extend_index

    cat = Catalog(index_root)
    reg0 = cat.read_registry()
    if source_id is not None and reg0.get("last_source_id") == source_id:
        # replay: the append already committed, so the pre-append floor is
        # n_docs minus the LAST segment's size when that segment is this
        # batch's.  When it is not (the replayed batch extracted to zero
        # docs), this floor is merely too LOW — which only shrinks the
        # stale set toward ids the first run already tombstoned (the
        # delete leg no-ops on those) — never too high, so a replay can
        # never tombstone the batch's own new versions.
        segs = reg0["segments"]
        seg_src = (segs[-1] or {}).get("source") if segs else None
        start = int(reg0["n_docs"]) - int((seg_src or {}).get("n_docs") or 0)
    else:
        # every doc id that exists BEFORE the append is a stale candidate
        # (ids are monotone across segments, never reused)
        start = int(reg0["n_docs"])
    extend_index(
        spark,
        pages,
        index_root,
        tokenizer=tokenizer,
        url_ordered=url_ordered,
        source_id=source_id,
    )
    reg = cat.read_registry()
    raw = spark.read.parquet(pages) if isinstance(pages, str) else pages
    urls = raw.select("url").distinct()
    docmap = cat.read(spark, *reg.get("docmap_dirs", ["docmap"]))
    stale = (
        docmap.join(urls, "url", "left_semi")
        .filter(F.col("doc_id") < start)
        .select("doc_id")
    )
    n_del0 = int(reg.get("n_deleted", 0))
    return delete_docs(spark, index_root, doc_ids=stale) - n_del0


def deleted_dir_paths(cat: Catalog, reg: dict) -> list[str]:
    """Filesystem paths of the live tombstone dirs ([] if none)."""
    return [cat.path(d) for d in reg.get("deleted_dirs", [])]


def read_deleted_ids(paths: list[str], lo: int | None = None,
                     hi: int | None = None):
    """Sorted unique deleted doc ids within [lo, hi] as an int64 numpy
    array (empty array when there are no tombstones).  Runs inside scan
    tasks and in the searcher process — pyarrow only, no Spark.  The
    range filter is pushed to parquet row-group stats, so a unit reads
    only its own doc range of the sidecar."""
    import numpy as np
    import pyarrow.dataset as ds

    if not paths:
        return np.empty(0, dtype=np.int64)
    flt = None
    if lo is not None:
        flt = ds.field("doc_id") >= lo
    if hi is not None:
        f2 = ds.field("doc_id") <= hi
        flt = f2 if flt is None else (flt & f2)
    # one dataset per dir (pyarrow accepts only file paths in a list)
    arrs = []
    for p in paths:
        tbl = ds.dataset(p).to_table(columns=["doc_id"], filter=flt)
        if tbl.num_rows:
            arrs.append(tbl.column("doc_id").to_numpy(zero_copy_only=False))
    if not arrs:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(arrs))


def deleted_ids_df(spark: SparkSession, cat: Catalog, reg: dict) -> DataFrame | None:
    """All tombstoned doc ids as a (doc_id) DataFrame, or None if there
    are no tombstones — for relational anti-joins (oracle path, purge)."""
    dirs = reg.get("deleted_dirs", [])
    if not dirs:
        return None
    return cat.read(spark, *dirs).select("doc_id").distinct()
