"""Positional-postings sidecar: term positions per document, for phrase
queries that never rescan document text.

plans/phrase.py's text-scan verify degenerates on stop-word-only phrases
(candidates ~ corpus => the verify scan touches most of the text table).
The classic IR escape hatch — Lucene's .pos file, Indri/Terrier positional
postings — is a per-(term, doc) position list consulted instead of the
text.  This module builds that sidecar as an OPTIONAL, fully separate
table so the core build (operators/index_build.py) is untouched:

    positions(term, doc_id, positions array<int>)  partitioned by the SAME
    doc-range shard as the postings (shard = doc_id * n_shards // n_docs),
    files sorted by term within each shard.

Layout rationale (the postings table's argument, restated):
  * doc-range sharding bounds a stop-word's rows per partition at
    df/n_shards — no skewed task exists for any term;
  * term-sorted files give parquet min/max row-group pruning for the
    phrase's terms: a phrase verify reads ONLY its terms' row groups,
    O(sum df(term)) bytes, independent of corpus text size;
  * positions stay an int array column — parquet's delta/RLE encoding
    compresses sorted in-doc offsets well, and the verify never leaves
    the JVM (explode + one aggregate; plans/phrase.py).

The sidecar records the corpus size it covers; a later index extension
changes reg["n_docs"] and the phrase plan refuses a STALE sidecar loudly.
`extend_positions` catches it up INCREMENTALLY (segment-style, like the
index itself): positions for the uncovered doc range land in a fresh
`positions_{n}` directory and the registry's covered count advances
atomically — never a full rebuild, cost O(delta), resumable through the
same manifest ledger.

Tokenization parity: positions index into spec.tokenize(document_text) for
html corpora and spec.tokenize(text) for pre-extracted ones — the exact
sequence the main index counted tf over, so candidate retrieval (index)
and phrase verify (sidecar) can never disagree on what a token is.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import spec
from ..functions.extract import _decode, document_text
from ..sources.catalog import Catalog
from .index_build import BROADCAST_DOCMAP_MAX, _mrow, filtered_pages

POSITIONS_SCHEMA = "term string, doc_id long, positions array<int>"
POSITIONS_DIR = "positions"

# tokens of a text column as a JVM expression — identical to spec.tokenize
_TOKENS_EXPR = r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"


def positions_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """pages(doc_id, html) -> (term, doc_id, positions) via the parity
    extractor; one fused Python pass (the html path's only non-JVM stage),
    map-side grouped per doc so the emitted rows are vocab-per-doc scale."""
    for pdf in batches:
        terms: list[str] = []
        ids: list[int] = []
        plists: list[list[int]] = []
        for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
            if html is None:
                continue
            by_term: dict[str, list[int]] = {}
            for i, tok in enumerate(spec.tokenize(document_text(_decode(html)))):
                by_term.setdefault(tok, []).append(i)
            for tok, ps in by_term.items():
                terms.append(tok)
                ids.append(doc_id)
                plists.append(ps)
        yield pd.DataFrame({"term": terms, "doc_id": ids, "positions": plists})


def positions_from_pages(pages_with_id: DataFrame) -> DataFrame:
    """html corpora: Python extractor + positional tokenize (Arrow batches)."""
    return pages_with_id.select("doc_id", "html").mapInPandas(
        positions_batch, schema=POSITIONS_SCHEMA
    )


def positions_from_text(pages_with_id: DataFrame) -> DataFrame:
    """Pre-extracted corpora: ZERO Python — posexplode the token array and
    re-group; collect_list carries no order guarantee, so array_sort
    restores the in-doc position order (positions are distinct ints)."""
    ex = pages_with_id.select(
        "doc_id",
        F.posexplode(F.expr(_TOKENS_EXPR)).alias("pos", "tok"),
    )
    return ex.groupBy(F.col("tok").alias("term"), "doc_id").agg(
        F.array_sort(F.collect_list(F.col("pos").cast("int"))).alias("positions")
    )


def _write_positions_dir(
    spark: SparkSession,
    cat: Catalog,
    pages,
    tokenizer: str,
    docmap: DataFrame,
    broadcast_map: bool,
    out_dir: str,
    n_shards: int,
    shard_base: int,
    shard_span: int,
) -> None:
    """Tokenize `pages` joined to `docmap` and write one positions
    directory, doc-range sharded over [shard_base, shard_base+span) with
    term-sorted files.  Shared by the full build and the delta extend."""
    par = spark.sparkContext.defaultParallelism
    # attach the 8-byte doc_id before tokenization (claim-check: the
    # url string never rides the positions stream); broadcast the map
    # when it fits, one shuffle join on url otherwise
    dmj = F.broadcast(docmap) if broadcast_map else docmap
    payload = "html" if tokenizer == "html" else "text"
    pages_with_id = pages.select("url", payload).join(dmj, "url")
    pos = (
        positions_from_pages(pages_with_id)
        if tokenizer == "html"
        else positions_from_text(pages_with_id)
    )
    out = (
        pos.withColumn(
            "shard",
            F.floor(
                (F.col("doc_id") - shard_base) * n_shards / F.lit(shard_span)
            ).cast("int"),
        )
        .repartition(max(1, min(n_shards, par)), "shard")
        .sortWithinPartitions("shard", "term", "doc_id")
    )
    (
        out.write.mode("overwrite")
        .partitionBy("shard")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(cat.path(out_dir))
    )


def _read_pages(spark: SparkSession, pages_path):
    return (
        spark.read.parquet(pages_path)
        if isinstance(pages_path, str)
        else pages_path
    )


def build_positions(
    spark: SparkSession,
    pages_path,
    index_root: str,
    tokenizer: str = "html",
) -> Catalog:
    """Build (or resume) the positional sidecar for an EXISTING index.

    pages_path: the same pages table (path or DataFrame) the index was built
    from — the sidecar re-derives doc_ids from the committed docmap, so it
    never depends on scan order.  Idempotent via the manifest ledger; the
    registry commit (positions_dirs + the corpus size covered) is the
    atomic visibility point, exactly like segments.
    """
    cat = Catalog(index_root)
    reg = cat.read_registry()
    stats = cat.read_stats()
    n_docs, n_shards = int(reg["n_docs"]), int(stats["n_shards"])
    done = cat.completed_partitions()

    if "positions" not in done:
        t0 = time.time()
        pages = filtered_pages(_read_pages(spark, pages_path), tokenizer)
        docmap = cat.read(spark, *reg.get("docmap_dirs", ["docmap"]))
        _write_positions_dir(
            spark, cat, pages, tokenizer, docmap,
            broadcast_map=n_docs <= BROADCAST_DOCMAP_MAX,
            out_dir=POSITIONS_DIR, n_shards=n_shards,
            shard_base=0, shard_span=n_docs,
        )
        cat.append_manifest(
            [_mrow("positions", doc_count=n_docs, build_time_s=time.time() - t0)]
        )

    reg = cat.read_registry()
    reg["positions_dir"] = POSITIONS_DIR  # kept for single-dir readers
    reg["positions_dirs"] = [POSITIONS_DIR]
    reg["positions_n_docs"] = n_docs
    cat.write_registry(reg)
    return cat


def extend_positions(
    spark: SparkSession,
    pages_path,
    index_root: str,
    tokenizer: str = "html",
) -> Catalog:
    """Catch the sidecar up to an EXTENDED index incrementally.

    Positions for the uncovered doc range [covered, n_docs) land in a new
    `positions_{n_docs}` directory (segment-style — the existing dirs are
    never touched), and the registry's covered count advances atomically.
    Cost is O(delta docs): the docmap join filters to the uncovered doc_id
    range, so rows of already-covered docs never tokenize.  The broadcast
    decision keys on the DELTA doc count, not the base corpus size (a
    small delta on a huge base must broadcast; a huge delta on a small
    base must not).

    pages_path: any pages table containing AT LEAST the new docs' rows
    (the full corpus table works too — the inner docmap join drops covered
    urls).  Idempotent: a rerun at the same covered count is a no-op; a
    crashed run resumes through the manifest ledger.
    """
    cat = Catalog(index_root)
    reg = cat.read_registry()
    stats = cat.read_stats()
    n_docs, n_shards = int(reg["n_docs"]), int(stats["n_shards"])
    dirs = reg.get("positions_dirs") or (
        [reg["positions_dir"]] if reg.get("positions_dir") else None
    )
    if not dirs:
        raise ValueError(
            f"index {index_root} has no positional sidecar; run "
            "build_positions first (extend_positions only appends)"
        )
    covered = int(reg.get("positions_n_docs", -1))
    if covered == n_docs:
        return cat  # already fresh
    if covered > n_docs or covered < 0:
        raise ValueError(
            f"sidecar covers {covered} docs but the index has {n_docs}; "
            "rebuild it (build_positions)"
        )

    n_delta = n_docs - covered
    out_dir = f"{POSITIONS_DIR}_{n_docs}"
    part = f"positions:{n_docs}"
    if part not in cat.completed_partitions():
        t0 = time.time()
        pages = filtered_pages(_read_pages(spark, pages_path), tokenizer)
        docmap = cat.read(spark, *reg.get("docmap_dirs", ["docmap"])).filter(
            F.col("doc_id") >= covered
        )
        _write_positions_dir(
            spark, cat, pages, tokenizer, docmap,
            broadcast_map=n_delta <= BROADCAST_DOCMAP_MAX,
            out_dir=out_dir, n_shards=n_shards,
            shard_base=covered, shard_span=n_delta,
        )
        cat.append_manifest(
            [_mrow(part, doc_count=n_delta, build_time_s=time.time() - t0)]
        )

    reg = cat.read_registry()
    new_dirs = dirs + ([out_dir] if out_dir not in dirs else [])
    reg["positions_dirs"] = new_dirs
    reg["positions_dir"] = new_dirs[0]
    reg["positions_n_docs"] = n_docs
    cat.write_registry(reg)
    return cat


def read_positions(
    spark: SparkSession, index_root: str, terms: list[str]
) -> DataFrame:
    """(term, doc_id, positions) rows for the given terms, term-isin pushed
    to the parquet scan (row-group pruned: the files are term-sorted).
    Reads the union of all sidecar directories (base + extension deltas).
    Raises if the sidecar is absent or STALE (index extended past the
    covered count — run extend_positions to catch it up)."""
    cat = Catalog(index_root)
    reg = cat.read_registry()
    dirs = reg.get("positions_dirs") or (
        [reg["positions_dir"]] if reg.get("positions_dir") else None
    )
    if not dirs:
        raise ValueError(
            f"index {index_root} has no positional sidecar; run "
            "build_positions (jobs/build_index.py --positions) first"
        )
    if int(reg.get("positions_n_docs", -1)) != int(reg["n_docs"]):
        raise ValueError(
            f"positional sidecar is stale: covers "
            f"{reg.get('positions_n_docs')} docs, index now has "
            f"{reg['n_docs']} — run extend_positions (or build_positions) "
            "after extending"
        )
    # one reader per sidecar directory (a multi-root read trips partition
    # discovery: each root carries its own shard= dirs), unioned — each
    # scan keeps its own term-isin row-group pruning
    parts = [
        spark.read.parquet(cat.path(d)).filter(F.col("term").isin(terms))
        for d in dirs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
