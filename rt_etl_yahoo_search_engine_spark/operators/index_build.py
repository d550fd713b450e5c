"""Inverted-index build pipeline (batch, resumable, skew-aware).

Dataflow (SURVEY.md §3.4), all stages declarative DataFrame ops except the
two Arrow-batched Python stages (extraction+tokenization, block encoding):

  pages (url, warc_ts, html, text, lang)          [input table, input_hint]
    -> filter lang='en' AND html IS NOT NULL       [pushed to parquet scan]
    -> mapInPandas extract+tokenize+local-tf-agg  -> tokens(url, term, tf)
       (ONE fused Python pass; map-side partial aggregation: tf is counted
        per document inside the Arrow batch, so the shuffle payload is
        (url, term, tf) — never raw html/text.  This is the reference's
        claim-check rule re-expressed: ship metadata, not payload;
        ref: src/yahoo_search_process.py:30-33)
    -> docmap: deterministic dense doc_id by url sort (range-partitioned
       sort + zipWithIndex — the one RDD usage in the repo: a two-pass
       narrow op, no extra shuffle, scales to any partition count)
    -> posting rows (term, doc_id, tf, doc_len) via shuffle join on url
    -> doc-range sharding: shard = doc_id * n_shards // n_docs.
       EVERY term is split across the same contiguous doc_id ranges, which
       (a) distributes head-term (stop-word) posting lists across the
           cluster — explicit skew handling per north_rule: the hottest
           term's reducer work is bounded by df/n_shards, no single task
           ever owns a full stop-word list;
       (b) preserves global doc_id order across shards (ranges are
           contiguous and disjoint), so per-shard blocks concatenate into a
           valid ordered posting list; and
       (c) makes query-time top-k embarrassingly parallel per shard —
           each shard holds COMPLETE postings of every term for its doc
           range (a document-sharded index, the classic distributed-search
           layout), so block-max WAND runs per shard with a bounded heap
           and only k rows per (query, shard) ever reach the merge.
    -> groupBy(term, shard).applyInPandas block encoder:
       sort by doc_id, cut into BLOCK_SIZE blocks, delta-gap + varbyte
       doc_ids / tfs / doc_lens, per-block first/last/max_tf and the exact
       idf-free max score part (max over docs of tf*(k1+1)/(tf+k1*(1-b+
       b*dl/avgdl))).  The query side multiplies the lexicon idf in with
       the same float op order, so idf * block_max_part is an EXACT float
       upper bound of any contained doc's term score (monotone positive
       multiply) — the property block-max WAND's rank-identity rests on —
       without paying a blocks x lexicon join at build time.
    -> write postings partitioned by term-hash bucket (partition pruning at
       query time), rows sorted by term within files (row-group pruning).

Resumability (north_rule): every stage and every bucket-batch commits an
append-only manifest row through sources.catalog.Catalog; a rerun skips
partitions whose LATEST manifest row is COMPLETED — the reference's
point-in-time jobs-ledger recovery pattern
(ref: database/tables.py:93-107, src/services/daos/status_dao.py:36-50).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import spec
from ..functions.extract import _decode, document_text
from ..sources.catalog import Catalog
from .codec import encode_varbyte

TOKENS_SCHEMA = "url string, term string, tf int, doc_len int"
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("doc_count", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("block_max_part", T.DoubleType(), False),  # idf-free
        T.StructField("doc_ids_vb", T.BinaryType(), False),
        T.StructField("tfs_vb", T.BinaryType(), False),
        T.StructField("doc_lens_vb", T.BinaryType(), False),
    ]
)


# --- stage 1: fused extract + tokenize + per-doc tf (Arrow batches) ----------


def tokenize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """pages(url, html) -> (url, term, tf, doc_len).

    Map-side partial agg per doc; doc_len rides along on every posting row
    (it is known the moment the doc is tokenized), so NO doc-length
    groupBy/join shuffle ever happens downstream.  One sentinel row per doc
    (term NULL, tf 0) carries doc_len for the docmap — including 0-token
    docs."""
    for pdf in batches:
        urls: list[str] = []
        terms: list[str | None] = []
        tfs: list[int] = []
        dls: list[int] = []
        for url, html in zip(pdf["url"], pdf["html"]):
            if html is None:
                continue
            text = document_text(_decode(html))
            counts: dict[str, int] = {}
            n = 0
            for tok in spec.tokenize(text):
                counts[tok] = counts.get(tok, 0) + 1
                n += 1
            urls.extend([url] * (len(counts) + 1))
            terms.extend(counts.keys())
            terms.append(None)  # sentinel: doc exists, carries doc_len
            tfs.extend(counts.values())
            tfs.append(0)
            dls.extend([n] * (len(counts) + 1))
        yield pd.DataFrame(
            {
                "url": urls,
                "term": terms,
                "tf": pd.array(tfs, dtype="int32"),
                "doc_len": pd.array(dls, dtype="int32"),
            }
        )


def filtered_pages(pages: DataFrame, tokenizer: str) -> DataFrame:
    """The indexed slice: lang='en' with a non-null payload column."""
    payload = "html" if tokenizer == "html" else "text"
    return pages.filter((F.col("lang") == "en") & F.col(payload).isNotNull())


def tokens_from_pages(pages: DataFrame) -> DataFrame:
    """pages already filtered via filtered_pages."""
    return pages.select("url", "html").mapInPandas(tokenize_batch, schema=TOKENS_SCHEMA)


def tokens_from_text(pages: DataFrame) -> DataFrame:
    """Alternative JVM-only tokenizer for tables that already carry extracted
    text (e.g. the driver's `documents` table): no Python at all — tokenize
    with built-in regexp_extract_all + explode, whole-stage codegen'd.
    Same output contract as tokenize_batch (doc_len per row + sentinel)."""
    toks = pages.select(
        "url", F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks")
    )
    tf = (
        toks.select("url", F.size("toks").alias("doc_len"), F.explode("toks").alias("term"))
        .groupBy("url", "doc_len", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("url", "term", "tf", "doc_len")
    )
    sentinels = toks.select(
        "url",
        F.lit(None).cast("string").alias("term"),
        F.lit(0).cast("int").alias("tf"),
        F.size("toks").alias("doc_len"),
    )
    return tf.unionByName(sentinels)


# --- stage 2: docmap ----------------------------------------------------------


def build_docmap(pages: DataFrame, tokens: DataFrame, num_partitions: int) -> DataFrame:
    """(doc_id, url, doc_len); doc_id = dense rank by url (deterministic).

    Scalable zipWithIndex without leaving the JVM: range-partition by url,
    count rows per partition (one cheap job), then doc_id = partition offset
    + within-partition row_number.  The window partitions by the physical
    partition id, so no single-partition global sort ever materializes; the
    resulting ids are the global url rank regardless of how the range
    boundaries fell.  doc_len = sum(tf) (total token count), 0 for docs with
    no extracted text.
    """
    from pyspark.sql import Window

    urls = (
        pages.select("url")
        .repartitionByRange(num_partitions, "url")
        .withColumn("pid", F.spark_partition_id())
    )
    # Pin pid assignment: the offsets collected below and the window job must
    # see the SAME physical partitioning (range sampling is not replayed).
    # The caller must materialize the result before this cache is evicted;
    # build_index writes the docmap table immediately and then unpersists.
    urls.persist()
    counts = {r["pid"]: r["cnt"] for r in
              urls.groupBy("pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    w = Window.partitionBy("pid").orderBy("url")
    docmap = urls.select(
        (F.row_number().over(w) - 1 + offset_map[F.col("pid")]).alias("doc_id"),
        "url",
    )
    # doc lengths come from the per-doc sentinel rows the tokenizer emitted —
    # an n_docs-sized join, never an n_postings-sized shuffle
    doc_lens = tokens.filter(F.col("term").isNull()).select("url", "doc_len")
    out = (
        docmap.join(doc_lens, "url", "left")
        .select("doc_id", "url", F.coalesce("doc_len", F.lit(0)).alias("doc_len"))
    )
    out._graft_cached_urls = urls  # handle for the caller to unpersist
    return out


# --- stage 4: block encoder -----------------------------------------------------


def _vb_lens(v: "np.ndarray") -> "np.ndarray":
    """Varbyte byte-length per value (vectorized)."""
    lens = np.ones(v.size, dtype=np.int64)
    tmp = v >> 7
    while (tmp > 0).any():
        lens += tmp > 0
        tmp >>= 7
    return lens


def _encode_sorted_frame(pdf: pd.DataFrame, avgdl: float, block_size: int) -> pd.DataFrame:
    """Encode a frame of posting rows ALREADY sorted by (term, shard, doc_id)
    into block rows.  Fully vectorized: group/block boundaries, per-block
    aggregates (reduceat), and varbyte payloads are all computed over the
    whole frame at once; the only Python loop is the final per-block byte
    slicing."""
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in BLOCKS_SCHEMA.fields}
        )
    k1, b = spec.K1, spec.B
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy()
    tfs = pdf["tf"].to_numpy().astype(np.int64)
    dls = pdf["doc_len"].to_numpy().astype(np.int64)

    pos = np.arange(n)
    group_start = np.ones(n, dtype=bool)
    group_start[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
    first_pos = np.maximum.accumulate(np.where(group_start, pos, 0))
    idx_in_group = pos - first_pos
    block_start = group_start | (idx_in_group % block_size == 0)
    starts = np.flatnonzero(block_start)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:] - 1
    ends[-1] = n - 1

    # exact idf-free score part per posting (same op order as query side)
    parts = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    max_tf = np.maximum.reduceat(tfs, starts)
    max_part = np.maximum.reduceat(parts, starts)

    # delta-gap doc_ids with a reset at every block start; one varbyte pass
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[starts] = doc_ids[starts]
    ids_bytes = encode_varbyte(gaps)
    tfs_bytes = encode_varbyte(tfs)
    dls_bytes = encode_varbyte(dls)
    ids_off = np.zeros(n + 1, dtype=np.int64)
    ids_off[1:] = np.cumsum(_vb_lens(gaps))
    tfs_off = np.zeros(n + 1, dtype=np.int64)
    tfs_off[1:] = np.cumsum(_vb_lens(tfs))
    dls_off = np.zeros(n + 1, dtype=np.int64)
    dls_off[1:] = np.cumsum(_vb_lens(dls))

    ids_mv, tfs_mv, dls_mv = memoryview(ids_bytes), memoryview(tfs_bytes), memoryview(dls_bytes)
    return pd.DataFrame(
        {
            "term": terms[starts],
            "shard": shards[starts].astype("int32"),
            "block_id": (idx_in_group[starts] // block_size).astype("int32"),
            "doc_count": (ends - starts + 1).astype("int32"),
            "first_doc_id": doc_ids[starts],
            "last_doc_id": doc_ids[ends],
            "max_tf": max_tf.astype("int32"),
            "block_max_part": max_part,
            "doc_ids_vb": [
                bytes(ids_mv[ids_off[s] : ids_off[e + 1]])
                for s, e in zip(starts, ends)
            ],
            "tfs_vb": [
                bytes(tfs_mv[tfs_off[s] : tfs_off[e + 1]])
                for s, e in zip(starts, ends)
            ],
            "doc_lens_vb": [
                bytes(dls_mv[dls_off[s] : dls_off[e + 1]])
                for s, e in zip(starts, ends)
            ],
        }
    )


def make_block_encoder(avgdl: float, block_size: int = spec.BLOCK_SIZE):
    """mapInPandas encoder over a partition repartitioned by (term, shard)
    and sorted by (term, shard, doc_id).

    Arrow hands the partition over as a stream of batches that can SPLIT a
    (term, shard) group; rows of the last (possibly incomplete) group are
    carried into the next batch so every group is encoded exactly once with
    correct block alignment."""

    def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if pdf.empty:
                carry = None
                continue
            terms = pdf["term"].to_numpy()
            shards = pdf["shard"].to_numpy()
            changed = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
            )
            if changed.size == 0:
                carry = pdf  # whole batch is one (possibly continuing) group
                continue
            cut = int(changed[-1]) + 1  # first row of the final group
            yield _encode_sorted_frame(pdf.iloc[:cut], avgdl, block_size)
            carry = pdf.iloc[cut:]
        if carry is not None and len(carry):
            yield _encode_sorted_frame(carry, avgdl, block_size)

    return encode_partition


# --- full build ------------------------------------------------------------------


def build_index(
    spark: SparkSession,
    pages_path,
    index_root: str,
    n_shards: int = 8,
    n_buckets: int = 16,
    bucket_batch: int | None = None,
    tokenizer: str = "html",
    fail_after_buckets: int | None = None,
) -> Catalog:
    """Build (or resume) the full index under index_root.

    pages_path: parquet path OR a DataFrame with (url, html|text, lang).
    tokenizer: "html" runs the reference-parity extractor on the html column;
    "text" tokenizes a pre-extracted text column JVM-side.
    fail_after_buckets: test hook — raise after N bucket batches to exercise
    resume-from-manifest.
    """
    cat = Catalog(index_root)
    done = cat.completed_partitions()
    par = spark.sparkContext.defaultParallelism

    raw = spark.read.parquet(pages_path) if isinstance(pages_path, str) else pages_path
    pages = filtered_pages(raw, tokenizer)

    # -- tokens ------------------------------------------------------------
    if "tokens" not in done:
        t0 = time.time()
        tok = tokens_from_pages(pages) if tokenizer == "html" else tokens_from_text(pages)
        cat.write(tok, "tokens")
        cat.append_manifest(
            [_mrow("tokens", build_time_s=time.time() - t0)]
        )
    tokens = cat.read(spark, "tokens")

    # -- docmap -------------------------------------------------------------
    if "docmap" not in done:
        t0 = time.time()
        dm = build_docmap(pages, tokens, par)
        cat.write(dm, "docmap")
        dm._graft_cached_urls.unpersist(blocking=False)
        cat.append_manifest([_mrow("docmap", build_time_s=time.time() - t0)])
    docmap = cat.read(spark, "docmap")

    # -- stats ----------------------------------------------------------------
    if "stats" not in done:
        t0 = time.time()
        agg = docmap.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
        ).collect()[0]
        cat.write_stats(
            {
                "n_docs": int(agg["n"]),
                "avgdl": float(agg["avgdl"]),
                "k1": spec.K1,
                "b": spec.B,
                "block_size": spec.BLOCK_SIZE,
                "n_shards": n_shards,
                "n_buckets": n_buckets,
            }
        )
        cat.append_manifest([_mrow("stats", build_time_s=time.time() - t0)])
    stats = cat.read_stats()
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    n_shards, n_buckets = stats["n_shards"], stats["n_buckets"]

    # -- posting rows staged by bucket -----------------------------------------
    if "posting_rows" not in done:
        t0 = time.time()
        # doc_id attachment: broadcast the (doc_id, url) map when it fits
        # (sandbox scale); at 10^12 docs this becomes the one big shuffle
        # join on url — doc_len already rides on the token rows either way.
        dm = docmap.select("doc_id", "url")
        if n_docs <= 20_000_000:
            dm = F.broadcast(dm)
        rows = (
            tokens.filter(F.col("term").isNotNull())
            .join(dm, "url")
            .select(
                "term",
                "doc_id",
                "tf",
                "doc_len",
                F.floor(F.col("doc_id") * n_shards / F.lit(n_docs))
                .cast("int")
                .alias("shard"),
                F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("bucket"),
            )
        )
        cat.write(rows, "posting_rows", partition_by=["bucket"])
        cat.append_manifest([_mrow("posting_rows", build_time_s=time.time() - t0)])
    posting_rows = cat.read(spark, "posting_rows")

    # -- per-bucket block encode (the resumable unit) ----------------------------
    encoder = make_block_encoder(avgdl)
    batch = bucket_batch or n_buckets
    batches_done = 0
    all_buckets = list(range(n_buckets))
    for start in range(0, n_buckets, batch):
        group = all_buckets[start : start + batch]
        pending = [b for b in group if f"bucket:{b}" not in done]
        if not pending:
            continue
        if fail_after_buckets is not None and batches_done >= fail_after_buckets:
            raise RuntimeError(f"injected failure after {batches_done} bucket batches")
        t0 = time.time()
        blocks = (
            posting_rows.filter(F.col("bucket").isin(pending))  # partition-pruned scan
            .repartition(max(par, len(pending)), "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .mapInPandas(encoder, schema=BLOCKS_SCHEMA)
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
            )
            # consolidate: one file per bucket per batch (the blocks table is
            # ~block_size x smaller than the postings), term-sorted within
            # files so query-time isin predicates prune row groups
            .repartition(max(1, len(pending)), "bucket")
            .sortWithinPartitions("term", "shard", "block_id")
        )
        # block_max_part is idf-FREE; the query side multiplies the lexicon
        # idf in (same float op order), so no blocks x lexicon join is paid
        # here and the WAND bound stays an exact float upper bound.
        blocks.persist()
        try:
            blocks.write.mode("append").partitionBy("bucket").parquet(cat.path("postings"))
            metrics = (
                blocks.groupBy("bucket")
                .agg(
                    F.min("term").alias("tmin"),
                    F.max("term").alias("tmax"),
                    F.sum("doc_count").alias("doc_count"),
                    F.sum(
                        F.octet_length("doc_ids_vb")
                        + F.octet_length("tfs_vb")
                        + F.octet_length("doc_lens_vb")
                    ).alias("bytes"),
                )
                .collect()
            )
        finally:
            blocks.unpersist()
        dt = time.time() - t0
        by_bucket = {int(r["bucket"]): r for r in metrics}
        cat.append_manifest(
            [
                _mrow(
                    f"bucket:{b}",
                    term_range=(
                        f"{by_bucket[b]['tmin']}..{by_bucket[b]['tmax']}"
                        if b in by_bucket
                        else ""
                    ),
                    doc_count=int(by_bucket[b]["doc_count"]) if b in by_bucket else 0,
                    bytes=int(by_bucket[b]["bytes"]) if b in by_bucket else 0,
                    build_time_s=dt / max(1, len(pending)),
                )
                for b in pending
            ]
        )
        batches_done += 1

    # -- lexicon: df/cf/idf from posting rows + n_blocks from blocks, one job ----
    if "lexicon" not in done:
        t0 = time.time()
        lex = (
            posting_rows.groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .withColumn(
                "idf",  # Robertson idf, same formula as spec.idf
                F.log(
                    (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                ),
            )
        )
        nb = (
            cat.read(spark, "postings")
            .groupBy("term")
            .agg(F.count("*").cast("int").alias("n_blocks"))
        )
        cat.write(
            lex.join(nb, "term").select("term", "df", "cf", "n_blocks", "idf"),
            "lexicon",
        )
        cat.append_manifest([_mrow("lexicon", build_time_s=time.time() - t0)])

    return cat


def _mrow(partition_id: str, **kw) -> dict:
    row = {
        "partition_id": partition_id,
        "term_range": kw.get("term_range", ""),
        "doc_count": kw.get("doc_count", 0),
        "bytes": kw.get("bytes", 0),
        "build_time_s": kw.get("build_time_s", 0.0),
        "status": kw.get("status", "COMPLETED"),
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
    }
    return row
