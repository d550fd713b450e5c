"""Webtext hygiene operators for large-scale training-data pipelines.

Three pre-training data-prep passes the reference engine's corpus would go
through before indexing/training, each expressed JVM-side (built-in
pyspark.sql.functions only — no Python UDFs) so whole-stage codegen applies
and the ops scale linearly to 100 TB:

* ``pii_stats``        — PII detection + redaction (emails / NANP phone
                         numbers / IPv4 addresses), the C4/CCNet scrub pass.
* ``repetition_stats`` — Gopher-style repetition & shape signals (Rae et
                         al. 2021 §A1.1): distinct-token ratio, top-bigram
                         fraction, mean word length, symbol-to-word ratio.
                         The top-bigram count is computed WITHOUT a shuffle:
                         sort the bigram array and take the longest equal
                         run via ``aggregate`` — pure codegen per row.
* ``chunk_dedup``      — cross-document duplicate-span accounting (CCNet
                         paragraph dedup, adapted to word n-gram chunks):
                         non-overlapping 10-token chunks are hashed and
                         counted corpus-wide; a doc's ``dup_chunk_frac`` is
                         the fraction of its chunks seen in ≥ ``min_docs``
                         distinct documents.  Two linear shuffles (chunk
                         df, then doc re-agg) — no all-pairs stage.

Input contract: a DataFrame with (doc_id: long, text: string).  Every
operator has a value-checked DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Same tokenizer as the index / text_analysis (spec.TOKEN_RE)
TOKENS_EXPR = r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

# RE2-compatible (DuckDB) AND java.util.regex-compatible patterns — no
# lookaround, no backrefs, so both engines match the same spans.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

CHUNK_TOKENS = 10  # non-overlapping span width for chunk_dedup


def pii_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4, redacted_fp).

    Counts are over the ORIGINAL text; ``redacted_fp`` is md5 of the text
    after replacing, in order, emails → phones → IPv4 with typed tags.
    Scan-local (one projection, no shuffle, no UDF)."""
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IPV4_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(IPV4_RE), 0))
        .cast("long")
        .alias("n_ipv4"),
        F.md5(F.encode(red, "UTF-8")).alias("redacted_fp"),
    )


# Longest equal run in a SORTED string array == max multiplicity — a pure
# codegen fold, so the per-doc "most repeated bigram" needs no explode/shuffle.
_MAX_RUN_EXPR = """
aggregate(
  sort_array({arr}),
  named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
  (acc, x) -> named_struct(
    'prev', x,
    'run',  CASE WHEN acc.prev IS NOT NULL AND x = acc.prev
                 THEN acc.run + 1L ELSE 1L END,
    'best', greatest(acc.best,
                     CASE WHEN acc.prev IS NOT NULL AND x = acc.prev
                          THEN acc.run + 1L ELSE 1L END)),
  acc -> acc.best)
"""

_BIGRAMS_EXPR = """
CASE WHEN size(tokens) < 2 THEN array()
     ELSE transform(sequence(1, size(tokens) - 1),
                    i -> concat(element_at(tokens, i), ' ',
                                element_at(tokens, i + 1)))
END
"""


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher repetition/shape signals per doc:
    (doc_id, n_tokens, distinct_token_ratio, top_bigram_count,
     top_bigram_frac, mean_word_len, symbol_word_ratio)."""
    d = docs.select(
        "doc_id", "text", F.expr(TOKENS_EXPR).alias("tokens")
    ).withColumn("bigrams", F.expr(_BIGRAMS_EXPR))
    n = F.greatest(F.size("tokens"), F.lit(1))
    nbg = F.greatest(F.size("bigrams"), F.lit(1))
    top = F.expr(_MAX_RUN_EXPR.format(arr="bigrams"))
    return d.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        (F.size(F.array_distinct("tokens")) / n).alias("distinct_token_ratio"),
        top.alias("top_bigram_count"),
        (top / nbg).alias("top_bigram_frac"),
        (
            F.expr("aggregate(tokens, 0L, (a, x) -> a + length(x))") / n
        ).alias("mean_word_len"),
        (
            F.size(F.regexp_extract_all("text", F.lit(r"#|\.\.\."), 0)) / n
        ).alias("symbol_word_ratio"),
    )


def _chunks(docs: DataFrame, width: int) -> DataFrame:
    """Explode non-overlapping ``width``-token chunks: (doc_id, chunk)."""
    expr = (
        f"transform(sequence(1, greatest(size(tokens), 1), {width}),"
        f" i -> concat_ws(' ', slice(tokens, i, {width})))"
    )
    return (
        docs.select("doc_id", F.expr(TOKENS_EXPR).alias("tokens"))
        .select("doc_id", F.explode(F.expr(expr)).alias("chunk"))
        .filter(F.col("chunk") != "")
    )


def chunk_dedup(
    docs: DataFrame, min_docs: int = 2, width: int = CHUNK_TOKENS
) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks, dup_chunk_frac): per-doc share of
    word-chunk spans that occur in ≥ ``min_docs`` DISTINCT documents.

    Plan shape (scale-linear): explode chunks → md5 → distinct(doc, hash)
    → groupBy(hash) for document-frequency (partial-agg combines map-side)
    → broadcast-or-shuffle join back on hash → groupBy(doc_id).  No
    all-pairs joins; skew is bounded because chunk hashes are uniform."""
    ch = _chunks(docs, width).select(
        "doc_id", F.md5(F.encode("chunk", "UTF-8")).alias("h")
    )
    dfreq = (
        ch.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("chunk_df"))
    )
    return (
        ch.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(F.col("chunk_df") >= min_docs, 1).otherwise(0)
            ).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            F.col("n_chunks").cast("long"),
            F.col("n_dup_chunks").cast("long"),
            (F.col("n_dup_chunks") / F.col("n_chunks")).alias(
                "dup_chunk_frac"
            ),
        )
    )


def line_dedup(
    docs: DataFrame, width: int = CHUNK_TOKENS, keep_text: bool = False
) -> DataFrame:
    """(doc_id, n_lines, n_kept, kept_frac, clean_fp[, clean_text]) —
    the C4 line-level
    cross-document dedup TRANSFORM (Raffel et al. 2020 §2.2: any line
    occurring more than once in the corpus is dropped everywhere except
    its first occurrence), followed by document reconstruction.  The
    "line" unit is the same non-overlapping ``width``-token span
    ``chunk_dedup`` accounts over (the synth corpus has no newlines).
    First occurrence = lexicographic min over (doc_id, line_no), a total
    order.  Docs whose every line is dropped vanish from the output (C4
    drops emptied docs); ``clean_fp`` is md5 of the reconstructed text
    (surviving lines in original order, space-joined).

    Plan shape (scale-linear, no all-pairs): explode lines → groupBy
    line-hash taking min(struct(doc_id, line_no)) (partial-agg combines
    map-side; hash keys are uniform so no skew) → one hash-keyed join
    back → one groupBy(doc_id) that counts AND reconstructs in the same
    aggregation (collect_list skips the nulls of dropped lines).  Line
    text is shuffled once, as join payload; the keeper side carries only
    (hash, doc_id, line_no)."""
    chunk_expr = (
        f"transform(sequence(1, greatest(size(tokens), 1), {width}),"
        f" i -> concat_ws(' ', slice(tokens, i, {width})))"
    )
    lines = (
        docs.select("doc_id", F.expr(TOKENS_EXPR).alias("tokens"))
        .select(
            "doc_id",
            F.posexplode(F.expr(chunk_expr)).alias("line_no", "line"),
        )
        .filter(F.col("line") != "")
        .withColumn("h", F.md5(F.encode("line", "UTF-8")))
    )
    keeper = lines.groupBy("h").agg(
        F.min(F.struct("doc_id", "line_no")).alias("keep_at")
    )
    marked = lines.join(keeper, "h").withColumn(
        "keep",
        (F.col("doc_id") == F.col("keep_at.doc_id"))
        & (F.col("line_no") == F.col("keep_at.line_no")),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .filter(F.col("n_kept") > 0)
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_lines"), 6).alias(
                "kept_frac"
            ),
            F.md5(F.encode("clean_text", "UTF-8")).alias("clean_fp"),
            *(["clean_text"] if keep_text else []),
        )
    )


def dup_spans(docs: DataFrame, width: int = CHUNK_TOKENS) -> DataFrame:
    """(doc_id, n_tokens, n_dup_spans, dup_tokens, dup_frac,
    longest_span) — ExactSubstr-style duplicate-SPAN detection (Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better"): every SLIDING ``width``-token window (stride 1, unlike
    ``chunk_dedup``'s non-overlapping chunks) is hashed; a window whose
    hash occurs ≥2 times anywhere in the corpus (other docs OR a repeat
    within the same doc) is a duplicated substring hit.  Per doc, hit
    windows [pos, pos+width-1] are merged into their interval UNION
    (maximal duplicated spans), the unit ExactSubstr would cut out.
    ``dup_tokens`` is the unioned token coverage, ``longest_span`` the
    longest merged span (0 when none).  Docs shorter than ``width``
    tokens have no windows and report zeros.

    Plan shape: explode sliding windows → groupBy window-hash occurrence
    count (map-side combine, uniform keys) → hash-keyed join back →
    per-doc interval union via a doc-partitioned window (running max of
    covered-end, then adjacent-group sum) — partitions are single docs,
    so the window state is bounded by doc length, never corpus-scale →
    one groupBy(doc_id).  Linear in corpus size; the sliding explode is
    ~width× the token count, the price ExactSubstr pays for stride-1
    resolution."""
    from pyspark.sql import Window

    base = docs.select(
        "doc_id", F.expr(TOKENS_EXPR).alias("tokens")
    ).select("doc_id", "tokens", F.size("tokens").alias("n_tokens"))
    win_expr = (
        f"transform(sequence(0, size(tokens) - {width}),"
        f" i -> concat_ws(' ', slice(tokens, i + 1, {width})))"
    )
    grams = (
        base.filter(F.col("n_tokens") >= width)
        .select(
            "doc_id",
            F.posexplode(F.expr(win_expr)).alias("pos", "gram"),
        )
        .select(
            "doc_id", "pos", F.md5(F.encode("gram", "UTF-8")).alias("h")
        )
    )
    occ = grams.groupBy("h").agg(F.count("*").alias("occ"))
    hits = (
        grams.join(occ, "h")
        .filter(F.col("occ") >= 2)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + width - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        hits.withColumn(
            "new_span",
            F.when(
                prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
            ).otherwise(0),
        )
        .withColumn("grp", F.sum("new_span").over(w))
        .groupBy("doc_id", "grp")
        .agg(
            (
                F.max("pos") + width - F.min("pos")
            ).alias("span_len")
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_dup_spans"),
            F.sum("span_len").cast("long").alias("dup_tokens"),
            F.max("span_len").cast("long").alias("longest_span"),
        )
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias(
                "n_dup_spans"
            ),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_frac"),
            F.coalesce("longest_span", F.lit(0)).cast("long").alias(
                "longest_span"
            ),
        )
    )


# Ordered funnel stages; first failing rule attributes the drop.
FUNNEL_STAGES = ["lang", "length", "word_len", "repetition", "kept"]


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 16,
    max_tokens: int = 200,
    min_mwl: float = 4.0,
    max_mwl: float = 5.05,
    min_distinct: float = 0.32,
) -> DataFrame:
    """(doc_id, stage) — the C4/Gopher/RefinedWeb-style quality FUNNEL
    decision: ordered rules, each doc attributed to its FIRST failing
    rule (the funnel report real pipelines publish — how much each rule
    costs), 'kept' if all pass.  Rules, in order:

      lang        not English (C4's langdetect gate)
      length      token count outside [min_tokens, max_tokens] (Gopher
                  §A1.1 doc-length bounds, scaled to this corpus)
      word_len    mean word length outside [min_mwl, max_mwl] (Gopher)
      repetition  distinct-token ratio < min_distinct (Gopher repetition)

    Pure scan-local codegen: one projection, no shuffle, no UDF — the
    100 TB shape of every real quality gate.  Thresholds are calibrated
    so each stage is non-vacuous on the synth corpus (see entry)."""
    d = docs.select(
        "doc_id", "lang", F.expr(TOKENS_EXPR).alias("tokens")
    )
    n = F.size("tokens")
    safe_n = F.greatest(n, F.lit(1))
    mwl = F.expr("aggregate(tokens, 0L, (a, x) -> a + length(x))") / safe_n
    dr = F.size(F.array_distinct("tokens")) / safe_n
    stage = (
        F.when(F.col("lang") != "en", "lang")
        .when((n < min_tokens) | (n > max_tokens), "length")
        .when((mwl < min_mwl) | (mwl > max_mwl), "word_len")
        .when(dr < min_distinct, "repetition")
        .otherwise("kept")
    )
    return d.select("doc_id", stage.alias("stage"))


def quality_funnel(docs: DataFrame, **thresholds) -> DataFrame:
    """(stage, n_docs, share) — the aggregate funnel report over
    :func:`quality_gate`: documents lost to each rule (first-failure
    attribution) and the surviving share.  One scan + one tiny groupBy."""
    gated = quality_gate(docs, **thresholds)
    per_stage = gated.groupBy("stage").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    # every doc lands in exactly one stage, so the total comes from the
    # tiny grouped table — no second corpus scan
    total = per_stage.agg(F.sum("n_docs").alias("total"))
    return per_stage.crossJoin(F.broadcast(total)).select(
        "stage",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("share"),
    )


# --- URL canonicalization (crawl-dedup hygiene) -------------------------

# Tracking query parameters stripped by normalize_urls (anchored: matches
# the param NAME at the start of a `name=value` pair)
TRACKING_PARAM_RE = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="

_SCHEME = "lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
_HOSTPORT = "lower(regexp_extract({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1))"
_PATH = (
    "regexp_replace(regexp_extract({u},"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '')"
)
_QUERY = "regexp_extract({u}, '\\\\?([^#]*)', 1)"  # '' when no '?'


def normalize_urls(
    pages: DataFrame, url_col: str = "url", out_col: str = "norm_url"
) -> DataFrame:
    """Append ``out_col``: the canonical form of ``url_col`` — the key a
    crawl pipeline dedups snapshots on (Common-Crawl CDX-style URL
    canonicalization; the reference stores raw url strings as row
    identity, src/models/extractor_data_classes/extracted_text.py).

    Canonical form (deterministic, both-engine-expressible):
      * scheme and host lowercased
      * default port stripped (``:80`` for http, ``:443`` for https;
        non-default ports kept)
      * trailing slashes stripped from the path
      * fragment dropped
      * tracking params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``,
        ``ref``) dropped; remaining query params sorted bytewise

    All whole-stage codegen: regexp_extract + higher-order
    filter/array_sort over the split query — one projection, no shuffle,
    no Python.  Malformed urls (no ``scheme://``) normalize to
    ``'://'``-prefixed strings rather than erroring (garbage-in,
    deterministic-garbage-out; a real pipeline gates them upstream).
    """
    scheme = _SCHEME.format(u=url_col)
    hostport = _HOSTPORT.format(u=url_col)
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = _PATH.format(u=url_col)
    query = _QUERY.format(u=url_col)
    kept = (
        f"array_join(array_sort(filter(split({query}, '&'), "
        f"p -> p != '' AND NOT p rlike '{TRACKING_PARAM_RE}')), '&')"
    )
    norm = (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {kept} != '' THEN concat('?', {kept}) ELSE '' END)"
    )
    return pages.withColumn(out_col, F.expr(norm))


def latest_snapshot(
    pages: DataFrame,
    key_col: str = "norm_url",
    ts_col: str = "warc_ts",
    tie_col: str | None = None,
    count_col: str = "n_snapshots",
) -> DataFrame:
    """One row per ``key_col``: the LATEST snapshot (max ``ts_col``; ties
    broken by descending ``tie_col`` when given) plus ``count_col`` = how
    many snapshots collapsed into it.  The crawl-dedup step after
    :func:`normalize_urls`: keep the freshest capture of each canonical
    url.

    Scale shape: ONE hash shuffle on the canonical url (unavoidable for
    exact per-key dedup), then two window functions over the same
    partitioning — no second exchange.  Skew is bounded by snapshots per
    url (Common-Crawl: O(10)), not by corpus size.
    """
    from pyspark.sql import Window

    order = [F.desc(ts_col)] + ([F.desc(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col)
    return (
        pages.withColumn("_snap_rn", F.row_number().over(w.orderBy(*order)))
        .withColumn(count_col, F.count("*").over(w))
        .filter(F.col("_snap_rn") == 1)
        .drop("_snap_rn")
    )


def rag_chunks(docs: DataFrame, window: int = 64,
               stride: int = 48) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_hash) — the
    standard RAG retrieval-unit chunking: fixed token windows of
    `window` tokens at `stride` steps (overlap = window - stride so no
    boundary sentence is lost to retrieval), last window truncated, one
    chunk for any non-empty doc shorter than the window.  chunk_hash =
    md5 of the space-joined chunk tokens — the embedding/dedup key a
    vector store indexes.

    Pure codegen: tokenize + a transform over the chunk-start sequence
    + slice/array_join/md5 — scan-local, no shuffle, no UDF; the
    explode emits ~n_tokens/stride rows per doc, the same order as the
    token relation every other operator already pays for."""
    n_chunks = (
        f"1 + CAST(floor(greatest(size(tokens) - {window} + {stride} - 1, 0)"
        f" / {stride}) AS INT)"
    )
    chunk_expr = (
        f"transform(sequence(0, {n_chunks} - 1),"
        f" i -> struct(i AS chunk_id, i * {stride} AS start_tok,"
        f" slice(tokens, i * {stride} + 1, {window}) AS ctoks))"
    )
    return (
        docs.withColumn("tokens", F.expr(TOKENS_EXPR))
        .filter(F.size("tokens") > 0)
        .select("doc_id", F.explode(F.expr(chunk_expr)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.start_tok").alias("start_tok"),
            F.size("c.ctoks").alias("n_chunk_tokens"),
            F.md5(
                F.encode(F.array_join("c.ctoks", " "), "UTF-8")
            ).alias("chunk_hash"),
        )
    )
