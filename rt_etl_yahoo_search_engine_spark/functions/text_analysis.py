"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in pyspark.sql.functions; no Python UDFs) so they stay
inside whole-stage codegen and scale to 100 TB corpora: token counting,
quality scoring, language-ID heuristic, and document fingerprinting.  Every
operator has a textually-equivalent DuckDB oracle in __spark_entry__.py.

Input contract: a DataFrame with (doc_id: long, text: string).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic tokenizer, same spec as the index (spec.TOKEN_RE)
TOKENS_EXPR = r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

# Small fixed English stopword list (alphabetical; shared with the SQL oracle)
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "he", "in", "is", "it", "its", "of", "on", "that", "the", "to", "was",
    "were", "will", "with",
]


def with_tokens(docs: DataFrame) -> DataFrame:
    return docs.withColumn("tokens", F.expr(TOKENS_EXPR))


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_ws_tokens) — regex tokens,
    distinct regex tokens, and naive whitespace-split tokens."""
    return with_tokens(docs).select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct_tokens"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_ws_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Deterministic quality features + a composite score in [0, 1]:
      score = 0.4 * min(n_tokens / 100, 1)           (length credit)
            + 0.3 * stopword_ratio                    (natural-language prior)
            + 0.3 * (1 - non_alnum_ratio)             (symbol-noise penalty)
    """
    d = with_tokens(docs).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size("tokens").alias("n_tokens"),
        (
            F.size(
                F.filter(
                    F.col("tokens"),
                    lambda t: t.isin(STOPWORDS),
                )
            )
            / F.greatest(F.size("tokens"), F.lit(1))
        ).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("non_alnum_ratio"),
    )
    return d.withColumn(
        "quality",
        0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.3 * F.col("stopword_ratio")
        + 0.3 * (1.0 - F.col("non_alnum_ratio")),
    )


def lang_id(docs: DataFrame, threshold: float = 0.05) -> DataFrame:
    """Heuristic language-ID: English stopword density.  A real pipeline
    would swap in fastText/cld3 behind the same column contract."""
    d = with_tokens(docs).select(
        "doc_id",
        (
            F.size(F.filter(F.col("tokens"), lambda t: t.isin(STOPWORDS)))
            / F.greatest(F.size("tokens"), F.lit(1))
        ).alias("en_density"),
    )
    return d.withColumn(
        "pred_lang", F.when(F.col("en_density") >= threshold, "en").otherwise("unk")
    )


def fingerprints(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc_id, fp_full, fp_min): exact-content fingerprint (md5 of text) and
    a content-robust fingerprint (min md5 over word shingles — the min-hash
    of a rolling window, stable under local edits)."""
    shingled = with_tokens(docs).select(
        "doc_id",
        F.md5(F.encode("text", "UTF-8")).alias("fp_full"),
        F.expr(
            f"transform(sequence(1, greatest(size(tokens) - {shingle_n - 1}, 0)),"
            f" i -> concat_ws(' ', slice(tokens, i, {shingle_n})))"
        ).alias("shingles"),
    )
    return shingled.select(
        "doc_id",
        "fp_full",
        F.array_min(
            F.transform(F.col("shingles"), lambda s: F.md5(F.encode(s, "UTF-8")))
        ).alias("fp_min"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, logprob_sum, avg_logprob) — the CCNet-style
    language-model quality proxy with the corpus's OWN unigram model
    standing in for KenLM (the external-LM hookup is the same join
    against a (term, logp) table): P(t) = cf(t) / total_tokens over the
    input corpus, logprob_sum = sum over token occurrences of ln P(t),
    avg_logprob = logprob_sum / n_tokens.  More-negative avg = rarer
    vocabulary; pipelines threshold or bucket on it (CCNet keeps the
    middle perplexity band).

    Scale shape: per-doc tf (map-side combine), corpus cf from one more
    reduction of the SAME tf relation, a term-keyed join back (the only
    corpus-scale shuffle — at 100 TB swap in a broadcast of the
    vocabulary table or the lexicon sidecar the index already has), and
    a single-row total carried by cross-join, never a driver collect."""
    toks = with_tokens(docs).select(
        "doc_id", F.explode("tokens").alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total"))
    per_term = tf.join(cf, "term").crossJoin(F.broadcast(total))
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(
                F.col("tf") * F.log(F.col("cf") / F.col("total"))
            ).alias("logprob_sum"),
        )
        .withColumn(
            "avg_logprob", F.col("logprob_sum") / F.col("n_tokens")
        )
    )


def bpe_pair_counts(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """(pair, n) — the first merge round of BPE tokenizer TRAINING
    (Sennrich et al. 2016): corpus-wide frequencies of adjacent
    CHARACTER pairs within words, top ``top_n`` by count (count DESC,
    pair ASC — the deterministic merge-pick order).  Iterating this
    (count -> merge best pair -> recount) is the whole trainer; one
    round exercises the corpus-scale part, the explode+count.

    Scale shape: tokens explode to character bigrams entirely inside
    codegen (transform over sequence, no UDF), partial aggregation
    combines map-side, and only pair-vocabulary rows (bounded by
    alphabet²) reach the final top-N — no corpus-scale shuffle
    payload."""
    pairs = (
        with_tokens(docs)
        .select(F.explode("tokens").alias("term"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(term) - 1, 0)),"
                    " i -> substring(term, i, 2))"
                )
            ).alias("pair")
        )
        .filter(F.length("pair") == 2)
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top_n)
    )


_BIGRAM_EXPR = """
CASE WHEN size(tokens) < 2 THEN array()
     ELSE transform(sequence(1, size(tokens) - 1),
                    i -> concat(element_at(tokens, i), ' ',
                                element_at(tokens, i + 1)))
END
"""


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, logprob_sum, avg_logprob) — the order-aware
    step up from :func:`unigram_logprob`: each document scored under the
    corpus's own MAXIMUM-LIKELIHOOD BIGRAM model, P(t | prev) =
    c2(prev, t) / c1(prev), where c2 counts corpus bigram occurrences
    and c1(prev) = Σ_t c2(prev, t) (occurrences of ``prev`` as a
    predecessor).  logprob_sum = Σ ln P over the doc's bigram positions;
    docs with < 2 tokens have no bigrams and drop out.  The perplexity
    column an n-gram-LM quality filter (CCNet's KenLM is a smoothed
    5-gram of this shape) thresholds on — since every doc's bigrams come
    FROM the corpus, ML probabilities are never zero.

    Scale shape mirrors unigram_logprob: per-doc bigram tf (map-side
    combine), corpus c2 by one more reduction of the SAME relation,
    c1 by reducing c2 (bigram-vocab scale, not corpus scale), then one
    bigram-keyed join back — the only corpus-scale shuffle."""
    bg = with_tokens(docs).select(
        "doc_id", F.explode(F.expr(_BIGRAM_EXPR)).alias("bg")
    )
    tf = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    c2 = tf.groupBy("bg").agg(F.sum("tf").alias("c2"))
    c1 = (
        c2.groupBy(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("prev"))
        .agg(F.sum("c2").alias("c1"))
    )
    joined = (
        tf.join(c2, "bg")
        .withColumn(
            "prev", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
        )
        .join(c1, "prev")
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(
                F.col("tf") * F.log(F.col("c2") / F.col("c1"))
            ).alias("logprob_sum"),
        )
        .withColumn(
            "avg_logprob", F.col("logprob_sum") / F.col("n_bigrams")
        )
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4
) -> DataFrame:
    """(doc_id, n_grams, n_fp, fp_digest) — WINNOWING document
    fingerprints (Schleimer, Wilkerson & Aiken 2003; the MOSS
    algorithm): hash every char ``k``-gram of the normalized text
    (lowercased, non-alphanumerics stripped), slide a window of ``w``
    consecutive gram hashes, select each window's minimum hash
    (RIGHTMOST position on ties), and dedup the selections.  Guarantee:
    any two docs sharing a substring of >= w + k - 1 normalized chars
    share a fingerprint — the position-aware local dedup/plagiarism
    primitive, stronger than global MinHash for partial overlap.
    ``fp_digest`` is md5 over the (hash, pos)-sorted selection set;
    docs whose normalized text is shorter than ``k`` report 0/empty.

    Scale shape: ENTIRELY scan-local — grams, windows, min-selection,
    and dedup are nested higher-order array expressions inside
    whole-stage codegen; no explode, no shuffle, no UDF.  Cross-doc
    matching joins on the fingerprint hashes afterwards (bounded rows:
    ~n_grams/w selections per doc)."""
    norm = "regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]', '')"
    # Spark's sequence(1, 0) yields [1, 0] (descending), so the empty
    # case needs an explicit guard, not greatest(..., 0)
    grams = (
        f"CASE WHEN length({norm}) < {k} THEN"
        f" CAST(array() AS array<struct<h: string, pos: int>>)"
        f" ELSE transform(sequence(1, length({norm}) - {k} + 1),"
        f" i -> named_struct('h', md5(substring({norm}, i, {k})),"
        f" 'pos', i)) END"
    )
    # per window j: fold the w-slice picking (h ASC, pos DESC); the 'g'
    # sentinel sorts above every md5 hex char so the fold's init loses
    sel = (
        f"transform(sequence(1, greatest(size(grams) - {w} + 1, 1)),"
        f" j -> aggregate(slice(grams, j, {w}),"
        f" named_struct('h', 'g', 'pos', -1),"
        f" (acc, x) -> CASE WHEN x.h < acc.h OR (x.h = acc.h AND"
        f" x.pos > acc.pos) THEN x ELSE acc END))"
    )
    d = (
        docs.select("doc_id", F.expr(grams).alias("grams"))
        .withColumn(
            "fps",
            F.when(F.size("grams") < 1, F.expr("array()")).otherwise(
                F.array_sort(F.array_distinct(F.expr(sel)))
            ),
        )
    )
    return d.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.size("fps").cast("long").alias("n_fp"),
        F.md5(
            F.encode(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.col("fps"),
                        lambda s: F.concat_ws(
                            ":", s["h"], s["pos"].cast("string")
                        ),
                    ),
                ),
                "UTF-8",
            )
        ).alias("fp_digest"),
    )


def frequent_item_sets(
    docs: DataFrame,
    items: list[str],
    min_support: int,
    max_size: int = 3,
) -> DataFrame:
    """(items, size, support) — ES `frequent_item_sets` aggregation over
    the per-document DISTINCT token sets, restricted to the request's
    `items` vocabulary: every itemset of size 1..max_size contained by
    >= min_support documents, keyed ES-style by the '|'-joined sorted
    member list.

    Scale shape: the candidate lattice is REQUEST-bounded (C(|items|,
    1..max_size) subsets, enumerated once on the driver as literals),
    so each document contributes at most |lattice| boolean evaluations
    — a doc-local JVM filter over its token array (whole-stage
    codegen), then ONE partially-aggregated groupBy of (key) rows.  No
    corpus self-join, no a-priori candidate re-scan rounds: with a
    bounded vocabulary the one-pass lattice count IS the a-priori
    closure."""
    from itertools import combinations

    vocab = sorted(set(items))
    cands = [
        list(c)
        for size in range(1, max_size + 1)
        for c in combinations(vocab, size)
    ]
    cand_lit = F.array(
        *[
            F.struct(
                F.lit("|".join(c)).alias("key"),
                F.lit(len(c)).alias("size"),
                F.array(*[F.lit(t) for t in c]).alias("members"),
            )
            for c in cands
        ]
    )
    toks = F.array_intersect(
        F.expr(TOKENS_EXPR), F.array(*[F.lit(t) for t in vocab])
    )
    return (
        docs.select(toks.alias("present"))
        .filter(F.size("present") > 0)
        .select(F.explode(cand_lit).alias("c"), "present")
        .filter(
            F.forall(
                F.col("c.members"),
                lambda m: F.array_contains(F.col("present"), m),
            )
        )
        .groupBy(
            F.col("c.key").alias("items"), F.col("c.size").alias("size")
        )
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def categorize_text(
    docs: DataFrame,
    max_tokens: int = 8,
    k: int = 20,
) -> DataFrame:
    """(rank, category, doc_count, min_doc_id) — ES's ``categorize_text``
    aggregation, deterministically specified: documents are grouped by a
    token-pattern signature — the first `max_tokens` DIGIT-FREE lowercase
    tokens of the text, space-joined (numbers, ids and timestamps are the
    variable parts of log-like text; dropping digit-bearing tokens is the
    ES categorizer's core move, made exact here so the operator is
    oracle-checkable).  Output is the top-k categories by document count
    (ties by category asc) with each category's smallest doc_id as the
    representative document.

    Scale shape: the signature is pure whole-stage codegen on the scan
    (split/filter/slice/join — no UDF), the count is one map-side
    partial-aggregated groupBy at category cardinality, and the top-k is
    orderBy(...).limit(k) — Spark's TakeOrderedAndProject, a per-partition
    heap + driver merge of k rows, never a global sort of the category
    relation."""
    sig = F.expr(
        "array_join(slice(filter("
        "  regexp_extract_all(lower(text), '([a-z0-9]+)', 1),"
        "  x -> x NOT RLIKE '[0-9]'),"
        f" 1, {int(max_tokens)}), ' ')"
    )
    agg = (
        docs.select(sig.alias("category"), "doc_id")
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .orderBy(F.desc("doc_count"), F.asc("category"))
        .limit(int(k))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("doc_count"), F.asc("category"))
    return agg.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "category",
        "doc_count",
        "min_doc_id",
    )


def bpe_learn(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """(merge_idx, left_sym, right_sym, pair_count) — the full BPE
    tokenizer TRAINING loop (Sennrich et al. 2016), ``n_merges`` rounds:
    count adjacent symbol pairs corpus-wide, merge the most frequent
    (count DESC, 'left right' string ASC — the deterministic pick), and
    repeat.  :func:`bpe_pair_counts` is round one of this.

    Scale-correct structure: the corpus is scanned ONCE to build the
    word-frequency table (token -> count; the classic trainer's input —
    vocabulary-scale, ~1e7 rows at 100 TB, not corpus-scale), then every
    iteration runs on that small cached table: pair explode + weighted
    sum (map-side combine) + a 1-row argmax collect, and the merge is
    applied as one JVM ``replace`` over a parenthesized symbol string
    ('(c)(h)(a)(t)'), whose delimiters make left-to-right non-overlapping
    replacement exactly the greedy BPE merge.  Driver work per round is
    one row; nothing corpus-scale ever recomputes.
    """
    words = (
        with_tokens(docs)
        .select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n"))
    )
    base = words.withColumn(
        "sym", F.expr("regexp_replace(term, '(.)', '($1)')")
    ).persist()
    base.count()  # materialize before iterating
    cur = base
    spark = docs.sparkSession
    merges = []
    try:
        for i in range(int(n_merges)):
            tk = "split(trim(BOTH '()' FROM sym), '[)][(]')"
            pairs_expr = (
                f"CASE WHEN size({tk}) < 2 THEN array() "
                f"ELSE transform(sequence(1, size({tk}) - 1), "
                f"j -> concat(element_at({tk}, j), ' ', "
                f"element_at({tk}, j + 1))) END"
            )
            top = (
                cur.select("n", F.explode(F.expr(pairs_expr)).alias("pair"))
                .groupBy("pair")
                .agg(F.sum("n").cast("long").alias("c"))
                .orderBy(F.desc("c"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, c = top[0]["pair"], int(top[0]["c"])
            left, right = pair.split(" ")  # symbols are [a-z0-9]+: no quoting needed
            merges.append((i, left, right, c))
            cur = cur.withColumn(
                "sym",
                F.expr(f"replace(sym, '({left})({right})', '({left}{right})')"),
            )
    finally:
        base.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_idx int, left_sym string, right_sym string, pair_count long",
    )


def ngram_lang_id(docs: DataFrame, n_top: int = 40) -> DataFrame:
    """(doc_id, pred_lang, dist) — Cavnar-Trenkle (1994) n-gram rank-
    profile language ID, the classic production lang-ID algorithm (what
    `lang_id`'s stopword heuristic stands in for): per language, the
    training profile is the ``n_top`` most frequent boundary-padded char
    trigrams ranked by (count DESC, gram ASC); each document builds the
    same ranked profile of its own text, and its distance to a language
    is the out-of-place measure — sum over the doc's top grams of
    |doc_rank - lang_rank|, with ``n_top`` as the penalty for grams
    absent from the language profile.  pred_lang = argmin distance
    (lang ASC on ties).  Trains on the input's own ``lang`` column
    (self-supervised over the corpus); docs with no tokens emit no row.

    Scale shape: the language profiles aggregate to L x n_top rows
    (metadata-scale, broadcast); the document side is one explode +
    per-doc groupBy/window (a single corpus-linear shuffle keyed by
    doc_id), then a broadcast join and a tiny per-(doc, lang) sum —
    nothing quadratic, no Python.
    """
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "flatten(transform("
                + TOKENS_EXPR
                + ", t -> transform(sequence(1, length(t)),"
                "   i -> substring(concat('_', t, '_'), i, 3))))"
            )
        ).alias("gram"),
    ).filter(F.length("gram") == 3)
    from pyspark.sql import Window

    lang_prof = (
        grams.groupBy("lang", "gram")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "lrank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
            ),
        )
        .filter(F.col("lrank") <= n_top)
        .select("lang", "gram", "lrank")
    )
    doc_prof = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "drank",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
            ),
        )
        .filter(F.col("drank") <= n_top)
        .select("doc_id", "gram", "drank")
    )
    langs = lang_prof.select("lang").distinct()
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lang_prof), ["lang", "gram"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("lrank")), F.lit(int(n_top))
                )
            )
            .cast("long")
            .alias("dist")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.asc("dist"), F.asc("lang"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "dist")
    )


def zipf_fit(docs: DataFrame) -> DataFrame:
    """One row: (slope, intercept, r2, vocab_size, total_tokens) — the
    least-squares fit of ln(frequency) against ln(rank) over the
    corpus's term-frequency table (rank 1 = most frequent; ties break
    term-ascending).  Zipf's law predicts slope near -1; corpus-health
    dashboards watch the fit drift as ingestion mixes change (a slope
    collapse flags boilerplate/duplication, r2 collapse flags scrambled
    or non-linguistic text).

    Scale shape: one corpus-scale token aggregation (map-side
    combinable) down to the vocabulary relation, then BUCKETED rank
    assignment (no vocab-scale un-partitioned window): rank order is
    (cf DESC, term ASC), so the vocabulary splits into ordered buckets
    — exact-cf groups for cf <= 1024 (sub-split by the term's first
    char, which preserves the within-tie term order) and power-of-two
    cf bands for the tiny Zipf head above that.  A bucket-count
    aggregate (<= ~38 * 1024 + 54 rows, collected driver-side — the
    same metadata-scale offset pattern as the url_ordered docmap)
    yields each bucket's global rank offset; a Window.partitionBy
    (bucket) row_number plus that offset reproduces the exact global
    rank.  Within an exact-cf tie the OLS y value is constant, so any
    bijection of the tie's rank range onto its terms leaves every OLS
    sum unchanged — bucketed ranks are value-identical to the global
    window, and the plan never funnels the vocabulary through one
    task.  After rank assignment: a five-sum OLS reduce — nothing
    after the first groupBy touches corpus-scale rows."""
    cf = (
        with_tokens(docs)
        .select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
    )
    head_cut = 1024
    is_head = F.col("cf") > head_cut
    bk = F.when(is_head, F.floor(F.log2(F.col("cf").cast("double")))).otherwise(
        F.col("cf")
    ).cast("long")
    bs = F.when(is_head, F.lit("")).otherwise(F.substring("term", 1, 1))
    bucketed = cf.withColumn("_bh", is_head).withColumn("_bk", bk).withColumn(
        "_bs", bs
    )
    counts = (
        bucketed.groupBy("_bh", "_bk", "_bs")
        .agg(F.count("*").alias("_cnt"))
        .collect()
    )
    # Global bucket order: head (log2) bands first, largest band first;
    # then exact-cf groups by cf desc, first-char asc within a tie.
    counts.sort(
        key=lambda r: (0, -r["_bk"], "") if r["_bh"] else (1, -r["_bk"], r["_bs"])
    )
    offs, acc = [], 0
    for r in counts:
        offs.append((r["_bh"], r["_bk"], r["_bs"], acc))
        acc += r["_cnt"]
    off_df = docs.sparkSession.createDataFrame(
        offs or [(False, 0, "", 0)],
        "_bh boolean, _bk long, _bs string, _off long",
    )
    w = Window.partitionBy("_bh", "_bk", "_bs").orderBy(
        F.desc("cf"), F.asc("term")
    )
    ranked = (
        bucketed.join(F.broadcast(off_df), ["_bh", "_bk", "_bs"])
        .withColumn("rank", F.col("_off") + F.row_number().over(w))
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cf").cast("double")).alias("y"),
            "cf",
        )
    )
    s = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("cf").cast("long").alias("total_tokens"),
    )
    return s.select(
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("slope"),
        (
            (F.col("sy") - (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
             / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
             * F.col("sx")) / F.col("n")
        ).alias("intercept"),
        (
            ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
             * (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")))
            / ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
               * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")))
        ).alias("r2"),
        F.col("n").cast("long").alias("vocab_size"),
        "total_tokens",
    )


def js_divergence(docs: DataFrame, group_col: str) -> DataFrame:
    """(group_a, group_b, js, n_shared): Jensen-Shannon divergence
    (natural log) between the unigram distributions of every unordered
    group pair (a < b) — the data-mixing diagnostic that quantifies how
    far two corpus slices' vocabularies drift (0 = identical,
    ln 2 = disjoint support).

    JS(P,Q) = 0.5*KL(P||M) + 0.5*KL(Q||M) with M = (P+Q)/2.  Terms
    exclusive to one side contribute p*ln2, so the whole divergence
    folds onto the SHARED support: with sa = sum of P over shared
    terms (sb likewise) and ka/kb the shared KL partial sums,

        JS = 0.5*(ka + (1-sa)*ln2) + 0.5*(kb + (1-sb)*ln2)

    — no union-support join needed, and pairs with zero overlap come
    out exactly ln 2 from the pair spine's zero-filled row.

    Scale shape: one corpus-scale aggregation to (group, term, p)
    (map-side combinable); the pair join runs on VOCAB-scale relations
    with fan-out = per-term group multiplicity; the pair spine is a
    groups x groups cross of a group-cardinality relation."""
    ln2 = math.log(2.0)
    tf = (
        with_tokens(docs)
        .select(F.col(group_col).alias("g"), F.explode("tokens").alias("term"))
        .groupBy("g", "term")
        .agg(F.count("*").alias("c"))
    )
    tot = tf.groupBy("g").agg(F.sum("c").alias("t"))
    p = tf.join(tot, "g").select(
        "g", "term", (F.col("c") / F.col("t")).alias("p")
    )
    a = p.select(F.col("g").alias("group_a"), "term", F.col("p").alias("pa"))
    b = p.select(F.col("g").alias("group_b"), "term", F.col("p").alias("pb"))
    shared = (
        a.join(b, "term")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.sum(
                F.col("pa")
                * F.log(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb")))
            ).alias("ka"),
            F.sum(
                F.col("pb")
                * F.log(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb")))
            ).alias("kb"),
            F.sum("pa").alias("sa"),
            F.sum("pb").alias("sb"),
            F.count("*").alias("n_shared"),
        )
    )
    gs = tot.select("g")
    spine = (
        gs.select(F.col("g").alias("group_a"))
        .crossJoin(gs.select(F.col("g").alias("group_b")))
        .filter(F.col("group_a") < F.col("group_b"))
    )
    z = spine.join(shared, ["group_a", "group_b"], "left").select(
        "group_a", "group_b",
        F.coalesce("ka", F.lit(0.0)).alias("ka"),
        F.coalesce("kb", F.lit(0.0)).alias("kb"),
        F.coalesce("sa", F.lit(0.0)).alias("sa"),
        F.coalesce("sb", F.lit(0.0)).alias("sb"),
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
    )
    return z.select(
        "group_a", "group_b",
        (
            F.lit(0.5) * (F.col("ka") + (F.lit(1.0) - F.col("sa")) * F.lit(ln2))
            + F.lit(0.5) * (F.col("kb") + (F.lit(1.0) - F.col("sb")) * F.lit(ln2))
        ).alias("js"),
        "n_shared",
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens, compression): apply a LEARNED
    ordered merge list (bpe_learn's output) to the corpus — the encode
    half of the BPE tokenizer loop, the per-doc "how many subword
    tokens is this document" accounting every token-budgeted training
    pipeline needs (packing, mix weights, cost estimates all key on
    it).

    Scale-correct structure (mirror of bpe_learn's): merges are applied
    to the VOCABULARY relation only (distinct term -> parenthesized
    symbol string, one JVM `replace` per merge — never per-document
    work), then per-doc counts come from the tf relation joined to the
    vocabulary's symbol counts (broadcastable: vocabulary-scale).
    Greedy left-to-right non-overlapping application per merge is exact
    BPE by the parenthesis-delimiter argument (see bpe_learn)."""
    vocab = (
        with_tokens(docs)
        .select(F.explode("tokens").alias("term"))
        .distinct()
        .withColumn("sym", F.expr("regexp_replace(term, '(.)', '($1)')"))
    )
    for left, right in merges:
        vocab = vocab.withColumn(
            "sym",
            F.expr(f"replace(sym, '({left})({right})', '({left}{right})')"),
        )
    tk = "split(trim(BOTH '()' FROM sym), '[)][(]')"
    word_syms = vocab.select("term", F.expr(f"size({tk})").alias("n_syms"))
    tf = (
        with_tokens(docs)
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.join(F.broadcast(word_syms), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("n_syms")).cast("long")
            .alias("n_bpe_tokens"),
        )
        .withColumn(
            "compression",
            F.col("n_bpe_tokens") / F.col("n_tokens"),
        )
    )
