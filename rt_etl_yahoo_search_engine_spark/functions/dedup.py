"""Deduplication operators for web-scale corpora.

Four families, each a composition of built-in DataFrame ops (JVM-side,
shuffle-aware) with a DuckDB-equivalent oracle in __spark_entry__.py:

  * exact          — md5 content hash, keep min doc_id per group
  * ngram-Jaccard  — word-shingle self-join, exact pairwise Jaccard
  * MinHash + LSH  — md5-based minhash signatures, banded bucket join for
                     candidates, exact-Jaccard verification (the scale path:
                     candidate generation is linear in corpus size, the
                     quadratic join only touches same-band buckets)
  * SimHash        — 32-bit weighted bit-vote fingerprint; near-dups share
                     fingerprints / low Hamming distance

Portability note: every hash is derived from md5 hex strings, which DuckDB
computes identically — correctness is gated by value-hash comparison against
SQL oracles, so no Spark-private hash (xxhash64/hash) appears in results.

Scale note (100 TB): the shingle self-join in jaccard_pairs is quadratic in
bucket size and intended for verification of LSH candidates or small slices;
minhash_dedup is the production path — signatures are one groupBy over
(doc, band), buckets are skew-bounded because identical band-hash implies
near-identical content, and verification joins only within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import TOKENS_EXPR


def _shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) DISTINCT word n-gram shingles."""
    return (
        docs.withColumn("tokens", F.expr(TOKENS_EXPR))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(tokens) - {n - 1}, 0)),"
                    f" i -> concat_ws(' ', slice(tokens, i, {n})))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, content_hash, is_keeper): keeper = min doc_id per hash."""
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        docs.select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("content_hash"))
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "content_hash", (F.col("rn") == 1).alias("is_keeper"))
    )


def jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.4) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-Jaccard >= threshold."""
    sh = _shingles(docs, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 16) -> DataFrame:
    """(doc_id, h, minhash): minhash = min over shingles of
    md5(h || ':' || shingle).  Min over fixed-length lowercase-hex strings
    equals min over the underlying 128-bit values, and md5 is byte-identical
    across Spark and DuckDB — the whole signature is oracle-checkable."""
    sh = _shingles(docs, n)
    hashes = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h")
    return (
        sh.select("doc_id", "shingle", hashes)
        .select(
            "doc_id",
            "h",
            F.md5(
                F.encode(
                    F.concat_ws(":", F.col("h").cast("string"), F.col("shingle")),
                    "UTF-8",
                )
            ).alias("hv"),
        )
        .groupBy("doc_id", "h")
        .agg(F.min("hv").alias("minhash"))
    )


def lsh_candidates(
    docs: DataFrame, n: int = 3, num_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs: two docs agreeing on ALL
    hashes of at least one band."""
    sig = minhash_signatures(docs, n, num_hashes)
    bands = (
        sig.withColumn("band", (F.col("h") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws("|", F.sort_array(F.collect_list("minhash"))).alias("band_key"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard: (doc_a, doc_b, jaccard)."""
    cand = lsh_candidates(docs, n, num_hashes, band_size)
    sh = _shingles(docs, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pa = cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a").select(
        "doc_a", "doc_b", "shingle"
    )
    inter = (
        pa.join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.3, n_planes: int = 6
) -> DataFrame:
    """(vec_id_a, vec_id_b, cos) embedding-cosine near-duplicate pairs.

    Candidate generation is sign-bit LSH bucketing (same-bucket pairs only),
    so the pairwise join is O(sum bucket^2), not O(N^2) — the production
    shape for embedding dedup at corpus scale; exact cosine then verifies
    each candidate against the threshold.  Pairs straddling buckets are
    missed by design (recall/cost tradeoff, tunable via n_planes)."""
    from .similarity import DOT_EXPR, NORM_EXPR, sign_bucket

    emb = embeddings.select(
        "vec_id", "embedding", sign_bucket("embedding", n_planes).alias("bucket")
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    return (
        pairs.withColumn(
            "cos",
            F.expr(DOT_EXPR.format(a="a.embedding", b="b.embedding"))
            / (
                F.expr(NORM_EXPR.format(a="a.embedding"))
                * F.expr(NORM_EXPR.format(a="b.embedding"))
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            "cos",
        )
    )


def simhash32(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash.  Each distinct term votes its
    tf-weight on 32 bit positions drawn from the term's md5 (first 8 hex
    chars); bit b of the result is 1 iff the weighted vote sum is positive.
    Expressed entirely in relational ops (explode over bit positions +
    groupBy) so the DuckDB oracle is textually parallel."""
    tf = (
        docs.withColumn("tokens", F.expr(TOKENS_EXPR))
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    hashed = tf.withColumn(
        "th", F.conv(F.substring(F.md5(F.encode("term", "UTF-8")), 1, 8), 16, 10).cast("long")
    )
    bits = hashed.select(
        "doc_id",
        "tf",
        "th",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    ).withColumn(
        "vote",
        F.when(F.expr("shiftright(th, b) & 1") == 1, F.col("tf")).otherwise(
            -F.col("tf")
        ),
    )
    return (
        bits.groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
        .withColumn(
            "bitval",
            F.when(
                F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), b)")
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def near_dup_clusters(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical): connected components over the
    LSH-verified near-dup pair graph (minhash_dedup) — the step that turns
    pairwise similarity into the keep/drop decision a training-data dedup
    actually ships: every doc in a component shares cluster_id = the
    component's min doc_id, and exactly that doc is the canonical keeper.
    Only docs that appear in at least one verified pair are returned
    (singletons are trivially their own keeper — relational absence).

    Algorithm: iterative min-label propagation to a fixed point — each
    round every node takes min(own label, neighbours' labels) via ONE
    join + groupBy over the (narrow) edge list, and the driver stops when
    a round changes nothing (count action per round).  Rounds needed =
    graph diameter, and near-dup components are band-collision cliques
    with tiny diameters (2-3 rounds in practice), so this beats the
    O(log n)-round large-star/small-star alternating contraction on
    constants for this graph family; for adversarially chainy graphs
    (diameter ~ n) swap the loop body for large-star/small-star — the
    per-round join shape is identical.  Edge list is O(verified pairs),
    orders of magnitude below corpus scale, so each round is cheap at
    100 TB; `localCheckpoint` truncates the lineage each round so the
    plan does not grow with iterations.
    """
    pairs = minhash_dedup(docs, n, num_hashes, band_size, threshold)
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .localCheckpoint()
    )
    labels = edges.select(F.col("s").alias("doc_id")).distinct().withColumn(
        "lbl", F.col("doc_id")
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("doc_id").alias("t"), "lbl"), "t"
            )
            .groupBy(F.col("s").alias("doc_id"))
            .agg(F.min("lbl").alias("nbr"))
        )
        new = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least("lbl", F.coalesce("nbr", "lbl")).alias("new_lbl"),
                "lbl",
            )
        ).localCheckpoint()
        changed = new.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = new.select("doc_id", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        (F.col("lbl") == F.col("doc_id")).alias("is_canonical"),
    )
