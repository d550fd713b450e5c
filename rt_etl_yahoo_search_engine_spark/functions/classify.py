"""Multinomial Naive Bayes text classification — the exact-count
workhorse behind fastText-style corpus labelers (language ID, quality
tiers, domain routing) in LLM-data pipelines (CCNet's lang filter,
quality classifiers a la GPT-3/LLaMA "books-like" scoring), expressed
entirely as relational aggregates so training is one corpus scan and
prediction is one join — no gradient loop, deterministic, and exactly
reproducible by a SQL oracle.

Model (alpha = 1 Laplace smoothing over the training vocabulary V):

    p(c)    = n_docs_c / N
    p(t|c)  = (cnt(t,c) + 1) / (tot_c + |V|)
    score_c(d) = ln p(c) + sum_t tf_d(t) * ln p(t|c)   over t in d ∩ V

The unseen-(t,c) term is handled with the sparse decomposition (no
dense vocab × class blowup): with miss_c = ln(1/(tot_c + |V|)),

    score_c(d) = ln p(c) + miss_c * S_d + sum_{(t,c) seen} tf * delta(t,c)

where S_d = sum of tf over d's in-vocabulary tokens and delta(t,c) =
ln p(t|c) - miss_c — only SEEN (term, class) pairs carry rows.

The reference engine has no classifier (its only "model" is regex
classification of text nodes, ref `src/models/extractor_data_classes/
extracted_text.py:105-112`); this is the corpus-scale analog.

Scale shape: training = two groupBys over the token relation
(map-side combinable) + two scalar aggregates carried by broadcast
cross-joins; the model is vocabulary × classes SPARSE (seen pairs
only).  Prediction = doc-tf join to the model on term (at 100 TB the
model is the broadcast side: vocab-scale, class-bounded), one groupBy
per (doc, class), one max_by argmax per doc — no window, no driver
collect, no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import with_tokens


def _doc_tf(docs: DataFrame, extra_cols: list[str]) -> DataFrame:
    toks = with_tokens(docs).select(
        "doc_id", *extra_cols, F.explode("tokens").alias("term")
    )
    return toks.groupBy("doc_id", *extra_cols, "term").agg(
        F.count("*").alias("tf")
    )


def nb_train(docs: DataFrame, label_col: str):
    """Train on (doc_id, text, <label_col>) -> (pairs, classes) model
    DataFrames:

      pairs:   (term, label, delta double)      — seen pairs only
      classes: (label, log_prior double, miss double)

    Both sides of every division are computed as doubles in a fixed
    expression shape so a SQL oracle reproduces the floats exactly."""
    tf = _doc_tf(docs, [label_col]).withColumnRenamed(label_col, "label")
    cnt = tf.groupBy("label", "term").agg(F.sum("tf").alias("cnt"))
    tot = cnt.groupBy("label").agg(F.sum("cnt").alias("tot"))
    vocab = cnt.agg(
        F.countDistinct("term").cast("double").alias("v")
    )
    n_docs_c = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_c")
    )
    n = docs.agg(F.count("*").cast("double").alias("n"))
    classes = (
        n_docs_c.join(tot, "label")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.log(F.col("n_c") / F.col("n")).alias("log_prior"),
            F.log(F.lit(1.0) / (F.col("tot") + F.col("v"))).alias("miss"),
            (F.col("tot") + F.col("v")).alias("denom"),
        )
    )
    pairs = (
        cnt.join(F.broadcast(classes.select("label", "miss", "denom")),
                 "label")
        .select(
            "term", "label",
            (F.log((F.col("cnt") + F.lit(1.0)) / F.col("denom"))
             - F.col("miss")).alias("delta"),
        )
    )
    return pairs, classes.select("label", "log_prior", "miss")


def nb_predict(docs: DataFrame, pairs: DataFrame,
               classes: DataFrame) -> DataFrame:
    """(doc_id, pred_label, logp, margin): argmax class per document
    under the trained model; margin = best logp - runner-up logp (+inf
    when there is a single class).  Ties break label-ascending."""
    tf = _doc_tf(docs, [])
    in_vocab = pairs.select("term").distinct()
    s_doc = (
        tf.join(in_vocab, "term")
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("double").alias("s_vocab"))
    )
    seen = (
        tf.join(pairs, "term")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("tf") * F.col("delta")).alias("seen_part"))
    )
    per_class = (
        s_doc.crossJoin(F.broadcast(classes))
        .join(seen, ["doc_id", "label"], "left")
        .select(
            "doc_id", "label",
            (F.col("log_prior") + F.col("miss") * F.col("s_vocab")
             + F.coalesce(F.col("seen_part"), F.lit(0.0))).alias("logp"),
        )
    )
    # argmax + runner-up without a window: min_by/min aggregates over an
    # orderable (NEGATED logp, label) struct — float negation is an
    # exact sign flip, so this is `ORDER BY logp DESC, label ASC` over
    # the FULL label (r3; replaces the 8-char negated-codepoint prefix
    # hack ADVICE r2 flagged as a latent tie-break mismatch) — scan-
    # side, no Exchange beyond the (doc, class) groupBy.
    key = F.struct((-F.col("logp")).alias("nl"), F.col("label"))
    best = per_class.groupBy("doc_id").agg(
        F.min_by("label", key).alias("pred_label"),
        F.min(key).alias("bk"),
    ).select(
        "doc_id", "pred_label", (-F.col("bk.nl")).alias("logp")
    )
    runner = (
        per_class.join(best.select("doc_id", "pred_label"), "doc_id")
        .filter(F.col("label") != F.col("pred_label"))
        .groupBy("doc_id")
        .agg(F.max(F.col("logp")).alias("second"))
    )
    return (
        best.join(runner, "doc_id", "left")
        .select(
            "doc_id", "pred_label", "logp",
            F.when(F.col("second").isNull(), F.lit(float("inf")))
            .otherwise(F.col("logp") - F.col("second"))
            .alias("margin"),
        )
    )


def nb_self_classify(docs: DataFrame, label_col: str) -> DataFrame:
    """Train on the corpus's own labels and classify the same corpus —
    (doc_id, label, pred_label, logp, margin, correct).  The standard
    smoke protocol for a counts-based classifier (and the shape of the
    real pipeline: train on a labeled slice, predict over the lake)."""
    pairs, classes = nb_train(docs, label_col)
    pred = nb_predict(docs, pairs, classes)
    return (
        docs.select("doc_id", F.col(label_col).alias("label"))
        .join(pred, "doc_id")
        .select(
            "doc_id", "label", "pred_label", "logp", "margin",
            (F.col("label") == F.col("pred_label")).alias("correct"),
        )
    )
