"""Benchmark decontamination — flag training documents that share long
word n-grams with an evaluation/benchmark set, the standard pre-training
hygiene pass (GPT-3 appendix C / PaLM-style 8-gram overlap).

Shape: the benchmark side is tiny (thousands of eval prompts) and the
corpus side is 100 TB — so the corpus is NEVER self-joined.  Each doc's
n-gram shingles are generated doc-locally (codegen transform over the
token array), the benchmark's DISTINCT shingle set is broadcast, and one
broadcast semi-ish join + groupBy counts each doc's distinct overlapping
shingles.  Corpus rows move through exactly one narrow (doc_id, shingle)
-> (doc_id, n) aggregation with map-side partial counts; the benchmark
never leaves the driver-broadcast path.

Input contract: (doc_id: long, text: string) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import TOKENS_EXPR


def _shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle): DISTINCT space-joined word n-grams per doc —
    docs shorter than n tokens produce none."""
    # sequence(1, 0) DESCENDS in Spark rather than being empty, so docs
    # shorter than n tokens need the explicit empty-array branch.
    grams = F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> array_join(slice(toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (
        docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def contamination(
    docs: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """(doc_id, n_shared, is_contaminated): per training doc, the number
    of its distinct word n-grams that appear anywhere in the benchmark
    set, and the keep/drop flag (any overlap contaminates — the
    conservative GPT-3-style rule; callers wanting a threshold filter on
    n_shared).  Docs with zero overlap are ABSENT (relational absence —
    the contaminated set is the small output; the clean corpus is the
    anti-join against it, see decontaminate())."""
    bench = _shingles(benchmark, n).select("shingle").distinct()
    return (
        _shingles(docs, n)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .select("doc_id", "n_shared", F.lit(True).alias("is_contaminated"))
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """The clean corpus: docs minus every contaminated doc_id — a
    left-anti join against the (small) contamination output, so the
    corpus is still scanned exactly once more with a broadcastable right
    side in the common case."""
    bad = contamination(docs, benchmark, n).select("doc_id")
    return docs.join(F.broadcast(bad), "doc_id", "left_anti")
