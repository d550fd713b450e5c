"""Term vectors — Elasticsearch's `_termvectors` API: for a handful of
documents, every indexed term with its in-doc frequency plus the
corpus-wide term statistics (doc freq, collection freq), straight from
the INDEX, never by re-tokenizing source text.

ES can answer this only when term vectors were stored per document at
index time; our equivalent doc-major store is the staged tokens table
the build already persists (operators/index_build.py stages
tokens(doc_id, term, tf, doc_len) as its resume/compaction source of
truth — registry key `token_dirs` unions base + extension segments).
Corpus stats come from the live lexicon.

Scale shape: the tokens table is written in doc_id order under
url_ordered builds, so the isin(doc_ids) predicate prunes to the row
groups containing the requested docs — an O(requested docs) read, not a
corpus scan.  The lexicon read is term-isin pruned the same way, and
the final join broadcasts the (tiny) requested-doc token rows against
it.  Nothing corpus-scale ever moves: both inputs arrive pre-pruned at
the scan.

Deleted documents (tombstoned, operators/deletes.py) produce no rows —
ES returns found=false for a deleted doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.deletes import deleted_dir_paths, read_deleted_ids
from ..sources.catalog import Catalog


def term_vectors(
    spark: SparkSession,
    index_root: str,
    doc_ids: list[int],
) -> DataFrame:
    """(doc_id, term, tf, doc_len, df, cf) for each live requested doc:
    per-term in-doc frequency and document length from the doc-major
    tokens store, document/collection frequency from the lexicon."""
    cat = Catalog(index_root)
    reg = cat.read_registry()
    ids = sorted(set(int(i) for i in doc_ids))
    dead = set(
        read_deleted_ids(
            deleted_dir_paths(cat, reg), min(ids), max(ids)
        ).tolist()
    ) if ids else set()
    live = [i for i in ids if i not in dead]
    empty = spark.createDataFrame(
        [], "doc_id long, term string, tf int, doc_len int, df long, cf long"
    )
    if not live:
        return empty

    tok_dirs = reg.get("token_dirs", ["tokens"])
    toks = (
        cat.read(spark, *tok_dirs)
        .filter(F.col("doc_id").isin(live) & F.col("term").isNotNull())
        .select("doc_id", "term", "tf", "doc_len")
    )
    terms = [r.term for r in toks.select("term").distinct().collect()]
    if not terms:
        return empty
    lex = (
        cat.read(spark, reg["lexicon_dir"])
        .filter(F.col("term").isin(terms))
        .select("term", "df", "cf")
    )
    return lex.join(F.broadcast(toks), "term").select(
        "doc_id", "term", "tf", "doc_len", "df", "cf"
    )
