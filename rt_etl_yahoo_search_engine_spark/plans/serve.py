"""Low-latency serving path: BM25 top-k without a Spark job per query.

The distributed path (plans.bm25.topk) is the THROUGHPUT path — one Spark
job amortizes scan, broadcast, and shuffle across a whole query batch.  Its
fixed per-job cost (~1-2 s of stage scheduling) is irrelevant at batch
scale but dominates single-query latency, and the north metric asks for
query p50/p99 as well as QPS.

On a real cluster, interactive serving is not a batch job either: each
searcher process owns one doc-range shard of the index (exactly the layout
the build's ``shard = doc_id * S // N`` sharding produces) and answers
queries from local storage in milliseconds; a front-end fans each query to
S searchers and merges S×k candidate rows.  This module is that
searcher-node role, runnable against any index the build wrote:

  * the lexicon row for each query term is read with parquet
    predicate pushdown (``term isin``) — touches a few row groups, not the
    table;
  * the term's ``bucket`` column (materialized at build time) prunes the
    postings read to one hive partition directory per term, and the
    term-sorted data files prune to a handful of row groups via parquet
    min/max stats — the same pruning Catalyst does, done here through
    pyarrow.dataset against identical files;
  * scoring runs the SAME block-max WAND + bounded min-heap operator the
    distributed path uses (operators.topk._Cursor / wand_topk), so results
    are rank-identical by construction — asserted by tests/test_serve.py.

One process here holds every shard, so the S-way merge is local; the float
sum order per doc (ascending term order) matches the distributed path's
``groupby("term", sort=True)`` cursor order, keeping scores bit-identical.

The reference answers a query in "order of seconds" end-to-end
(ref: README.md:18-19); this path answers rank-identical BM25 top-10 over
the same corpus in single-digit milliseconds per query.
"""

from __future__ import annotations

import pandas as pd

from .. import spec
from ..operators.topk import _Cursor, wand_topk
from ..sources.catalog import Catalog
from .bm25 import _bound_factor

_POSTINGS_COLS = [
    "term",
    "shard",
    "first_doc_id",
    "last_doc_id",
    "block_max_part",
    "doc_ids_vb",
    "tfs_vb",
    "doc_lens_vb",
]


class LocalSearcher:
    """Serving-path searcher over one on-disk index (no SparkSession).

    Thread-compatible for read-only use; per-term lexicon lookups are cached
    for the lifetime of the searcher (the lexicon is immutable once built).
    """

    def __init__(self, index_root: str):
        import pyarrow.dataset as ds

        self._ds = ds
        self.root = index_root
        cat = Catalog(index_root)
        reg = cat.read_registry()
        self.avgdl = float(reg["avgdl"])
        self.n_docs = int(reg["n_docs"])
        self._lex_ds = ds.dataset(cat.path(reg["lexicon_dir"]))
        # one dataset per posting segment + the bound-correction factor for
        # blocks encoded against an older global avgdl (ulp-padded true
        # upper bound — see plans/bm25._bound_factor)
        self._segments = [
            (
                ds.dataset(cat.path(seg["dir"]), partitioning="hive"),
                _bound_factor(self.avgdl, float(seg["avgdl"])),
            )
            for seg in reg["segments"]
        ]
        self._term_cache: dict[str, tuple[float, int] | None] = {}

    # -- lexicon ---------------------------------------------------------

    def _lookup_terms(self, terms: list[str]) -> dict[str, tuple[float, int]]:
        """term -> (idf, bucket) for terms present in the corpus."""
        missing = [t for t in terms if t not in self._term_cache]
        if missing:
            tbl = self._lex_ds.to_table(
                columns=["term", "idf", "bucket"],
                filter=self._ds.field("term").isin(missing),
            )
            found = {}
            for t, idf, bucket in zip(
                tbl.column("term").to_pylist(),
                tbl.column("idf").to_pylist(),
                tbl.column("bucket").to_pylist(),
            ):
                found[t] = (float(idf), int(bucket))
            for t in missing:
                self._term_cache[t] = found.get(t)
        return {
            t: meta for t in terms if (meta := self._term_cache[t]) is not None
        }

    # -- postings ---------------------------------------------------------

    def _blocks_for(self, term_meta: dict[str, tuple[float, int]]) -> pd.DataFrame:
        buckets = sorted({b for _, b in term_meta.values()})
        terms = sorted(term_meta)
        flt = self._ds.field("bucket").isin(buckets) & self._ds.field("term").isin(
            terms
        )
        parts = []
        for seg_ds, factor in self._segments:
            pdf = seg_ds.to_table(columns=_POSTINGS_COLS, filter=flt).to_pandas()
            if factor != 1.0 and len(pdf):
                pdf["block_max_part"] = pdf["block_max_part"] * factor
            parts.append(pdf)
        return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)

    # -- query -------------------------------------------------------------

    def search(
        self,
        query: str,
        mode: str = spec.MODE_DISJUNCTIVE,
        k: int = spec.TOP_K_DEFAULT,
    ) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] under the canonical tie-break."""
        toks = sorted(set(spec.tokenize(query)))
        n_terms = len(toks)
        if not n_terms:
            return []
        meta = self._lookup_terms(toks)
        if not meta or (mode == spec.MODE_CONJUNCTIVE and len(meta) < n_terms):
            return []
        blocks = self._blocks_for(meta)
        cursors = []
        # ascending term order == the distributed path's groupby(sort=True)
        # cursor order -> identical float accumulation per doc
        for term, grp in blocks.groupby("term", sort=True):
            idf = meta[term][0]
            grp = grp.assign(block_max_score=idf * grp["block_max_part"])
            cursors.append(_Cursor(idf, grp, self.avgdl))
        hits = wand_topk(cursors, k, mode, n_terms)
        hits.sort(key=lambda h: (-h[1], h[0]))
        return [(r + 1, doc, score) for r, (doc, score) in enumerate(hits)]

    def search_batch(
        self,
        queries: dict[str, str],
        mode: str = spec.MODE_DISJUNCTIVE,
        k: int = spec.TOP_K_DEFAULT,
    ) -> pd.DataFrame:
        """(query_id, rank, doc_id, score) rows for a whole query dict."""
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in queries.items():
            for rank, doc_id, score in self.search(text, mode=mode, k=k):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc_id)
                scores.append(score)
        return pd.DataFrame(
            {
                "query_id": pd.array(qids, dtype="string"),
                "rank": pd.array(ranks, dtype="int32"),
                "doc_id": pd.array(docs, dtype="int64"),
                "score": pd.array(scores, dtype="float64"),
            }
        )
