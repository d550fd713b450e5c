#!/usr/bin/env python3
"""Index introspection: one page of facts about a built index, no Spark.

    python jobs/index_stats.py --index /data/idx [--top-terms 10] [--json]

Everything comes from metadata surfaces a 10^12-doc index keeps small by
construction — the registry, stats.json, the manifest ledger, parquet
footers, and the term-sorted lexicon (read via pyarrow with column
projection; the postings payload bytes are never touched, only their file
sizes are summed).  This is the operator's "what is this index?" tool:
corpus counts (live vs high-water vs tombstoned), segment/version/
compaction state, on-disk bytes per component, per-phase build times from
the manifest, vocabulary size and the heaviest terms.

The reference exposes its equivalent as ad-hoc Postgres queries against
its store (ref src/services/daos/raw_search_results_dao.py); here the
index IS the store, so the tool reads the index's own metadata.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if n < 1024 or unit == "TiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n} TiB"


def collect(index_root: str, top_terms: int = 10) -> dict:
    import pyarrow.dataset as ds

    from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

    cat = Catalog(index_root)
    reg = cat.read_registry()
    stats = cat.read_stats()

    n_docs = int(reg.get("n_docs", stats.get("n_docs", 0)))
    n_live = int(reg.get("n_live", n_docs))
    n_deleted = int(reg.get("n_deleted", 0))

    comp_bytes = {}
    for label, dirs in [
        ("postings", [s["dir"] for s in reg.get("segments", [])] or ["postings"]),
        ("lexicon", [reg.get("lexicon_dir", "lexicon")]),
        ("docmap", reg.get("docmap_dirs", ["docmap"])),
        ("tokens(staged)", reg.get("token_dirs", ["tokens"])),
        ("positions", [reg["positions_dir"]] if reg.get("positions_dir") else []),
        ("tombstones", reg.get("deleted_dirs", [])),
    ]:
        b = sum(_du(cat.path(d)) for d in dirs if os.path.isdir(cat.path(d)))
        if b:
            comp_bytes[label] = b

    # vocabulary + heaviest terms from the term-sorted lexicon (column
    # projection only; at any corpus scale this is vocab-sized metadata)
    lex_dir = cat.path(reg.get("lexicon_dir", "lexicon"))
    vocab, top = 0, []
    if os.path.isdir(lex_dir):
        dset = ds.dataset(lex_dir)
        tbl = dset.to_table(columns=["term", "df", "cf"])
        vocab = tbl.num_rows
        if vocab and top_terms:
            import pyarrow.compute as pc

            idx = pc.select_k_unstable(
                tbl, k=min(top_terms, vocab), sort_keys=[("df", "descending")]
            )
            t = tbl.take(idx)
            top = [
                {"term": t["term"][i].as_py(), "df": t["df"][i].as_py(),
                 "cf": t["cf"][i].as_py()}
                for i in range(t.num_rows)
            ]

    # per-phase build/extension times, last write wins (resume-safe)
    phases = {
        name: round(float(row.get("build_time_s", 0.0)), 2)
        for name, row in sorted(cat.latest_status().items())
        if row.get("build_time_s") is not None
    }

    return {
        "index_root": index_root,
        "version": reg.get("version", 0),
        "n_docs_high_water": n_docs,
        # in-stats = docs BM25 statistics count (tombstoned docs keep
        # counting until compaction purges them — Lucene semantics);
        # searchable = what queries can actually return
        "n_in_stats": n_live,
        "n_searchable": n_live - n_deleted,
        "n_tombstoned": n_deleted,
        "sum_dl": int(reg.get("sum_dl", stats.get("sum_dl", 0))),
        "avgdl": round(float(reg.get("avgdl", stats.get("avgdl", 0.0))), 4),
        "bm25": {"k1": stats.get("k1"), "b": stats.get("b")},
        "n_shards": stats.get("n_shards"),
        "n_buckets": stats.get("n_buckets"),
        "block_size": stats.get("block_size"),
        "n_segments": len(reg.get("segments", [])) or 1,
        "segments": [
            {
                "dir": s["dir"],
                "avgdl_at_encode": round(float(s.get("avgdl", 0.0)), 4),
                "source": (s.get("source") or {}).get("path"),
                "source_docs": (s.get("source") or {}).get("n_docs"),
            }
            for s in reg.get("segments", [])
        ],
        "has_positions": bool(reg.get("positions_dir")),
        "vocab_size": vocab,
        "top_terms_by_df": top,
        "bytes": {k: v for k, v in comp_bytes.items()},
        "bytes_total": sum(comp_bytes.values()),
        "phase_times_s": phases,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--top-terms", type=int, default=10)
    p.add_argument("--json", action="store_true",
                   help="machine-readable output")
    args = p.parse_args(argv)
    info = collect(args.index, args.top_terms)
    if args.json:
        print(json.dumps(info, indent=2))
        return 0
    print(f"index     {info['index_root']}  (version {info['version']})")
    print(
        f"docs      {info['n_searchable']:,} searchable"
        f" / {info['n_in_stats']:,} in statistics"
        f" / {info['n_tombstoned']:,} tombstoned"
        f" / {info['n_docs_high_water']:,} id high-water"
    )
    print(
        f"corpus    avgdl {info['avgdl']}  sum_dl {info['sum_dl']:,}"
        f"  bm25 k1={info['bm25']['k1']} b={info['bm25']['b']}"
    )
    print(
        f"layout    {info['n_segments']} segment(s)"
        f"  {info['n_shards']} shards x {info['n_buckets']} buckets"
        f"  block {info['block_size']}"
        f"  positions={'yes' if info['has_positions'] else 'no'}"
    )
    for s in info["segments"]:
        src = s["source"] or "(base build)"
        print(f"  segment {s['dir']}: {s['source_docs'] or '?'} docs from {src}")
    print(f"vocab     {info['vocab_size']:,} terms")
    for t in info["top_terms_by_df"]:
        print(f"  df {t['df']:>8,}  cf {t['cf']:>10,}  {t['term']}")
    for k, v in info["bytes"].items():
        print(f"disk      {_fmt_bytes(v):>12}  {k}")
    print(f"disk      {_fmt_bytes(info['bytes_total']):>12}  TOTAL")
    if info["phase_times_s"]:
        slow = sorted(
            info["phase_times_s"].items(), key=lambda kv: -kv[1]
        )[:8]
        print("phases    " + "  ".join(f"{k}={v}s" for k, v in slow))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
