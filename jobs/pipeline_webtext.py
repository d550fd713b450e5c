#!/usr/bin/env python3
"""spark-submit entry point: the full training-data preparation pipeline.

Chains the webtext hygiene operators end to end — the C4/RefinedWeb-shaped
run a 100 TB corpus goes through before tokenizer/LM training.

With ``--pages`` the pipeline starts from the crawl table itself
(url, warc_ts, html, text, lang):

    0. URL canonicalization + latest-snapshot dedup
       (functions/webtext.normalize_urls / latest_snapshot — one
       canonical capture per url, tracking params and re-fetches gone),
       then the byte-identity HTML extractor fills missing text and the
       canonical host becomes ``source``; with ``--docs`` these steps are
       skipped and the (doc_id, source, lang, text) table is read as-is.

    1. quality gate      (functions/webtext.quality_gate — ordered
                          lang/length/word-len/repetition rules,
                          first-failure attribution)
    2. C4 line dedup     (functions/webtext.line_dedup — duplicate
                          10-token lines dropped corpus-wide, docs
                          reconstructed; emptied docs vanish)
    3. PII redaction     (the webtext scrub regexes — emails/phones/IPv4
                          replaced with typed tags)
    4. sequence packing  (functions/packing.pack_sequences — per-source
                          concat-then-chunk slots for the training loader)

Outputs under --out:
    clean_docs/   (doc_id, source, lang, text)     — redacted, deduped
    packed/       (doc_id, source, n_tokens, chunk_id, chunk_offset)
    report/       one row per funnel stage + pipeline totals

and prints a single JSON summary line (stage counts, token totals).

    spark-submit --py-files dist/engine.zip jobs/pipeline_webtext.py \
        --docs /data/documents.parquet --out /data/clean [--budget 2048]

Every stage is a deterministic pure transform, so rerunning overwrites
byte-identical outputs (idempotent by determinism, not by ledger).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", help="documents parquet path (doc_id, source, lang, text)")
    src.add_argument("--pages", help="crawl pages parquet path (url, warc_ts, html, text, lang) — prepends URL canonicalization + latest-snapshot dedup + HTML extraction")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--budget", type=int, default=2048,
                   help="packing token budget per chunk")
    p.add_argument("--min-tokens", type=int, default=16,
                   help="quality gate: minimum token count")
    p.add_argument("--max-tokens", type=int, default=200,
                   help="quality gate: maximum token count (raise for "
                        "long-page corpora; the default is calibrated "
                        "for the short-document test table)")
    p.add_argument("--master", default=None)
    a = p.parse_args(argv)

    from pyspark.sql import functions as F

    from rt_etl_yahoo_search_engine_spark.functions.packing import (
        pack_sequences,
    )
    from rt_etl_yahoo_search_engine_spark.functions.webtext import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        line_dedup,
        quality_gate,
    )
    from rt_etl_yahoo_search_engine_spark.session import get_spark

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app="pipeline-webtext", master=a.master)
    spark.sparkContext.setLogLevel("ERROR")
    if a.pages:
        # crawl-native front end: canonical-url snapshot dedup, then the
        # byte-identity HTML extractor fills text; doc identity is the
        # 64-bit hash of the canonical url (deterministic, join-stable),
        # source is the canonical host — the (doc_id, source, lang, text)
        # contract the doc stages below expect
        from rt_etl_yahoo_search_engine_spark.functions.extract import (
            page_text_df,
        )
        from rt_etl_yahoo_search_engine_spark.functions.webtext import (
            latest_snapshot,
            normalize_urls,
        )

        snap = latest_snapshot(normalize_urls(
            spark.read.parquet(a.pages)
        ))
        txt = page_text_df(snap).withColumnRenamed("text", "ex_text")
        docs = snap.join(txt, "url").select(
            F.xxhash64("norm_url").alias("doc_id"),
            F.expr(
                "regexp_extract(norm_url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)"
            ).alias("source"),
            "lang",
            F.coalesce("text", "ex_text").alias("text"),
        )
    else:
        docs = spark.read.parquet(a.docs)

    # 1. quality funnel — keep survivors, report the rest per rule
    gated = quality_gate(
        docs, min_tokens=a.min_tokens, max_tokens=a.max_tokens
    ).persist()
    stages = {
        r["stage"]: r["n"]
        for r in gated.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    kept = docs.join(
        gated.filter(F.col("stage") == "kept").select("doc_id"), "doc_id"
    )

    # 2. C4 line-level cross-doc dedup + reconstruction
    deduped = line_dedup(kept, keep_text=True).select("doc_id", "clean_text")

    # 3. PII scrub on the reconstructed text
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("clean_text", EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IPV4_RE,
        "<IP>",
    )
    clean = (
        deduped.join(kept.select("doc_id", "source", "lang"), "doc_id")
        .select("doc_id", "source", "lang", red.alias("text"))
        .persist()
    )
    clean.write.mode("overwrite").parquet(f"{a.out}/clean_docs")

    # 4. per-source sequence packing for the training loader
    packed = pack_sequences(clean, budget=a.budget)
    packed.write.mode("overwrite").parquet(f"{a.out}/packed")

    totals = packed.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.count_distinct("source", "chunk_id")).alias("chunks"),
    ).collect()[0]
    report = [
        {"stage": s, "n_docs": int(n)} for s, n in sorted(stages.items())
    ]
    spark.createDataFrame(report).write.mode("overwrite").parquet(
        f"{a.out}/report"
    )
    print(
        json.dumps(
            {
                "stages": {s: int(n) for s, n in sorted(stages.items())},
                "clean_docs": int(totals["docs"]),
                "clean_tokens": int(totals["tokens"] or 0),
                "packed_chunks": int(totals["chunks"]),
                "budget": a.budget,
                "out": a.out,
            }
        )
    )
    gated.unpersist()
    clean.unpersist()
    if owns_session:  # don't kill a caller-owned session (tests, notebooks)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
