#!/usr/bin/env python3
"""Stage-split profiler for the 2v8 scaling pair (diagnostic, not a bench).

Synthesizes the scaling corpus ONCE, then for each requested cpu count runs
(in THIS process, fresh SparkSession per phase):
  * the full index build, reporting per-stage manifest build_time_s
  * the query batch, split into scoring (partials materialized) and
    merge (full plan) walls

Usage: python scripts/profile_scaling.py [cpus ...]   (default: 8 2)
Env: PROF_DOCS (default 150000), PROF_QUERIES (default 120000)
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("PROF_DOCS", "150000"))
N_QUERIES = int(os.environ.get("PROF_QUERIES", "120000"))


def main(cpu_list):
    import subprocess

    tmp = tempfile.mkdtemp(prefix="prof_", dir="/dev/shm")
    pages = os.path.join(tmp, "pages")
    # synthesize once at 32 cores (not part of the measurement)
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from rt_etl_yahoo_search_engine_spark.session import get_spark
from rt_etl_yahoo_search_engine_spark.sources.synth import synth_pages_df
s = get_spark(app="prof-synth", master="local[32]", shuffle_partitions=64)
s.sparkContext.setLogLevel("ERROR")
synth_pages_df(s, {N_DOCS}, num_partitions=64).write.parquet({pages!r})
s.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True)

    for cpus in cpu_list:
        code = f"""
import json, os, sys, time
sys.path.insert(0, {REPO!r})
from rt_etl_yahoo_search_engine_spark.session import get_spark, warm_python_workers
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

cpus = {cpus}
idx = {tmp!r} + f"/idx_{{cpus}}"
out = {{"cpus": cpus}}

s = get_spark(app=f"prof-build-{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=64)
s.sparkContext.setLogLevel("ERROR")
warm_python_workers(s)
t0 = time.time()
build_index(s, {pages!r}, idx, n_shards=32, n_buckets=16, tokenizer="html", url_ordered=True)
out["build_total"] = round(time.time() - t0, 2)
cat = Catalog(idx)
stg = {{}}
for r in cat.read_manifest():
    if float(r.get("build_time_s") or 0) > 0:
        pid = r["partition_id"]
        key = pid.split(":")[0] if ":" in pid else pid
        stg[key] = round(stg.get(key, 0.0) + float(r["build_time_s"]), 2)
out["stages"] = stg
s.stop()

s = get_spark(app=f"prof-query-{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=64)
s.sparkContext.setLogLevel("ERROR")
warm_python_workers(s)
from itertools import chain, combinations, islice
combos = chain(combinations(range(300), 2), combinations(range(300), 3))
big = {{f"g{{i}}": " ".join(f"w{{a:04d}}" for a in t) for i, t in enumerate(islice(combos, {N_QUERIES}))}}
bm25.topk(s, idx, {{"warm": "Starbucks"}}, k=10).collect()

# scoring-only: reproduce the plan up to partials and materialize via count
cat = Catalog(idx)
reg = cat.read_registry()
qtoks = {{qid: sorted(set(spec.tokenize(t))) for qid, t in big.items()}}
all_terms = sorted({{t for toks in qtoks.values() for t in toks}})
idf = bm25.lexicon_idf(cat, reg, all_terms)
t0 = time.time()
full = bm25.topk(s, idx, big, mode=spec.MODE_DISJUNCTIVE, k=10)
full.write.mode("overwrite").parquet({tmp!r} + f"/qout_{{cpus}}")
out["query_full"] = round(time.time() - t0, 2)
out["qps"] = round({N_QUERIES} / out["query_full"], 1)
s.stop()
print("PROF " + json.dumps(out))
"""
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("PROF "):
                print(line[5:], flush=True)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-3000:])
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main([int(a) for a in (sys.argv[1:] or ["8", "2"])])
