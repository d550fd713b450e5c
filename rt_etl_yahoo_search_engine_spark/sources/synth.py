"""Deterministic synthetic webtext corpus (the engine's input table).

Materializes the BASELINE.json ``input_hint`` shape:
    pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Generation rules follow FIXTURES.md §A exactly:
  url      https://synth.example/{lang}/{i:08d}         (unique, non-null)
  warc_ts  2024-09-21T00:00:00 UTC + i seconds
  html     UTF-8 bytes of a SERP-like page (well-formed <ol>/<li> so the
           reference's LI-gate passes); bodies drawn from a Zipf(1.2)
           10k-term vocabulary; reference query terms injected into a known
           subset so every query (conjunctive AND disjunctive) has matches
  text     null at generation time (filled by the extractor; byte-identity
           column under test)
  lang     "en", with a 2% "xx" slice to exercise lang filtering

Everything is seeded PER DOCUMENT (seed = 42_000_000 + i), so output is
byte-identical regardless of partitioning, parallelism, or generation order —
no wall-clock, no global RNG state (SURVEY.md §1.3).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..spec import REFERENCE_QUERIES, tokenize

VOCAB_SIZE = 10_000
VOCAB = np.array([f"w{k:04d}" for k in range(VOCAB_SIZE)])
XX_VOCAB = np.array([f"x{k:03d}" for k in range(500)])

_QUERY_TOKEN_LISTS = [tokenize(q) for q in REFERENCE_QUERIES.values()]
QUERY_TERMS = sorted({t for toks in _QUERY_TOKEN_LISTS for t in toks})

_MONTHS = [
    "Jan", "February", "Mar", "April", "May", "June",
    "Jul", "August", "Sep", "October", "Nov", "December",
]

EPOCH = dt.datetime(2024, 9, 21, 0, 0, 0)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _zipf_words(rng: np.random.Generator, n: int, vocab: np.ndarray) -> list[str]:
    idx = (rng.zipf(1.2, n) - 1) % len(vocab)
    return list(vocab[idx])


def gen_page(i: int) -> dict:
    """One deterministic page. Pure function of i.  All randomness is drawn
    in a handful of batched numpy calls (per-call overhead dominates tiny
    draws at corpus scale)."""
    rng = np.random.default_rng(42_000_000 + i)
    lang = "xx" if i % 50 == 49 else "en"
    vocab = XX_VOCAB if lang == "xx" else VOCAB

    # query-term injection (en docs only)
    inject: list[str] = []
    if lang == "en":
        qi = i % 37
        if qi < len(_QUERY_TOKEN_LISTS):
            inject.extend(_QUERY_TOKEN_LISTS[qi])  # full query -> conjunctive hits
        mask = rng.random(len(QUERY_TERMS)) < 0.03
        reps = rng.integers(1, 4, len(QUERY_TERMS))
        for t, m, r in zip(QUERY_TERMS, mask, reps):
            if m:
                inject.extend([t] * int(r))

    # Realistic SERP weight (a real Yahoo results page carries ~10 organic
    # results with multi-line abstracts plus nav/footer chrome the extractor
    # must walk and reject): 8-12 results, 40-100-word bodies, 8-14 nav
    # items, a 60-120-word footer.  ~8-10 KB of html per page.
    n_results = int(rng.integers(8, 13))
    n_body = rng.integers(40, 101, n_results)
    n_title = rng.integers(3, 7, n_results)
    sites = rng.integers(0, 500, n_results)
    months = rng.integers(0, 12, n_results)
    days = rng.integers(1, 29, n_results)
    years = rng.integers(2020, 2025, n_results)
    kinds = rng.random(n_results)
    n_nav = int(rng.integers(8, 15))
    n_footer = int(rng.integers(60, 121))
    # one zipf draw for every word on the page (bodies + titles + crumbs +
    # chrome)
    total = int(n_body.sum() + n_title.sum()) + 2 * n_results + n_nav + n_footer
    pool = vocab[(rng.zipf(1.2, total) - 1) % len(vocab)]
    pos = 0
    lis = []
    for r in range(n_results):
        words = list(pool[pos : pos + int(n_body[r])])
        pos += int(n_body[r])
        title = " ".join(pool[pos : pos + int(n_title[r])])
        pos += int(n_title[r])
        crumbs = " › ".join(pool[pos : pos + 2])
        pos += 2
        if r == 0 and inject:
            # deterministic interleave of injected terms into the first body
            for j, t in enumerate(inject):
                words.insert((j * 7) % (len(words) + 1), t)
        body = " ".join(words)
        site = f"site{int(sites[r])}.example.com"
        date = f"{_MONTHS[int(months[r])]} {int(days[r])}, {int(years[r])}"
        kind = kinds[r]
        if kind < 0.70:  # full result: link + date + body (+ title)
            li = (
                f"  <li>\n    <h3><a>{site} › {crumbs}</a></h3>\n"
                f"    <span>{date}</span>\n"
                f"    <p>{title} {body}</p>\n  </li>"
            )
        elif kind < 0.90:  # link + body, no date
            li = (
                f"  <li>\n    <h3><a>{site} › {crumbs}</a></h3>\n"
                f"    <p>{title} {body}</p>\n  </li>"
            )
        else:  # under-informative: body only -> filtered by info_count >= 2
            li = f"  <li>\n    <p>{body}</p>\n  </li>"
        lis.append(li)

    # chrome: nav items live under <ul>/<li> like a real page — the
    # extractor walks them, groups them, and the info_count >= 2 gate drops
    # them (each group is a single bare link); the footer paragraphs fail
    # the LI-gate outright.  Pure walk-and-reject work, as in production.
    nav_items = "\n".join(
        f"    <li><a>{w}</a></li>" for w in pool[pos : pos + n_nav]
    )
    pos += n_nav
    f_words = list(pool[pos : pos + n_footer])
    pos += n_footer
    half = len(f_words) // 2
    footer = (
        f"  <p>{' '.join(f_words[:half])}</p>\n"
        f"  <p>{' '.join(f_words[half:])}</p>"
    )
    html = (
        "<html><head><title>search results</title></head><body>\n"
        "<div id=\"nav\">\n  <ul>\n" + nav_items + "\n  </ul>\n</div>\n"
        "<div><h1>results</h1>\n<ol>\n"
        + "\n".join(lis)
        + "\n</ol>\n</div>\n<div id=\"footer\">\n"
        + footer
        + "\n</div>\n</body></html>"
    )
    return {
        "url": f"https://synth.example/{lang}/{i:08d}",
        "warc_ts": EPOCH + dt.timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": None,
        "lang": lang,
    }


def gen_cf_page(i: int) -> dict:
    """One CLOSED-FORM page: every extracted field is an arithmetic
    function of (i, r) — no RNG — so the full (url, seq, link, date,
    body) extraction output is expressible in ANSI SQL and DuckDB can
    serve as a value oracle for the HTML-extraction path (the same
    trick that value-gated the media fake decode).

    Grammar per page i (n_results = 3 + i % 5; result r):
      link  "site{(13i+7r)%500}.example.com › w{(31i+3r)%10000:04d}
             › w{(17i+11r)%10000:04d}"
      date  "{MONTHS[(i+r)%12]} {1+(3i+5r)%28}, {2020+(i+2r)%5}"
      body  "w{(7i+13r+j)%10000:04d}" for j in 0..(5+(i+r)%4)-1,
            space-joined
    Shape variants exercising the reference's routing rules by value
    (ref: src/utils/extract_text_utils.py:36-49,
     src/services/search_result_extractor.py:22-27):
      (i+r) % 7 == 3   -> body-only <li>: info_count 1, DROPPED by the
                          gate (so seq renumbers over kept results)
      (5i+r) % 11 == 0 -> a SECOND date <span>: the elif-chain routes
                          it to body, emitted body = "{date} {body}"
    """
    n_results = 3 + i % 5
    lis = []
    for r in range(n_results):
        site = f"site{(i * 13 + r * 7) % 500}.example.com"
        c1 = f"w{(i * 31 + r * 3) % 10000:04d}"
        c2 = f"w{(i * 17 + r * 11) % 10000:04d}"
        link = f"{site} › {c1} › {c2}"
        month = _MONTHS[(i + r) % 12]
        day = 1 + (i * 3 + r * 5) % 28
        year = 2020 + (i + 2 * r) % 5
        date = f"{month} {day}, {year}"
        n_body = 5 + (i + r) % 4
        body = " ".join(
            f"w{(i * 7 + r * 13 + j) % 10000:04d}" for j in range(n_body)
        )
        if (i + r) % 7 == 3:
            li = f"  <li>\n    <p>{body}</p>\n  </li>"
        elif (i * 5 + r) % 11 == 0:
            li = (
                f"  <li>\n    <h3><a>{link}</a></h3>\n"
                f"    <span>{date}</span>\n    <span>{date}</span>\n"
                f"    <p>{body}</p>\n  </li>"
            )
        else:
            li = (
                f"  <li>\n    <h3><a>{link}</a></h3>\n"
                f"    <span>{date}</span>\n    <p>{body}</p>\n  </li>"
            )
        lis.append(li)
    html = "<html><body>\n<ol>\n" + "\n".join(lis) + "\n</ol>\n</body></html>"
    return {
        "url": f"https://cf.example/{i:08d}",
        "warc_ts": EPOCH + dt.timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": None,
        "lang": "en",
    }


def synth_cf_pages_df(spark, n_docs: int, num_partitions: int | None = None):
    """Distributed closed-form corpus (see gen_cf_page)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([gen_cf_page(int(i)) for i in pdf["id"]])

    rng_df = spark.range(
        0, n_docs, 1, num_partitions or spark.sparkContext.defaultParallelism
    )
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def synth_pages_pandas(n_docs: int, start: int = 0) -> pd.DataFrame:
    rows = [gen_page(i) for i in range(start, start + n_docs)]
    return pd.DataFrame(rows)


def synth_pages_df(spark, n_docs: int, num_partitions: int | None = None):
    """Distributed generation: spark.range -> mapInPandas(gen). Each task
    generates only its id range; deterministic under any partitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([gen_page(int(i)) for i in pdf["id"]])

    rng_df = spark.range(0, n_docs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages(spark, n_docs: int, path: str, num_partitions: int | None = None) -> None:
    synth_pages_df(spark, n_docs, num_partitions).write.mode("overwrite").parquet(path)
