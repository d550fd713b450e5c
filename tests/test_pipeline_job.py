"""End-to-end pipeline job (jobs/pipeline_webtext.py) in both input
modes: --docs (document table) and --pages (crawl table with the
canonicalize + snapshot-dedup + extract front end)."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo/jobs")


def _run_main(argv, capsys):
    import pipeline_webtext

    rc = pipeline_webtext.main(argv)
    assert rc == 0
    out = [
        line
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    return json.loads(out[-1])


def test_docs_mode(spark, tmp_path, capsys):
    docs = [
        (1, "s1", "en", " ".join(f"abc{i}" for i in range(100))),
        (2, "s1", "en", " ".join(f"cde{i}" for i in range(100))),
        (3, "s1", "xx", "lang-gated row"),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        docs, "doc_id long, source string, lang string, text string"
    ).write.parquet(d)
    summary = _run_main(
        ["--docs", d, "--out", str(tmp_path / "o"), "--budget", "64"], capsys
    )
    assert summary["stages"].get("lang", 0) == 1
    assert summary["clean_docs"] == 2
    assert summary["packed_chunks"] >= summary["clean_docs"]


def test_pages_mode_dedups_canonical_urls(spark, tmp_path, capsys):
    import datetime as dt

    # SERP-shaped html (link + date + body inside an <li>): the extractor
    # is the reference's byte-identity SERP walk, so a bare <p> page
    # extracts to "" — a real result group is required to produce text
    def mk_html(prefix):
        body = " ".join(f"{prefix}{i}" for i in range(100))
        return (
            "<html><body><ol>\n"
            "  <li>\n    <h3><a>site1.example.com › aa › bb</a></h3>\n"
            "    <span>May 3, 2021</span>\n"
            f"    <p>{body}</p>\n  </li>\n"
            "</ol></body></html>"
        ).encode()

    html, html_b = mk_html("efg"), mk_html("hij")
    t0 = dt.datetime(2024, 9, 21)
    pages = [
        # three captures of ONE canonical url (tracking param / fragment
        # variants) -> one survivor (the latest)
        ("https://A.example/x?utm_source=f", t0, html, None, "en"),
        ("https://a.example/x#frag", t0 + dt.timedelta(1), html, None, "en"),
        ("https://a.example/x", t0 + dt.timedelta(2), html, None, "en"),
        # a second, distinct url
        ("https://b.example/y", t0, html_b, None, "en"),
    ]
    d = str(tmp_path / "pages")
    spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(d)
    summary = _run_main(
        ["--pages", d, "--out", str(tmp_path / "o"), "--budget", "64"], capsys
    )
    # snapshot dedup happened BEFORE the funnel: only 2 docs entered
    assert sum(summary["stages"].values()) == 2
    assert summary["clean_docs"] == 2
    clean = spark.read.parquet(str(tmp_path / "o" / "clean_docs")).collect()
    assert sorted(r.source for r in clean) == ["a.example", "b.example"]
    want_tok = {"a.example": "efg0", "b.example": "hij0"}
    for r in clean:
        assert want_tok[r.source] in r.text  # extractor filled text
