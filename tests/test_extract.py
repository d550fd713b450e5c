"""Extraction goldens (FIXTURES.md §B) + Spark/pure-Python byte-identity.

Expected values are derived from the reference's documented semantics
(SURVEY.md Appendix A): LI-gate, {index}_li naming counting text-node
siblings, adjacent-identifier grouping, date>url>body precedence with
first-date-only routing, info_count>=2 emission, single-space joins.
"""

from rt_etl_yahoo_search_engine_spark.functions.extract import (
    document_text,
    extract_groups,
    extract_results,
    extract_text_nodes,
)

POSITIVE_MULTI = """<html><body><div><ol>
  <li><a>example.com › path</a> <span>Jan 5, 2024</span> <p>alpha beta</p></li>
  <li><a>www.shop.io › sale</a> <span>Mar 12, 2023</span> <p>gamma delta</p></li>
  <li><a>news.site.org › world</a> <span>December 1, 2020</span> <p>epsilon</p></li>
</ol></div></body></html>"""

UNDER_INFORMATIVE = """<html><body><ol>
  <li><p>only body words here</p></li>
  <li><span>Jan 5, 2024</span></li>
</ol></body></html>"""

# the reference's literal unit-test Case 1 shape: no <ul>/<ol> ancestry
NO_LI = """<html><body><div>
  <div><a>example.com</a><span>Jan 5, 2024</span><p>body text</p></div>
</div></body></html>"""

DATE_FIRST_ONLY = """<html><body><ol>
  <li><a>example.com › x</a> <span>Jan 5, 2024</span> <span>Feb 6, 2025</span></li>
</ol></body></html>"""

PRECEDENCE = """<html><body><ol>
  <li><span>Visit example.com on Jan 5, 2024</span> <a>docs › guides</a></li>
</ol></body></html>"""


def test_positive_multi_three_rows():
    rows = extract_results(POSITIVE_MULTI)
    assert len(rows) == 3
    assert rows[0] == {
        "link": "example.com › path",
        "date": "Jan 5, 2024",
        "body": "alpha beta",
    }
    assert rows[1]["link"] == "www.shop.io › sale"
    assert rows[2]["date"] == "December 1, 2020"


def test_li_index_counts_text_node_siblings():
    # children of <ol>: text, li, text, li, text, li, text -> li indexes 1,3,5
    nodes = extract_text_nodes(POSITIVE_MULTI)
    idents = {n.identifier_tags for n in nodes if n.is_search_result}
    assert idents == {
        "html-body-div-ol-1_li",
        "html-body-div-ol-3_li",
        "html-body-div-ol-5_li",
    }


def test_under_informative_filtered():
    assert extract_results(UNDER_INFORMATIVE) == []
    # groups exist but fail the info_count >= 2 gate
    assert len(extract_groups(UNDER_INFORMATIVE)) == 2


def test_no_li_gate():
    # reference code behavior (NOT its contradictory unit test): no \d+_li
    # ancestor -> nothing survives (SURVEY.md §5 quirk)
    assert extract_results(NO_LI) == []


def test_second_date_routes_to_body():
    rows = extract_results(DATE_FIRST_ONLY)
    assert len(rows) == 1
    assert rows[0]["date"] == "Jan 5, 2024"
    # second date-classified node falls through the elif chain to body
    assert rows[0]["body"] == "Feb 6, 2025"


def test_classification_precedence():
    rows = extract_results(PRECEDENCE)
    assert len(rows) == 1
    # date wins over url regex even though example.com matches URL_PATTERN
    assert rows[0]["date"] == "Visit example.com on Jan 5, 2024"
    # "› " substring alone (no domain-looking token) classifies as url
    assert rows[0]["link"] == "docs › guides"


def test_empty_and_garbage_html():
    assert extract_results("") == []
    assert document_text("") == ""
    assert extract_results("<p>no lists here</p>") == []
    assert extract_results("<ol><li>") in ([],)  # unclosed tags tolerated


def test_document_text_format():
    txt = document_text(POSITIVE_MULTI)
    lines = txt.split("\n")
    assert lines[0] == "example.com › path Jan 5, 2024 alpha beta"
    assert len(lines) == 3


def test_spark_extract_matches_pure_python(spark):
    """Byte-identity: Spark mapInPandas output == vendored pure-Python core."""
    from rt_etl_yahoo_search_engine_spark.functions.extract import (
        extract_df,
        page_text_df,
    )
    from rt_etl_yahoo_search_engine_spark.sources.synth import (
        gen_page,
        synth_pages_df,
    )

    n = 200
    pages = synth_pages_df(spark, n, num_partitions=4)
    got_text = {r["url"]: r["text"] for r in page_text_df(pages).collect()}
    got_rows = {}
    for r in extract_df(pages).collect():
        got_rows.setdefault(r["url"], []).append(r)

    for i in range(n):
        p = gen_page(i)
        html = p["html"].decode("utf-8")
        assert got_text[p["url"]] == document_text(html), p["url"]
        expected = extract_results(html)
        actual = sorted(got_rows.get(p["url"], []), key=lambda r: r["seq"])
        assert len(actual) == len(expected)
        for a, e in zip(actual, expected):
            assert (a["link"], a["date"], a["body"]) == (
                e["link"],
                e["date"],
                e["body"],
            )


def test_closed_form_grammar_matches_extractor():
    """The closed-form SERP corpus (sources/synth.gen_cf_page) must extract
    to EXACTLY the rows its arithmetic grammar predicts — this is the local
    guard for the extract_structured DuckDB value oracle (grammar drift in
    either place fails here before it fails at the driver)."""
    from rt_etl_yahoo_search_engine_spark.sources.synth import (
        _MONTHS,
        gen_cf_page,
    )

    for i in range(0, 60):
        html = gen_cf_page(i)["html"].decode("utf-8")
        expected = []
        for r in range(3 + i % 5):
            if (i + r) % 7 == 3:
                continue  # body-only li: dropped by the info_count gate
            link = (
                f"site{(i * 13 + r * 7) % 500}.example.com "
                f"› w{(i * 31 + r * 3) % 10000:04d} "
                f"› w{(i * 17 + r * 11) % 10000:04d}"
            )
            date = (
                f"{_MONTHS[(i + r) % 12]} "
                f"{1 + (i * 3 + r * 5) % 28}, {2020 + (i + 2 * r) % 5}"
            )
            body = " ".join(
                f"w{(i * 7 + r * 13 + j) % 10000:04d}"
                for j in range(5 + (i + r) % 4)
            )
            if (i * 5 + r) % 11 == 0:
                body = f"{date} {body}"  # second date span routed to body
            expected.append({"link": link, "date": date, "body": body})
        assert extract_results(html) == expected, f"page {i}"
