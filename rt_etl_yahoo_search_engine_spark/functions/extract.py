"""HTML -> structured search-result extraction, reference-parity.

Re-implements the extraction semantics of the reference
(/root/reference, Vivolance/rt-etl-yahoo-search-engine) on the Python
STDLIB ``html.parser`` — BeautifulSoup is not available in this sandbox and
is NOT copied; this is a from-scratch implementation of the documented
traversal contract (SURVEY.md Appendix A):

* recursive child walk in document order, text nodes stripped and dropped if
  empty                          (ref: src/utils/extract_text_utils.py:65-90)
* a child of a ``<ul>``/``<ol>`` is path-named ``f"{index}_{name}"`` where
  index counts ALL siblings including text nodes
                                 (ref: src/utils/extract_text_utils.py:77-82)
* only nodes whose ancestor path has a tag matching ``^[0-9]+_li`` survive
        (ref: src/models/extractor_data_classes/extracted_text.py:34,71-79)
* identifier = "-".join(path up to and including the first li tag)
              (ref: src/models/extractor_data_classes/extracted_text.py:81-95)
* adjacent grouping: a new group opens whenever the identifier changes from
  the previous surviving node   (ref: src/utils/extract_text_utils.py:26-32)
* classification precedence date > url > body; a SECOND date-classified node
  in a group falls through to body (the reference's elif-chain,
  src/utils/extract_text_utils.py:36-49); url test is regex OR a literal
  "› " substring (ref: extracted_text.py:35-37,101-103)
* groups with >= 2 nonempty of {link, body, date} are emitted; fields are
  the group's texts " "-joined    (ref: src/services/search_result_extractor.py:22-27,
  src/models/extractor_data_classes/extracted_text_group.py:18-43)

Byte-identity contract: for a given url the extracted text produced here is
the canonical value of the ``text`` column of the pages table.  The byte-
identity oracle is this module's pure-Python core run standalone (bs4 itself
cannot run in the sandbox; substitution documented in SURVEY.md §7 step 1).

The Spark-facing wrappers at the bottom are Arrow-batched ``mapInPandas``
operators — vectorized transport, pure Python per document inside the batch,
exactly the shape BASELINE.json's input_hint prescribes.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd

# Patterns match the reference verbatim (extracted_text.py:31-37).
DATE_PATTERN = re.compile(
    r"\b(Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?"
    r"|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)"
    r"\s\d{1,2},\s\d{4}\b"
)
LI_PATTERN = re.compile(r"[0-9]+_li")
URL_PATTERN = re.compile(r"\b(?:www\.)?[\w-]+\.(?:[\w-]+\.)?[a-zA-Z]{2,6}\b")

# HTML void elements never take children (WHATWG list).
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


# --- minimal DOM ------------------------------------------------------------


@dataclass
class _Node:
    """Element node; children are _Node or str (text/comment content)."""

    name: str
    children: list = field(default_factory=list)


class _DomBuilder(HTMLParser):
    """Builds a _Node tree.  Unmatched end tags are ignored; an end tag pops
    the open-element stack up to its nearest matching open tag (the same
    tolerant recovery bs4's html.parser tree builder applies)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node(name="[document]")
        self._stack: list[_Node] = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = _Node(name=tag)
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._stack[-1].children.append(_Node(name=tag))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                return
        # no matching open tag: ignore (tolerant recovery)

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)

    def handle_comment(self, data: str) -> None:
        # bs4's Comment subclasses NavigableString (a str), so the reference's
        # isinstance(element, str) walk treats comment text as a text node —
        # mirror that.
        self._stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


# --- extraction core (pure Python; the byte-identity oracle) -----------------


@dataclass
class ExtractedText:
    parent_tags: list[str]  # root-first, innermost element is "str"
    text: str

    @property
    def is_search_result(self) -> bool:
        return any(LI_PATTERN.match(tag) for tag in self.parent_tags)

    @property
    def identifier_tags(self) -> str:
        out: list[str] = []
        for tag in self.parent_tags:
            out.append(tag)
            if LI_PATTERN.match(tag):
                break
        return "-".join(out)

    @property
    def is_date(self) -> bool:
        return DATE_PATTERN.search(self.text) is not None

    @property
    def is_url(self) -> bool:
        return URL_PATTERN.search(self.text) is not None or "› " in self.text


@dataclass
class ExtractedTextGroup:
    identifier: str
    link: list[str] = field(default_factory=list)
    body: list[str] = field(default_factory=list)
    date: list[str] = field(default_factory=list)

    @property
    def information_count(self) -> int:
        return int(bool(self.link)) + int(bool(self.body)) + int(bool(self.date))


def extract_text_nodes(html: str) -> list[ExtractedText]:
    """Document-order text nodes with their ancestor tag paths."""

    def recurse(node: _Node) -> list[ExtractedText]:
        texts: list[ExtractedText] = []
        for index, child in enumerate(node.children):
            if isinstance(child, str):
                stripped = child.strip()
                if stripped:
                    texts.append(ExtractedText(parent_tags=["str"], text=stripped))
            else:
                parent_tag = (
                    f"{index}_{child.name}"
                    if node.name in ("ul", "ol")
                    else child.name
                )
                sub = recurse(child)
                for s in sub:
                    s.parent_tags.append(parent_tag)
                if sub:
                    texts.extend(sub)
        return texts

    nodes = recurse(parse_html(html))
    for n in nodes:
        n.parent_tags = list(reversed(n.parent_tags))
    return nodes


def extract_groups(html: str) -> list[ExtractedTextGroup]:
    """Adjacent-identifier grouping with the reference's routing elif-chain."""
    current_identifier = ""
    current: ExtractedTextGroup | None = None
    groups: list[ExtractedTextGroup] = []
    for node in extract_text_nodes(html):
        if not node.is_search_result:
            continue
        identifier = node.identifier_tags
        if current_identifier != identifier:
            if current is not None:
                groups.append(current)
            current = ExtractedTextGroup(identifier)
            current_identifier = identifier
        if node.is_date and current and len(current.date) == 0:
            current.date.append(node.text)
        elif current and node.is_url:
            current.link.append(node.text)
        elif current:
            current.body.append(node.text)
    if current is not None:
        groups.append(current)
    return groups


def extract_results(html: str) -> list[dict]:
    """Emitted search results: groups with info_count >= 2, fields space-joined."""
    out = []
    for g in extract_groups(html):
        if g.information_count >= 2:
            out.append(
                {
                    "link": " ".join(g.link),
                    "date": " ".join(g.date),
                    "body": " ".join(g.body),
                }
            )
    return out


def document_text(html: str) -> str:
    """Canonical extracted text of a whole page (the pages.text column).

    One line per emitted result: the nonempty of (link, date, body) joined by
    a single space; lines joined by a single newline.  This is the byte-
    identical-per-url value the index consumes.
    """
    lines = []
    for r in extract_results(html):
        parts = [p for p in (r["link"], r["date"], r["body"]) if p]
        lines.append(" ".join(parts))
    return "\n".join(lines)


# --- Spark-facing Arrow-batched operators ------------------------------------

EXTRACTED_SCHEMA = "url string, seq int, link string, date string, body string"
PAGE_TEXT_SCHEMA = "url string, text string"


def _decode(html) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", errors="replace")
    return str(html)


def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: pages(url, html) -> extracted(url, seq, link, date, body).

    1 row in, 0..N rows out (the reference extractor's flatMap shape,
    ref: src/services/search_result_extractor.py:20-33).  Null html -> 0 rows
    (guard mirrors ref: src/extractor_process.py:116-123).
    """
    for pdf in batches:
        urls, seqs, links, dates, bodies = [], [], [], [], []
        for url, html in zip(pdf["url"], pdf["html"]):
            if html is None:
                continue
            for i, r in enumerate(extract_results(_decode(html))):
                urls.append(url)
                seqs.append(i)
                links.append(r["link"])
                dates.append(r["date"])
                bodies.append(r["body"])
        yield pd.DataFrame(
            {"url": urls, "seq": seqs, "link": links, "date": dates, "body": bodies}
        ).astype({"seq": "int32"}, errors="ignore")


def page_text_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: pages(url, html) -> (url, text) with canonical doc text."""
    for pdf in batches:
        texts = [
            document_text(_decode(h)) if h is not None else ""
            for h in pdf["html"]
        ]
        yield pd.DataFrame({"url": pdf["url"].values, "text": texts})


def extract_df(pages_df):
    """pages(url, html, ...) -> extracted DataFrame. Column-pruned before the
    Arrow boundary so html bytes are the only payload shipped to Python."""
    return pages_df.select("url", "html").mapInPandas(
        extract_batch, schema=EXTRACTED_SCHEMA
    )


def page_text_df(pages_df):
    """pages(url, html, ...) -> (url, text) DataFrame."""
    return pages_df.select("url", "html").mapInPandas(
        page_text_batch, schema=PAGE_TEXT_SCHEMA
    )
