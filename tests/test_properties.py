"""Property-based tests (hypothesis) for the deterministic core.

These are pure-Python properties — no SparkSession — so they run in
milliseconds and explore input space the fixture corpus doesn't.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from extractor.cleaning import clean_stdout_output, strip_grounding_annotations
from extractor.html_extract import html_to_markdown

text_st = st.text(
    alphabet=st.characters(codec="utf-8"), max_size=2000
)


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_strip_grounding_idempotent(s):
    once = strip_grounding_annotations(s)
    assert strip_grounding_annotations(once) == once


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_clean_stdout_idempotent(s):
    once = clean_stdout_output(s)
    assert clean_stdout_output(once) == once


@settings(max_examples=300, deadline=None)
@given(text_st)
def test_clean_never_contains_noise_or_tags(s):
    out = clean_stdout_output(s, strip_grounding=True)
    for line in out.split("\n"):
        assert not line.startswith("=====")
        assert not line.startswith("BASE:")
        assert not line.startswith("PATCHES:")
        assert "torch.Size" not in line
    # a complete ref tag pair never survives
    import re

    assert not re.search(r"<\|ref\|>.*?<\|/ref\|>", out)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4000))
def test_html_extractor_total_on_arbitrary_bytes(b):
    """Common-Crawl reality: any byte soup must produce a str, never
    raise (errors-are-data can only hold if the extractor is total)."""
    out = html_to_markdown(b)
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_html_extractor_output_has_no_markup(s):
    html = f"<html><body><p>{s}</p></body></html>"
    out = html_to_markdown(html.encode("utf-8", "surrogatepass"))
    assert "<p>" not in out and "</p>" not in out


# -- html extractor regression vectors (confirmed bugs from review) ---------

def test_block_inside_table_cell_kept():
    """<p>/<div> inside <td> is routine Common-Crawl HTML; cell text
    must survive with block structure flattened into the cell."""
    out = html_to_markdown(
        b"<table><tr><td>first<p>para</p></td><td>second</td></tr></table>"
    )
    assert out == "| first para | second |"


def test_boiler_open_flushes_current_block():
    """Text before an inline <nav> must not concatenate with (or keep)
    the nav's boilerplate."""
    out = html_to_markdown(
        b"<div>Some article text<nav>Home About Pricing Contact</nav></div>"
    )
    assert out == "Some article text"


def test_adjacent_tables_stay_separate():
    """Two source tables never merge into one markdown table, even
    when only dropped boilerplate separates them."""
    out = html_to_markdown(
        b"<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>"
        b"<nav>x</nav>"
        b"<table><tr><td>X</td><td>Y</td></tr></table>"
    )
    assert out == (
        "| A | B |\n| --- | --- |\n| 1 | 2 |\n\n| X | Y |"
    )


def test_nested_table_forms_own_group():
    """A <table> opened inside a cell must not merge its rows into the
    outer markdown table under the outer table_id, and must not drop
    the partially-accumulated outer cell text; rows of the outer table
    AFTER the nested one form their own group too."""
    out = html_to_markdown(
        b"<table><tr><td>outer1</td><td>pre "
        b"<table><tr><td>n1</td><td>n2</td></tr></table>"
        b"</td></tr><tr><td>after1</td><td>after2</td></tr></table>"
    )
    assert out == (
        "| outer1 | pre |\n\n| n1 | n2 |\n\n| after1 | after2 |"
    )


def test_midtable_th_row_emits_no_separator():
    out = html_to_markdown(
        b"<table><tr><td>1</td></tr><tr><th>H</th></tr><tr><td>2</td></tr></table>"
    )
    assert out.count("---") == 0  # th row is not the table's first row


def test_pre_preserves_newlines():
    out = html_to_markdown(b"<p>before</p><pre>def f():\n    return 1</pre>")
    assert out == "before\n\n```\ndef f():\n    return 1\n```"


def test_extract_links_edge_cases():
    from extractor.html_extract import extract_links

    # document order, whitespace-normalized anchor text
    assert extract_links(
        b'<p><a href="/a"> one  two </a>x<a href="/b">three</a></p>'
    ) == [("/a", "one two"), ("/b", "three")]
    # anchors without href are skipped; script subtrees ignored
    assert extract_links(
        b'<a name="x">no href</a><script><a href="/s">skip</a></script>'
        b'<a href="/c">kept</a>'
    ) == [("/c", "kept")]
    # malformed: a new <a> implicitly closes the open one
    assert extract_links(b'<a href="/a">one<a href="/b">two</a>') == [
        ("/a", "one"), ("/b", "two"),
    ]
    # unclosed trailing anchor is still flushed
    assert extract_links(b'<a href="/z">tail') == [("/z", "tail")]
    assert extract_links(None) == []
    assert extract_links(b"") == []


def test_extract_links_matches_boiler_fixture():
    """The oracle's derived link-farm structure must equal the real
    parse of the boiler fixture html (the same invariant the driver
    checks end-to-end through Spark)."""
    from extractor.html_extract import extract_links
    from extractor.testgen import make_page_record

    doc_id = 28  # 28 % 20 == 8 → html_boiler
    rec = make_page_record(doc_id, "alpha beta gamma delta epsilon zeta", "en")
    links = extract_links(rec["html"])
    farms = [(doc_id, 4), (doc_id + 1, 4), (doc_id, 6), (doc_id + 2, 5), (doc_id, 3)]
    expected = [
        (f"/x/{d}/{i}", f"link word {i}")
        for d, n in farms
        for i in range(n)
    ]
    assert links == expected


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4000))
def test_extract_links_total_on_arbitrary_bytes(b):
    """Edge extraction must be total on byte soup (same errors-are-data
    requirement as the main extractor) and every element well-formed."""
    from extractor.html_extract import extract_links

    out = extract_links(b)
    assert isinstance(out, list)
    for href, anchor in out:
        assert isinstance(href, str) and isinstance(anchor, str)
        assert "\n" not in anchor  # whitespace-normalized


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=1, max_value=20000), st.integers(min_value=1, max_value=20000))
def test_plan_compress_resize_invariants(w, h):
    """For any dims: either no resize (both sides already fit) or the
    resized dims fit max_dim with the LARGER side hitting it exactly,
    aspect preserved up to int truncation (reference arithmetic)."""
    from extractor.operators.multimodal import MAX_DIMENSION, plan_compress

    _, resize_to = plan_compress("RGB", w, h)
    if resize_to is None:
        assert w <= MAX_DIMENSION and h <= MAX_DIMENSION
    else:
        ow, oh = resize_to
        # float truncation can land the larger side on max_dim-1
        # (reference behavior — see RESIZE_VECTORS (187, 3510) case)
        assert max(ow, oh) in (MAX_DIMENSION - 1, MAX_DIMENSION)
        assert ow <= MAX_DIMENSION and oh <= MAX_DIMENSION
        # aspect: int truncation of the exact scaled value
        scale = MAX_DIMENSION / w if w > h else MAX_DIMENSION / h
        assert (ow, oh) == (int(w * scale), int(h * scale))


def test_extract_links_rel_nofollow():
    """rel is a space-separated token list: the nofollow token flags
    the edge wherever it appears, case-insensitively; other rel values
    don't."""
    from extractor.html_extract import extract_links, extract_links_rel

    html = (
        b'<a href="/a" rel="nofollow">paid</a>'
        b'<a href="/b" rel="ugc NOFOLLOW">comment</a>'
        b'<a href="/c" rel="noopener">fine</a>'
        b'<a href="/d">plain</a>'
    )
    assert extract_links_rel(html) == [
        ("/a", "paid", True),
        ("/b", "comment", True),
        ("/c", "fine", False),
        ("/d", "plain", False),
    ]
    # the 2-tuple surface is unchanged
    assert extract_links(html) == [
        ("/a", "paid"), ("/b", "comment"), ("/c", "fine"), ("/d", "plain"),
    ]


def test_html_outlinks_nofollow_column_filters_rank_edges(spark):
    """The Spark operator surfaces nofollow as a column; a rank build
    that drops disavowed edges is a one-filter change."""
    from extractor.operators.webgraph import html_outlinks

    pages = spark.createDataFrame(
        [
            (
                "https://h.test/p1",
                b'<a href="/x" rel="nofollow">spam</a><a href="/y">good</a>',
            )
        ],
        "url string, html binary",
    )
    edges = html_outlinks(pages)
    assert {(r.href, r.nofollow) for r in edges.collect()} == {
        ("/x", True),
        ("/y", False),
    }
    from pyspark.sql import functions as F

    assert [r.href for r in edges.filter(~F.col("nofollow")).collect()] == ["/y"]


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_normalize_unicode_idempotent(s):
    """Running the hygiene pass twice changes nothing — the property
    that makes it safe to apply at multiple pipeline stages."""
    from extractor.operators.charset import normalize_unicode

    once = normalize_unicode(s)
    assert normalize_unicode(once) == once


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_normalize_unicode_output_invariants(s):
    """Arbitrary input → output never contains C0 controls (other
    than LF), DEL, CR, horizontal tab, or a double space, and carries
    no leading/trailing strip-set characters."""
    from extractor.operators.charset import normalize_unicode

    out = normalize_unicode(s)
    assert out is not None
    assert not any(
        ord(c) < 32 and c != "\n" for c in out
    ) and "\x7f" not in out
    assert "  " not in out and "\t" not in out and "\r" not in out
    if out:
        assert out[0] not in " \t\r\n" and out[-1] not in " \t\r\n"
