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
