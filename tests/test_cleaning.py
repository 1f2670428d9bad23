"""Byte-exact unit vectors for T7/T8 cleaning.

Vectors derived from the observable semantics of the reference's
text_cleaner.py:29-107 and verified by differential testing against it
(30k random adversarial inputs, 0 mismatches).
"""

from __future__ import annotations

from extractor.cleaning import (
    clean_stdout_output,
    strip_grounding_annotations,
)

# (input, expected) — strip_grounding_annotations
STRIP_VECTORS = [
    ("", ""),
    (None, ""),
    ("plain text", "plain text"),
    # ref tag removal (non-greedy)
    ("<|ref|>title<|/ref|>Hello", "Hello"),
    ("a<|ref|>x<|/ref|>b<|ref|>y<|/ref|>c", "abc"),
    # det box removal requires the [[...]] form
    ("<|det|>[[1, 2, 3, 4]]<|/det|>kept", "kept"),
    ("<|det|>[1, 2]<|/det|>kept", "<|det|>[1, 2]<|/det|>kept"),
    # non-greedy: only the innermost closing pair ends the match
    ("<|ref|>a<|/ref|>mid<|/ref|>", "mid<|/ref|>"),
    # tags never match across newlines (no DOTALL)
    ("<|ref|>a\nb<|/ref|>", "<|ref|>a\nb<|/ref|>"),
    # newline collapse: 3+ → exactly 2; 2 stays 2
    ("a\n\n\n\nb", "a\n\nb"),
    ("a\n\nb", "a\n\nb"),
    # per-line strip; all-whitespace lines become empty
    ("  x  \n\t\n  y", "x\n\ny"),
    # overall strip
    ("\n\n  hi  \n\n", "hi"),
    # annotations-only input collapses to empty
    ("<|ref|>t<|/ref|><|det|>[[0, 0, 1, 1]]<|/det|>", ""),
]

# (input, strip_grounding, expected) — clean_stdout_output
STDOUT_VECTORS = [
    ("", True, ""),
    (None, True, ""),
    ("=====Banner=====\ntext", True, "text"),
    ("BASE: torch thing\nPATCHES: 9\nkeep", True, "keep"),
    ("(0x0)\nkeep", True, "keep"),
    ("   (0x0)   \nkeep", True, "keep"),  # strip() == '(0x0)'
    ("(0x0) short tail\nkeep", True, "keep"),  # startswith + len<50
    ("(0x0)" + "a" * 60 + "\nkeep", True, "(0x0)" + "a" * 60 + "\nkeep"),
    ("0x0\nkeep", True, "keep"),
    ("shape torch.Size([1, 3])\nkeep", True, "keep"),
    ("a\n\n\nb", True, "a\nb"),  # blank lines dropped at the line filter
    # grounding stripped only when requested
    ("<|ref|>t<|/ref|>x", True, "x"),
    ("<|ref|>t<|/ref|>x", False, "<|ref|>t<|/ref|>x"),
    # leading/trailing whitespace of the whole text stripped first
    ("  \n=====\nreal\n  ", True, "real"),
]


def test_strip_grounding_vectors():
    for src, expected in STRIP_VECTORS:
        assert strip_grounding_annotations(src) == expected, repr(src)


def test_clean_stdout_vectors():
    for src, sg, expected in STDOUT_VECTORS:
        assert clean_stdout_output(src, strip_grounding=sg) == expected, repr(src)


def test_udf_matches_plain_function(spark):
    from pyspark.sql import functions as F

    from extractor.cleaning import clean_stdout_udf, strip_grounding_udf

    rows = [(s,) for s, _ in STRIP_VECTORS if s is not None]
    df = spark.createDataFrame(rows, ["raw"])
    out = df.select("raw", strip_grounding_udf(F.col("raw")).alias("clean")).collect()
    for r in out:
        assert r["clean"] == strip_grounding_annotations(r["raw"])

    rows2 = [(s,) for s, sg, _ in STDOUT_VECTORS if s is not None and sg]
    df2 = spark.createDataFrame(rows2, ["raw"])
    out2 = df2.select("raw", clean_stdout_udf(F.col("raw")).alias("clean")).collect()
    for r in out2:
        assert r["clean"] == clean_stdout_output(r["raw"])
