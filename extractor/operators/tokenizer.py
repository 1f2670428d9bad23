"""Token-counting seam for context-budget operators.

Real context budgets are measured in TOKENIZER tokens, not words —
the reference pipeline's budget is its model's BPE vocabulary
(reference: services/model_loader.py loads the HF tokenizer alongside
the model; our engine seam mirrors that pairing).  Shipping an actual
BPE vocabulary is out of scope here, so this module is the SEAM: the
packing operators take a ``tokenizer`` argument resolved through
:data:`TOKEN_COUNTERS`, and a production deployment registers one
entry — typically an Arrow-batched pandas UDF around a real
``AutoTokenizer`` — without touching any packing plan (the same
pluggable-singleton pattern as ``extractor.engine``'s model seam).

Two deterministic, oracle-expressible counters ship built in:

* ``whitespace`` — word count (the r4 behavior, still the default);
* ``bpe_estimate`` — a published-shape subword estimate: a word of
  length L costs ``1 + (L-1) div CHARS_PER_PIECE`` pieces (long words
  split every ~6 chars, short words are single tokens — the
  empirical ~4 chars/token English BPE average lands between the
  two).  Pure column arithmetic, byte-identical in ANSI SQL:
  ``len(ws) + list_sum(list_transform(ws, x -> (length(x)-1)//6))``.

Both are expression-only (JVM codegen, no Python), so token counting
adds zero shuffle and zero Python to the packing plan at any scale.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from extractor.operators.dedup import words_of

CHARS_PER_PIECE = 6


def ws_token_count(text: Column) -> Column:
    """Whitespace token count — ``size(split(text, ' '))``."""
    return F.size(words_of(text)).cast("long")


def bpe_token_count_estimate(text: Column) -> Column:
    """Deterministic BPE-ish subword count: per word
    ``1 + (len-1) div CHARS_PER_PIECE``, summed.  A stand-in with the
    right SHAPE (long words cost more than short ones) so context
    budgets bind on something token-like; swap in a real tokenizer
    via :data:`TOKEN_COUNTERS` for production counts."""
    ws = words_of(text)
    extra = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.floor((F.length(w) - 1) / CHARS_PER_PIECE),
    )
    return (F.size(ws) + extra).cast("long")


TOKEN_COUNTERS: dict[str, Callable[[Column], Column]] = {
    "whitespace": ws_token_count,
    "bpe_estimate": bpe_token_count_estimate,
}


def token_count_expr(
    text: Column, tokenizer: Union[str, Callable[[Column], Column]] = "whitespace"
) -> Column:
    """Resolve the seam: a registered name or a caller-supplied
    ``Column -> Column`` (e.g. a pandas-UDF-backed real tokenizer)."""
    if callable(tokenizer):
        return tokenizer(text).cast("long")
    try:
        return TOKEN_COUNTERS[tokenizer](text)
    except KeyError:
        raise ValueError(
            f"unknown tokenizer {tokenizer!r}; registered: "
            f"{sorted(TOKEN_COUNTERS)} (or pass a Column->Column callable)"
        ) from None
