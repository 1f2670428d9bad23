"""Compression-ratio quality signal (zlib over mapInPandas).

The one quality heuristic in the tier that is genuinely not
SQL-expressible: a document's zlib compression ratio.  Highly
compressible text (ratio well below the corpus norm) is boilerplate,
templated, or machine-repeated content; nearly incompressible text is
often binary junk or encoding damage.  Production web pipelines use
this as a cheap repetitiveness/garbage gate alongside the Gopher-style
token rules (``extractor.operators.textstats``) — it catches
repetition the 2/3/4-gram duplicate fractions miss (long-period
templating, repeated paragraphs past the n-gram horizon).

Scale shape: one ``mapInPandas`` pass, map-only (no shuffle), Arrow
batches in/out, ~50 MB/s/core for zlib level 6 — at 100 TB this is an
embarrassingly parallel scan stage gated only by I/O.  The UDF is the
approved slow path here: zlib on raw bytes cannot be expressed in
``pyspark.sql.functions``.

Determinism: ``zlib.compress(data, level)`` is a pure function of
(bytes, level) for a given zlib build — CPython vendors its own zlib,
so results are stable across workers of one cluster.  The registry
entry carries no SQL oracle (DuckDB has no zlib UDF); correctness is
pinned instead by a driver-side recompute test over every sf0.001
document plus a monotonicity property (appending repeated blocks must
lower the ratio): ``tests/test_operators.py``.

Reference parity note: the reference service has no corpus-quality
stage at all (it is a per-request OCR API); this operator is part of
the beyond-reference LLM-data-pipeline tier.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# id column type is taken from the input frame (string urls and
# hex64 longs both pass through untouched — the r4-advice id-type
# lesson from chunking.py applies here too); the stat columns are
# fixed.
_STAT_SCHEMA = (
    "raw_bytes long, zlib_bytes long, ratio_x1000 long, repetitive boolean"
)

# Ratio floor below which a document is flagged repetitive.  English
# prose sits ~350-550 at level 6; templated/looped text falls under
# ~300.  Integer per-mille so the flag is exactly reproducible.
REPETITIVE_X1000 = 300


def compression_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
    repetitive_x1000: int = REPETITIVE_X1000,
) -> DataFrame:
    """(doc_id, raw_bytes, zlib_bytes, ratio_x1000, repetitive) per doc.

    ratio_x1000 = zlib_bytes * 1000 // raw_bytes (integer per-mille;
    empty text → ratio 1000, never a divide-by-zero).  ``repetitive``
    is ratio_x1000 < ``repetitive_x1000``.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raws, comps, ratios, flags = [], [], [], []
            for text in pdf[text_col]:
                data = ("" if text is None else text).encode("utf-8")
                n = len(data)
                z = len(zlib.compress(data, level))
                r = (z * 1000 // n) if n else 1000
                raws.append(n)
                comps.append(z)
                ratios.append(r)
                flags.append(r < repetitive_x1000)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].reset_index(drop=True),
                    "raw_bytes": pd.Series(raws, dtype="int64"),
                    "zlib_bytes": pd.Series(comps, dtype="int64"),
                    "ratio_x1000": pd.Series(ratios, dtype="int64"),
                    "repetitive": pd.Series(flags, dtype="bool"),
                }
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, {_STAT_SCHEMA}"
    )
