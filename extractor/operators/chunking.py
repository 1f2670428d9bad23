"""Content-defined chunking — shift-resistant chunk-grain dedup.

Fixed-size chunking (the ``doc_chunking`` registry entry) breaks on
INSERTION: one word added at the front of a re-crawled page shifts
every downstream chunk boundary, so no chunk digest matches the
previous capture and chunk-grain dedup sees a 100% new document.
Content-defined chunking (the rsync/LBFS trick; Muthitacharoen et al.
SOSP 2001) places boundaries where the CONTENT says so — here: at
word positions whose 31-bit word hash is ≡ 0 mod ``avg_words`` — so
an insertion disturbs only the chunks it touches and every boundary
after the next anchor realigns.  That is what makes chunk-grain
storage dedup and partial-update detection work across captures of
the same evolving page.

Word grain, same hash family as the rest of the dedup tier (one md5
per word, already paid by any neighboring dedup stage).  Simplified
from production CDC in one stated way: no min/max chunk clamp — the
boundary rule is pure, so the expected chunk length is
``avg_words`` with a geometric tail; a pathological run of boundary
words degenerates to word-sized chunks rather than being clamped
(acceptable for dedup statistics; a storage system would clamp).

Scale shape: boundary detection, chunk assembly and digesting are ALL
array expressions inside one projection — zero Exchange, rides the
scan; only the (doc, idx, digest) rows and the df aggregate shuffle,
never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from extractor.operators.dedup import word_hashes, words_of

CDC_AVG_WORDS = 32


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_words: int = CDC_AVG_WORDS,
) -> DataFrame:
    """(doc_id, chunk_idx, start_word, n_words, chunk_md5) — one row
    per content-defined chunk; chunk texts concatenated with '' join
    order reassemble the document exactly (pinned by test).

    Boundary rule: word position i (1-based content positions; 0 is
    always a chunk start) begins a new chunk iff
    ``word_hash(w_i) % avg_words == 0``.  Chunk spans are derived from
    the boundary-position array with ``try_element_at`` lookahead —
    no window, no self-join, no Python."""
    src = df.select(
        F.col(id_col).alias("doc_id"),
        words_of(F.col(text_col)).alias("ws"),
        # projected, never inline (HOF re-evaluation trap — see
        # shingle_hashes_from)
        word_hashes(F.col(text_col)).alias("wh"),
    ).withColumn("nw", F.size("ws"))
    starts = F.concat(
        F.array(F.lit(0)),
        F.when(
            F.col("nw") >= 2,
            F.filter(
                F.sequence(F.lit(1), F.col("nw") - 1),
                lambda i: F.element_at(F.col("wh"), i + 1) % avg_words == 0,
            ),
        ).otherwise(F.array().cast("array<int>")),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(starts)),
        lambda j: F.struct(
            (j - 1).alias("chunk_idx"),
            F.element_at(starts, j).alias("s"),
            F.coalesce(F.try_element_at(starts, j + 1), F.col("nw")).alias("e"),
        ),
    )
    return (
        src.select("doc_id", "ws", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.s").cast("int").alias("start_word"),
            (F.col("c.e") - F.col("c.s")).cast("int").alias("n_words"),
            F.md5(
                F.array_join(
                    F.slice(F.col("ws"), F.col("c.s") + 1, F.col("c.e") - F.col("c.s")),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )


def cdc_shared_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_words: int = CDC_AVG_WORDS,
) -> DataFrame:
    """:func:`cdc_chunks` annotated with ``shared``: whether the
    chunk's digest occurs in ≥ 2 DOCUMENTS (storage dedup's hit set;
    within-doc repeats alone do not count).  One distinct projection +
    df aggregate + equi-join back on the digest — the
    duplicated_span_stats shape at chunk grain."""
    chunks = cdc_chunks(df, id_col, text_col, avg_words).localCheckpoint(
        eager=True
    )
    dup = (
        chunks.select("doc_id", "chunk_md5")
        .distinct()
        .groupBy("chunk_md5")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("chunk_md5", F.lit(True).alias("shared"))
    )
    return chunks.join(dup, "chunk_md5", "left").select(
        "doc_id",
        "chunk_idx",
        "start_word",
        "n_words",
        "chunk_md5",
        F.coalesce(F.col("shared"), F.lit(False)).alias("shared"),
    )
