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
    # `starts` must be a NAMED projection referenced (3×) below — used
    # inline, the Column API would copy its O(nw) subtree into every
    # element_at/size site, re-evaluating the boundary filter per
    # chunk element (measured ~35 s → ~8 s on 5k docs × 1.3k words);
    # the multi-reference also blocks CollapseProject from re-inlining.
    staged = src.select("doc_id", "ws", "nw", starts.alias("st"))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("st")),
        lambda j: F.struct(
            (j - 1).alias("chunk_idx"),
            F.element_at(F.col("st"), j).alias("s"),
            F.coalesce(F.try_element_at(F.col("st"), j + 1), F.col("nw")).alias(
                "e"
            ),
        ),
    )
    return (
        staged.select("doc_id", "ws", F.explode(chunks).alias("c"))
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


def incremental_cdc_dedup(
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_words: int = CDC_AVG_WORDS,
    commit: bool = True,
) -> DataFrame:
    """Chunk-grain storage dedup against a committed chunk-digest
    index — the recrawl-delta store: because CDC boundaries are
    content-anchored, a re-captured page with one edit produces the
    SAME chunk digests everywhere except around the edit, so the
    batch stores only the changed chunks and references history for
    the rest.  Per batch chunk: ``(doc_id, chunk_idx, start_word,
    n_words, chunk_md5, status)`` with status

    * ``dup_of_history`` — digest committed by any earlier batch
      (history text never re-read, only its digests probe);
    * ``new``            — first occurrence in this batch, absent
      from history (the chunks actually stored);
    * ``dup_in_batch``   — a later in-batch copy (min (doc, idx)
      wins, deterministically, via a type-agnostic struct-min —
      struct ordering is lexicographic over its fields, so string
      (url) and full-range 64-bit ids work unchanged; an encoded
      ``doc_id*1e6+chunk_idx`` key would demand a numeric id and
      overflow hex64 ids under ANSI mode).

    Same commit discipline as the exact/LSH incremental indexes:
    ``commit=True`` checkpoints results FIRST, then appends the new
    digests (with their first-occurrence coordinates) as one atomic
    snapshot; ``commit=False`` + :func:`commit_chunks` is the
    exactly-once two-step; at-least-once repair is compaction with
    ``dedupe_on=['chunk_md5']``.  Batched runs classify exactly as a
    one-shot first-occurrence pass with the batch boundary drawn in
    (driver-checked invariant).

    Scale shape: the chunk pass is the map-only array projection of
    :func:`cdc_chunks`; one groupBy(chunk_md5) min-aggregate
    (map-side partials) and one left equi-join of the batch's
    DISTINCT digests against the committed index — per-crawl cost
    O(|batch chunks|), independent of corpus size."""
    from extractor.writer import _committed_manifests, read_extracted

    spark = new_docs.sparkSession
    chunks = cdc_chunks(new_docs, id_col, text_col, avg_words).localCheckpoint(
        eager=True
    )
    firsts = chunks.groupBy("chunk_md5").agg(
        F.min(F.struct("doc_id", "chunk_idx", "n_words")).alias("m")
    )
    if _committed_manifests(index_dir):
        hist = (
            read_extracted(spark, index_dir)
            .select("chunk_md5")
            .distinct()
            .withColumn("_hist", F.lit(True))
        )
        firsts = firsts.join(hist, "chunk_md5", "left")
    else:
        firsts = firsts.withColumn("_hist", F.lit(None).cast("boolean"))
    firsts = firsts.localCheckpoint(eager=True)  # statuses + commit reuse
    status = (
        F.when(F.col("_hist"), F.lit("dup_of_history"))
        .when(
            (F.col("doc_id") == F.col("m.doc_id"))
            & (F.col("chunk_idx") == F.col("m.chunk_idx")),
            F.lit("new"),
        )
        .otherwise(F.lit("dup_in_batch"))
    )
    out = chunks.join(firsts, "chunk_md5").select(
        "doc_id",
        "chunk_idx",
        "start_word",
        "n_words",
        "chunk_md5",
        status.alias("status"),
    )
    if commit:
        out = out.localCheckpoint(eager=True)
        commit_chunks(
            firsts.filter(F.col("_hist").isNull()).select(
                "chunk_md5",
                F.col("m.doc_id").alias("doc_id"),
                F.col("m.chunk_idx").alias("chunk_idx"),
                F.col("m.n_words").alias("n_words"),
            ),
            index_dir,
        )
    return out


def commit_chunks(new_chunks: DataFrame, index_dir: str) -> str:
    """Append a batch's first-occurrence chunk digests to the index
    as one atomic snapshot (the exactly-once second step — persist
    the classified results first, then advance the index)."""
    from extractor.writer import write_snapshot

    return write_snapshot(new_chunks, index_dir, key_col="chunk_md5")
