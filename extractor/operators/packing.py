"""Sequence packing: bin documents into fixed-token-budget contexts.

The last step of a training-data pipeline before tokenized shards are
written: concatenate documents into fixed-size context windows so
training batches waste no padding.  Exact bin packing is NP-hard and
inherently sequential; the scalable formulation (what t5/seqio-style
packers actually ship) is OFFSET-BASED CONTIGUOUS PACKING over a
deterministic document order — each document starts at the running
token offset of its shard and belongs to bin ``offset div budget``.
A document that straddles a boundary stays in its starting bin, so a
bin can overshoot by at most one document; fill statistics make the
overshoot observable.

Scale shape: documents are sharded by a hash of their id (``shard =
hex64(id) % n_shards``) and the running offset is a window sum
PARTITIONED BY SHARD — each shard is ~N/n_shards rows, all shards
pack in parallel, and ``n_shards`` is set to the cluster's
parallelism, so no single reducer ever sees the corpus (the global-
window packing this replaces is the scale-killer).  Within a shard
the order is the document id — deterministic on any partitioning,
which is what makes the assignment oracle-checkable and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from extractor.operators.dedup import hex64, words_of


def pack_assignments(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer="whitespace",
) -> DataFrame:
    """Per-document packing assignment: (doc_id, shard, bin_id,
    n_tokens, start_offset).

    ``tokenizer`` resolves through the
    :mod:`extractor.operators.tokenizer` seam: ``"whitespace"``
    (default, the r4 behavior), ``"bpe_estimate"`` (deterministic
    subword estimate — real context budgets bind on tokenizer tokens,
    not words), or any ``Column -> Column`` callable (a pandas-UDF
    around a production BPE).  The packing plan is identical in all
    cases — only the n_tokens expression changes."""
    from extractor.operators.tokenizer import token_count_expr

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count_expr(F.col(text_col), tokenizer).alias("n_tokens"),
    ).withColumn(
        "shard", (hex64(F.col("doc_id").cast("string")) % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    return base.withColumn(
        "start_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    ).select(
        "doc_id",
        "shard",
        F.floor(F.col("start_offset") / budget).cast("long").alias("bin_id"),
        "n_tokens",
        "start_offset",
    )


def pack_bins(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer="whitespace",
) -> DataFrame:
    """Per-bin packing summary: (shard, bin_id, n_docs, n_tokens,
    first_doc, fill_bp) where fill_bp = floor(n_tokens·10⁴/budget) —
    >10000 marks the boundary-straddle overshoot bins.  ``tokenizer``
    threads through to :func:`pack_assignments` (the token-counting
    seam)."""
    a = pack_assignments(
        docs, budget=budget, n_shards=n_shards, id_col=id_col,
        text_col=text_col, tokenizer=tokenizer,
    )
    return a.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.floor((F.sum("n_tokens") * 10000) / budget).cast("long").alias("fill_bp"),
    )


def assign_shards(
    df: DataFrame, n_shards: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic training-shard assignment: the "global shuffle"
    of a training-data export, without a global sort.

    Every document gets ``shard = hex64(id) % n_shards`` and an
    ``okey`` order key (the same 60-bit hash) — together a
    reproducible pseudo-random permutation of the corpus: shard
    membership and within-shard order depend only on document ids,
    never on partitioning, cluster size, or execution order.  The
    writer side is ``df.repartition(n_shards, "shard")
    .sortWithinPartitions("okey", id_col)`` — each shard file is then
    byte-stable across runs, which is what makes a 10^12-doc export
    resumable and diffable.  Map-only: one md5 per id, no shuffle
    until the writer's own repartition."""
    okey = hex64(F.col(id_col).cast("string"))
    return df.select(
        "*",
        okey.alias("okey"),
        (okey % n_shards).cast("long").alias("shard"),
    )
