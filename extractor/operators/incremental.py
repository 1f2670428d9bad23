"""Incremental fuzzy dedup against a committed history index.

A crawl is not one batch: every day brings new pages that must be
deduplicated against EVERYTHING already ingested, and recomputing
signatures for the whole history per batch is a non-starter at 10^12
docs.  This module persists the MinHash-LSH band table
(:func:`extractor.operators.dedup.banded_signatures` rows) through
the snapshot writer and, per batch:

  1. computes band rows for the NEW docs only (one pass over the new
     text — history text is never touched again);
  2. finds near-dup pairs new×new (band self-join, ``a < b``) and
     new×history (band join against the committed index — history
     never self-joins, so the per-batch cost is
     O(|new| + |new ⋈ history|), not O(|history|²));
  3. commits the new band rows as one atomic snapshot.  With the
     convenience ``commit=True`` the pairs are eagerly materialized
     (localCheckpoint) BEFORE the manifest commit, so a crash during
     pair computation leaves the index unchanged and the batch simply
     re-runs.  The remaining crash window: after the commit but before
     the CALLER durably persists the returned pairs, a re-run appends
     the batch's band rows a second time — pair results stay correct
     (the groupBy dedup collapses signature-identical duplicates) but
     the index accretes duplicate rows that inflate future probe
     joins.  Exactly-once orchestrators close that window by calling
     with ``commit=False``, persisting the pairs, then calling
     :func:`commit_band_rows` — the same order extraction resume uses
     (output snapshot first, then the state advance).  At-least-once
     callers instead repair after the fact: :func:`compact_index`
     dedupes on (id, band_idx) while folding snapshots, which exactly
     removes re-appended rows (band rows for an id are identical
     across re-runs).

Invariant (pinned by tests/test_operators.py): running batches
B1, B2, … through :func:`incremental_lsh_dedup` yields exactly the
pair set of a one-shot :func:`lsh_pairs` over B1 ∪ B2 ∪ …, with
identical estimated-Jaccard values — ids are normalized ``a < b``
either way.

Scale notes: the index table is (id, sig, band_idx, band_key) — tens
of bytes per doc per band, ~1000× smaller than the corpus text.  On a
real deployment it is partitioned/bucketed by ``band_key`` so the
new×history probe prunes to the touched buckets; snapshot compaction
(writer.compact_snapshots) folds daily appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extractor.operators.dedup import banded_signatures
from extractor.writer import _committed_manifests, read_extracted, write_snapshot


def _pair_estimates(
    left: DataFrame, right: DataFrame, k: int, threshold: float
) -> DataFrame:
    """Band-key equi-join → per-pair signature-match estimate, pairs
    normalized to ``a < b`` and deduplicated across bands."""
    l = left.select(
        "band_idx", "band_key", F.col("id").alias("la"), F.col("sig").alias("sig_la")
    )
    r = right.select(
        "band_idx", "band_key", F.col("id").alias("rb"), F.col("sig").alias("sig_rb")
    )
    a = F.least("la", "rb")
    b = F.greatest("la", "rb")
    sig_a = F.when(F.col("la") < F.col("rb"), F.col("sig_la")).otherwise(F.col("sig_rb"))
    sig_b = F.when(F.col("la") < F.col("rb"), F.col("sig_rb")).otherwise(F.col("sig_la"))
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        l.join(r, ["band_idx", "band_key"])
        .filter(F.col("la") != F.col("rb"))
        .select(a.alias("a"), b.alias("b"), (matches / F.lit(float(k))).alias("est"))
        .groupBy("a", "b")
        .agg(F.min("est").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


def incremental_lsh_dedup(
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    commit: bool = True,
) -> DataFrame:
    """Near-dup pairs of ``new_docs`` against themselves AND the
    committed index at ``index_dir``; then (``commit=True``) appends
    the new band rows as one snapshot.  Returns (a, b, est_jaccard)
    with ``a < b`` — id order, regardless of which side is historic.

    Batch ids must be globally unique across batches (crawl ids are).

    With ``commit=True`` the pairs are checkpointed before the index
    commit (module docstring step 3 discusses the crash-window
    tradeoff vs the ``commit=False`` + :func:`commit_band_rows`
    two-step).
    """
    new_banded = banded_signatures(
        new_docs, id_col=id_col, text_col=text_col, k=k, bands=bands
    ).localCheckpoint(eager=True)  # one signature pass: pairs + commit reuse it
    pairs = incremental_pairs(new_banded, index_dir, k=k, threshold=threshold)
    if commit:
        # Materialize pairs before advancing the index so the commit
        # really does happen after pair computation (a lazy return
        # would invert the order the docstring promises).
        pairs = pairs.localCheckpoint(eager=True)
        commit_band_rows(new_banded, index_dir)
    return pairs


def incremental_pairs(
    new_banded: DataFrame, index_dir: str, k: int = 16, threshold: float = 0.5
) -> DataFrame:
    """The probe stage alone: near-dup pairs of precomputed band rows
    (``banded_signatures`` output) against themselves and the
    committed index — no commit.  Callers that need the band rows for
    a later :func:`commit_band_rows` (the exactly-once two-step, e.g.
    the streaming bridge) compute them once and pass them here."""
    spark: SparkSession = new_banded.sparkSession
    # self-join emits each unordered pair twice ((la,rb) and (rb,la));
    # both normalize to the same (a,b) and the groupBy dedups them.
    pairs = _pair_estimates(new_banded, new_banded, k, threshold)
    if _committed_manifests(index_dir):
        hist = read_extracted(spark, index_dir).select(
            "id", "sig", "band_idx", "band_key"
        )
        cross = _pair_estimates(new_banded, hist, k, threshold)
        pairs = pairs.unionByName(cross).groupBy("a", "b").agg(
            F.min("est_jaccard").alias("est_jaccard")
        ).select("a", "b", F.round("est_jaccard", 4).alias("est_jaccard"))
    return pairs


def commit_band_rows(banded: DataFrame, index_dir: str) -> str:
    """Append a batch's band rows to the index as one atomic snapshot.

    Separate from :func:`incremental_lsh_dedup` so exactly-once
    callers can persist the pair results FIRST and advance the index
    second; returns the snapshot run_id."""
    return write_snapshot(banded, index_dir, key_col="id")


def index_band_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Bucket-size statistics of the committed band index — the
    observability an operator team retunes ``bands``/``k`` from
    BEFORE running the next batch: ``candidate_pairs`` (Σ s·(s−1)/2
    over band buckets) is exactly the probe-join row count the next
    batch pays per history bucket it touches, and ``max_bucket``
    flags the hot band keys that need a stop-shingle cap or more
    bands.

    Returns one row per ``band_idx``: (band_idx, n_rows, n_buckets,
    max_bucket, n_singletons, candidate_pairs).  Shape: a
    column-pruned scan of the index (band_idx, band_key only), one
    hash aggregate to bucket sizes, then a per-band rollup over
    |buckets| rows — both aggregates carry map-side partials, the
    corpus text is never read."""
    sizes = (
        read_extracted(spark, index_dir)
        .select("band_idx", "band_key")
        .groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return sizes.groupBy("band_idx").agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("sz").cast("long").alias("max_bucket"),
        F.count(F.when(F.col("sz") == 1, 1)).cast("long").alias("n_singletons"),
        F.sum(F.expr("sz * (sz - 1) div 2")).cast("long").alias("candidate_pairs"),
    ).select(
        F.col("band_idx").cast("int").alias("band_idx"),
        "n_rows", "n_buckets", "max_bucket", "n_singletons", "candidate_pairs",
    )


def compact_index(
    spark: SparkSession, index_dir: str, target_partitions: int | None = None
) -> str | None:
    """Fold the index's accumulated per-batch snapshots into one AND
    repair at-least-once duplicate rows: band rows sharing
    (id, band_idx) are identical by construction (same text → same
    signature → same band_key), so deduping on that key during the
    rewrite is lossless — it exactly undoes the re-append a crashed
    ``commit=True`` re-run performs (module docstring step 3) and
    deflates the probe joins the duplicates were inflating.

    Run periodically, like any table-maintenance job; the manifest
    rename stays the single atomic commit point.  Returns the new
    run_id or None with < 2 live snapshots."""
    from extractor.writer import compact_snapshots

    return compact_snapshots(
        spark,
        index_dir,
        target_partitions=target_partitions,
        dedupe_on=["id", "band_idx"],
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    commit: bool = True,
) -> DataFrame:
    """Exact-digest membership gate against a committed digest index —
    the first stage of a production crawl's dedup (cheaper than any
    fuzzy pass, and at web scale the majority of removals: mirrors,
    re-crawls of unchanged pages, boilerplate-identical captures).
    Per new doc: ``(id, digest, status)`` with status

    * ``dup_of_history`` — content md5 already committed by ANY
      earlier batch (the whole point: history text is never re-read,
      only its digests);
    * ``new``            — first occurrence of the digest in this
      batch and absent from history (the rows worth extracting,
      indexing, and shipping downstream);
    * ``dup_in_batch``   — a later in-batch copy of a ``new`` digest
      (min id wins, deterministically).

    ``commit=True`` appends the batch's NEW digests (digest, id of
    first occurrence) as one atomic snapshot, checkpointing results
    first — the same ordering discipline, crash-window statement and
    ``commit=False`` + :func:`commit_digests` exactly-once two-step
    as the LSH index (module docstring step 3); the at-least-once
    repair is ``compact_index``'s pattern with ``dedupe_on=
    ['digest']``.

    Invariant (pinned by tests): batches B1, B2, … classify exactly
    as a one-shot first-occurrence dedup over B1 ∪ B2 ∪ … with batch
    boundaries drawn in — a digest's single ``new`` row is its global
    min id's row in the earliest batch containing it.

    Scale shape: one map-only digest pass over the batch, one
    groupBy(digest) min-aggregate (map-side partials), one left
    equi-join of the batch's DISTINCT digests against the committed
    index (history never self-joins; on a real deployment the index
    is bucketed by digest so the probe prunes to touched buckets) —
    per-crawl cost O(|batch|), independent of corpus size."""
    spark: SparkSession = new_docs.sparkSession
    d = new_docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("digest")
    )
    firsts = d.groupBy("digest").agg(F.min("id").alias("first_id"))
    if _committed_manifests(index_dir):
        hist = (
            read_extracted(spark, index_dir)
            .select("digest")
            .distinct()
            .withColumn("_hist", F.lit(True))
        )
        firsts = firsts.join(hist, "digest", "left")
    else:
        firsts = firsts.withColumn("_hist", F.lit(None).cast("boolean"))
    firsts = firsts.localCheckpoint(eager=True)  # statuses + commit reuse
    status = (
        F.when(F.col("_hist"), F.lit("dup_of_history"))
        .when(F.col("id") == F.col("first_id"), F.lit("new"))
        .otherwise(F.lit("dup_in_batch"))
    )
    out = d.join(firsts, "digest").select("id", "digest", status.alias("status"))
    if commit:
        out = out.localCheckpoint(eager=True)
        commit_digests(
            firsts.filter(F.col("_hist").isNull()).select(
                "digest", F.col("first_id").alias("id")
            ),
            index_dir,
        )
    return out


def commit_digests(new_digests: DataFrame, index_dir: str) -> str:
    """Append a batch's first-occurrence digests to the exact index
    as one atomic snapshot (the exactly-once second step; see
    :func:`commit_band_rows`)."""
    return write_snapshot(new_digests, index_dir, key_col="digest")
