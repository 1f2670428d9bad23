"""Bloom-filter membership sketch — the approximate pre-gate in front
of exact dedup.

The incremental exact-dedup gate (operators/incremental.py) answers
"seen before?" with an equi-join of batch digests against the
committed digest index — exact, but the probe touches an index that
grows with the CORPUS.  A Bloom filter answers the same question
approximately with a structure ~1 byte per historical digest, built
in ONE index-sized pass and probed without ever re-reading history:

* ``bloom_build``: history digests → k md5-derived bit positions each
  → 32-bit words table (word_idx, word) via one ``bit_or`` aggregate.
  m_bits/32 rows total — a 10^9-digest history at ~13 bits/key packs
  into ~4·10^8 words ≈ 3 GB of (int, long) rows; at sandbox scales it
  broadcasts outright.
* ``bloom_probe``: batch digests → same k positions → equi-join the
  words table (broadcast when it fits; plain equi-join shuffling only
  (digest, word_idx) pairs when it does not) → ``maybe_seen`` iff all
  k bits are set.

Guarantee, and why it composes with the exact gate: NO FALSE
NEGATIVES — a digest that was inserted always probes true, so
``maybe_seen = false`` rows are definitively new and skip the exact
join entirely.  False positives (rate ≈ (1 − e^(−kn/m))^k) only send
a row onward to the exact check, costing a probe, never correctness.
On a 10^12-page crawl where the daily batch is ~0.1% of history, the
pre-gate cuts the exact index join's probe side by the novelty rate.

Everything is integer arithmetic on md5 — bit-identical in Spark and
DuckDB, no engine-native hash whose implementation could differ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from extractor.operators.dedup import hex64

BLOOM_M_BITS = 1 << 18  # 256 Kbit → 8192 words; ~26 bits/key at n=10^4
BLOOM_K = 5


def _positions(digest: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for one digest: independent
    md5-derived hashes (digest salted with the hash index), each mod
    m_bits.  Pure expressions; one md5 per (digest, j)."""
    return F.array(
        *[
            hex64(F.concat(digest, F.lit(f":{j}"))) % m_bits
            for j in range(k)
        ]
    )


def bloom_build(
    history: DataFrame,
    digest_col: str = "digest",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """History digests → (word_idx int, word long) Bloom words.

    One explode to (digest, pos) rows, one ``bit_or`` aggregate with
    map-side partials — the single pass over history this sketch ever
    needs.  32-bit packing (pos div 32 / pos % 32) keeps every shift
    below 2^31, exact in both engines' signed 64-bit arithmetic."""
    pos = (
        history.select(
            F.explode(
                _positions(F.col(digest_col), m_bits, k)
            ).alias("pos")
        )
    )
    return (
        pos.select(
            F.expr("cast(pos div 32 as int)").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_probe(
    batch: DataFrame,
    words: DataFrame,
    digest_col: str = "digest",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    broadcast_words: bool = True,
) -> DataFrame:
    """Annotate ``batch`` with ``maybe_seen``: true iff every one of
    the digest's k bits is set in the words table.

    The probe runs at distinct-digest grain (a re-crawled URL's digest
    is checked once however many batch rows carry it), then joins the
    verdict back on the digest equi-key — a LEFT join, so the
    annotate shape is row-preserving: a batch row with a NULL digest
    (nothing to probe) comes back ``maybe_seen = false``
    (definitively new) instead of silently vanishing from the output
    and skipping the downstream exact-dedup gate.  A missing word row
    is an unset word — ``maybe_seen`` false.  ``broadcast_words=False``
    drops the hint for histories whose words table outgrows the
    driver; the probe becomes a plain (digest, word_idx) equi-join."""
    uniq = batch.select(F.col(digest_col).alias("digest")).distinct()
    probes = uniq.select(
        "digest",
        F.explode(_positions(F.col("digest"), m_bits, k)).alias("pos"),
    ).select(
        "digest",
        F.expr("cast(pos div 32 as int)").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
    )
    w = F.broadcast(words) if broadcast_words else words
    verdict = (
        probes.join(w, "word_idx", "left")
        .select(
            "digest",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0)
            .alias("hit"),
        )
        .groupBy("digest")
        .agg(F.min("hit").alias("maybe_seen"))
    )
    return batch.join(
        verdict.withColumnRenamed("digest", digest_col), digest_col, "left"
    ).withColumn("maybe_seen", F.coalesce(F.col("maybe_seen"), F.lit(False)))
