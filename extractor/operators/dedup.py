"""Deduplication operators for web-scale corpora.

All variants are expression-only (JVM, codegen'd): the MinHash/SimHash
signatures are higher-order-function folds over token arrays, so the
signature stage is map-only — the only shuffles are the candidate-pair
self-joins on short digest keys, which is exactly the part that must
shuffle.  Design matches the standard MinHash-LSH construction
(Broder 1997; Leskovec/Rajaraman/Ullman ch. 3) and SimHash
(Charikar 2002) from public literature.

Scale notes:
* Signatures: K md5 calls per shingle — map-side, embarrassingly
  parallel, no skew (cost ∝ doc length, bounded by the page-size cap).
* LSH join: keys are (band_idx, 32-hex digest) — high cardinality,
  uniform; AQE handles residual skew.  At 10^12 docs the band join is
  the dominant shuffle; B·N rows of ~50 bytes each, far smaller than
  the corpus payload (which never shuffles).
* Pair estimation reuses the signatures carried through the join — no
  second pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007


def hex64(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint.

    Identical construction exists in ANSI/DuckDB SQL
    (``('0x' || substr(md5(x),1,15))::BIGINT``), which is what makes
    these operators oracle-checkable.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words_of(text: Column) -> Column:
    return F.split(text, " ")


MERSENNE31 = 2_147_483_647  # 2^31 - 1

# Rolling-shingle combiners (any fixed odd constants work; these are
# the same decorrelated multipliers the MinHash permutations use).
_SH_A, _SH_B = 40_503, 94_261


def word_hashes(text: Column) -> Column:
    """31-bit hash per word — ONE md5 per word, the only digest pass."""
    return F.transform(words_of(text), lambda t: hex64(t) % MERSENNE31)


def shingle_hashes_from(wh: Column, n: int = 3) -> Column:
    """Distinct trigram hashes from a MATERIALIZED word-hash column.

    Rolling polynomial combiner ``(w[i]·A + w[i+1]·B + w[i+2]) mod
    (2^31−1)`` (Rabin-Karp shingling), missing tail words → 0.  One
    md5 per word instead of per shingle, and no per-shingle string
    materialization.  Products stay < 2^48 → exact in Spark longs and
    DuckDB BIGINTs; the identical formula runs in the SQL oracles.

    ``wh`` MUST be a projected column (``F.col``), never an inline
    ``word_hashes(...)`` expression: the HOF interpreter re-evaluates
    an inline array argument on every ``element_at`` access, turning
    the shingle pass O(words²·md5) — measured 8.5 s → 199 s on the
    sf0.1 Jaccard query before this was split into two projections
    (and 8.5 s → ~4 s after).

    Tail accesses use ``try_element_at``: PySpark 4.x runs ANSI mode
    by default, where a past-the-end ``element_at`` throws
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT — a 1- or 2-word document would
    kill the whole job.  ``try_element_at`` returns null out of
    bounds, matching the DuckDB oracle's ``wh[i+2]`` semantics."""
    assert n == 3, "rolling combiner is specialized to trigrams"
    upper = F.greatest(F.size(wh) - n, F.lit(0))

    def shingle(i):
        h1 = F.element_at(wh, i + 1)  # i ≤ size-1 ⇒ always in bounds
        h2 = F.coalesce(F.try_element_at(wh, i + 2), F.lit(0).cast("long"))
        h3 = F.coalesce(F.try_element_at(wh, i + 3), F.lit(0).cast("long"))
        return (h1 * _SH_A + h2 * _SH_B + h3) % MERSENNE31

    return F.array_distinct(F.transform(F.sequence(F.lit(0), upper), shingle))


def shingle_hashes_all(wh: Column, n: int = 3) -> Column:
    """Non-distinct variant of :func:`shingle_hashes_from` — one hash
    per gram OCCURRENCE, in document order.  Set semantics (Jaccard,
    MinHash) want the distinct form; occurrence semantics (duplicated-
    span coverage, repetition measurement) need every position."""
    assert n == 3, "rolling combiner is specialized to trigrams"
    upper = F.greatest(F.size(wh) - n, F.lit(0))

    def shingle(i):
        h1 = F.element_at(wh, i + 1)
        h2 = F.coalesce(F.try_element_at(wh, i + 2), F.lit(0).cast("long"))
        h3 = F.coalesce(F.try_element_at(wh, i + 3), F.lit(0).cast("long"))
        return (h1 * _SH_A + h2 * _SH_B + h3) % MERSENNE31

    return F.transform(F.sequence(F.lit(0), upper), shingle)


def duplicated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-substring coverage — the ExactSubstr
    signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), at word-trigram grain: what fraction of
    a document's gram occurrences also appear in ≥ ``min_docs``−1
    OTHER documents.  High coverage flags boilerplate (headers,
    license blocks, navigation chrome) that survives document-level
    dedup because the HOST documents differ.

    Scale shape: one digest pass per doc (word_hashes), grams exploded
    to (id, h) rows — corpus text never shuffles, only (long, long)
    pairs move.  The duplicated-hash set comes from a distinct
    (id, h) projection aggregated per h with map-side partials
    (internal repetitions within one doc do NOT make a gram
    "duplicated" — df counts documents); per-doc totals and dup
    counts are two grouped aggregates over the same checkpointed gram
    table, joined id-to-id.  At 10^12 docs the (h → df) aggregate is
    the classic hot-key surface: a boilerplate gram's row count is
    its df, bounded by the distinct projection — no df² blowup,
    because the join back to grams is an equi-join on h, not a
    self-join.  Lee et al. use 50-token windows over BPE tokens; the
    grain here is the corpus's existing trigram shingle so the whole
    dedup tier shares one hash family (the window length is a recall
    knob, not a correctness one)."""
    grams = (
        df.select(
            F.col(id_col).alias("id"), word_hashes(F.col(text_col)).alias("wh")
        )
        .select("id", F.explode_outer(shingle_hashes_all(F.col("wh"))).alias("h"))
        .filter(F.col("h").isNotNull())
        .localCheckpoint(eager=True)  # referenced by totals + dup join
    )
    dup = (
        grams.select("id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("h")
    )
    totals = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    dupc = grams.join(dup, "h").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    return (
        totals.join(dupc, "id", "left")
        .select(
            "id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup_grams"),
            F.expr(
                "coalesce(n_dup, 0) * 10000 div n_grams"
            ).cast("long").alias("dup_coverage_x10000"),
        )
    )


def _perm(j: Column, h: Column) -> Column:
    """Universal-hash permutation j of a 31-bit value: (a_j·h + b_j)
    mod (2^31−1).  a_j,b_j are deterministic odd/mixed constants; the
    products stay < 2^62 so the arithmetic is exact in both Spark
    longs and DuckDB BIGINTs (no overflow, no wrap divergence)."""
    a = (j * 2 + 1) * 40_503 % MERSENNE31  # odd multiplier, decorrelated
    b = (j * 94_261 + 73_856_093) % MERSENNE31
    return (a * h + b) % MERSENNE31


def minhash_signature(text: Column, k: int = 16, n: int = 3) -> Column:
    """K-permutation MinHash over word n-grams (Broder 1997) with
    seeded universal hashing — one digest per shingle, K cheap
    arithmetic permutations (the standard a·x+b mod p construction).

    Expression form (nested HOFs) — prefer :func:`minhash_signatures`
    in pipelines: Spark's interpreter re-evaluates the inner array per
    outer lambda element, so the nested form costs ~K× the digests."""
    sh = shingle_hashes_from(word_hashes(text), n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(F.transform(sh, lambda h: _perm(j, h))),
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "id", text_col: str = "text", k: int = 16, n: int = 3
) -> DataFrame:
    """MinHash signatures via explode → grouped min aggregates.

    The scalable formulation: one shingle-hash array per doc (single
    digest pass), exploded to (id, h) rows, then K codegen'd ``min``
    aggregates — whole-stage codegen end to end, no HOF interpretation
    in the hot loop.  The groupBy shuffles only (id, long) pairs,
    ~100× smaller than the corpus text."""
    # explode_outer, NOT explode: plain explode makes Catalyst's
    # InferFiltersFromGenerate add a `size(sh) > 0` filter that gets
    # pushed below the wh projection with the FULL expression
    # substituted — re-evaluating the word-hash array per element_at,
    # O(words²·md5) (measured 3 s → 100+ s at sf0.1).  Shingle arrays
    # are never empty (≥1 window per doc), so outer+isNotNull is
    # identical semantics with no inferred filter.
    ex = df.select(
        F.col(id_col).alias("id"),
        word_hashes(F.col(text_col)).alias("wh"),  # digest pass, once
    ).select(
        "id", F.explode_outer(shingle_hashes_from(F.col("wh"), n)).alias("h")
    ).filter(F.col("h").isNotNull())
    aggs = [F.min(_perm(F.lit(j), F.col("h"))).alias(f"m{j}") for j in range(k)]
    return ex.groupBy("id").agg(*aggs).select(
        "id", F.array(*[F.col(f"m{j}") for j in range(k)]).alias("sig")
    )


def bands_from_sig(sig: DataFrame, k: int = 16, bands: int = 4) -> DataFrame:
    """Band an existing (id, sig) signature table.

    Split out of :func:`banded_signatures` so ONE signature pass can
    serve several band configurations — the signature is the expensive
    leg (a full corpus-text scan + K min-aggregates); banding is a
    cheap explode over the already-computed array.  The recall
    measurement (queries.q_dedup_lsh_recall) sweeps ``bands`` over a
    single checkpointed signature table this way."""
    rows_per_band = k // bands
    return sig.select(
        "id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_idx"),
    ).select(
        "id",
        "sig",
        "band_idx",
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), F.col("band_idx") * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("band_key"),
    )


def banded_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, sig, band_idx, band_key) rows — the LSH index grain.

    One row per (doc, band); ``band_key`` is the md5 of that band's
    signature slice.  This is both :func:`lsh_pairs`' candidate stage
    and the PERSISTED table of the incremental dedup index
    (operators.incremental): the index stores exactly these rows, so
    a new crawl batch can join against committed history without
    recomputing historic signatures."""
    sig = minhash_signatures(df, id_col=id_col, text_col=text_col, k=k)
    return bands_from_sig(sig, k=k, bands=bands)


def pairs_from_bands(banded: DataFrame, k: int = 16, threshold: float = 0.5) -> DataFrame:
    """Candidate pairs from a banded-signature table: band-key
    self-join → signature-estimated Jaccard ≥ threshold.  Split from
    :func:`lsh_pairs` (same reason as :func:`bands_from_sig`) so a
    band sweep re-joins without re-hashing the corpus."""
    left = banded.select(
        F.col("band_idx"), F.col("band_key"),
        F.col("id").alias("a"), F.col("sig").alias("sig_a"),
    )
    right = banded.select(
        F.col("band_idx"), F.col("band_key"),
        F.col("id").alias("b"), F.col("sig").alias("sig_b"),
    )
    matches = F.aggregate(
        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    pairs = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", (matches / F.lit(float(k))).alias("est"))
        .groupBy("a", "b")  # a pair can match in several bands
        .agg(F.min("est").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )
    return pairs.select("a", "b", F.round("est_jaccard", 4).alias("est_jaccard"))


def lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate pairs with signature-estimated Jaccard.

    shingle → K minhashes → ``bands`` bands of K/bands rows → band-key
    self-join → estimate = matching-component fraction ≥ threshold.
    Returns (a, b, est_jaccard) with a < b, deduplicated.
    """
    banded = banded_signatures(df, id_col=id_col, text_col=text_col, k=k, bands=bands)
    return pairs_from_bands(banded, k=k, threshold=threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard within blocking groups, via the
    inverted-index (explode → shingle-equijoin → count) formulation.

    The naive form — all-pairs block join with per-pair
    ``array_intersect`` — is O(|block|²·|shingles|) and degenerates
    when a block is large (measured 14 s → 3 s at sf0.1 where one
    size bucket holds most docs).  Instead: explode (id, shingle)
    rows, equi-join on (block, shingle) so ONLY pairs that share a
    shingle are ever materialized, count shared shingles per pair
    (|A∩B|), and recover |A∪B| = |A| + |B| − |A∩B| from the
    per-doc sizes carried through the join.  Pairs with zero overlap
    never appear — correct for any threshold > 0.  Blocking is
    caller-provided so the oracle can reproduce it; at 10^12 docs the
    block key would be an LSH bucket.

    ``max_df`` is the stop-shingle cap for corpus scale: a shingle
    occurring in more than ``max_df`` docs of a block ("the", boiler-
    plate fragments) is excluded from CANDIDATE GENERATION — the
    self-join on such a key is quadratic in its document frequency and
    is exactly the hot key that stalls a 100 TB run.  Candidate pairs
    are then re-verified EXACTLY against the full shingle arrays
    (``array_intersect``), so reported Jaccard values are unchanged;
    the only approximation is recall: a pair whose entire overlap is
    stop-shingles is missed — for near-duplicates (high overlap of
    mostly-rare shingles) that pair does not exist.  This is the
    standard candidate+verify shape of prefix filtering (Bayardo et
    al. 2007).  Default None = fully exact single-phase join.
    """
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        word_hashes(F.col(text_col)).alias("wh"),  # digest pass, once
    ).select(
        *block_cols,
        "id",
        # int shingles: set ops compare longs, not strings
        shingle_hashes_from(F.col("wh"), n).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    # explode_outer + isNotNull: see minhash_signatures — plain explode
    # infers a size() filter whose pushdown re-inlines the whole
    # shingle expression below the projections (O(words²·md5)).
    ex = base.select(
        *block_cols, "id", "sz", F.explode_outer("sh").alias("h")
    ).filter(F.col("h").isNotNull())
    if max_df is not None:
        # The capped path references ex/base from up to three subplans
        # each (df-count + both join sides; both verify sides) —
        # materialize once so the md5-per-word shingle pass is not
        # recomputed per reference (localCheckpoint also truncates
        # lineage; same pattern as connected_components).
        base = base.localCheckpoint(eager=True)
        ex = base.select(
            *block_cols, "id", "sz", F.explode_outer("sh").alias("h")
        ).filter(F.col("h").isNotNull()).localCheckpoint(eager=True)
        # stop-shingle filter: df computed per (block, shingle) with
        # map-side partial agg; the filtered index drops the hot keys
        # BEFORE the self-join (candidate generation only — see doc).
        dfreq = ex.groupBy(*block_cols, "h").agg(F.count(F.lit(1)).alias("_df"))
        ex = ex.join(
            dfreq.filter(F.col("_df") <= max_df).select(*block_cols, "h"),
            [*block_cols, "h"],
        )
    a = ex.select(
        *block_cols, F.col("id").alias("a"), F.col("sz").alias("sz_a"), "h"
    )
    b = ex.select(
        *block_cols, F.col("id").alias("b"), F.col("sz").alias("sz_b"), "h"
    )
    if max_df is None:
        inter = (
            a.join(b, [*block_cols, "h"])
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        j = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        return (
            inter.select("a", "b", j.alias("j"))
            .filter(F.col("j") >= threshold)
            .select("a", "b", F.round("j", 4).alias("jaccard"))
        )
    # capped path: pruned index yields CANDIDATES only; the exact
    # intersection is recomputed from the full arrays per candidate
    # pair (bounded by candidate count, not by hot-key df²).
    cand = (
        a.select(*block_cols, "a", "h")
        .join(b.select(*block_cols, "b", "h"), [*block_cols, "h"])
        .filter(F.col("a") < F.col("b"))
        .select(*block_cols, "a", "b")
        .distinct()
    )
    sh_a = base.select(
        *block_cols, F.col("id").alias("a"),
        F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"),
    )
    sh_b = base.select(
        *block_cols, F.col("id").alias("b"),
        F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"),
    )
    verified = (
        cand.join(sh_a, [*block_cols, "a"])
        .join(sh_b, [*block_cols, "b"])
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    j = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    return (
        verified.select("a", "b", j.alias("j"))
        .filter(F.col("j") >= threshold)
        .select("a", "b", F.round("j", 4).alias("jaccard"))
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    Turns pairwise near-dup candidates into duplicate CLUSTERS — the
    step a training-data pipeline actually needs (keep one canonical
    doc per component, drop the rest).  Each node's label converges to
    the minimum node id reachable from it; ``cluster_id`` is that
    minimum, so the canonical representative is ``doc_id ==
    cluster_id``.

    Scale design: each iteration is one shuffle-join of the (symmetric)
    edge list against the current labels plus a min-aggregate — the
    standard label-propagation CC (Kiveris et al. "Connected
    Components in MapReduce", and the simple variant of
    large-star/small-star).  Iterations ∝ component diameter; near-dup
    clusters are shallow (dups of a common ancestor), so 3-5 rounds
    converge in practice; ``localCheckpoint`` truncates the growing
    lineage each round so the plan stays O(1).  The convergence probe
    is a count on the changed-label frontier, which also shrinks the
    join input as components settle.
    """
    sym = edges.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    ).unionAll(
        edges.select(
            F.col(b_col).cast("long").alias("src"), F.col(a_col).cast("long").alias("dst")
        )
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            labels.unionAll(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Silently returning unconverged labels would hand the caller
        # WRONG clusters; a component with diameter > max_iter is a
        # data smell (near-dup clusters are shallow) worth surfacing.
        import warnings as _warnings

        _warnings.warn(
            f"connected_components: not converged after {max_iter} "
            f"iterations ({changed} labels still changing); cluster "
            "ids may be split — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def simhash32(text: Column) -> Column:
    """32-bit SimHash over distinct tokens (Charikar 2002).

    Bit b is the sign of the sum of ±1 contributions of each token's
    hash bit b.  Bit extraction uses integer division by 2^b (exact —
    pow(2,b) ≤ 2^31 is exactly representable) so the identical formula
    runs in DuckDB."""
    hs = F.transform(F.array_distinct(words_of(text)), hex64)
    pow2 = lambda b: F.pow(F.lit(2.0), b).cast("long")  # noqa: E731
    # bit b of h == (h mod 2^(b+1)) >= 2^b — pure long arithmetic;
    # long `/` in Spark is DOUBLE division (precision loss > 2^53), so
    # integer division must be avoided.
    bit_contrib = lambda h, b: (  # noqa: E731
        F.when(h % (pow2(b) * 2) >= pow2(b), 1).otherwise(-1)
    )
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.when(
            F.aggregate(hs, F.lit(0).cast("long"), lambda acc, h: acc + bit_contrib(h, b)) > 0,
            pow2(b),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, v: acc + v)


def simhash_df(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    sig_bits: int = 32,
) -> DataFrame:
    """SimHash via explode → ``sig_bits`` codegen'd conditional sums
    (the scalable formulation of :func:`simhash32`; same values at
    sig_bits=32).  ``sig_bits`` may go up to 60 — every bit comes
    from the 60-bit hex64 word hash, and a wider signature is the
    web-scale dial: pigeonhole chunk width grows with it, so bucket
    count rises from 2^8 to 2^15 per chunk at 60 bits / 4 chunks,
    taming the quadratic candidate term (measured in BASELINE r5).

    Returns (id, simhash, n_distinct_tokens)."""
    if not 1 <= sig_bits <= 60:
        raise ValueError(f"sig_bits must be in [1, 60] (got {sig_bits})")
    pow2 = lambda b: 1 << b  # noqa: E731
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(words_of(F.col(text_col)))).alias("t"),
    ).select("id", hex64(F.col("t")).alias("h"))
    contribs = [
        F.sum(
            F.when(F.col("h") % F.lit(pow2(b) * 2) >= F.lit(pow2(b)), 1).otherwise(-1)
        ).alias(f"c{b}")
        for b in range(sig_bits)
    ]
    agg = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_distinct_tokens"), *contribs)
    simhash = None
    for b in range(sig_bits):
        term = F.when(F.col(f"c{b}") > 0, F.lit(pow2(b)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return agg.select("id", simhash.alias("simhash"), "n_distinct_tokens")


def simhash32_df(
    df: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """32-bit :func:`simhash_df` (kept as the stable name the oracle
    entries cite)."""
    return simhash_df(df, id_col=id_col, text_col=text_col, sig_bits=32)


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int = 4,
    sig_bits: int = 32,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance (Manku, Jain &
    Das Sarma, WWW 2007 — the production web-crawl dedup design).

    The r3 `dedup_simhash` entry only FINGERPRINTS; exact-signature
    equality misses the whole point of SimHash, which is that
    near-identical documents land within a few BITS of each other.
    This operator finds all pairs with ``hamming(sig_a, sig_b) <=
    max_hamming`` without a quadratic scan, via the pigeonhole
    blocking of the paper: split the 32-bit signature into
    ``n_chunks`` equal chunks — any pair within hamming distance
    ``max_hamming < n_chunks`` must agree EXACTLY on at least one
    whole chunk (at most ``max_hamming`` chunks contain a differing
    bit), so the candidate set is an equi-join on
    ``(chunk_idx, chunk_value)`` and the exact ``bit_count(a XOR b)``
    verification touches blocked candidates only.

    Scale: signatures are one map-side pass (simhash32_df); the only
    shuffle ships (id, simhash, chunk) rows — n_chunks × N rows of
    ~24 bytes, never text.  Each chunk is 32/n_chunks bits, so a
    chunk value has 2^(32/n_chunks) possible buckets (256 at the
    default) — at web scale raise the signature width / n_chunks
    together to keep |bucket| ≈ N/2^chunk_bits bounded, exactly the
    table-count/precision dial of Manku §3.  The blocking is exact,
    not approximate: recall at the stated radius is 1.0 by
    construction (unlike MinHash bands), which is why SimHash is the
    standard choice when the dedup SLA is "no missed pair within k
    bits".

    Returns (a, b, hamming), a < b, deduplicated across chunks.
    """
    sigs = simhash_df(
        df, id_col=id_col, text_col=text_col, sig_bits=sig_bits
    ).select("id", F.col("simhash").alias("sig"))
    out = hamming_pairs_from_sigs(
        sigs, sig_bits=sig_bits, max_hamming=max_hamming, n_chunks=n_chunks
    )
    return out


def hamming_pairs_from_sigs(
    sigs: DataFrame,
    sig_bits: int,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Generic pigeonhole hamming-pair join over (id, sig) rows — the
    Manku WWW'07 blocking shared by text SimHash (32-bit) and the
    multimodal perceptual-hash tier (48-bit): any pair within hamming
    ``max_hamming < n_chunks`` agrees exactly on ≥1 whole chunk, so
    candidates are one equi-join on (chunk_idx, chunk_value) and
    ``bit_count(XOR)`` verifies inside the join block.  Recall 1.0 at
    the stated radius by construction.  Returns (a, b, hamming),
    a < b, deduplicated across chunks."""
    if max_hamming >= n_chunks:
        raise ValueError(
            f"pigeonhole blocking needs max_hamming < n_chunks "
            f"(got {max_hamming} >= {n_chunks}); raise n_chunks"
        )
    if sig_bits % n_chunks:
        raise ValueError(f"n_chunks must divide {sig_bits} (got {n_chunks})")
    chunk_bits = sig_bits // n_chunks
    # chunk c = (sig div 2^(bits·c)) mod 2^bits — shiftright+mod in
    # Spark, // + % in the oracle; identical on non-negative sigs.
    ch = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    (
                        F.shiftright(F.col("sig"), chunk_bits * c)
                        % F.lit(1 << chunk_bits)
                    ).cast("long")
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    x, y = ch.alias("x"), ch.alias("y")
    ham = F.bit_count(F.col("x.sig").bitwiseXOR(F.col("y.sig"))).cast("long")
    # verify INSIDE the join stage, before the cross-chunk dedup: the
    # distinct's shuffle then carries only surviving pairs, not every
    # blocked candidate (hot buckets produce far more candidates than
    # matches).
    return (
        x.join(y, on=["chunk_idx", "chunk_val"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may collide on several chunks; count once
    )


def embedding_neardup_pairs_srp(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    n_bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicates blocked by OR-amplified
    SRP-LSH buckets — the DEFAULT scale formulation.

    Label/category blocking is quadratic within each block; with few
    huge categories (the realistic corpus shape) that is the
    scale-killer.  Sign-random-projection buckets (Charikar 2002;
    same construction as similarity.srp_bucket) are ~uniform AND
    similarity-preserving — but a single band is NOT enough at this
    function's own default threshold: a pair at cos 0.95 flips a
    plane's sign with probability θ/π = arccos(0.95)/π ≈ 0.101
    (0.03 corresponds to cos ≈ 0.995), so with P=6 planes both ids
    land in the same bucket only (1−0.101)^6 ≈ 0.53 of the time —
    about half the genuine pairs would be silently dropped.  The
    standard LSH fix is OR-amplification: ``n_bands`` independent
    plane families, a pair survives if ANY band agrees — recall
    1−(1−0.53)^B ≈ 0.95 at B=4 — at the cost of B bucket tables
    (the candidate join grows ~B×, still ~2^P/B below quadratic).
    Raise ``n_planes`` as the corpus grows to keep |bucket| bounded
    and ``n_bands`` to restore recall; the (band, bucket) pair is the
    join AND partition key, so AQE can split any residual hot bucket.
    Returns (a, b, cosine), deduplicated across bands.

    Candidate/verify split (measured 4.3 s → saved most of the B×
    overhead at sf0.1 when B went 1→4): the bucket join carries ONLY
    (band, bucket, id) — 8-byte ids instead of B-replicated 520-byte
    vectors — and pairs are DEDUPLICATED ACROSS BANDS before any
    cosine is computed, so a pair agreeing in all B bands costs one
    64-dim dot product, not B.  Vectors re-attach by two pair-sized
    id equi-joins (the embeddings table is scanned thrice, but
    columnar scans are cheap next to shuffling B× wide rows — at
    100 TB the shuffle is the bottleneck, not the scan)."""
    from extractor.operators.similarity import srp_bucket

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    # All B buckets computed in ONE inline array (B·P plane dots per
    # row, evaluated once — posexplode of a fixed-size array folds the
    # InferFiltersFromGenerate size() guard to a constant, so no
    # re-evaluation; see minhash_signatures' explode_outer note for
    # the variable-size case this avoids).
    # v is PROJECTED before srp_bucket touches it: an inline cast
    # would re-evaluate per HOF element access (the
    # shingle_hashes_from trap) — measured 3.4 s vs 0.75 s for this
    # bucket pass at sf0.1.
    buckets = F.array(
        *[srp_bucket(F.col("v"), n_planes, dim, plane_offset=t * n_planes)
          for t in range(n_bands)]
    )
    ids = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select(
        "id",
        F.posexplode(buckets).alias("band", "bucket"),
    )
    cand = (
        ids.select("band", "bucket", F.col("id").alias("a"))
        .join(ids.select("band", "bucket", F.col("id").alias("b")),
              ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()  # a pair can agree in several bands: verify once
    )
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(
            vecs.select(F.col("id").alias("a"), F.col("v").alias("va"),
                        F.col("nrm").alias("na")),
            "a",
        )
        .join(
            vecs.select(F.col("id").alias("b"), F.col("v").alias("vb"),
                        F.col("nrm").alias("nb")),
            "b",
        )
        .select("a", "b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)  # threshold on the UNROUNDED value
        .select("a", "b", F.round("cos", 6).alias("cosine"))
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    n_bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicates scoped to a CALLER-PROVIDED
    category column (only dedup within a label), blocked on the
    COMPOSITE key ``(label, band, srp_bucket)``.

    Blocking on the label alone is quadratic within each category —
    with few huge categories (the realistic corpus shape) that is a
    scale-killer.  Compounding the label with the same OR-amplified
    sign-random-projection buckets :func:`embedding_neardup_pairs_srp`
    uses keeps the within-category semantics (a pair in different
    labels can never join) while bounding every block to ~|label|/2^P
    rows; the composite is the join AND partition key, so AQE can
    split any residual hot (label, band, bucket).  Recall: a pair at
    cos 0.95 flips a plane sign with probability θ/π ≈ 0.101 per
    plane — one P=6 band keeps only ~0.53 of genuine pairs, so
    ``n_bands`` independent plane families are OR-ed (any band
    agreeing keeps the pair): recall ≈ 0.95 at the defaults, same
    trade as the unscoped SRP variant.

    Same candidate/verify split as
    :func:`embedding_neardup_pairs_srp`: the composite-key join moves
    (label, band, bucket, id) only, pairs dedup across bands BEFORE
    the one cosine per surviving pair, vectors re-attach by two
    pair-sized id equi-joins."""
    from extractor.operators.similarity import srp_bucket

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    buckets = F.array(
        *[srp_bucket(F.col("v"), n_planes, dim, plane_offset=t * n_planes)
          for t in range(n_bands)]
    )
    # same projected-v discipline as embedding_neardup_pairs_srp
    ids = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select(
        "blk",
        "id",
        F.posexplode(buckets).alias("band", "bucket"),
    )
    cand = (
        ids.select("blk", "band", "bucket", F.col("id").alias("a"))
        .join(
            ids.select("blk", "band", "bucket", F.col("id").alias("b")),
            ["blk", "band", "bucket"],
        )
        .filter(F.col("a") < F.col("b"))
        .select("blk", "a", "b")
        .distinct()  # a pair can agree in several bands: verify once
    )
    # Precompute norms row-side: O(N) instead of O(pairs) sqrt/dot.
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(
            vecs.select(F.col("id").alias("a"), F.col("v").alias("va"),
                        F.col("nrm").alias("na")),
            "a",
        )
        .join(
            vecs.select(F.col("id").alias("b"), F.col("v").alias("vb"),
                        F.col("nrm").alias("nb")),
            "b",
        )
        .select("blk", "a", "b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)  # threshold on the UNROUNDED value
        .select(
            F.col("blk").alias("label"), "a", "b",
            F.round("cos", 6).alias("cosine"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
) -> DataFrame:
    """Paragraph-grain exact dedup with document reconstruction — the
    CCNet/RefinedWeb line-level dedup shape (Wenzek et al. 2020 §4.1;
    Penedo et al. 2023): hash fixed chunks corpus-wide, keep only each
    chunk's FIRST occurrence (ordered by (doc, position)), rebuild
    every document from its surviving chunks.  Kills boilerplate that
    repeats ACROSS documents, which doc-level dedup cannot see.

    "Paragraph" here is a fixed ``chunk_words``-word window (the
    corpus text carries no newlines); a real pipeline splits on
    newline — only the chunking expression changes.

    Returns (id, n_chunks, n_kept, kept_text) for every document;
    fully-duplicate docs survive with n_kept=0 and kept_text ''.

    Scale shape: chunking is map-only (the word array is a MATERIALIZED
    projection — see minhash_signatures for the inline-HOF trap);
    first-occurrence selection is one groupBy(hash) min-aggregate with
    map-side partials over an ENCODED (doc, idx) key (single long, so
    min is a codegen'd primitive, no struct comparator) joined back on
    the hash; reconstruction is one groupBy(doc) array_sort aggregate.
    No window, no per-group state beyond a doc's own chunks."""
    n_chunks_col = F.ceil(F.size("w") / F.lit(chunk_words)).cast("int")
    chunked = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("w")
    ).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), n_chunks_col - 1),
            lambda i: F.array_join(
                F.slice(F.col("w"), i * chunk_words + 1, chunk_words), " "
            ),
        ).alias("chunks"),
    )
    # posexplode_outer + filter, NOT posexplode: the inferred size()>0
    # filter would re-inline the chunk expression below the projection
    ch = chunked.select(
        "id", F.posexplode_outer("chunks").alias("idx", "chunk")
    ).filter(F.col("idx").isNotNull()).select(
        "id", "idx", "chunk", F.md5("chunk").alias("h"),
        # encoded first-occurrence key: doc ids < 10^12, idx < 10^6
        (F.col("id") * F.lit(1_000_000) + F.col("idx")).alias("k"),
    )
    firsts = ch.groupBy("h").agg(F.min("k").alias("first_k"))
    kept = ch.join(firsts, "h").filter(F.col("k") == F.col("first_k"))
    totals = ch.groupBy("id").agg(F.count(F.lit(1)).alias("n_chunks"))
    kept_agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return totals.join(kept_agg, "id", "left").select(
        "id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination scan (the GPT-3 §C / PaLM n-gram
    overlap check): count each corpus document's distinct word n-gram
    hashes that also occur anywhere in the benchmark set.  Returns
    (id, n_hits) for contaminated docs only (n_hits >= 1); the caller
    thresholds.

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (eval suites are KBs against TBs) → distinct-hash set on
    the benchmark side, BROADCAST to the corpus-side equi-join, so the
    corpus shingles never shuffle; per-doc hit counts are a map-side-
    partial groupBy on the corpus's own partitioning."""
    def shingles(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            word_hashes(F.col(text_col)).alias("wh"),
        ).select(
            "id", F.explode_outer(shingle_hashes_from(F.col("wh"), n)).alias("h")
        ).filter(F.col("h").isNotNull())

    bench_sh = shingles(benchmark).select("h").distinct()
    return (
        shingles(corpus)
        .join(F.broadcast(bench_sh), "h")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def split_leakage(
    docs: DataFrame,
    split_col: str = "split",
    train_split: str = "train",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Cross-split contamination report: for every held-out split,
    how many documents share at least one word n-gram hash with the
    TRAIN split (Lee et al. 2022 §6 / GPT-3 §C applied to the
    train/eval boundary instead of external benchmarks — the check
    that a hash-bucket split didn't leak near-copies of eval text
    into training).  Returns one row per non-train split:
    (split, n_docs, n_leaked).

    Scale shape — the train side must NEVER shuffle (it is ~98% of a
    100 TB corpus): the held-out gram set is collected small
    (eval splits are ‰-scale by construction) and BROADCAST against
    the train shingle scan; the surviving intersection is at most the
    eval gram set, broadcast again onto the eval doc→gram map.  Two
    broadcasts, zero train-side shuffle, map-side-partial final
    aggregate.  The broadcast path assumes the eval gram set fits an
    executor (true for curated eval sets and for per-mille splits of
    mid-size corpora); when eval itself is web-scale (a 2% split of
    10^12 docs), set ``broadcast_eval=False`` and both joins become
    gram-bucketed equi-joins — the same shape as
    :func:`ngram_containment_pairs`, one shuffle keyed on the gram
    hash, no driver state either way.  Production decontamination
    raises ``n`` (8-13 grams); the trigram rolling combiner here
    shares :func:`shingle_hashes_from` with the whole dedup tier so
    oracle parity and the one-md5-per-word discipline carry over
    unchanged."""

    def shingles(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.col(split_col).alias("split"),
            word_hashes(F.col(text_col)).alias("wh"),
        ).select(
            "id",
            "split",
            F.explode_outer(shingle_hashes_from(F.col("wh"), n)).alias("h"),
        ).filter(F.col("h").isNotNull())

    sh = shingles(docs)
    train_sh = sh.filter(F.col("split") == train_split).select("h")
    eval_sh = sh.filter(F.col("split") != train_split)
    eval_gram_set = eval_sh.select("h").distinct()
    leaked_grams = train_sh.join(
        F.broadcast(eval_gram_set) if broadcast_eval else eval_gram_set, "h"
    ).select("h").distinct()
    leaked = (
        eval_sh.join(
            F.broadcast(leaked_grams) if broadcast_eval else leaked_grams, "h"
        )
        .select("split", "id")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaked"))
    )
    totals = (
        docs.filter(F.col(split_col) != train_split)
        .groupBy(F.col(split_col).alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return totals.join(leaked, "split", "left").select(
        "split",
        "n_docs",
        F.coalesce(F.col("n_leaked"), F.lit(0).cast("long")).alias("n_leaked"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """DIRECTIONAL n-gram containment |sh(A) ∩ sh(B)| / |sh(A)| within
    blocking groups (Broder 1997's containment measure): finds small
    documents embedded in larger ones — syndicated snippets, quoted
    articles, boilerplate-wrapped reposts — which symmetric Jaccard
    scores near 0 when the host document is much larger.

    Returns (a, b, containment) with ``a`` the CONTAINED doc; pairs
    are ordered, so (a,b) and (b,a) can both appear (mutual
    containment ≈ exact dup).  Same inverted-index shape as
    :func:`ngram_jaccard_pairs`: only pairs sharing a shingle are ever
    materialized, one equi-join shuffle on (block, shingle)."""
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        word_hashes(F.col(text_col)).alias("wh"),  # digest pass, once
    ).select(
        *block_cols, "id", shingle_hashes_from(F.col("wh"), n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    ex = base.select(
        *block_cols, "id", "sz", F.explode_outer("sh").alias("h")
    ).filter(F.col("h").isNotNull())
    a = ex.select(*block_cols, F.col("id").alias("a"), F.col("sz").alias("sz_a"), "h")
    b = ex.select(*block_cols, F.col("id").alias("b"), "h")
    inter = (
        a.join(b, [*block_cols, "h"])
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b", "sz_a")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    c = F.col("n_inter") / F.col("sz_a")
    return (
        inter.select("a", "b", c.alias("c"))
        .filter(F.col("c") >= threshold)
        .select("a", "b", F.round("c", 4).alias("containment"))
    )


def cluster_keep_best(
    cc: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    score: Column | None = None,
) -> DataFrame:
    """Quality-aware canonical selection per duplicate cluster: keep
    the member with the highest ``score`` (ties → smallest doc id) —
    RefinedWeb/Gopher pipelines keep the LONGEST capture of a
    near-dup cluster rather than an arbitrary one, because truncated
    or boilerplate-heavy variants are usually the shorter ones.
    Returns (cluster_id, keep_doc_id, keep_score, n_members).

    ``cc`` is :func:`connected_components` output (doc_id,
    cluster_id); ``docs`` supplies the score column (default: text
    length).  Scale shape: one equi-join of the edge-sized cluster
    table against the corpus on doc_id (scores move as (id, long)
    pairs, text never shuffles), then one ``max(struct(score,
    -doc_id))`` aggregate per cluster — constant reduce state, no
    per-cluster window, deterministic on score ties via the struct
    fallthrough.
    """
    score = score if score is not None else F.length(F.col("text"))
    m = cc.join(
        docs.select(F.col(id_col).alias("doc_id"), score.cast("long").alias("score")),
        "doc_id",
    )
    best = F.max(
        F.struct(F.col("score"), (-F.col("doc_id")).alias("neg_id"))
    ).alias("best")
    return (
        m.groupBy("cluster_id")
        .agg(best, F.count(F.lit(1)).cast("long").alias("n_members"))
        .select(
            "cluster_id",
            (-F.col("best.neg_id")).cast("long").alias("keep_doc_id"),
            F.col("best.score").cast("long").alias("keep_score"),
            "n_members",
        )
    )


def host_template_lines(
    pages: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pages: int = 3,
    min_frac_bp: int = 6000,
) -> DataFrame:
    """Per-host boilerplate-template discovery: lines that repeat on
    at least ``min_frac_bp``/10000 of a host's pages (hosts with
    fewer than ``min_pages`` pages are skipped — one page can't
    witness a template).  This is the HOST-CONDITIONED complement to
    :func:`paragraph_dedup`: corpus-wide first-occurrence dedup keeps
    one copy of a nav bar *somewhere*, while the site-template view
    identifies the nav bar as structure so :func:`strip_template_lines`
    can remove every copy — the CCNet-adjacent cleaner for
    DOM-heuristic leakage (cookie banners, footers, share widgets
    that survive text-density extraction on some site layouts).

    Returns (host, line, n_docs, n_pages, frac_bp).

    Scale shape: split → trim → drop-empty is map-only; a per-page
    ``array_distinct`` bounds within-page repeats BEFORE the shuffle;
    the one wide shuffle is the distinct (host, page, line)
    projection feeding a (host, line) count with map-side partials —
    line text crosses the wire once, same cost class as
    paragraph_dedup's chunk pass (at 100 TB, group on (host,
    xxhash64(line)) and recover a representative with min(line) in
    the same aggregate if line text dominates the shuffle).  Host
    page counts are a hosts×1 aggregate; the join strategy is left
    to Catalyst (broadcast under the threshold, shuffle beyond —
    millions of hosts on a real crawl)."""
    lines = (
        pages.select(
            F.col(host_col).alias("host"),
            F.col(id_col).alias("pid"),
            F.expr(
                f"array_distinct(filter(transform(split({text_col}, '\\n'),"
                " l -> trim(l)), l -> l <> ''))"
            ).alias("_ls"),
        )
        .select("host", "pid", F.explode("_ls").alias("line"))
        .distinct()
    )
    counts = lines.groupBy("host", "line").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    npages = (
        pages.select(F.col(host_col).alias("host"), F.col(id_col).alias("pid"))
        .distinct()
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )
    return (
        counts.join(npages, "host")
        .filter(
            (F.col("n_pages") >= min_pages)
            & (10000 * F.col("n_docs") >= min_frac_bp * F.col("n_pages"))
        )
        .select(
            "host",
            "line",
            "n_docs",
            "n_pages",
            # integer div: bit-exact vs the oracle's `//` (float
            # division + cast can round a near-integer up before the
            # truncation)
            F.expr("(10000 * n_docs) div n_pages").alias("frac_bp"),
        )
    )


def strip_template_lines(
    pages: DataFrame,
    templates: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove a host's template lines from every one of its pages —
    the apply half of :func:`host_template_lines` (``templates`` is
    its output, or any (host, line) table).  Line order is preserved;
    matching is on the TRIMMED line, but surviving lines keep their
    original bytes.  Returns (host, id, text) with the cleaned text.

    Scale shape: posexplode is map-only; the template join is an
    anti equi-join on (host, trimmed line) — template tables are
    hosts×templates-sized, strategy left to Catalyst; reconstruction
    is the paragraph_dedup array_sort aggregate (a page's own lines,
    bounded state).  Pages whose every line was template survive
    with text '' (the quality gate downstream drops them)."""
    exploded = pages.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "raw"),
    ).withColumn("line", F.trim("raw"))
    kept = exploded.join(
        templates.select(
            F.col("host").alias("t_host"), F.trim(F.col("line")).alias("t_line")
        ),
        (F.col("host") == F.col("t_host")) & (F.col("line") == F.col("t_line")),
        "left_anti",
    )
    kept_agg = kept.groupBy("host", "id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "raw"))),
                lambda s: s["raw"],
            ),
            "\n",
        ).alias("_text")
    )
    ids = pages.select(
        F.col(host_col).alias("host"), F.col(id_col).alias("id")
    ).distinct()
    return ids.join(kept_agg, ["host", "id"], "left").select(
        "host", "id", F.coalesce("_text", F.lit("")).alias("text")
    )


def top_duplicated_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide most-duplicated n-grams — the memorization-risk
    report (Lee et al. 2022 / Carlini et al. 2022 observe models
    regurgitate exactly the sequences that repeat most across
    training documents; this is the list an operator reviews and
    turns into strip rules or dup_span thresholds).  Counts DOCUMENT
    frequency (an n-gram repeated inside one doc counts once — that's
    repetition_stats' job), keeps n-grams on ≥ ``min_docs`` docs, and
    returns the global top ``k`` as ``(rank, ngram, n_docs)``,
    ties broken by ngram text so the cut is deterministic.

    Scale shape: sliding n-grams from a MATERIALIZED word array
    (map-only), per-doc distinct bounds within-doc repeats before the
    wire, one (ngram) count with map-side partials, then the bounded
    two-level :func:`~extractor.operators.topk.grouped_topk` with an
    empty group list — a GLOBAL top-k with per-bucket state ≤ B·k,
    never a single-reducer ORDER BY over the full n-gram table.  The
    count shuffle carries n-gram strings once (same cost class as
    vocab_topk's token shuffle)."""
    from extractor.operators.topk import grouped_topk_exploded

    w = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("ws")
    ).filter(F.size("ws") >= n)
    grams = (
        w.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - (n - 1)),
                    lambda i: F.array_join(F.slice("ws", i, n), " "),
                )
            ).alias("ngram"),
        )
        .distinct()
    )
    counts = (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    ranked = grouped_topk_exploded(
        counts.select(F.struct((-F.col("n_docs")).alias("neg"), "ngram").alias("key")),
        [],
        F.col("key"),
        k=k,
    )
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        F.col("value")["ngram"].alias("ngram"),
        (-F.col("value")["neg"]).cast("long").alias("n_docs"),
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Remove cross-document duplicated spans from each document —
    the SURGERY half of the ExactSubstr signal
    (:func:`duplicated_span_stats` measures it; Lee et al. 2022 strip
    it): license blocks, nav chrome and syndication banners that
    document-level dedup keeps because the host documents differ.

    Word-trigram grain, same hash family as the rest of the dedup
    tier: a word position is covered iff ANY trigram occurrence
    containing it (gram starts i−2..i, clamped) has document
    frequency ≥ ``min_docs``.  The document is rebuilt from the
    uncovered words in original order with original bytes; a fully
    boilerplate document survives as ``''`` (the host-template-strip
    precedent — dropping rows is the caller's policy).

    Scale shape — no per-document quadratic anywhere: grams explode to
    (id, pos, h) rows ((long,long,long) — text never rides the gram
    shuffle); the dup-hash set is the distinct-projection df aggregate
    of duplicated_span_stats (hot grams bounded by df, no self-join);
    coverage expands each duplicated gram start to ≤ 3 (id, wpos) rows
    and dedups; the rebuild is words posexploded once, one LEFT ANTI
    equi-join on (id, wpos) against the covered set, and one
    array_sort(collect_list(struct)) reassembly per doc — the
    paragraph_dedup reconstruction shape, bounded by document length.

    Returns (doc_id, clean_text, n_words, n_kept, n_removed)."""
    src = df.select(
        F.col(id_col).alias("id"),
        words_of(F.col(text_col)).alias("ws"),
        # projected, never inline: the HOF interpreter re-evaluates an
        # inline array argument per element access (see
        # shingle_hashes_from's O(words²·md5) warning)
        word_hashes(F.col(text_col)).alias("wh"),
    ).withColumn("nw", F.size("ws"))
    grams = (
        src.select(
            "id",
            "nw",
            F.posexplode_outer(shingle_hashes_all(F.col("wh"))).alias("pos", "h"),
        )
        .filter(F.col("h").isNotNull())
        .localCheckpoint(eager=True)
    )
    dup = (
        grams.select("id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("h")
    )
    covered = (
        grams.join(dup, "h")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.least(F.col("pos") + 2, F.col("nw") - 1))
            ).alias("wpos"),
        )
        .distinct()
    )
    words = src.select(
        "id", F.posexplode("ws").alias("wpos", "w")
    )
    rebuilt = (
        words.join(covered, ["id", "wpos"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        src.select("id", "nw")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("nw").cast("long").alias("n_words"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("nw") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def winnowing_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
) -> DataFrame:
    """Candidate pairs by shared winnowing fingerprints (Schleimer et
    al. SIGMOD 2003 — the MOSS local-similarity design): two
    documents sharing ANY word run of length ≥ window+k−1 (= 6 at
    the tier's trigram grain, w=4) are GUARANTEED to share a
    fingerprint, so partial overlap — a quoted paragraph, a lifted
    section — surfaces even when whole-document similarity is far
    below any dedup threshold.  The complement to MinHash (global
    resemblance) and containment (directional inclusion): winnowing
    finds LOCAL matches with a bounded index.

    Scale shape: fingerprints are the winnowing selection (~2/(w+1)
    of all grams — the density guarantee), computed entirely
    array-side from projected hash columns; the pair join is the
    tier's standard inverted index on the fingerprint value with the
    ``max_df`` hot-value cap (a boilerplate fingerprint's bucket is
    excluded before the self-join, same guard as the shingle index);
    only (id, long) rows shuffle.  Returns (a, b, n_shared) with
    a < b and n_shared ≥ ``min_shared``."""
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            # projected hash columns — HOF re-evaluation trap, as ever
            word_hashes(F.col(text_col)).alias("wh"),
        )
        .select("id", shingle_hashes_all(F.col("wh")).alias("sh"))
        # materialization BARRIER, not just a projection split: the fps
        # lambda below references `sh` only once, so CollapseProject
        # would inline the whole shingle expression into every window
        # slice — measured 318 s → ~20 s at sf0.01 with the barrier
        .localCheckpoint(eager=True)
    )
    upper = F.greatest(F.size("sh") - window, F.lit(0))
    fps = sh.select(
        "id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), upper),
                lambda i: F.array_min(F.slice(F.col("sh"), i + 1, window)),
            )
        ).alias("fps"),
    )
    fpr = fps.select("id", F.explode("fps").alias("f")).localCheckpoint(
        eager=True
    )
    keep = (
        fpr.groupBy("f")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("f")
    )
    idx = fpr.join(keep, "f")
    a, b = idx.alias("a"), idx.alias("b")
    return (
        a.join(b, (F.col("a.f") == F.col("b.f")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
