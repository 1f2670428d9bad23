"""Text dedup tier: exact/minhash/simhash/ngram/CDC/winnowing, span surgery, incremental indexes, measured recall."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.queries._core import (  # noqa: F401
    register,
    _DUP_INJECT_SQL,
    _HEX64_SQL,
    _LSH_CTES,
    _NEARDUP_CORPUS_SQL,
    _NEARDUP_MARKER,
    _docs,
    _inject_dups,
)

@register(
    "dedup_exact",
    f"""
    WITH corpus AS ({_DUP_INJECT_SQL})
    SELECT md5(text) AS text_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM corpus
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, canonical = min doc_id.  Scale: one
    shuffle on a 32-byte key; map-side partial agg collapses dups
    before the exchange."""
    corpus = _inject_dups(_docs(spark, sf_dir))
    return corpus.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )

@register(
    "dedup_exact_normalized",
    f"""
    WITH corpus AS ({_DUP_INJECT_SQL})
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM corpus
    GROUP BY 1
    """,
)
def q_dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _inject_dups(_docs(spark, sf_dir))
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return corpus.groupBy(F.md5(norm).alias("norm_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )

@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_LSH_CTES}
    SELECT a, b, round(min(est), 4) AS est_jaccard
    FROM pairs GROUP BY a, b HAVING min(est) >= 0.5
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4×4) near-dup pairs — see operators.dedup for
    the scale analysis (band join is the only shuffle)."""
    from extractor.operators.dedup import lsh_pairs

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    return lsh_pairs(corpus, k=16, bands=4, threshold=0.5).select(
        F.col("a"), F.col("b"), F.col("est_jaccard")
    )

@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    cand AS (
      SELECT a, b FROM pairs GROUP BY a, b HAVING min(est) >= 0.5
    ), sym AS (
      SELECT a AS src, b AS dst FROM cand
      UNION
      SELECT b AS src, a AS dst FROM cand
    ), reach(node, lbl) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id,
           (node = min(lbl)) AS is_canonical
    FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: LSH candidate pairs → connected
    components (iterative min-label propagation) → cluster id + the
    canonical-representative flag a dedup pipeline keeps.  Oracle:
    transitive closure via recursive CTE (same min-reachable-id
    semantics)."""
    from extractor.operators.dedup import connected_components, lsh_pairs

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    edges = lsh_pairs(corpus, k=16, bands=4, threshold=0.5)
    cc = connected_components(edges)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )

@register(
    "dedup_ngram_jaccard",
    f"""
    WITH corpus AS (
      SELECT d.doc_id, d.text, d.lang, d.n_chars FROM documents d
      UNION ALL
      SELECT doc_id + 1000000, text || ' near duplicate tail marker', lang, n_chars
      FROM documents WHERE doc_id % 10 = 0
    ), wh AS (
      SELECT doc_id, lang, n_chars // 100 AS size_bucket,
             list_transform(string_split(text, ' '),
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS wh
      FROM corpus
    ), sh AS (
      SELECT doc_id, lang, size_bucket,
             list_distinct(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647)) AS sh
      FROM wh
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           round(length(list_intersect(a.sh, b.sh))::DOUBLE /
                 length(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.size_bucket = b.size_bucket AND a.doc_id < b.doc_id
    WHERE length(list_intersect(a.sh, b.sh))::DOUBLE /
          length(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard within (lang, size-bucket) blocks."""
    from extractor.operators.dedup import ngram_jaccard_pairs

    corpus = _inject_dups(
        _docs(spark, sf_dir), marker=_NEARDUP_MARKER, extra_cols=("lang", "n_chars")
    )
    corpus = corpus.withColumn(
        "size_bucket", F.floor(F.col("n_chars") / 100).cast("long")
    )
    return ngram_jaccard_pairs(
        corpus, block_cols=["lang", "size_bucket"], threshold=0.2
    )

@register(
    "dedup_simhash",
    f"""
    WITH hs AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                            t -> {_HEX64_SQL.format(x='t')}) AS hs
      FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(generate_series(0, 31), b ->
             CASE WHEN list_sum(list_transform(hs,
                    h -> 2 * ((h // (2 ** b)::BIGINT) % 2) - 1)) > 0
                  THEN (2 ** b)::BIGINT ELSE 0 END)) AS BIGINT) AS simhash,
           length(hs) AS n_distinct_tokens
    FROM hs
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (Charikar 2002) via the
    explode→codegen'd-sum formulation (operators.dedup.simhash32_df)."""
    from extractor.operators.dedup import simhash32_df

    docs = _docs(spark, sf_dir)
    return simhash32_df(docs, id_col="doc_id", text_col="text").select(
        F.col("id").alias("doc_id"), "simhash", F.col("n_distinct_tokens").cast("long")
        .alias("n_distinct_tokens"),
    )

@register(
    "dedup_simhash_hamming",
    f"""
    WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
    hs AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                            t -> {_HEX64_SQL.format(x='t')}) AS hs
      FROM corpus
    ), sig AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, 31), b ->
               CASE WHEN list_sum(list_transform(hs,
                      h -> 2 * ((h // (2 ** b)::BIGINT) % 2) - 1)) > 0
                    THEN (2 ** b)::BIGINT ELSE 0 END)) AS BIGINT) AS simhash
      FROM hs
    ), ch AS (
      SELECT doc_id, simhash, c.c AS chunk_idx,
             (simhash // (2 ** (8 * c.c))::BIGINT) % 256 AS chunk_val
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS c) c
    ), cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
             x.simhash AS sa, y.simhash AS sb
      FROM ch x JOIN ch y
        ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val
       AND x.doc_id < y.doc_id
    )
    SELECT a, b, bit_count(xor(sa, sb))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def q_dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS within hamming radius 3 (Manku/WWW'07
    pigeonhole blocking) — the fingerprint tier's missing second half:
    `dedup_simhash` computes signatures, this finds the neighbors.
    The injected tail-edit copies land a few bits from their originals
    and surface here; exact-equality grouping would miss them all."""
    from extractor.operators.dedup import simhash_hamming_pairs

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    return simhash_hamming_pairs(
        corpus, id_col="doc_id", text_col="text", max_hamming=3, n_chunks=4
    )

@register(
    "doc_fingerprint",
    f"""
    WITH hs AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            t -> {_HEX64_SQL.format(x='t')} % 1000) AS hs
      FROM documents
    )
    SELECT doc_id,
           list_reduce([0]::BIGINT[] || hs,
                       (a, h) -> (a * 131 + h) % 1000000007) AS fingerprint
    FROM hs
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling polynomial fingerprint of the token
    stream (Rabin-Karp / winnowing family)."""
    from extractor.operators.textstats import fingerprint

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))

@register(
    "winnowing_fingerprints",
    f"""
    WITH wh AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM documents
    ), sh AS (  -- rolling trigram hashes (same spec as dedup shingles)
      SELECT doc_id,
             list_transform(generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647) AS sh
      FROM wh
    ), fp AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(generate_series(0, greatest(length(sh) - 4, 0)),
                 i -> list_min(sh[i+1:i+4])))) AS fingerprints
      FROM sh
    )
    SELECT doc_id,
           length(fingerprints)::BIGINT AS n_fingerprints,
           array_to_string(list_transform(fingerprints, x -> x::VARCHAR), ',')
             AS fingerprints_csv
    FROM fp
    """,
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer et al. 2003, value-distinct variant):
    k-gram rolling hashes → min per sliding window of w=4 → distinct
    selected values.  Guarantees any shared run ≥ w+k-1 words between
    two documents shares a fingerprint — the partial-overlap detector
    exact dedup misses.  Map-only over a materialized hash column;
    window minima are O(w) slices of a bound column (never an inline
    re-evaluated array).  Registry surface projects the fingerprint
    array to scalars (count + csv) so the driver's canonicalizer can
    hash rows (pandas cannot factorize list cells)."""
    from extractor.operators.dedup import MERSENNE31, _SH_A, _SH_B, word_hashes

    docs = _docs(spark, sf_dir)
    wh = F.col("wh")
    # try_element_at: ANSI-safe past-the-end access on 1-2-word docs
    # (null → 0, the oracle's wh[i+2] semantics).
    shingle = lambda i: (  # noqa: E731
        F.element_at(wh, i + 1) * _SH_A
        + F.coalesce(F.try_element_at(wh, i + 2), F.lit(0).cast("long")) * _SH_B
        + F.coalesce(F.try_element_at(wh, i + 3), F.lit(0).cast("long"))
    ) % MERSENNE31
    with_sh = docs.select(
        "doc_id", word_hashes(F.col("text")).alias("wh")
    ).select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(wh) - 3, F.lit(0))), shingle
        ).alias("sh"),
    )
    sh = F.col("sh")
    fp = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(sh) - 4, F.lit(0))),
                lambda i: F.array_min(F.slice(sh, i + 1, 4)),
            )
        )
    )
    return with_sh.select("doc_id", fp.alias("fingerprints")).select(
        "doc_id",
        F.size("fingerprints").cast("long").alias("n_fingerprints"),
        F.array_join(
            F.transform(F.col("fingerprints"), lambda x: x.cast("string")), ","
        ).alias("fingerprints_csv"),
    )

@register(
    "paragraph_dedup",
    f"""
    WITH corpus AS ({_DUP_INJECT_SQL}),
    w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    ch AS (
      SELECT doc_id, i.i AS idx,
             array_to_string(list_slice(w, i.i * 10 + 1, i.i * 10 + 10), ' ')
               AS chunk
      FROM w, LATERAL (SELECT unnest(generate_series(0,
             CAST(ceil(length(w) / 10.0) AS INT) - 1)) AS i) i
    ),
    h AS (SELECT doc_id, idx, chunk, md5(chunk) AS h,
                 doc_id * 1000000 + idx AS k FROM ch),
    firsts AS (SELECT h, min(k) AS first_k FROM h GROUP BY h),
    kept AS (
      SELECT hh.doc_id, hh.idx, hh.chunk
      FROM h hh JOIN firsts f ON f.h = hh.h AND hh.k = f.first_k
    ),
    totals AS (SELECT doc_id, count(*) AS n_chunks FROM h GROUP BY doc_id),
    ka AS (SELECT doc_id, count(*) AS n_kept,
                  string_agg(chunk, ' ' ORDER BY idx) AS kept_text
           FROM kept GROUP BY doc_id)
    SELECT t.doc_id AS id, t.n_chunks::BIGINT AS n_chunks,
           coalesce(ka.n_kept, 0)::BIGINT AS n_kept,
           md5(coalesce(ka.kept_text, '')) AS kept_md5
    FROM totals t LEFT JOIN ka ON ka.doc_id = t.doc_id
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style paragraph-grain dedup with document
    reconstruction (operators.dedup.paragraph_dedup): corpus-wide
    first-occurrence on 10-word chunk hashes; injected full copies
    (every 10th doc) come back with n_kept 0."""
    from extractor.operators.dedup import paragraph_dedup

    out = paragraph_dedup(_inject_dups(_docs(spark, sf_dir)), chunk_words=10)
    return out.select(
        "id", "n_chunks", "n_kept", F.md5("kept_text").alias("kept_md5")
    )

@register(
    "benchmark_contamination",
    f"""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 50 = 3
    ), corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 3
      UNION ALL
      SELECT doc_id + 2000000, text || ' benchmark leak suffix words'
      FROM bench
    ), bwh AS (
      SELECT doc_id, list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM bench
    ), bsh AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647))) AS h
      FROM bwh
    ), cwh AS (
      SELECT doc_id, list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM corpus
    ), csh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647))) AS h
      FROM cwh
    )
    SELECT c.doc_id AS id, count(*)::BIGINT AS n_hits
    FROM csh c JOIN bsh b ON b.h = c.h
    GROUP BY c.doc_id
    """,
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan (GPT-3 §C / PaLM style): distinct trigram
    hashes shared with the benchmark subset (doc_id%50==3), benchmark
    side broadcast (operators.dedup.ngram_contamination).  Injected
    leak copies (benchmark text + suffix) are the expected hits;
    natural cross-doc overlaps count symmetrically in both engines."""
    from extractor.operators.dedup import ngram_contamination

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 3)
    leaked = bench.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" benchmark leak suffix words")).alias("text"),
    )
    corpus = docs.filter(F.col("doc_id") % 50 != 3).unionAll(leaked)
    return ngram_contamination(corpus, bench)

@register(
    "split_leakage",
    f"""
    -- cross-split contamination: held-out docs sharing >=1 trigram
    -- hash with the train split (near-dup injection guarantees some
    -- leakage crosses the salted-hash split boundary)
    WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
    sp AS (
      SELECT doc_id, text,
             CASE WHEN {_HEX64_SQL.format(x="'split:' || doc_id::VARCHAR")}
                       % 1000 < 980 THEN 'train'
                  WHEN {_HEX64_SQL.format(x="'split:' || doc_id::VARCHAR")}
                       % 1000 < 995 THEN 'validation'
                  ELSE 'test' END AS split
      FROM corpus
    ), wh AS (
      SELECT doc_id, split,
             list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM sp
    ), sh AS (
      SELECT doc_id, split, unnest(list_distinct(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647))) AS h
      FROM wh
    ), train_grams AS (
      SELECT DISTINCT h FROM sh WHERE split = 'train'
    ), leaked AS (
      SELECT s.split, count(DISTINCT s.doc_id)::BIGINT AS n_leaked
      FROM sh s JOIN train_grams t USING (h)
      WHERE s.split <> 'train'
      GROUP BY s.split
    )
    SELECT p.split, count(*)::BIGINT AS n_docs,
           coalesce(min(l.n_leaked), 0)::BIGINT AS n_leaked
    FROM sp p LEFT JOIN leaked l ON p.split = l.split
    WHERE p.split <> 'train'
    GROUP BY p.split
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination audit (operators.dedup.split_leakage):
    after the salted-hash train/validation/test assignment
    (train_split_assign's rule), count held-out documents sharing any
    trigram hash with train.  The injected near-dup copies (ids +1e6,
    tail-edited text) land in splits independently of their originals,
    so some leakage crosses the boundary by construction — exactly
    the failure mode this audit exists to catch before an eval set
    ships.  Train-side shingles never shuffle: the eval gram set and
    the surviving intersection are both broadcast (eval splits are
    ‰-scale by design), so at 100 TB this costs one train scan."""
    from extractor.operators.dedup import hex64, split_leakage

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    bucket = hex64(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 1000
    assigned = corpus.select(
        "doc_id",
        "text",
        F.when(bucket < 980, F.lit("train"))
        .when(bucket < 995, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return split_leakage(assigned)

@register(
    "dedup_incremental_lsh",
    # The oracle IS the one-shot SQL: batched dedup against the
    # committed band index must equal a single lsh_pairs pass over the
    # whole corpus — the operator's core invariant, driver-checked.
    f"""
    WITH {_LSH_CTES}
    SELECT a, b, round(min(est), 4) AS est_jaccard
    FROM pairs GROUP BY a, b HAVING min(est) >= 0.5
    """,
)
def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl-batch dedup (operators.incremental): the
    corpus arrives as two batches; batch 2 dedups against batch 1's
    COMMITTED band-signature snapshot (history text never re-read),
    and the union of per-batch pair sets must equal the one-shot LSH
    over everything — which is exactly what the oracle computes.  The
    index lives in a per-run scratch dir (the registry query is
    self-contained); production points it at a durable table."""
    import tempfile

    from extractor.operators.incremental import incremental_lsh_dedup

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    # batch 1: first half of the original docs; batch 2: the rest plus
    # every injected copy (ids +1e6) — cross-batch dups guaranteed
    b1 = corpus.filter(F.col("doc_id") < 250)
    b2 = corpus.filter(F.col("doc_id") >= 250)
    index_dir = tempfile.mkdtemp(prefix="lsh_index_")
    p1 = incremental_lsh_dedup(b1, index_dir, threshold=0.5)
    p2 = incremental_lsh_dedup(b2, index_dir, threshold=0.5)
    # pair sets are disjoint (every p2 pair touches a batch-2 doc), so
    # the union IS the one-shot result
    return p1.unionByName(p2)

@register(
    "dedup_incremental_exact",
    """
    -- the oracle is the one-shot first-occurrence classification
    -- with batch boundaries drawn in (batch 1 = doc_id < 250): a
    -- digest seen in batch 1 makes EVERY batch-2 holder a
    -- dup_of_history; within a digest's earliest batch the min id is
    -- 'new' and the rest are dup_in_batch.  Content: every multiple
    -- of 10 carries the text of its 100-block base, so blocks plant
    -- both in-batch and cross-batch exact dup families on top of
    -- whatever duplicate texts the raw table already has.
    WITH content AS (
      SELECT d.doc_id,
             md5(s.text) AS digest,
             CASE WHEN d.doc_id < 250 THEN 1 ELSE 2 END AS batch
      FROM documents d
      JOIN documents s
        ON s.doc_id = CASE WHEN d.doc_id % 10 = 0
                           THEN (d.doc_id // 100) * 100
                           ELSE d.doc_id END
    ),
    mins AS (
      SELECT digest,
             min(CASE WHEN batch = 1 THEN doc_id END) AS min1,
             min(CASE WHEN batch = 2 THEN doc_id END) AS min2
      FROM content GROUP BY digest
    )
    SELECT c.doc_id AS id, c.digest,
           CASE
             WHEN c.batch = 2 AND m.min1 IS NOT NULL THEN 'dup_of_history'
             WHEN c.batch = 1 AND c.doc_id = m.min1 THEN 'new'
             WHEN c.batch = 2 AND c.doc_id = m.min2 THEN 'new'
             ELSE 'dup_in_batch'
           END AS status
    FROM content c JOIN mins m USING (digest)
    """,
)
def q_dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-digest incremental dedup
    (operators.incremental.incremental_exact_dedup): the membership
    gate in FRONT of the fuzzy index — batch 2 classifies against
    batch 1's committed digest snapshot without re-reading any
    history text; per-crawl cost O(batch).  Every multiple-of-10 doc
    carries its 100-block base's text, planting in-batch dup families
    (300..390 inside batch 2) and cross-batch ones (250..290 → 200,
    committed by batch 1); the oracle is the one-shot
    first-occurrence classification with the batch boundary drawn
    in — the operator's core invariant, driver-checked."""
    import tempfile

    from extractor.operators.incremental import incremental_exact_dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    src = docs.select(
        F.col("doc_id").alias("s_id"), F.col("text").alias("s_text")
    )
    content = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0, (F.col("doc_id") / 100).cast("long") * 100
        )
        .otherwise(F.col("doc_id"))
        .alias("content_src"),
    ).join(src, F.col("content_src") == F.col("s_id")).select(
        "doc_id", F.col("s_text").alias("text")
    )
    b1 = content.filter(F.col("doc_id") < 250)
    b2 = content.filter(F.col("doc_id") >= 250)
    index_dir = tempfile.mkdtemp(prefix="md5_index_")
    r1 = incremental_exact_dedup(b1, index_dir)
    r2 = incremental_exact_dedup(b2, index_dir)
    return r1.unionByName(r2)

@register(
    "lsh_index_stats",
    # Band rows are a pure per-doc function, so the two-batch committed
    # index equals the one-shot `banded` CTE over the whole corpus —
    # the same invariant dedup_incremental_lsh is checked on.
    f"""
    WITH {_LSH_CTES},
    sizes AS (
      SELECT band_idx, band_key, count(*) AS sz
      FROM banded GROUP BY band_idx, band_key
    )
    SELECT band_idx::INT AS band_idx, sum(sz)::BIGINT AS n_rows,
           count(*)::BIGINT AS n_buckets, max(sz)::BIGINT AS max_bucket,
           sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singletons,
           sum(sz * (sz - 1) // 2)::BIGINT AS candidate_pairs
    FROM sizes GROUP BY band_idx
    """,
)
def q_lsh_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability over the committed incremental-dedup index
    (operators.incremental.index_band_stats): per-band bucket counts,
    hot-bucket max, singleton count and Σ s·(s−1)/2 candidate-pair
    mass — the numbers an operator team reads to retune bands/k
    BEFORE the next crawl batch probes the index.  The index is built
    here from the same two-batch split as dedup_incremental_lsh via
    the two-step commit API (banded_signatures → commit_band_rows),
    and the stats never read the corpus text."""
    import tempfile

    from extractor.operators.dedup import banded_signatures
    from extractor.operators.incremental import (
        commit_band_rows,
        index_band_stats,
    )

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    b1 = corpus.filter(F.col("doc_id") < 250)
    b2 = corpus.filter(F.col("doc_id") >= 250)
    index_dir = tempfile.mkdtemp(prefix="lsh_stats_")
    commit_band_rows(banded_signatures(b1), index_dir)
    commit_band_rows(banded_signatures(b2), index_dir)
    return index_band_stats(spark, index_dir)

@register(
    "dedup_containment",
    f"""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      -- injected snippets: the first 30 words of every 7th doc — the
      -- syndicated-excerpt case symmetric Jaccard misses
      SELECT doc_id + 3000000,
             array_to_string(list_slice(string_split(text, ' '), 1, 30), ' '),
             lang
      FROM documents WHERE doc_id % 7 = 0
    ), wh AS (
      SELECT doc_id, lang,
             list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM corpus
    ), sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647)) AS sh
      FROM wh
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           round(length(list_intersect(a.sh, b.sh))::DOUBLE / length(a.sh), 4)
             AS containment
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id <> b.doc_id
    WHERE length(list_intersect(a.sh, b.sh))::DOUBLE / length(a.sh) >= 0.8
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional n-gram containment (operators.dedup.
    ngram_containment_pairs): |sh(A)∩sh(B)| / |sh(A)| ≥ 0.8 within
    lang blocks — injected 30-word snippets of every 7th doc are the
    expected contained-in-host pairs (their symmetric Jaccard vs the
    host is far below any dedup threshold)."""
    from extractor.operators.dedup import ngram_containment_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    snippets = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 30), " ").alias("text"),
        "lang",
    )
    corpus = docs.unionAll(snippets)
    return ngram_containment_pairs(
        corpus, block_cols=["lang"], threshold=0.8
    )

@register(
    "top_dup_ngrams",
    """
    -- window formulation of the global top-k; the engine runs the
    -- bounded two-level grouped_topk instead.  Every 7th doc carries
    -- a planted 9-word tail whose five 5-grams must dominate.
    WITH w AS (
      SELECT doc_id,
             string_split(
               text || CASE WHEN doc_id % 7 = 0
                            THEN ' COMMON tail phrase for the dup report x y'
                            ELSE '' END, ' ') AS ws
      FROM documents
    ),
    gr AS (
      SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS g
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 4)) AS i) t
    ),
    cnt AS (
      SELECT g, count(*) AS n_docs FROM gr GROUP BY g HAVING count(*) >= 2
    ),
    rk AS (
      SELECT g, n_docs,
             row_number() OVER (ORDER BY n_docs DESC, g) AS rank
      FROM cnt
    )
    SELECT rank::BIGINT AS rank, g AS ngram, n_docs::BIGINT AS n_docs
    FROM rk WHERE rank <= 20
    """,
)
def q_top_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide most-duplicated 5-grams
    (operators.dedup.top_duplicated_ngrams) — the memorization-risk
    report an operator turns into strip rules.  Document frequency
    (per-doc distinct), global top-20 through the bounded two-level
    top-k (no single-reducer ORDER BY over the n-gram table), ties
    broken by n-gram text.  A 9-word tail planted on every 7th doc
    must surface as the five dominant entries."""
    from extractor.operators.dedup import top_duplicated_ngrams

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" COMMON tail phrase for the dup report x y"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return top_duplicated_ngrams(docs, n=5, k=20, min_docs=2)

@register(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    cand AS (
      SELECT a, b FROM pairs GROUP BY a, b HAVING min(est) >= 0.5
    ), sym AS (
      SELECT a AS src, b AS dst FROM cand
      UNION
      SELECT b AS src, a AS dst FROM cand
    ), reach(node, lbl) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    ), cc AS (
      SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    ), m AS (
      SELECT cc.cluster_id, cc.doc_id, length(c.text)::BIGINT AS score
      FROM cc JOIN corpus c ON c.doc_id = cc.doc_id
    )
    SELECT cluster_id, doc_id AS keep_doc_id, score AS keep_score, n_members
    FROM (
      SELECT cluster_id, doc_id, score,
             count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members,
             row_number() OVER (
               PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC
             ) AS rn
      FROM m
    ) t WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (operators.dedup.
    cluster_keep_best): LSH candidate pairs → connected components →
    keep each cluster's LONGEST member (ties → smallest id), the
    RefinedWeb keep rule — min-id canonicals (corpus_select_fuzzy)
    can keep a truncated capture and discard the full one.  The
    cluster table is edge-sized; scores join on doc_id as (id, long)
    pairs so corpus text never shuffles; per-cluster selection is one
    max(struct) aggregate, no window.  Oracle: recursive-CTE closure
    + a window formulation of the same argmax."""
    from extractor.operators.dedup import (
        cluster_keep_best,
        connected_components,
        lsh_pairs,
    )

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    edges = lsh_pairs(corpus.select("doc_id", "text"), k=16, bands=4, threshold=0.5)
    cc = connected_components(edges)
    return cluster_keep_best(cc, corpus.select("doc_id", "text"))

def _band_cand_sql(bands: int) -> str:
    """Banded-candidate CTE pair for a 16-hash signature split into
    ``bands`` bands (oracle twin of bands_from_sig + pairs_from_bands)."""
    r = 16 // bands
    return f"""banded{bands} AS (
      SELECT doc_id, sig, b.band_idx,
             md5(array_to_string(list_transform(
               sig[b.band_idx*{r} + 1 : b.band_idx*{r} + {r}],
               x -> x::VARCHAR), ',')) AS band_key
      FROM msig, LATERAL (SELECT unnest(generate_series(0, {bands - 1})) AS band_idx) b
    ), cand{bands} AS (
      SELECT l.doc_id AS a, r2.doc_id AS b,
             min(list_sum(list_transform(generate_series(1, 16),
               i -> CASE WHEN l.sig[i] = r2.sig[i] THEN 1 ELSE 0 END)) / 16.0) AS est
      FROM banded{bands} l JOIN banded{bands} r2
        ON l.band_idx = r2.band_idx AND l.band_key = r2.band_key
           AND l.doc_id < r2.doc_id
      GROUP BY l.doc_id, r2.doc_id
    )"""

def _recall_row_sql(method: str, cand: str) -> str:
    return f"""
      SELECT '{method}' AS method,
             (SELECT count(*) FROM truth)::BIGINT AS n_truth,
             (SELECT count(*) FROM {cand})::BIGINT AS n_cand,
             (SELECT count(*) FROM truth t
              JOIN {cand} c ON t.a = c.a AND t.b = c.b)::BIGINT AS hits"""

@register(
    "dedup_lsh_recall",
    f"""
    WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
    sub AS (SELECT doc_id, text FROM corpus WHERE doc_id % 2 = 0),
    wh AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM sub
    ), shi AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647)) AS sh
      FROM wh
    ), truth AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM shi a JOIN shi b ON a.doc_id < b.doc_id
      WHERE length(list_intersect(a.sh, b.sh))::DOUBLE /
            length(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), msig AS (
      SELECT doc_id,
             list_transform(generate_series(0, 15), j ->
               list_min(list_transform(sh, h ->
                 ((((j*2 + 1) * 40503) % 2147483647) * h +
                  ((j*94261 + 73856093) % 2147483647)) % 2147483647))) AS sig
      FROM shi
    ),
    {_band_cand_sql(2)},
    {_band_cand_sql(4)},
    {_band_cand_sql(8)},
    op4 AS (SELECT a, b FROM cand4 WHERE est >= 0.5),
    raw AS (
      {_recall_row_sql('cand_b2', 'cand2')}
      UNION ALL {_recall_row_sql('cand_b4', 'cand4')}
      UNION ALL {_recall_row_sql('cand_b8', 'cand8')}
      UNION ALL {_recall_row_sql('op_b4_t50', 'op4')}
    )
    SELECT method, n_truth, n_cand, hits,
           (hits * 10000 // greatest(n_truth, 1))::BIGINT AS recall_x10000,
           (hits * 10000 // greatest(n_cand, 1))::BIGINT AS precision_x10000
    FROM raw
    """,
)
def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured candidate recall/precision of MinHash-LSH vs EXACT
    3-gram Jaccard ground truth — the dedup twin of q_ann_recall: the
    self-evaluation an operator team runs before picking (bands, rows)
    for a crawl-scale dedup pass, expressed as a registry query so the
    metric itself is oracle-checked.

    Band sweep over ONE signature table: 16 minhashes are computed
    once (the corpus-text scan), localCheckpoint'ed, then banded three
    ways — (2×8) strict, (4×4) the deployed default, (8×2) permissive
    — via bands_from_sig/pairs_from_bands; banding is an explode over
    the cached array, so the sweep costs one text pass + three
    band-key joins.  The fourth row is the DEPLOYED operator config
    (bands=4 AND est ≥ 0.5), separating banding recall from the
    signature-estimate filter's contribution.

    The S-curve the sweep traces (p_band-match = 1−(1−j^r)^b, measured
    at sf0.01 against 59 truth pairs): strict (2×8) bands need j^8
    agreement and drop 12% of genuine ≥0.5-Jaccard pairs (recall
    0.881, precision 1.0); the deployed (4×4) catches every truth
    pair at full candidate precision; permissive (8×2) keeps recall
    1.0 but admits false candidates (precision 0.983) — and the gap
    widens with corpus size as 2-row band keys collide.  Ground truth is EXACT Jaccard ≥ 0.5 on a
    PINNED SUB-CORPUS (doc_id % 2 = 0; the planted near-dup pairs have
    even ids on both sides, so truth is never vacuous): the exact leg
    is the inverted-index join (ngram_jaccard_pairs, no cap — only
    pairs sharing a shingle materialize), and the pin bounds it the
    same way ann_recall's exact leg is bounded — at 100× the corpus
    the measurement runs on the same fixed sample while the operators
    it grades run on everything."""
    from extractor.operators.dedup import (
        bands_from_sig,
        minhash_signatures,
        ngram_jaccard_pairs,
        pairs_from_bands,
    )

    corpus = _inject_dups(_docs(spark, sf_dir), marker=_NEARDUP_MARKER)
    sub = corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    truth = (
        ngram_jaccard_pairs(sub, block_cols=[], threshold=0.5)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    sig = minhash_signatures(
        sub, id_col="doc_id", text_col="text", k=16
    ).localCheckpoint(eager=True)

    def row(cand: DataFrame, method: str) -> DataFrame:
        n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
        hits = truth.join(cand, ["a", "b"]).agg(F.count(F.lit(1)).alias("hits"))
        return n_truth.crossJoin(n_cand).crossJoin(hits).select(
            F.lit(method).alias("method"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_cand").cast("long").alias("n_cand"),
            F.col("hits").cast("long").alias("hits"),
            F.expr("hits * 10000 div greatest(n_truth, 1)").alias("recall_x10000"),
            F.expr("hits * 10000 div greatest(n_cand, 1)").alias("precision_x10000"),
        )

    cands = {
        b: pairs_from_bands(bands_from_sig(sig, k=16, bands=b), k=16, threshold=0.0)
        for b in (2, 4, 8)
    }
    out = row(cands[2].select("a", "b"), "cand_b2")
    out = out.unionByName(row(cands[4].select("a", "b"), "cand_b4"))
    out = out.unionByName(row(cands[8].select("a", "b"), "cand_b8"))
    op = cands[4].filter(F.col("est_jaccard") >= 0.5).select("a", "b")
    return out.unionByName(row(op, "op_b4_t50"))

@register(
    "dup_span_stats",
    """
    -- Lee et al. 2022 ExactSubstr signal at trigram grain: fraction
    -- of each doc's gram occurrences shared with >= 1 other doc;
    -- every 7th doc gets a boilerplate tail so the signal is planted
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' all rights reserved contact the site administrator for license terms'
                  ELSE text END AS text
      FROM documents
    ), wh AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS wh
      FROM corpus
    ), g AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647)) AS h
      FROM wh
    ), dup AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM g)
      GROUP BY h HAVING count(*) >= 2
    ), tot AS (
      SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
    ), dc AS (
      SELECT g.doc_id, count(*) AS n_dup
      FROM g JOIN dup ON dup.h = g.h GROUP BY g.doc_id
    )
    SELECT t.doc_id,
           t.n_grams::BIGINT AS n_grams,
           coalesce(dc.n_dup, 0)::BIGINT AS n_dup_grams,
           (coalesce(dc.n_dup, 0) * 10000 // t.n_grams)::BIGINT
             AS dup_coverage_x10000
    FROM tot t LEFT JOIN dc ON dc.doc_id = t.doc_id
    """,
)
def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring coverage per document (operators.dedup.
    duplicated_span_stats) — the ExactSubstr measurement of Lee et
    al. 2022: document-level dedup keeps two different pages that
    share a license block or navigation chrome; this operator measures
    how much of each document is such cross-document repeated text,
    the signal a span-removal pass (or a boilerplate-strip audit)
    acts on.

    A deterministic boilerplate tail is planted on every 7th document
    (both engines), so ~14% of docs carry a known duplicated span on
    top of whatever the synthetic corpus shares organically.  Scale
    analysis in the operator docstring: only (long, long) gram pairs
    shuffle, the df aggregate is bounded by the distinct projection,
    and the dup join is h-equi, never a self-join."""
    from extractor.operators.dedup import duplicated_span_stats

    corpus = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    " all rights reserved contact the site administrator for license terms"
                ),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return duplicated_span_stats(corpus).select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_dup_grams",
        "dup_coverage_x10000",
    )

@register(
    "dup_span_strip",
    """
    -- ExactSubstr surgery: remove every word covered by a trigram
    -- with document frequency >= 2; same planted boiler tail as
    -- dup_span_stats, so the strip is exercised on a known span
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' all rights reserved contact the site administrator for license terms'
                  ELSE text END AS text
      FROM documents
    ), base AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             list_transform(string_split(text, ' '),
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647)
               AS wh
      FROM corpus
    ), g AS (
      SELECT doc_id, i AS pos, length(ws) AS nw,
             (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
              coalesce(wh[i+3], 0)) % 2147483647 AS h
      FROM base, LATERAL (
        SELECT unnest(generate_series(0, greatest(length(wh) - 3, 0))) AS i
      ) t
    ), dup AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM g)
      GROUP BY h HAVING count(*) >= 2
    ), cov AS (
      SELECT DISTINCT g.doc_id, p.wpos
      FROM g JOIN dup USING (h), LATERAL (
        SELECT unnest(generate_series(g.pos, least(g.pos + 2, g.nw - 1)))
          AS wpos
      ) p
    ), words AS (
      SELECT doc_id, i - 1 AS wpos, ws[i] AS w
      FROM base, LATERAL (
        SELECT unnest(generate_series(1, length(ws))) AS i
      ) t
    ), reb AS (
      SELECT w.doc_id,
             string_agg(w.w, ' ' ORDER BY w.wpos) AS clean_text,
             count(*) AS n_kept
      FROM words w LEFT JOIN cov c
        ON c.doc_id = w.doc_id AND c.wpos = w.wpos
      WHERE c.wpos IS NULL
      GROUP BY w.doc_id
    )
    SELECT b.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           length(b.ws)::BIGINT AS n_words,
           coalesce(r.n_kept, 0)::BIGINT AS n_kept,
           (length(b.ws) - coalesce(r.n_kept, 0))::BIGINT AS n_removed
    FROM base b LEFT JOIN reb r USING (doc_id)
    """,
)
def q_dup_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span REMOVAL (operators.dedup.
    strip_duplicated_spans) — the surgery half of the ExactSubstr
    signal dup_span_stats measures: words covered by any trigram
    shared with another document are cut and the document is rebuilt
    from the survivors in original order (original bytes; fully-
    boilerplate docs survive as '').  Same planted tail as
    dup_span_stats, so the strip acts on a known span plus whatever
    the synthetic corpus shares organically.  The oracle re-derives
    the whole chain — gram positions, df cut, ±2 coverage expansion,
    anti-join rebuild — in SQL; any off-by-one in coverage clamping
    or reassembly order flips the text bytes."""
    from extractor.operators.dedup import strip_duplicated_spans

    corpus = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    " all rights reserved contact the site administrator for license terms"
                ),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return strip_duplicated_spans(corpus)

@register(
    "bloom_gate",
    """
    -- Bloom pre-gate arithmetic mirrored end-to-end: history = even
    -- docs' content digests, batch = everyone; in_history is the
    -- EXACT membership verdict so false positives are measurable
    -- directly from the result (maybe_seen AND NOT in_history);
    -- false negatives (in_history AND NOT maybe_seen) must be zero
    WITH hist AS (
      SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 2 = 0
    ), hp AS (
      SELECT ('0x' || substr(md5(digest || ':' || j), 1, 15))::BIGINT
               % 262144 AS pos
      FROM hist, LATERAL (SELECT unnest(generate_series(0, 4)) AS j) t
    ), words AS (
      SELECT (pos // 32)::INT AS word_idx,
             bit_or(1::BIGINT << (pos % 32)::INT) AS word
      FROM hp GROUP BY 1
    ), batch AS (
      SELECT doc_id, md5(text) AS digest FROM documents
    ), bp AS (
      SELECT digest,
             ('0x' || substr(md5(digest || ':' || j), 1, 15))::BIGINT
               % 262144 AS pos
      FROM (SELECT DISTINCT digest FROM batch),
           LATERAL (SELECT unnest(generate_series(0, 4)) AS j) t
    ), verdict AS (
      SELECT digest,
             min((coalesce(w.word, 0) & (1::BIGINT << (pos % 32)::INT)) <> 0)
               AS maybe_seen
      FROM bp LEFT JOIN words w ON w.word_idx = (pos // 32)::INT
      GROUP BY digest
    )
    SELECT b.doc_id, b.digest, v.maybe_seen,
           (b.digest IN (SELECT digest FROM hist)) AS in_history
    FROM batch b JOIN verdict v USING (digest)
    """,
)
def q_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-gate (operators.sketch): the even
    docs' content digests build the words table in one pass
    (explode → bit_or aggregate), then the WHOLE corpus probes it —
    maybe_seen=false rows are definitively new and would skip the
    exact digest-index join entirely; maybe_seen=true rows proceed to
    the exact check.  in_history carries the exact verdict alongside,
    so the driver row pins both the bit arithmetic (md5-derived
    positions, 32-bit packing, all-k-bits test) and the no-false-
    negative contract: any in_history row with maybe_seen=false would
    hash-mismatch the oracle."""
    from extractor.operators.sketch import bloom_build, bloom_probe

    docs = _docs(spark, sf_dir)
    batch = docs.select("doc_id", F.md5(F.col("text")).alias("digest"))
    hist = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5(F.col("text")).alias("digest"))
        .distinct()
    )
    words = bloom_build(hist)
    probed = bloom_probe(batch, words)
    return probed.join(
        hist.withColumn("in_history", F.lit(True)), "digest", "left"
    ).select(
        "doc_id",
        "digest",
        "maybe_seen",
        F.coalesce(F.col("in_history"), F.lit(False)).alias("in_history"),
    )

@register(
    "cdc_dedup",
    """
    -- content-defined chunking: boundaries where the word hash is
    -- = 0 mod 8 (the synthetic corpus's 31-word vocabulary has three
    -- boundary words at mod 8 and none at the operator's default 32
    -- - a degenerate one-chunk-per-doc fixture would test nothing),
    -- so the %9 copies with one word INSERTED at the front realign
    -- with their originals from the first boundary on
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, 'insertedword ' || text
      FROM documents WHERE doc_id % 9 = 0
    ), base AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             list_transform(string_split(text, ' '),
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647)
               AS wh
      FROM corpus
    ), st AS (
      SELECT doc_id, ws,
             list_prepend(0, list_filter(
               generate_series(1, length(ws) - 1),
               i -> wh[i + 1] % 8 = 0)) AS starts
      FROM base
    ), ch AS (
      SELECT doc_id, j - 1 AS chunk_idx, starts[j] AS s,
             coalesce(starts[j + 1], length(ws)) AS e,
             array_to_string(
               ws[starts[j] + 1 : coalesce(starts[j + 1], length(ws))],
               ' ') AS txt
      FROM st, LATERAL (
        SELECT unnest(generate_series(1, length(starts))) AS j
      ) t
    ), rows_ AS (
      SELECT doc_id, chunk_idx, s AS start_word, (e - s) AS n_words,
             md5(txt) AS chunk_md5
      FROM ch
    ), dup AS (
      SELECT chunk_md5
      FROM (SELECT DISTINCT doc_id, chunk_md5 FROM rows_)
      GROUP BY chunk_md5 HAVING count(*) >= 2
    )
    SELECT r.doc_id, r.chunk_idx::INT AS chunk_idx,
           r.start_word::INT AS start_word, r.n_words::INT AS n_words,
           r.chunk_md5,
           (r.chunk_md5 IN (SELECT chunk_md5 FROM dup)) AS shared
    FROM rows_ r
    """,
)
def q_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking with cross-document sharing
    (operators.chunking.cdc_shared_chunks): the shift-resistant
    chunk-grain dedup fixed-size chunking cannot do — every 9th doc
    gets a copy with ONE word inserted at the front, and because
    boundaries are content-anchored (word hash ≡ 0 mod avg_words) the
    copy's chunks realign with the original from the first boundary
    on, surfacing as shared=true rows.  Boundary detection, chunk
    assembly and digesting are all array expressions in one
    projection (zero Exchange, plan-tested via the tier's HOF
    conventions); only (doc, idx, digest) rows shuffle for the df
    cut.  The oracle replays the identical boundary arithmetic in
    SQL."""
    from extractor.operators.chunking import cdc_shared_chunks

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionAll(
        docs.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.lit("insertedword "), F.col("text")).alias("text"),
        )
    )
    return cdc_shared_chunks(corpus, avg_words=8)

@register(
    "cdc_incremental",
    """
    -- batched chunk-grain dedup == one-shot first-occurrence
    -- classification with the batch boundary drawn in; batch 2
    -- re-captures everything with every 5th doc edited at the front,
    -- so its 'new' rows are only the head chunks CDC could not
    -- realign (plus first-seen odd docs)
    WITH corpus AS (
      SELECT 1 AS batch, doc_id, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 2, doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'insertedword ' || text
                  ELSE text END
      FROM documents
    ), base AS (
      SELECT batch, doc_id, string_split(text, ' ') AS ws,
             list_transform(string_split(text, ' '),
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647)
               AS wh
      FROM corpus
    ), st AS (
      SELECT batch, doc_id, ws,
             list_prepend(0, list_filter(
               generate_series(1, length(ws) - 1),
               i -> wh[i + 1] % 8 = 0)) AS starts
      FROM base
    ), ch AS (
      SELECT batch, doc_id, j - 1 AS chunk_idx, starts[j] AS s,
             coalesce(starts[j + 1], length(ws)) AS e,
             array_to_string(
               ws[starts[j] + 1 : coalesce(starts[j + 1], length(ws))],
               ' ') AS txt
      FROM st, LATERAL (
        SELECT unnest(generate_series(1, length(starts))) AS j
      ) t
    ), rows_ AS (
      SELECT batch, doc_id, chunk_idx, s AS start_word,
             (e - s) AS n_words, md5(txt) AS chunk_md5,
             row(doc_id, chunk_idx) AS key
      FROM ch
    ), mins AS (
      SELECT chunk_md5,
             min(CASE WHEN batch = 1 THEN key END) AS k1,
             min(CASE WHEN batch = 2 THEN key END) AS k2
      FROM rows_ GROUP BY chunk_md5
    )
    SELECT r.batch, r.doc_id, r.chunk_idx::INT AS chunk_idx,
           r.start_word::INT AS start_word, r.n_words::INT AS n_words,
           r.chunk_md5,
           CASE
             WHEN r.batch = 2 AND m.k1 IS NOT NULL THEN 'dup_of_history'
             WHEN r.batch = 1 AND r.key = m.k1 THEN 'new'
             WHEN r.batch = 2 AND r.key = m.k2 THEN 'new'
             ELSE 'dup_in_batch'
           END AS status
    FROM rows_ r JOIN mins m USING (chunk_md5)
    """,
)
def q_cdc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental chunk-grain dedup
    (operators.chunking.incremental_cdc_dedup): the recrawl-delta
    store — batch 1 (even docs) commits its chunk digests; batch 2
    re-captures the whole corpus with every 5th doc edited at the
    front, and because CDC boundaries realign after the edit, batch
    2 stores only the head chunks the edit actually changed plus
    first-seen odd docs.  History text is never re-read; per-crawl
    cost is O(batch chunks).  The oracle is the one-shot
    first-occurrence classification with the batch boundary drawn in
    — the same driver-checked invariant as the exact and LSH
    incremental indexes, now at chunk grain."""
    import tempfile

    from extractor.operators.chunking import incremental_cdc_dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("insertedword "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    idx = tempfile.mkdtemp(prefix="cdc_inc_") + "/index"
    r1 = incremental_cdc_dedup(b1, idx, avg_words=8).withColumn(
        "batch", F.lit(1)
    )
    r2 = incremental_cdc_dedup(b2, idx, avg_words=8).withColumn(
        "batch", F.lit(2)
    )
    return r1.unionAll(r2).select(
        "batch", "doc_id", "chunk_idx", "start_word", "n_words",
        "chunk_md5", "status",
    )

@register(
    "winnow_pairs",
    f"""
    -- local-overlap candidate pairs: every 6th doc gets a companion
    -- carrying a 21-word midsection of it between unique padding —
    -- whole-document similarity is low, but the shared run is >> w+k-1
    -- so winnowing MUST surface the pair
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             'zpada' || doc_id::VARCHAR || ' zpadb zpadc ' ||
             array_to_string(list_slice(string_split(text, ' '), 5, 25), ' ')
             || ' zpadx zpady' || doc_id::VARCHAR
      FROM documents WHERE doc_id % 6 = 0
    ), wh AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM corpus
    ), sh AS (
      SELECT doc_id,
             list_transform(generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647) AS sh
      FROM wh
    ), fp AS (
      SELECT doc_id,
             list_distinct(
               list_transform(generate_series(0, greatest(length(sh) - 4, 0)),
                 i -> list_min(sh[i+1:i+4]))) AS fps
      FROM sh
    ), fpr AS (
      SELECT doc_id, unnest(fps) AS f FROM fp
    ), keep AS (
      SELECT f FROM fpr GROUP BY f HAVING count(*) <= 100
    ), idx AS (
      SELECT fpr.doc_id, fpr.f FROM fpr JOIN keep USING (f)
    )
    SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS n_shared
    FROM idx a JOIN idx b ON a.f = b.f AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing candidate pairs (operators.dedup.winnowing_pairs) —
    LOCAL overlap detection (Schleimer et al. 2003 / MOSS): the
    planted companions share only a 21-word midsection with their
    base docs (whole-document Jaccard far below any dedup bar), but
    a shared run ≥ w+k−1 = 6 words guarantees a shared fingerprint,
    so every planted pair must surface.  Inverted index on the
    fingerprint value with the max_df hot-value cap; only (id, long)
    rows shuffle.  The oracle replays selection, cap and pair count
    — the window-min slice arithmetic is on the hook at every
    position."""
    from extractor.operators.dedup import winnowing_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ws = F.split(F.col("text"), " ")
    corpus = docs.unionAll(
        docs.filter(F.col("doc_id") % 6 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(
                F.lit("zpada"), F.col("doc_id").cast("string"),
                F.lit(" zpadb zpadc "),
                F.array_join(F.slice(ws, 5, 21), " "),
                F.lit(" zpadx zpady"), F.col("doc_id").cast("string"),
            ).alias("text"),
        )
    )
    return winnowing_pairs(corpus)
