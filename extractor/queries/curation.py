"""Mixture/packing tier: source mixing, drift, host caps, sequence packing, shard manifests, chunking."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.operators.classifier import SURROGATE_SCORE_SQL
from extractor.queries._core import (  # noqa: F401
    register,
    _HEX64_SQL,
    _docs,
)
from extractor.queries.archive import _gopher_keep_ctes

@register(
    "doc_chunking",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), idx AS (
      SELECT doc_id, w,
             unnest(generate_series(0, (length(w) + 63) // 64 - 1)) AS chunk_id
      FROM toks
    )
    SELECT doc_id, chunk_id::INT AS chunk_id,
           length(w[chunk_id * 64 + 1 : (chunk_id + 1) * 64])::BIGINT
             AS chunk_tokens,
           md5(array_to_string(w[chunk_id * 64 + 1 : (chunk_id + 1) * 64], ' '))
             AS chunk_md5
    FROM idx
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking (64-token windows) — the prep stage
    for embedding/pretraining sequence packing.  posexplode over a
    per-doc chunk index; slices of a MATERIALIZED token array (never
    an inline re-evaluated expression — the HOF trap), map-only, the
    explode multiplies rows ~n_tokens/64 with no shuffle."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    n_chunks = F.floor((F.size("w") + 63) / 64).cast("int")
    idx = toks.select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(F.col("w"), F.col("chunk_id") * 64 + 1, 64)
    return idx.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )

@register(
    "source_mixture_sample",
    f"""
    -- temperature-style source mixing (alpha=0.5), fully integer-exact:
    -- w_s = floor(sqrt(n_s * 10^6)) (single correctly-rounded sqrt, no
    -- float accumulation), quotas = target * w_s // W, and per-doc
    -- acceptance by hash threshold h6 * n_s < quota_s * 10^6 — every
    -- cross-engine-compared value is an integer.
    WITH counts AS (
      SELECT source, count(*) AS n_s FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_s)::BIGINT AS n_total,
             sum(CAST(floor(sqrt(n_s * 1000000.0)) AS BIGINT))::BIGINT AS w_tot
      FROM counts
    ), quotas AS (
      SELECT c.source, c.n_s,
             ((t.n_total // 2) * CAST(floor(sqrt(c.n_s * 1000000.0)) AS BIGINT))
               // t.w_tot AS quota
      FROM counts c, tot t
    ), accepted AS (
      SELECT d.source, count(*) AS n_sampled
      FROM documents d JOIN quotas q ON q.source = d.source
      WHERE ({_HEX64_SQL.format(x="d.doc_id::VARCHAR || ':' || d.source || ':mix'")}
             % 1000000) * q.n_s < q.quota * 1000000
      GROUP BY d.source
    )
    SELECT q.source, q.n_s::BIGINT AS n_docs, q.quota::BIGINT AS quota,
           coalesce(a.n_sampled, 0)::BIGINT AS n_sampled
    FROM quotas q LEFT JOIN accepted a ON a.source = q.source
    """,
)
def q_source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture resampling (the data-mixing step of
    a training pipeline; temperature alpha=0.5 a la UniMax/multilingual
    sampling): per-source quotas from integer-exact sqrt weights, and
    hash-thresholded per-doc acceptance so the SAME docs are selected
    on any cluster, any partitioning, and in the oracle.

    Scale shape: the per-source stats table is tiny (sources ~10^3) →
    computed with one map-side-partial groupBy, then BROADCAST back
    onto the corpus; acceptance is a map-only expression; the only
    corpus-wide shuffle is the final per-source count."""
    from extractor.operators.dedup import hex64

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w_s = F.floor(F.sqrt(F.col("n_s") * F.lit(1_000_000.0))).cast("long")
    weighted = counts.withColumn("w_s", w_s)
    tot = weighted.agg(
        F.sum("n_s").alias("n_total"), F.sum("w_s").alias("w_tot")
    )
    quotas = weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.expr("((n_total div 2) * w_s) div w_tot").alias("quota"),
    )
    h6 = (
        hex64(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.col("source"),
                F.lit(":mix"),
            )
        )
        % 1_000_000
    )
    accepted = (
        docs.join(F.broadcast(quotas), "source")
        .filter(h6 * F.col("n_s") < F.col("quota") * 1_000_000)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return quotas.join(accepted, "source", "left").select(
        "source",
        F.col("n_s").alias("n_docs"),
        "quota",
        F.coalesce("n_sampled", F.lit(0).cast("long")).alias("n_sampled"),
    )

@register(
    "pack_sequences",
    f"""
    -- offset-based contiguous packing into 512-token bins, 8 hash
    -- shards packed independently (the shard is the parallel unit)
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             ({_HEX64_SQL.format(x='doc_id::VARCHAR')} % 8)::INT AS shard
      FROM documents
    ), off AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
      FROM toks
    )
    SELECT shard, (start_offset // 512)::BIGINT AS bin_id,
           count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
           min(doc_id)::BIGINT AS first_doc,
           (sum(n_tokens) * 10000 // 512)::BIGINT AS fill_bp
    FROM off GROUP BY shard, start_offset // 512
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing (operators.packing.pack_bins):
    documents binned into 512-token training contexts, hash-sharded
    ×8 so every shard packs in parallel (the window sum is PARTITIONED
    BY SHARD — no global ordering, no single reducer; n_shards tracks
    cluster parallelism at scale).  Per-bin fill statistics expose the
    boundary-straddle overshoot the offset-based scheme trades for
    scalability."""
    from extractor.operators.packing import pack_bins

    return pack_bins(
        _docs(spark, sf_dir).select("doc_id", "text"), budget=512, n_shards=8
    )

@register(
    "pack_sequences_tokens",
    f"""
    -- the same offset-based packing bound in TOKENIZER tokens via
    -- the deterministic bpe_estimate counter: per word
    -- 1 + (len-1) div 6, summed (long words cost more — the shape a
    -- real BPE budget has; a production deployment swaps the counter
    -- through the tokenizer seam without touching this plan)
    WITH toks AS (
      SELECT doc_id,
             (len(string_split(text, ' ')) + list_sum(list_transform(
                string_split(text, ' '),
                x -> (length(x) - 1) // 6)))::BIGINT AS n_tokens,
             ({_HEX64_SQL.format(x='doc_id::VARCHAR')} % 8)::INT AS shard
      FROM documents
    ), off AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
      FROM toks
    )
    SELECT shard, (start_offset // 512)::BIGINT AS bin_id,
           count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
           min(doc_id)::BIGINT AS first_doc,
           (sum(n_tokens) * 10000 // 512)::BIGINT AS fill_bp
    FROM off GROUP BY shard, start_offset // 512
    """,
)
def q_pack_sequences_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware sequence packing (r4 VERDICT item 4): the same
    shard-parallel offset packing as pack_sequences, with the budget
    bound in TOKENIZER tokens through the
    operators.tokenizer seam (``bpe_estimate`` — deterministic,
    oracle-expressible; production registers a pandas-UDF-backed real
    BPE in TOKEN_COUNTERS and nothing else changes).  Word counts
    under-budget long-word documents; a token-shaped counter is what
    keeps packed contexts from overflowing the model's real window."""
    from extractor.operators.packing import pack_bins

    return pack_bins(
        _docs(spark, sf_dir).select("doc_id", "text"),
        budget=512,
        n_shards=8,
        tokenizer="bpe_estimate",
    )


@register(
    "host_cap_sample",
    """
    -- RefinedWeb-style per-source cap: keep the 5 highest-quality
    -- docs per source, ties broken by doc_id (deterministic)
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), feat AS (
      SELECT doc_id, source,
             ((length(list_distinct(w)) * 10000 // length(w)) // 4 +
              least(list_sum(list_transform(w, x -> length(x))) * 100
                    // length(w), 1000) // 2)::BIGINT AS quality
      FROM t
    )
    SELECT source, rank, doc_id, quality FROM (
      SELECT source, doc_id, quality,
             row_number() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id ASC
             )::INT AS rank
      FROM feat
    ) WHERE rank <= 5
    """,
)
def q_host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host contribution cap (RefinedWeb §3.1 / C4's per-domain
    limits): keep at most K documents per source host, the K BEST by
    the corpus's own quality score — the anti-SEO-farm guard that
    stops one mega-host from dominating a training mixture.  The
    `source` column is the host grain of this corpus (the WET tier's
    url host at web scale).

    Scale shape: quality features are map-only expressions; the
    per-host cut is the bounded two-level grouped_topk — per-host
    rows first reduce inside 32 hash buckets, then once per host, so
    a 10^8-page host costs two partial aggregates, never a window
    over its full row set.  Ordering struct(-quality, doc_id) makes
    ties deterministic (the oracle's ORDER BY quality DESC, doc_id)."""
    from extractor.operators.textstats import quality_score
    from extractor.operators.topk import grouped_topk_exploded

    docs = _docs(spark, sf_dir)
    feats = quality_score(F.col("text"))
    scored = docs.select(
        "doc_id", "source", feats["quality"].cast("long").alias("quality")
    )
    ranked = grouped_topk_exploded(
        scored,
        ["source"],
        F.struct((-F.col("quality")).alias("negq"), F.col("doc_id").alias("doc_id")),
        k=5,
    )
    return ranked.select(
        "source",
        "rank",
        F.col("value.doc_id").alias("doc_id"),
        (-F.col("value.negq")).cast("long").alias("quality"),
    )

@register(
    "training_shards",
    """
    -- deterministic hash-shard export: shard + order depend only on
    -- doc ids; order_md5 pins the within-shard order byte-for-byte
    WITH d AS (
      SELECT doc_id,
             length(string_split(text, ' '))::BIGINT AS n_tokens,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS okey
      FROM documents
    )
    SELECT (okey % 8)::BIGINT AS shard,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           md5(string_agg(doc_id::VARCHAR, ',' ORDER BY okey, doc_id))
             AS order_md5
    FROM d GROUP BY okey % 8
    """,
)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard export plan (operators.packing.
    assign_shards): the "global shuffle" every training run needs,
    with NO global sort — shard membership and within-shard order are
    pure functions of the document id (a 60-bit md5 prefix), so the
    export is reproducible across runs, partitionings, and cluster
    sizes, and each shard writes independently via repartition(shard)
    + sortWithinPartitions.

    The registry row is the shard MANIFEST: doc/token counts plus an
    order_md5 digest of the shard's exact document order — the
    determinism claim made oracle-checkable (any drift in hashing,
    sharding, or ordering breaks the digest).  The md5-of-all-ids
    aggregate is the verification artifact, not the export path: a
    real export streams rows to shard files; per-shard manifests
    aggregate (count, sum, digest) with map-side partials."""
    from extractor.operators.packing import assign_shards

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sharded = assign_shards(docs, n_shards=8).select(
        "doc_id",
        "okey",
        "shard",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("okey"), F.col("doc_id")))
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                ",", F.transform(ordered, lambda s: s["doc_id"].cast("string"))
            )
        ).alias("order_md5"),
    ).select("shard", "n_docs", "n_tokens", "order_md5")

@register(
    "mixture_drift",
    """
    -- staggered corpus entry (doc enters at crawl doc_id % 4, stays)
    -- shifts source shares crawl over crawl; drift vs the previous
    -- crawl via the window-lag formulation, NULL at first appearance
    WITH caps AS (
      SELECT c.crawl AS crawl_id, d.source, d.n_chars AS w
      FROM documents d, LATERAL (
        SELECT unnest(generate_series(d.doc_id % 4, 3)) AS crawl
      ) c
    ), agg AS (
      SELECT crawl_id, source, sum(w) AS weight
      FROM caps GROUP BY 1, 2
    ), tot AS (
      SELECT crawl_id, sum(weight) AS tw FROM agg GROUP BY 1
    ), sh AS (
      SELECT a.crawl_id, a.source, a.weight::BIGINT AS weight,
             (a.weight * 10000 // t.tw)::BIGINT AS share_bp
      FROM agg a JOIN tot t USING (crawl_id)
    )
    SELECT crawl_id, source, weight, share_bp,
           lag(share_bp) OVER (PARTITION BY source ORDER BY crawl_id)
             AS prev_share_bp,
           share_bp - lag(share_bp)
             OVER (PARTITION BY source ORDER BY crawl_id) AS drift_bp
    FROM sh
    """,
)
def q_mixture_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture drift (operators.crawl.mixture_drift): the
    monitor over the shares source_mixture_sample enforces — per
    (crawl, source) weight share in basis points and its delta vs
    the previous crawl.  Staggered corpus entry (a doc enters at
    crawl doc_id % 4) makes every source's share shift each crawl;
    the engine computes drift with a bounded (crawl−1, source)
    equi-join, the oracle independently with a window lag — the two
    formulations must agree row-for-row, including the NULL
    first-appearance contract.  (The lag formulation is valid here
    because every source appears in every crawl; the equi-join form
    is also correct under gaps, where lag would reach back across a
    missing crawl — documented difference, not exercised.)"""
    from extractor.operators.crawl import mixture_drift

    caps = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(
            F.sequence((F.col("doc_id") % 4).cast("int"), F.lit(3))
        ).alias("crawl_id"),
    ).select(
        F.col("crawl_id").cast("long").alias("crawl_id"),
        "source",
        F.col("n_chars").alias("weight"),
    )
    return mixture_drift(caps, weight_col="weight")

@register(
    "mixture_plan",
    f"""
    -- token-budget mixture PLAN (the read before source_mixture_sample
    -- executes): per-source tokenizer-token mass, temperature-weighted
    -- (alpha=0.5) share of a half-corpus training budget, and the
    -- repeat factor epochs_x1000 -- >1000 means the source is
    -- undersized for its target share and gets repeated (the
    -- LLaMA-style data-recipe signal).  Integer-exact end to end.
    WITH toks AS (
      SELECT source,
             sum(len(string_split(text, ' ')) + list_sum(list_transform(
               string_split(text, ' '),
               x -> (length(x) - 1) // 6)))::BIGINT AS n_tok
      FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_tok)::BIGINT AS tok_total,
             sum(CAST(floor(sqrt(n_tok * 1000000.0)) AS BIGINT))::BIGINT
               AS w_tot
      FROM toks
    )
    SELECT t.source, t.n_tok,
           ((x.tok_total // 2)
             * CAST(floor(sqrt(t.n_tok * 1000000.0)) AS BIGINT))
             // x.w_tot AS want_tok,
           (((x.tok_total // 2)
             * CAST(floor(sqrt(t.n_tok * 1000000.0)) AS BIGINT))
             // x.w_tot) * 1000 // t.n_tok AS epochs_x1000
    FROM toks t, tot x
    """,
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning: per-source TOKENIZER-token mass
    (tokenizer seam, bpe_estimate — budgets bind in tokens, not docs),
    the temperature-weighted (alpha=0.5, the floor-sqrt trick from
    source_mixture_sample) share of a half-corpus training budget, and
    ``epochs_x1000`` — how many passes over the source its target
    share implies.  >1000 flags an undersized source that must repeat
    (the public LLaMA/Gopher data-recipe pattern: small high-quality
    sources run multiple epochs while the web crawl runs <1).  One
    reduced groupBy over (source) then one-row broadcast arithmetic —
    the plan costs one aggregate at any corpus size."""
    from extractor.operators.tokenizer import token_count_expr

    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(
            "source",
            token_count_expr(F.col("text"), "bpe_estimate").alias("t"),
        )
        .groupBy("source")
        .agg(F.sum("t").cast("long").alias("n_tok"))
    )
    w = F.floor(F.sqrt(F.col("n_tok") * 1_000_000.0)).cast("long")
    tot = counts.agg(
        F.sum("n_tok").cast("long").alias("tok_total"),
        F.sum(w).cast("long").alias("w_tot"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))  # one row
        .select(
            "source",
            "n_tok",
            ((F.expr("tok_total div 2") * w)).alias("scaled"),
            F.col("w_tot"),
        )
        .select(
            "source",
            "n_tok",
            F.expr("scaled div w_tot").alias("want_tok"),
            F.expr("(scaled div w_tot) * 1000 div n_tok").alias(
                "epochs_x1000"
            ),
        )
    )

@register(
    "e2e_curation_shards",
    f"""
    -- CAPSTONE end-to-end curation: crawl corpus (with a mirror-host
    -- duplicate planted on every 20th doc) -> Gopher rule gate ->
    -- learned-classifier gate (surrogate, >= 0.5) -> exact content
    -- dedup (min-url canonical per text md5) -> salted hash
    -- train/validation/test split -> per-split token-weighted shard
    -- manifest with an order digest.  One row per (split, shard);
    -- a regression in ANY stage flips a row.
    WITH corpus AS (
      SELECT 'https://crawl.test/doc/' || doc_id::VARCHAR AS url, text
      FROM documents
      UNION ALL
      SELECT 'https://mirror.test/doc/' || doc_id::VARCHAR AS url, text
      FROM documents WHERE doc_id % 20 = 0
    ), {{GOPHER_CTES}},
    scored AS (
      SELECT url, text FROM kept
      WHERE {{SCORE_SQL}} >= 0.5
    ), canon AS (
      SELECT min(url) AS url, min(text) AS text
      FROM scored GROUP BY md5(text)
    ), toks AS (
      SELECT url,
             (len(string_split(text, ' ')) + list_sum(list_transform(
                string_split(text, ' '),
                x -> (length(x) - 1) // 6)))::BIGINT AS n_tokens,
             {_HEX64_SQL.format(x="'split:' || url")} % 1000 AS bucket,
             {_HEX64_SQL.format(x="url")} AS okey
      FROM canon
    )
    SELECT CASE WHEN bucket < 980 THEN 'train'
                WHEN bucket < 995 THEN 'validation'
                ELSE 'test' END AS split,
           (okey % 4)::BIGINT AS shard,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           md5(string_agg(url, ',' ORDER BY okey, url)) AS order_md5
    FROM toks GROUP BY 1, 2
    """.format(
        GOPHER_CTES=_gopher_keep_ctes("corpus"),
        SCORE_SQL=SURROGATE_SCORE_SQL.format(t="text"),
    ),
)
def q_e2e_curation_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation — the "raw crawl to training
    splits" chain, every stage the engine's own operator: planted
    mirror-host duplicates → Gopher rule gate
    (textstats.gopher_rules) → learned-quality gate through the
    classifier seam (classifier.classifier_score_expr, surrogate
    ≥ 0.5 — a production fastText model swaps in without touching
    this plan) → exact content dedup (min-url canonical per text
    md5; the planted mirrors collapse here) → salted-hash
    train/validation/test split (980/15/5‰, pure function of the
    canonical url) → per-split shard manifest weighted in TOKENIZER
    tokens (tokenizer seam, bpe_estimate) with a deterministic order
    digest.  The DuckDB oracle re-derives the whole chain from
    `documents`, so a regression in ANY stage — rule predicate,
    classifier scores, dedup canonical rule, split hash, token
    counts, shard hash, order — flips a row.

    Scale: both gates are expression-only map stages; dedup is one
    md5 shuffle; split/shard/token columns are map-only; the
    manifest is one grouped aggregate over (split, shard).  No stage
    holds state on the driver, so the chain is the same plan at
    10^12 documents."""
    from extractor.operators.classifier import classifier_score_expr
    from extractor.operators.packing import assign_shards
    from extractor.operators.textstats import gopher_rules
    from extractor.operators.tokenizer import token_count_expr
    from extractor.queries._core import _GOPHER_STOPS

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    crawl = docs.select(
        F.concat(F.lit("https://crawl.test/doc/"), F.col("doc_id").cast("string"))
        .alias("url"),
        "text",
    )
    mirror = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.concat(F.lit("https://mirror.test/doc/"), F.col("doc_id").cast("string"))
        .alias("url"),
        "text",
    )
    corpus = crawl.unionByName(mirror)
    keep = gopher_rules(F.col("text"), stopwords=_GOPHER_STOPS)["keep"]
    scored = corpus.filter(keep).filter(
        classifier_score_expr(F.col("text")) >= 0.5
    )
    canon = scored.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("url").alias("url"), F.min("text").alias("text")
    )
    from extractor.operators.dedup import hex64

    bucket = hex64(F.concat(F.lit("split:"), F.col("url"))) % 1000
    toks = canon.select(
        "url",
        token_count_expr(F.col("text"), "bpe_estimate").alias("n_tokens"),
        F.when(bucket < 980, F.lit("train"))
        .when(bucket < 995, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sharded = assign_shards(toks, n_shards=4, id_col="url")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("okey"), F.col("url")))
    )
    return sharded.groupBy("split", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(",", F.transform(ordered, lambda s: s["url"]))
        ).alias("order_md5"),
    ).select("split", "shard", "n_docs", "n_tokens", "order_md5")

@register(
    "train_split_assign",
    f"""
    -- deterministic held-out split: hash-bucket each doc into 1000
    -- cells on a SALTED key (salt decorrelates the split from every
    -- other hex64 use: sampling, sharding, bloom) and carve
    -- train/validation/test at 980/995.  Integer-exact end to end.
    SELECT doc_id,
           {_HEX64_SQL.format(x="'split:' || doc_id::VARCHAR")} % 1000
             AS bucket,
           CASE
             WHEN {_HEX64_SQL.format(x="'split:' || doc_id::VARCHAR")} % 1000 < 980
               THEN 'train'
             WHEN {_HEX64_SQL.format(x="'split:' || doc_id::VARCHAR")} % 1000 < 995
               THEN 'validation'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def q_train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment by salted hash
    bucket (980/15/5 per mille) — the split must be a pure function of
    the document id so it survives recrawls, repartitions, and
    incremental appends (no rand(), no row_number over an arbitrary
    order).  Map-only expression; at 100 TB this is a free column on
    the scan.  Salt 'split:' keeps the split independent of the other
    hex64-derived decisions (host_cap_sample, training_shards,
    bloom_gate) so held-out membership never correlates with sampling
    survival."""
    from extractor.operators.dedup import hex64

    docs = _docs(spark, sf_dir)
    bucket = hex64(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 1000
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 980, F.lit("train"))
        .when(bucket < 995, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@register(
    "host_quality_rollup",
    # Per-source rollup of the classifier surrogate (integer basis
    # points, same construction as quality_classifier's clf_bp) into
    # the allow/review/block triage a curated-domains list is built
    # from.
    """
    WITH scored AS (
      SELECT source,
             (floor(list_sum(list_transform(string_split(text, ' '),
                x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2001 - 1000))
                / len(string_split(text, ' '))) + 1000)::BIGINT AS clf_bp,
             len(string_split(text, ' ')) AS n_w
      FROM documents
    ),
    agg AS (
      SELECT source,
             count(*)::BIGINT AS n_docs,
             (sum(clf_bp) // count(*))::BIGINT AS mean_bp,
             ((1000 * sum(CASE WHEN clf_bp >= 1000 THEN 1 ELSE 0 END))
                // count(*))::BIGINT AS keep_frac_pm,
             (sum(n_w) // count(*))::BIGINT AS mean_words
      FROM scored GROUP BY source
    )
    SELECT source, n_docs, mean_bp, keep_frac_pm, mean_words,
           CASE WHEN mean_bp >= 1010 AND keep_frac_pm >= 500 THEN 'allow'
                WHEN mean_bp < 990 OR keep_frac_pm < 250 THEN 'block'
                ELSE 'review' END AS verdict
    FROM agg
    """,
)
def q_host_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host quality triage — the artifact a production crawl
    actually ships: an allow/review/block list over HOSTS, built by
    rolling the per-document classifier score (the fastText-style
    seam, operators.classifier) up to the host grain.  Web pipelines
    apply host lists BEFORE fetch/extraction (one verdict gates
    millions of URLs), so the rollup is the cheap lever: mean score
    in integer basis points, fraction of docs clearing the keep cut
    (per-mille), and a thresholded verdict.  The synthetic corpus'
    ``source`` column plays the host role.  Shape: map-only scoring
    (no shuffle) + ONE reduced aggregate keyed by host — at 10^12
    docs the shuffle carries only (host, partial-sums), and hosts are
    bounded (~10^8 web-wide), so the result table itself stays
    broadcastable for the downstream gate join.  Integer-exact
    end-to-end: bp sums are longs, means are floor div — no float
    summation-order hazard."""
    from extractor.operators.classifier import classifier_score_expr
    from extractor.operators.tokenizer import ws_token_count

    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "source",
        F.round(classifier_score_expr(F.col("text")) * 2000)
        .cast("long")
        .alias("clf_bp"),
        ws_token_count(F.col("text")).alias("n_w"),
    )
    agg = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("clf_bp").alias("sum_bp"),
        F.sum(F.when(F.col("clf_bp") >= 1000, 1).otherwise(0)).alias("n_keep"),
        F.sum("n_w").alias("sum_w"),
    ).select(
        "source", "n_docs",
        F.expr("sum_bp div n_docs").alias("mean_bp"),
        F.expr("(1000 * n_keep) div n_docs").alias("keep_frac_pm"),
        F.expr("sum_w div n_docs").alias("mean_words"),
    )
    return agg.select(
        "source", "n_docs", "mean_bp", "keep_frac_pm", "mean_words",
        F.when(
            (F.col("mean_bp") >= 1010) & (F.col("keep_frac_pm") >= 500), "allow"
        ).when(
            (F.col("mean_bp") < 990) | (F.col("keep_frac_pm") < 250), "block"
        ).otherwise("review").alias("verdict"),
    )
