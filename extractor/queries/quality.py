"""Text-quality tier: LID, Gopher rules, surprisal, terciles/percentiles, vocab/collocation stats, corpus selection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.queries._core import (  # noqa: F401
    register,
    _GOPHER_STOPS,
    _GOPHER_STOPS_SQL,
    _HEX64_SQL,
    _LSH_CTES,
    _NEARDUP_MARKER,
    _docs,
    _inject_dups,
)

_STOPWORD_SQL = {
    "de": "['der','die','das','und','ist','mit','nicht']",
    "en": "['the','a','of','and','to','in','is','for']",
    "es": "['el','la','los','y','que','para','en']",
    "fr": "['le','les','des','et','une','est','dans']",
    "zh": "['de5','shi4','le5','zai4']",
}

_LANG_STRUCTS = ", ".join(
    f"{{'s': -length(list_filter(w, t -> list_contains({sw}, t))), 'l': '{lang}'}}"
    for lang, sw in sorted(_STOPWORD_SQL.items())
)

@register(
    "lang_id",
    f"""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           (list_sort([{_LANG_STRUCTS}]))[1].l AS pred_lang,
           lang AS stored_lang,
           (list_sort([{_LANG_STRUCTS}]))[1].l = lang AS match
    FROM toks
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID with deterministic argmax
    (sort (−score, lang) structs; tie → lang asc)."""
    from extractor.operators.textstats import predict_lang

    docs = _docs(spark, sf_dir)
    pred = predict_lang(F.col("text"))
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.col("lang").alias("stored_lang"),
        (pred == F.col("lang")).alias("match"),
    )

@register(
    "quality_score",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), feat AS (
      SELECT doc_id,
             length(w) AS n_tokens,
             length(list_distinct(w)) AS n_distinct,
             list_sum(list_transform(w, x -> length(x))) AS total_len
      FROM t
    )
    SELECT doc_id,
           n_tokens::BIGINT AS n_tokens,
           (n_distinct * 10000 // n_tokens)::BIGINT AS ttr_x10000,
           (total_len * 100 // n_tokens)::BIGINT AS mean_token_len_x100,
           ((n_distinct * 10000 // n_tokens) // 4 +
            least(total_len * 100 // n_tokens, 1000) // 2)::BIGINT AS quality
    FROM feat
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-scaled quality features (TTR, mean token length) +
    composite score (Gopher/C4-style filters, integer-exact)."""
    from extractor.operators.textstats import quality_score

    docs = _docs(spark, sf_dir)
    feats = quality_score(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["ttr_x10000"].alias("ttr_x10000"),
        feats["mean_token_len_x100"].alias("mean_token_len_x100"),
        feats["quality"].alias("quality"),
    )

@register(
    "token_count",
    r"""
    SELECT doc_id,
           length(string_split(text, ' '))::BIGINT AS ws_tokens,
           length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT
             AS re_tokens,
           length(text)::BIGINT AS n_chars,
           length(list_distinct(string_split(text, ' ')))::BIGINT AS distinct_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    from extractor.operators.textstats import token_stats

    docs = _docs(spark, sf_dir)
    s = token_stats(F.col("text"))
    return docs.select(
        "doc_id",
        s["ws_tokens"].cast("long").alias("ws_tokens"),
        s["re_tokens"].cast("long").alias("re_tokens"),
        s["n_chars"].cast("long").alias("n_chars"),
        s["distinct_tokens"].cast("long").alias("distinct_tokens"),
    )

@register(
    "stratified_sample",
    """
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk AS sample_rank FROM ranked WHERE rk <= 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample (20 docs/stratum):
    rank by md5(doc_id) inside each stratum — reproducible across runs
    and engines, unlike rand()-based sampleBy.

    Scale shape: per-stratum top-k as a BOUNDED two-level aggregate
    (operators.topk.grouped_topk) — the stratum-wide row_number window
    would funnel every row of a language through one reducer; the
    aggregate's state never exceeds max(|stratum|/B, B·k) rows.
    Identical output to the window formulation (the oracle still uses
    row_number — same ranking, independent plan)."""
    from extractor.operators.topk import grouped_topk_exploded

    docs = _docs(spark, sf_dir)
    sort_s = F.struct(
        F.md5(F.col("doc_id").cast("string")).alias("m"),
        F.col("doc_id").alias("doc_id"),
    )
    ranked = grouped_topk_exploded(
        docs.select("doc_id", "lang"), ["lang"], sort_s, k=20
    )
    return ranked.select(
        F.col("value.doc_id").alias("doc_id"),
        "lang",
        F.col("rank").cast("int").alias("sample_rank"),
    )

@register(
    "vocab_topk",
    """
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
      SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token
    ), ranked AS (
      SELECT lang, token, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
      FROM counts
    )
    SELECT lang, rk AS rank, token, n FROM ranked WHERE rk <= 10
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary top-10 (tokenizer-training prep):
    explode → count (map-side partial agg collapses the heavy tail
    before the shuffle) → per-lang top-k.

    Scale shape: the rank runs over per-(lang, token) COUNTS (already
    ~vocab-sized), and the per-lang truncation is the bounded
    two-level aggregate (operators.topk) — no per-lang global window,
    so a 10^9-token vocabulary never lands in one task.  Ordering
    (n desc, token asc) is encoded as struct(-n, token)."""
    from extractor.operators.topk import grouped_topk_exploded

    docs = _docs(spark, sf_dir)
    counts = (
        docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sort_s = F.struct(
        (-F.col("n")).alias("negn"),
        F.col("token").alias("token"),
        F.col("n").alias("n"),
    )
    ranked = grouped_topk_exploded(counts, ["lang"], sort_s, k=10)
    return ranked.select(
        "lang",
        F.col("rank").cast("int").alias("rank"),
        F.col("value.token").alias("token"),
        F.col("value.n").alias("n"),
    )

@register(
    "sketch_distinct_kmv",
    f"""
    WITH wh AS (
      SELECT lang,
             list_transform(string_split(text, ' '),
               t -> {_HEX64_SQL.format(x='t')} % 2147483647) AS wh
      FROM documents
    ), tok AS (  -- distinct trigram-shingle hashes per language
      SELECT DISTINCT lang,
             unnest(list_transform(
               generate_series(0, greatest(length(wh) - 3, 0)),
               i -> (wh[i+1] * 40503 + coalesce(wh[i+2], 0) * 94261 +
                     coalesce(wh[i+3], 0)) % 2147483647)) AS h
      FROM wh
    ), ranked AS (
      SELECT lang, h,
             row_number() OVER (PARTITION BY lang ORDER BY h) AS rk,
             count(*) OVER (PARTITION BY lang) AS exact_distinct
      FROM tok
    )
    SELECT lang, exact_distinct::BIGINT AS exact_distinct,
           CAST(floor((64 - 1) * 2147483647.0 / max(CASE WHEN rk = 64 THEN h END))
                AS BIGINT) AS kmv_estimate
    FROM ranked
    WHERE rk <= 64
    GROUP BY lang, exact_distinct
    """,
)
def q_sketch_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=64
    (Bar-Yossef et al. 2002): hash every trigram shingle to (0, 2^31),
    keep the k smallest distinct hashes per language; estimate =
    (k−1)·M / h_k (measured rel. error 2-10% at sf0.01, ~1/√k).

    Unlike HLL (`approx_count_distinct`), this sketch is a pure
    deterministic function of the data — bit-identical across engines,
    so the DuckDB oracle checks the ESTIMATE itself, not a tolerance.
    The exact count is emitted alongside so the error is visible.

    Scale shape: distinct-(lang, h) is one shuffle with map-side
    partial dedup; the k-minimum selection is then the BOUNDED
    two-level aggregate (operators.topk.grouped_topk) — per-(lang,
    bucket) k-smallest, merged to per-lang k-smallest — never a
    per-lang window, so no task ever holds a language's full distinct
    hash set.  The exact count rides the same aggregation (counts are
    additive), and the estimate is unchanged for any bucket count."""
    from extractor.operators.dedup import (
        MERSENNE31,
        shingle_hashes_from,
        word_hashes,
    )
    from extractor.operators.topk import grouped_topk

    k = 64
    docs = _docs(spark, sf_dir)
    tok = (
        docs.select("lang", word_hashes(F.col("text")).alias("wh"))
        .select(
            "lang",
            F.explode_outer(shingle_hashes_from(F.col("wh"))).alias("h"),
        )
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    mins = grouped_topk(tok, ["lang"], F.col("h"), k=k, with_count=True)
    return mins.select(
        "lang",
        F.col("n_rows").alias("exact_distinct"),
        F.floor(
            (k - 1)
            * float(MERSENNE31)
            / F.try_element_at(F.col("topk"), F.lit(k))
        )
        .cast("long")
        .alias("kmv_estimate"),
    )

@register(
    "corpus_select",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ), feat AS (
      SELECT doc_id, lang, text,
             (list_sort([{_LANG_STRUCTS}]))[1].l AS pred_lang,
             length(w) AS n_tokens,
             (length(list_distinct(w)) * 10000 // length(w)) // 4 +
             least(list_sum(list_transform(w, x -> length(x))) * 100
                   // length(w), 1000) // 2 AS quality
      FROM toks
    ), canon AS (
      SELECT md5(text) AS h, min(doc_id) AS canonical FROM feat GROUP BY 1
    )
    SELECT f.doc_id, f.pred_lang, f.n_tokens::BIGINT AS n_tokens,
           f.quality::BIGINT AS quality
    FROM feat f JOIN canon c ON md5(f.text) = c.h AND f.doc_id = c.canonical
    WHERE f.pred_lang = f.lang AND f.quality >= 1000 AND f.n_tokens >= 10
    """,
)
def q_corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus materialization: language-ID
    agreement filter + Gopher/C4-style quality threshold + exact-dedup
    keep-first canonicalization — the composition a real pretraining
    data pipeline runs after extraction.

    Scale: the feature stage is map-only codegen'd expressions; dedup
    is one shuffle on a 32-byte hash with map-side partial agg; the
    canonical semi-join joins on (hash, doc_id), never on text."""
    from extractor.operators.textstats import predict_lang, quality_score

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    feats = quality_score(F.col("text"))
    feat = docs.select(
        "doc_id",
        "lang",
        "text",
        predict_lang(F.col("text")).alias("pred_lang"),
        feats["n_tokens"].alias("n_tokens"),
        feats["quality"].alias("quality"),
    )
    canon = feat.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("canonical")
    )
    kept = feat.join(
        canon,
        (F.md5(feat["text"]) == canon["h"]) & (feat["doc_id"] == canon["canonical"]),
        "inner",
    )
    return kept.filter(
        (F.col("pred_lang") == F.col("lang"))
        & (F.col("quality") >= 1000)
        & (F.col("n_tokens") >= 10)
    ).select("doc_id", "pred_lang", "n_tokens", "quality")

@register(
    "repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, length(w) - 1),
               i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM toks WHERE length(w) >= 2
    ), counts AS (
      SELECT doc_id, bigram, count(*) AS n FROM bi GROUP BY doc_id, bigram
    ), agg AS (
      SELECT doc_id, max(n) AS top_n, sum(n) AS total_n FROM counts GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(a.total_n, 0)::BIGINT AS n_bigrams,
           coalesce(a.top_n, 0)::BIGINT AS top_bigram_n,
           coalesce((a.top_n * 10000) // a.total_n, 0)::BIGINT
             AS top_bigram_frac_x10000,
           ((length(list_distinct(t.w)) * 10000) // length(t.w))::BIGINT
             AS distinct_token_frac_x10000
    FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1):
    top-bigram mass fraction and distinct-token fraction — the filters
    that catch boilerplate/spam pages whose TTR alone looks fine.
    Integer-scaled (x10000) for cross-engine exactness.

    Scale shape: bigram counts are explode → groupBy(doc, bigram)
    with map-side partials (the heavy tail collapses before the
    shuffle), then a per-doc max/sum — keyed by doc_id, uniformly
    distributed, no per-doc window; the distinct-token fraction is a
    map-only expression."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    w = F.col("w")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat(
            F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
        ),
    )
    bi = toks.filter(F.size(w) >= 2).select(
        "doc_id", F.explode(bigrams).alias("bigram")
    )
    counts = bi.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("n"))
    agg = counts.groupBy("doc_id").agg(
        F.max("n").alias("top_n"), F.sum("n").alias("total_n")
    )
    return toks.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("total_n"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("top_n"), F.lit(0)).cast("long").alias("top_bigram_n"),
        F.coalesce(
            F.floor(F.col("top_n") * 10000 / F.col("total_n")), F.lit(0)
        ).cast("long").alias("top_bigram_frac_x10000"),
        F.floor(F.size(F.array_distinct(w)) * 10000 / F.size(w))
        .cast("long").alias("distinct_token_frac_x10000"),
    )

@register(
    "corpus_select_fuzzy",
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
    ), clusters AS (
      SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    ), with_lang AS (
      SELECT c.doc_id, c.text, d.lang
      FROM corpus c JOIN documents d
        ON (CASE WHEN c.doc_id >= 1000000 THEN c.doc_id - 1000000
                 ELSE c.doc_id END) = d.doc_id
    ), feat AS (
      SELECT w.doc_id, w.lang,
             coalesce(cl.cluster_id, w.doc_id) AS cluster_id,
             (list_sort([{_LANG_STRUCTS}]))[1].l AS pred_lang,
             length(x.w) AS n_tokens,
             (length(list_distinct(x.w)) * 10000 // length(x.w)) // 4 +
             least(list_sum(list_transform(x.w, t -> length(t))) * 100
                   // length(x.w), 1000) // 2 AS quality
      FROM with_lang w
      LEFT JOIN clusters cl ON cl.doc_id = w.doc_id,
      LATERAL (SELECT string_split(w.text, ' ') AS w) x
    )
    SELECT doc_id, cluster_id, pred_lang,
           n_tokens::BIGINT AS n_tokens, quality::BIGINT AS quality
    FROM feat
    WHERE doc_id = cluster_id AND pred_lang = lang
      AND quality >= 1000 AND n_tokens >= 10
    """,
)
def q_corpus_select_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL fuzzy-dedup corpus materialization: MinHash-LSH
    candidate pairs → connected-components cluster resolution → keep
    only cluster canonicals (min doc_id; non-clustered docs are their
    own canonical) → language-agreement + quality thresholds.  This is
    the composition a pretraining pipeline actually ships — exact
    dedup (corpus_select) misses near-duplicates, which at web scale
    are the majority of redundancy.

    Scale: LSH band join is the only corpus-sized shuffle; CC runs on
    the candidate EDGE list (orders of magnitude smaller); the
    canonical filter is a broadcast-size left join at realistic dup
    rates; feature filters are map-only codegen.  Oracle: recursive-
    CTE transitive closure + the same feature expressions."""
    from extractor.operators.dedup import connected_components, lsh_pairs
    from extractor.operators.textstats import predict_lang, quality_score

    corpus = _inject_dups(
        _docs(spark, sf_dir), marker=_NEARDUP_MARKER, extra_cols=("lang",)
    )
    edges = lsh_pairs(corpus.select("doc_id", "text"), k=16, bands=4, threshold=0.5)
    cc = connected_components(edges)  # (doc_id, cluster_id), clustered docs only
    feats = quality_score(F.col("text"))
    feat = corpus.join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        "lang",
        predict_lang(F.col("text")).alias("pred_lang"),
        feats["n_tokens"].alias("n_tokens"),
        feats["quality"].alias("quality"),
    )
    return feat.filter(
        (F.col("doc_id") == F.col("cluster_id"))
        & (F.col("pred_lang") == F.col("lang"))
        & (F.col("quality") >= 1000)
        & (F.col("n_tokens") >= 10)
    ).select("doc_id", "cluster_id", "pred_lang", "n_tokens", "quality")

@register(
    "domain_blocklist_stats",
    """
    WITH tagged AS (
      SELECT doc_id, n_chars,
             'site-' || (doc_id % 53)::VARCHAR || '.example' AS domain
      FROM documents
    )
    SELECT domain,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM tagged
    WHERE domain NOT IN ('site-3.example', 'site-17.example', 'site-29.example')
    GROUP BY domain
    """,
)
def q_domain_blocklist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist + per-domain corpus accounting (spam/abuse
    domain removal, the first filter of a web-crawl pipeline).

    Scale shape: the blocklist (thousands of domains in practice) is
    BROADCAST into a left_anti join — the corpus scans once, never
    shuffles for the filter; the per-domain aggregate is one shuffle
    with map-side partials.  (A NOT IN expression would also work for
    a literal list; the anti-join is the form that scales to a
    blocklist TABLE, so that is what the engine exercises.)"""
    docs = _docs(spark, sf_dir)
    tagged = docs.select(
        F.concat(
            F.lit("site-"), (F.col("doc_id") % 53).cast("string"), F.lit(".example")
        ).alias("domain"),
        "n_chars",
    )
    blocklist = docs.sparkSession.createDataFrame(
        [("site-3.example",), ("site-17.example",), ("site-29.example",)],
        ["domain"],
    )
    kept = tagged.join(F.broadcast(blocklist), "domain", "left_anti")
    return kept.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )

@register(
    "gopher_quality",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- bullet-spam variant: every word on its own '- ' line
      SELECT doc_id + 5000000, '- ' || replace(text, ' ', chr(10) || '- ')
      FROM documents WHERE doc_id % 13 = 0
      UNION ALL
      -- ellipsis/symbol-spam variant: '...' after every word
      SELECT doc_id + 6000000, replace(text, ' ', '... ') || '...'
      FROM documents WHERE doc_id % 17 = 0
    ), feats AS (
      SELECT doc_id,
             regexp_split_to_array(text, '[ \n]+') AS w,
             string_split(text, chr(10)) AS lines
      FROM corpus
    ), m AS (
      SELECT doc_id, len(w) AS n_words, greatest(len(w), 1) AS n_safe,
             list_sum(list_transform(w, t -> length(t))) AS total_len,
             len(list_filter(w, t -> contains(t, '#') OR contains(t, '...')))
               AS n_symbol,
             len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
             greatest(len(lines), 1) AS n_lines,
             len(list_filter(lines, l -> starts_with(l, '- ')
                 OR starts_with(l, '* ') OR starts_with(l, '•'))) AS n_bullet,
             len(list_filter(lines, l -> ends_with(l, '...'))) AS n_ellipsis,
             len(list_intersect(w, {_GOPHER_STOPS_SQL})) AS stop_hits
      FROM feats
    )
    SELECT doc_id, n_words::BIGINT AS n_words,
           (total_len * 100 // n_safe)::BIGINT AS mean_word_len_x100,
           (n_symbol * 10000 // n_safe)::BIGINT AS symbol_ratio_bp,
           (n_alpha * 10000 // n_safe)::BIGINT AS alpha_ratio_bp,
           (n_bullet * 10000 // n_lines)::BIGINT AS bullet_lines_bp,
           (n_ellipsis * 10000 // n_lines)::BIGINT AS ellipsis_lines_bp,
           stop_hits::BIGINT AS stopword_hits,
           (n_words BETWEEN 50 AND 100000
            AND total_len * 100 // n_safe BETWEEN 300 AND 1000
            AND n_symbol * 10000 // n_safe <= 1000
            AND n_alpha * 10000 // n_safe >= 8000
            AND n_bullet * 10000 // n_lines < 9000
            AND n_ellipsis * 10000 // n_lines <= 3000
            AND stop_hits >= 2) AS keep
    FROM m
    """,
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher pre-filter rules (Rae et al. 2021 A1.1) over the corpus
    plus injected rule-violating variants (bullet-spam and
    ellipsis-spam rewrites of every 13th/17th doc) so each flag
    demonstrably fires; natural docs discriminate on word count /
    stopwords.  Expression-only map stage — at 100 TB this runs
    inside the scan's codegen with zero shuffle (see
    operators.textstats.gopher_rules)."""
    from extractor.operators.textstats import gopher_rules

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bullets = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(
            F.lit("- "), F.regexp_replace(F.col("text"), " ", "\n- ")
        ).alias("text"),
    )
    ellipses = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 6_000_000).alias("doc_id"),
        F.concat(
            F.regexp_replace(F.col("text"), " ", "... "), F.lit("...")
        ).alias("text"),
    )
    corpus = docs.unionAll(bullets).unionAll(ellipses)
    r = gopher_rules(F.col("text"), stopwords=_GOPHER_STOPS)
    return corpus.select("doc_id", *[r[k].alias(k) for k in r])

@register(
    "unigram_surprisal",
    """
    -- CCNet-style LM-quality proxy, integer-exact: per-token
    -- surprisal = N_total // count(token), per-doc floored mean
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), cnt AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t
    ), tot AS (
      SELECT sum(c)::BIGINT AS n FROM cnt
    ), per_doc AS (
      SELECT toks.doc_id, count(*) AS n_words,
             sum(tot.n // cnt.c) AS surprisal_sum
      FROM toks JOIN cnt ON cnt.t = toks.t, tot
      GROUP BY toks.doc_id
    )
    SELECT doc_id, n_words::BIGINT AS n_words,
           surprisal_sum::BIGINT AS surprisal_sum,
           (surprisal_sum // n_words)::BIGINT AS mean_surprisal
    FROM per_doc
    """,
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram fluency scoring (operators.textstats.unigram_surprisal)
    — the CCNet perplexity-filter engine shape with an integer-exact
    inverse-frequency surrogate for LM logprobs: one corpus-wide
    token-count shuffle, a one-row broadcast total, an equi-join of
    exploded tokens to counts, per-doc sum.  Rare-vocabulary documents
    surface with high mean_surprisal; threshold = the quality cut."""
    from extractor.operators.textstats import unigram_surprisal

    return unigram_surprisal(_docs(spark, sf_dir).select("doc_id", "text"))

# Power-of-2 sequence-length buckets, identical CASE text in both
# engines (no float log2 — boundary values stay exact).
_SEQ_LEN_BUCKET_SQL = "CASE " + " ".join(
    f"WHEN n_tokens < {2 ** (i + 1)} THEN {2 ** i}" for i in range(13)
) + " ELSE 8192 END"

@register(
    "seq_len_histogram",
    f"""
    -- per-language sequence-length histogram in power-of-2 buckets:
    -- the shape packing/curriculum planning reads before choosing a
    -- context budget
    WITH lens AS (
      SELECT lang, len(string_split(text, ' '))::INT AS n_tokens
      FROM documents
    )
    SELECT lang, ({_SEQ_LEN_BUCKET_SQL})::INT AS bucket_lo,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens_sum
    FROM lens GROUP BY lang, bucket_lo
    """,
)
def q_seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution per language in power-of-2
    buckets — what a packing/curriculum planner inspects before
    fixing a context budget (pairs with pack_sequences: fill ratio at
    budget B follows directly from this histogram).  Expression-only
    map + one grouped aggregate; the bucket boundaries are an integer
    CASE chain, so Spark and the oracle agree exactly (float log2
    would disagree at the boundaries)."""
    lens = _docs(spark, sf_dir).select(
        "lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return (
        lens.select("lang", F.expr(_SEQ_LEN_BUCKET_SQL).cast("int").alias("bucket_lo"),
                    "n_tokens")
        .groupBy("lang", "bucket_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_sum"),
        )
    )

@register(
    "corpus_report",
    f"""
    -- corpus report card: docs and tokens by language x exact-dup
    -- status x quality verdict (same quality expressions as
    -- corpus_select) -- the composition dashboard an operator reads
    -- before shipping a crawl
    WITH toks AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ), feat AS (
      SELECT doc_id, lang, md5(text) AS h, length(w) AS n_tokens,
             (length(list_distinct(w)) * 10000 // length(w)) // 4 +
             least(list_sum(list_transform(w, x -> length(x))) * 100
                   // length(w), 1000) // 2 AS quality
      FROM toks
    ), dupes AS (
      SELECT h, count(*) AS c FROM feat GROUP BY h
    )
    SELECT f.lang, (d.c > 1) AS is_dup,
           (f.quality >= 1000 AND f.n_tokens >= 10) AS keep,
           count(*)::BIGINT AS n_docs, sum(f.n_tokens)::BIGINT AS n_tokens_sum
    FROM feat f JOIN dupes d ON d.h = f.h
    GROUP BY 1, 2, 3
    """,
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report card: (lang × exact-dup status × quality
    verdict) → doc and token counts — the pre-ship dashboard stitched
    from the tier's own primitives (quality_score expressions, the
    dedup_exact hash).  Features are map-only codegen; the dup flag
    is one shuffle on the 32-hex digest with map-side partials; the
    final rollup groups ~|lang|×4 cells.  At 100 TB this is the
    query that decides whether a crawl batch enters the mixture."""
    from extractor.operators.textstats import quality_score

    feats = quality_score(F.col("text"))
    feat = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.md5(F.col("text")).alias("h"),
        feats["n_tokens"].alias("n_tokens"),
        feats["quality"].alias("quality"),
    )
    dupes = feat.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        feat.join(dupes, "h")
        .select(
            "lang",
            (F.col("c") > 1).alias("is_dup"),
            ((F.col("quality") >= 1000) & (F.col("n_tokens") >= 10)).alias("keep"),
            "n_tokens",
        )
        .groupBy("lang", "is_dup", "keep")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_sum"),
        )
    )

@register(
    "quality_buckets",
    """
    -- CCNet §4.3 head/middle/tail: per-language surprisal terciles
    -- over the integer surprisal scores, tie-stable (equal scores →
    -- same bucket), boundaries via cum*3 >= n (no float percentile)
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), cnt AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t
    ), tot AS (
      SELECT sum(c)::BIGINT AS n FROM cnt
    ), per_doc AS (
      SELECT toks.doc_id, count(*) AS n_words,
             sum(tot.n // cnt.c) AS surprisal_sum
      FROM toks JOIN cnt ON cnt.t = toks.t, tot
      GROUP BY toks.doc_id
    ), scored AS (
      SELECT p.doc_id, d.lang,
             (p.surprisal_sum // p.n_words)::BIGINT AS mean_surprisal
      FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    ), hist AS (
      SELECT lang, mean_surprisal AS s, count(*)::BIGINT AS c
      FROM scored GROUP BY 1, 2
    ), cum AS (
      SELECT lang, s,
             (sum(c) OVER (PARTITION BY lang ORDER BY s))::BIGINT AS cum
      FROM hist
    ), n AS (
      SELECT lang, count(*)::BIGINT AS n FROM scored GROUP BY lang
    ), thr AS (
      SELECT cum.lang,
             min(CASE WHEN cum * 3 >= n.n THEN s END) AS t_head,
             min(CASE WHEN cum * 3 >= 2 * n.n THEN s END) AS t_mid
      FROM cum JOIN n ON n.lang = cum.lang
      GROUP BY cum.lang
    )
    SELECT sc.doc_id, sc.lang, sc.mean_surprisal,
           CASE WHEN sc.mean_surprisal <= t.t_head THEN 'head'
                WHEN sc.mean_surprisal <= t.t_mid THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored sc JOIN thr t ON t.lang = sc.lang
    """,
)
def q_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality terciles (operators.textstats.
    quality_buckets over unigram_surprisal): the head/middle/tail
    label every LM-data mixture reads before sampling.  The corpus is
    scored once (the surprisal shuffle), then bucket boundaries come
    from a (lang, score) histogram — the one window runs over that
    aggregated table, thresholds broadcast back as |lang| rows, and
    assignment is a CASE expression.  Tie-stable where ntile is not,
    so engine and oracle agree row-for-row."""
    from extractor.operators.textstats import quality_buckets, unigram_surprisal

    docs = _docs(spark, sf_dir)
    scored = (
        unigram_surprisal(docs.select("doc_id", "text"))
        .select("doc_id", "mean_surprisal")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    return quality_buckets(
        scored.select("doc_id", "lang", "mean_surprisal")
    ).select("doc_id", "lang", "mean_surprisal", "bucket")

@register(
    "bigram_surprisal",
    """
    -- conditional bigram surprisal, integer-exact: per-pair
    -- cp(w1) // cb(w1,w2), per-doc floored mean; docs with < 2
    -- tokens contribute no row
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bg AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM w, LATERAL (
        SELECT unnest(generate_series(1, length(ws) - 1)) AS i
      ) g
      WHERE length(ws) >= 2
    ), cb AS (
      SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2
    ), cp AS (
      SELECT w1, sum(cb) AS cp FROM cb GROUP BY 1
    ), s AS (
      SELECT w1, w2, cp // cb AS s FROM cb JOIN cp USING (w1)
    ), pd AS (
      SELECT bg.doc_id, count(*) AS nb, sum(s.s) AS ss
      FROM bg JOIN s USING (w1, w2) GROUP BY 1
    )
    SELECT doc_id, nb::BIGINT AS n_bigrams, ss::BIGINT AS surprisal_sum,
           (ss // nb)::BIGINT AS mean_surprisal
    FROM pd
    """,
)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram fluency scoring
    (operators.textstats.bigram_surprisal) — one LM order above
    unigram_surprisal, sensitive to word ORDER (a scrambled document
    lands on rare transitions and scores high, where a bag-of-words
    unigram score cannot move).  One bigram-count shuffle (map-side
    partials, (token, token, long) rows); prefix counts derive from
    the already-reduced count table, so the corpus is tokenized
    exactly once."""
    from extractor.operators.textstats import bigram_surprisal

    return bigram_surprisal(_docs(spark, sf_dir).select("doc_id", "text"))

@register(
    "collocations",
    """
    -- integer Dice associations; the planted ' pairleft pairright'
    -- tail on every 4th doc is a perfect collocation (each word
    -- occurs ONLY in the pair) and must rank first at dice = 10^6
    WITH corpus AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 4 = 0
                          THEN ' pairleft pairright' ELSE '' END AS text
      FROM documents
    ), toks AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM corpus
    ), c AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t
    ), w AS (
      SELECT string_split(text, ' ') AS ws FROM corpus
    ), bg AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM w, LATERAL (
        SELECT unnest(generate_series(1, length(ws) - 1)) AS i
      ) g
    ), cb AS (
      SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2
      HAVING count(*) >= 5
    ), s AS (
      SELECT w1, w2, n_pair, a.c AS n_w1, b.c AS n_w2,
             (2 * n_pair * 1000000) // (a.c + b.c) AS dice_x1e6
      FROM cb JOIN c a ON a.t = cb.w1 JOIN c b ON b.t = cb.w2
    )
    SELECT row_number() OVER (ORDER BY dice_x1e6 DESC, w1, w2)::INT AS rank,
           w1, w2, n_pair, n_w1, n_w2, dice_x1e6
    FROM s QUALIFY rank <= 50
    """,
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations (operators.relevance.collocations_topk):
    top-50 bigram associations by integer Dice — the phrase-induction
    signal read before tokenizer training.  Dice over PMI by design
    (no corpus-size product to overflow at web scale, no
    hapax-pathology to patch); the global cut is the bounded
    two-level top-k with an empty group list, never a single-reducer
    ORDER BY.  The planted pair (every 4th doc) is a perfect
    collocation and must land rank 1 at exactly dice = 10^6; the
    oracle is the window formulation over the same integer
    arithmetic."""
    from extractor.operators.relevance import collocations_topk

    corpus = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(" pairleft pairright"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return collocations_topk(corpus, k=50)

@register(
    "length_quantiles",
    """
    -- integer-exact per-language length quantiles from the (lang,
    -- n_chars) histogram: quantile q = smallest v with cum(v)*10000
    -- >= q*n — no float interpolation, no approx sketch
    WITH hist AS (
      SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
    ), cum AS (
      SELECT lang, n_chars, c,
             sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum
      FROM hist
    ), n AS (
      SELECT lang, sum(c) AS n FROM hist GROUP BY lang
    )
    SELECT c.lang, n.n::BIGINT AS n_docs,
           min(CASE WHEN c.cum * 10000 >= 2500 * n.n THEN c.n_chars END)::BIGINT
             AS q2500,
           min(CASE WHEN c.cum * 10000 >= 5000 * n.n THEN c.n_chars END)::BIGINT
             AS q5000,
           min(CASE WHEN c.cum * 10000 >= 7500 * n.n THEN c.n_chars END)::BIGINT
             AS q7500,
           min(CASE WHEN c.cum * 10000 >= 9500 * n.n THEN c.n_chars END)::BIGINT
             AS q9500,
           min(c.n_chars)::BIGINT AS min_v, max(c.n_chars)::BIGINT AS max_v
    FROM cum c JOIN n USING (lang)
    GROUP BY c.lang, n.n
    """,
)
def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quantiles
    (operators.textstats.grouped_quantiles): the profile read before
    fixing a context budget or truncation rule.  Integer-exact
    cumulative-threshold quantiles over the (lang, n_chars)
    histogram — the only window runs over the aggregated
    thousands-row table, tie-stable where percentile_approx is
    sketch-variant and float interpolation is engine-dependent."""
    from extractor.operators.textstats import grouped_quantiles

    return grouped_quantiles(
        _docs(spark, sf_dir).select("lang", "n_chars")
    )

@register(
    "lang_mismatch",
    """
    -- declared (html lang attribute) vs detected (stopword-profile
    -- n-gram ID): every 6th doc declares 'en' regardless of its
    -- actual language — the lying-label class a crawl-QA report
    -- surfaces before the declared value feeds routing decisions
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 6 = 0 THEN 'en' ELSE lang END AS declared_lang,
           (list_sort([@LANG@]))[1].l AS detected_lang,
           lang AS stored_lang,
           (CASE WHEN doc_id % 6 = 0 THEN 'en' ELSE lang END)
             <> (list_sort([@LANG@]))[1].l AS mismatch
    FROM toks
    """.replace("@LANG@", _LANG_STRUCTS),
)
def q_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language cross-check: the html ``lang``
    attribute travels through REAL synthesized page bytes and the
    Arrow metadata parser (operators.metadata.page_metadata), the
    detected label through the stopword-profile n-gram ID
    (textstats.predict_lang) — the crawl-QA signal that catches
    template-inherited and lying lang declarations before they feed
    routing.  Every 6th doc declares 'en' regardless of content;
    agreement rows pin the honest path.  The oracle re-derives the
    declared label from class arithmetic, so a regression in the
    html round-trip, the head parser, or the language profiles flips
    rows."""
    from extractor.operators.metadata import page_metadata
    from extractor.operators.textstats import predict_lang

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    declared = F.when(d % 6 == 0, F.lit("en")).otherwise(F.col("lang"))
    url = F.concat(F.lit("https://qa.test/p/"), d.cast("string"))
    pages = docs.select(
        url.alias("url"),
        F.encode(
            F.concat(
                F.lit('<html lang="'), declared,
                F.lit('"><head><title>t</title></head><body>'),
                F.col("text"), F.lit("</body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    meta = page_metadata(pages).select(
        "url", F.col("lang").alias("declared_lang")
    )
    scored = docs.select(
        "doc_id",
        url.alias("url"),
        predict_lang(F.col("text")).alias("detected_lang"),
        F.col("lang").alias("stored_lang"),
    )
    return scored.join(meta, "url").select(
        "doc_id",
        "declared_lang",
        "detected_lang",
        "stored_lang",
        (F.col("declared_lang") != F.col("detected_lang")).alias("mismatch"),
    )

@register(
    "quality_percentiles",
    """
    -- per-language percentile of the unigram-surprisal quality score:
    -- 10000 * (cumulative docs through the score) div n, tie-stable
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
      FROM documents
    ), cnt AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t
    ), tot AS (
      SELECT sum(c)::BIGINT AS n FROM cnt
    ), scored AS (
      SELECT toks.doc_id, toks.lang,
             (sum(tot.n // cnt.c) // count(*))::BIGINT AS mean_surprisal
      FROM toks JOIN cnt ON cnt.t = toks.t, tot
      GROUP BY toks.doc_id, toks.lang
    ), hist AS (
      SELECT lang, mean_surprisal, count(*) AS c FROM scored GROUP BY 1, 2
    ), cum AS (
      SELECT lang, mean_surprisal, c,
             sum(c) OVER (PARTITION BY lang ORDER BY mean_surprisal) AS cum
      FROM hist
    ), n AS (
      SELECT lang, sum(c) AS n FROM hist GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.mean_surprisal,
           (cm.cum * 10000 // n.n)::BIGINT AS percentile_bp
    FROM scored s
    JOIN cum cm ON cm.lang = s.lang
               AND cm.mean_surprisal = s.mean_surprisal
    JOIN n ON n.lang = s.lang
    """,
)
def q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-normalized quality
    (operators.textstats.grouped_percentiles over unigram_surprisal):
    puts every language's fluency scores on one 0–10000 axis — the
    comparability layer a cross-lingual mixture thresholds on, where
    raw surprisal is incomparable across vocabulary sizes.  The only
    window runs over the (lang, score) histogram; per-doc assignment
    is an equi-join back on (lang, score).  Tie-stable: equal scores
    share a percentile in both engines."""
    from extractor.operators.textstats import (
        grouped_percentiles,
        unigram_surprisal,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    scored = unigram_surprisal(docs.select("doc_id", "text")).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", "mean_surprisal")
    return grouped_percentiles(scored)

_FR_BLOCK = " ".join(["le les des et une est dans"] * 8 + ["le les des et"])

@register(
    "lang_mix",
    """
    -- segment-grain language mixing: every 8th doc gets a 60-word
    -- French stopword block appended, so its tail segments LID as
    -- 'fr' while the head stays the doc's own language — the
    -- code-switching signature document-level LID cannot see
    WITH corpus AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 8 = 0
                          THEN ' @FR@' ELSE '' END AS text
      FROM documents
    ), base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM corpus
    ), seg AS (
      SELECT doc_id, i,
             ws[i * 30 + 1 : least((i + 1) * 30, length(ws))] AS w
      FROM base, LATERAL (
        SELECT unnest(generate_series(0, (length(ws) + 29) // 30 - 1)) AS i
      ) g
    ), sl AS (
      SELECT doc_id, i, (list_sort([@LANG@]))[1].l AS lang FROM seg
    ), arr AS (
      SELECT doc_id, list(lang ORDER BY i) AS langs FROM sl GROUP BY doc_id
    ), rk AS (
      SELECT doc_id, langs, length(langs) AS n,
             list_sort(list_transform(list_distinct(langs),
               l -> {'negc': -length(list_filter(langs, x -> x = l)),
                     'l': l})) AS rk
      FROM arr
    )
    SELECT doc_id, n::BIGINT AS n_segments,
           (CASE WHEN n >= 2 THEN length(list_filter(
              generate_series(1, n - 1), j -> langs[j + 1] <> langs[j]))
            ELSE 0 END)::BIGINT AS n_switches,
           rk[1].l AS top_lang,
           ((-rk[1].negc) * 10000 // n)::BIGINT AS top_share_bp,
           rk[2].l AS second_lang,
           CASE WHEN length(rk) >= 2
                THEN ((-rk[2].negc) * 10000 // n)::BIGINT END
             AS second_share_bp
    FROM rk
    """.replace("@LANG@", _LANG_STRUCTS).replace("@FR@", _FR_BLOCK),
)
def q_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-grain language mixing
    (operators.textstats.segment_lang_mix): 30-word segments each
    LID'd with the shared stopword profiles, rebuilt per doc into the
    ordered label array, mix statistics as array arithmetic — no
    second shuffle, no window.  Every 8th doc carries an appended
    60-word French block: its tail segments flip to 'fr' (n_switches
    ≥ 1, second_lang populated) while document-level LID sees only
    the majority — the code-switched-spam signature this operator
    exists to surface."""
    from extractor.operators.textstats import segment_lang_mix

    corpus = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 8 == 0, F.lit(" " + _FR_BLOCK)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return segment_lang_mix(corpus)

@register(
    "vocab_coverage",
    """
    -- top-20 global vocabulary (count desc, token asc), per-language
    -- OOV occurrence share in basis points
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
    ), counts AS (
      SELECT lang, t, count(*) AS c FROM toks GROUP BY 1, 2
    ), marginal AS (
      SELECT t, sum(c) AS tc FROM counts GROUP BY t
    ), vocab AS (
      SELECT t FROM (
        SELECT t, row_number() OVER (ORDER BY tc DESC, t) AS rn
        FROM marginal) x WHERE rn <= 20
    )
    SELECT c.lang, sum(c.c)::BIGINT AS n_tokens,
           sum(CASE WHEN v.t IS NULL THEN c.c ELSE 0 END)::BIGINT
             AS oov_tokens,
           (sum(CASE WHEN v.t IS NULL THEN c.c ELSE 0 END) * 10000
             // sum(c.c))::BIGINT AS oov_bp
    FROM counts c LEFT JOIN vocab v ON v.t = c.t
    GROUP BY c.lang
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary coverage
    (operators.textstats.vocab_coverage): the OOV-rate report read
    before fixing a tokenizer vocabulary size — the global top-20
    token vocabulary (deterministic count-desc/token-asc cut via the
    bounded two-level top-k) covers each language unevenly, and the
    uncovered occurrence share per language is exactly where
    low-resource text gets over-segmented.  The coverage rollup
    touches only the reduced (lang, token) count table; the oracle
    is the window formulation."""
    from extractor.operators.textstats import vocab_coverage

    return vocab_coverage(_docs(spark, sf_dir).select("doc_id", "lang", "text"))


@register(
    "quality_classifier",
    """
    -- frozen-random linear classifier (the fastText-seam surrogate):
    -- per-word weight hex64(w) % 2001 - 1000, doc score = clamped
    -- shifted mean, reported integer-exact in [0, 2000]
    SELECT doc_id,
           (floor(list_sum(list_transform(string_split(text, ' '),
              x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2001 - 1000))
              / len(string_split(text, ' '))) + 1000)::BIGINT AS clf_bp
    FROM documents
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring seam (r4 VERDICT item 5): every
    document scored by the pluggable classifier
    (operators.classifier — fastText-style linear scorer contract; the
    shipped surrogate is a frozen random linear model whose scores
    are ANSI-SQL-reproducible, so the seam itself carries a full
    oracle).  Map-only, no shuffle: scoring 10^12 docs is
    embarrassingly parallel; a production fastText plugs in as an
    Arrow-batched pandas UDF under the same contract."""
    from extractor.operators.classifier import classifier_scores

    return classifier_scores(_docs(spark, sf_dir)).select(
        "doc_id",
        F.round(F.col("clf_score") * 2000).cast("long").alias("clf_bp"),
    )


@register(
    "corpus_select_model",
    f"""
    -- corpus_select with the rule-based quality threshold replaced by
    -- the model-classifier cut at 0.5 (clf surrogate mean >= 0):
    -- LID agreement + min length + classifier + exact-dedup canonical
    WITH toks AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ), feat AS (
      SELECT doc_id, lang, text,
             (list_sort([{_LANG_STRUCTS}]))[1].l AS pred_lang,
             length(w) AS n_tokens,
             (floor(list_sum(list_transform(w,
                x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2001 - 1000))
                / length(w)) + 1000)::BIGINT AS clf_bp
      FROM toks
    ), canon AS (
      SELECT md5(text) AS h, min(doc_id) AS canonical FROM feat GROUP BY 1
    )
    SELECT f.doc_id, f.pred_lang, f.n_tokens::BIGINT AS n_tokens, f.clf_bp
    FROM feat f JOIN canon c ON md5(f.text) = c.h AND f.doc_id = c.canonical
    WHERE f.pred_lang = f.lang AND f.clf_bp >= 1000 AND f.n_tokens >= 10
    """,
)
def q_corpus_select_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_select's model-scored sibling: the learned-classifier
    cut (DCLM/FineWeb-Edu pattern) replaces the rule-based quality
    threshold; LID agreement, minimum length, and exact-dedup
    canonicalization are unchanged.  The classifier column is the
    operators.classifier seam — swapping the surrogate for a real
    fastText changes zero lines here."""
    from extractor.operators.classifier import classifier_score_expr
    from extractor.operators.textstats import predict_lang, quality_score

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    feats = quality_score(F.col("text"))
    feat = docs.select(
        "doc_id",
        "lang",
        "text",
        predict_lang(F.col("text")).alias("pred_lang"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(classifier_score_expr(F.col("text")) * 2000)
        .cast("long")
        .alias("clf_bp"),
    )
    canon = feat.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("canonical")
    )
    kept = feat.join(
        canon,
        (F.md5(feat["text"]) == canon["h"]) & (feat["doc_id"] == canon["canonical"]),
        "inner",
    )
    return kept.filter(
        (F.col("pred_lang") == F.col("lang"))
        & (F.col("clf_bp") >= 1000)
        & (F.col("n_tokens") >= 10)
    ).select("doc_id", "pred_lang", "n_tokens", "clf_bp")


@register(
    "classifier_vs_rules",
    f"""
    -- calibration matrix for the learned-quality seam: how the
    -- classifier cut agrees with the Gopher rule verdict, per lang —
    -- the dashboard read before swapping a rules gate for a model gate
    WITH feats AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(text, '[ \n]+') AS w,
             string_split(text, chr(10)) AS lines
      FROM documents
    ), m AS (
      SELECT lang,
             (len(w) BETWEEN 50 AND 100000
              AND list_sum(list_transform(w, t -> length(t))) * 100
                    // greatest(len(w), 1) BETWEEN 300 AND 1000
              AND len(list_filter(w, t -> contains(t, '#')
                    OR contains(t, '...'))) * 10000
                    // greatest(len(w), 1) <= 1000
              AND len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
                    * 10000 // greatest(len(w), 1) >= 8000
              AND len(list_filter(lines, l -> starts_with(l, '- ')
                    OR starts_with(l, '* ') OR starts_with(l, '•')))
                    * 10000 // greatest(len(lines), 1) < 9000
              AND len(list_filter(lines, l -> ends_with(l, '...')))
                    * 10000 // greatest(len(lines), 1) <= 3000
              AND len(list_intersect(w, {_GOPHER_STOPS_SQL})) >= 2)
               AS rules_keep,
             ((floor(list_sum(list_transform(string_split(text, ' '),
                 x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2001 - 1000))
                 / len(string_split(text, ' '))) + 1000) >= 1000) AS model_keep
      FROM feats
    )
    SELECT lang, rules_keep, model_keep, count(*)::BIGINT AS n_docs
    FROM m GROUP BY lang, rules_keep, model_keep
    """,
)
def q_classifier_vs_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-vs-rules calibration matrix: per-language agreement
    between the Gopher rule verdict and the classifier cut — the
    observability read a pipeline owner makes BEFORE swapping the
    rules gate for a learned gate (where do they disagree, and which
    languages drift).  Both verdicts are map-only expressions; the
    matrix is one grouped count over ~|lang|×4 cells."""
    from extractor.operators.classifier import classifier_score_expr
    from extractor.operators.textstats import gopher_rules

    docs = _docs(spark, sf_dir).select("lang", "text")
    r = gopher_rules(F.col("text"), stopwords=_GOPHER_STOPS)
    clf = F.round(classifier_score_expr(F.col("text")) * 2000).cast("long")
    return (
        docs.select(
            "lang",
            r["keep"].alias("rules_keep"),
            (clf >= 1000).alias("model_keep"),
        )
        .groupBy("lang", "rules_keep", "model_keep")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )

@register(
    "c4_rules",
    """
    -- C4 cleaning rules (Raffel et al. 2020 2.2) over a hooked
    -- multi-line corpus: line-level terminal-punct/5-word/javascript
    -- filter, page-level sentence-count / badword / lorem / brace
    -- drops.  Hook plants every rule's trigger on a distinct residue.
    WITH hooked AS (
      SELECT doc_id, concat_ws(chr(10),
        array_to_string((string_split(text, ' '))[1:8], ' ')
          || ' works fine today.',
        'too short.',
        CASE WHEN doc_id % 2 = 0
             THEN 'It works well. It scales well. It ships now.' END,
        CASE WHEN doc_id % 4 = 0
             THEN 'this javascript line has enough words here.' END,
        CASE WHEN doc_id % 5 = 0
             THEN 'lorem ipsum dolor sit amet consectetur adipiscing.' END,
        CASE WHEN doc_id % 7 = 0
             THEN 'object literal { key value pair } appears.' END,
        CASE WHEN doc_id % 11 = 0
             THEN 'strictly nsfw content warning label here.' END
      ) AS text
      FROM documents
    ), feat AS (
      SELECT doc_id, text,
             string_split(text, chr(10)) AS lines,
             list_filter(string_split(text, chr(10)), l ->
               len(list_filter(string_split(l, ' '), t -> t <> '')) >= 5
               AND regexp_matches(l, '[.!?\"]$')
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM hooked
    ), m AS (
      SELECT doc_id,
             len(lines)::BIGINT AS n_lines,
             len(kept)::BIGINT AS n_kept_lines,
             length(regexp_replace(array_to_string(kept, chr(10)),
                    '[^.!?]', '', 'g'))::BIGINT AS n_sentences,
             len(list_intersect(
               regexp_split_to_array(lower(text), '[ \n]+'),
               ['fuck', 'shit', 'porn', 'xxx', 'nsfw'])) > 0 AS has_badword,
             contains(lower(text), 'lorem ipsum') AS has_lorem,
             contains(text, '{') AS has_brace,
             md5(array_to_string(kept, chr(10))) AS clean_md5
      FROM feat
    )
    SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_badword,
           has_lorem, has_brace, clean_md5,
           (n_sentences >= 3 AND n_kept_lines > 0 AND NOT has_badword
            AND NOT has_lorem AND NOT has_brace) AS keep
    FROM m
    """,
)
def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (operators.textstats.c4_rules) — the other
    canonical public filter set beside Gopher, and the only line-LEVEL
    one: the hook plants each rule's trigger on a distinct doc_id
    residue (%2 sentences, %4 javascript line, %5 lorem ipsum, %7
    brace, %11 badword) so every rule flips real rows both ways.
    clean_md5 pins the line-filtered TRANSFORM output, not just the
    verdict.  Expression-only — a free predicate on the scan at any
    scale."""
    from extractor.operators.textstats import c4_rules

    d = F.col("doc_id")
    first8 = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    hooked = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(first8, F.lit(" works fine today.")),
            F.lit("too short."),
            F.when(
                d % 2 == 0,
                F.lit("It works well. It scales well. It ships now."),
            ),
            F.when(
                d % 4 == 0,
                F.lit("this javascript line has enough words here."),
            ),
            F.when(
                d % 5 == 0,
                F.lit("lorem ipsum dolor sit amet consectetur adipiscing."),
            ),
            F.when(
                d % 7 == 0,
                F.lit("object literal { key value pair } appears."),
            ),
            F.when(
                d % 11 == 0,
                F.lit("strictly nsfw content warning label here."),
            ),
        ).alias("text"),
    )
    r = c4_rules(F.col("text"))
    return hooked.select(
        "doc_id",
        r["n_lines"].alias("n_lines"),
        r["n_kept_lines"].alias("n_kept_lines"),
        r["n_sentences"].alias("n_sentences"),
        r["has_badword"].alias("has_badword"),
        r["has_lorem"].alias("has_lorem"),
        r["has_brace"].alias("has_brace"),
        F.md5(r["clean_text"]).alias("clean_md5"),
        r["keep"].alias("keep"),
    )

@register(
    "classifier_weighted_sample",
    f"""
    -- FineWeb-Edu-style soft filter: keep each doc with probability
    -- proportional to its classifier score, made DETERMINISTIC by a
    -- salted hash draw (no rand() -- membership is a pure function of
    -- doc_id, so the sample survives recrawls and repartitions)
    WITH scored AS (
      SELECT doc_id,
             (floor(list_sum(list_transform(string_split(text, ' '),
                x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2001 - 1000))
                / len(string_split(text, ' '))) + 1000)::BIGINT AS clf_bp
      FROM documents
    )
    SELECT doc_id, clf_bp,
           ({_HEX64_SQL.format(x="'clfsample:' || doc_id::VARCHAR")}
             % 2000)::BIGINT AS draw
    FROM scored
    WHERE {_HEX64_SQL.format(x="'clfsample:' || doc_id::VARCHAR")} % 2000
          < clf_bp
    """,
)
def q_classifier_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling — the soft alternative to the hard
    classifier threshold (corpus_select_model): each document is kept
    with probability equal to its classifier score, implemented as a
    deterministic salted-hash Bernoulli draw (keep iff
    hex64('clfsample:'||id) % 2000 < score·2000).  No rand():
    membership is a pure function of doc_id, so the sampled corpus is
    reproducible across recrawls, repartitions, and cluster sizes,
    and the salt decorrelates the draw from the split/shard/bloom
    hashes.  Map-only expression — at 100 TB this is a free predicate
    on the scoring scan; a production fastText model swaps in through
    the classifier seam and the draw logic is unchanged."""
    from extractor.operators.classifier import classifier_scores
    from extractor.operators.dedup import hex64

    scored = classifier_scores(_docs(spark, sf_dir)).select(
        "doc_id",
        F.round(F.col("clf_score") * 2000).cast("long").alias("clf_bp"),
    )
    draw = hex64(
        F.concat(F.lit("clfsample:"), F.col("doc_id").cast("string"))
    ) % 2000
    return scored.select(
        "doc_id", "clf_bp", draw.cast("long").alias("draw")
    ).filter(F.col("draw") < F.col("clf_bp"))

@register(
    "compression_ratio",
    None,  # zlib is genuinely not SQL-expressible; DuckDB has no
    # compression UDF.  The driver records the weaker rows-only check;
    # correctness is pinned by a driver-side zlib recompute over every
    # sf0.001 document plus a repetition-monotonicity property
    # (tests/test_operators.py::test_compression_ratio_*).
)
def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal — the repetitiveness gate
    the n-gram Gopher rules miss (long-period templating, repeated
    paragraphs past the 4-gram horizon).  Map-only mapInPandas scan,
    no shuffle; ratio as integer per-mille so the repetitive flag is
    exactly reproducible (operators/compressibility.py)."""
    from extractor.operators.compressibility import compression_stats

    return compression_stats(_docs(spark, sf_dir))


@register(
    "tokenizer_fertility",
    # DuckDB mirror of operators.tokenizer.bpe_token_count_estimate:
    # per word 1 + (len-1) // CHARS_PER_PIECE, summed, vs the
    # whitespace word count; fertility in integer x1000.
    """
    WITH t AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_w,
             len(string_split(text, ' ')) +
               list_sum(list_transform(string_split(text, ' '),
                        x -> (length(x) - 1) // 6)) AS n_t
      FROM documents
    )
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           sum(n_w)::BIGINT AS n_words,
           sum(n_t)::BIGINT AS n_tokens,
           ((sum(n_t) * 1000) // sum(n_w))::BIGINT AS fertility_x1000
    FROM t GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — subword tokens per
    whitespace word, x1000 (the tokenizer-efficiency read done before
    committing a vocabulary to a multilingual corpus: a language
    whose fertility is 2x the corpus mean pays 2x the context budget
    for the same content, which skews any token-denominated mixture
    plan).  Counts flow through the token-counting seam
    (operators.tokenizer.TOKEN_COUNTERS), so swapping the deterministic
    bpe_estimate for a real tokenizer UDF re-measures fertility with
    zero query changes.  Expression-only per doc + one reduced
    aggregate — no shuffle wider than (lang) rows at any scale."""
    from extractor.operators.tokenizer import (
        bpe_token_count_estimate,
        ws_token_count,
    )

    docs = _docs(spark, sf_dir)
    per_doc = docs.select(
        "lang",
        ws_token_count(F.col("text")).alias("n_w"),
        bpe_token_count_estimate(F.col("text")).alias("n_t"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_w").alias("n_words"),
            F.sum("n_t").alias("n_tokens"),
        )
        .select(
            "lang", "n_docs", "n_words", "n_tokens",
            F.expr("(n_tokens * 1000) div n_words").alias("fertility_x1000"),
        )
    )


@register(
    "surprisal_transfer",
    # Train/apply split: the count table is fit on the reference
    # subset only (doc_id % 5 = 0); crawl-side OOV tokens are charged
    # the hapax cost n // 1.
    """
    WITH ref_toks AS (
      SELECT unnest(string_split(text, ' ')) AS t
      FROM documents WHERE doc_id % 5 = 0
    ), cnt AS (
      SELECT t, count(*) AS c FROM ref_toks GROUP BY t
    ), tot AS (
      SELECT sum(c)::BIGINT AS n FROM cnt
    ), crawl_toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents WHERE doc_id % 5 <> 0
    ), per_doc AS (
      SELECT ct.doc_id, count(*) AS n_words,
             sum(CASE WHEN cnt.c IS NULL THEN 1 ELSE 0 END) AS n_oov,
             sum(tot.n // coalesce(cnt.c, 1)) AS surprisal_sum
      FROM crawl_toks ct LEFT JOIN cnt ON cnt.t = ct.t, tot
      GROUP BY ct.doc_id
    )
    SELECT doc_id, n_words::BIGINT AS n_words, n_oov::BIGINT AS n_oov,
           surprisal_sum::BIGINT AS surprisal_sum,
           (surprisal_sum // n_words)::BIGINT AS mean_surprisal
    FROM per_doc
    """,
)
def q_surprisal_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's actual train/apply discipline (Wenzek et al. 2020
    §4.2): the LM is fit on a trusted reference corpus and APPLIED to
    the crawl — unigram_surprisal's same-corpus scoring lets crawl
    spam deflate its own surprisal by being frequent; this one does
    not.  A deterministic fifth of the synthetic corpus plays the
    Wikipedia role; the rest is the crawl.  OOV tokens (absent from
    the reference vocabulary) are charged the hapax cost and counted
    per doc, so thresholds can separate foreign-vocabulary from
    gibberish.  Shape: the model-build shuffle is REFERENCE-sized
    (~10^-3 of the crawl at CCNet scale); scoring is one equi-join of
    exploded crawl tokens against the |vocab|-row count table + one
    per-doc aggregate — crawl text bytes never ride a shuffle."""
    from extractor.operators.textstats import surprisal_transfer

    docs = _docs(spark, sf_dir)
    return surprisal_transfer(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 5 != 0),
    )


@register(
    "markdown_outline",
    # Deterministic markdown synthesized from documents: every doc
    # gets an H1; %3 docs gain two H2 sections; %7 docs a deep H4;
    # %5 docs an indented '   # not a heading' line (ATX headings
    # must start at column 0 — the trap) plus a '#hashtag' line
    # (no space after # — not a heading either).
    """
    WITH md AS (
      SELECT doc_id,
             '# Title ' || doc_id::VARCHAR || chr(10)
             || CASE WHEN doc_id % 3 = 0
                     THEN '## Section A' || chr(10) || '## Section B' || chr(10)
                     ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN '#### Deep' || chr(10) ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN '   # not a heading' || chr(10) || '#hashtag' || chr(10)
                     ELSE '' END
             || text AS t
      FROM documents
    ), arr AS (
      SELECT doc_id, string_split(t, chr(10)) AS lines,
             list_transform(
               list_filter(string_split(t, chr(10)),
                           l -> regexp_matches(l, '^#{1,6} ')),
               l -> length(regexp_extract(l, '^(#+)', 1))) AS depths
      FROM md
    )
    SELECT doc_id,
           length(depths)::BIGINT AS n_headings,
           coalesce(list_max(depths), 0)::BIGINT AS max_depth,
           length(list_filter(depths, d -> d = 1))::BIGINT AS n_h1,
           length(lines)::BIGINT AS n_lines,
           length(list_filter(lines,
             l -> NOT regexp_matches(l, '^#{1,6} ')
                  AND length(trim(l)) > 0))::BIGINT AS body_lines
    FROM arr
    """,
)
def q_markdown_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown structure statistics
    (operators.textstats.markdown_outline) over deterministic
    markdown synthesized from documents — heading counts/depths and
    body-line mass, the document-shape quality axis word-level rules
    miss.  The fixture plants the two ATX traps (indented '#' and
    '#hashtag' without a space) so the heading regex is
    load-bearing.  Map-only, expression-only."""
    from extractor.operators.textstats import markdown_outline

    d = F.col("doc_id")
    md = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("# Title "), d.cast("string"), F.lit("\n"),
            F.when(d % 3 == 0, F.lit("## Section A\n## Section B\n"))
            .otherwise(F.lit("")),
            F.when(d % 7 == 0, F.lit("#### Deep\n")).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit("   # not a heading\n#hashtag\n"))
            .otherwise(F.lit("")),
            F.col("text"),
        ).alias("text"),
    )
    return markdown_outline(md)
