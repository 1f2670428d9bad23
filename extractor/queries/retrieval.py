"""Retrieval tier: positional postings, AND/phrase/ranked queries, LSM merge, snippets, tf-idf, anchor index."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.queries._core import (  # noqa: F401
    register,
    _BOILER_EDGES_SQL,
    _docs,
)
from extractor.queries.graph import q_html_outlinks  # noqa: F401

@register(
    "tfidf_topk",
    """
    -- integer-exact TF-IDF: score = tf * (n_docs // df), top 3 terms
    -- per document, ties alphabetical
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf
      FROM toks GROUP BY doc_id, token
    ), dft AS (
      SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token
    ), nd AS (
      SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             (tf.tf * (nd.n_docs // dft.df))::BIGINT AS score
      FROM tf JOIN dft ON dft.token = tf.token, nd
    )
    SELECT doc_id, rank, token, score FROM (
      SELECT doc_id, token, score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, token ASC
             )::INT AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyterm extraction (operators.relevance.
    tfidf_topk): top-3 terms by integer-exact TF-IDF — tf weighted by
    the floored inverse document frequency ``n_docs div df`` (monotone
    in the textbook tf·log(N/df), bit-reproducible in both engines).
    The df table joins on the token equi-key with the strategy left to
    Catalyst — broadcast under the auto threshold, shuffle join once a
    web-scale vocabulary outgrows driver range (no hint pins a
    driver-sized structure); the per-doc cut is the bounded two-level
    grouped_topk, no per-group window."""
    from extractor.operators.relevance import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir).select("doc_id", "text"), k=3)

@register(
    "anchor_topk",
    """
    -- inbound anchor-term profile per target host over a synthetic
    -- cross-host link fixture (topic anchor to a derived host +
    -- relative 'home link' anchor resolving to the source host)
    WITH links AS (
      SELECT 'h' || ((doc_id * 3 + 1) % 7) || '.example-42.test' AS dst_host,
             lower('Topic ' || (doc_id % 13) || ' News') AS anchor
      FROM documents
      UNION ALL
      SELECT 'h' || (doc_id % 7) || '.example-42.test' AS dst_host,
             'home link' AS anchor
      FROM documents
    ), terms AS (
      SELECT dst_host, unnest(string_split(anchor, ' ')) AS term FROM links
    ), counts AS (
      SELECT dst_host, term, count(*)::BIGINT AS n
      FROM terms WHERE term <> ''
      GROUP BY dst_host, term HAVING count(*) >= 2
    )
    SELECT dst_host, rank, term, n FROM (
      SELECT dst_host, term, n,
             row_number() OVER (
               PARTITION BY dst_host ORDER BY n DESC, term ASC
             )::INT AS rank
      FROM counts
    ) WHERE rank <= 5
    """,
)
def q_anchor_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound anchor-text profiles (operators.relevance.
    anchor_term_topk): the top-5 terms other pages use when linking
    to each host — the classic high-precision "what is this page
    about" ranking signal, equally useful as a topic prior for
    training-data curation.  Map-only host resolution (relative hrefs
    → source host, as host_edges), term explode, one (host, term)
    count aggregate with a min-count noise floor, bounded top-k."""
    from extractor.operators.relevance import anchor_term_topk

    docs = _docs(spark, sf_dir).select("doc_id")
    src = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example-42.test/p/"), F.col("doc_id").cast("string"),
    )
    topic_href = F.concat(
        F.lit("https://h"), ((F.col("doc_id") * 3 + 1) % 7).cast("string"),
        F.lit(".example-42.test/t"),
    )
    topic_anchor = F.concat(
        F.lit("Topic "), (F.col("doc_id") % 13).cast("string"), F.lit(" News")
    )
    outlinks = docs.select(
        src.alias("url"),
        F.explode(
            F.array(
                F.struct(
                    topic_href.alias("href"), topic_anchor.alias("anchor_text")
                ),
                F.struct(
                    F.concat(F.lit("/local/"), F.col("doc_id").cast("string"))
                    .alias("href"),
                    F.lit("home link").alias("anchor_text"),
                ),
            )
        ).alias("l"),
    ).select("url", "l.href", "l.anchor_text")
    return anchor_term_topk(outlinks, k=5, min_count=2)

@register(
    "build_postings",
    """
    -- planted marker tokens (40 classes, df = n/40) survive the
    -- max_df=200 stopword cut; the ~35-word synthetic vocabulary
    -- (df ~ n_docs) is dropped by it — the oracle replays the same
    -- rule, so a df or posting-order bug flips rows
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(
               lower(text) || ' marker' || (doc_id % 40), ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT token, doc_id AS doc, count(*)::BIGINT AS tf
      FROM t WHERE token <> '' GROUP BY 1, 2
    ), dfs AS (
      SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1
    )
    SELECT tf.token, dfs.df,
           string_agg(doc || ':' || tf, ',' ORDER BY doc) AS postings
    FROM tf JOIN dfs USING (token)
    WHERE dfs.df <= 200
    GROUP BY tf.token, dfs.df
    """,
)
def q_build_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (operators.relevance.build_postings)
    with the max_df stopword guard doing real work: the synthetic
    vocabulary (df ~ n_docs) must be dropped BEFORE any posting list
    is collected, while 40 planted marker classes (df = n/40) survive
    with doc-sorted postings.  The list is canonicalized to a
    'doc:tf,doc:tf' string so the oracle compares bit-for-bit."""
    from extractor.operators.relevance import build_postings

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" marker"),
            (F.col("doc_id") % 40).cast("string"),
        ).alias("text"),
    )
    idx = build_postings(docs, max_df=200)
    return idx.select(
        "token",
        "df",
        F.array_join(
            F.transform(
                "postings",
                lambda p: F.concat(
                    p["doc"].cast("string"), F.lit(":"), p["tf"].cast("string")
                ),
            ),
            ",",
        ).alias("postings"),
    )

@register(
    "postings_query",
    """
    -- independent arithmetic, no index replay: kwalpha rides every
    -- 3rd doc, kwbeta every 5th, each appended once (tf = 1), so the
    -- conjunction is exactly the doc_id % 15 == 0 set with min_tf 1
    SELECT doc_id AS doc, 1::BIGINT AS min_tf
    FROM documents WHERE doc_id % 15 = 0
    """,
)
def q_postings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive AND-retrieval over the engine's own inverted index
    (build_postings → conjunctive_query): documents carrying BOTH
    planted keywords.  The oracle never touches the index — it states
    the answer set by arithmetic — so a bug anywhere in the
    tokenize/df/collect/merge chain flips rows."""
    from extractor.operators.relevance import build_postings, conjunctive_query

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 3 == 0, F.lit(" kwalpha")).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit(" kwbeta")).otherwise(F.lit("")),
        ).alias("text"),
    )
    idx = build_postings(docs, max_df=1_000_000)
    return conjunctive_query(idx, ["kwalpha", "kwbeta"])

@register(
    "postings_merge",
    """
    -- one-shot formulation: merging the two half-indexes must equal
    -- indexing the whole corpus with the merged cut.  Planted dfs are
    -- sf-independent (block tokens: grp df<=13, hot df<=50), so the
    -- max_df=30 merge cut keeps grp, drops hot AND the df~n synthetic
    -- vocabulary at every scale
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(
               lower(text) || ' grp' || (doc_id // 13)
                           || ' hot' || (doc_id // 50), ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT token, doc_id AS doc, count(*)::BIGINT AS tf
      FROM t WHERE token <> '' GROUP BY 1, 2
    ), dfs AS (
      SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1
    )
    SELECT tf.token, dfs.df,
           string_agg(doc || ':' || tf, ',' ORDER BY doc) AS postings
    FROM tf JOIN dfs USING (token)
    WHERE dfs.df <= 30
    GROUP BY tf.token, dfs.df
    """,
)
def q_postings_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance (operators.relevance
    .merge_postings): the corpus splits into two disjoint batches
    (doc_id parity), each batch builds ITS OWN index, and the merge
    must equal the one-shot index over everything — including the
    merge-time max_df re-cut that promotes the 'hot' block token
    (df 50) and the df~n vocabulary to stopwords while the halves,
    built permissively, still carried them.  History text is never
    re-tokenized; only index rows move."""
    from extractor.operators.relevance import build_postings, merge_postings

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" grp"), F.expr("doc_id div 13").cast("string"),
            F.lit(" hot"), F.expr("doc_id div 50").cast("string"),
        ).alias("text"),
    )
    half_a = build_postings(docs.filter(d % 2 == 0), max_df=1_000_000)
    half_b = build_postings(docs.filter(d % 2 == 1), max_df=1_000_000)
    # serve view: tombstone rows (stopword memory for chained merges)
    # carry empty postings; the one-shot oracle has no tombstones
    merged = merge_postings(half_a, half_b, max_df=30).filter(
        F.size("postings") > 0
    )
    return merged.select(
        "token",
        "df",
        F.array_join(
            F.transform(
                "postings",
                lambda p: F.concat(
                    p["doc"].cast("string"), F.lit(":"), p["tf"].cast("string")
                ),
            ),
            ",",
        ).alias("postings"),
    )

@register(
    "phrase_query",
    """
    -- independent arithmetic, no index replay: 'alpha beta gamma'
    -- rides every 7th doc exactly once; every 11th doc carries the
    -- near-miss 'alpha beta zeta' (the bigram alone must NOT count),
    -- so the phrase answer is exactly the %7 set with one start each
    SELECT doc_id AS doc, 1::BIGINT AS n_matches
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def q_phrase_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase retrieval through the engine's own positional
    index (positional_postings → phrase_query): docs where the three
    planted words are CONSECUTIVE.  The %11 near-miss class carries
    the first two words followed by a different third, so any
    off-by-one in the position shift, a missing join key, or df/cut
    damage flips rows.  The oracle states the answer set by
    arithmetic and never touches the index."""
    from extractor.operators.relevance import phrase_query, positional_postings

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 7 == 0, F.lit(" alpha beta gamma")).otherwise(F.lit("")),
            F.when(d % 11 == 0, F.lit(" alpha beta zeta")).otherwise(F.lit("")),
        ).alias("text"),
    )
    idx = positional_postings(docs, max_df=1_000_000)
    return phrase_query(idx, ["alpha", "beta", "gamma"])

@register(
    "e2e_wet_index",
    """
    -- same arithmetic answer as phrase_query: if the WET hop loses
    -- or reorders ONE byte of any %7 doc's text, its positions shift
    -- and the phrase row disappears — the archive and retrieval
    -- tiers verify each other
    SELECT doc_id AS doc, 1::BIGINT AS n_matches
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def q_e2e_wet_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl archive in → phrase answers out: the phrase fixture
    exported as REAL WET segments (to_wet_records → write.text),
    re-ingested through the block-splittable reader, positional index
    built from the ROUND-TRIPPED text, phrase retrieved — every stage
    the engine's own operator.  doc ids ride the WET url and are
    recovered by parsing it back, so url formatting, record framing,
    body byte-identity and position arithmetic are all on the hook
    for the same arithmetic oracle phrase_query answers to."""
    import tempfile

    from extractor.operators.relevance import phrase_query, positional_postings
    from extractor.sources.wet import read_wet, to_wet_records

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 7 == 0, F.lit(" alpha beta gamma")).otherwise(F.lit("")),
            F.when(d % 11 == 0, F.lit(" alpha beta zeta")).otherwise(F.lit("")),
        ).alias("text"),
    )
    wet_rows = docs.select(
        F.format_string("https://idx.test/d/%06d", F.col("doc_id")).alias("url"),
        F.lit("2025-06-04T00:00:00Z").alias("warc_date"),
        "text",
    )
    out = tempfile.mkdtemp(prefix="wet_index_") + "/segments"
    to_wet_records(wet_rows.repartition(4)).write.mode("overwrite").text(out)
    back = read_wet(spark, out).select(
        F.regexp_extract("url", r"/d/(\d+)$", 1).cast("long").alias("doc_id"),
        "text",
    )
    idx = positional_postings(back, max_df=1_000_000)
    return phrase_query(idx, ["alpha", "beta", "gamma"])

@register(
    "postings_stats",
    """
    -- three planted df regimes make the histogram non-trivial at any
    -- sf: marker classes at df ~ n/40, dup classes at df ~ n/8, and
    -- the ~35-word synthetic vocabulary at df ~ n; bit-length
    -- bucketing is integer-exact in both engines (no float log2)
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(
               lower(text) || ' marker' || (doc_id % 40)
                           || ' dup' || (doc_id % 8), ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT token, doc_id AS doc, count(*)::BIGINT AS tf
      FROM t WHERE token <> '' GROUP BY 1, 2
    ), dfs AS (
      SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1
    )
    SELECT (length(bin(df)) - 1)::BIGINT AS df_bucket,
           count(*)::BIGINT AS n_terms,
           sum(df)::BIGINT AS n_postings,
           max(df)::BIGINT AS max_df
    FROM dfs GROUP BY 1
    """,
)
def q_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-index observability (operators.relevance
    .postings_index_stats): the df histogram an operator reads to
    retune max_df before the next index merge — the postings analog
    of lsh_index_stats.  Built permissively (no cut) over a fixture
    with three planted df regimes so every power-of-two band between
    n/40 and n is populated."""
    from extractor.operators.relevance import build_postings, postings_index_stats

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" marker"), (F.col("doc_id") % 40).cast("string"),
            F.lit(" dup"), (F.col("doc_id") % 8).cast("string"),
        ).alias("text"),
    )
    idx = build_postings(docs, max_df=1_000_000_000)
    return postings_index_stats(idx)

@register(
    "ranked_query",
    """
    -- score re-derived by class arithmetic: qx rides every 3rd doc
    -- (tf 3 on the %9 subset via the doubled tail), qy every 5th;
    -- integer idf = N div df exactly as the engine computes it
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    dfx AS (SELECT count(*) AS df FROM documents WHERE doc_id % 3 = 0),
    dfy AS (SELECT count(*) AS df FROM documents WHERE doc_id % 5 = 0),
    sc AS (
      SELECT d.doc_id AS doc,
             (CASE WHEN d.doc_id % 3 = 0 THEN
                (CASE WHEN d.doc_id % 9 = 0 THEN 3 ELSE 1 END)
                * (n.n_docs // dfx.df) ELSE 0 END
              + CASE WHEN d.doc_id % 5 = 0 THEN n.n_docs // dfy.df
                     ELSE 0 END)::BIGINT AS score
      FROM documents d, n, dfx, dfy
      WHERE d.doc_id % 3 = 0 OR d.doc_id % 5 = 0
    ),
    rk AS (
      SELECT doc, score,
             row_number() OVER (ORDER BY score DESC, doc) AS rank
      FROM sc
    )
    SELECT rank::BIGINT AS rank, doc, score FROM rk WHERE rank <= 10
    """,
)
def q_ranked_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive ranked retrieval through the engine's own index
    (build_postings → ranked_query): global top-10 docs for a
    two-term query under the integer tf·(N div df) weight.  The %9
    subset carries the first term three times (tf weighting on the
    hook), %15 docs match both terms (score addition on the hook),
    and the oracle re-derives every score by pure class arithmetic —
    the index is never replayed."""
    from extractor.operators.relevance import build_postings, ranked_query

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 3 == 0, F.lit(" qx")).otherwise(F.lit("")),
            F.when(d % 9 == 0, F.lit(" qx qx")).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit(" qy")).otherwise(F.lit("")),
        ).alias("text"),
    )
    idx = build_postings(docs, max_df=1_000_000)
    n = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return ranked_query(idx, ["qx", "qy"], n, k=10)

@register(
    "bm25_query",
    """
    -- BM25 re-derived by class arithmetic (same hook corpus as
    -- ranked_query): k1=6/5, b=3/4 cleared to the integer form
    -- score_x1000 = (1000*idf*22*tf*S) // (10*tf*S + 3*S + 9*dl*N)
    WITH hooked AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t <> ''))
               + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
               + CASE WHEN doc_id % 9 = 0 THEN 2 ELSE 0 END
               + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS dl
      FROM documents
    ), tot AS (SELECT sum(dl) AS s, count(*) AS n FROM hooked),
    dfx AS (SELECT count(*) AS df FROM documents WHERE doc_id % 3 = 0),
    dfy AS (SELECT count(*) AS df FROM documents WHERE doc_id % 5 = 0),
    sc AS (
      SELECT h.doc_id AS doc,
        (CASE WHEN h.doc_id % 3 = 0 THEN
           (1000 * (t.n // dfx.df) * 22
              * (CASE WHEN h.doc_id % 9 = 0 THEN 3 ELSE 1 END) * t.s)
           // (10 * (CASE WHEN h.doc_id % 9 = 0 THEN 3 ELSE 1 END) * t.s
               + 3 * t.s + 9 * h.dl * t.n)
         ELSE 0 END
         + CASE WHEN h.doc_id % 5 = 0 THEN
           (1000 * (t.n // dfy.df) * 22 * t.s)
           // (10 * t.s + 3 * t.s + 9 * h.dl * t.n)
         ELSE 0 END)::BIGINT AS score_x1000
      FROM hooked h, tot t, dfx, dfy
      WHERE h.doc_id % 3 = 0 OR h.doc_id % 5 = 0
    ), rk AS (
      SELECT doc, score_x1000,
             row_number() OVER (ORDER BY score_x1000 DESC, doc) AS rank
      FROM sc
    )
    SELECT rank::BIGINT AS rank, doc, score_x1000 FROM rk WHERE rank <= 10
    """,
)
def q_bm25_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval through the engine's own index
    (build_postings → operators.relevance.bm25_query): global top-10
    for the two-term query under the Robertson weighting with length
    normalization, integer-exact (k1/b as exact rationals, avgdl kept
    as the S/N pair, per-term floor at ×1000) so DuckDB re-derives
    every score by pure class arithmetic.  The %9 subset carries tf=3
    (saturation visibly sublinear vs ranked_query's linear tf) and dl
    varies per doc, so the length-normalization term is genuinely
    exercised.  Document lengths never shuffle — the bounded hit set
    is broadcast onto (doc, dl)."""
    from extractor.operators.relevance import (
        bm25_query,
        build_postings,
        doc_lengths,
    )

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 3 == 0, F.lit(" qx")).otherwise(F.lit("")),
            F.when(d % 9 == 0, F.lit(" qx qx")).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit(" qy")).otherwise(F.lit("")),
        ).alias("text"),
    )
    idx = build_postings(docs, max_df=1_000_000)
    return bm25_query(idx, ["qx", "qy"], doc_lengths(docs), k=10)

@register(
    "term_snippets",
    """
    -- independent SQL reimplementation of the KWIC arithmetic over
    -- the same planted tails: %6 docs one mid-tail hit, %35 docs
    -- three hits capped to two, %210 docs both tails in order
    WITH t AS (
      SELECT doc_id,
             lower(text
               || CASE WHEN doc_id % 6 = 0
                       THEN ' ctxa ctxb kwsnip ctxc ctxd' ELSE '' END
               || CASE WHEN doc_id % 35 = 0
                       THEN ' kwsnip x kwsnip y kwsnip' ELSE '' END) AS tx
      FROM documents
    ), w AS (
      SELECT doc_id, string_split(tx, ' ') AS ws FROM t
    ), p AS (
      SELECT doc_id, ws,
             unnest(list_filter(list_transform(generate_series(1, len(ws)),
                      i -> CASE WHEN ws[i] = 'kwsnip' THEN i ELSE 0 END),
                    x -> x > 0)[1:2]) AS ip
      FROM w
    )
    SELECT doc_id AS doc, (ip - 1)::BIGINT AS pos,
           array_to_string(ws[greatest(1, ip - 3):least(len(ws), ip + 3)],
                           ' ') AS snippet
    FROM p
    """,
)
def q_term_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC context snippets (operators.relevance.term_snippets) for
    a planted term: the %6 class puts the hit mid-tail (window spans
    planted and corpus words), the %35 class repeats it three times
    so the max_per_doc=2 cap is on the hook, and the %210 overlap
    carries both tails in order.  The oracle reimplements the
    position/window arithmetic in SQL over the same text — any
    off-by-one in offsets, slicing, or the cap flips rows."""
    from extractor.operators.relevance import term_snippets

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 6 == 0, F.lit(" ctxa ctxb kwsnip ctxc ctxd"))
            .otherwise(F.lit("")),
            F.when(d % 35 == 0, F.lit(" kwsnip x kwsnip y kwsnip"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return term_snippets(docs, "kwsnip", window=3, max_per_doc=2)

@register(
    "anchor_index",
    f"""
    -- anchor-text postings against TARGETS: universal anchor words
    -- ('link', 'word' — inbound on every target) are cut by
    -- max_df=500 exactly like body stopwords; the per-farm numeric
    -- tokens survive with in-degree tfs
    WITH {_BOILER_EDGES_SQL},
    edges AS (
      SELECT '/x/' || (b.doc_id + f.doff) || '/' || i.i AS href,
             'link word ' || i.i AS anchor
      FROM boiler b, farm f,
           LATERAL (SELECT unnest(generate_series(0, f.n - 1)) AS i) i
    ), t AS (
      SELECT ('0x' || substr(md5(href), 1, 15))::BIGINT AS doc,
             unnest(string_split(lower(anchor), ' ')) AS token
      FROM edges
    ), tf AS (
      SELECT token, doc, count(*)::BIGINT AS tf
      FROM t WHERE token <> '' GROUP BY 1, 2
    ), dfs AS (
      SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1
    )
    SELECT tf.token, dfs.df,
           string_agg(doc || ':' || tf, ',' ORDER BY doc) AS postings
    FROM tf JOIN dfs USING (token)
    WHERE dfs.df <= 500
    GROUP BY tf.token, dfs.df
    """,
)
def q_anchor_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound-anchor expansion index
    (operators.relevance.anchor_document_index) over the extracted
    outlink graph: targets become retrievable by what the linking
    pages call them.  The universal anchor words ('link', 'word' —
    present on every inbound edge) hit the max_df cut exactly like
    body stopwords; the numeric per-position tokens survive with
    tf = the target's in-degree at that position.  Target ids are
    the md5-derived hex64 (oracle-mirrorable — never an
    engine-native hash); postings canonicalized to 'doc:tf' strings
    for bit-exact comparison."""
    from extractor.operators.relevance import anchor_document_index

    edges = q_html_outlinks(spark, sf_dir).select("href", "anchor_text")
    idx = anchor_document_index(edges, max_df=500)
    return idx.select(
        "token",
        "df",
        F.array_join(
            F.transform(
                "postings",
                lambda p: F.concat(
                    p["doc"].cast("string"), F.lit(":"), p["tf"].cast("string")
                ),
            ),
            ",",
        ).alias("postings"),
    )
