"""Search-relevance operators over the extracted web corpus: TF-IDF
keyterm extraction and inbound anchor-text profiles.

These are the two classic "what is this page about" signals a web
pipeline derives once the text and link graph exist — TF-IDF from the
page's own words, anchor terms from how OTHER pages label it (the
latter is famously higher-precision for ranking and equally useful as
a training-data topic prior).

Scale shape: both are explode → count aggregates with map-side
partials, then :func:`extractor.operators.topk.grouped_topk` for the
per-key cut — bounded two-level top-k, no per-group windows, so a hot
page with 10^7 inbound anchors costs one bucketed partial-aggregate,
never a single-reducer sort.  TF-IDF's document-frequency table is
vocab-sized and joined on the token equi-key with the strategy left
to Catalyst: under the auto-broadcast threshold it ships as a hash
relation, and once a web-scale vocabulary outgrows driver range the
same plan degrades to a shuffle equi-join — no hint pins a
driver-sized structure.  Corpus text never shuffles — after the
first explode only (token, count) pairs move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from extractor.operators.dedup import words_of
from extractor.operators.topk import grouped_topk_exploded


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by integer-exact TF-IDF:
    ``score = tf * (n_docs div df)`` — term frequency weighted by the
    floored inverse document frequency (monotone in the textbook
    tf·log(N/df); floor-division keeps every compared value an exact
    long so Spark and any oracle agree bit-for-bit).  Ties rank
    alphabetically.  Returns (doc_id, rank, token, score).

    Plan: explode → (doc, token) counts → token-level distinct-doc
    counts (both map-side partial) → one equi-join on token (strategy
    Catalyst's choice, see module docstring) → bounded two-level
    top-k per doc.  The one-row corpus total joins as a broadcast
    nested-loop cross — one row against everything is the degenerate
    case where that join IS the right plan.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words_of(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.select(
        F.countDistinct(id_col).cast("long").alias("n_docs")
    )
    scored = (
        tf.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))  # one row
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.expr("n_docs div df")).cast("long").alias("score"),
        )
    )
    ranked = grouped_topk_exploded(
        scored,
        ["doc_id"],
        F.struct((-F.col("score")).alias("neg"), F.col("token")),
        k,
    )
    return ranked.select(
        "doc_id",
        "rank",
        F.col("value.token").alias("token"),
        (-F.col("value.neg")).cast("long").alias("score"),
    )


def anchor_term_topk(
    outlinks: DataFrame,
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Inbound anchor-text profile per target host: the top-k most
    frequent anchor terms other pages use when linking there —
    (dst_host, rank, term, n).  Terms are lowercased whitespace
    tokens; empty anchors and terms below ``min_count`` are dropped
    (singleton anchor noise dominates raw web anchors).

    Input is :func:`extractor.operators.webgraph.html_outlinks` rows
    (url, seq, href, anchor_text); hrefs resolve to a destination
    host exactly as :func:`host_edges` does (relative → source host).
    Plan: map-only host resolution + term explode, one (host, term)
    count aggregate, bounded top-k per host.
    """
    def host_of(col: str):
        no_scheme = F.expr(f"substring({col}, instr({col}, '://') + 3)")
        return F.lower(F.substring_index(no_scheme, "/", 1))

    src_host = host_of("url")
    dst_host = (
        F.when(F.col("href").contains("://"), host_of("href"))
        .otherwise(src_host)
    )
    terms = (
        outlinks.select(
            dst_host.alias("dst_host"),
            F.explode(words_of(F.lower(F.col("anchor_text")))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = terms.groupBy("dst_host", "term").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).filter(F.col("n") >= min_count)
    ranked = grouped_topk_exploded(
        counts,
        ["dst_host"],
        F.struct((-F.col("n")).alias("neg"), F.col("term")),
        k,
    )
    return ranked.select(
        "dst_host",
        "rank",
        F.col("value.term").alias("term"),
        (-F.col("value.neg")).cast("long").alias("n"),
    )


def anchor_concentration(
    outlinks: DataFrame,
    min_anchors: int = 5,
) -> DataFrame:
    """Exact-anchor concentration per target host — the anchor-text
    face of link spam: organic inbound anchors are diverse, while a
    paid/automated campaign repeats ONE exact phrase, so the share of
    a host's inbound anchors taken by its single most common exact
    anchor separates the two (the anchor-side complement to
    webgraph.host_link_stats' structural signals and trustrank's
    reachability signal).  Returns ``(dst_host, top_anchor, top_n,
    total, n_distinct, concentration_bp)`` for hosts with at least
    ``min_anchors`` inbound anchors.

    Anchor grain is the full trimmed lowercased anchor TEXT (exact
    phrase, not terms — that's anchor_term_topk's axis).  Plan: the
    same map-only host resolution as anchor_term_topk, one
    (host, anchor) count with map-side partials, the k=1 bounded
    grouped_topk for the argmax (constant reduce state on a host with
    10^7 distinct anchors), and totals aggregated from the
    ALREADY-REDUCED count table, not a second pass over the raw
    edges.  Ties break on anchor text, so the report is
    deterministic."""
    from extractor.operators.topk import grouped_topk

    def host_of(col: str):
        no_scheme = F.expr(f"substring({col}, instr({col}, '://') + 3)")
        return F.lower(F.substring_index(no_scheme, "/", 1))

    src_host = host_of("url")
    dst_host = (
        F.when(F.col("href").contains("://"), host_of("href"))
        .otherwise(src_host)
    )
    anchors = outlinks.select(
        dst_host.alias("dst_host"),
        F.trim(F.lower(F.col("anchor_text"))).alias("a"),
    ).filter(F.col("a") != "")
    counts = anchors.groupBy("dst_host", "a").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    top1 = grouped_topk(
        counts, ["dst_host"], F.struct((-F.col("n")).alias("neg"), F.col("a")), k=1
    ).select(
        "dst_host",
        F.col("topk")[0]["a"].alias("top_anchor"),
        (-F.col("topk")[0]["neg"]).cast("long").alias("top_n"),
    )
    totals = counts.groupBy("dst_host").agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    return (
        top1.join(totals, "dst_host")
        .filter(F.col("total") >= min_anchors)
        .select(
            "dst_host",
            "top_anchor",
            "top_n",
            "total",
            "n_distinct",
            F.expr("(10000 * top_n) div total").alias("concentration_bp"),
        )
    )


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100_000,
) -> DataFrame:
    """Inverted-index construction: one row per surviving term with
    its document frequency and the full posting list —
    ``(token, df, postings array<struct<doc:long, tf:long>>)``,
    postings sorted by doc id.  The artifact behind phrase/keyword
    lookup over the corpus (contamination spot-checks, "which
    documents say X" audits) without a full scan per question.

    ``max_df`` is the stopword guard and the reason this survives
    100 TB: a Zipf head term ("the") has a posting for nearly every
    document, and collecting that list would put one
    corpus-sized array on a single reducer.  Terms with
    ``df > max_df`` are dropped BEFORE any list is materialized — the
    df table is computed from the already-reduced (token, doc) rows,
    and the filter rides the df join, so every collected array is
    bounded by ``max_df`` entries.  (Querying a dropped stopword is
    answered by NOT finding it — the same contract every web index
    has.)

    Plan: explode lowercased tokens → (token, doc) tf counts
    (map-side partials) → token df counts over the REDUCED rows →
    inner equi-join tf⋈df with the ``df <= max_df`` cut (strategy
    Catalyst's choice, co-partitioned on token either way) → one
    collect_list per token, sorted.  Corpus text never shuffles;
    after the first explode only (token, ids, counts) move."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc"),
        F.explode(words_of(F.lower(F.col(text_col)))).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token", "doc").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfs = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") <= max_df)
    )
    return (
        tf.join(dfs, "token")
        .groupBy("token", "df")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("doc"), F.col("tf")))
            ).alias("postings")
        )
    )


def conjunctive_query(
    postings: DataFrame,
    terms: list[str],
) -> DataFrame:
    """AND-query over a :func:`build_postings` index: documents that
    contain EVERY term in ``terms`` — ``(doc, min_tf)`` with the
    smallest per-term frequency as the match strength (the classic
    conjunctive-retrieval score floor).

    Plan: filter the index to the |terms| rows (an equi-IN the scan
    pushes down — the index is never read beyond those terms),
    explode their bounded postings, and keep docs hit by all K terms
    via one count aggregate.  Work is O(sum of the K posting lists),
    exactly the textbook merge cost, distributed."""
    if not terms:
        raise ValueError("conjunctive_query needs at least one term")
    k = len(set(terms))
    hits = (
        postings.filter(F.col("token").isin(list(set(terms))))
        .select("token", F.explode("postings").alias("p"))
        .select("token", F.col("p.doc").alias("doc"), F.col("p.tf").alias("tf"))
    )
    return (
        hits.groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min("tf").cast("long").alias("min_tf"),
        )
        .filter(F.col("_n") == k)
        .select("doc", "min_tf")
    )


def merge_postings(
    old: DataFrame,
    new: DataFrame,
    max_df: int = 100_000,
) -> DataFrame:
    """Merge two :func:`build_postings` indexes over DISJOINT document
    sets (the batch discipline upstream: the incremental exact-dedup
    gate ensures a crawl batch only indexes docs the corpus has never
    seen) — the index-maintenance half of the retrieval tier: a new
    crawl indexes ITS OWN documents with build_postings, and the
    corpus index absorbs it here without ever re-tokenizing history.

    The ``max_df`` stopword guard is re-applied at merge time: a term
    rare in each half but common in the union is promoted to stopword
    — exactly how a growing corpus behaves.  Promotion is recorded as
    a TOMBSTONE row ``(token, df, postings=[])`` rather than by
    dropping the row: the accumulated df is the promotion's memory,
    so in a CHAIN of merges a term tombstoned at one tier can never
    reappear with a partial posting list when a later batch carries
    it again (dropping the row loses that memory — the resurfaced
    term would serve only the new batch's postings, silently wrong;
    caught by the seeded model test).  With tombstones the merge is
    associative: any merge order yields the same index for the same
    total corpus.  Query operators are tombstone-transparent (an
    empty posting list explodes to nothing — the same "stopword is
    simply not found" contract as build_postings); filter
    ``size(postings) > 0`` for a serve view that matches one-shot
    build_postings exactly.

    Output schema == build_postings, so merges chain (LSM-style:
    merge crawl indexes pairwise, compact tiers on whatever cadence
    write amplification dictates).

    Scale shape: one union + one token groupBy — per-token reduce
    state is flatten + array_sort over lists each side already
    bounded by its own cut or tombstoned empty, and the merged cut
    keeps every output row ≤ ``max_df`` entries.  Cost is O(index
    size), not O(corpus text): token rows move once, raw text never
    moves."""
    both = old.select("token", "df", "postings").unionAll(
        new.select("token", "df", "postings")
    )
    merged = both.groupBy("token").agg(
        F.sum("df").cast("long").alias("df"),
        F.array_sort(F.flatten(F.collect_list("postings"))).alias("postings"),
    )
    empty = F.array().cast("array<struct<doc:bigint,tf:bigint>>")
    return merged.select(
        "token",
        "df",
        F.when(F.col("df") <= max_df, F.col("postings"))
        .otherwise(empty)
        .alias("postings"),
    )


def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100_000,
) -> DataFrame:
    """Flat positional index rows ``(token, doc, pos, df)`` — the
    disk shape real engines store (a posting per occurrence, with its
    word offset), and what :func:`phrase_query` consumes.  Kept FLAT
    rather than nesting positions into per-token arrays: flat rows
    partition/bucket by token for locality, join on (doc, pos)
    arithmetic directly, and never build a hot token's corpus-sized
    nested array (the same reducer-state argument as
    :func:`build_postings`' max_df guard, which applies here too —
    ``df`` counts DISTINCT docs and terms above ``max_df`` drop).

    Plan: posexplode is map-only; df is one distinct-(token, doc)
    aggregate with map-side partials over (token, long) rows; the cut
    rides the token equi-join back.  Corpus text never shuffles."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc"),
        F.posexplode(words_of(F.lower(F.col(text_col)))).alias("pos", "token"),
    ).filter(F.col("token") != "")
    dfs = (
        toks.select("token", "doc")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") <= max_df)
    )
    return toks.join(dfs, "token").select("token", "doc", "pos", "df")


def phrase_query(
    postings: DataFrame,
    terms: list[str],
) -> DataFrame:
    """Exact phrase retrieval over :func:`positional_postings` rows:
    documents containing ``terms`` as CONSECUTIVE words, with the
    number of phrase starts — ``(doc, n_matches)``.

    The classic positional-index merge, distributed: term i's rows
    are filtered from the index (a pushed-down equality the token
    bucketing serves), positions shift by −i, and K−1 equi-joins on
    the (doc, pos) composite keep exactly the offsets where every
    term lines up.  Inputs are term-posting-sized, shrinking with
    each join; no window, no per-doc state."""
    if not terms:
        raise ValueError("phrase_query needs at least one term")
    acc = (
        postings.filter(F.col("token") == terms[0])
        .select("doc", "pos")
        .distinct()
    )
    for i, t in enumerate(terms[1:], start=1):
        step = (
            postings.filter(F.col("token") == t)
            .select("doc", (F.col("pos") - i).alias("pos"))
            .distinct()
        )
        acc = acc.join(step, ["doc", "pos"])
    return acc.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )


def postings_index_stats(postings: DataFrame) -> DataFrame:
    """Observability over a :func:`build_postings` index: term and
    posting mass per power-of-two document-frequency bucket —
    ``(df_bucket, n_terms, n_postings, max_df)`` where ``df_bucket =
    floor(log2(df))``.  This is the histogram an operator reads to
    retune ``max_df`` before the next :func:`merge_postings` tier
    compaction (the retrieval-tier analog of the incremental dedup
    index's band stats): mass piling into the top buckets means the
    stopword bar is about to start dropping terms queries still need.

    The bucket is computed INTEGER-exactly as the bit length of df
    minus one (base-2 string length — no float log2 whose last-ulp
    rounding could flip a boundary bucket between engines).  Map-side
    projection of (bucket, df) per index row, one aggregate; never
    touches posting arrays or corpus text."""
    bucket = (
        F.length(F.conv(F.col("df").cast("string"), 10, 2)) - 1
    ).cast("long")
    return (
        postings.select(bucket.alias("df_bucket"), "df")
        .groupBy("df_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("n_postings"),
            F.max("df").cast("long").alias("max_df"),
        )
    )


def read_postings_index(
    spark,
    index_dir: str,
    max_df: int = 100_000,
) -> DataFrame:
    """Serve-time fold of an APPENDED postings index (per-batch
    :func:`build_postings` snapshots written by the streaming bridge
    or any batch orchestrator): returns exactly the
    :func:`build_postings` schema over everything indexed, with the
    global ``max_df`` stopword cut applied at read time.

    At-least-once safe by construction: a crash-replayed batch
    appends byte-identical (token, doc, tf) entries, and the fold's
    (token, doc) aggregate collapses them — the same repair
    discipline as the dedup index's ``compact_index`` (dedupe on the
    natural key while folding), so no commit-window bookkeeping is
    needed on the write side.

    Scale shape: explode is O(index entries), the (token, doc) and
    df aggregates run with map-side partials and hash state (never a
    hot term's array), and only cut survivors reach the bounded
    collect.  Corpus text is never re-read — indexes fold from index
    rows alone.  Run it once per serving epoch and snapshot the
    result if reads dominate (that IS tier compaction)."""
    from extractor.writer import read_extracted

    entries = (
        read_extracted(spark, index_dir)
        .select("token", F.explode("postings").alias("p"))
        # replayed entries are identical → max == the one true tf
        .groupBy("token", F.col("p.doc").alias("doc"))
        .agg(F.max("p.tf").cast("long").alias("tf"))
    )
    dfs = (
        entries.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") <= max_df)
    )
    return (
        entries.join(dfs, "token")
        .groupBy("token", "df")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("doc"), F.col("tf")))
            ).alias("postings")
        )
    )


def ranked_query(
    postings: DataFrame,
    terms: list[str],
    n_docs: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Disjunctive ranked retrieval over a :func:`build_postings`
    index — the third leg of the minimal search surface beside
    :func:`conjunctive_query` (boolean AND) and :func:`phrase_query`
    (exact phrase): documents scored by
    ``Σ_terms tf · (N div df)`` (the same integer-exact floored-IDF
    weight :func:`tfidf_topk` ranks with — monotone in the textbook
    tf·log(N/df), bit-exact against any SQL oracle) and cut to the
    global top-``k``.  Returns (rank, doc, score), ties broken by
    doc id, so results are deterministic.

    ``n_docs`` is a one-row (n_docs) DataFrame — the corpus total
    rides a broadcast nested-loop cross, the degenerate case where
    BNLJ is the right plan (same note as tfidf_topk).

    Plan: the index filters to the |terms| rows (pushed-down IN),
    bounded postings explode, one doc-sum aggregate with map-side
    partials, then the bounded two-level global top-k — no
    single-reducer ORDER BY, no window."""
    from extractor.operators.topk import grouped_topk_exploded

    if not terms:
        raise ValueError("ranked_query needs at least one term")
    hits = (
        postings.filter(F.col("token").isin(list(set(terms))))
        .select("token", "df", F.explode("postings").alias("p"))
        .crossJoin(F.broadcast(n_docs))  # one row
        .select(
            F.col("p.doc").alias("doc"),
            (F.col("p.tf") * F.expr("n_docs div df")).cast("long").alias("s"),
        )
    )
    scored = hits.groupBy("doc").agg(F.sum("s").cast("long").alias("score"))
    ranked = grouped_topk_exploded(
        scored.select(
            F.struct((-F.col("score")).alias("neg"), "doc").alias("key")
        ),
        [],
        F.col("key"),
        k=k,
    )
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        F.col("value")["doc"].alias("doc"),
        (-F.col("value")["neg"]).cast("long").alias("score"),
    )


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, dl) — token count per document under the SAME
    tokenization as :func:`build_postings` (lowercase, split on
    space, empty tokens dropped), so BM25 length normalization and
    the index agree on what a token is.  Map-only."""
    toks = F.filter(
        words_of(F.lower(F.col(text_col))), lambda t: t != ""
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc"),
        F.size(toks).cast("long").alias("dl"),
    )


def bm25_query(
    postings: DataFrame,
    terms: list[str],
    doc_lens: DataFrame,
    k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval over a :func:`build_postings` index
    (Robertson/Spärck Jones probabilistic weighting — the default
    ranking function of every production text index), made
    INTEGER-EXACT so the result is bit-identical in any SQL engine:
    with k1 = 6/5 and b = 3/4 as exact rationals and
    ``avgdl = S/N`` kept as the integer pair (S = total tokens,
    N = docs), the per-term score

        idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    clears denominators to

        score_x1000 = (1000 · idf · 22 · tf · S)
                      // (10·tf·S + 3·S + 9·dl·N)

    with ``idf = N div df`` (the same integer-floored IDF the rest of
    the retrieval tier ranks with).  Per-term floor, then summed;
    ties broken by doc id.  Returns (rank, doc, score_x1000).

    Exact-arithmetic envelope: the numerator is bounded by
    1000·idf·22·tf·S — exact in int64 while the index shard holds
    ≲10^10 total tokens; a 100 TB deployment partitions the index (or
    rescales dl/avgdl to fixed point) before this overflows, and the
    formula is unchanged per shard.

    Plan: |terms| index rows (pushed-down IN) → bounded postings
    explode → the BOUNDED hit set (≤ Σ df ≤ |terms|·max_df rows) is
    broadcast onto the corpus-sized (doc, dl) table, so document
    lengths never shuffle; one doc-sum aggregate with map-side
    partials, then the bounded two-level global top-k."""
    from extractor.operators.topk import grouped_topk_exploded

    if not terms:
        raise ValueError("bm25_query needs at least one term")
    totals = doc_lens.agg(
        F.sum("dl").cast("long").alias("s_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    hits = (
        postings.filter(F.col("token").isin(list(set(terms))))
        .select("df", F.explode("postings").alias("p"))
        .select(F.col("p.doc").alias("doc"), F.col("p.tf").alias("tf"), "df")
    )
    scored = (
        doc_lens.join(F.broadcast(hits), "doc")
        .crossJoin(F.broadcast(totals))  # one row
        .select(
            "doc",
            (
                F.lit(1000)
                * F.expr("n_docs div df")
                * F.lit(22)
                * F.col("tf")
                * F.col("s_tokens")
            ).alias("num"),
            (
                F.lit(10) * F.col("tf") * F.col("s_tokens")
                + F.lit(3) * F.col("s_tokens")
                + F.lit(9) * F.col("dl") * F.col("n_docs")
            ).alias("den"),
        )
        # `div`, not `/`: long/long rides a double (exact only to
        # 2^53); integer div keeps the full int64 envelope.
        .select("doc", F.expr("num div den").alias("s"))
        .groupBy("doc")
        .agg(F.sum("s").cast("long").alias("score_x1000"))
    )
    ranked = grouped_topk_exploded(
        scored.select(
            F.struct((-F.col("score_x1000")).alias("neg"), "doc").alias("key")
        ),
        [],
        F.col("key"),
        k=k,
    )
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        F.col("value")["doc"].alias("doc"),
        (-F.col("value")["neg"]).cast("long").alias("score_x1000"),
    )


def term_snippets(
    docs: DataFrame,
    term: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    max_per_doc: int = 2,
) -> DataFrame:
    """KWIC (keyword-in-context) snippets: for every occurrence of
    ``term`` (case-folded, whole-word), the surrounding ``window``
    words on each side — ``(doc, pos, snippet)`` with the 0-based
    word offset.  The audit surface that pairs with retrieval: the
    index says WHICH documents, this shows analysts the hits in
    context without shipping whole documents.

    ``max_per_doc`` caps output per document (positions array sliced
    BEFORE snippets materialize), so a pathological page repeating
    the term 10^6 times emits two rows, not a row explosion.

    Map-only: the word array is a materialized projection (the HOF
    re-evaluation trap), positions/slices/joins are all codegen
    array expressions; zero Exchange — at 10^12 docs this runs at
    scan speed, and the usual deployment filters docs by the index
    first so the scan side is hits-only."""
    w = int(window)
    ws = docs.select(
        F.col(id_col).cast("long").alias("doc"),
        F.split(F.lower(F.col(text_col)), " ").alias("ws"),
    )
    pos = F.slice(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 1),
                lambda i: F.when(
                    F.get("ws", i) == F.lit(term.lower()), i
                ).otherwise(F.lit(-1)),
            ),
            lambda x: x >= 0,
        ),
        1,
        max_per_doc,
    )
    hit = ws.select("doc", "ws", F.explode(pos).alias("pos"))
    start = F.greatest(F.lit(1), F.col("pos") + 1 - w)
    end = F.least(F.size("ws"), F.col("pos") + 1 + w)
    return hit.select(
        "doc",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice("ws", start, end - start + 1), " ").alias("snippet"),
    )


def collocations_topk(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
    scale: int = 10**6,
):
    """Corpus-wide top-k collocations by integer Dice score
    ``2·count(w1,w2)·scale div (count(w1) + count(w2))`` — the
    association measure behind phrase induction (word2vec-style
    phrase merging ranks candidate bigrams by exactly this family of
    count scores) and the "what multi-word terms does this corpus
    contain" report an operator reads before tokenizer training.

    Dice over PMI, deliberately: PMI's ``cb·N/(c1·c2)`` carries an
    N·cb product that overflows 64-bit integers on a web-scale token
    count, and its max-score-for-hapax pathology needs patching
    anyway; Dice is scale-free (no N), bounded (≤ scale), integer-
    exact with every intermediate ≤ 2·scale·N < 2^63, and the
    ``min_count`` cut is the standard noise floor.

    Scale shape: one bigram-count shuffle with map-side partials (the
    same (token, token, long) rows as bigram_surprisal — the corpus
    tokenizes once), unigram counts join onto the ALREADY-REDUCED
    bigram vocabulary (never back to the corpus), and the global
    top-k is the bounded two-level grouped_topk with an empty group
    list — per-bucket state ≤ B·k, no single-reducer ORDER BY.
    Deterministic tie-break on (w1, w2).

    Returns (rank, w1, w2, n_pair, n_w1, n_w2, dice_x1e6)."""
    from pyspark.sql import functions as F

    from extractor.operators.dedup import words_of
    from extractor.operators.topk import grouped_topk_exploded

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t_"))
    ws = words_of(F.col("t_"))
    pairs = F.when(
        F.size(ws) >= 2,
        F.zip_with(
            F.slice(ws, 1, F.size(ws) - 1),
            F.slice(ws, 2, F.size(ws) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bgs = src.select(F.explode(pairs).alias("b")).select(
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    toks = src.select(F.explode(words_of(F.col("t_"))).alias("t"))
    cb = (
        bgs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    c = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        cb.join(c.select(F.col("t").alias("w1"), F.col("c").alias("n_w1")), "w1")
        .join(c.select(F.col("t").alias("w2"), F.col("c").alias("n_w2")), "w2")
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.expr(f"2 * n_pair * {scale} div (n_w1 + n_w2)").alias("dice_x1e6"),
        )
    )
    ranked = grouped_topk_exploded(
        scored,
        [],
        F.struct(
            (-F.col("dice_x1e6")).alias("nd"),
            F.col("w1"),
            F.col("w2"),
            F.col("dice_x1e6"),
            F.col("n_pair"),
            F.col("n_w1"),
            F.col("n_w2"),
        ),
        k,
    )
    return ranked.select(
        "rank",
        F.col("value.w1").alias("w1"),
        F.col("value.w2").alias("w2"),
        F.col("value.n_pair").alias("n_pair"),
        F.col("value.n_w1").alias("n_w1"),
        F.col("value.n_w2").alias("n_w2"),
        F.col("value.dice_x1e6").alias("dice_x1e6"),
    )


def anchor_document_index(
    edges,
    target_col: str = "href",
    anchor_col: str = "anchor_text",
    max_df: int = 100_000,
):
    """Inbound-anchor document expansion (the classic web-IR trick:
    what OTHERS call a page is often its best description — anchor
    text retrieves pages whose own body never says the words):
    every inbound anchor's tokens index against the TARGET, so a
    ranked/conjunctive query over this index finds pages by
    reputation.  Target doc ids are ``hex64(md5(target))`` — the
    tier's oracle-mirrorable id, not an engine-native hash.

    Builds directly on :func:`build_postings`; multiple anchor rows
    per target are exactly the tf semantics wanted (each inbound
    anchor occurrence is one endorsement of its tokens).  The
    ``max_df`` cut drops universal anchor words ('click', 'here',
    'link') the same way body indexing drops stopwords.  Scale shape
    inherited: only (token, id, count) rows move after the explode;
    anchor text never re-shuffles."""
    from pyspark.sql import functions as F

    from extractor.operators.dedup import hex64

    docs = edges.select(
        hex64(F.col(target_col)).alias("doc_id"),
        F.col(anchor_col).alias("text"),
    )
    return build_postings(docs, max_df=max_df)
