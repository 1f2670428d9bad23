"""Text-analysis operators: language-ID, quality, tokens, fingerprint.

All expression-only (JVM codegen; no Python).  Integer-scaled outputs
where a float would be reduction-order sensitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from extractor.operators.dedup import MOD, hex64, words_of

# Stopword profiles (public-knowledge n-gram/stopword LID heuristic à
# la langid/cld2 feature sets, reduced to the corpus languages).
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "mit", "nicht"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "for"],
    "es": ["el", "la", "los", "y", "que", "para", "en"],
    "fr": ["le", "les", "des", "et", "une", "est", "dans"],
    "zh": ["de5", "shi4", "le5", "zai4"],  # romanized placeholders
}

# BPE-ish token pattern: letter runs | digit runs | single punctuation.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def lang_scores(text: Column) -> dict[str, Column]:
    w = words_of(text)
    return {
        lang: F.size(F.filter(w, lambda t: t.isin(*sw)))
        for lang, sw in STOPWORDS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax(score) with deterministic tie-break (lang asc): sort an
    array of (−score, lang) structs and take the head — the same
    construction an ORDER BY gives the SQL oracle."""
    scores = lang_scores(text)
    entries = [
        F.struct((-s).cast("int").alias("s"), F.lit(lang).alias("l"))
        for lang, s in sorted(scores.items())
    ]
    return F.array_sort(F.array(*entries)).getItem(0).getField("l")


def token_stats(text: Column) -> dict[str, Column]:
    w = words_of(text)
    return {
        "ws_tokens": F.size(w),
        "re_tokens": F.regexp_count(text, F.lit(TOKEN_RE)),
        "n_chars": F.length(text),
        "distinct_tokens": F.size(F.array_distinct(w)),
    }


def quality_score(text: Column) -> dict[str, Column]:
    """Integer-scaled quality features (type-token ratio, mean token
    length) and a composite score — heuristics in the Gopher/C4
    quality-filter family, integer-exact for oracle parity."""
    w = words_of(text)
    n = F.size(w)
    distinct = F.size(F.array_distinct(w))
    total_len = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    ttr_x10000 = F.floor((distinct * 10000) / n).cast("long")
    mean_len_x100 = F.floor((total_len * 100) / n).cast("long")
    score = (
        F.floor(ttr_x10000 / 4) + F.floor(F.least(mean_len_x100, F.lit(1000)) / 2)
    ).cast("long")
    return {
        "n_tokens": n.cast("long"),
        "ttr_x10000": ttr_x10000,
        "mean_token_len_x100": mean_len_x100,
        "quality": score,
    }


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling polynomial hash of the token stream
    (Rabin-Karp family) mod 1e9+7 — the whole-document fingerprint
    variant of winnowing (Schleimer et al. 2003)."""
    hs = F.transform(words_of(text), lambda t: hex64(t) % 1000)
    return F.aggregate(
        hs, F.lit(0).cast("long"), lambda acc, h: (acc * 131 + h) % F.lit(MOD)
    )


# The repetition-and-symbol heuristics of Rae et al. 2021 (Gopher,
# Appendix A1.1), the standard pre-filter a Common-Crawl text corpus
# runs before dedup.  Thresholds are the published ones.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    stopwords: list[str] | None = None,
    min_stop_hits: int = 2,
) -> dict[str, Column]:
    """Gopher quality-rule features + composite keep decision, all
    integer-scaled (basis points / x100) so the DuckDB oracle matches
    bit-for-bit regardless of reduction order.

    Rules (Rae et al. 2021 A1.1): word count in [min_words,
    max_words]; mean word length in [3, 10]; symbol-word ratio
    ('#' or '...') <= 10%; >=80% of words contain an alphabetic
    char; <90% of lines bullet-led; <=30% of lines ellipsis-ended;
    >= ``min_stop_hits`` of the ``stopwords`` list present.  The
    published stopword rule is ENGLISH-ONLY (the 8 canonical words,
    the default); a multilingual corpus passes its own per-language
    profiles or the union — the same adaptation every non-English
    Gopher descendant makes.  Expression-only (one pass of codegen'd
    HOFs over the split arrays; no shuffle, no Python)."""
    if stopwords is None:
        stopwords = GOPHER_STOPWORDS
    w = F.split(text, "[ \n]+")
    n = F.size(w)
    n_safe = F.greatest(n, F.lit(1))
    total_len = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_len_x100 = F.floor((total_len * 100) / n_safe).cast("long")
    n_symbol = F.size(
        F.filter(w, lambda t: t.contains("#") | t.contains("..."))
    )
    symbol_bp = F.floor((n_symbol * 10000) / n_safe).cast("long")
    n_alpha = F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]")))
    alpha_bp = F.floor((n_alpha * 10000) / n_safe).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ") | l.startswith("* ") | l.startswith("•"),
        )
    )
    bullet_bp = F.floor((n_bullet * 10000) / n_lines).cast("long")
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("...")))
    ellipsis_bp = F.floor((n_ellipsis * 10000) / n_lines).cast("long")
    stop_hits = F.size(
        F.array_intersect(w, F.array(*[F.lit(s) for s in stopwords]))
    ).cast("long")
    keep = (
        n.between(min_words, max_words)
        & mean_len_x100.between(300, 1000)
        & (symbol_bp <= 1000)
        & (alpha_bp >= 8000)
        & (bullet_bp < 9000)
        & (ellipsis_bp <= 3000)
        & (stop_hits >= min_stop_hits)
    )
    return {
        "n_words": n.cast("long"),
        "mean_word_len_x100": mean_len_x100,
        "symbol_ratio_bp": symbol_bp,
        "alpha_ratio_bp": alpha_bp,
        "bullet_lines_bp": bullet_bp,
        "ellipsis_lines_bp": ellipsis_bp,
        "stopword_hits": stop_hits,
        "keep": keep,
    }


# The C4 "bad words" rule matches against the public LDNOOBW list
# ("List of Dirty, Naughty, Obscene..."); shipping the full list is
# noise here — this abbreviated head proves the rule shape, and a
# deployment passes the full list through the `badwords` argument.
C4_BADWORDS = ["fuck", "shit", "porn", "xxx", "nsfw"]

C4_TERMINAL_RE = '[.!?"]$'


def c4_rules(
    text: Column,
    badwords: list[str] | None = None,
    min_sentences: int = 3,
    min_line_words: int = 5,
) -> dict[str, Column]:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) — the other
    canonical public filter set beside Gopher, and the only one that
    is line-LEVEL: lines survive only if they hold ≥ ``min_line_words``
    words, end in terminal punctuation (``. ! ? "``), and do not
    mention "javascript"; pages drop if the surviving text has fewer
    than ``min_sentences`` sentences, contains any bad word, the
    string "lorem ipsum", or a ``{`` (code leakage).  Returns the
    feature columns plus ``clean_text`` (the line-filtered page — C4
    is a TRANSFORM, not just a verdict) and the composite ``keep``.

    Sentence count is the terminal-punctuation character count of the
    surviving text — deterministic and integer, the same monotone
    proxy C4's sentence splitter thresholds at 3.

    Expression-only: one pass of codegen'd HOFs over the line/word
    arrays; no shuffle, no Python — at 100 TB this is a free predicate
    on the scan, exactly like :func:`gopher_rules`."""
    if badwords is None:
        badwords = C4_BADWORDS
    lines = F.split(text, "\n")
    kept_lines = F.filter(
        lines,
        lambda l: (
            F.size(F.filter(F.split(l, " "), lambda t: t != ""))
            >= min_line_words
        )
        & l.rlike(C4_TERMINAL_RE)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept_lines, "\n")
    n_sentences = F.length(F.regexp_replace(clean, '[^.!?]', ""))
    words = F.split(F.lower(text), "[ \n]+")
    has_badword = (
        F.size(F.array_intersect(words, F.array(*[F.lit(b) for b in badwords])))
        > 0
    )
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    keep = (
        (n_sentences >= min_sentences)
        & (F.size(kept_lines) > 0)
        & ~has_badword
        & ~has_lorem
        & ~has_brace
    )
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept_lines).cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "has_badword": has_badword,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "clean_text": clean,
        "keep": keep,
    }


def unigram_surprisal(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """Integer-exact unigram fluency scoring — the engine shape of
    CCNet's LM-perplexity quality filter (Wenzek et al. 2020 §4.2)
    without an external language model: per-token surprisal is the
    inverse unigram probability ``N_total div count(token)`` (rare
    tokens are surprising, floor division keeps every compared value
    an integer), per-document score is the floored mean.  Fluent text
    built from common tokens scores low; rare-token gibberish scores
    high — the same monotone ordering a real LM filter thresholds on,
    and a production deployment swaps the broadcast count table for
    real LM logprobs without touching the plan.

    Scale shape: one explode → token-count aggregate (map-side
    partials, the only corpus-wide shuffle), the corpus total folded
    in as a one-row broadcast, then an equi-join of the exploded
    tokens against the count table and a per-doc sum — counts move
    (token, long) pairs, never text.  Returns (doc_id, n_words,
    surprisal_sum, mean_surprisal)."""
    from pyspark.sql import functions as F

    from extractor.operators.dedup import words_of

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words_of(F.col(text_col))).alias("t"),
    )
    cnt = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    return (
        toks.join(cnt, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.expr("n div c")).cast("long").alias("surprisal_sum"),
        )
        .select(
            "doc_id",
            "n_words",
            "surprisal_sum",
            F.expr("surprisal_sum div n_words").cast("long").alias("mean_surprisal"),
        )
    )


def quality_buckets(
    scored,
    lang_col: str = "lang",
    score_col: str = "mean_surprisal",
):
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): per
    language, rank documents by quality score (low surprisal = fluent
    = head) and cut the corpus into terciles.  Downstream mixtures
    sample head-heavy; the tail is where boilerplate and gibberish
    concentrate.

    Scale shape — the ranking never touches the corpus: terciles are
    derived from a (lang, score) HISTOGRAM (integer scores, so the
    histogram is |lang| x |distinct scores| — thousands of rows at
    100 TB, not billions).  The only window runs over that aggregated
    histogram, the threshold table is |lang| rows and broadcasts back,
    bucket assignment is one CASE expression.  Tie policy: equal
    scores land in the same bucket (cumulative-count boundary),
    deterministic where ntile's row-split on ties is not.

    Integer-exact boundaries: score s is head iff cum(s)*3 >= n (i.e.
    the cumulative count through s reaches a third of the language's
    docs), middle iff cum(s)*3 >= 2n fails the head test — no float
    percentile, no ceil."""
    from pyspark.sql import Window, functions as F

    hist = scored.groupBy(lang_col, score_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(lang_col).orderBy(score_col)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = hist.groupBy(lang_col).agg(F.sum("c").alias("n"))
    thr = (
        cum.join(n, lang_col)
        .groupBy(lang_col)
        .agg(
            F.min(
                F.when(F.col("cum") * 3 >= F.col("n"), F.col(score_col))
            ).alias("t_head"),
            F.min(
                F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col(score_col))
            ).alias("t_mid"),
        )
    )
    return scored.join(F.broadcast(thr), lang_col).select(
        *scored.columns,
        F.when(F.col(score_col) <= F.col("t_head"), F.lit("head"))
        .when(F.col(score_col) <= F.col("t_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def bigram_surprisal(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """Integer-exact CONDITIONAL bigram fluency scoring — one model
    order up from :func:`unigram_surprisal`, the same engine shape as
    CCNet's LM-perplexity filter (Wenzek et al. 2020 §4.2): per-pair
    surprisal is the inverse conditional probability
    ``count_prefix(w1) div count(w1, w2)`` (how unexpected w2 is AFTER
    w1 — floor division keeps every compared value an integer), and
    the per-document score is the floored mean over its bigrams.
    Unigram scoring cannot see scrambled word ORDER (a bag-of-words
    permutation scores identically); conditional bigrams do — shuffled
    text lands on rare transitions and scores high, which is exactly
    the gibberish/boilerplate axis the quality cut thresholds on.

    Scale shape: one explode to (w1, w2) pairs → bigram-count
    aggregate (map-side partials — the only corpus-wide shuffle; rows
    are (token, token, long), never text).  Prefix counts DERIVE from
    the bigram counts (``groupBy(w1).sum`` over the already-reduced
    vocabulary-sized table — occurrences of w1 as a non-final token),
    so no second pass over the corpus.  Per-bigram surprisal is
    computed once per bigram TYPE on the count table, then one
    equi-join back to the exploded pairs and a per-doc sum.  Documents
    with fewer than two tokens have no bigram and contribute no row
    (stated contract, mirrored by the oracle).

    Returns (doc_id, n_bigrams, surprisal_sum, mean_surprisal)."""
    from pyspark.sql import functions as F

    from extractor.operators.dedup import words_of

    ws = words_of(F.col(text_col))
    pairs = F.when(
        F.size(ws) >= 2,
        F.zip_with(
            F.slice(ws, 1, F.size(ws) - 1),
            F.slice(ws, 2, F.size(ws) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bgs = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("b")
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    cb = bgs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        cb.join(
            cb.groupBy("w1").agg(F.sum("cb").alias("cp")), "w1"
        ).select("w1", "w2", F.expr("cp div cb").alias("s"))
    )
    return (
        bgs.join(scored, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("s").cast("long").alias("surprisal_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "surprisal_sum",
            F.expr("surprisal_sum div n_bigrams").cast("long").alias(
                "mean_surprisal"
            ),
        )
    )


def grouped_quantiles(
    df,
    group_col: str = "lang",
    value_col: str = "n_chars",
    quantiles_bp: tuple = (2500, 5000, 7500, 9500),
):
    """Integer-exact grouped quantiles — the corpus length/size
    profile read before fixing context budgets, chunk sizes or
    truncation rules.  Quantile q (in basis points) of a group is the
    SMALLEST value v whose cumulative count reaches q·n/10000 —
    type-7-free, tie-stable, identical in any engine (no float
    interpolation, no percentile_approx sketch variance).

    Scale shape (quality_buckets' histogram trick generalized): the
    corpus reduces to a (group, value) HISTOGRAM first — integer
    values, so |groups|·|distinct values| rows, thousands at 100 TB —
    and the only window runs over that aggregated table partitioned
    by group; thresholds come from one conditional-min aggregate.
    The corpus itself shuffles once, into the histogram's map-side
    partial counts.

    Returns one row per group: (group, n_docs, q<bp> per requested
    quantile, min_v, max_v)."""
    from pyspark.sql import Window, functions as F

    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(value_col)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = hist.groupBy(group_col).agg(F.sum("c").alias("n"))
    aggs = [F.sum("c").cast("long").alias("n_docs")]
    for bp in quantiles_bp:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 10000 >= F.lit(bp) * F.col("n"),
                    F.col(value_col),
                )
            ).cast("long").alias(f"q{bp}")
        )
    aggs.append(F.min(value_col).cast("long").alias("min_v"))
    aggs.append(F.max(value_col).cast("long").alias("max_v"))
    return cum.join(n, group_col).groupBy(group_col).agg(*aggs)


def grouped_percentiles(
    df,
    group_col: str = "lang",
    value_col: str = "mean_surprisal",
):
    """Percentile-normalize a score within its group:
    ``percentile_bp = 10000 · |{v' ≤ v}| div n`` — the cross-group
    comparability layer quality mixing needs (a 'good' surprisal in a
    high-resource language is a different raw number than in a
    low-resource one; percentiles put every language on one axis,
    CCNet's tercile split at basis-point resolution).

    Integer-exact and tie-stable: equal scores share a percentile
    (the cumulative count through the value), no ntile row-splitting,
    no float cume_dist.  Scale shape: the corpus reduces to a
    (group, value) histogram; the only window runs over that
    aggregated table; the per-row assignment is one equi-join back on
    (group, value) — histogram-sized build side, Catalyst picks the
    strategy.  Returns the input columns + ``percentile_bp``."""
    from pyspark.sql import Window, functions as F

    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(value_col)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = hist.groupBy(group_col).agg(F.sum("c").alias("n"))
    pct = cum.join(n, group_col).select(
        group_col,
        value_col,
        F.expr("cum * 10000 div n").cast("long").alias("percentile_bp"),
    )
    return df.join(pct, [group_col, value_col])


def segment_lang_mix(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_words: int = 30,
):
    """Within-document language mixing: split each document into
    fixed word-count segments, language-ID each segment with the same
    stopword profiles as the document-level :func:`predict_lang`, and
    report the mix — mixed-language documents (machine-translated
    spam, code-switched boilerplate, scraped multilingual nav chrome)
    score as one language at document grain and poison monolingual
    corpora; the segment view catches them.

    Returns (doc_id, n_segments, n_switches, top_lang, top_share_bp,
    second_lang, second_share_bp) — second_* NULL for single-language
    docs; n_switches counts adjacent segment pairs whose labels
    differ (document order).

    Scale shape: segments explode to (doc, idx, text) rows (the one
    pass that touches text — segment LID is the same codegen'd
    expression family as lang_id), then ONE groupBy(doc) rebuilds the
    ordered label array and every statistic (switches, per-language
    counts, top-2) is array arithmetic over ≤ n_segments elements —
    no second shuffle, no window."""
    from pyspark.sql import functions as F

    from extractor.operators.dedup import words_of

    S = segment_words
    base = docs.select(
        F.col(id_col).alias("doc_id"), words_of(F.col(text_col)).alias("ws")
    )
    n_seg = F.expr(f"(size(ws) + {S} - 1) div {S}")
    segs = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.array_join(F.slice(F.col("ws"), i * S + 1, S), " "),
            )
        ).alias("i", "seg"),
    )
    sl = segs.select("doc_id", "i", predict_lang(F.col("seg")).alias("lang"))
    per = sl.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "lang"))),
            lambda x: x["lang"],
        ).alias("langs")
    )
    langs = F.col("langs")
    n = F.size(langs)
    switches = F.size(
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda j: F.element_at(langs, j + 1) != F.element_at(langs, j),
        )
    )
    ranked = F.array_sort(
        F.transform(
            F.array_distinct(langs),
            lambda l: F.struct(
                (-F.size(F.filter(langs, lambda x: x == l))).alias("negc"),
                l.alias("l"),
            ),
        )
    )
    stats = per.select("doc_id", "langs", ranked.alias("rk"))
    return stats.select(
        "doc_id",
        n.cast("long").alias("n_segments"),
        F.when(n >= 2, switches).otherwise(F.lit(0)).cast("long").alias(
            "n_switches"
        ),
        F.expr("element_at(rk, 1).l").alias("top_lang"),
        F.expr("(-element_at(rk, 1).negc) * 10000 div size(langs)")
        .cast("long")
        .alias("top_share_bp"),
        F.expr("try_element_at(rk, 2).l").alias("second_lang"),
        F.expr("(-try_element_at(rk, 2).negc) * 10000 div size(langs)")
        .cast("long")
        .alias("second_share_bp"),
    )


def vocab_coverage(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    vocab_k: int = 20,
):
    """Vocabulary coverage per language: build the corpus-wide top-K
    token vocabulary (count desc, token asc ties — the deterministic
    cut a frequency-built tokenizer vocabulary makes), then measure
    what fraction of each language's token OCCURRENCES fall outside
    it — the OOV rate that decides vocabulary size and byte-fallback
    policy before tokenizer training, per language because coverage
    skews are exactly how low-resource languages get silently
    over-segmented.

    Scale shape: the corpus tokenizes once into (lang, token) counts
    (map-side partials — the only corpus-wide shuffle); the global
    vocabulary comes from the token-marginal counts via the bounded
    two-level top-k (empty group list, no single-reducer ORDER BY);
    the coverage rollup joins the REDUCED per-language count table
    against the K-sized vocabulary — never the corpus.  Returns
    (lang, n_tokens, oov_tokens, oov_bp)."""
    from pyspark.sql import functions as F

    from extractor.operators.dedup import words_of
    from extractor.operators.topk import grouped_topk_exploded

    counts = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(words_of(F.col(text_col))).alias("t"),
        )
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # vocab build + coverage reuse
    )
    marginal = counts.groupBy("t").agg(F.sum("c").alias("tc"))
    vocab = grouped_topk_exploded(
        marginal,
        [],
        F.struct((-F.col("tc")).alias("nc"), F.col("t")),
        vocab_k,
    ).select(F.col("value.t").alias("t"), F.lit(True).alias("_in_vocab"))
    return (
        counts.join(F.broadcast(vocab), "t", "left")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
        )
        .select(
            "lang",
            "n_tokens",
            "oov_tokens",
            F.expr("oov_tokens * 10000 div n_tokens").cast("long").alias(
                "oov_bp"
            ),
        )
    )


def surprisal_transfer(
    ref,
    crawl,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Train/apply split of the LM quality filter — the part of CCNet
    (Wenzek et al. 2020 §4.2) :func:`unigram_surprisal` elides: the
    language model is fit on a TRUSTED REFERENCE corpus (Wikipedia in
    CCNet) and applied to the crawl, so crawl pathologies cannot
    launder themselves into the model that judges them.  The count
    table comes from ``ref`` only; crawl tokens missing from it are
    out-of-vocabulary and charged the hapax cost ``N_ref`` (count 1 —
    the Laplace floor), with the per-doc OOV count reported so a
    threshold can treat "fluent but foreign vocabulary" differently
    from "gibberish".  Integer-exact throughout (floor division), so
    the oracle can restate the whole chain.

    Scale shape: the model build shuffles (token, count) pairs from
    the reference ONLY (at CCNet scale the reference is ~10^-3 of the
    crawl); scoring is one equi-join of exploded crawl tokens against
    the count table (broadcastable: |vocab| rows) + one per-doc
    aggregate.  Crawl text bytes never ride a shuffle.

    Returns (doc_id, n_words, n_oov, surprisal_sum, mean_surprisal)
    for every crawl doc."""
    from pyspark.sql import functions as F

    from extractor.operators.dedup import words_of

    ref_toks = ref.select(F.explode(words_of(F.col(text_col))).alias("t"))
    cnt = ref_toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    crawl_toks = crawl.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words_of(F.col(text_col))).alias("t"),
    )
    return (
        crawl_toks.join(cnt, "t", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.expr("n div coalesce(c, 1L)")).cast("long").alias("surprisal_sum"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_oov",
            "surprisal_sum",
            F.expr("surprisal_sum div n_words").cast("long").alias("mean_surprisal"),
        )
    )


def markdown_outline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Structure statistics of extracted MARKDOWN — the document-shape
    quality axis the word-level Gopher/C4 rules cannot see: a page
    that extracted to one unbroken wall of text and a listicle that
    extracted to 40 one-line sections both pass length filters, but
    their heading profiles differ sharply.  Operates on the engine's
    own output format (`html_to_markdown` emits ATX headings), so
    this is quality control OF the flagship extraction, not of raw
    text.

    Per doc: ``n_headings`` (ATX ``#``–``######`` lines),
    ``max_depth`` (deepest level present, 0 when unstructured),
    ``n_h1``, ``n_lines``, and ``body_lines`` (non-heading,
    non-blank) — the inputs to a structure-aware corpus cut.

    Expression-only: one line split + one filtered depth map per
    row, scalar reductions over the per-row array — map-only, no
    shuffle, no Python."""
    lines = F.split(F.col(text_col), "\n")
    depths = F.transform(
        F.filter(lines, lambda l: l.rlike(r"^#{1,6} ")),
        lambda l: F.length(F.regexp_extract(l, r"^(#+)", 1)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(depths).cast("long").alias("n_headings"),
        F.coalesce(F.array_max(depths), F.lit(0)).cast("long").alias("max_depth"),
        F.size(F.filter(depths, lambda d: d == 1)).cast("long").alias("n_h1"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda l: (~l.rlike(r"^#{1,6} ")) & (F.length(F.trim(l)) > 0),
            )
        ).cast("long").alias("body_lines"),
    )
