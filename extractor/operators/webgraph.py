"""Web-graph operators: outlink extraction and PageRank.

A Common-Crawl-scale corpus is a hyperlink graph as much as a text
corpus; training-data pipelines use link structure for quality priors
(harmonic/PageRank centrality in CCNet-descendant pipelines) and crawl
frontier scoring.  Two operators:

* :func:`html_outlinks` — pages(html) → (url, seq, href, anchor_text)
  edge rows, via the same Arrow-batched pure-Python parse as the
  main-content extractor (boilerplate KEPT: nav/footer edges are the
  graph).  Map-only; inherits upstream partitioning, no shuffle.
* :func:`trustrank_int` — seeded-teleport PageRank (TrustRank,
  Gyöngyi et al. VLDB 2004): teleport restricted to a curated trusted
  set, so a link farm the trusted web never vouches for gets zero
  mass instead of the uniform 15% floor.
* :func:`pagerank_int` — fixed-iteration PageRank over an edge list,
  in INTEGER arithmetic (rank mass scaled by 10^12, contributions via
  integer division, damping 85/100).  Float PageRank sums doubles in
  partition order — non-associative, so Spark and a single-process
  oracle drift in the last bits; the integer form is exactly
  reproducible in any engine, which is what makes the operator
  driver-checkable.  Production swaps doubles back in by changing two
  expressions; the plan shape is identical.

Scale shape (the standard Pregel-as-joins formulation): per iteration
one equi-join of edges against current ranks on src (edges can be
pre-partitioned/bucketed by src so only ranks shuffle), one map-side-
partial aggregate of contributions by dst, one left join back onto the
node set.  ``localCheckpoint`` truncates the growing lineage each
round (same pattern as dedup.connected_components).  Dangling-node
mass is dropped by default (PageRank-lite, standard for link-spam
scoring) or uniformly redistributed with ``dangling="redistribute"``
(textbook teleport, integer-exact) — see :func:`pagerank_int`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def html_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Outlink edge rows (url, seq, href, anchor_text, nofollow),
    seq = 0-based document order.  Anchors without href are skipped;
    anchor text is whitespace-normalized; ``nofollow`` surfaces the
    ``rel="nofollow"`` token so rank propagation can drop edges the
    linking page disavows (filter downstream — the edge itself is
    still real crawl-frontier signal, so extraction keeps it)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from extractor.html_extract import extract_links_rel

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                url = getattr(r, url_col)
                for seq, (href, anchor, nofollow) in enumerate(
                    extract_links_rel(getattr(r, html_col))
                ):
                    rows.append((url, seq, href, anchor, nofollow))
            yield pd.DataFrame(
                rows, columns=["url", "seq", "href", "anchor_text", "nofollow"]
            )

    return pages.select(F.col(url_col), F.col(html_col)).mapInPandas(
        fn,
        schema="url string, seq int, href string, anchor_text string,"
        " nofollow boolean",
    )


def host_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Collapse page-level link rows to host-level edge rows
    (src_host, dst_host) — one output row per input edge, so a
    downstream :func:`pagerank_int` counts multiplicity as weight.

    The host-graph rollup is where CCNet-descendant quality priors
    actually operate (domain-level rank, not page-level): hosts are
    ~10^4× fewer than pages, so ranking converges on a graph that
    fits a fraction of one executor after this map-only projection.
    Host logic matches queries.url_canonicalize: the substring
    between ``://`` and the next ``/``, lowercased.  Relative hrefs
    (no scheme) resolve against the SOURCE page's host — the same-
    site semantics of a browser resolving ``/path`` links."""
    def host_of(col: str):
        no_scheme = F.expr(f"substring({col}, instr({col}, '://') + 3)")
        return F.lower(F.substring_index(no_scheme, "/", 1))

    src_host = host_of(src_col)
    return edges.select(
        src_host.alias("src_host"),
        F.when(F.col(dst_col).contains("://"), host_of(dst_col))
        .otherwise(src_host)
        .alias("dst_host"),
    )


def frontier_scores(
    urls: DataFrame, host_ranks: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Crawl-frontier prioritization: score each candidate URL by its
    host's rank discounted by path depth — ``rank div (1 + depth)``,
    integer-exact.  The standard frontier heuristic (domain authority
    prior × shallow-first), consuming :func:`host_edges` →
    :func:`pagerank_int` output.

    Scale shape: the host-rank table is hosts-sized (~10^4× smaller
    than the frontier) → broadcast equi-join on host; depth and host
    extraction are map-only expressions, so scoring a 10^10-url
    frontier is one broadcast-join pass.  Unranked hosts score 0
    (rank coalesced), so brand-new domains sink, not crash."""
    no_scheme = F.expr(
        f"substring({url_col}, instr({url_col}, '://') + 3)"
    )
    host = F.lower(F.substring_index(no_scheme, "/", 1))
    path = F.expr(
        f"substring({url_col}, instr({url_col}, '://') + 3 + "
        f"length(substring_index(substring({url_col}, "
        f"instr({url_col}, '://') + 3), '/', 1)))"
    )
    depth = F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    with_host = urls.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        depth.cast("int").alias("depth"),
    )
    ranks = host_ranks.select(F.col("node").alias("host"), "rank")
    return (
        with_host.join(F.broadcast(ranks), "host", "left")
        .select(
            "url",
            "host",
            "depth",
            F.coalesce(F.col("rank"), F.lit(0)).cast("long").alias("host_rank"),
            F.expr("coalesce(rank, 0L) div (1 + depth)")
            .cast("long")
            .alias("frontier_score"),
        )
    )


def robots_frontier_filter(
    frontier: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop frontier URLs a host's robots rules disallow — the
    politeness gate between frontier scoring and the fetcher.

    ``rules`` is (host, path_prefix) Disallow rows, one per directive.
    A URL is dropped when ANY rule for its host is a prefix of its
    path.  Simplification (documented, not hidden): prefix Disallow
    only — no wildcards; for the RFC's Allow/Disallow LONGEST-MATCH
    precedence use :func:`robots_match`, which this gate remains the
    cheap conservative subset of.

    Scale shape: rules are |hosts|-sized — millions of rows on a real
    crawl, so NOT assumed broadcast-safe.  The anti-join's equi key is
    ``host`` (both sides hash-partition on it); the prefix test rides
    as the join residual, so Spark never builds a cross product.  A
    mega-host with thousands of directives is a value-skew case AQE's
    skew-join split handles; the frontier payload crosses the shuffle
    once.  Returns (url, host) kept rows."""
    no_scheme = F.expr(f"substring({url_col}, instr({url_col}, '://') + 3)")
    host = F.lower(F.substring_index(no_scheme, "/", 1))
    path = F.expr(
        f"substring({url_col}, instr({url_col}, '://') + 3 + "
        f"length(substring_index(substring({url_col}, "
        f"instr({url_col}, '://') + 3), '/', 1)))"
    )
    cand = frontier.select(
        F.col(url_col).alias("url"), host.alias("host"), path.alias("path")
    )
    dis = rules.select(
        F.lower(F.col("host")).alias("r_host"), F.col("path_prefix")
    )
    return (
        cand.join(
            dis,
            (F.col("host") == F.col("r_host"))
            & F.col("path").startswith(F.col("path_prefix")),
            "left_anti",
        )
        .select("url", "host")
    )


def parse_robots(
    bodies: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Parse raw robots.txt bodies into the rule rows the politeness
    stages consume — the missing ingestion step in front of
    :func:`robots_frontier_filter` (Disallow prefixes) and
    :func:`fetch_schedule` (Crawl-delay).  Returns
    ``(host, kind, value)`` with kind ∈ {'disallow', 'crawl_delay'};
    hosts whose file yields no applicable rule emit no rows (the
    downstream gate keeps rule-less hosts by construction).

    Semantics (RFC 9309, the simplifications stated, not hidden):

    * lines split on newline, ``\\r`` stripped, ``#`` comments cut,
      field names case-insensitive;
    * consecutive ``User-agent`` lines open ONE group; rules bind to
      the most recent group; a rule before any group binds to none;
    * group selection is most-specific-wins: if any group names
      ``agent`` exactly (case-insensitive token equality), only those
      groups apply; otherwise the ``*`` groups do — rules are NOT
      unioned across specificity tiers;
    * empty ``Disallow:`` (allow-all) emits nothing; ``Allow`` rows
      ARE emitted (kind 'allow') for :func:`robots_match`'s
      longest-match precedence; substring wildcards stay out of
      scope (stated).

    Scale shape: ONE map-only pass, pure column expressions — the
    group scan is an array ``aggregate`` over each file's own lines
    (quadratic in line count, but RFC 9309 caps a robots file at
    500 KiB and real files are a few hundred lines; it stays inside
    whole-stage codegen with zero Exchange), then one posexplode of
    the applicable rules.  A 10^8-host robots corpus parses at scan
    speed with no shuffle at all."""
    agent_lit = agent.lower().replace("'", "''")
    df = (
        bodies.select(
            F.col(host_col).alias("host"),
            F.col(body_col).alias("_body"),
        )
        .withColumn(
            "_kv",
            F.expr(
                r"""
                transform(
                  split(regexp_replace(coalesce(_body, ''), '\r', ''), '\n'),
                  l0 -> CASE
                    WHEN instr(regexp_replace(l0, '#.*', ''), ':') = 0
                      THEN named_struct('k', '', 'v', '')
                    ELSE named_struct(
                      'k', lower(trim(substring_index(
                             regexp_replace(l0, '#.*', ''), ':', 1))),
                      'v', trim(substring(regexp_replace(l0, '#.*', ''),
                             instr(regexp_replace(l0, '#.*', ''), ':') + 1)))
                  END)
                """
            ),
        )
        # group id per line: 1 + count of group OPENERS before/at it; an
        # opener is a user-agent line not preceded by one (consecutive
        # UA lines share a group).  gid 0 = before any group.
        .withColumn(
            "_marks",
            F.expr(
                "transform(_kv, (x, i) -> CASE WHEN x.k = 'user-agent'"
                " AND (i = 0 OR element_at(_kv, i).k <> 'user-agent')"
                " THEN 1 ELSE 0 END)"
            ),
        )
        .withColumn(
            "_gid",
            F.expr(
                "transform(_marks, (x, i) ->"
                " aggregate(slice(_marks, 1, i + 1), 0, (a, y) -> a + y))"
            ),
        )
        .withColumn("_z", F.expr("arrays_zip(_kv, _gid)"))
    )
    gids_matching = (
        "array_distinct(transform(filter(_z, z -> z._kv.k = 'user-agent'"
        " AND lower(z._kv.v) = '{tok}'), z -> z._gid))"
    )
    df = df.withColumn(
        "_app",
        F.expr(
            f"CASE WHEN size({gids_matching.format(tok=agent_lit)}) > 0"
            f" THEN {gids_matching.format(tok=agent_lit)}"
            f" ELSE {gids_matching.format(tok='*')} END"
        ),
    )
    rules = F.expr(
        """
        filter(_z, z -> z._gid > 0 AND array_contains(_app, z._gid)
               AND z._kv.v <> ''
               AND z._kv.k IN ('disallow', 'allow', 'crawl-delay'))
        """
    )
    return df.select(
        "host",
        F.posexplode(rules).alias("_pos", "_r"),
    ).select(
        "host",
        F.when(F.col("_r._kv.k") == "disallow", F.lit("disallow"))
        .when(F.col("_r._kv.k") == "allow", F.lit("allow"))
        .otherwise(F.lit("crawl_delay"))
        .alias("kind"),
        F.col("_r._kv.v").alias("value"),
    )


def robots_disallow_rules(parsed: DataFrame) -> DataFrame:
    """(host, path_prefix) Disallow rows in the exact shape
    :func:`robots_frontier_filter` consumes."""
    return parsed.filter(F.col("kind") == "disallow").select(
        "host", F.col("value").alias("path_prefix")
    )


def robots_crawl_delays(parsed: DataFrame) -> DataFrame:
    """(host, crawl_delay_ms) for :func:`fetch_schedule`.  Fractional
    seconds allowed ('0.5'); unparseable values dropped; multiple
    applicable groups collapse to the most conservative (max) delay."""
    return (
        parsed.filter(F.col("kind") == "crawl_delay")
        .select(
            "host",
            (F.expr("try_cast(value AS double)") * 1000).cast("long").alias("_ms"),
        )
        .filter(F.col("_ms").isNotNull() & (F.col("_ms") >= 0))
        .groupBy("host")
        .agg(F.max("_ms").alias("crawl_delay_ms"))
    )


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    scale: int = PR_SCALE,
    dangling: str = "drop",
) -> DataFrame:
    """Fixed-iteration integer PageRank; returns (node, rank).

    rank_0(v) = scale for every node (src ∪ dst); each iteration
    rank(v) = 15% of scale + 85% of the sum over in-edges of
    rank(u) div outdeg(u) — all integer ops (div = floor division,
    damping via *85 then div 100), so the result is bit-identical
    across engines and partitionings.  Multi-edges count with their
    multiplicity (each anchor is an endorsement) — collapsed ONCE into
    (src, dst, weight) before the loop, so every iteration joins the
    distinct-edge table and moves weight·contrib instead of repeated
    rows (same integer result: the per-copy contribution is identical,
    so w·(rank div odeg) == the multi-row sum).

    ``dangling`` closes the gap to textbook PageRank:

    * ``"drop"`` (default): mass of nodes with no out-edges vanishes
      (PageRank-lite) — fine for link-spam scoring where absolute
      calibration is irrelevant.
    * ``"redistribute"``: each iteration sums the previous ranks of
      the (static) dangling-node set and hands every node an
      integer-exact equal share ``dm div |nodes|`` alongside its
      in-edge mass — the textbook uniform teleport of dangling mass,
      still bit-reproducible.  The per-iteration dangling sum is a
      one-row aggregate broadcast into the rank update (no driver
      collect in the loop; |nodes| is the one driver scalar, fetched
      once before it, same as connected_components' convergence
      count).  Caveat: the dangling sum needs |dangling|·scale <
      2^63, so a 10^9-node graph pairs this mode with scale ≤ 10^9
      (rank resolution trades against sum headroom)."""
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be 'drop' or 'redistribute', got {dangling!r}")
    dedup_e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # out-degree is STATIC — fold it into the edge table once so each
    # iteration joins ranks only (one join per round, not two); on a
    # real table this (src, dst, w, odeg) relation is also what gets
    # bucketed by src so the per-iteration join co-locates.
    outdeg = dedup_e.groupBy("src").agg(F.sum("w").alias("odeg"))
    e = dedup_e.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = 15 * scale // 100
    if dangling == "redistribute":
        dangling_nodes = nodes.join(
            e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
        ).localCheckpoint(eager=True)
        n_nodes = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("w * (rank div odeg)").alias("c"),
            )
        )
        in_mass = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        updated = nodes.join(in_mass, "node", "left")
        if dangling == "redistribute":
            share = (
                ranks.join(dangling_nodes, "node")
                .agg(F.sum("rank").alias("dm"))
                .select(F.expr(f"coalesce(dm, 0L) div {n_nodes}").alias("share"))
            )
            updated = updated.crossJoin(F.broadcast(share)).withColumn(
                "s", F.expr("coalesce(s, 0L) + share")
            )
        ranks = (
            updated.select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("85 * coalesce(s, 0L) div 100")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def trustrank_int(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    scale: int = PR_SCALE,
    dangling: str = "drop",
) -> DataFrame:
    """Seeded PageRank (TrustRank, Gyöngyi/Garcia-Molina/Pedersen,
    VLDB 2004): teleport mass lands ONLY on a curated trusted-seed
    set, so rank is reachability-weighted trust — link farms that
    self-endorse but are never linked FROM the trusted web get (near)
    zero mass, where uniform-teleport PageRank hands every node a 15%
    floor.  The complement to :func:`host_link_stats`' structural
    link-farm signals: stats say "this host looks like a farm",
    TrustRank says "nothing trustworthy vouches for it".

    Same integer arithmetic and Pregel-as-joins shape as
    :func:`pagerank_int` (one rank join + one dst aggregate per
    iteration, lineage truncated per round); the differences:

    * rank_0(v) = scale for seeds, 0 otherwise (seed-normalized
      start);
    * the per-iteration base term (15%·scale) is paid to seed nodes
      only — non-seeds receive exclusively damped in-edge mass;
    * ``dangling="redistribute"`` returns dangling mass to the SEED
      set (dm div |seeds|), the personalized-teleport analog of
      pagerank_int's uniform share.

    ``seeds`` is a one-column DataFrame of trusted node ids (column
    ``seed_col``); ids absent from the graph are ignored.  Seeds are
    |trusted-hosts|-sized — small by construction (hand-audited
    lists), so the flag join broadcasts; the per-iteration plan is
    otherwise identical to pagerank_int and bucketing edges by src
    co-locates the only recurring shuffle."""
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be 'drop' or 'redistribute', got {dangling!r}")
    dedup_e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outdeg = dedup_e.groupBy("src").agg(F.sum("w").alias("odeg"))
    e = dedup_e.join(outdeg, "src").localCheckpoint(eager=True)
    seed_nodes = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("is_seed", F.lit(True))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(F.broadcast(seed_nodes), "node", "left")
        .select("node", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    base = 15 * scale // 100
    seed_base = F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0)).cast("long")
    if dangling == "redistribute":
        dangling_nodes = nodes.select("node").join(
            e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
        ).localCheckpoint(eager=True)
        n_seeds = nodes.filter("is_seed").count()
        if n_seeds == 0:
            raise ValueError("redistribute needs at least one seed present in the graph")
    ranks = nodes.withColumn(
        "rank",
        F.when(F.col("is_seed"), F.lit(scale)).otherwise(F.lit(0)).cast("long"),
    )
    for _ in range(iterations):
        contribs = e.join(ranks, e.src == ranks.node).select(
            F.col("dst").alias("node"),
            F.expr("w * (rank div odeg)").alias("c"),
        )
        in_mass = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        updated = nodes.join(in_mass, "node", "left")
        if dangling == "redistribute":
            share = (
                ranks.join(dangling_nodes, "node")
                .agg(F.sum("rank").alias("dm"))
                .select(F.expr(f"coalesce(dm, 0L) div {n_seeds}").alias("share"))
            )
            updated = updated.crossJoin(F.broadcast(share)).withColumn(
                "s",
                F.expr("coalesce(s, 0L) + if(is_seed, share, 0L)"),
            )
        ranks = updated.select(
            "node",
            "is_seed",
            (seed_base + F.expr("85 * coalesce(s, 0L) div 100")).alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def fetch_schedule(
    frontier: DataFrame,
    delays: DataFrame,
    k_per_host: int = 100,
    default_delay_ms: int = 1000,
    url_col: str = "url",
    host_col: str = "host",
    score_col: str = "score",
    delay_col: str = "crawl_delay_ms",
) -> DataFrame:
    """Politeness-constrained fetch plan for one crawl cycle:
    per host, the ``k_per_host`` highest-priority frontier URLs with
    their fetch slot and start offset — ``offset_ms = slot ·
    crawl_delay_ms`` (robots Crawl-delay; ``default_delay_ms`` when
    the host has no rule).  Returns ``(host, url, score, slot,
    offset_ms)``, slot 0-based.

    The per-cycle cap IS the politeness model: a host serving one
    request per delay yields at most K fetches per cycle, so ranking
    inside a host never needs more than K rows — the bounded
    two-level ``grouped_topk`` (no window over a mega-host's frontier;
    1e8 queued URLs on one host cost the same reduce state as 200).
    The delay table is hosts-sized; the join strategy is left to
    Catalyst (broadcast under the threshold, shuffle join beyond —
    same bar as robots_frontier_filter)."""
    from extractor.operators.topk import grouped_topk_exploded

    ranked = grouped_topk_exploded(
        frontier.select(
            F.col(host_col).alias("host"),
            F.struct(
                (-F.col(score_col)).alias("neg"), F.col(url_col).alias("url")
            ).alias("key"),
        ),
        ["host"],
        F.col("key"),
        k=k_per_host,
    )
    d = delays.select(
        F.col(host_col).alias("host"), F.col(delay_col).alias("_delay")
    )
    return (
        ranked.join(d, "host", "left")
        .select(
            "host",
            F.col("value")["url"].alias("url"),
            (-F.col("value")["neg"]).cast("long").alias("score"),
            (F.col("rank") - 1).cast("long").alias("slot"),
            (
                (F.col("rank") - 1)
                * F.coalesce(F.col("_delay"), F.lit(default_delay_ms))
            ).cast("long").alias("offset_ms"),
        )
    )


def host_link_stats(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Per-host link-graph hygiene stats: distinct out-degree,
    distinct in-degree, and reciprocal degree (hosts linked BOTH
    ways) — the cheap link-farm signal (farms show near-total
    reciprocity and out-degree far above in-degree) a rank build
    consults before trusting PageRank mass.  Self-edges are dropped
    (intra-host links are navigation, not endorsement).  Returns
    ``(host, out_deg, in_deg, reciprocal_deg)``.

    Scale shape: distinct-edge projection first (multi-edges collapse
    before anything shuffles wide), then degrees ride ONE groupBy
    over a (host, is_out) union of the edge list, and reciprocity is
    one self equi-join of the distinct edge table on the REVERSED
    composite key — edge-sized, never corpus-sized, AQE-splittable on
    skewed hubs."""
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("host"), F.lit(1).alias("o"), F.lit(0).alias("i"))
        .unionAll(
            e.select(F.col("b").alias("host"), F.lit(0).alias("o"),
                     F.lit(1).alias("i"))
        )
        .groupBy("host")
        .agg(F.sum("o").cast("long").alias("out_deg"),
             F.sum("i").cast("long").alias("in_deg"))
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    recip = (
        e.join(rev, ["a", "b"])
        .groupBy(F.col("a").alias("host"))
        .agg(F.count(F.lit(1)).cast("long").alias("reciprocal_deg"))
    )
    return deg.join(recip, "host", "left").select(
        "host", "out_deg", "in_deg",
        F.coalesce(F.col("reciprocal_deg"), F.lit(0)).cast("long")
        .alias("reciprocal_deg"),
    )


HITS_SCALE = 10**6


def hits_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    scale: int = HITS_SCALE,
) -> DataFrame:
    """Fixed-iteration integer HITS (Kleinberg, JACM 1999); returns
    (node, auth, hub).  PageRank answers "how much global mass flows
    here"; HITS separates the two roles a page plays — AUTHORITY
    (pointed at by good hubs: the reference pages worth keeping and
    ranking up in a corpus mixture) vs HUB (points at good
    authorities: directories, link lists, nav hubs — pages a crawl
    scheduler expands but a training mixture usually down-weights).
    The hub score is the signal the other webgraph operators lack:
    host_link_stats sees raw degree, trustrank sees reachability from
    seeds; HITS sees *curation quality* — a page linking only to junk
    gets hub ≈ 0 even with huge out-degree.

    Integer form, same rationale as :func:`pagerank_int`: mutual
    reinforcement with L1 normalization each half-step —
    ``auth_raw(v) = Σ_{u→v} w·hub(u)`` then
    ``auth(v) = auth_raw·scale div Σ auth_raw`` (and symmetrically for
    hubs from the NEW auths) — all floor arithmetic, bit-identical
    across engines and partitionings.  Multi-edges collapse once to
    (src, dst, w) weights, exactly as PageRank does.

    Scale shape: per iteration TWO equi-joins (hubs on src, then auths
    on dst) each followed by a map-side-partial aggregate, plus two
    one-row L1 totals broadcast into the normalization — no window, no
    driver collect in the loop; lineage truncated per half-step.  On a
    bucketed edge table both joins co-locate the edge side.

    Headroom caveat (mirrors pagerank's redistribute note): the
    normalization computes ``raw · scale`` with raw ≤ scale · weighted
    in-degree, so scale² · max_degree must stay under 2^63 — the
    default scale 10^6 allows weighted degrees to ~9·10^6; raising
    resolution trades against degree headroom."""
    dedup_e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        dedup_e.select(F.col("src").alias("node"))
        .unionAll(dedup_e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    norm = f"coalesce(raw, 0L) * {scale} div greatest(coalesce(tot, 1L), 1L)"
    hubs = nodes.withColumn("hub", F.lit(scale).cast("long"))
    auths = nodes.withColumn("auth", F.lit(0).cast("long"))
    for _ in range(iterations):
        araw = (
            dedup_e.join(hubs.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("w * hub").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        auths = (
            nodes.join(araw, "node", "left")
            .crossJoin(F.broadcast(araw.agg(F.sum("raw").alias("tot"))))
            .select("node", F.expr(norm).alias("auth"))
            .localCheckpoint(eager=True)
        )
        hraw = (
            dedup_e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), F.expr("w * auth").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        hubs = (
            nodes.join(hraw, "node", "left")
            .crossJoin(F.broadcast(hraw.agg(F.sum("raw").alias("tot"))))
            .select("node", F.expr(norm).alias("hub"))
            .localCheckpoint(eager=True)
        )
    return auths.join(hubs, "node")


def host_path_profiles(
    urls: DataFrame, url_col: str = "url", min_urls: int = 1
) -> DataFrame:
    """URL-structure profile per host: for each (host, first path
    segment) — the site SECTION ('/wiki/…', '/product/…', '/tag/…') —
    the url count and its share of the host's urls in basis points.
    The crawl-budget / section-routing view: tag- and search-page
    sections that dominate a host's URL space are crawler traps; a
    section's share decides whether its urls enter the frontier at
    full priority.  Root urls profile as section '/'.

    Map-only host/segment extraction (the tier's standard
    no-scheme/substring_index expressions — no parse_url, mirrored in
    the SQL oracle), ONE (host, section) count aggregate with
    map-side partials, and a hosts-sized total joined back — a
    10^10-url frontier profiles in one shuffle of (host, section,
    long) rows."""
    no_scheme = F.expr(
        f"substring({url_col}, instr({url_col}, '://') + 3)"
    )
    host = F.lower(F.substring_index(no_scheme, "/", 1))
    path = F.expr(
        f"substring({url_col}, instr({url_col}, '://') + 3 + "
        f"length(substring_index(substring({url_col}, "
        f"instr({url_col}, '://') + 3), '/', 1)))"
    )
    section = F.when(
        F.length(path) <= 1, F.lit("/")
    ).otherwise(F.concat(F.lit("/"), F.substring_index(F.substring(path, 2, 1 << 30), "/", 1)))
    counts = (
        urls.select(host.alias("host"), F.lower(section).alias("section"))
        .groupBy("host", "section")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )
    # totals BEFORE the min_urls cut — shares are of the host's whole
    # url space, filtering only trims the reported tail
    totals = counts.groupBy("host").agg(F.sum("n_urls").alias("host_urls"))
    return (
        counts.filter(F.col("n_urls") >= min_urls)
        .join(totals, "host")
        .select(
            "host",
            "section",
            F.col("n_urls").cast("long").alias("n_urls"),
            F.col("host_urls").cast("long").alias("host_urls"),
            F.expr("n_urls * 10000 div host_urls").cast("long").alias("share_bp"),
        )
    )


def robots_sitemaps(
    bodies: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) rows from raw robots.txt bodies — the
    discovery hook that connects the politeness tier to
    ``sources.sitemap``: RFC 9309 makes ``Sitemap:`` lines
    group-INDEPENDENT (they apply regardless of user-agent groups),
    so this is a pure line filter, deliberately separate from
    :func:`parse_robots`' group scan.  Field name case-insensitive,
    comments cut, value whitespace-trimmed with URL case PRESERVED
    (paths are case-sensitive); files without sitemap lines emit no
    rows.  One map-only expression pass, zero Exchange — same scan
    economics as parse_robots."""
    line_clean = "regexp_replace(l0, '#.*', '')"
    vals = F.expr(
        rf"""
        filter(
          transform(
            split(regexp_replace(coalesce(_body, ''), '\r', ''), '\n'),
            l0 -> CASE
              WHEN instr({line_clean}, ':') > 0
               AND lower(trim(substring_index({line_clean}, ':', 1)))
                   = 'sitemap'
              THEN trim(substring({line_clean},
                        instr({line_clean}, ':') + 1))
              ELSE '' END),
          v -> v <> '')
        """
    )
    return (
        bodies.select(
            F.col(host_col).alias("host"), F.col(body_col).alias("_body")
        )
        .select("host", F.explode(vals).alias("sitemap_url"))
    )


def degree_histogram(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Degree distribution of the link graph in power-of-two buckets,
    per direction — the observability read BEFORE trusting rank mass
    (the web-graph analog of the retrieval tier's postings_stats):
    mass piling into the top out-degree buckets means link farms /
    nav explosions are about to dominate PageRank's edge table, and
    the in-degree tail is where AQE skew handling and the hot-key
    caps earn their keep.

    Distinct edges (multi-edges are rank WEIGHT, not graph structure
    — stated; weight stats live with pagerank's collapse), degrees in
    one grouped union pass, bucket = bit length of the degree minus
    one (base-2 string length — integer-exact in both engines, no
    float log2 boundary risk).  Returns (direction, deg_bucket,
    n_nodes, total_edges, max_degree)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumn("direction", F.lit("out"))
        .unionAll(
            e.groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .withColumn("direction", F.lit("in"))
        )
    )
    bucket = (F.length(F.conv(F.col("deg").cast("string"), 10, 2)) - 1).cast(
        "long"
    )
    return (
        deg.select("direction", bucket.alias("deg_bucket"), "deg")
        .groupBy("direction", "deg_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("total_edges"),
            F.max("deg").cast("long").alias("max_degree"),
        )
    )


def label_propagation_int(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    iterations: int = 2,
) -> DataFrame:
    """Categorical label propagation over the (undirected) host graph
    (Zhu/Ghahramani-style propagation with clamped seeds; Raghavan's
    LPA made deterministic): a hand-audited seed set carries known
    categories (news / reference / commerce / spam …), and each
    iteration every non-seed node adopts the category with the
    largest incoming link weight from labeled neighbors — the
    host-scale topic tagger that complements TrustRank's scalar
    trust with a categorical axis.

    Determinism (the engine contract): votes are integer edge-weight
    sums; argmax breaks ties by label ASC (via one
    ``min(struct(-votes, label))`` aggregate — no window, no
    nondeterministic first()); seeds are CLAMPED (their label never
    changes); nodes with no labeled neighbor stay unlabeled and are
    absent from the output.  Links count as evidence in BOTH
    directions (edges are symmetrized once, multi-edges collapse to
    weights).

    Scale shape: the symmetric edge table builds once (one
    distinct-collapse shuffle); per iteration ONE equi-join of the
    current (node, label) table against edges + one (node, label)
    vote aggregate with map-side partials + the argmax aggregate —
    the Pregel-as-joins shape of pagerank_int with labels instead of
    mass; lineage truncated per round.  Returns (node, label,
    votes) — seeds carry votes = 0 (their label is an input, not an
    inference; stated)."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)
    )
    seed_tbl = seeds.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("label")
    ).localCheckpoint(eager=True)
    labels = seed_tbl.withColumn("votes", F.lit(0).cast("long"))
    for _ in range(iterations):
        votes = (
            sym.join(
                labels.select(F.col("node").alias("a"), "label"), "a"
            )
            .groupBy(F.col("b").alias("node"), "label")
            .agg(F.sum("w").alias("v"))
        )
        arg = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("v")).alias("nv"), F.col("label"))
                ).alias("m")
            )
            .select(
                "node",
                F.col("m.label").alias("label"),
                (-F.col("m.nv")).cast("long").alias("votes"),
            )
        )
        labels = (
            seed_tbl.withColumn("votes", F.lit(0).cast("long"))
            .unionAll(arg.join(seed_tbl.select("node"), "node", "left_anti"))
            .localCheckpoint(eager=True)
        )
    return labels


def robots_match(
    frontier: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """RFC 9309 longest-match robots verdict per frontier URL —
    the full precedence :func:`robots_frontier_filter`'s
    conservative prefix gate deliberately skips: among a host's
    matching rules the MOST SPECIFIC (longest path prefix) wins, and
    on an exact length tie ``Allow`` wins.  The
    ``Disallow: /private`` + ``Allow: /private/public`` pattern —
    ubiquitous in real robots files — only works under this rule.

    ``rules`` is (host, kind ∈ {'allow','disallow'}, path_prefix)
    rows (:func:`parse_robots` output, filtered to the two kinds).
    Returns (url, host, allowed, winner_kind, winner_len) —
    rule-less URLs are allowed with NULL winner columns.

    Output grain is DISTINCT (url, host) — the verdict groupBy
    collapses duplicate frontier rows (same convention as
    bloom_probe's distinct-digest probe).  Callers that need frontier
    multiplicity preserved must join the verdict back onto their
    frontier by url (or use :func:`robots_frontier_filter`, which is
    row-preserving); joining verdicts back by ROW position would
    lose rows.

    Scale shape: one LEFT equi-join on host with the prefix test as
    the join residual (rules are hosts-sized, never assumed
    broadcast-safe — same discipline as robots_frontier_filter),
    then one per-url argmax via ``min(struct(-len, kind))`` — the
    struct ordering IS the RFC precedence ('allow' < 'disallow'
    sorts first on equal length); no window."""
    no_scheme = F.expr(f"substring({url_col}, instr({url_col}, '://') + 3)")
    host = F.lower(F.substring_index(no_scheme, "/", 1))
    path = F.expr(
        f"substring({url_col}, instr({url_col}, '://') + 3 + "
        f"length(substring_index(substring({url_col}, "
        f"instr({url_col}, '://') + 3), '/', 1)))"
    )
    fr = frontier.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        F.when(path == "", "/").otherwise(path).alias("_path"),
    )
    r = rules.select(
        F.col("host"),
        F.col("kind"),
        F.col("path_prefix").alias("_pfx"),
    )
    joined = fr.join(
        r,
        (fr.host == r.host) & F.expr("startswith(_path, _pfx)"),
        "left",
    ).select(
        "url",
        fr.host.alias("host"),
        F.when(
            F.col("kind").isNotNull(),
            F.struct(
                (-F.length("_pfx")).alias("nl"), F.col("kind").alias("k")
            ),
        ).alias("m"),
    )
    win = joined.groupBy("url", "host").agg(F.min("m").alias("w"))
    return win.select(
        "url",
        "host",
        (F.col("w").isNull() | (F.col("w.k") == "allow")).alias("allowed"),
        F.col("w.k").alias("winner_kind"),
        (-F.col("w.nl")).cast("int").alias("winner_len"),
    )


def host_reciprocity(
    edges: DataFrame, src_col: str = "src_host", dst_col: str = "dst_host"
) -> DataFrame:
    """Per-host link reciprocity: of a host's DISTINCT out-neighbors,
    the fraction that link back — mutual linking at high rates is the
    classic link-exchange/spam-ring signal (organic citation is
    mostly one-directional), the cheap precursor to TrustRank when
    triaging a new crawl's hosts.

    Returns (host, n_out, n_reciprocal, recip_bp).  Self-loops are
    excluded (trivially "reciprocal").

    Scale shape: runs on the HOST graph (≈10^4× smaller than pages —
    host_edges' rollup): one distinct over host pairs, one
    self-equi-join on the REVERSED (dst, src) composite key (never a
    theta join), one grouped aggregate with map-side partials."""
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    rev = e.select(
        F.col("d").alias("s"), F.col("s").alias("d"), F.lit(1).alias("rec")
    )
    j = e.join(rev, ["s", "d"], "left")
    return j.groupBy(F.col("s").alias("host")).agg(
        F.count(F.lit(1)).alias("n_out"),
        F.coalesce(F.sum("rec"), F.lit(0)).cast("long").alias("n_reciprocal"),
        (F.coalesce(F.sum("rec"), F.lit(0)) * 10000 / F.count(F.lit(1)))
        .cast("long")
        .alias("recip_bp"),
    )


def cocitation_pairs(
    edges: DataFrame,
    src_col: str = "url",
    dst_col: str = "href",
    max_out: int = 64,
    min_cocite: int = 2,
) -> DataFrame:
    """Co-citation pairs: two targets linked by the same source are
    related (Small 1973 — the web-IR "pages cited together" signal;
    the link-graph twin of the inverted index's df-capped token
    join).  Returns (a, b, n_cocite) for target pairs co-cited by
    ≥ ``min_cocite`` distinct sources.

    Scale shape: sources with more than ``max_out`` distinct targets
    are DROPPED BEFORE the self-join (a hub page co-cites
    quadratically — the max_df discipline of the retrieval tier,
    without which one directory page emits 10^9 pairs); the join is
    an equi-join on the source key over the capped edge set, and the
    pair count is one grouped aggregate."""
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).distinct()
    keep = e.groupBy("s").agg(F.count(F.lit(1)).alias("odeg")).filter(
        F.col("odeg") <= max_out
    ).select("s")
    ee = e.join(keep, "s")
    x, y = ee.alias("x"), ee.alias("y")
    return (
        x.join(y, "s")
        .where(F.col("x.d") < F.col("y.d"))
        .groupBy(F.col("x.d").alias("a"), F.col("y.d").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cocite"))
        .filter(F.col("n_cocite") >= min_cocite)
    )


def spam_mass_int(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    dangling: str = "drop",
) -> DataFrame:
    """Relative spam mass (Gyöngyi/Berkhin/Garcia-Molina/Pedersen,
    "Link Spam Detection Based on Mass Estimation", VLDB 2006): the
    fraction of a node's PageRank that is NOT vouched for by the
    trusted core.  :func:`trustrank_int` answers "how much trust
    reaches this node"; spam mass answers the demotion question
    directly — "how much of this node's rank would survive if only
    trusted endorsements counted".  A node whose rank comes entirely
    from a self-endorsing farm has spam mass ≈ 1000‰ even when its
    absolute rank is large, which is exactly the case raw PageRank
    cannot see.

    Returns (node, pr_ppm, tr_ppm, spam_mass_pm):

    * ``pr_ppm``  — uniform-teleport PageRank as parts-per-million of
      total PageRank mass;
    * ``tr_ppm``  — seeded TrustRank as ppm of total trust mass;
    * ``spam_mass_pm`` — ``max(0, 1000·(pr_ppm − tr_ppm) / pr_ppm)``
      floored — the paper's relative mass ``(PR − PR⁺)/PR`` with both
      ranks self-normalized so the seeded chain's smaller total mass
      doesn't need a calibration constant.

    All arithmetic is integer (normalization via
    ``rank div (total div 10^6)`` keeps every intermediate below
    2^63 at PR_SCALE), so the result is bit-identical across engines
    and partitionings.  Plan shape: the two audited rank loops (one
    equi-join + one aggregate per iteration each), ONE node-keyed
    join between their outputs, and a one-row total broadcast — no
    new shuffle grain beyond what the rank loops already pay, so the
    100 TB story is exactly theirs."""
    pr = pagerank_int(
        edges, src_col=src_col, dst_col=dst_col,
        iterations=iterations, dangling=dangling,
    ).select("node", F.col("rank").alias("pr"))
    tr = trustrank_int(
        edges, seeds, src_col=src_col, dst_col=dst_col, seed_col=seed_col,
        iterations=iterations, dangling=dangling,
    ).select("node", F.col("rank").alias("tr"))
    j = pr.join(tr, "node")
    tot = j.agg(F.sum("pr").alias("tp"), F.sum("tr").alias("tt"))
    ppm = j.crossJoin(F.broadcast(tot)).select(
        "node",
        F.expr("pr div greatest(tp div 1000000, 1L)").alias("pr_ppm"),
        F.expr("tr div greatest(tt div 1000000, 1L)").alias("tr_ppm"),
    )
    return ppm.select(
        "node",
        "pr_ppm",
        "tr_ppm",
        F.greatest(
            F.expr("(pr_ppm - tr_ppm) * 1000 div greatest(pr_ppm, 1L)"),
            F.lit(0).cast("long"),
        ).alias("spam_mass_pm"),
    )
