"""Web-graph tier: outlinks, PageRank family, TrustRank, HITS-style host stats, mirrors, anchors-as-spam."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.queries._core import (  # noqa: F401
    register,
    _BOILER_EDGES_SQL,
    _docs,
)

@register(
    "html_outlinks",
    f"""
    WITH {_BOILER_EDGES_SQL}
    SELECT b.url, (f.start + i.i)::INT AS seq,
           '/x/' || (b.doc_id + f.doff) || '/' || i.i AS href,
           'link word ' || i.i AS anchor_text,
           false AS nofollow
    FROM boiler b, farm f,
         LATERAL (SELECT unnest(generate_series(0, f.n - 1)) AS i) i
    """,
)
def q_html_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink edge extraction over the valid html rows (anchors in
    boilerplate KEPT — nav/footer edges are the web graph; only
    html_boiler fixtures carry anchors).  Map-only mapInPandas; the
    oracle re-derives the deterministic link-farm structure."""
    from extractor.config import ExtractConfig
    from extractor.operators.webgraph import html_outlinks
    from extractor.pipeline import _quarantine_error, route
    from extractor.testgen import TEST_MAX_BYTES, pages_df

    cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)
    routed = route(pages_df(spark, sf_dir)).withColumn(
        "route_error", _quarantine_error(cfg)
    )
    valid_html = routed.filter(
        (F.col("doc_type") == "html") & F.col("route_error").isNull()
    )
    return html_outlinks(valid_html)

_PAGERANK_ITER_SQL = """
    i{K} AS (
      SELECT n.node,
             CAST(150000000000 + (85 * coalesce(m.s, 0)) // 100 AS BIGINT)
               AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank // o.odeg) AS s
        FROM edges e
        JOIN i{PREV} r ON r.node = e.src
        JOIN odeg o ON o.src = e.src
        GROUP BY e.dst
      ) m ON m.node = n.node
    )
"""

@register(
    "pagerank",
    f"""
    WITH {_BOILER_EDGES_SQL},
    edges AS (
      SELECT b.url AS src, '/x/' || (b.doc_id + f.doff) || '/' || i.i AS dst
      FROM boiler b, farm f,
           LATERAL (SELECT unnest(generate_series(0, f.n - 1)) AS i) i
    ),
    odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    i0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
    {_PAGERANK_ITER_SQL.format(K=1, PREV=0)},
    {_PAGERANK_ITER_SQL.format(K=2, PREV=1)},
    {_PAGERANK_ITER_SQL.format(K=3, PREV=2)}
    SELECT node, rank FROM i3
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration integer PageRank over the extracted outlink graph
    (operators.webgraph.pagerank_int): rank mass scaled by 10^12,
    contributions by integer division, damping 85/100 — exact in both
    engines regardless of summation order (float PageRank drifts in
    the last bits across partitionings).  The oracle unrolls the same
    three iterations as CTEs over the same derived edge list."""
    from extractor.operators.webgraph import pagerank_int

    edges = q_html_outlinks(spark, sf_dir).select(
        F.col("url").alias("src"), F.col("href").alias("dst")
    )
    return pagerank_int(edges, iterations=3)

# redistribute variant of the unrolled iteration: the share term is the
# previous iteration's total dangling rank (nodes absent from odeg),
# integer-divided by |nodes|, added to every node's in-mass before
# damping — mirrors pagerank_int(dangling="redistribute") exactly.
_PAGERANK_RD_ITER_SQL = """
    i{K} AS (
      SELECT n.node,
             CAST(150000000000 +
                  (85 * (coalesce(m.s, 0) + d.share)) // 100 AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank // o.odeg) AS s
        FROM edges e
        JOIN i{PREV} r ON r.node = e.src
        JOIN odeg o ON o.src = e.src
        GROUP BY e.dst
      ) m ON m.node = n.node
      CROSS JOIN (
        SELECT coalesce(sum(r.rank), 0) // (SELECT count(*) FROM nodes) AS share
        FROM i{PREV} r LEFT JOIN odeg o ON o.src = r.node
        WHERE o.src IS NULL
      ) d
    )
"""

@register(
    "pagerank_redistribute",
    f"""
    WITH {_BOILER_EDGES_SQL},
    edges AS (
      SELECT b.url AS src, '/x/' || (b.doc_id + f.doff) || '/' || i.i AS dst
      FROM boiler b, farm f,
           LATERAL (SELECT unnest(generate_series(0, f.n - 1)) AS i) i
    ),
    odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    i0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
    {_PAGERANK_RD_ITER_SQL.format(K=1, PREV=0)},
    {_PAGERANK_RD_ITER_SQL.format(K=2, PREV=1)},
    {_PAGERANK_RD_ITER_SQL.format(K=3, PREV=2)}
    SELECT node, rank FROM i3
    """,
)
def q_pagerank_redistribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textbook-teleport PageRank (pagerank_int with
    dangling="redistribute") over the same extracted outlink graph as
    the `pagerank` entry — on this graph every href target is a
    dangling node, so the redistribution term carries most of the
    mass and the two entries' ranks differ materially (the drop
    variant starves everything at 15%·scale + in-edges only).  The
    oracle unrolls the same three iterations with the per-iteration
    dangling-share CTE."""
    from extractor.operators.webgraph import pagerank_int

    edges = q_html_outlinks(spark, sf_dir).select(
        F.col("url").alias("src"), F.col("href").alias("dst")
    )
    return pagerank_int(edges, iterations=3, dangling="redistribute")

# Host-graph fixture shared by host_pagerank and frontier_score:
# synthetic cross-host page links (3 per doc, one relative for every
# 11th doc resolving to its own host, one uppercase-host absolute
# exercising the lowercase canon), collapsed to host pairs, then the
# same unrolled integer PageRank (multi-edge rows ARE the weights).
_HOST_GRAPH_CTES = f"""
    hosts AS (
      SELECT doc_id, 'h' || (doc_id % 7) || '.example-42.test' AS shost
      FROM documents
    ),
    edges AS (
      SELECT shost AS src,
             CASE WHEN doc_id % 11 = 0 THEN shost
                  ELSE 'h' || ((doc_id + 1) % 7) || '.example-42.test' END AS dst
      FROM hosts
      UNION ALL
      SELECT shost, 'h' || ((doc_id + 2) % 7) || '.example-42.test' FROM hosts
      UNION ALL
      SELECT shost, 'h' || ((doc_id + 3) % 7) || '.example-42.test' FROM hosts
    ),
    odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    i0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
    {_PAGERANK_ITER_SQL.format(K=1, PREV=0)},
    {_PAGERANK_ITER_SQL.format(K=2, PREV=1)},
    {_PAGERANK_ITER_SQL.format(K=3, PREV=2)}
"""

@register(
    "host_pagerank",
    f"""
    WITH {_HOST_GRAPH_CTES}
    SELECT node, rank FROM i3
    """,
)
def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level rank — the CCNet-descendant quality prior the
    webgraph docstring cites operates on the HOST graph, not pages.
    Page-level link rows (synthesized across 7 hosts, with relative
    hrefs resolving to the source host and an uppercase-host variant
    exercising canonicalization) collapse through
    operators.webgraph.host_edges (map-only), then pagerank_int runs
    on a graph ~10^4× smaller than the page graph; multi-edge
    multiplicity between host pairs is the edge weight."""
    from extractor.operators.webgraph import host_edges, pagerank_int

    docs = _docs(spark, sf_dir).select("doc_id")
    shost = F.concat(
        F.lit("h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example-42.test"),
    )
    src = F.concat(
        F.lit("https://"), shost, F.lit("/page/"),
        F.format_string("%06d", F.col("doc_id")), F.lit(".html"),
    )

    def abs_href(j: int, upper: bool = False):
        h = F.concat(
            F.lit("h"), ((F.col("doc_id") + j) % 7).cast("string"),
            F.lit(".example-42.test"),
        )
        return F.concat(F.lit("https://"), F.upper(h) if upper else h, F.lit("/x"))

    links = docs.select(
        src.alias("src"),
        F.explode(
            F.array(
                # every 11th doc's first link is relative → resolves to
                # its own host in host_edges
                F.when(F.col("doc_id") % 11 == 0, F.lit("/local/1"))
                .otherwise(abs_href(1)),
                abs_href(2, upper=True),
                abs_href(3),
            )
        ).alias("dst"),
    )
    he = host_edges(links, src_col="src", dst_col="dst")
    return pagerank_int(he, src_col="src_host", dst_col="dst_host", iterations=3)

@register(
    "frontier_score",
    f"""
    WITH {_HOST_GRAPH_CTES},
    urls AS (
      SELECT 'https://h' || (doc_id % 7) || '.example-42.test' ||
             CASE WHEN doc_id % 3 = 0 THEN '/page/'
                  WHEN doc_id % 3 = 1 THEN '/a/b/' ELSE '/' END ||
             printf('%06d', doc_id) || '.html' AS url,
             'h' || (doc_id % 7) || '.example-42.test' AS host,
             CASE WHEN doc_id % 3 = 0 THEN 2
                  WHEN doc_id % 3 = 1 THEN 3 ELSE 1 END AS depth
      FROM documents
    )
    SELECT u.url, u.host, u.depth::INT AS depth,
           coalesce(r.rank, 0)::BIGINT AS host_rank,
           (coalesce(r.rank, 0) // (1 + u.depth))::BIGINT AS frontier_score
    FROM urls u LEFT JOIN i3 r ON r.node = u.host
    """,
)
def q_frontier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier prioritization (operators.webgraph.
    frontier_scores): candidate URLs scored by their host's PageRank
    discounted by path depth — the domain-authority-prior ×
    shallow-first heuristic a crawl scheduler ranks its queue with,
    composed from the host_pagerank graph (broadcast host-rank join +
    map-only host/depth extraction; a 10^10-url frontier scores in
    one pass).  URL paths vary in depth (1/2/3 by doc_id % 3) so the
    discount is exercised; the oracle re-derives depth per case."""
    from extractor.operators.webgraph import frontier_scores

    ranks = q_host_pagerank(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id")
    shost = F.concat(
        F.lit("h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example-42.test"),
    )
    seg = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("/page/"))
        .when(F.col("doc_id") % 3 == 1, F.lit("/a/b/"))
        .otherwise(F.lit("/"))
    )
    urls = docs.select(
        F.concat(
            F.lit("https://"), shost, seg,
            F.format_string("%06d", F.col("doc_id")), F.lit(".html"),
        ).alias("url")
    )
    return frontier_scores(urls, ranks)

# Seeded-teleport iteration: base term paid to seed rows only; the
# in-mass leg is identical to _PAGERANK_ITER_SQL.
_TRUSTRANK_ITER_SQL = """
    i{K} AS (
      SELECT n.node, n.is_seed,
             CAST((CASE WHEN n.is_seed THEN 150000000000 ELSE 0 END) +
                  (85 * coalesce(m.s, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank // o.odeg) AS s
        FROM edges e
        JOIN i{PREV} r ON r.node = e.src
        JOIN odeg o ON o.src = e.src
        GROUP BY e.dst
      ) m ON m.node = n.node
    )
"""

@register(
    "host_trustrank",
    f"""
    -- trusted ring: every doc's host links to host+1 and host+3 (mod
    -- 7); spam triangle: every 5th doc's s-host endorses the next
    -- s-host AND links out to the trusted web — but nothing trusted
    -- ever links to a spam host, so seeded teleport starves the farm
    WITH hosts AS (
      SELECT doc_id, 'h' || (doc_id % 7) || '.example-42.test' AS shost
      FROM documents
    ),
    edges AS (
      SELECT shost AS src,
             'h' || ((doc_id + 1) % 7) || '.example-42.test' AS dst
      FROM hosts
      UNION ALL
      SELECT shost, 'h' || ((doc_id + 3) % 7) || '.example-42.test'
      FROM hosts
      UNION ALL
      SELECT 's' || (doc_id % 3) || '.spam-42.test',
             's' || ((doc_id + 1) % 3) || '.spam-42.test'
      FROM hosts WHERE doc_id % 5 = 0
      UNION ALL
      SELECT 's' || (doc_id % 3) || '.spam-42.test',
             'h' || (doc_id % 7) || '.example-42.test'
      FROM hosts WHERE doc_id % 5 = 0
    ),
    odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    nodes AS (
      SELECT node,
             node IN ('h0.example-42.test', 'h3.example-42.test') AS is_seed
      FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
    ),
    i0 AS (
      SELECT node, is_seed,
             CAST(CASE WHEN is_seed THEN 1000000000000 ELSE 0 END AS BIGINT)
               AS rank
      FROM nodes
    ),
    {_TRUSTRANK_ITER_SQL.format(K=1, PREV=0)},
    {_TRUSTRANK_ITER_SQL.format(K=2, PREV=1)},
    {_TRUSTRANK_ITER_SQL.format(K=3, PREV=2)}
    SELECT node, rank FROM i3
    """,
)
def q_host_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded PageRank over the host graph
    (operators.webgraph.trustrank_int) — teleport mass restricted to
    two hand-picked trusted hosts, the Gyöngyi et al. 2004 link-spam
    demotion signal.  The fixture plants a spam triangle that
    self-endorses and links OUT to the trusted ring but is never
    linked from it: under uniform-teleport PageRank every spam host
    collects the 15% floor, under TrustRank their rank is exactly 0
    (nothing trustworthy vouches for them), which is the number a
    mixture builder can threshold on.  The oracle unrolls the same
    three seeded iterations; integer arithmetic keeps both engines
    bit-identical."""
    from extractor.operators.webgraph import trustrank_int

    docs = _docs(spark, sf_dir).select("doc_id")

    def h(j: int):
        return F.concat(
            F.lit("h"), ((F.col("doc_id") + j) % 7).cast("string"),
            F.lit(".example-42.test"),
        )

    def s(j: int):
        return F.concat(
            F.lit("s"), ((F.col("doc_id") + j) % 3).cast("string"),
            F.lit(".spam-42.test"),
        )

    trusted = docs.select(
        h(0).alias("src"), F.explode(F.array(h(1), h(3))).alias("dst")
    )
    spam = docs.filter(F.col("doc_id") % 5 == 0).select(
        s(0).alias("src"), F.explode(F.array(s(1), h(0))).alias("dst")
    )
    seeds = spark.createDataFrame(
        [("h0.example-42.test",), ("h3.example-42.test",)], "node string"
    )
    return trustrank_int(trusted.unionAll(spam), seeds, iterations=3)

@register(
    "e2e_wat_rank",
    # Same oracle as host_pagerank: the WAT file round-trip must be
    # LOSSLESS for the ranks to match, so any framing/JSON bug in the
    # archive path breaks integer-exact rank parity.
    f"""
    WITH {_HOST_GRAPH_CTES}
    SELECT node, rank FROM i3
    """,
)
def q_e2e_wat_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl archive in → domain ranks out: the host_pagerank link
    fixture exported as REAL WAT segments (sources.wat.to_wat_records
    → write.text), re-ingested through the block-splittable reader,
    links exploded to page edges, collapsed by host_edges, ranked by
    pagerank_int — every stage the engine's own operator, and the
    oracle is the DIRECT host-graph computation, so the archive hop
    must be byte-lossless for the integer ranks to agree."""
    import tempfile

    from extractor.operators.webgraph import host_edges, pagerank_int
    from extractor.sources.wat import read_wat, to_wat_records

    docs = _docs(spark, sf_dir).select("doc_id")
    shost = F.concat(
        F.lit("h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example-42.test"),
    )
    src = F.concat(
        F.lit("https://"), shost, F.lit("/page/"),
        F.format_string("%06d", F.col("doc_id")), F.lit(".html"),
    )

    def abs_href(j: int, upper: bool = False):
        h = F.concat(
            F.lit("h"), ((F.col("doc_id") + j) % 7).cast("string"),
            F.lit(".example-42.test"),
        )
        return F.concat(F.lit("https://"), F.upper(h) if upper else h, F.lit("/x"))

    wat_rows = docs.select(
        src.alias("url"),
        F.lit("2025-06-04T00:00:00Z").alias("warc_date"),
        F.lit(None).cast("string").alias("title"),
        F.array(
            F.when(F.col("doc_id") % 11 == 0, F.lit("/local/1"))
            .otherwise(abs_href(1)),
            abs_href(2, upper=True),
            abs_href(3),
        ).alias("links"),
    )
    out = tempfile.mkdtemp(prefix="wat_rank_") + "/segments"
    to_wat_records(wat_rows.repartition(4)).write.mode("overwrite").text(out)
    links = read_wat(spark, out).select(
        F.col("url").alias("src"), F.explode("links").alias("dst")
    )
    he = host_edges(links, src_col="src", dst_col="dst")
    return pagerank_int(he, src_col="src_host", dst_col="dst_host", iterations=3)

@register(
    "host_templates",
    """
    -- independent re-derivation: build the same planted line rows by
    -- class arithmetic and run the counting aggregate in SQL
    WITH pages AS (
      SELECT doc_id, 'h' || (doc_id % 9) AS host FROM documents
    ),
    lines AS (
      SELECT host, doc_id, 'NAVBAR host ' || host AS line FROM pages
      UNION ALL
      SELECT host, doc_id, 'Copyright host ' || host || ' footer' FROM pages
      UNION ALL
      SELECT host, doc_id, 'unique content ' || doc_id FROM pages
      UNION ALL
      SELECT host, doc_id, 'rare promo line' FROM pages WHERE doc_id % 13 = 0
    ),
    counts AS (
      SELECT host, line, count(DISTINCT doc_id) AS n_docs
      FROM lines GROUP BY host, line
    ),
    np AS (SELECT host, count(*) AS n_pages FROM pages GROUP BY host)
    SELECT c.host, c.line, c.n_docs::BIGINT AS n_docs,
           p.n_pages::BIGINT AS n_pages,
           (10000 * c.n_docs // p.n_pages)::BIGINT AS frac_bp
    FROM counts c JOIN np p USING (host)
    WHERE p.n_pages >= 3 AND 10000 * c.n_docs >= 6000 * p.n_pages
    """,
)
def q_host_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host boilerplate-template discovery
    (operators.dedup.host_template_lines): lines on ≥60% of a host's
    pages are site structure, not content — the host-conditioned
    complement to corpus-wide paragraph_dedup, feeding
    strip_template_lines (the cleaner for cookie banners / footers
    that survive DOM-heuristic extraction on some layouts).  The
    9-host fixture plants two universal boiler lines per host, one
    unique line per page, and a 'rare promo line' on every 13th page
    (~7.7% — must stay below the 60% bar); within-page duplicate and
    whitespace-jittered copies collapse before counting (the engine
    sees '  NAVBAR…  ' + a doubled line; the oracle counts the clean
    planted rows — trim/array_distinct bugs flip the diff)."""
    from extractor.operators.dedup import host_template_lines

    docs = _docs(spark, sf_dir).select("doc_id")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string"))
    text = F.concat(
        # leading/trailing whitespace + a doubled boiler line: the
        # operator must trim and de-dup within page before counting
        F.lit("  NAVBAR host "), host, F.lit("  \n"),
        F.lit("NAVBAR host "), host, F.lit("\n"),
        F.lit("Copyright host "), host, F.lit(" footer\n"),
        F.lit("\n"),  # blank line must be ignored
        F.lit("unique content "), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("\nrare promo line"))
        .otherwise(F.lit("")),
    )
    pages = docs.select(
        host.alias("host"), F.col("doc_id"), text.alias("text")
    )
    return host_template_lines(pages, min_pages=3, min_frac_bp=6000)

@register(
    "host_mirrors",
    """
    WITH pages AS (
      SELECT 'h' || (doc_id % 9) AS host, md5(text) AS digest FROM documents
      UNION ALL
      SELECT 'm' || (doc_id % 9), md5(text) FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT DISTINCT host, md5('BOILER') FROM (
        SELECT 'h' || (doc_id % 9) AS host FROM documents
        UNION ALL
        SELECT 'm' || (doc_id % 9) FROM documents WHERE doc_id % 4 = 0) t
    ),
    hd AS (SELECT DISTINCT host, digest FROM pages),
    kept AS (
      SELECT * FROM hd WHERE digest IN (
        SELECT digest FROM hd GROUP BY digest HAVING count(*) <= 10)
    ),
    sizes AS (SELECT host, count(*) AS n FROM kept GROUP BY host),
    sh AS (
      SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
      FROM kept a JOIN kept b ON a.digest = b.digest AND a.host < b.host
      GROUP BY 1, 2
    )
    SELECT s.host_a, s.host_b, s.shared::BIGINT AS shared,
           sa.n::BIGINT AS n_a, sb.n::BIGINT AS n_b,
           ((10000 * s.shared) // sa.n)::BIGINT AS cont_a_bp,
           ((10000 * s.shared) // sb.n)::BIGINT AS cont_b_bp
    FROM sh s
    JOIN sizes sa ON sa.host = s.host_a
    JOIN sizes sb ON sb.host = s.host_b
    WHERE (10000 * s.shared) // sa.n >= 9000
       OR (10000 * s.shared) // sb.n >= 9000
    """,
)
def q_host_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection (operators.crawl.host_mirror_pairs):
    host pairs whose content digests are directionally (near-)
    contained — CDN/www-split/wholesale mirrors that URL
    canonicalization can't see.  Fixture: every 4th page of host h_j
    is mirrored on m_j (so cont(m_j) = 100% exactly, the pair must
    surface), and one 'BOILER' digest is planted on ALL 18 hosts —
    above the 10-host hot-digest cap, so it must be excluded before
    the pair join (without the cap it alone would materialize every
    host pair).  Cross-host planted text dups stay under the 90%
    containment bar and must not leak in."""
    from extractor.operators.crawl import host_mirror_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    h = F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string"))
    m = F.concat(F.lit("m"), (F.col("doc_id") % 9).cast("string"))
    primary = docs.select(h.alias("host"), F.md5("text").alias("digest"))
    mirror = docs.filter(F.col("doc_id") % 4 == 0).select(
        m.alias("host"), F.md5("text").alias("digest")
    )
    boiler = (
        primary.select("host")
        .unionAll(mirror.select("host"))
        .distinct()
        .withColumn("digest", F.md5(F.lit("BOILER")))
    )
    pages = primary.unionAll(mirror).unionAll(boiler)
    return host_mirror_pairs(
        pages, max_hosts_per_digest=10, min_containment_bp=9000
    )

@register(
    "canonical_map",
    """
    -- expected map re-derived per class (doc_id % 6): resolved
    -- redirect > rel=canonical (absolute normalized / relative
    -- resolved against the page host) > self; unresolved redirects
    -- (doc_id % 12 = 0) fall through to self, blank canonicals are
    -- ignored, the winner is lowercased with query/fragment stripped
    WITH base AS (
      SELECT doc_id,
             'https://Host' || (doc_id % 7) || '.Example.test/p/' || doc_id
               || '?utm=x' AS url,
             'https://host' || (doc_id % 7) || '.example.test' AS nhost
      FROM documents
    )
    SELECT url,
           CASE
             WHEN doc_id % 6 = 0 AND doc_id % 12 <> 0
               THEN 'https://final-' || doc_id || '.test/x'
             WHEN doc_id % 6 = 3
               THEN 'https://final-' || doc_id || '.test/x'
             WHEN doc_id % 6 = 1
               THEN 'https://canon-' || doc_id || '.test/a'
             WHEN doc_id % 6 = 2
               THEN nhost || '/canonical/' || doc_id
             ELSE nhost || '/p/' || doc_id
           END AS canonical_url,
           CASE
             WHEN (doc_id % 6 = 0 AND doc_id % 12 <> 0) OR doc_id % 6 = 3
               THEN 'redirect'
             WHEN doc_id % 6 IN (1, 2) THEN 'rel_canonical'
             ELSE 'self'
           END AS source
    FROM base
    """,
)
def q_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-identity consolidation (operators.crawl.canonical_url_map):
    resolved redirects beat the publisher's rel=canonical beat the
    URL itself, winner normalized — the one map dedup/PageRank/
    indexing key on instead of treating every variant as a distinct
    document.  Six fixture classes cover each precedence leg, an
    UNRESOLVED redirect falling through to self, relative-canonical
    host resolution, blank-canonical ignoring, and case/query/
    fragment normalization of every winner."""
    from extractor.operators.crawl import canonical_url_map

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id")
    url = F.concat(
        F.lit("https://Host"), (d % 7).cast("string"),
        F.lit(".Example.test/p/"), d.cast("string"), F.lit("?utm=x"),
    )
    rc = (
        F.when(
            d % 6 == 1,
            F.concat(
                F.lit("HTTPS://Canon-"), d.cast("string"), F.lit(".TEST/a?q=1#f")
            ),
        )
        .when(d % 6 == 2, F.concat(F.lit("/canonical/"), d.cast("string")))
        .when(d % 6 == 3, F.lit("/ignored"))
        .when(d % 6 == 4, F.lit(""))
        .otherwise(F.lit(None).cast("string"))
    )
    pages = docs.select(url.alias("url"), rc.alias("rel_canonical"))
    redirects = docs.filter((d % 6 == 0) | (d % 6 == 3)).select(
        url.alias("url"),
        F.concat(
            F.lit("https://Final-"), d.cast("string"), F.lit(".Test/x?s=1")
        ).alias("final_url"),
        F.lit(1).alias("hops"),
        (d % 12 != 0).alias("resolved"),
    )
    return canonical_url_map(pages, redirects)

@register(
    "anchor_spam",
    """
    -- farm hosts receive ONE exact phrase from every page
    -- (concentration 10000); organic hosts get distinct per-page
    -- anchors plus a 'home page' repeat from every 3rd page
    WITH anchors AS (
      SELECT 'farm' || (doc_id % 5) || '.test' AS dst_host,
             'buy cheap widgets now' AS a
      FROM documents
      UNION ALL
      SELECT 'org' || (doc_id % 7) || '.test',
             'article ' || doc_id || ' review'
      FROM documents
      UNION ALL
      SELECT 'org' || (doc_id % 7) || '.test', 'home page'
      FROM documents WHERE doc_id % 3 = 0
    ),
    counts AS (
      SELECT dst_host, a, count(*) AS n FROM anchors GROUP BY dst_host, a
    ),
    top1 AS (
      SELECT dst_host, a AS top_anchor, n AS top_n
      FROM (SELECT dst_host, a, n,
                   row_number() OVER (PARTITION BY dst_host
                                      ORDER BY n DESC, a) AS rk
            FROM counts)
      WHERE rk = 1
    ),
    totals AS (
      SELECT dst_host, sum(n) AS total, count(*) AS n_distinct
      FROM counts GROUP BY dst_host
    )
    SELECT t.dst_host, t.top_anchor, t.top_n::BIGINT AS top_n,
           s.total::BIGINT AS total, s.n_distinct::BIGINT AS n_distinct,
           ((10000 * t.top_n) // s.total)::BIGINT AS concentration_bp
    FROM top1 t JOIN totals s USING (dst_host)
    WHERE s.total >= 5
    """,
)
def q_anchor_spam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-anchor concentration per target host
    (operators.relevance.anchor_concentration) — the anchor-text face
    of link spam: the planted farm hosts collect one exact phrase
    from every page (concentration_bp = 10000 exactly), the organic
    hosts' profiles are dominated by distinct per-page anchors with a
    mild 'home page' repeat (their top anchor, ~33% of pages, but
    diluted to a low concentration).  k=1 bounded grouped_topk for
    the per-host argmax; totals come from the already-reduced count
    table."""
    from extractor.operators.relevance import anchor_concentration

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id")
    src = F.concat(F.lit("https://src.test/p"), d.cast("string"))
    farm = docs.select(
        src.alias("url"),
        F.lit(0).alias("seq"),
        F.concat(F.lit("https://farm"), (d % 5).cast("string"), F.lit(".test/x"))
        .alias("href"),
        F.lit("buy cheap widgets now").alias("anchor_text"),
    )
    organic = docs.select(
        src.alias("url"),
        F.lit(1).alias("seq"),
        F.concat(F.lit("https://org"), (d % 7).cast("string"), F.lit(".test/a"))
        .alias("href"),
        F.concat(F.lit("article "), d.cast("string"), F.lit(" review"))
        .alias("anchor_text"),
    )
    home = docs.filter(d % 3 == 0).select(
        src.alias("url"),
        F.lit(2).alias("seq"),
        F.concat(F.lit("https://org"), (d % 7).cast("string"), F.lit(".test/a"))
        .alias("href"),
        F.lit("home page").alias("anchor_text"),
    )
    links = farm.unionAll(organic).unionAll(home)
    return anchor_concentration(links, min_anchors=5)

@register(
    "host_link_stats",
    """
    -- Degree/reciprocity over a deterministic 41-host functional
    -- graph with planted multi-edges (they must collapse) and
    -- self-edges (they must drop).
    WITH raw AS (
      SELECT 'h' || (doc_id % 41)::VARCHAR AS a,
             'h' || ((doc_id * 7 + doc_id // 41) % 41)::VARCHAR AS b
      FROM documents
    ), e AS (
      SELECT DISTINCT a, b FROM raw WHERE a != b
    ), deg AS (
      SELECT host, sum(o)::BIGINT AS out_deg, sum(i)::BIGINT AS in_deg
      FROM (
        SELECT a AS host, 1 AS o, 0 AS i FROM e
        UNION ALL
        SELECT b AS host, 0 AS o, 1 AS i FROM e
      ) GROUP BY host
    ), recip AS (
      SELECT e.a AS host, count(*)::BIGINT AS reciprocal_deg
      FROM e JOIN e r ON e.a = r.b AND e.b = r.a
      GROUP BY e.a
    )
    SELECT deg.host, deg.out_deg, deg.in_deg,
           coalesce(recip.reciprocal_deg, 0)::BIGINT AS reciprocal_deg
    FROM deg LEFT JOIN recip ON deg.host = recip.host
    """,
)
def q_host_link_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph hygiene per host (webgraph.host_link_stats):
    distinct out/in degree and reciprocal degree — the link-farm
    signal (near-total reciprocity, out-degree far above in-degree) a
    rank build consults before trusting PageRank mass.  Multi-edges
    collapse via a distinct projection BEFORE anything shuffles wide,
    self-edges drop, degrees ride one grouped union pass, reciprocity
    is one self equi-join of the edge table on the reversed key."""
    from extractor.operators.webgraph import host_link_stats

    d = F.col("doc_id")
    edges = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (d % 41).cast("string")).alias("src_host"),
        F.concat(
            F.lit("h"), ((d * 7 + F.floor(d / 41)) % 41).cast("string")
        ).alias("dst_host"),
    )
    return host_link_stats(edges)

# One HITS iteration, unrolled for the oracle: auth from previous
# hubs, L1-normalize, hubs from the NEW auths, L1-normalize — all
# integer floor arithmetic, bit-identical to operators.webgraph.
# hits_int.
_HITS_ITER_SQL = """
    ar{K} AS (
      SELECT e.dst AS node, sum(e.w * h.hub) AS raw
      FROM wedges e JOIN h{PREV} h ON h.node = e.src GROUP BY e.dst
    ),
    a{K} AS (
      SELECT n.node,
             coalesce(m.raw, 0) * 1000000 //
               greatest((SELECT coalesce(sum(raw), 1) FROM ar{K}), 1) AS auth
      FROM nodes n LEFT JOIN ar{K} m ON m.node = n.node
    ),
    hr{K} AS (
      SELECT e.src AS node, sum(e.w * a.auth) AS raw
      FROM wedges e JOIN a{K} a ON a.node = e.dst GROUP BY e.src
    ),
    h{K} AS (
      SELECT n.node,
             coalesce(m.raw, 0) * 1000000 //
               greatest((SELECT coalesce(sum(raw), 1) FROM hr{K}), 1) AS hub
      FROM nodes n LEFT JOIN hr{K} m ON m.node = n.node
    )
"""

@register(
    "host_hits",
    f"""
    WITH hosts AS (
      SELECT doc_id, 'h' || (doc_id % 7) || '.example-42.test' AS shost
      FROM documents
    ),
    edges0 AS (
      SELECT shost AS src,
             'h' || ((doc_id + 1) % 7) || '.example-42.test' AS dst
      FROM hosts
      UNION ALL
      SELECT shost, 'h' || ((doc_id + 2) % 7) || '.example-42.test'
      FROM hosts
      UNION ALL
      SELECT shost, 'h' || ((doc_id + 3) % 7) || '.example-42.test'
      FROM hosts
      UNION ALL
      -- a pure-hub directory host: links out, nothing links to it
      SELECT 'dir.example-42.test', shost FROM hosts WHERE doc_id % 13 = 0
      UNION ALL
      -- a pure-authority host: everything cites it, it links nowhere
      SELECT shost, 'wiki.example-42.test' FROM hosts WHERE doc_id % 17 = 0
    ),
    wedges AS (SELECT src, dst, count(*) AS w FROM edges0 GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM wedges UNION SELECT dst FROM wedges),
    h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM nodes),
    {_HITS_ITER_SQL.format(K=1, PREV=0)},
    {_HITS_ITER_SQL.format(K=2, PREV=1)}
    SELECT a2.node, a2.auth::BIGINT AS auth, h2.hub::BIGINT AS hub
    FROM a2 JOIN h2 USING (node)
    """,
)
def q_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph HITS (operators.webgraph.hits_int): the hub/
    authority split over the same 7-host synthetic graph as
    host_pagerank, extended with a pure-hub directory host (out-edges
    only — must end with auth exactly 0) and a pure-authority wiki
    host (in-edges only — hub exactly 0).  The roles PageRank cannot
    separate: a page's citedness vs its curation quality.  The oracle
    unrolls both L1-normalized half-steps ×2 in integer floor
    arithmetic — any drift in the join order, multiplicity weighting
    or normalization flips every rank."""
    from extractor.operators.webgraph import hits_int

    docs = _docs(spark, sf_dir).select("doc_id")
    d = F.col("doc_id")

    def h(j: int):
        return F.concat(
            F.lit("h"), ((d + j) % 7).cast("string"), F.lit(".example-42.test")
        )

    shost = h(0)
    edges = (
        docs.select(
            F.explode(
                F.array(
                    F.struct(shost.alias("src"), h(1).alias("dst")),
                    F.struct(shost.alias("src"), h(2).alias("dst")),
                    F.struct(shost.alias("src"), h(3).alias("dst")),
                    F.struct(
                        F.when(d % 13 == 0, F.lit("dir.example-42.test")).alias(
                            "src"
                        ),
                        shost.alias("dst"),
                    ),
                    F.struct(
                        shost.alias("src"),
                        F.when(d % 17 == 0, F.lit("wiki.example-42.test")).alias(
                            "dst"
                        ),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    return hits_int(edges, iterations=2)

@register(
    "host_sections",
    """
    -- URL-structure profile: per (host, first path segment) url
    -- count + share of the host's url space; classes plant a
    -- case-folded section, a path-less root, and a nested section
    WITH urls AS (
      SELECT doc_id,
             'h' || (doc_id % 11) || '.site.test' AS host,
             CASE doc_id % 4 WHEN 0 THEN '/wiki'
                             WHEN 1 THEN '/tag'
                             WHEN 2 THEN '/'
                             ELSE '/product' END AS section
      FROM documents
    ), c AS (
      SELECT host, section, count(*) AS n_urls FROM urls GROUP BY 1, 2
    ), t AS (
      SELECT host, sum(n_urls) AS host_urls FROM c GROUP BY 1
    )
    SELECT c.host, c.section, c.n_urls::BIGINT AS n_urls,
           t.host_urls::BIGINT AS host_urls,
           (c.n_urls * 10000 // t.host_urls)::BIGINT AS share_bp
    FROM c JOIN t USING (host)
    """,
)
def q_host_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL-section profile (operators.webgraph.
    host_path_profiles): the crawl-budget view — which site sections
    ('/wiki', '/tag', '/product', root) own what share of a host's
    URL space, the signal that flags tag/search crawler traps before
    they flood the frontier.  Fixture classes exercise the
    section case fold ('/Tag/' → '/tag'), the path-less root
    ('https://host' → '/'), and nested paths ('/product/x/…' →
    '/product'); the oracle restates sections by class arithmetic so
    any extraction off-by-one flips shares."""
    from extractor.operators.webgraph import host_path_profiles

    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 11).cast("string"), F.lit(".site.test"))
    path = (
        F.when(d % 4 == 0, F.concat(F.lit("/wiki/"), d.cast("string")))
        .when(d % 4 == 1, F.concat(F.lit("/Tag/"), d.cast("string")))
        .when(d % 4 == 2, F.lit(""))
        .otherwise(F.concat(F.lit("/product/x/"), d.cast("string")))
    )
    urls = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://"), host, path).alias("url")
    )
    return host_path_profiles(urls)

@register(
    "degree_histogram",
    f"""
    WITH {_BOILER_EDGES_SQL},
    edges AS (
      SELECT b.url AS src, '/x/' || (b.doc_id + f.doff) || '/' || i.i AS dst
      FROM boiler b, farm f,
           LATERAL (SELECT unnest(generate_series(0, f.n - 1)) AS i) i
    ), de AS (
      SELECT DISTINCT src, dst FROM edges
    ), deg AS (
      SELECT 'out' AS direction, src AS node, count(*) AS deg
      FROM de GROUP BY src
      UNION ALL
      SELECT 'in', dst, count(*) FROM de GROUP BY dst
    )
    SELECT direction, (length(bin(deg)) - 1)::BIGINT AS deg_bucket,
           count(*)::BIGINT AS n_nodes, sum(deg)::BIGINT AS total_edges,
           max(deg)::BIGINT AS max_degree
    FROM deg GROUP BY 1, 2
    """,
)
def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph degree distribution (operators.webgraph.
    degree_histogram) over the extracted page-level outlink graph —
    the observability read before trusting rank mass (link farms and
    nav explosions surface as mass in the top out-degree buckets).
    Distinct edges (the boiler fixture's overlapping farm lists plant
    real duplicate (src, dst) pairs the distinct must collapse),
    degrees in one grouped union pass, power-of-two buckets via
    base-2 string length — integer-exact in both engines."""
    from extractor.operators.webgraph import degree_histogram

    edges = q_html_outlinks(spark, sf_dir).select(
        F.col("url").alias("src"), F.col("href").alias("dst")
    )
    return degree_histogram(edges)

_LP_ITER_SQL = """
    v{K} AS (
      SELECT s.b AS node, l.label, sum(s.w) AS v
      FROM sym s JOIN l{PREV} l ON l.node = s.a GROUP BY 1, 2
    ),
    a{K} AS (
      SELECT node, label, v AS votes FROM (
        SELECT node, label, v,
               row_number() OVER (PARTITION BY node
                                  ORDER BY v DESC, label) AS rn
        FROM v{K}) t WHERE rn = 1
    ),
    l{K} AS (
      SELECT node, label, 0::BIGINT AS votes FROM seeds
      UNION ALL
      SELECT a.node, a.label, a.votes::BIGINT FROM a{K} a
      WHERE a.node NOT IN (SELECT node FROM seeds)
    )
"""

@register(
    "host_categories",
    f"""
    WITH hosts AS (
      SELECT doc_id, doc_id % 11 AS a FROM documents
    ), e0 AS (
      SELECT 'h' || a AS src, 'h' || ((a + 1) % 11) AS dst FROM hosts
      UNION ALL
      SELECT 'h' || a, 'h' || ((a + 3) % 11) FROM hosts
    ), sym AS (
      SELECT a, b, count(*) AS w FROM (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst, src FROM e0
      ) u WHERE a <> b GROUP BY 1, 2
    ), seeds AS (
      SELECT 'h0' AS node, 'news' AS label
      UNION ALL SELECT 'h5', 'shop'
    ), l0 AS (
      SELECT node, label, 0::BIGINT AS votes FROM seeds
    ),
    {_LP_ITER_SQL.format(K=1, PREV=0)},
    {_LP_ITER_SQL.format(K=2, PREV=1)}
    SELECT node, label, votes FROM l2
    """,
)
def q_host_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-category propagation
    (operators.webgraph.label_propagation_int): two seed hosts
    ('news', 'shop') spread over an 11-host ring-with-chords graph by
    weighted majority vote — the categorical topic axis beside
    TrustRank's scalar trust; clamped seeds, label-ascending tie
    break, integer votes.  The oracle unrolls both iterations with
    the window-argmax formulation — any drift in symmetrization,
    weighting, clamping or the tie rule flips labels."""
    from extractor.operators.webgraph import label_propagation_int

    d = F.col("doc_id")
    a = (d % 11).cast("string")
    docs = _docs(spark, sf_dir).select("doc_id")
    edges = docs.select(
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.lit("h"), a).alias("src"),
                    F.concat(F.lit("h"), ((d + 1) % 11).cast("string")).alias(
                        "dst"
                    ),
                ),
                F.struct(
                    F.concat(F.lit("h"), a).alias("src"),
                    F.concat(F.lit("h"), ((d + 3) % 11).cast("string")).alias(
                        "dst"
                    ),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    seeds = docs.sparkSession.createDataFrame(
        [("h0", "news"), ("h5", "shop")], "node string, label string"
    )
    return label_propagation_int(edges, seeds, iterations=2)


@register(
    "host_reciprocity",
    """
    -- link-exchange signal: per host, fraction of distinct
    -- out-neighbors that link back; fixture gives h0-h2 out-offsets
    -- {1,2,3,4} (the +4 edge reciprocates via the +3 back-edge) and
    -- h3-h6 offsets {1,2,3} (only h4-h6's +3 edge reciprocates)
    WITH hosts AS (
      SELECT doc_id, doc_id % 7 AS hi FROM documents
    ), edges AS (
      SELECT 'h' || hi || '.example-42.test' AS src,
             'h' || ((hi + 1) % 7) || '.example-42.test' AS dst FROM hosts
      UNION ALL
      SELECT 'h' || hi || '.example-42.test',
             'h' || ((hi + 2) % 7) || '.example-42.test' FROM hosts
      UNION ALL
      SELECT 'h' || hi || '.example-42.test',
             'h' || ((hi + 3) % 7) || '.example-42.test' FROM hosts
      UNION ALL
      SELECT 'h' || hi || '.example-42.test',
             'h' || ((hi + 4) % 7) || '.example-42.test' FROM hosts
      WHERE hi < 3
    ), e AS (
      SELECT DISTINCT src AS s, dst AS d FROM edges WHERE src <> dst
    ), j AS (
      SELECT e.s, CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END AS rec
      FROM e LEFT JOIN e r ON r.s = e.d AND r.d = e.s
    )
    SELECT s AS host, count(*)::BIGINT AS n_out,
           sum(rec)::BIGINT AS n_reciprocal,
           (sum(rec) * 10000 // count(*))::BIGINT AS recip_bp
    FROM j GROUP BY s
    """,
)
def q_host_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host link reciprocity (operators.webgraph.host_reciprocity):
    mutual-linking rate over the host graph — the link-exchange /
    spam-ring triage signal that runs before TrustRank needs a seed
    set.  One distinct, one reversed-composite-key self-equi-join,
    one aggregate — all on the ~10^4×-smaller host graph."""
    from extractor.operators.webgraph import host_reciprocity

    docs = _docs(spark, sf_dir).select((F.col("doc_id") % 7).alias("hi"))

    def h(off: int):
        return F.concat(
            F.lit("h"),
            ((F.col("hi") + off) % 7).cast("string"),
            F.lit(".example-42.test"),
        )

    parts = [
        docs.select(h(0).alias("src_host"), h(k).alias("dst_host"))
        for k in (1, 2, 3)
    ] + [
        docs.filter(F.col("hi") < 3).select(
            h(0).alias("src_host"), h(4).alias("dst_host")
        )
    ]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionAll(p)
    return host_reciprocity(edges)


@register(
    "cocitation_pairs",
    f"""
    -- co-citation similarity (Small 1973): targets linked by the same
    -- page, hub sources capped BEFORE the self-join (max_df
    -- discipline); fixture = the boiler link farms, whose overlapping
    -- doc-offset targets co-occur across consecutive boiler pages
    WITH {_BOILER_EDGES_SQL},
    links AS (
      SELECT b.url AS s, '/x/' || (b.doc_id + f.doff) || '/' || i.i AS d
      FROM boiler b, farm f,
           LATERAL (SELECT unnest(generate_series(0, f.n - 1)) AS i) i
    ), e AS (
      SELECT DISTINCT s, d FROM links
    ), keep AS (
      SELECT s FROM e GROUP BY s HAVING count(*) <= 64
    ), p AS (
      SELECT x.d AS a, y.d AS b
      FROM e x JOIN e y ON x.s = y.s AND x.d < y.d
      JOIN keep k ON k.s = x.s
    )
    SELECT a, b, count(*)::BIGINT AS n_cocite
    FROM p GROUP BY a, b HAVING count(*) >= 2
    """,
)
def q_cocitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation pairs over real extracted outlinks
    (operators.webgraph.cocitation_pairs): two URLs repeatedly linked
    from the same pages are related — the link-graph relatedness
    signal (and a mirror-detection precursor: perfect co-citation ≈
    duplicated nav).  Hub sources above max_out distinct targets drop
    BEFORE the self-join — the max_df discipline that keeps one
    directory page from emitting 10^9 pairs at web scale."""
    from extractor.config import ExtractConfig
    from extractor.operators.webgraph import cocitation_pairs, html_outlinks
    from extractor.pipeline import _quarantine_error, route
    from extractor.testgen import TEST_MAX_BYTES, pages_df

    cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)
    routed = route(pages_df(spark, sf_dir)).withColumn(
        "route_error", _quarantine_error(cfg)
    )
    valid_html = routed.filter(
        (F.col("doc_type") == "html") & F.col("route_error").isNull()
    )
    edges = html_outlinks(valid_html)
    return cocitation_pairs(edges, src_col="url", dst_col="href")


_SPAM_MASS_FIXTURE_SQL = """
    hosts AS (
      SELECT doc_id, 'h' || (doc_id % 7) || '.example-42.test' AS shost
      FROM documents
    ),
    edges AS (
      SELECT shost AS src,
             'h' || ((doc_id + 1) % 7) || '.example-42.test' AS dst
      FROM hosts
      UNION ALL
      SELECT shost, 'h' || ((doc_id + 3) % 7) || '.example-42.test'
      FROM hosts
      UNION ALL
      SELECT 's' || (doc_id % 3) || '.spam-42.test',
             's' || ((doc_id + 1) % 3) || '.spam-42.test'
      FROM hosts WHERE doc_id % 5 = 0
      UNION ALL
      SELECT 's' || (doc_id % 3) || '.spam-42.test',
             'h' || (doc_id % 7) || '.example-42.test'
      FROM hosts WHERE doc_id % 5 = 0
    ),
    odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    nodes AS (
      SELECT node,
             node IN ('h0.example-42.test', 'h3.example-42.test') AS is_seed
      FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
    )
"""


@register(
    "spam_mass",
    # Same fixture as host_trustrank (trusted ring + self-endorsing
    # spam triangle that links OUT to the ring but is never linked
    # from it); the oracle unrolls BOTH rank chains — uniform-teleport
    # PageRank (ip0..ip3) and seeded TrustRank (it0..it3) — then
    # restates the integer ppm normalization and relative-mass
    # formula, so Spark and DuckDB agree bit-for-bit.
    f"""
    WITH {_SPAM_MASS_FIXTURE_SQL},
    ip0 AS (
      SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes
    ),
    {_PAGERANK_ITER_SQL.format(K='p1', PREV='p0')},
    {_PAGERANK_ITER_SQL.format(K='p2', PREV='p1')},
    {_PAGERANK_ITER_SQL.format(K='p3', PREV='p2')},
    it0 AS (
      SELECT node, is_seed,
             CAST(CASE WHEN is_seed THEN 1000000000000 ELSE 0 END AS BIGINT)
               AS rank
      FROM nodes
    ),
    {_TRUSTRANK_ITER_SQL.format(K='t1', PREV='t0')},
    {_TRUSTRANK_ITER_SQL.format(K='t2', PREV='t1')},
    {_TRUSTRANK_ITER_SQL.format(K='t3', PREV='t2')},
    j AS (
      SELECT p.node, p.rank AS pr, t.rank AS tr
      FROM ip3 p JOIN it3 t ON p.node = t.node
    ),
    tot AS (SELECT sum(pr) AS tp, sum(tr) AS tt FROM j),
    ppm AS (
      SELECT node,
             pr // greatest(tp // 1000000, 1) AS pr_ppm,
             tr // greatest(tt // 1000000, 1) AS tr_ppm
      FROM j, tot
    )
    SELECT node, pr_ppm, tr_ppm,
           greatest(((pr_ppm - tr_ppm) * 1000) // greatest(pr_ppm, 1),
                    0)::BIGINT AS spam_mass_pm
    FROM ppm
    """,
)
def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative spam mass (operators.webgraph.spam_mass_int — Gyöngyi
    et al., VLDB 2006) over the host_trustrank fixture: the spam
    triangle's hosts collect real uniform-teleport PageRank (every
    node gets the 15% floor plus their mutual endorsements) but ZERO
    seeded trust, so their relative spam mass is 1000‰ exactly, while
    the trusted ring's hosts sit near 0 — the thresholdable demotion
    signal a curation pipeline applies to a host blocklist before
    extraction ever runs.  Integer-exact end to end: both rank loops
    at PR_SCALE, ppm self-normalization via div, relative mass in
    per-mille."""
    from extractor.operators.webgraph import spam_mass_int

    docs = _docs(spark, sf_dir).select("doc_id")

    def h(j: int):
        return F.concat(
            F.lit("h"), ((F.col("doc_id") + j) % 7).cast("string"),
            F.lit(".example-42.test"),
        )

    def s(j: int):
        return F.concat(
            F.lit("s"), ((F.col("doc_id") + j) % 3).cast("string"),
            F.lit(".spam-42.test"),
        )

    trusted = docs.select(
        h(0).alias("src"), F.explode(F.array(h(1), h(3))).alias("dst")
    )
    spam = docs.filter(F.col("doc_id") % 5 == 0).select(
        s(0).alias("src"), F.explode(F.array(s(1), h(0))).alias("dst")
    )
    seeds = spark.createDataFrame(
        [("h0.example-42.test",), ("h3.example-42.test",)], "node string"
    )
    return spam_mass_int(trusted.unionAll(spam), seeds, iterations=3)
