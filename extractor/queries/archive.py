"""Common-Crawl archive formats: WARC/WET/WAT/CDXJ round-trips, integrity, JSONL interchange, archive e2e chains."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.queries._core import (  # noqa: F401
    register,
    _GOPHER_STOPS,
    _GOPHER_STOPS_SQL,
    _docs,
)

@register(
    "wat_roundtrip",
    """
    -- (url, date, title, n_links, links_md5) re-derived from
    -- documents: every 7th title carries JSON-escaped characters,
    -- every 5th doc has ZERO links (empty array, md5('') not NULL)
    SELECT 'https://crawl.test/meta/' || doc_id::VARCHAR AS url,
           '2025-06-03T00:00:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || 'Z'
             AS warc_date,
           CASE WHEN doc_id % 7 = 0
                THEN 'Ti"tle \\ ' || doc_id
                ELSE 'Title ' || doc_id END AS title,
           CASE WHEN doc_id % 5 = 0 THEN 0
                ELSE doc_id % 4 + 1 END::BIGINT AS n_links,
           md5(CASE WHEN doc_id % 5 = 0 THEN ''
                ELSE (SELECT string_agg('https://out' || ((doc_id + j) % 50)
                                        || '.test/l' || j, '|' ORDER BY j)
                      FROM unnest(generate_series(0, doc_id % 4)) t(j))
                END) AS links_md5
    FROM documents
    """,
)
def q_wat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT segment export + re-ingest (sources.wat) — the METADATA
    face of a crawl archive, completing the Common-Crawl format
    triple (WARC raw / WET text / WAT links): documents →
    ``to_wat_records`` (one to_json + concat per row) → Spark text
    writer → ``read_wat`` (block-splittable lineSep scan, ONE
    from_json per record).  The oracle derives (url, date, title,
    n_links, links_md5) straight from documents, so a green row
    proves the JSON envelope round-trips exactly — titles with
    quotes/backslashes (every 7th doc) pin the escaping, zero-link
    docs (every 5th) pin empty-vs-NULL semantics."""
    import tempfile

    from extractor.sources.wat import read_wat, to_wat_records

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://crawl.test/meta/"), d.cast("string")).alias("url"),
        F.concat(
            F.lit("2025-06-03T00:00:"),
            F.lpad((d % 60).cast("string"), 2, "0"),
            F.lit("Z"),
        ).alias("warc_date"),
        F.when(
            d % 7 == 0,
            F.concat(F.lit('Ti"tle \\ '), d.cast("string")),
        ).otherwise(F.concat(F.lit("Title "), d.cast("string"))).alias("title"),
        F.when(d % 5 == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), (d % 4).cast("int")),
                lambda j: F.concat(
                    F.lit("https://out"),
                    ((d + j) % 50).cast("string"),
                    F.lit(".test/l"),
                    j.cast("string"),
                ),
            )
        ).alias("links"),
    )
    out = tempfile.mkdtemp(prefix="wat_rt_") + "/segments"
    to_wat_records(docs.repartition(4)).write.mode("overwrite").text(out)
    return read_wat(spark, out).select(
        "url",
        "warc_date",
        "title",
        F.size("links").cast("long").alias("n_links"),
        F.md5(F.array_join("links", "|")).alias("links_md5"),
    )

@register(
    "wet_roundtrip",
    """
    SELECT 'https://crawl.test/doc/' || doc_id::VARCHAR AS url,
           '2025-06-01T00:00:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || 'Z'
             AS warc_date,
           md5(text) AS text_md5,
           length(text)::BIGINT AS n_chars
    FROM documents
    """,
)
def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET segment export + re-ingest (sources.wet): documents →
    ``to_wet_records`` (one codegen'd concat per row) → Spark text
    writer (4 part files, no collect) → ``read_wet`` (block-splittable
    ``lineSep`` scan + expression-only header parse).  The oracle
    derives (url, date, md5, length) straight from ``documents``, so
    a green row proves the FILE round-trip is lossless — any framing
    bug (trailer strip, header regex, warcinfo skip) breaks the hash.
    At 100 TB both halves scale like the scan: formatting is map-only
    and the read splits segments at block boundaries."""
    import tempfile

    from extractor.sources.wet import read_wet, to_wet_records

    docs = _docs(spark, sf_dir).select(
        F.concat(
            F.lit("https://crawl.test/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.concat(
            F.lit("2025-06-01T00:00:"),
            F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
            F.lit("Z"),
        ).alias("warc_date"),
        "text",
    )
    out = tempfile.mkdtemp(prefix="wet_rt_") + "/segments"
    to_wet_records(docs.repartition(4)).write.mode("overwrite").text(out)
    return read_wet(spark, out).select(
        "url",
        "warc_date",
        F.md5(F.col("text")).alias("text_md5"),
        F.length("text").cast("long").alias("n_chars"),
    )

@register(
    "warc_roundtrip",
    """
    SELECT 'https://crawl.test/page/' || doc_id::VARCHAR AS url,
           '2025-06-02T00:00:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || 'Z'
             AS warc_date,
           CASE WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END AS http_status,
           CASE WHEN doc_id % 7 = 0 THEN 'application/pdf'
                ELSE 'text/html' END AS content_type,
           md5(text) AS html_md5,
           length(text)::BIGINT AS n_chars
    FROM documents
    """,
)
def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-WARC segment export + re-ingest (sources.warc): documents →
    ``to_warc_records`` (WARC headers + captured HTTP response, one
    codegen'd concat per row) → text writer (4 part files) →
    ``read_warc`` (block-splittable ``lineSep`` scan, expression-only
    WARC+HTTP header parse).  The oracle re-derives every column —
    status line, Content-Type, payload md5 — straight from
    ``documents``, so a green row proves the raw-archive round-trip
    is lossless through BOTH header layers.  Non-200 captures are
    kept as rows (status is data, drop policy is the caller's)."""
    import tempfile

    from extractor.sources.warc import read_warc, to_warc_records

    docs = _docs(spark, sf_dir).select(
        F.concat(
            F.lit("https://crawl.test/page/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.concat(
            F.lit("2025-06-02T00:00:"),
            F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
            F.lit("Z"),
        ).alias("warc_date"),
        F.when(F.col("doc_id") % 13 == 0, 404).otherwise(200).alias("http_status"),
        F.when(F.col("doc_id") % 7 == 0, "application/pdf")
        .otherwise("text/html")
        .alias("content_type"),
        F.col("text").alias("html"),
    )
    out = tempfile.mkdtemp(prefix="warc_rt_") + "/segments"
    to_warc_records(docs.repartition(4)).write.mode("overwrite").text(out)
    return read_warc(spark, out).select(
        "url",
        "warc_date",
        "http_status",
        "content_type",
        F.md5(F.col("html")).alias("html_md5"),
        F.length("html").cast("long").alias("n_chars"),
    )

@register(
    "e2e_warc_extract",
    """
    -- Every html-routed url (incl. the empty/oversize quarantine
    -- classes — their payloads are UTF-8-safe) must extract
    -- IDENTICALLY from a raw-WARC archive round-trip and from the
    -- direct pages table: success flips only by class, agreement is
    -- unconditional.  Binary payload classes (pdf/image/exe) cannot
    -- ride a text-framed archive and are out of scope by routing.
    WITH cls AS (
      SELECT doc_id,
        CASE WHEN doc_id % 97 = 0 THEN 'reject_oversize'
             ELSE (['html_simple','html_simple','html_simple','html_simple',
                    'html_simple','html_simple','image_png','image_jpg',
                    'html_boiler','html_boiler','html_boiler','html_boiler',
                    'pdf_small','pdf_small','pdf_small','pdf_large',
                    'html_grounded','html_grounded','reject_empty',
                    'reject_ext'])[(doc_id % 20) + 1]
        END AS cls
      FROM documents
    ), htmlset AS (
      SELECT doc_id, cls,
        'https://example-42.test/' || cls || '/' || printf('%06d', doc_id)
          || '.html' AS url
      FROM cls
      WHERE cls LIKE 'html%' OR cls IN ('reject_empty', 'reject_oversize')
    )
    SELECT url,
           (cls LIKE 'html%') AS success,
           true AS warc_agrees
    FROM htmlset
    """,
)
def q_e2e_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-crawl-archive → extraction, end-to-end (the north-star
    input shape): html-routed pages are exported as raw WARC
    ``response`` records (sources.warc), re-ingested through the
    block-splittable reader, and pushed through the SAME
    ``run_extraction`` as the direct parquet path; the query emits,
    per url, the direct path's ``success`` and ``warc_agrees`` =
    (success AND extracted-text md5 AND error all equal across the
    two ingest paths).  A green row proves a user can point this
    engine at raw crawl segments instead of a pages table and get
    byte-identical markdown — any WARC framing or header-parse bug
    flips ``warc_agrees``.  Both legs are one extraction run over the
    html subset; the WARC leg adds a map-only format + splittable
    re-scan, so the chain scales exactly like the flagship."""
    import tempfile

    from extractor.config import ExtractConfig
    from extractor.pipeline import route, run_extraction
    from extractor.sources.warc import read_warc, to_warc_records
    from extractor.testgen import TEST_MAX_BYTES, pages_df

    cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)
    pages = pages_df(spark, sf_dir)
    html_pages = route(pages).filter(F.col("doc_type") == "html").drop("doc_type")

    direct = run_extraction(spark, html_pages, cfg).select(
        "url",
        "success",
        F.md5(F.col("text")).alias("text_md5"),
        "error",
    )

    out = tempfile.mkdtemp(prefix="warc_e2e_") + "/segments"
    to_warc_records(
        html_pages.repartition(4).select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_date"),
            F.lit(200).alias("http_status"),
            F.lit("text/html").alias("content_type"),
            F.col("html").cast("string").alias("html"),
        )
    ).write.mode("overwrite").text(out)

    reingested = read_warc(spark, out).select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        F.encode(F.col("html"), "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    via_warc = run_extraction(spark, reingested, cfg).select(
        "url",
        F.col("success").alias("w_success"),
        F.md5(F.col("text")).alias("w_text_md5"),
        F.col("error").alias("w_error"),
    )

    return direct.join(via_warc, "url").select(
        "url",
        "success",
        (
            (F.col("success") == F.col("w_success"))
            & F.col("text_md5").eqNullSafe(F.col("w_text_md5"))
            & F.col("error").eqNullSafe(F.col("w_error"))
        ).alias("warc_agrees"),
    )

def _gopher_keep_ctes(src: str) -> str:
    """feats/measures CTE pair + ``kept`` view over table ``src``
    (columns: url, text) — the oracle mirror of gopher_rules' keep
    decision, same expressions as the gopher_quality oracle but keyed
    by url for the e2e chain."""
    return f"""e_feats AS (
      SELECT url, text,
             regexp_split_to_array(text, '[ \n]+') AS w,
             string_split(text, chr(10)) AS lines
      FROM {src}
    ), e_m AS (
      SELECT url, text, len(w) AS n_words, greatest(len(w), 1) AS n_safe,
             list_sum(list_transform(w, t -> length(t))) AS total_len,
             len(list_filter(w, t -> contains(t, '#') OR contains(t, '...')))
               AS n_symbol,
             len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
             greatest(len(lines), 1) AS n_lines,
             len(list_filter(lines, l -> starts_with(l, '- ')
                 OR starts_with(l, '* ') OR starts_with(l, '•'))) AS n_bullet,
             len(list_filter(lines, l -> ends_with(l, '...'))) AS n_ellipsis,
             len(list_intersect(w, {_GOPHER_STOPS_SQL})) AS stop_hits
      FROM e_feats
    ), kept AS (
      SELECT url, text FROM e_m
      WHERE n_words BETWEEN 50 AND 100000
        AND total_len * 100 // n_safe BETWEEN 300 AND 1000
        AND n_symbol * 10000 // n_safe <= 1000
        AND n_alpha * 10000 // n_safe >= 8000
        AND n_bullet * 10000 // n_lines < 9000
        AND n_ellipsis * 10000 // n_lines <= 3000
        AND stop_hits >= 2
    )"""

@register(
    "e2e_wet_corpus",
    f"""
    -- end-to-end: WET-exported crawl (with a mirror-host duplicate
    -- for every 20th doc) -> gopher keep -> content dedup (min url
    -- canonical) -> deterministic shard manifest.  The oracle derives
    -- from `documents` directly: wet_roundtrip proves the file
    -- round-trip is byte-lossless, so the chains agree iff every
    -- downstream stage matches.
    WITH corpus AS (
      SELECT 'https://crawl.test/doc/' || doc_id::VARCHAR AS url, text
      FROM documents
      UNION ALL
      SELECT 'https://mirror.test/doc/' || doc_id::VARCHAR AS url, text
      FROM documents WHERE doc_id % 20 = 0
    ), {_gopher_keep_ctes('corpus')},
    canon AS (
      SELECT min(url) AS url, min(length(string_split(text, ' ')))::BIGINT AS n_tokens
      FROM kept GROUP BY md5(text)
    ), sharded AS (
      SELECT url, n_tokens,
             ('0x' || substr(md5(url), 1, 15))::BIGINT AS okey
      FROM canon
    )
    SELECT (okey % 8)::BIGINT AS shard,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           md5(string_agg(url, ',' ORDER BY okey, url)) AS order_md5
    FROM sharded GROUP BY okey % 8
    """,
)
def q_e2e_wet_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END crawl-to-corpus chain, every stage the engine's own
    operator: WET segment EXPORT (sources.wet.to_wet_records, 4 part
    files on disk) → block-splittable RE-INGEST (read_wet) → Gopher
    quality gate (textstats.gopher_rules) → exact content dedup
    (min-url canonical per text md5 — the mirror-host duplicate
    planted on every 20th doc collapses here) → deterministic shard
    manifest (packing.assign_shards + order_md5 digest).  This is the
    "switch your crawl pipeline to this repo" demonstration: one
    registry row per output shard, and the DuckDB oracle re-derives
    the whole chain from `documents`, so a regression ANYWHERE — WET
    framing, quality predicate, dedup canonical rule, shard hash,
    order — flips the row.

    Scale: export/ingest scale like the text scan (map-only framing,
    block-splittable read); the gate is expression-only; dedup is one
    md5 shuffle; the manifest is one grouped aggregate.  No stage
    holds state on the driver."""
    import tempfile

    from extractor.operators.packing import assign_shards
    from extractor.operators.textstats import gopher_rules
    from extractor.sources.wet import read_wet, to_wet_records

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    date = F.concat(
        F.lit("2025-06-01T00:00:"),
        F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
        F.lit("Z"),
    )
    crawl = docs.select(
        F.concat(F.lit("https://crawl.test/doc/"), F.col("doc_id").cast("string"))
        .alias("url"),
        date.alias("warc_date"),
        "text",
    )
    mirror = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.concat(F.lit("https://mirror.test/doc/"), F.col("doc_id").cast("string"))
        .alias("url"),
        date.alias("warc_date"),
        "text",
    )
    out = tempfile.mkdtemp(prefix="wet_e2e_") + "/segments"
    to_wet_records(crawl.unionByName(mirror).repartition(4)).write.mode(
        "overwrite"
    ).text(out)

    pages = read_wet(spark, out)
    keep = gopher_rules(F.col("text"), stopwords=_GOPHER_STOPS)["keep"]
    kept = pages.filter(keep).select(
        "url", "text", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    canon = kept.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("url").alias("url"), F.min("n_tokens").alias("n_tokens")
    )
    sharded = assign_shards(canon.select("url", "n_tokens"), n_shards=8, id_col="url")
    ordered = F.array_sort(F.collect_list(F.struct(F.col("okey"), F.col("url"))))
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(",", F.transform(ordered, lambda s: s["url"]))
        ).alias("order_md5"),
    ).select("shard", "n_docs", "n_tokens", "order_md5")

@register(
    "warc_integrity",
    """
    -- The separator-framing trade, MEASURED: bodies that genuinely
    -- end in CR/LF (every 6th doc gets a planted '\\n\\n' tail; every
    -- 15th a '\\r\\n') lose exactly those trailing bytes through the
    -- splittable reader; everything else round-trips intact.  The
    -- oracle derives declared/actual/lost from documents directly.
    WITH bodies AS (
      SELECT 'https://i.test/' || doc_id::VARCHAR AS url,
             text || CASE WHEN doc_id % 6 = 0 THEN chr(10) || chr(10)
                          WHEN doc_id % 15 = 0 THEN chr(13) || chr(10)
                          ELSE '' END AS body
      FROM documents
    )
    SELECT url,
           strlen(body)::BIGINT AS declared_length,
           strlen(rtrim(body, chr(13) || chr(10)))::BIGINT
             AS actual_length,
           (strlen(body) - strlen(rtrim(body, chr(13) || chr(10))))::BIGINT
             AS lost_bytes,
           strlen(body) = strlen(rtrim(body, chr(13) || chr(10)))
             AS intact
    FROM bodies
    """,
)
def q_warc_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framing-integrity audit over a raw-WARC round-trip: the reader
    now surfaces the WARC header's declared Content-Length, so the
    documented separator-framing trade (all trailing CR/LF stripped,
    because the record trailer is indistinguishable from body bytes)
    is a MEASURED per-record quantity — (declared, actual,
    lost_bytes, intact) per url — instead of a docstring promise.  An
    operator team alerts on lost_bytes exceeding the trailer size or
    intact-rate drops (both would mean real corruption, not framing).

    Map-only after the splittable scan: two length expressions and a
    comparison, no shuffle."""
    import tempfile

    from extractor.sources.warc import read_warc, to_warc_records

    d = F.col("doc_id")
    ds = d.cast("string")
    docs = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://i.test/"), ds).alias("url"),
        F.lit("2025-06-02T00:00:00Z").alias("warc_date"),
        F.lit(200).alias("http_status"),
        F.lit("text/html").alias("content_type"),
        F.concat(
            F.col("text"),
            F.when(d % 6 == 0, F.lit("\n\n"))
            .when(d % 15 == 0, F.lit("\r\n"))
            .otherwise(F.lit("")),
        ).alias("html"),
    )
    out = tempfile.mkdtemp(prefix="warc_integ_") + "/segments"
    to_warc_records(docs.repartition(4)).write.mode("overwrite").text(out)
    back = read_warc(spark, out)
    actual = F.octet_length("html")
    return back.select(
        "url",
        F.col("declared_length"),
        actual.cast("long").alias("actual_length"),
        (F.col("declared_length") - actual).cast("long").alias("lost_bytes"),
        (F.col("declared_length") == actual).alias("intact"),
    )

@register(
    "cdx_roundtrip",
    """
    -- expected rows restated by CLASS ARITHMETIC (never by re-running
    -- the engine): mixed-case host/path classes must fold to one SURT,
    -- the %13 path-less class keys at ')/' , the %4 class keeps its
    -- (lowercased) query
    SELECT 'org,site' || (doc_id % 37)::VARCHAR || ',www)' ||
           CASE WHEN doc_id % 13 = 0 THEN '/'
                WHEN doc_id % 4 = 0
                  THEN '/docs/' || doc_id::VARCHAR || '?page='
                       || (doc_id % 7)::VARCHAR
                ELSE '/docs/' || doc_id::VARCHAR END AS surt,
           '202506' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
             || '0000' || lpad((doc_id % 60)::VARCHAR, 2, '0') AS ts14,
           'https://' ||
           CASE WHEN doc_id % 5 = 0
                THEN 'WWW.Site' || (doc_id % 37)::VARCHAR || '.ORG'
                ELSE 'www.site' || (doc_id % 37)::VARCHAR || '.org' END ||
           CASE WHEN doc_id % 13 = 0 THEN ''
                WHEN doc_id % 4 = 0
                  THEN '/Docs/' || doc_id::VARCHAR || '?Page='
                       || (doc_id % 7)::VARCHAR
                ELSE '/Docs/' || doc_id::VARCHAR END AS url,
           CASE WHEN doc_id % 7 = 0 THEN 'application/pdf'
                ELSE 'text/html' END AS mime,
           CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS http_status,
           md5(text) AS digest,
           n_chars AS n_bytes
    FROM documents
    """,
)
def q_cdx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ URL-index export + re-ingest (sources.cdx): captures →
    ``to_cdxj_records`` (SURT key + ts14 + one ``to_json`` per row) →
    range-partitioned sorted text write (the archive's global sort,
    produced distributively — ``repartitionByRange`` +
    ``sortWithinPartitions``, no single reducer) → ``read_cdx``
    (newline-splittable scan, two ``substring_index`` cuts + ONE
    ``from_json``).  The oracle restates SURT, timestamp and every
    JSON field from class arithmetic, so a green row proves key
    derivation (case fold, host reversal, path-less '/', query keep),
    JSON escaping, and the sorted write all survive the file
    round-trip byte-exactly."""
    import tempfile

    from extractor.sources.cdx import read_cdx, to_cdxj_records

    d = F.col("doc_id")
    h = (d % 37).cast("string")
    host = F.when(d % 5 == 0, F.concat(F.lit("WWW.Site"), h, F.lit(".ORG"))).otherwise(
        F.concat(F.lit("www.site"), h, F.lit(".org"))
    )
    path = (
        F.when(d % 13 == 0, F.lit(""))
        .when(
            d % 4 == 0,
            F.concat(
                F.lit("/Docs/"), d.cast("string"),
                F.lit("?Page="), (d % 7).cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("/Docs/"), d.cast("string")))
    )
    caps = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://"), host, path).alias("url"),
        F.concat(
            F.lit("202506"),
            F.lpad(((d % 28) + 1).cast("string"), 2, "0"),
            F.lit("0000"),
            F.lpad((d % 60).cast("string"), 2, "0"),
        ).alias("ts14"),
        F.when(d % 7 == 0, "application/pdf").otherwise("text/html").alias("mime"),
        F.when(d % 17 == 0, 404).otherwise(200).alias("http_status"),
        F.md5(F.col("text")).alias("digest"),
        F.col("n_chars").alias("n_bytes"),
    )
    out = tempfile.mkdtemp(prefix="cdx_rt_") + "/index"
    (
        to_cdxj_records(caps)
        .repartitionByRange(4, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .text(out)
    )
    return read_cdx(spark, out).select(
        "surt", "ts14", "url", "mime", "http_status", "digest", "n_bytes"
    )

@register(
    "cdx_lookup",
    """
    -- the host 'www.site7.test' owns the doc_id % 37 = 7 class; each
    -- doc has (doc_id % 3) + 1 captures (one per crawl day), each with
    -- a distinct digest — the lookup returns the per-url capture count
    -- and the LATEST capture's (ts14, digest)
    SELECT 'https://www.site7.test/docs/' || doc_id::VARCHAR AS url,
           ((doc_id % 3) + 1)::BIGINT AS n_captures,
           '2025060' || ((doc_id % 3) + 1)::VARCHAR || '000000'
             AS latest_ts14,
           md5(text || (doc_id % 3)::VARCHAR) AS latest_digest
    FROM documents
    WHERE doc_id % 37 = 7
    """,
)
def q_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host lookup over a freshly built CDXJ index
    (sources.cdx.cdx_host_lookup): the query is a SURT key-prefix
    ``startswith`` — codegen'd filter, no join against the capture
    table, and against a range-partitioned index layout it prunes to
    one partition's files.  Capture history consolidates with the
    engine's latest-capture shape (one ``max(struct(ts14, digest))``
    aggregate — crawl.latest_snapshot's constant-state reduce, no
    window over a hot URL's history).  The oracle re-derives count,
    latest timestamp and latest digest from class arithmetic."""
    import tempfile

    from extractor.sources.cdx import cdx_host_lookup, read_cdx, to_cdxj_records

    d = F.col("doc_id")
    caps = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "text",
            "n_chars",
            F.explode(F.sequence(F.lit(0), (d % 3).cast("int"))).alias("crawl"),
        )
        .select(
            F.concat(
                F.lit("https://www.site"),
                (d % 37).cast("string"),
                F.lit(".test/docs/"),
                d.cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("2025060"),
                (F.col("crawl") + 1).cast("string"),
                F.lit("000000"),
            ).alias("ts14"),
            F.lit("text/html").alias("mime"),
            F.lit(200).alias("http_status"),
            F.md5(F.concat(F.col("text"), F.col("crawl").cast("string"))).alias(
                "digest"
            ),
            F.col("n_chars").alias("n_bytes"),
        )
    )
    out = tempfile.mkdtemp(prefix="cdx_lk_") + "/index"
    (
        to_cdxj_records(caps)
        .repartitionByRange(4, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .text(out)
    )
    idx = read_cdx(spark, out)
    latest = F.max(F.struct(F.col("ts14"), F.col("digest"))).alias("latest")
    return (
        cdx_host_lookup(idx, "www.site7.test")
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n_captures"), latest)
        .select(
            "url",
            "n_captures",
            F.col("latest.ts14").alias("latest_ts14"),
            F.col("latest.digest").alias("latest_digest"),
        )
    )

@register(
    "e2e_cdx_crawl",
    """
    -- the archive-lifecycle chain: crawl-2's capture of every url is
    -- the latest by construction, so the oracle can restate the
    -- expected rows arithmetically — but the ENGINE must recover them
    -- through real CDX files (export → sorted write → splittable
    -- re-ingest → max(struct) consolidation) and the bloom gate; a
    -- framing, parse, consolidation or bit-arithmetic bug flips rows
    WITH docs2 AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 5 = 0 THEN text || 'v2' ELSE text END AS c2
      FROM documents
    ), hist AS (
      SELECT DISTINCT md5(text) AS digest FROM docs2 WHERE doc_id % 4 <> 3
    ), latest AS (
      SELECT 'https://crawl.test/p/' || doc_id::VARCHAR AS url,
             '20250602000000' AS latest_ts14, md5(c2) AS digest
      FROM docs2
    ), hp AS (
      SELECT ('0x' || substr(md5(digest || ':' || j), 1, 15))::BIGINT
               % 262144 AS pos
      FROM hist, LATERAL (SELECT unnest(generate_series(0, 4)) AS j) t
    ), words AS (
      SELECT (pos // 32)::INT AS word_idx,
             bit_or(1::BIGINT << (pos % 32)::INT) AS word
      FROM hp GROUP BY 1
    ), bp AS (
      SELECT digest,
             ('0x' || substr(md5(digest || ':' || j), 1, 15))::BIGINT
               % 262144 AS pos
      FROM (SELECT DISTINCT digest FROM latest),
           LATERAL (SELECT unnest(generate_series(0, 4)) AS j) t
    ), verdict AS (
      SELECT digest,
             min((coalesce(w.word, 0) & (1::BIGINT << (pos % 32)::INT)) <> 0)
               AS maybe_seen
      FROM bp LEFT JOIN words w ON w.word_idx = (pos // 32)::INT
      GROUP BY digest
    )
    SELECT l.url, l.latest_ts14,
           CASE WHEN NOT v.maybe_seen THEN 'new_content'
                WHEN l.digest IN (SELECT digest FROM hist)
                  THEN 'dup_of_history'
                ELSE 'bloom_fp' END AS status
    FROM latest l JOIN verdict v USING (digest)
    """,
)
def q_e2e_cdx_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end archive lifecycle: two crawls' captures (crawl 1
    covers 3/4 of urls; crawl 2 re-captures everything, every 5th
    doc's content changed) are exported as REAL sorted CDXJ shards,
    re-ingested through the block-splittable reader, consolidated to
    the latest capture per url (one max(struct) aggregate —
    crawl.latest_snapshot's shape over the index, not the page
    bytes), then gated: the bloom pre-filter built from crawl-1's
    digests classifies definitively-new content without touching
    history, and only maybe-seen rows proceed to the exact digest
    check — every stage the engine's own operator, driven from
    bytes on disk."""
    import tempfile

    from extractor.operators.sketch import bloom_build, bloom_probe
    from extractor.sources.cdx import read_cdx, to_cdxj_records

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    url = F.concat(F.lit("https://crawl.test/p/"), d.cast("string"))
    c2 = F.when(d % 5 == 0, F.concat(F.col("text"), F.lit("v2"))).otherwise(
        F.col("text")
    )

    def caps(ts: str, content, flt):
        return docs.filter(flt).select(
            url.alias("url"),
            F.lit(ts).alias("ts14"),
            F.lit("text/html").alias("mime"),
            F.lit(200).alias("http_status"),
            F.md5(content).alias("digest"),
            F.length(content).cast("long").alias("n_bytes"),
        )

    all_caps = caps("20250601000000", F.col("text"), d % 4 != 3).unionAll(
        caps("20250602000000", c2, F.lit(True))
    )
    out = tempfile.mkdtemp(prefix="cdx_e2e_") + "/index"
    (
        to_cdxj_records(all_caps)
        .repartitionByRange(4, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .text(out)
    )
    idx = read_cdx(spark, out)
    latest = (
        idx.groupBy("url")
        .agg(F.max(F.struct(F.col("ts14"), F.col("digest"))).alias("l"))
        .select("url", F.col("l.ts14").alias("latest_ts14"), F.col("l.digest").alias("digest"))
    )
    hist = (
        idx.filter(F.col("ts14") == "20250601000000")
        .select("digest")
        .distinct()
        .localCheckpoint(eager=True)  # history: built once, probed twice
    )
    probed = bloom_probe(latest, bloom_build(hist))
    return probed.join(
        hist.withColumn("in_history", F.lit(True)), "digest", "left"
    ).select(
        "url",
        "latest_ts14",
        F.when(~F.col("maybe_seen"), F.lit("new_content"))
        .when(F.col("in_history"), F.lit("dup_of_history"))
        .otherwise(F.lit("bloom_fp"))
        .alias("status"),
    )

@register(
    "jsonl_roundtrip",
    """
    -- JSONL interchange: expected rows restated straight from
    -- documents — a green row proves the export/import pair is
    -- lossless including JSON string escaping of arbitrary text
    SELECT doc_id, lang, md5(text) AS text_md5,
           length(text)::BIGINT AS n_chars
    FROM documents
    """,
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL export + re-ingest — the interchange format every
    training-data consumer speaks (one JSON object per line,
    trivially block-splittable like the CDX reader).  Spark-native on
    both sides: ``df.write.json`` emits, ``spark.read.schema(…)
    .json`` ingests with an EXPLICIT schema (never inference — a
    schema inferred per batch drifts when a field is all-null in one
    shard).  A green row proves byte-lossless text round-trip through
    JSON string escaping; the catalyst-native path needs no custom
    source code, which is itself the point (documented in SURVEY's
    source inventory)."""
    import tempfile

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    out = tempfile.mkdtemp(prefix="jsonl_rt_") + "/docs"
    docs.repartition(4).write.mode("overwrite").json(out)
    back = spark.read.schema("doc_id long, lang string, text string").json(out)
    return back.select(
        "doc_id",
        "lang",
        F.md5(F.col("text")).alias("text_md5"),
        F.length("text").cast("long").alias("n_chars"),
    )

@register(
    "e2e_warc_to_wet",
    """
    -- archive-to-archive production: every successfully extracted
    -- html url must survive markdown → WET segment → splittable
    -- re-ingest byte-identically; agreement is unconditional
    WITH cls AS (
      SELECT doc_id,
        CASE WHEN doc_id % 97 = 0 THEN 'reject_oversize'
             ELSE (['html_simple','html_simple','html_simple','html_simple',
                    'html_simple','html_simple','image_png','image_jpg',
                    'html_boiler','html_boiler','html_boiler','html_boiler',
                    'pdf_small','pdf_small','pdf_small','pdf_large',
                    'html_grounded','html_grounded','reject_empty',
                    'reject_ext'])[(doc_id % 20) + 1]
        END AS cls
      FROM documents
    )
    SELECT 'https://example-42.test/' || cls || '/' || printf('%06d', doc_id)
             || '.html' AS url,
           true AS wet_agrees
    FROM cls WHERE cls LIKE 'html%'
    """,
)
def q_e2e_warc_to_wet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Produce-your-own-WET, end-to-end: the engine's extracted
    markdown for the successful html subset is exported as WET
    ``conversion`` segments (sources.wet writer half), re-ingested
    through the block-splittable reader, and compared byte-for-byte
    (md5) against the direct extraction output — the
    archive-to-archive production path a crawl organization actually
    runs (raw captures in, text archive out).  A green row proves
    the WET framing (header emit, trailer strip, splittable re-scan)
    is lossless for REAL extractor output, not just synthetic
    bodies; any markdown byte that the framing eats flips
    ``wet_agrees``."""
    import tempfile

    from extractor.config import ExtractConfig
    from extractor.pipeline import route, run_extraction
    from extractor.sources.wet import read_wet, to_wet_records
    from extractor.testgen import TEST_MAX_BYTES, pages_df

    cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)
    pages = pages_df(spark, sf_dir)
    html_pages = route(pages).filter(F.col("doc_type") == "html").drop("doc_type")
    direct = (
        run_extraction(spark, html_pages, cfg)
        .filter(F.col("success"))
        .select("url", "text", F.md5("text").alias("direct_md5"))
        .localCheckpoint(eager=True)  # export + compare reuse
    )
    out = tempfile.mkdtemp(prefix="wet_prod_") + "/segments"
    to_wet_records(
        direct.repartition(4).select(
            "url",
            F.lit("2025-06-01T00:00:00Z").alias("warc_date"),
            "text",
        )
    ).write.mode("overwrite").text(out)
    back = read_wet(spark, out).select(
        "url", F.md5("text").alias("wet_md5")
    )
    return direct.join(back, "url").select(
        "url", (F.col("direct_md5") == F.col("wet_md5")).alias("wet_agrees")
    )


@register(
    "warc_revisit",
    # Four deterministic fetch waves over documents: every doc at
    # T1; an UNCHANGED re-fetch of even docs at T2 (revisit); a
    # CHANGED re-fetch of every 4th doc at T3 (new digest -> new
    # response); a mirror URL carrying every 10th doc's exact bytes
    # at T4 (URL-agnostic revisit pointing across hosts).  The
    # oracle re-derives digest-canonical rows by joining each
    # capture to its digest group's min(row(date, url)).
    """
    WITH f AS (
      SELECT 'http://d' || doc_id || '.example-42.test/' AS url,
             '2026-01-01T00:00:00Z' AS warc_date, text AS payload
      FROM documents
      UNION ALL
      SELECT 'http://d' || doc_id || '.example-42.test/',
             '2026-01-02T00:00:00Z', text
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'http://d' || doc_id || '.example-42.test/',
             '2026-01-03T00:00:00Z', text || ' changed'
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT 'http://mirror-42.test/d' || doc_id,
             '2026-01-04T00:00:00Z', text
      FROM documents WHERE doc_id % 10 = 0
    ), d AS (
      SELECT url, warc_date, md5(payload) AS payload_digest,
             octet_length(encode(payload))::BIGINT AS nbytes
      FROM f
    ), m AS (
      SELECT payload_digest, min(row(warc_date, url)) AS k
      FROM d GROUP BY payload_digest
    ), canon AS (
      SELECT d.payload_digest, d.url AS c_url, d.warc_date AS c_date
      FROM d JOIN m ON d.payload_digest = m.payload_digest
                   AND row(d.warc_date, d.url) = m.k
    )
    SELECT d.url, d.warc_date, d.payload_digest,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN 'response' ELSE 'revisit' END AS record_type,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN NULL ELSE c.c_url END AS refers_to_url,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN NULL ELSE c.c_date END AS refers_to_date,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN 0 ELSE d.nbytes END::BIGINT AS saved_bytes
    FROM d JOIN canon c USING (payload_digest)
    """,
)
def q_warc_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical-payload-digest revisit classification
    (sources.warc.classify_revisits — WARC 1.1 §6.7.2, Common
    Crawl's crawl-time dedup): re-fetches whose payload bytes are
    unchanged become pointer records instead of stored payloads.
    The fixture drives all four cases — unchanged re-fetch (even
    docs, next day), changed re-fetch (every 4th doc → a NEW
    response under the same URL), a cross-host mirror of every 10th
    doc's exact bytes (URL-agnostic dedup), and the untouched odd
    docs (single response, nothing to refer to).  saved_bytes is
    the archive-storage win each revisit banks.  Payload bytes
    never ride the shuffle: digest + byte count are scan-projection
    columns; only (digest, date, url, nbytes) rows move."""
    from extractor.sources.warc import classify_revisits

    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def wave(pred, date, payload, url):
        w = docs.filter(pred) if pred is not None else docs
        return w.select(
            url.alias("url"),
            F.lit(date).alias("warc_date"),
            payload.alias("html"),
        )

    durl = F.concat(
        F.lit("http://d"), F.col("doc_id").cast("string"),
        F.lit(".example-42.test/"),
    )
    murl = F.concat(
        F.lit("http://mirror-42.test/d"), F.col("doc_id").cast("string")
    )
    captures = (
        wave(None, "2026-01-01T00:00:00Z", F.col("text"), durl)
        .unionAll(wave(F.col("doc_id") % 2 == 0,
                       "2026-01-02T00:00:00Z", F.col("text"), durl))
        .unionAll(wave(F.col("doc_id") % 4 == 0, "2026-01-03T00:00:00Z",
                       F.concat(F.col("text"), F.lit(" changed")), durl))
        .unionAll(wave(F.col("doc_id") % 10 == 0,
                       "2026-01-04T00:00:00Z", F.col("text"), murl))
    )
    return classify_revisits(captures)


@register(
    "e2e_warc_dedup",
    # Same four fetch waves as warc_revisit, driven through a REAL
    # file round-trip of the deduplicated archive: canonical captures
    # come back as response records whose re-read body hashes to the
    # digest modulo the documented framing strip (trailing CR/LF);
    # re-fetches come back as payload-free revisit pointers.
    """
    WITH f AS (
      SELECT 'http://d' || doc_id || '.example-42.test/' AS url,
             '2026-01-01T00:00:00Z' AS warc_date, text AS payload
      FROM documents
      UNION ALL
      SELECT 'http://d' || doc_id || '.example-42.test/',
             '2026-01-02T00:00:00Z', text
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'http://d' || doc_id || '.example-42.test/',
             '2026-01-03T00:00:00Z', text || ' changed'
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT 'http://mirror-42.test/d' || doc_id,
             '2026-01-04T00:00:00Z', text
      FROM documents WHERE doc_id % 10 = 0
    ), d AS (
      SELECT url, warc_date, md5(payload) AS payload_digest, payload
      FROM f
    ), m AS (
      SELECT payload_digest, min(row(warc_date, url)) AS k
      FROM d GROUP BY payload_digest
    ), canon AS (
      SELECT d.payload_digest, d.url AS c_url, d.warc_date AS c_date
      FROM d JOIN m ON d.payload_digest = m.payload_digest
                   AND row(d.warc_date, d.url) = m.k
    )
    SELECT d.url, d.warc_date,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN 'response' ELSE 'revisit' END AS warc_type,
           d.payload_digest,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN NULL ELSE c.c_url END AS refers_to_url,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN NULL ELSE c.c_date END AS refers_to_date,
           CASE WHEN d.url = c.c_url AND d.warc_date = c.c_date
                THEN md5(rtrim(d.payload, chr(13) || chr(10)))
                ELSE NULL END AS body_md5
    FROM d JOIN canon c USING (payload_digest)
    """,
)
def q_e2e_warc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicated-archive round-trip
    (sources.warc.to_deduped_warc_records → real text files →
    read_warc_any): the batch repack that turns raw captures into
    Common Crawl's storage shape — one stored payload per digest,
    pointer records for every identical re-fetch.  A green row set
    proves (a) classification survives the writer/reader pair, (b)
    revisit pointers re-read intact (digest + refers-to headers),
    and (c) stored payloads hash back to their digest modulo the
    documented framing strip (``body_md5`` = md5 of the re-read
    body; the oracle models the trailing-CR/LF trade exactly).
    Revisit rows carry NULL body_md5 — nothing was stored, which IS
    the feature."""
    import tempfile

    from extractor.sources.warc import read_warc_any, to_deduped_warc_records

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    durl = F.concat(
        F.lit("http://d"), F.col("doc_id").cast("string"),
        F.lit(".example-42.test/"),
    )
    murl = F.concat(
        F.lit("http://mirror-42.test/d"), F.col("doc_id").cast("string")
    )

    def wave(pred, date, payload, url):
        w = docs.filter(pred) if pred is not None else docs
        return w.select(
            url.alias("url"),
            F.lit(date).alias("warc_date"),
            F.lit(200).alias("http_status"),
            F.lit("text/html").alias("content_type"),
            payload.alias("html"),
        )

    captures = (
        wave(None, "2026-01-01T00:00:00Z", F.col("text"), durl)
        .unionAll(wave(F.col("doc_id") % 2 == 0,
                       "2026-01-02T00:00:00Z", F.col("text"), durl))
        .unionAll(wave(F.col("doc_id") % 4 == 0, "2026-01-03T00:00:00Z",
                       F.concat(F.col("text"), F.lit(" changed")), durl))
        .unionAll(wave(F.col("doc_id") % 10 == 0,
                       "2026-01-04T00:00:00Z", F.col("text"), murl))
    )
    out = tempfile.mkdtemp(prefix="warc_dedup_") + "/segments"
    to_deduped_warc_records(captures.repartition(4)).write.mode(
        "overwrite"
    ).text(out)
    back = read_warc_any(spark, out)
    return back.select(
        "url",
        "warc_date",
        "warc_type",
        "payload_digest",
        "refers_to_url",
        "refers_to_date",
        F.when(
            F.col("warc_type") == "response",
            F.md5(F.encode(F.col("html"), "utf-8")),
        ).alias("body_md5"),
    )
