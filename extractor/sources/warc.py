"""Raw WARC crawl-archive ingestion (response records).

WET files (sources.wet) carry pre-extracted text; the PRIMARY crawl
artifact is the raw WARC: each ``response`` record is a WARC header
block, a blank line, the captured HTTP response (status line +
headers), another blank line, then the payload bytes — the HTML the
extraction pipeline actually wants.  (The reference service receives
one uploaded document per request, `routes/ocr.py`; this is the batch
analog — a crawl segment in, an extraction-ready pages table out.)

Scale shape — identical to the WET reader, and for the same reason:

* ``spark.read.text(lineSep="WARC/1.0")`` rides Hadoop's
  block-splittable LineRecordReader, so a 1 GB segment reads as many
  parallel tasks.  ``binaryFile`` + a Python WARC library would pin
  one segment per task and ship every byte through Python — wrong at
  100 TB; not used.
* WARC/HTTP header fields and the payload are pure column
  expressions (``substring_index`` / ``regexp_extract``) — the parse
  runs at scan speed inside whole-stage codegen, no Python anywhere.

Framing caveats (both inherent to separator-based splitting and
documented trade-offs, not bugs):

* A payload containing the literal line ``WARC/1.0`` would split the
  record.  Spec-exact framing needs ``Content-Length`` byte counting,
  which no splittable text reader can honor; crawl payloads that
  embed WARC version lines are vanishingly rare, and a corrupted
  record surfaces as a URI-less fragment that the type filter drops.
* Trailing CR/LF of a payload is indistinguishable from the record
  trailer, so all trailing ``\\r``/``\\n`` are stripped (same trade
  as sources.wet; md5-pinned by the round-trip oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_SEP = "WARC/1.0"
_HDR_END = "\r\n\r\n"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read raw WARC segments under ``path`` into
    (url, warc_date, http_status, content_type, html) rows —
    ``response`` records only (``warcinfo`` / ``request`` /
    ``metadata`` records and URI-less fragments are dropped).

    ``html`` is the raw HTTP payload string — feed it to the
    extraction pipeline's route/extract stages unchanged.  Non-2xx
    captures are KEPT (status is a column, policy belongs to the
    caller); real crawls replay 404/301 bodies for diffing."""
    raw = spark.read.option("lineSep", WARC_SEP).text(path)
    return parse_warc_records(raw)


def parse_warc_records(raw: DataFrame) -> DataFrame:
    """Expression-only parse: ``value: string`` chunks (one per
    ``WARC/1.0``-separated record) → typed response rows.  Shared by
    :func:`read_warc` and :func:`read_warc_stream` — stream/batch
    unification by construction.

    Layout per record: WARC headers ``\\r\\n\\r\\n`` HTTP status line +
    headers ``\\r\\n\\r\\n`` payload.  The first two blank-line splits
    are positional (``substring_index`` twice); everything after the
    second is payload."""
    rec = raw.filter(F.length(F.trim(F.col("value"))) > 0)
    warc_hdr = F.substring_index(F.col("value"), _HDR_END, 1)
    http_hdr = F.expr(
        "substring(substring_index(value, '\\r\\n\\r\\n', 2),"
        " length(substring_index(value, '\\r\\n\\r\\n', 1)) + 5)"
    )
    body = F.expr(
        "substring(value, length(substring_index(value, '\\r\\n\\r\\n', 2)) + 5)"
    )
    body = F.regexp_replace(body, r"[\r\n]+$", "")  # framing caveat
    url = F.regexp_extract(warc_hdr, r"WARC-Target-URI:\s*(\S+)", 1)
    ts = F.regexp_extract(warc_hdr, r"WARC-Date:\s*(\S+)", 1)
    rtype = F.regexp_extract(warc_hdr, r"WARC-Type:\s*(\S+)", 1)
    status = F.regexp_extract(http_hdr, r"HTTP/[0-9.]+\s+(\d{3})", 1)
    ctype = F.regexp_extract(http_hdr, r"Content-Type:\s*([^\r\n;]+)", 1)
    loc = F.regexp_extract(http_hdr, r"Location:\s*(\S+)", 1)
    return (
        rec.select(
            rtype.alias("warc_type"),
            url.alias("url"),
            ts.alias("warc_date"),
            F.nullif(status, F.lit("")).cast("int").alias("http_status"),
            F.trim(ctype).alias("content_type"),
            # 3xx captures carry the redirect target — the edge the
            # redirect-resolution operator follows (crawl.resolve_redirects).
            F.nullif(loc, F.lit("")).alias("location"),
            # the WARC header's declared byte count — the integrity
            # signal that makes the separator-framing trade (trailing
            # CR/LF strip, embedded version lines) measurable instead
            # of silent (see warc_integrity).
            F.nullif(
                F.regexp_extract(warc_hdr, r"Content-Length:\s*(\d+)", 1),
                F.lit(""),
            ).cast("long").alias("declared_length"),
            body.alias("html"),
        )
        .filter((F.col("warc_type") == "response") & (F.col("url") != ""))
        .drop("warc_type")
    )


def warc_to_pages(responses: DataFrame) -> DataFrame:
    """Adapt :func:`read_warc` rows to the extraction pipeline's
    pages-table contract ``(url, warc_ts timestamp, html binary,
    text, lang)`` — the shape ``run_extraction`` and the parquet
    ingest path share, so a raw crawl segment and a curated Iceberg
    table flow through identical stages.

    ``try_to_timestamp``: crawl archives carry malformed WARC-Date
    values; a NULL ``warc_ts`` must not kill a 100-TB job.  The
    default parser accepts both Z-suffixed and bare ISO-8601."""
    return responses.select(
        "url",
        F.try_to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.encode(F.col("html"), "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def read_warc_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """Streaming twin of :func:`read_warc` (drop-directory file
    source, exactly-once via checkpointed file tracking) — the crawl
    fetcher appends segments, the extraction stream consumes them."""
    raw = (
        spark.readStream.option("lineSep", WARC_SEP)
        .option("maxFilesPerTrigger", max_files)
        .text(path)
    )
    return parse_warc_records(raw)


def to_warc_records(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    status_col: str = "http_status",
    ctype_col: str = "content_type",
    body_col: str = "html",
    location_col: str | None = None,
    digest_col: str | None = None,
) -> DataFrame:
    """Format response rows as raw WARC ``response`` records — one
    ``value: string`` column for ``df.write.text``; one codegen'd
    concat per row, no Python, no collect (the distributed writer
    half of the round-trip, mirroring sources.wet.to_wet_records).

    ``location_col`` (optional): a redirect-target column emitted as
    an HTTP ``Location`` header when non-null, so 3xx captures
    round-trip their redirect edge.

    ``digest_col`` (optional): an md5 hex column emitted as
    ``WARC-Payload-Digest: md5:<hex>`` — the header a deduplicated
    archive's revisit records refer back to (classify_revisits /
    to_deduped_warc_records).  Default None leaves the output
    byte-identical to the pre-digest writer."""
    body = F.col(body_col)
    loc_hdr = (
        F.when(
            F.col(location_col).isNotNull(),
            F.concat(F.lit("Location: "), F.col(location_col), F.lit("\r\n")),
        ).otherwise(F.lit(""))
        if location_col
        else F.lit("")
    )
    digest_hdr = (
        F.concat(
            F.lit("WARC-Payload-Digest: md5:"), F.col(digest_col), F.lit("\r\n")
        )
        if digest_col
        else F.lit("")
    )
    return df.select(
        F.concat(
            F.lit(f"{WARC_SEP}\r\n" "WARC-Type: response\r\n" "WARC-Target-URI: "),
            F.col(url_col),
            F.lit("\r\nWARC-Date: "),
            F.col(date_col).cast("string"),
            F.lit("\r\n"),
            digest_hdr,
            F.lit("Content-Length: "),
            F.octet_length(body).cast("string"),
            F.lit(_HDR_END),
            F.lit("HTTP/1.1 "),
            F.col(status_col).cast("string"),
            F.lit(" \r\nContent-Type: "),
            F.col(ctype_col),
            F.lit("\r\n"),
            loc_hdr,
            F.lit("\r\n"),
            body,
            F.lit("\r\n\r\n"),
        ).alias("value")
    )


def warc_file(records: list[tuple[str, str, int, str, str]], segment: str) -> str:
    """Deterministic raw-WARC file content for tests: a ``warcinfo``
    preamble plus a ``request``/``response`` record PAIR per
    (url, date, status, content_type, body) — real crawls interleave
    record types; the parser must keep only responses."""
    parts = [
        f"{WARC_SEP}\r\n"
        f"WARC-Type: warcinfo\r\n"
        f"WARC-Filename: {segment}\r\n"
        f"\r\n"
        f"software: extractor-testgen\r\n\r\n"
    ]
    for url, date, status, ctype, body in records:
        parts.append(
            f"{WARC_SEP}\r\n"
            f"WARC-Type: request\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"\r\n"
            f"GET / HTTP/1.1\r\nHost: x\r\n\r\n"
        )
        parts.append(
            f"{WARC_SEP}\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(body.encode('utf-8'))}\r\n"
            f"\r\n"
            f"HTTP/1.1 {status} \r\n"
            f"Content-Type: {ctype}\r\n"
            f"\r\n"
            f"{body}\r\n\r\n"
        )
    return "".join(parts)


def classify_revisits(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "html",
) -> DataFrame:
    """Crawl-time payload dedup: classify each capture as the
    canonical ``response`` or an identical-payload ``revisit`` — the
    WARC 1.1 §6.7.2 identical-payload-digest profile Common Crawl
    applies when writing segments (an unchanged re-fetch stores a
    ~200-byte pointer record instead of the payload).  The reference
    service re-OCRs every upload unconditionally (`routes/ocr.py` has
    no response cache); at crawl scale this classification is what
    keeps the archive — and the extraction job reading it — from
    paying for every unchanged re-fetch.

    Digest grouping is URL-agnostic (mirrors collapse too, like the
    spec's ``WARC-Refers-To-Target-URI`` being allowed to differ);
    the canonical capture per digest is the type-agnostic
    ``min(struct(date, url))`` — deterministic, no window.

    Returns one row per input capture:
    (url, date, payload_digest, record_type ``response|revisit``,
    refers_to_url/refers_to_date — NULL on responses, saved_bytes —
    the payload bytes a revisit record avoids re-storing).

    100 TB shape: the md5 digest and byte count are computed in the
    scan projection, so PAYLOAD BYTES NEVER RIDE A SHUFFLE — the one
    groupBy and the join back move only (digest, date, url, nbytes)
    rows.  Emitting actual revisit records afterwards is one
    ``to_warc_records``-style concat on the classified rows.

    NULL payloads: md5(NULL) is NULL and groupBy collapses all NULL
    digests into one group, which would mark distinct NULL-payload
    captures as revisits of each other.  The engine's WARC/WET
    parsers never yield NULL bodies (an empty payload parses as
    ``''``, a real digest); callers feeding nullable columns should
    coalesce or filter first."""
    d = captures.select(
        F.col(url_col).alias("url"),
        F.col(date_col).alias("warc_date"),
        F.md5(F.encode(F.col(payload_col), "utf-8")).alias("payload_digest"),
        F.octet_length(F.col(payload_col)).cast("long").alias("nbytes"),
    )
    canon = d.groupBy("payload_digest").agg(
        F.min(F.struct("warc_date", "url")).alias("k")
    )
    joined = d.join(canon, "payload_digest")
    is_canon = (F.col("warc_date") == F.col("k.warc_date")) & (
        F.col("url") == F.col("k.url")
    )
    return joined.select(
        "url",
        "warc_date",
        "payload_digest",
        F.when(is_canon, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("record_type"),
        F.when(is_canon, F.lit(None).cast("string"))
        .otherwise(F.col("k.url"))
        .alias("refers_to_url"),
        F.when(is_canon, F.lit(None).cast("string"))
        .otherwise(F.col("k.warc_date"))
        .alias("refers_to_date"),
        F.when(is_canon, F.lit(0).cast("long"))
        .otherwise(F.col("nbytes"))
        .alias("saved_bytes"),
    )


def parse_warc_any(raw: DataFrame) -> DataFrame:
    """Expression-only parse keeping BOTH ``response`` and
    ``revisit`` records — the reader for deduplicated archives
    (real Common Crawl segments carry revisit records;
    :func:`parse_warc_records` is the responses-only fast path and
    stays byte-identical for callers that want payloads only).

    Revisit rows carry the WARC 1.1 §6.7.2 pointer headers
    (``payload_digest``, ``refers_to_url``, ``refers_to_date``) and
    an empty ``html``; response rows carry the payload plus their
    own ``payload_digest`` header when the writer emitted one.  Same
    splittable-scan / whole-stage-codegen shape as the response
    parser: zero Python."""
    rec = raw.filter(F.length(F.trim(F.col("value"))) > 0)
    warc_hdr = F.substring_index(F.col("value"), _HDR_END, 1)
    body = F.expr(
        "substring(value, length(substring_index(value, '\\r\\n\\r\\n', 2)) + 5)"
    )
    body = F.regexp_replace(body, r"[\r\n]+$", "")  # framing caveat

    def hdr(name: str):
        return F.nullif(
            F.regexp_extract(warc_hdr, name + r":\s*(\S+)", 1), F.lit("")
        )

    return (
        rec.select(
            F.regexp_extract(warc_hdr, r"WARC-Type:\s*(\S+)", 1).alias("warc_type"),
            F.regexp_extract(warc_hdr, r"WARC-Target-URI:\s*(\S+)", 1).alias("url"),
            F.regexp_extract(warc_hdr, r"WARC-Date:\s*(\S+)", 1).alias("warc_date"),
            F.nullif(
                F.regexp_extract(
                    warc_hdr, r"WARC-Payload-Digest:\s*md5:(\S+)", 1
                ),
                F.lit(""),
            ).alias("payload_digest"),
            hdr("WARC-Refers-To-Target-URI").alias("refers_to_url"),
            hdr("WARC-Refers-To-Date").alias("refers_to_date"),
            body.alias("html"),
        )
        .filter(F.col("warc_type").isin("response", "revisit") & (F.col("url") != ""))
    )


def read_warc_any(spark: SparkSession, path: str) -> DataFrame:
    """Read raw WARC segments keeping response AND revisit records
    (:func:`parse_warc_any`) — the block-splittable scan is identical
    to :func:`read_warc`."""
    raw = spark.read.option("lineSep", WARC_SEP).text(path)
    return parse_warc_any(raw)


def to_deduped_warc_records(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    status_col: str = "http_status",
    ctype_col: str = "content_type",
    body_col: str = "html",
) -> DataFrame:
    """Format a DEDUPLICATED archive from raw captures: the canonical
    capture of each payload digest becomes a full ``response`` record
    (payload + digest header); every identical-payload re-fetch
    becomes a payload-free ``revisit`` record pointing at it
    (classify_revisits → WARC 1.1 §6.7.2) — Common Crawl's crawl-time
    dedup, reproduced as a batch repack.  Real revisit records also
    replay the re-fetch's HTTP headers; this writer emits the pointer
    headers only (the fields the dedup semantics need), documented
    simplification.

    100 TB shape: classification shuffles only (digest, date, url,
    nbytes) rows; each STORED payload then rides exactly one
    (url, date)-keyed join back to its classification verdict — the
    minimal cost of a digest-global repack (each kept byte crosses
    the cluster once).  Revisit records are formatted straight off
    the classified rows, no payload anywhere near them.  Assumes
    (url, date) uniquely keys a capture, the WARC record identity."""
    cls = classify_revisits(captures, url_col, date_col, body_col)
    resp = cls.filter(F.col("record_type") == "response").select(
        "url", "warc_date", "payload_digest"
    ).join(
        captures.select(
            F.col(url_col).alias("url"),
            F.col(date_col).alias("warc_date"),
            F.col(status_col).alias("http_status"),
            F.col(ctype_col).alias("content_type"),
            F.col(body_col).alias("html"),
        ),
        ["url", "warc_date"],
    )
    resp_recs = to_warc_records(resp, digest_col="payload_digest")
    rev_recs = cls.filter(F.col("record_type") == "revisit").select(
        F.concat(
            F.lit(f"{WARC_SEP}\r\n" "WARC-Type: revisit\r\n" "WARC-Target-URI: "),
            F.col("url"),
            F.lit("\r\nWARC-Date: "),
            F.col("warc_date"),
            F.lit("\r\nWARC-Payload-Digest: md5:"),
            F.col("payload_digest"),
            F.lit("\r\nWARC-Refers-To-Target-URI: "),
            F.col("refers_to_url"),
            F.lit("\r\nWARC-Refers-To-Date: "),
            F.col("refers_to_date"),
            F.lit("\r\nContent-Length: 0"),
            F.lit(_HDR_END),
            F.lit("\r\n"),
        ).alias("value")
    )
    return resp_recs.unionAll(rev_recs)
