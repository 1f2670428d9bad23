"""Flagship §2 chain: routing, cleaning, page assembly, the full extraction pipeline, multimodal metadata, normalization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.queries._core import (  # noqa: F401
    register,
    _docs,
)

_CLASS_ARRAY_SQL = (
    "['html_simple','html_simple','html_simple','html_simple',"
    "'html_simple','html_simple','image_png','image_jpg',"
    "'html_boiler','html_boiler','html_boiler','html_boiler',"
    "'pdf_small','pdf_small','pdf_small','pdf_large',"
    "'html_grounded','html_grounded','reject_empty','reject_ext']"
)

@register(
    "route_and_validate",
    f"""
    WITH base AS (
      SELECT doc_id, n_chars,
             CASE WHEN doc_id % 97 = 0 THEN 'reject_oversize'
                  ELSE ({_CLASS_ARRAY_SQL})[(doc_id % 20) + 1] END AS cls
      FROM documents
    ), pages AS (
      SELECT doc_id, cls,
             'https://example-42.test/' || cls || '/' ||
               printf('%06d', doc_id) ||
               CASE WHEN cls = 'reject_ext' THEN '.exe'
                    WHEN cls = 'image_png' THEN '.png'
                    WHEN cls = 'image_jpg' THEN '.jpg'
                    WHEN cls LIKE 'pdf%' THEN '.pdf' ELSE '.html' END AS url,
             CASE WHEN cls = 'reject_oversize' THEN 65537
                  WHEN cls = 'reject_empty' THEN 0
                  ELSE n_chars END AS payload_size
      FROM base
    )
    SELECT url,
           CASE WHEN url LIKE '%.exe' THEN 'unsupported'
                WHEN url LIKE '%.pdf' THEN 'pdf'
                WHEN url LIKE '%.png' OR url LIKE '%.jpg' THEN 'image'
                ELSE 'html' END AS doc_type,
           CASE WHEN url LIKE '%.exe' THEN 'Unsupported file format'
                WHEN payload_size = 0 THEN 'File is empty'
                WHEN payload_size > 65536
                  THEN 'File size exceeds maximum allowed size'
                END AS error
    FROM pages
    """,
)
def q_route_and_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3/F5 through the real pipeline.route/_quarantine_error
    expressions (JVM-side; tests assert no Python stage)."""
    from extractor.config import ExtractConfig
    from extractor.pipeline import _quarantine_error, route
    from extractor.testgen import CLASSES

    docs = _docs(spark, sf_dir)
    cls = F.when(F.col("doc_id") % 97 == 0, "reject_oversize").otherwise(
        F.element_at(F.array(*[F.lit(c) for c in CLASSES]), (F.col("doc_id") % 20 + 1).cast("int"))
    )
    ext = (
        F.when(cls == "reject_ext", ".exe")
        .when(cls == "image_png", ".png")
        .when(cls == "image_jpg", ".jpg")
        .when(cls.startswith("pdf"), ".pdf")
        .otherwise(".html")
    )
    url = F.concat(
        F.lit("https://example-42.test/"), cls, F.lit("/"),
        F.format_string("%06d", F.col("doc_id")), ext,
    )
    size = (
        F.when(cls == "reject_oversize", 65537)
        .when(cls == "reject_empty", 0)
        .otherwise(F.col("n_chars"))
    )
    pages = docs.select(
        url.alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        # payload stand-in with the right length; stays JVM-side
        F.repeat(F.lit("x"), size.cast("int")).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    cfg = ExtractConfig(max_bytes=65536)
    return route(pages).select(
        "url", "doc_type", _quarantine_error(cfg).alias("error")
    )

@register(
    "clean_grounding",
    r"""
    WITH noisy AS (
      SELECT doc_id,
             '<|ref|>title<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|>  ' || text ||
             chr(10)||chr(10)||chr(10)||chr(10) ||
             ' tail <|ref|>fig ' || (doc_id % 7)::VARCHAR || '<|/ref|> line  ' AS raw
      FROM documents
    ), s AS (
      SELECT doc_id,
        regexp_replace(
          regexp_replace(
            regexp_replace(raw, '<\|ref\|>.*?<\|/ref\|>', '', 'g'),
            '<\|det\|>\[\[.*?\]\]<\|/det\|>', '', 'g'),
          '\n{3,}', chr(10)||chr(10), 'g') AS t
      FROM noisy
    )
    SELECT doc_id,
           trim(array_to_string(list_transform(string_split(t, chr(10)),
                                               l -> trim(l)), chr(10)),
                ' ' || chr(10)) AS clean
    FROM s
    """,
)
def q_clean_grounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 via the engine's Python UDF vs an independent SQL mirror."""
    from extractor.cleaning import strip_grounding_udf

    docs = _docs(spark, sf_dir)
    raw = F.concat(
        F.lit("<|ref|>title<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|>  "),
        F.col("text"),
        F.lit("\n\n\n\n"),
        F.lit(" tail <|ref|>fig "), (F.col("doc_id") % 7).cast("string"),
        F.lit("<|/ref|> line  "),
    )
    return docs.select("doc_id", strip_grounding_udf(raw).alias("clean"))

@register(
    "stdout_noise_filter",
    r"""
    WITH noisy AS (
      SELECT doc_id,
             '=====image 1=====' || chr(10) ||
             'BASE: torch.Size([1, 3, 1024, 1024])' || chr(10) ||
             text || chr(10) ||
             'PATCHES: ' || (doc_id % 5)::VARCHAR || chr(10) ||
             '(0x0)' || chr(10) ||
             'keep ' || lang || chr(10) ||
             'shape torch.Size([2])' || chr(10) ||
             '   ' || chr(10) ||
             '0x0' || chr(10) ||
             'last line' AS raw
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             list_filter(string_split(trim(raw, ' ' || chr(10)), chr(10)),
               l -> NOT (starts_with(l, '=====') OR starts_with(l, 'BASE:')
                     OR starts_with(l, 'PATCHES:') OR trim(l) = '(0x0)'
                     OR (starts_with(trim(l), '(0x0)') AND length(trim(l)) < 50)
                     OR trim(l) = '0x0' OR contains(l, 'torch.Size'))
                    AND trim(l) <> ''),
             chr(10)) AS clean
    FROM noisy
    """,
)
def q_stdout_noise_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 (strip_grounding=False) vs an independent SQL mirror."""
    from extractor.cleaning import clean_stdout_keep_grounding_udf

    docs = _docs(spark, sf_dir)
    raw = F.concat(
        F.lit("=====image 1=====\nBASE: torch.Size([1, 3, 1024, 1024])\n"),
        F.col("text"), F.lit("\n"),
        F.lit("PATCHES: "), (F.col("doc_id") % 5).cast("string"), F.lit("\n"),
        F.lit("(0x0)\nkeep "), F.col("lang"),
        F.lit("\nshape torch.Size([2])\n   \n0x0\nlast line"),
    )
    return docs.select("doc_id", clean_stdout_keep_grounding_udf(raw).alias("clean"))

@register(
    "page_assembly",
    """
    WITH fan AS (
      SELECT d.doc_id,
             1 + (d.doc_id % 3) AS n_pages,
             p.pn,
             'pg' || p.pn::VARCHAR || ': ' ||
               substr(d.text, 1 + (p.pn - 1) * 40, 40) AS page_text,
             ((d.doc_id + p.pn) % 17) <> 3 AS page_ok
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(1, 1 + (d.doc_id % 3))) AS pn) p
    )
    SELECT doc_id,
           max(n_pages) AS total_pages,
           bool_and(page_ok) AS success,
           count(*) FILTER (WHERE NOT page_ok) AS failed_pages,
           string_agg(page_text, chr(10) || chr(10) ORDER BY pn)
             FILTER (WHERE page_ok) AS text
    FROM fan
    GROUP BY doc_id
    """,
)
def q_page_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4: explode→shuffle→array_sort reassembly (order restored by
    sort, not arrival — SURVEY §2.4); flattened columns for the oracle."""
    docs = _docs(spark, sf_dir)
    n_pages = (1 + F.col("doc_id") % 3).cast("int")
    fan = docs.select(
        "doc_id", "text", n_pages.alias("n_pages"),
        F.explode(F.sequence(F.lit(1), n_pages)).alias("pn"),
    ).select(
        "doc_id", "n_pages", "pn",
        F.concat(
            F.lit("pg"), F.col("pn").cast("string"), F.lit(": "),
            F.substring(F.col("text"), (1 + (F.col("pn") - 1) * 40).cast("int"), 40),
        ).alias("page_text"),
        (((F.col("doc_id") + F.col("pn")) % 17) != 3).alias("page_ok"),
    )
    # deliberate mid-shuffle (mirrors the pipeline's page-salting step):
    # reassembly must not depend on arrival order
    fan = fan.repartition(16, "doc_id", "pn")
    page_struct = F.struct("pn", "page_text")
    return (
        fan.groupBy("doc_id")
        .agg(
            F.max("n_pages").alias("total_pages"),
            F.min("page_ok").alias("success"),
            F.count(F.when(~F.col("page_ok"), 1)).alias("failed_pages"),
            F.nullif(  # no surviving pages → NULL (SQL string_agg convention)
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.when(F.col("page_ok"), page_struct))),
                        lambda p: p["page_text"],
                    ),
                    "\n\n",
                ),
                F.lit(""),
            ).alias("text"),
        )
        .select("doc_id", "total_pages", "success", "failed_pages", "text")
    )

@register(
    "multimodal_meta",
    """
    WITH img AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS digest,
             1 + ('0x' || substr(md5(text), 1, 15))::BIGINT % 4096 AS width,
             1 + ('0x' || substr(md5(text), 16, 15))::BIGINT % 4096 AS height
      FROM documents
    )
    SELECT doc_id AS id, n_bytes::BIGINT AS n_bytes, width::INT AS width,
           height::INT AS height,
           -- exact mirror of the reference arithmetic
           -- (image_compressor.py:45-68): BOTH dims go through
           -- int(dim * scale) — the larger side can come out 2047 via
           -- float (e.g. 3510 * (2048/3510) = 2047.9999999999998)
           CASE WHEN width <= 2048 AND height <= 2048 THEN width
                ELSE floor(width * (CASE WHEN width > height
                                         THEN 2048.0 / width
                                         ELSE 2048.0 / height END))::INT
           END AS out_width,
           CASE WHEN width <= 2048 AND height <= 2048 THEN height
                ELSE floor(height * (CASE WHEN width > height
                                          THEN 2048.0 / width
                                          ELSE 2048.0 / height END))::INT
           END AS out_height,
           digest
    FROM img
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode stub + the reference's exact resize arithmetic
    (image_compressor.py:45-68: scale on the larger side, int()
    truncation) through real mapInPandas plumbing."""
    from extractor.operators.multimodal import image_meta

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return image_meta(docs, id_col="doc_id", bin_col="payload")

@register(
    "embedding_stub",
    """
    SELECT doc_id AS id, i.i AS dim,
           (('0x' || substr(md5(text || ':' || i.i::VARCHAR), 1, 15))::BIGINT % 1000)
             / 1000.0 AS component
    FROM documents, LATERAL (SELECT unnest(generate_series(0, 7)) AS i) i
    """,
)
def q_embedding_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-embedding batch stage (mapInPandas; model
    forward pass swaps in at deploy).  Registry surface explodes the
    vector to (id, dim, component) rows — the driver's canonicalizer
    cannot hash array cells; the component doubles are bit-identical
    across engines (same integer k, same k/1000.0 division)."""
    from extractor.operators.multimodal import embed_stub

    emb = embed_stub(_docs(spark, sf_dir), id_col="doc_id", text_col="text", dim=8)
    return emb.select(
        "id", F.posexplode("embedding").alias("dim", "component")
    ).select("id", F.col("dim").cast("long").alias("dim"), "component")

@register(
    "frame_sample",
    """
    WITH f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ), idx AS (
      SELECT doc_id, text,
             unnest(generate_series(0, greatest(n // 256, 1) - 1, 2)) AS i
      FROM f
    )
    SELECT doc_id AS id, i::INT AS frame_no,
           -- documents.text is pure ASCII (verified octet_length ==
           -- length), so char slicing == the Spark side's byte slicing
           md5(substring(text, i * 256 + 1, 256)) AS frame_md5,
           octet_length(encode(substring(text, i * 256 + 1, 256)))::INT
             AS frame_bytes_len
    FROM idx
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling plumbing: binary → sampled frame rows
    (the pdf-page fan-out pattern on an opaque codec).  The stub codec
    (fixed 256-byte chunks, every 2nd) is substr arithmetic, so the
    oracle checks it; frames surface as md5 + length (the driver
    cannot canonicalize raw binary cells)."""
    from extractor.operators.multimodal import frame_sample

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    frames = frame_sample(docs, id_col="doc_id", bin_col="payload", every=2)
    return frames.select(
        "id",
        "frame_no",
        F.md5("frame_bytes").alias("frame_md5"),
        F.length("frame_bytes").cast("int").alias("frame_bytes_len"),
    )

@register(
    "extract_pipeline",
    """
    -- Partial oracle for the flagship pipeline: re-derives EVERY output
    -- row (route + quarantine + pdf fan-out/OCR/reassembly + image
    -- branch) in SQL.  The ONE exclusion is the html branch's text
    -- BYTES (DOM boilerplate-strip is not SQL-expressible): html rows
    -- carry the sentinel 'HTML_GOLDEN' when extraction yielded text —
    -- presence/success are driver-checked here, byte identity is
    -- pinned by tests/test_pipeline.py goldens.  All other columns are
    -- checked for all rows; pdf/image/quarantine text is checked by
    -- md5.  Derivation mirrors extractor/testgen.py (pages synthesis),
    -- the surrogate engine's raw-output shape, and cleaning.py T7/T8.
    WITH cls AS (
      SELECT doc_id, text,
        CASE WHEN doc_id % 97 = 0 THEN 'reject_oversize'
             ELSE (['html_simple','html_simple','html_simple','html_simple',
                    'html_simple','html_simple','image_png','image_jpg',
                    'html_boiler','html_boiler','html_boiler','html_boiler',
                    'pdf_small','pdf_small','pdf_small','pdf_large',
                    'html_grounded','html_grounded','reject_empty',
                    'reject_ext'])[(doc_id % 20) + 1]
        END AS cls
      FROM documents
    ), routed AS (
      SELECT doc_id, text, cls,
        'https://example-42.test/' || cls || '/' || printf('%06d', doc_id) ||
          CASE WHEN cls = 'reject_ext' THEN '.exe'
               WHEN cls = 'image_png' THEN '.png'
               WHEN cls = 'image_jpg' THEN '.jpg'
               WHEN cls IN ('pdf_small','pdf_large') THEN '.pdf'
               ELSE '.html' END AS url,
        CASE WHEN cls = 'reject_ext' THEN 'unsupported'
             WHEN cls IN ('image_png','image_jpg') THEN 'image'
             WHEN cls IN ('pdf_small','pdf_large') THEN 'pdf'
             ELSE 'html' END AS doc_type
      FROM cls
    ), quarantine AS (
      -- F1/F3/F5 rejection rows, first-match-wins error order
      SELECT url, doc_type, CAST(NULL AS VARCHAR) AS text_md5,
             -1 AS n_pages, CAST(NULL AS INT) AS total_pages,
             false AS success,
             CASE cls WHEN 'reject_ext' THEN 'Unsupported file format'
                      WHEN 'reject_empty' THEN 'File is empty'
                      ELSE 'File size exceeds maximum allowed size'
             END AS error,
             -1 AS n_warnings, CAST(NULL AS VARCHAR) AS warnings_joined
      FROM routed WHERE cls IN ('reject_ext','reject_empty','reject_oversize')
    ), htmlrows AS (
      SELECT url, doc_type, 'HTML_GOLDEN' AS text_md5,
             -1 AS n_pages, CAST(NULL AS INT) AS total_pages,
             true AS success, CAST(NULL AS VARCHAR) AS error,
             -1 AS n_warnings, CAST(NULL AS VARCHAR) AS warnings_joined
      FROM routed WHERE cls LIKE 'html%'
    ), imgrows AS (
      -- image branch == image_extract oracle: surrogate header line +
      -- noise-filtered payload text; corrupt marker rows → error rows
      SELECT url, doc_type,
             CASE WHEN doc_id % 40 = 7 THEN NULL ELSE md5(
               array_to_string(list_concat(['## Page 0'],
                 list_transform(
                   list_filter(string_split(text, chr(10)),
                     l -> NOT (starts_with(l, '=====') OR starts_with(l, 'BASE:')
                           OR starts_with(l, 'PATCHES:') OR trim(l) = '(0x0)'
                           OR (starts_with(trim(l), '(0x0)') AND length(trim(l)) < 50)
                           OR trim(l) = '0x0' OR contains(l, 'torch.Size'))
                          AND trim(l) <> ''),
                   l -> trim(l))), chr(10))) END AS text_md5,
             -1 AS n_pages, CAST(NULL AS INT) AS total_pages,
             doc_id % 40 <> 7 AS success,
             CASE WHEN doc_id % 40 = 7 THEN 'corrupt page image' END AS error,
             -1 AS n_warnings, CAST(NULL AS VARCHAR) AS warnings_joined
      FROM routed WHERE cls IN ('image_png','image_jpg')
    ), pdfdocs AS (
      -- testgen page counts; words == Python str.split() (documents
      -- text is single-spaced ASCII, verified; filter guards empties)
      SELECT doc_id, url, doc_type,
             CAST(CASE WHEN cls = 'pdf_small' THEN 1 + doc_id % 3
                       ELSE 24 + doc_id % 7 END AS INT) AS n,
             (cls = 'pdf_large' AND doc_id % 40 = 15) AS has_corrupt,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM routed WHERE cls IN ('pdf_small','pdf_large')
    ), pdfpages AS (
      -- testgen._sentences chunking: size = max(1, len // n); last
      -- chunk takes the remainder
      SELECT doc_id, url, doc_type, n, has_corrupt, p.p AS p,
             -- coalesce: an out-of-range list_slice (fewer words than
             -- pages) is NULL in DuckDB, and a NULL page would vanish
             -- from string_agg — Python emits '' there
             coalesce(CASE WHEN p.p < n
                  THEN array_to_string(list_slice(w,
                         (p.p - 1) * greatest(1, length(w) // n) + 1,
                         p.p * greatest(1, length(w) // n)), ' ')
                  ELSE array_to_string(list_slice(w,
                         (n - 1) * greatest(1, length(w) // n) + 1,
                         length(w)), ' ')
             END, '') AS chunk,
             NOT (has_corrupt AND p.p = 2) AS page_ok
      FROM pdfdocs, LATERAL (SELECT unnest(generate_series(1, n)) AS p) p
    ), pdfclean AS (
      -- surrogate raw → T7 noise filter + T8 grounding strip + T10
      -- trim == '## Page <p>' header + the (non-blank) chunk line
      SELECT doc_id, url, doc_type, n, has_corrupt, p, page_ok,
             CASE WHEN trim(chunk) = '' THEN '## Page ' || p
                  ELSE '## Page ' || p || chr(10) || trim(chunk)
             END AS page_text
      FROM pdfpages
    ), pdfagg AS (
      SELECT doc_id, url, doc_type, n, has_corrupt,
             string_agg(page_text, chr(10) || chr(10) ORDER BY p)
               FILTER (WHERE page_ok) AS doc_text
      FROM pdfclean
      GROUP BY doc_id, url, doc_type, n, has_corrupt
    ), pdfrows AS (
      SELECT url, doc_type, md5(doc_text) AS text_md5,
             n AS n_pages, n AS total_pages,
             NOT has_corrupt AS success, CAST(NULL AS VARCHAR) AS error,
             CASE WHEN has_corrupt THEN 1 ELSE 0 END AS n_warnings,
             CASE WHEN has_corrupt
                  THEN 'Failed to process page 2: corrupt page image'
                  ELSE '' END AS warnings_joined
      FROM pdfagg
    )
    SELECT url, doc_type, text_md5, n_pages::INT AS n_pages,
           total_pages::INT AS total_pages, success, error,
           n_warnings::INT AS n_warnings, warnings_joined
    FROM (SELECT * FROM quarantine UNION ALL SELECT * FROM htmlrows
          UNION ALL SELECT * FROM imgrows UNION ALL SELECT * FROM pdfrows)
    """,
)
def q_extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship end-to-end extraction job (html boilerplate strip +
    pdf fan-out/OCR/reassembly + image branch + quarantine).

    Registry surface flattens the nested ``pages`` array to scalars
    (text digest, counts) so the driver can canonicalize rows.  Every
    column of every row is oracle-checked EXCEPT html text bytes: DOM
    extraction is not SQL-expressible, so html-branch rows surface the
    sentinel ``HTML_GOLDEN`` when text was produced (presence/success
    still driver-checked) and byte identity is asserted against the
    single-process oracle by tests/test_pipeline.py."""
    from extractor.config import ExtractConfig
    from extractor.pipeline import run_extraction
    from extractor.testgen import TEST_MAX_BYTES, pages_df

    pages = pages_df(spark, sf_dir)
    out = run_extraction(spark, pages, ExtractConfig(max_bytes=TEST_MAX_BYTES))
    html_extracted = (F.col("doc_type") == "html") & F.col("error").isNull()
    return out.select(
        "url",
        "doc_type",
        F.when(
            html_extracted,
            F.when(F.col("text").isNotNull(), F.lit("HTML_GOLDEN")),
        ).otherwise(F.md5("text")).alias("text_md5"),
        F.when(F.col("pages").isNull(), F.lit(-1))
        .otherwise(F.size("pages")).alias("n_pages"),
        "total_pages",
        "success",
        "error",
        F.when(F.col("warnings").isNull(), F.lit(-1))
        .otherwise(F.size("warnings")).alias("n_warnings"),
        F.array_join("warnings", " | ").alias("warnings_joined"),
    )

@register(
    "image_extract",
    """
    WITH img AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 20 = 6 THEN 'image_png'
                  ELSE 'image_jpg' END AS cls,
             doc_id % 40 = 7 AS corrupt
      FROM documents
      WHERE doc_id % 97 <> 0 AND doc_id % 20 IN (6, 7)
    ), cleaned AS (
      -- surrogate raw output = noise banners + grounding-tagged
      -- '## Page 0' header + the payload text; after T7 noise filter +
      -- T8 grounding strip the survivors are the header and the
      -- stripped non-blank text lines (same predicates as the
      -- stdout_noise_filter oracle)
      SELECT doc_id, cls, corrupt,
             array_to_string(list_concat(['## Page 0'],
               list_transform(
                 list_filter(string_split(text, chr(10)),
                   l -> NOT (starts_with(l, '=====') OR starts_with(l, 'BASE:')
                         OR starts_with(l, 'PATCHES:') OR trim(l) = '(0x0)'
                         OR (starts_with(trim(l), '(0x0)') AND length(trim(l)) < 50)
                         OR trim(l) = '0x0' OR contains(l, 'torch.Size'))
                        AND trim(l) <> ''),
                 l -> trim(l))), chr(10)) AS clean_text
      FROM img
    )
    SELECT 'https://example-42.test/' || cls || '/' ||
             printf('%06d', doc_id) ||
             CASE WHEN cls = 'image_png' THEN '.png' ELSE '.jpg' END AS url,
           CASE WHEN corrupt THEN NULL ELSE md5(clean_text) END AS text_md5,
           NOT corrupt AS success,
           CASE WHEN corrupt THEN 'corrupt page image' END AS error
    FROM cleaned
    """,
)
def q_image_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's primary endpoint (POST /ocr/image,
    api/routers/ocr.py:77-178) as a batch branch: route image
    extensions → compress/resize (T1/T2) → micro-batched single-image
    inference (T5) → clean (T7/T8).  Corrupt images become error rows
    (errors-are-data), verified against the SQL re-derivation of the
    surrogate+cleaner semantics."""
    from extractor.config import ExtractConfig
    from extractor.pipeline import _quarantine_error, extract_image, route
    from extractor.testgen import TEST_MAX_BYTES, pages_df

    cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)
    pages = pages_df(spark, sf_dir)
    routed = route(pages).withColumn("route_error", _quarantine_error(cfg))
    valid = routed.filter(
        (F.col("doc_type") == "image") & F.col("route_error").isNull()
    )
    out = extract_image(valid, cfg)
    return out.select(
        "url", F.md5("text").alias("text_md5"), "success", "error"
    )

# Conservative patterns that mean the same thing in Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4,10}"

@register(
    "pii_scrub",
    f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR ||
             '@mail-' || (doc_id % 7)::VARCHAR || '.example or +1-555-' ||
             lpad((doc_id % 10000)::VARCHAR, 7, '0') || ' today' AS raw
      FROM documents
    )
    SELECT doc_id,
           length(regexp_extract_all(raw, '{_EMAIL_RE}'))::BIGINT AS n_emails,
           length(regexp_extract_all(raw, '{_PHONE_RE}'))::BIGINT AS n_phones,
           md5(regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM seeded
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, phone numbers) — a mandatory pretraining
    corpus-hygiene pass.  Entirely JVM regexp (codegen, map-only, no
    shuffle); deterministic synthetic PII is injected so the scrubber
    does real work on the fixture text.  Patterns are restricted to
    the Java∩RE2 common dialect so the DuckDB oracle runs the IDENTICAL
    expressions (the same discipline would apply porting the pipeline
    between engines)."""
    docs = _docs(spark, sf_dir)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail-"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 7, "0"),
        F.lit(" today"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(_PHONE_RE), F.lit(0)))
        .cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )

@register(
    "template_strip",
    """
    -- the apply half: with the fixture's planted templates (NAVBAR +
    -- Copyright, both >= 60% of every host's pages), the stripped
    -- text is derivable per doc by pure arithmetic — the leading
    -- blank survivor line keeps its original (empty) bytes, the rare
    -- promo line survives because it is NOT a template
    SELECT 'h' || (doc_id % 9) AS host, doc_id AS id,
           chr(10) || 'unique content ' || doc_id ||
           CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'rare promo line'
                ELSE '' END AS text
    FROM documents
    """,
)
def q_template_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template removal end-to-end (host_template_lines →
    strip_template_lines) over the host_templates fixture: both
    whitespace-jittered NAVBAR copies and the Copyright line vanish
    from every page (trimmed-form matching), the blank line and the
    per-page unique/rare lines survive with their ORIGINAL bytes and
    order.  The oracle re-derives every page's stripped text by
    class arithmetic — a matching, ordering, or byte-preservation
    bug in either half flips rows."""
    from extractor.operators.dedup import host_template_lines, strip_template_lines

    docs = _docs(spark, sf_dir).select("doc_id")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string"))
    text = F.concat(
        F.lit("  NAVBAR host "), host, F.lit("  \n"),
        F.lit("NAVBAR host "), host, F.lit("\n"),
        F.lit("Copyright host "), host, F.lit(" footer\n"),
        F.lit("\n"),
        F.lit("unique content "), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("\nrare promo line"))
        .otherwise(F.lit("")),
    )
    pages = docs.select(host.alias("host"), F.col("doc_id"), text.alias("text"))
    tpl = host_template_lines(pages, min_pages=3, min_frac_bp=6000)
    return strip_template_lines(pages, tpl)

@register(
    "page_metadata",
    """
    -- Planted ground truth: the Spark side BUILDS each page's html
    -- (varying tag case, quote style, attribute order, whitespace,
    -- entities, and which fields exist, all keyed off doc_id) and
    -- runs the HTMLParser-based extractor; the oracle derives the
    -- same fields from doc_id arithmetic.  A green row proves the
    -- parser recovers exactly what was planted through every
    -- variation.
    SELECT 'https://m.test/' || doc_id::VARCHAR AS url,
           CASE WHEN doc_id % 17 = 0 THEN NULL
                ELSE 'Doc & ' || doc_id::VARCHAR END AS title,
           CASE WHEN doc_id % 5 = 0 THEN NULL
                ELSE 'Summary ' || doc_id::VARCHAR END AS description,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE 'https://canon.test/' || doc_id::VARCHAR END AS canonical,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE (['en','de','fr-FR','zh'])[(doc_id % 4) + 1] END AS lang,
           CASE WHEN doc_id % 11 = 0 THEN NULL
                ELSE 'OG ' || doc_id::VARCHAR END AS og_title
    FROM documents
    """,
)
def q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-field extraction (operators.metadata.page_metadata):
    title / meta description / canonical link / declared lang /
    og:title per page, one Arrow-batched map-only pass — the fields a
    corpus ships next to the markdown body (canonical feeds the URL
    tier, lang cross-checks the n-gram language ID).

    The synthesized pages exercise the parser's grammar corners:
    upper/lower tag case, single/double quotes, flipped attribute
    order, entity + embedded-whitespace titles, a multi-token
    ``rel="alternate canonical"``, and per-field absence classes."""
    from extractor.operators.metadata import page_metadata

    d = F.col("doc_id")
    ds = d.cast("string")
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr-FR"), F.lit("zh")),
        (d % 4 + 1).cast("int"),
    )
    title_tag = F.when(d % 17 == 0, F.lit("")).otherwise(
        F.when(d % 2 == 0,
               F.concat(F.lit("<TITLE>  Doc &amp;\n "), ds, F.lit(" </TITLE>")))
        .otherwise(F.concat(F.lit("<title>Doc &amp; "), ds, F.lit("</title>")))
    )
    desc_tag = F.when(d % 5 == 0, F.lit("")).otherwise(
        F.when(d % 2 == 0,
               F.concat(F.lit("<meta content='Summary "), ds,
                        F.lit("' NAME='Description'>")))
        .otherwise(F.concat(F.lit('<meta name="description" content="Summary '),
                            ds, F.lit('">')))
    )
    canon_tag = F.when(d % 7 == 0, F.lit("")).otherwise(
        F.when(d % 3 == 0,
               F.concat(F.lit('<LINK REL="alternate canonical" HREF="'
                              "https://canon.test/"), ds, F.lit('">')))
        .otherwise(F.concat(F.lit('<link rel="canonical" href="'
                                  "https://canon.test/"), ds, F.lit('"/>')))
    )
    og_tag = F.when(d % 11 == 0, F.lit("")).otherwise(
        F.concat(F.lit("<meta property='OG:Title' content='OG "), ds,
                 F.lit("'/>"))
    )
    html_attr = F.when(d % 13 == 0, F.lit("<html>")).otherwise(
        F.concat(F.lit('<HTML Lang="'), lang, F.lit('">'))
    )
    html = F.concat(
        F.lit("<!DOCTYPE html>"), html_attr, F.lit("<head>"),
        title_tag, desc_tag, canon_tag, og_tag,
        F.lit("</head><body><p>body</p></body></html>"),
    )
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://m.test/"), ds).alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )
    return page_metadata(pages)

def _hx(col_or_lit) -> Column:
    """Hex of a utf-8-encoded string expression (payload assembly for
    the charset_decode synthesis — binary built as one unhex at the
    end)."""
    return F.hex(F.encode(col_or_lit, "utf-8"))

@register(
    "charset_decode",
    """
    -- Planted ground truth: the Spark side assembles raw BYTE
    -- payloads (BOM prefixes, windows-1252 0xE9/0x80, shift-jis
    -- kana, a lying utf-8 label over an invalid 0xFF) and runs the
    -- WHATWG-order sniff + decode; the oracle states the expected
    -- charset and decoded text per class from doc_id arithmetic.
    SELECT 'https://c.test/' || doc_id::VARCHAR AS url,
           CASE doc_id % 7
             WHEN 0 THEN 'utf-8'
             WHEN 1 THEN 'cp1252'
             WHEN 2 THEN 'cp1252'
             WHEN 3 THEN 'shift_jis'
             WHEN 4 THEN 'utf-8'
             WHEN 5 THEN 'utf-8'
             WHEN 6 THEN 'cp1252'
           END AS charset,
           CASE doc_id % 7
             WHEN 0 THEN '<p>bom café ' || doc_id::VARCHAR || '</p>'
             WHEN 1 THEN '<meta charset="windows-1252"><p>café € '
                         || doc_id::VARCHAR || '</p>'
             WHEN 2 THEN '<p>café ' || doc_id::VARCHAR || '</p>'
             WHEN 3 THEN '<meta charset=shift-jis><p>こんにちは '
                         || doc_id::VARCHAR || '</p>'
             WHEN 4 THEN '<p>plain ascii ' || doc_id::VARCHAR || '</p>'
             WHEN 5 THEN '<meta charset=utf-8><p>bad' || chr(65533)
                         || ' ' || doc_id::VARCHAR || '</p>'
             WHEN 6 THEN '<meta http-equiv="Content-Type" '
                         || 'content="text/html; charset=ISO-8859-1">'
                         || '<p>café ' || doc_id::VARCHAR || '</p>'
           END AS text
    FROM documents
    """,
)
def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniff + decode (operators.charset.decode_pages) over
    raw byte payloads in the encodings a real crawl serves: BOM'd
    UTF-8, meta- and transport-declared windows-1252 (0xE9 / the
    0x80 euro ISO-8859-1 cannot represent), shift-jis kana, plain
    ascii, a page LYING about utf-8 over an invalid 0xFF (decodes to
    U+FFFD, never kills the task), and the http-equiv meta form.
    WHATWG order pinned: BOM > Content-Type param > meta prescan >
    utf-8 default.  Map-only Arrow pass; the oracle states the
    expected (charset, text) per class."""
    from extractor.operators.charset import decode_pages

    d = F.col("doc_id")
    ds = d.cast("string")
    cls = d % 7
    hx = (
        F.when(cls == 0, F.concat(
            F.lit("EFBBBF"),
            _hx(F.concat(F.lit("<p>bom café "), ds, F.lit("</p>")))))
        .when(cls == 1, F.concat(
            _hx(F.lit('<meta charset="windows-1252"><p>caf')),
            F.lit("E9"), _hx(F.lit(" ")), F.lit("80"),
            _hx(F.concat(F.lit(" "), ds, F.lit("</p>")))))
        .when(cls == 2, F.concat(
            _hx(F.lit("<p>caf")), F.lit("E9"),
            _hx(F.concat(F.lit(" "), ds, F.lit("</p>")))))
        .when(cls == 3, F.concat(
            _hx(F.lit("<meta charset=shift-jis><p>")),
            F.lit("82B182F182C982BF82CD"),
            _hx(F.concat(F.lit(" "), ds, F.lit("</p>")))))
        .when(cls == 4, _hx(F.concat(F.lit("<p>plain ascii "), ds,
                                     F.lit("</p>"))))
        .when(cls == 5, F.concat(
            _hx(F.lit("<meta charset=utf-8><p>bad")), F.lit("FF"),
            _hx(F.concat(F.lit(" "), ds, F.lit("</p>")))))
        .otherwise(F.concat(
            _hx(F.lit('<meta http-equiv="Content-Type" '
                      'content="text/html; charset=ISO-8859-1"><p>caf')),
            F.lit("E9"),
            _hx(F.concat(F.lit(" "), ds, F.lit("</p>")))))
    )
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://c.test/"), ds).alias("url"),
        F.unhex(hx).alias("html"),
        F.when(cls == 2, F.lit("text/html; charset=ISO-8859-1"))
        .otherwise(F.lit("text/html"))
        .alias("content_type"),
    )
    return decode_pages(pages, ctype_col="content_type")

@register(
    "extraction_churn",
    """
    -- the A/B canary re-derived by pure class arithmetic: templated
    -- hosts (idx < 9) lose both NAVBAR copies + the Copyright line
    -- in the variant (changed_bp 10000 among surviving rows), clean
    -- hosts (idx 9-11) are byte-identical (changed_bp 0), and every
    -- doc_id % 41 == 0 row is missing from the variant (only_base)
    WITH p AS (
      SELECT doc_id, doc_id % 12 AS idx,
             'h' || (doc_id % 12) || '.test' AS h
      FROM documents
    ), b AS (
      SELECT doc_id, idx, h,
             'https://' || h || '/p' || doc_id AS url,
             CASE WHEN idx < 9 THEN
               '  NAVBAR host ' || h || '  ' || chr(10) ||
               'NAVBAR host ' || h || chr(10) ||
               'Copyright host ' || h || ' footer' || chr(10) || chr(10) ||
               'unique content ' || doc_id ||
               CASE WHEN doc_id % 13 = 0
                    THEN chr(10) || 'rare promo line' ELSE '' END
             ELSE 'unique content ' || doc_id ||
               CASE WHEN doc_id % 13 = 0
                    THEN chr(10) || 'rare promo line' ELSE '' END
             END AS text
      FROM p
    ), v AS (
      SELECT doc_id, h, url,
             CASE WHEN idx < 9 THEN
               chr(10) || 'unique content ' || doc_id ||
               CASE WHEN doc_id % 13 = 0
                    THEN chr(10) || 'rare promo line' ELSE '' END
             ELSE 'unique content ' || doc_id ||
               CASE WHEN doc_id % 13 = 0
                    THEN chr(10) || 'rare promo line' ELSE '' END
             END AS text
      FROM b WHERE doc_id % 41 <> 0
    ), j AS (
      SELECT coalesce(b.h, v.h) AS host,
             b.text AS bt, v.text AS vt
      FROM b FULL OUTER JOIN v USING (url)
    )
    SELECT host,
           sum(CASE WHEN bt IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS pages_base,
           sum(CASE WHEN vt IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS pages_variant,
           sum(CASE WHEN bt IS NOT NULL AND vt IS NULL THEN 1 ELSE 0 END)
             ::BIGINT AS only_base,
           sum(CASE WHEN bt IS NULL AND vt IS NOT NULL THEN 1 ELSE 0 END)
             ::BIGINT AS only_variant,
           sum(CASE WHEN bt IS NOT NULL AND vt IS NOT NULL AND bt <> vt
                    THEN 1 ELSE 0 END)::BIGINT AS changed,
           ((10000 * sum(CASE WHEN bt IS NOT NULL AND vt IS NOT NULL
                              AND bt <> vt THEN 1 ELSE 0 END))
            // greatest(sum(CASE WHEN bt IS NOT NULL AND vt IS NOT NULL
                                 THEN 1 ELSE 0 END), 1))::BIGINT
             AS changed_bp,
           sum(CASE WHEN bt IS NOT NULL THEN strlen(bt) ELSE 0 END)
             ::BIGINT AS base_bytes,
           sum(CASE WHEN vt IS NOT NULL THEN strlen(vt) ELSE 0 END)
             ::BIGINT AS variant_bytes,
           (sum(CASE WHEN vt IS NOT NULL THEN strlen(vt) ELSE 0 END)
            - sum(CASE WHEN bt IS NOT NULL THEN strlen(bt) ELSE 0 END))
             ::BIGINT AS delta_bytes
    FROM j GROUP BY host
    """,
)
def q_extraction_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-grain A/B churn report (operators.crawl.extraction_churn)
    between a baseline extraction and a template-stripped variant —
    the canary an operator team reads before shipping an extractor
    change to the full corpus.  The variant is produced by the
    engine's OWN template pipeline (host_template_lines →
    strip_template_lines), so the oracle's class arithmetic checks
    both the report math and the strip chain: templated hosts must
    show changed_bp 10000 and negative delta_bytes, clean hosts
    changed_bp 0, and the planted doc_id % 41 row loss must surface
    as only_base — the row-loss alarm is the report's whole point."""
    from extractor.operators.crawl import extraction_churn
    from extractor.operators.dedup import host_template_lines, strip_template_lines

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id")
    host = F.concat(F.lit("h"), (d % 12).cast("string"), F.lit(".test"))
    url = F.concat(
        F.lit("https://"), host, F.lit("/p"), d.cast("string")
    )
    rare = F.when(d % 13 == 0, F.lit("\nrare promo line")).otherwise(F.lit(""))
    unique = F.concat(F.lit("unique content "), d.cast("string"), rare)
    templated_text = F.concat(
        F.lit("  NAVBAR host "), host, F.lit("  \n"),
        F.lit("NAVBAR host "), host, F.lit("\n"),
        F.lit("Copyright host "), host, F.lit(" footer\n\n"),
        unique,
    )
    text = F.when(d % 12 < 9, templated_text).otherwise(unique)
    pages = docs.select(host.alias("host"), d.alias("doc_id"),
                        url.alias("url"), text.alias("text"))
    base = pages.select("url", "text")
    tpl = host_template_lines(pages, min_pages=3, min_frac_bp=6000)
    stripped = strip_template_lines(pages, tpl)
    variant = (
        stripped.filter(F.col("id") % 41 != 0)
        .select(
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/p"),
                F.col("id").cast("string"),
            ).alias("url"),
            "text",
        )
    )
    return extraction_churn(base, variant)

@register(
    "text_normalize",
    """
    -- post-decode hygiene mirrored via DuckDB's own NFC: planted
    -- classes carry a decomposed accent (%6), a control residue
    -- (%5), horizontal-whitespace runs (%4); every doc gets outer
    -- whitespace so the explicit trim set is exercised
    WITH src AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 6 = 0
                  THEN ' caf' || 'e' || chr(769) ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN chr(7) || 'bell' ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
                  THEN '  tabs' || chr(9) || chr(9) || 'here' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' crA' || chr(13) || 'crB' || chr(13) || chr(10)
                       || 'crC' ELSE '' END ||
             '  ' || chr(10) AS text
      FROM documents
    ), norm AS (
      SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(regexp_replace(
                  nfc_normalize(text),
                  chr(13) || chr(10) || '?', chr(10), 'g'),
                  '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                  '[ ' || chr(9) || ']+', ' ', 'g'),
                  ' ' || chr(9) || chr(13) || chr(10)) AS norm_text
      FROM src
    )
    SELECT doc_id, norm_text, (norm_text <> text) AS changed FROM norm
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/whitespace hygiene (operators.charset.normalize_text):
    NFC composition, C0/DEL strip, horizontal-run collapse, explicit
    outer trim — the pass between charset decode and every
    digest-based stage (a composed-vs-decomposed grapheme split would
    silently break exact dedup and the template index).  The oracle
    runs DuckDB's own nfc_normalize against Python's unicodedata —
    two INDEPENDENT Unicode implementations agreeing byte-for-byte on
    the planted decomposed/control/whitespace classes, a stronger
    check than mirroring one library."""
    from extractor.operators.charset import normalize_text

    d = F.col("doc_id")
    src = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 6 == 0, F.lit(" caf" + "é")).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit("\x07bell")).otherwise(F.lit("")),
            F.when(d % 4 == 0, F.lit("  tabs\t\there")).otherwise(F.lit("")),
            F.when(d % 7 == 0, F.lit(" crA\rcrB\r\ncrC")).otherwise(F.lit("")),
            F.lit("  \n"),
        ).alias("text"),
    )
    return normalize_text(src).select(
        F.col("id").alias("doc_id"), "norm_text", "changed"
    )


def _phash_sql_expr(t: str = "t") -> str:
    """DuckDB mirror of operators.multimodal.phash_stub, generated by
    the same loop shape as the Spark expression so the 48 bit terms
    cannot drift."""
    rows, cols = 6, 9
    n = rows * cols

    def px(k: int) -> str:
        return (
            f"ord(substr({t}, (1 + floor({k} * (length({t})-1) / {n}.0))::INT, 1))"
        )

    terms = []
    idx = 0
    for i in range(rows):
        for j in range(cols - 1):
            k = i * cols + j
            terms.append(
                f"CASE WHEN {px(k)} < {px(k + 1)} "
                f"THEN {1 << idx}::BIGINT ELSE 0::BIGINT END"
            )
            idx += 1
    return "(" + " + ".join(terms) + ")"


@register(
    "image_dedup_phash",
    f"""
    -- perceptual-hash (dHash, 48-bit, stub pixel source) near-dup
    -- pairs at hamming<=3 via the shared Manku pigeonhole blocking;
    -- fixture plants in-place 3-char edits (every 10th doc) and exact
    -- copies (every 20th)
    WITH corpus AS (
      SELECT doc_id, text AS t FROM documents
      UNION ALL
      SELECT doc_id + 5000000, substr(text, 1, 49) || 'XQZ' || substr(text, 53)
      FROM documents WHERE doc_id % 10 = 0 AND length(text) > 60
      UNION ALL
      SELECT doc_id + 6000000, text FROM documents WHERE doc_id % 20 = 0
    ), sig AS (
      SELECT doc_id, {{PHASH}} AS sig FROM corpus WHERE length(t) >= 2
    ), ch AS (
      SELECT doc_id, sig, c.c AS chunk_idx,
             (sig // (2 ** (12 * c.c))::BIGINT) % 4096 AS chunk_val
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS c) c
    ), cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
             x.sig AS sa, y.sig AS sb
      FROM ch x JOIN ch y
        ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val
       AND x.doc_id < y.doc_id
    )
    SELECT a, b, bit_count(xor(sa, sb))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """.replace("{PHASH}", _phash_sql_expr("t")),
)
def q_image_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup detection: perceptual-hash (dHash) pairs
    over image payloads at hamming<=3 — thumbnails/re-encodes/small
    overlays of the same image collapse where byte-exact digests
    cannot (operators.multimodal.phash_pairs).  The pixel source is
    the documented stub (payload byte samples — PIL absent here);
    production swaps in a real thumbnailer behind the same 48-bit
    contract and this plan does not change.  Blocking reuses
    dedup.hamming_pairs_from_sigs: recall 1.0 at the radius, only
    (id, sig, chunk) rows shuffle, payloads never leave their scan.
    Fixture: every 10th doc gains an in-place 3-char edit (a few
    sampled pixels flip -> small hamming), every 20th an exact copy
    (hamming 0)."""
    from extractor.operators.multimodal import phash_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    near = docs.filter(
        (F.col("doc_id") % 10 == 0) & (F.length("text") > 60)
    ).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 49),
            F.lit("XQZ"),
            F.expr("substring(text, 53)"),
        ).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 6000000).alias("doc_id"), "text"
    )
    corpus = docs.unionAll(near).unionAll(exact)
    return phash_pairs(corpus, id_col="doc_id", payload_col="text")
