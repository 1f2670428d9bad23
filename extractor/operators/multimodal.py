"""Multimodal binary-column operators (decode/feature/frame-sample).

Images/audio/video are opaque ``binary`` columns with typed metadata —
the same shape the extraction pipeline uses for html/pdf payloads.
The Spark-side plumbing (schemas, ``mapInPandas`` batch iteration,
page/frame fan-out, partition sizing) is real and tested; the codec
calls are stubbed because PIL/ffmpeg are not installed in this
environment (gated behind import-try; a deterministic fake stands in
so the plumbing is exercised end to end).

Reference parity: the reference's image path is decode → flatten
alpha → resize (LANCZOS, max dim 2048, int-truncated) → JPEG q85
(services/image_compressor.py:45-222).  ``image_meta`` reproduces the
resize ARITHMETIC exactly (the part that determines downstream OCR
bytes); the pixel work is the stubbed codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DIMENSION = 2048  # reference constants.py:22

try:  # pragma: no cover - not installed in this sandbox
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: dimensions derived from
    the payload digest (stable across engines/runs).  A real deploy
    replaces this with PIL; the function signature and the arithmetic
    below do not change."""
    d = hashlib.md5(bytes(payload)).hexdigest()
    width = 1 + int(d[:15], 16) % 4096
    height = 1 + int(d[15:30], 16) % 4096
    return width, height


def parse_stub_header(payload: bytes) -> tuple[int, int] | None:
    """Synthetic-image header ``IMG <w>x<h>\\n…`` → (w, h), else None.

    The fixture generator embeds dimensions in the payload so the
    resize arithmetic (T2) is exercised on meaningful numbers without
    a codec; real image bytes never start with this header."""
    if not payload.startswith(b"IMG "):
        return None
    nl = payload.find(b"\n")
    head = payload[4 : nl if nl >= 0 else len(payload)]
    try:
        w_s, h_s = head.decode("ascii").strip().split("x", 1)
        return int(w_s), int(h_s)
    except (ValueError, UnicodeDecodeError):
        return None


def decode_dims(payload: bytes) -> tuple[int, int]:
    """Image dimensions: PIL when available AND the payload decodes;
    otherwise the stub header, then the digest-derived fake.  The
    fallback chain keeps the operator working (and oracle-checkable on
    text payloads) whether or not PIL is installed — installing the
    codec must never break the stub fixtures."""
    if HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(bytes(payload))) as im:
                return im.width, im.height
        except Exception:
            pass  # not a decodable image → stub semantics below
    hdr = parse_stub_header(bytes(payload))
    if hdr is not None:
        return hdr
    return _fake_decode_dims(payload)


def plan_compress(
    mode: str, width: int, height: int, max_dim: int = MAX_DIMENSION
) -> tuple[str, tuple[int, int] | None]:
    """T1/T2 DECISION logic as a pure function — the testable core of
    the reference's compress path (image_compressor.py:179-191 mode
    normalization, :45-68 + :192-194 resize decision):

      * mode in (RGBA, LA, P)   → ``flatten_white`` (alpha composited
        onto a white RGB background; P via an RGBA roundtrip)
      * other non-(RGB, L) mode → ``to_rgb`` (plain convert; CMYK etc.)
      * RGB / L                 → ``keep``

    plus the resize target: ``None`` when both sides fit ``max_dim``,
    else the aspect-preserving int-truncated dimensions.  Pinned by
    sandbox-runnable tests (no PIL needed); :func:`compress_image`'s
    PIL branch is a thin shim applying this plan."""
    if mode in ("RGBA", "LA", "P"):
        op = "flatten_white"
    elif mode not in ("RGB", "L"):
        op = "to_rgb"
    else:
        op = "keep"
    ow, oh = resize_dims(width, height, max_dim)
    return op, (None if (ow, oh) == (width, height) else (ow, oh))


def apply_compress_plan(im, op: str, resize_to: tuple[int, int] | None,
                        image_mod=None) -> bytes:
    """Apply a :func:`plan_compress` decision to an open image handle
    and return JPEG q85 optimized bytes (reference
    image_compressor.py:196-199 save flags).  ``image_mod`` defaults
    to PIL's ``Image`` module; tests inject a fake module, so the
    sequencing (flatten → resize → save) is pinned without PIL."""
    import io

    mod = image_mod if image_mod is not None else Image
    if op == "flatten_white":
        rgba = im.convert("RGBA")
        background = mod.new("RGB", rgba.size, (255, 255, 255))
        background.paste(rgba, mask=rgba.split()[-1])
        im = background
    elif op == "to_rgb":
        im = im.convert("RGB")
    if resize_to is not None:
        im = im.resize(resize_to, mod.LANCZOS)
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=85, optimize=True)
    return buf.getvalue()


def compress_image(payload: bytes, max_dim: int = MAX_DIMENSION) -> tuple[bytes, int, int, int, int]:
    """T1+T2: decode → flatten alpha onto white → RGB/L → aspect-
    preserving resize (LANCZOS, int-truncated) → JPEG q85 optimize.

    Reference semantics: services/image_compressor.py:159-222 (alpha
    flatten + mode conversion + save flags) and :45-68 (resize
    arithmetic, reproduced in :func:`resize_dims`).  Returns
    (bytes, width, height, out_width, out_height).  Without PIL the
    pixel work is a no-op passthrough and only the dimension
    arithmetic runs — the deterministic stub the tests/oracle check.

    Undecodable payloads pass through UNCHANGED even with PIL
    installed: that is the reference's own failure mode — its
    ``compress_image_bytes`` catches every exception and "uses
    original" bytes (image_compressor.py:215-222), deferring the
    failure to the model call, whose error the pipeline maps to an
    error row.  Rejecting here would be stricter than the reference
    and would also break the stub fixtures (``IMG WxH`` payloads are
    not PIL-decodable by design)."""
    payload = bytes(payload)
    if HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(payload)) as im:
                w, h = im.width, im.height
                op, resize_to = plan_compress(im.mode, w, h, max_dim)
                out = apply_compress_plan(im, op, resize_to)
                ow, oh = resize_to if resize_to is not None else (w, h)
                return out, w, h, ow, oh
        except Exception:
            pass  # undecodable → original bytes (reference :215-222)
    w, h = decode_dims(payload)
    ow, oh = resize_dims(w, h, max_dim)
    return payload, w, h, ow, oh


def resize_dims(width: int, height: int, max_dim: int = MAX_DIMENSION) -> tuple[int, int]:
    """Aspect-preserving resize arithmetic — byte-exact port of the
    reference's `_calculate_new_size` (image_compressor.py:45-68):
    scale by max_dim over the LARGER side, `int()` truncation both."""
    if width <= max_dim and height <= max_dim:
        return width, height
    scale = max_dim / width if width > height else max_dim / height
    return int(width * scale), int(height * scale)


def image_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Decode stub + resize planning over a binary column.

    Output: (id, n_bytes, width, height, out_width, out_height,
    digest).  Real Spark plumbing (Arrow batches, schema, null safety);
    stubbed codec."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = getattr(r, bin_col)
                rid = getattr(r, id_col)
                if payload is None:
                    rows.append((rid, 0, None, None, None, None, None))
                    continue
                payload = bytes(payload)
                # decode_dims: PIL when installed and decodable, stub
                # header / digest-derived dims otherwise — never raises
                # just because the codec became available.
                w, h = decode_dims(payload)
                ow, oh = resize_dims(w, h)
                rows.append(
                    (rid, len(payload), w, h, ow, oh, hashlib.md5(payload).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "n_bytes", "width", "height",
                         "out_width", "out_height", "digest"],
            )

    schema = (
        "id long, n_bytes long, width int, height int, "
        "out_width int, out_height int, digest string"
    )
    return df.select(F.col(id_col).alias(id_col), F.col(bin_col)).mapInPandas(
        fn, schema=schema
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    every: int = 16,
) -> DataFrame:
    """Video frame-sampling plumbing: binary → one row per sampled
    frame (the pdf-page fan-out pattern).  Frame boundaries are the
    stubbed codec (fixed-size chunks); a real deploy uses a container
    parser.  Output: (id, frame_no, frame_bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = getattr(r, bin_col)
                rid = getattr(r, id_col)
                if payload is None:
                    continue
                payload = bytes(payload)
                chunk = 256  # stub "frame" size
                n_frames = max(1, len(payload) // chunk)
                for i in range(0, n_frames, every):
                    rows.append((rid, i, payload[i * chunk : (i + 1) * chunk]))
            yield pd.DataFrame(rows, columns=["id", "frame_no", "frame_bytes"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        fn, schema="id long, frame_no int, frame_bytes binary"
    )


def embed_stub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", dim: int = 8
) -> DataFrame:
    """Deterministic pseudo-embedding of a text/binary column (md5-
    derived components in [0,1)) — the plumbing for an embedding UDF
    batch stage; a real deploy swaps in a model forward pass.  The
    construction is SQL-expressible, so it is oracle-checked."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for r in pdf.itertuples(index=False):
                text = getattr(r, text_col) or ""
                ids.append(getattr(r, id_col))
                vecs.append(
                    [
                        int(hashlib.md5(f"{text}:{i}".encode()).hexdigest()[:15], 16)
                        % 1000
                        / 1000.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame({"id": ids, "embedding": vecs})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        fn, schema="id long, embedding array<double>"
    )


# --------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (images as opaque payloads)
# --------------------------------------------------------------------------

PHASH_ROWS, PHASH_COLS = 6, 9  # 6 rows × 8 adjacent comparisons = 48 bits
PHASH_BITS = PHASH_ROWS * (PHASH_COLS - 1)


def phash_stub(payload: "F.Column") -> "F.Column":
    """48-bit difference-hash (dHash) over a stubbed pixel source.

    Real dHash: decode → grayscale thumbnail (9×6) → each bit is
    ``pixel[i][j] < pixel[i][j+1]``.  The DECODE is the stubbed codec
    (PIL absent here — module docstring): the "thumbnail" samples the
    payload's own bytes at 54 evenly-spaced positions
    (``1 + floor(k·(len−1)/54)``), so the hash is locality-sensitive
    to in-place payload edits exactly the way dHash is to pixel
    edits — a few changed bytes flip a few bits, and near-duplicate
    payloads land within a small hamming radius.  A production
    deployment swaps ONLY the pixel source (an Arrow-batched pandas
    UDF around a real thumbnailer, same 48-bit contract); the
    blocking join in :func:`phash_pairs` does not change.

    Expression-only (54 substring/ascii terms + 48 comparisons, all
    codegen) and byte-identical in ANSI SQL — which is what keeps the
    multimodal dedup tier fully oracle-checkable."""
    L = F.length(payload)
    n = PHASH_ROWS * PHASH_COLS

    def px(k: int):
        pos = (F.lit(k) * (L - 1)) / n
        return F.ascii(F.substring(payload, (F.lit(1) + F.floor(pos)).cast("int"), 1))

    bits = []
    for i in range(PHASH_ROWS):
        for j in range(PHASH_COLS - 1):
            k = i * PHASH_COLS + j
            bit = (px(k) < px(k + 1)).cast("long")
            bits.append(bit * F.lit(1 << len(bits)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return F.when(L >= 2, total).cast("long")


def phash_pairs(
    df: "DataFrame",
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> "DataFrame":
    """Near-duplicate image pairs by perceptual-hash hamming distance:
    the image twin of text SimHash dedup, sharing the exact pigeonhole
    blocking (dedup.hamming_pairs_from_sigs, 48-bit sigs → 12-bit
    chunks at the default).  Recall 1.0 at the radius by construction;
    only (id, sig, chunk) rows ever shuffle — payload bytes stay in
    the map stage that hashed them."""
    from extractor.operators.dedup import hamming_pairs_from_sigs

    # House rule (BASELINE r4): a wide expression consumed by several
    # downstream references must be barriered — CollapseProject would
    # inline the 48-term sig into each of the 4 chunk expressions
    # (and blow the janino method limit into interpreted fallback).
    # Measured at sf0.1: 8.27 s inlined vs 5.46 s barriered.
    sigs = (
        df.select(
            F.col(id_col).alias("id"),
            phash_stub(F.col(payload_col)).alias("sig"),
        )
        .where(F.col("sig").isNotNull())
        .localCheckpoint(eager=False)
    )
    return hamming_pairs_from_sigs(
        sigs, sig_bits=PHASH_BITS, max_hamming=max_hamming, n_chunks=n_chunks
    )
