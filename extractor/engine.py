"""Pluggable extraction engine (the reference's one extension seam).

The reference's extension point is a duck-typed ``model.infer``
contract (reference services/model_loader.py:93-96, 129-132 via
``trust_remote_code``; call site services/inference_engine.py:88-100).
We formalize it (SURVEY.md §2.5):

    infer_batch(images: list[bytes], prompt: str) -> list[str]

returning RAW model output (stdout-style, with grounding annotations
and debug noise) — downstream cleaning (T7/T8) is a separate stage,
exactly as in the reference where ``clean_stdout_output`` runs after
``model.infer`` (inference_engine.py:215-245).

Two implementations:

* :class:`SurrogateEngine` — deterministic, CPU-only. Stands in for
  the GPU model in every test/bench.  It "OCRs" a rasterized page by
  reading the page's embedded text (our synthetic page format carries
  it) and re-emitting it wrapped in the exact noise the real model
  prints (``=====`` banners, ``BASE:``/``PATCHES:`` lines,
  ``torch.Size`` shapes, grounding tags) so the cleaning stages do
  real byte-level work instead of being bypassed.
* :class:`DeepSeekOCREngine` — the real GPU wrapper (reference call:
  prompt, base_size=1024, image_size=640, crop_mode=True —
  constants.py:16-17, inference_engine.py:88-100; load flags bf16,
  TF32, cuDNN benchmark, torch.compile reduce-overhead, FA2 —
  services/model_loader.py:106-181).  Import-gated: constructing it
  without torch/transformers installed (this sandbox) raises
  ImportError; ``SPARK_GRAFT_ENGINE=deepseek`` selects it per worker
  on a GPU deployment.

Executor lifecycle: one engine per Python worker process, created
lazily on first batch and cached in a module-level singleton — the
batch analog of the reference's load-once model singleton
(model_loader.py:59-61, main.py:57-58).  Weights ship via object
store / ``--py-files``, never per-task.
"""

from __future__ import annotations

from extractor import MODEL_VERSION

# Output-format prompt binding (reference constants.py:46-56): six
# fixed formats, each bound to one prompt string; "markdown" is the
# default (T9/§1.1 "Prompt / output format").  The prompt is a JOB
# parameter (driver-validated), never a per-row column.
OUTPUT_FORMAT_PROMPTS = {
    "markdown": "<image>\n<|grounding|>Convert the document to markdown format "
                "with proper headers, lists, tables, and formatting.",
    "text": "<image>\n<|grounding|>Extract all text from the document as plain "
            "text without any formatting or structure.",
    "table": "<image>\n<|grounding|>Extract and format all tables from the "
             "document. Preserve table structure and data accurately.",
    "figure": "<image>\n<|grounding|>Identify and extract all figures, charts, "
              "and images. Provide captions, descriptions, and any associated text.",
    "json": "<image>\n<|grounding|>Extract all information from the document and "
            "output it as structured JSON data with appropriate key-value pairs.",
    "structured_data": "<image>\n<|grounding|>Extract structured information from "
                       "the document including fields, labels, and values in a "
                       "clear key-value format.",
}
DEFAULT_PROMPT = OUTPUT_FORMAT_PROMPTS["markdown"]

# Prompt guard (F6, reference api/security.py:76-117): driver-side
# assertion — the prompt is per-job, so this never runs on executors.
_SUSPICIOUS_PATTERNS = [
    "ignore previous instructions",
    "disregard",
    "forget everything",
    "new instructions",
    "system:",
    "assistant:",
]


def resolve_prompt(output_format: str) -> str:
    """T9 format→prompt binding + F6 guard, driver-side (reference
    ocr.py:155 resolution, :158 validation).  Raises ValueError on an
    unknown format or a prompt failing the guard — before any executor
    work is scheduled."""
    prompt = OUTPUT_FORMAT_PROMPTS.get(output_format)
    if prompt is None:
        raise ValueError(
            f"Unsupported output format: {output_format!r} "
            f"(supported: {sorted(OUTPUT_FORMAT_PROMPTS)})"
        )
    validate_prompt(prompt)
    return prompt


def validate_prompt(prompt: str, max_length: int = 2000) -> None:
    """Raise ValueError on empty/oversize/injection-pattern prompts
    (reference semantics: empty → 400, >2000 chars → 400, six
    suspicious substrings case-insensitively → 400)."""
    if not prompt or not prompt.strip():
        raise ValueError("Prompt cannot be empty")
    if len(prompt) > max_length:
        raise ValueError(f"Prompt exceeds maximum length of {max_length} characters")
    lowered = prompt.lower()
    for pattern in _SUSPICIOUS_PATTERNS:
        if pattern in lowered:
            raise ValueError("Prompt contains invalid or suspicious content")


def extract_text_from_result(result) -> str | None:
    """T6 result coercion (reference inference_engine.py:108-134):
    str → itself; dict → first non-empty of text/output/result/
    prediction (stringified); list → '\\n'-join of truthy items; else
    None.  Used by the pluggable real-model wrapper, where the duck-
    typed ``model.infer`` return shape is unknown."""
    if isinstance(result, str) and result:
        return result
    if isinstance(result, dict):
        for key in ("text", "output", "result", "prediction"):
            if key in result and result[key]:
                return str(result[key])
        return None
    if isinstance(result, list) and result:
        text = "\n".join(str(item) for item in result if item)
        return text or None
    return None

# ---------------------------------------------------------------------------
# Synthetic page payloads ("rasterized page" stand-in).
# A real deployment feeds JPEG page images here (T1/T2/T4 output); the
# sandbox has no PIL/fitz, so pages are byte payloads of the form
#   b"PAGE <n>\n<utf-8 text>"
# produced by extractor.pdf_extract.split_pdf_pages.
# ---------------------------------------------------------------------------

CORRUPT_MARKER = b"\xff\xfeCORRUPT"


class SurrogateEngine:
    """Deterministic stand-in for DeepSeek-OCR (tests + bench).

    ``SPARK_GRAFT_SURROGATE_PAGE_MS`` (default 0) adds that many
    milliseconds of simulated inference latency per page — the real
    model takes ~2,000 ms/page (reference README.md:356-363) while
    this surrogate is byte-linear string work, so skew/parallelism
    experiments (scripts/skew_demo.py) use the knob to reproduce the
    latency-bound regime the pipeline is actually designed for.
    """

    model_version = MODEL_VERSION

    def __init__(self) -> None:
        import os

        self.page_ms = float(os.environ.get("SPARK_GRAFT_SURROGATE_PAGE_MS", "0"))
        self.ready = False
        self._self_check()

    def _self_check(self) -> None:
        """Warmup/readiness analog of the reference's startup warmup
        inference + /health/ready gate (model_loader.py:229-296,
        health.py:80-91): run one known input through the engine at
        construction and verify the output shape, so a broken engine
        fails the FIRST task loudly instead of emitting garbage rows
        for hours."""
        out = self._infer_one(b"PAGE 1\nwarmup")
        if "warmup" not in out or "=====image 1=====" not in out:
            raise RuntimeError("surrogate self-check failed: %r" % out[:80])
        self.ready = True

    def infer_batch(self, images: list[bytes], prompt: str = DEFAULT_PROMPT) -> list[str]:
        out = [self._infer_one(img) for img in images]
        if self.page_ms > 0:
            import time

            time.sleep(self.page_ms * len(images) / 1000.0)
        return out

    @staticmethod
    def _infer_one(img: bytes) -> str:
        if img is None or CORRUPT_MARKER in bytes(img[:64]):
            # The real model raises on undecodable pixmaps; per-page
            # error isolation upstream turns this into an error row
            # (reference pdf_processor.py:228-247).
            raise ValueError("corrupt page image")
        body = bytes(img).decode("utf-8", errors="replace")
        if body.startswith("PAGE "):
            first_nl = body.find("\n")
            header, text = body[: first_nl if first_nl >= 0 else len(body)], (
                body[first_nl + 1 :] if first_nl >= 0 else ""
            )
            page_no = header[5:].strip()
        elif body.startswith("IMG "):
            # Standalone-image payload (testgen: b"IMG <w>x<h>\n<text>");
            # the header is codec metadata, not page content.
            first_nl = body.find("\n")
            page_no = "0"
            text = body[first_nl + 1 :] if first_nl >= 0 else ""
        else:
            page_no, text = "0", body
        # Raw model stdout, faithfully noisy (shapes the reference's
        # cleaner was built to filter: text_cleaner.py:84-95).
        return (
            f"=====image {page_no}=====\n"
            f"BASE: torch.Size([1, 3, 1024, 1024])\n"
            f"PATCHES: {page_no}\n"
            f"<|ref|>page<|/ref|><|det|>[[0, 0, 980, 1440]]<|/det|>## Page {page_no}\n"
            f"{text}\n"
            f"(0x0)\n"
        )


class DeepSeekOCREngine:
    """GPU deployment wrapper — the real model behind the same
    ``infer_batch`` seam the surrogate implements.

    Reproduces the reference's load and infer semantics:
      * load (model_loader.py:63-200): AutoTokenizer with pad-token →
        eos fallback (:93-104), FA2 availability probe (:28-35,
        106-126), AutoModel trust_remote_code + safetensors
        (:129-142), bf16 on CUDA + TF32 + cuDNN benchmark (:148-154),
        ``torch.compile(mode='reduce-overhead')`` best-effort
        (:161-175).
      * infer (inference_engine.py:53-106): the duck-typed
        ``model.infer(tokenizer, prompt=…, image_file=…,
        output_path=…, base_size=1024, image_size=640, crop_mode=True,
        save_results=False, test_compress=False)`` under
        ``torch.inference_mode()`` with stdout captured.  The model
        API takes a file PATH, so each image spills to executor-local
        scratch for the duration of the call (the S2 temp-file
        pattern, executor-side only — SURVEY §2.1).
      * result extraction (inference_engine.py:108-134, 167-245): the
        reference's full 3-way priority chain — captured stdout IF its
        CLEANED form is non-empty (banner-only stdout must not shadow
        a real result), else the coerced return value
        (:func:`extract_text_from_result`), else the first
        ``*.txt``/``*.md`` under the per-image output dir (S3 — a
        duck-typed model that only writes files still yields text),
        else ``""``.  The returned text is UNcleaned; T7/T8 cleaning
        is the downstream stage.  The chain's emptiness probe runs
        ``clean_stdout_output`` with the default grounding strip
        (reference ``strip_grounding=True`` default, ocr.py:131-134) —
        a stdout of pure grounding tags falls through to the model
        result, as the reference's default path does.

    Micro-batch semantics: the reference model's public API is
    strictly one image per ``model.infer`` call, so "micro-batched on
    GPU" means the Arrow batch bounds one serial loop per worker (the
    GPU is still saturated across workers).  When a checkpoint DOES
    expose a native batched entrypoint (duck-typed
    ``model.infer_batch(tokenizer, prompt=…, image_files=[…], …)``),
    this wrapper probes for it at load time and sends the whole Arrow
    batch in one call — the intra-batch GPU batching knob; the serial
    loop is the fallback contract.

    Requires torch + transformers (not installed in this sandbox —
    construction raises ImportError here, which is the import-try gate,
    not a stub)."""

    model_version = "deepseek-ocr"

    def __init__(self, model_name: str = "unsloth/DeepSeek-OCR"):
        import torch  # noqa: F401  (ImportError here = not a GPU deploy)
        from transformers import AutoModel, AutoTokenizer

        self._torch = torch
        self.model_name = model_name
        self.tokenizer = AutoTokenizer.from_pretrained(
            model_name, trust_remote_code=True
        )
        if self.tokenizer.pad_token is None:  # model_loader.py:93-104
            self.tokenizer.pad_token = self.tokenizer.eos_token
        try:  # FA2 probe, model_loader.py:28-35
            import flash_attn  # noqa: F401

            attn = "flash_attention_2"
        except Exception:
            attn = "eager"
        cuda = torch.cuda.is_available()
        self.model = AutoModel.from_pretrained(
            model_name,
            trust_remote_code=True,
            use_safetensors=True,
            attn_implementation=attn,
            torch_dtype=torch.bfloat16 if cuda else torch.float32,
        )
        self.model.eval()
        if cuda:
            self.model = self.model.cuda()
            # model_loader.py:148-154 perf flags
            torch.backends.cuda.matmul.allow_tf32 = True
            torch.backends.cudnn.allow_tf32 = True
            torch.backends.cudnn.benchmark = True
            try:  # model_loader.py:161-175 — best effort, never fatal
                self.model = torch.compile(self.model, mode="reduce-overhead")
            except Exception:
                pass

    def infer_batch(self, images: list[bytes], prompt: str = DEFAULT_PROMPT) -> list[str]:
        import contextlib
        import io
        import os
        import shutil
        import tempfile

        from extractor.cleaning import clean_stdout_output

        # Native GPU batching when the checkpoint supports it (probe,
        # not config — the duck-typed contract mirrors the reference's
        # trust_remote_code model surface).
        if images and hasattr(self.model, "infer_batch"):
            return self._infer_batch_native(images, prompt)

        out: list[str] = []
        with tempfile.TemporaryDirectory(prefix="dsocr_") as scratch:
            for i, img in enumerate(images):
                path = os.path.join(scratch, f"img_{i}.jpg")
                # Per-IMAGE output dir (reference mkdtemp per request,
                # inference_engine.py:193-196): the S3 file-fallback
                # glob below must never read a neighbor image's files.
                out_dir = os.path.join(scratch, f"out_{i}")
                os.makedirs(out_dir, exist_ok=True)
                with open(path, "wb") as fh:
                    fh.write(bytes(img))
                buf = io.StringIO()
                with self._torch.inference_mode(), contextlib.redirect_stdout(buf):
                    result = self.model.infer(
                        self.tokenizer,
                        prompt=prompt,
                        image_file=path,
                        output_path=out_dir,
                        base_size=1024,        # constants.py:16
                        image_size=640,        # constants.py:17
                        crop_mode=True,
                        save_results=False,
                        test_compress=False,
                    )
                captured = buf.getvalue()
                # T6 priority chain (inference_engine.py:215-245); raw
                # text out — cleaning is the next pipeline stage:
                # 1. stdout, but only if it CLEANS to something —
                #    banner-only stdout falls through (ref :219-229)
                text: str | None = None
                if captured and clean_stdout_output(captured):
                    text = captured
                # 2. the coerced duck-typed return value (ref :232-238)
                if text is None:
                    text = extract_text_from_result(result)
                # 3. S3: output files the model wrote on its own —
                #    first *.txt, then *.md (ref :136-166, :240-243)
                if text is None:
                    text = self._read_output_files(out_dir)
                out.append(text or "")
                os.remove(path)  # per-image scratch, not per-batch
                shutil.rmtree(out_dir, ignore_errors=True)
        return out

    def _infer_batch_native(self, images: list[bytes], prompt: str) -> list[str]:
        """One GPU call for the whole Arrow micro-batch, for models
        exposing a batched ``infer_batch(tokenizer, prompt=…,
        image_files=[…], …)`` entrypoint.  Same per-image result
        coercion as the serial path (stdout is per-call, so the chain
        here is return-value-only: a batched API returns a list of
        results, one per image, in order)."""
        import contextlib
        import io
        import os
        import tempfile

        with tempfile.TemporaryDirectory(prefix="dsocr_nb_") as scratch:
            paths = []
            for i, img in enumerate(images):
                path = os.path.join(scratch, f"img_{i}.jpg")
                with open(path, "wb") as fh:
                    fh.write(bytes(img))
                paths.append(path)
            buf = io.StringIO()
            with self._torch.inference_mode(), contextlib.redirect_stdout(buf):
                results = self.model.infer_batch(
                    self.tokenizer,
                    prompt=prompt,
                    image_files=paths,
                    output_path=scratch,
                    base_size=1024,
                    image_size=640,
                    crop_mode=True,
                    save_results=False,
                    test_compress=False,
                )
        if not isinstance(results, (list, tuple)) or len(results) != len(images):
            raise RuntimeError(
                "native infer_batch returned %r for %d images — expected "
                "one result per image" % (type(results).__name__, len(images))
            )
        return [extract_text_from_result(r) or "" for r in results]

    @staticmethod
    def _read_output_files(out_dir: str) -> str | None:
        """S3 output-file fallback (reference inference_engine.py:
        136-166): first ``*.txt`` then ``*.md`` under the per-image
        output dir, raw bytes as text — grounding strip happens in the
        downstream cleaning stage, not here."""
        import glob
        import os

        files = sorted(glob.glob(os.path.join(out_dir, "*.txt"))) + sorted(
            glob.glob(os.path.join(out_dir, "*.md"))
        )
        if not files:
            return None
        with open(files[0], encoding="utf-8") as fh:
            return fh.read() or None


_ENGINE = None

_ENGINE_CLASSES = {
    "surrogate": SurrogateEngine,
    "deepseek": DeepSeekOCREngine,
}


def get_engine():
    """Per-worker lazy singleton (reference model_loader.py:59-61
    analog).  ``SPARK_GRAFT_ENGINE=deepseek`` selects the GPU wrapper
    on a real deployment; default is the deterministic surrogate."""
    global _ENGINE
    if _ENGINE is None:
        import os

        name = os.environ.get("SPARK_GRAFT_ENGINE", "surrogate")
        if name not in _ENGINE_CLASSES:
            raise ValueError(
                f"Unknown SPARK_GRAFT_ENGINE {name!r} "
                f"(supported: {sorted(_ENGINE_CLASSES)})"
            )
        _ENGINE = _ENGINE_CLASSES[name]()
    return _ENGINE
