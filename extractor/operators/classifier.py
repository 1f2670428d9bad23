"""Model-based quality-classifier seam.

Production pretraining pipelines layer a LEARNED document-quality
score on top of rule-based filters — the public design is fastText
supervised classifiers (Joulin et al. 2016; used this way by
GPT-3/CCNet-style "looks like reference text" filters and
DCLM/FineWeb-Edu quality models): a linear model over bag-of-words
(+n-gram) features, one score per document, thresholded or used as a
sampling weight.  Shipping trained weights is out of scope here, so
this module is the SEAM, in the exact shape of
``extractor.engine``'s model seam:

* one contract — ``score_fn: Column -> Column`` mapping a text
  column to a ``double`` score in [0, 1];
* a registry (:data:`CLASSIFIERS`) the deployment extends — a real
  fastText model plugs in as an Arrow-batched ``pandas_udf`` (load
  the .bin once per executor in the UDF's lazy singleton, exactly
  like the engine's per-worker model cache) without touching any
  consumer plan;
* a deterministic SURROGATE default whose scores are reproducible
  in ANSI SQL, so every consumer query keeps its full DuckDB oracle
  (the same reason the OCR engine ships a surrogate).

Surrogate construction (integer-exact): each word hashes to a weight
``hex64(word) % 2001 - 1000`` ∈ [-1000, 1000]; the document score is
the clamped shifted mean ``(floor(mean) + 1000) / 2000`` — a frozen
random linear model.  It has no real signal (any fixed weights over
a synthetic corpus are arbitrary); what it proves is the PLUMBING:
score distribution shape, threshold/selection semantics, join
behavior, and the oracle contract a real model's scores flow
through.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from extractor.operators.dedup import hex64, words_of


def surrogate_score(text: Column) -> Column:
    """Frozen-random linear classifier score in [0, 1] (see module
    docstring); NULL/empty text scores NULL (no tokens, no opinion —
    callers decide the quarantine policy)."""
    ws = words_of(text)
    total = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: acc + (hex64(w) % 2001 - 1000),
    )
    mean = F.floor(total / F.size(ws))
    # split("", " ") is [""] (size 1), so gate on trimmed length, not
    # token count — empty text has no tokens and no opinion.
    return F.when(
        F.length(F.trim(text)) > 0, (mean + 1000).cast("double") / 2000.0
    )


# DuckDB mirror of surrogate_score (kept adjacent so retunes touch
# both): list_transform over the same hex64 construction.
SURROGATE_SCORE_SQL = (
    "((floor(list_sum(list_transform(string_split({t}, ' '), "
    "x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2001 - 1000)) "
    "/ len(string_split({t}, ' '))) + 1000) / 2000.0)"
)


CLASSIFIERS: dict[str, Callable[[Column], Column]] = {
    "surrogate": surrogate_score,
}


def classifier_score_expr(
    text: Column, classifier: Union[str, Callable[[Column], Column]] = "surrogate"
) -> Column:
    """Resolve the seam: a registered name or a caller-supplied
    ``Column -> Column`` (typically a pandas-UDF-wrapped fastText
    ``predict``)."""
    if callable(classifier):
        return classifier(text).cast("double")
    try:
        return CLASSIFIERS[classifier](text)
    except KeyError:
        raise ValueError(
            f"unknown classifier {classifier!r}; registered: "
            f"{sorted(CLASSIFIERS)} (or pass a Column->Column callable)"
        ) from None


def classifier_scores(
    docs: DataFrame,
    classifier: Union[str, Callable[[Column], Column]] = "surrogate",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document: (id, clf_score double ∈ [0,1] or NULL).

    Scale shape: map-only — whatever the classifier costs, it is one
    pass over the text column with no shuffle; a pandas-UDF model
    scorer Arrow-batches and amortizes model load per executor (the
    engine's micro-batching discipline applies unchanged)."""
    return docs.select(
        F.col(id_col),
        classifier_score_expr(F.col(text_col), classifier).alias("clf_score"),
    )


def select_by_classifier(
    docs: DataFrame,
    threshold: float,
    classifier: Union[str, Callable[[Column], Column]] = "surrogate",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus selection by model score: rows with
    ``clf_score >= threshold`` (NULL scores drop — an unscoreable
    document never enters the mixture silently).  The DCLM/FineWeb
    top-slice pattern; for weighted SAMPLING instead of a hard cut,
    consume :func:`classifier_scores` directly.

    Map-only: the score is an added column, the cut a filter — no
    join, no shuffle (scoring 10^12 documents is embarrassingly
    parallel and must stay that way)."""
    return docs.withColumn(
        "clf_score", classifier_score_expr(F.col(text_col), classifier)
    ).filter(F.col("clf_score") >= threshold)
