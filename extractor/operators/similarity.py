"""Similarity search over embedding columns.

* :func:`cosine_topk`        — brute-force exact top-k (the baseline;
  broadcast the query set, scan the corpus once, window for top-k).
* :func:`srp_bucket`/:func:`ann_topk_lsh` — the scale path: sign-
  random-projection LSH (Charikar 2002).  P deterministic hyperplanes
  partition the corpus into 2^P buckets; queries only score
  candidates in their own bucket, cutting the scored pairs by ~2^P at
  a small recall cost.  At 10^9 vectors the bucket column becomes the
  table's partition key, so a query touches one partition (partition
  pruning) instead of the corpus.

The hyperplanes are a pure function of (plane, dim) via md5 — the
same construction is expressible in SQL, which is what lets the
driver's DuckDB oracle check the bucketing AND the ranking.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def plane_component(p: int, d: int) -> float:
    """Deterministic hyperplane component in [-1, 1): md5-derived, the
    SQL mirror is ((hex64(md5('plane:p:d')) % 2001) - 1000) / 1000.0."""
    h = int(hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def planes(n_planes: int, dim: int) -> list[list[float]]:
    return [[plane_component(p, d) for d in range(dim)] for p in range(n_planes)]


def _dot_lit(v: Column, plane: list[float]) -> Column:
    # zip_with+aggregate, NOT an unrolled getItem chain: a 64-term
    # flat multiply-add × 24 planes trips the whole-stage-codegen
    # size fallback and runs INTERPRETED — measured 0.75 s (this
    # form) vs 3.5 s (unrolled) for the 4-band bucket pass at sf0.1.
    # ``v`` must be a PROJECTED column (F.col), never an inline
    # cast/expression — same re-evaluation trap as
    # dedup.shingle_hashes_from documents.
    return F.aggregate(
        F.zip_with(v, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def srp_bucket(v: Column, n_planes: int, dim: int, plane_offset: int = 0) -> Column:
    """2^P-way sign-random-projection bucket id of an embedding.

    ``plane_offset`` selects a disjoint plane family (indices
    [offset, offset+P)) so OR-amplified multi-band LSH (each band its
    own bucket table, a pair survives if ANY band agrees) can draw
    independent bands from the same deterministic md5 construction;
    offset 0 reproduces the original single-band bucket exactly."""
    bucket = F.lit(0)
    all_planes = planes(plane_offset + n_planes, dim)[plane_offset:]
    for p, plane in enumerate(all_planes):
        bucket = bucket + F.when(_dot_lit(v, plane) > 0, F.lit(2 ** p)).otherwise(0)
    return bucket


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    query_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    base_filter: Column | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k (query side broadcast).

    ``base_filter`` pins the CANDIDATE side to a sub-corpus: exact
    scoring costs |Q|·|base|, so an unfiltered base is O(N²/sample)
    at any fixed query-sampling rate — fine as a one-off ground-truth
    job, fatal as a recurring measurement at 10^9 vectors.  Recall
    evaluation (queries.ann_recall) passes the same filter to every
    approximate path so exact-vs-approx stays apples-to-apples on the
    pinned sub-corpus; the filter reaches the parquet scan (predicate
    pushdown), so the candidate scan itself shrinks."""
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    cand = base if base_filter is None else emb.filter(base_filter).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = base.filter(query_filter).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(cand.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def ivf_assign(
    base: DataFrame, centroids: DataFrame, nprobe: int = 1
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid cells by
    cosine (IVF coarse quantization).  ``base`` has (vec_id, v, nrm);
    ``centroids`` has (cell_id, cv, cn).  Deterministic tie-break:
    (cos desc, cell_id asc).

    Scale: the centroid set is tiny (≤ a few thousand) → broadcast
    cross join, then AGGREGATES — never a ranking window over the
    N×|cells| scored set.  nprobe=1 is one ``max_by`` with map-side
    partials (each task collapses its rows to one per vec_id before
    the shuffle, so the exchange moves N rows, not N×|cells|);
    nprobe>1 is the bounded two-level top-k
    (:mod:`extractor.operators.topk`), same partial-agg property.
    Both reproduce the window's exact tie order."""
    scored = (
        base.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id", "v", "nrm", "cell_id",
            (_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))).alias("ccos"),
        )
    )
    if nprobe == 1:
        # argmax by (ccos desc, cell_id asc): max_by over a struct
        # ordering — structs compare field-by-field, so (ccos,
        # -cell_id) max == the window's first row.  v/nrm ride in the
        # payload struct (constant per vec_id).
        best = scored.groupBy("vec_id").agg(
            F.max_by(
                F.struct("cell_id", "v", "nrm"),
                F.struct(F.col("ccos").alias("c"), (-F.col("cell_id")).alias("nc")),
            ).alias("best")
        )
        return best.select(
            "vec_id",
            F.col("best.v").alias("v"),
            F.col("best.nrm").alias("nrm"),
            F.col("best.cell_id").alias("cell_id"),
            F.lit(1).alias("cell_rank"),
        )
    from extractor.operators.topk import grouped_topk_exploded

    # k smallest of (-ccos, cell_id) == top-nprobe of (ccos desc,
    # cell_id asc); (vec_id, cell_id) is unique so the trailing
    # payload fields never influence the order.
    sort_s = F.struct(
        (-F.col("ccos")).alias("nc"),
        F.col("cell_id").alias("cell_id"),
        F.col("v").alias("v"),
        F.col("nrm").alias("nrm"),
    )
    ranked = grouped_topk_exploded(scored, ["vec_id"], sort_s, k=nprobe)
    return ranked.select(
        "vec_id",
        F.col("value.v").alias("v"),
        F.col("value.nrm").alias("nrm"),
        F.col("value.cell_id").alias("cell_id"),
        F.col("rank").cast("int").alias("cell_rank"),
    )


def ann_topk_ivf(
    emb: DataFrame,
    query_filter: Column,
    centroid_filter: Column,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid
    cells (1 cell per vector), probe the query's ``nprobe`` nearest
    cells, score only those candidates.

    The centroids here are a deterministic corpus subset (a real
    deployment trains k-means; the *engine shape* — broadcast
    assignment, cell-equi-join, per-query top-k — is identical and is
    what matters at scale: scored pairs drop by ~|cells|/nprobe, and a
    cell-partitioned table turns the probe into partition pruning)."""
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    cents = base.filter(centroid_filter).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    corpus_cells = ivf_assign(base, cents, nprobe=1).select(
        "cell_id", F.col("vec_id").alias("neighbor_id"), "v", "nrm"
    )
    probe_cells = ivf_assign(base.filter(query_filter), cents, nprobe=nprobe).select(
        "cell_id", F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"),
    )
    scored = (
        F.broadcast(probe_cells)
        .join(corpus_cells, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("sim"),
        )
        # a neighbor can appear via both probed cells → dedup before rank
        .groupBy("query_id", "neighbor_id").agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def ann_topk_lsh(
    emb: DataFrame,
    query_filter: Column,
    k: int = 3,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only within the query's SRP bucket.

    Scale shape: corpus bucketed once (map-only), bucket-equi-join
    replaces the cross join — 2^P fewer pairs; on a real table the
    bucket is the partition key and the join prunes partitions."""
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v")))).withColumn(
        "bucket", srp_bucket(F.col("v"), n_planes, dim)
    )
    q = base.filter(query_filter).select(
        F.col("bucket"),
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn"),
    )
    cand = base.select(
        "bucket", F.col("vec_id").alias("neighbor_id"), "v", "nrm"
    )
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """Symmetric per-vector int8 quantization:
    ``q_i = floor(x_i · levels / max_abs)`` with the per-vector scale
    kept alongside — the 4× memory cut that decides whether a
    10^9-vector ANN index fits executor memory (float32 64-dim =
    256 B/vec; int8 = 64 B + one double).  Cosine is INVARIANT to the
    per-vector scale, so quantized search ranks by the integer
    vectors' own cosine — no dequantization in the hot loop; the
    scale column exists for consumers that need magnitudes back.

    Deterministic across engines: float→double widening is exact,
    the ``·levels / max_abs`` arithmetic and ``floor`` are IEEE
    operations both engines implement identically (no round-half
    mode to disagree on — the reason floor, not round).  All-zero
    vectors quantize to zeros (guarded division).

    Returns (id, scale double, qvec array<int>); map-only, rides the
    scan."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    src = emb.select(F.col(id_col).alias("id"), v.alias("v")).select(
        "id",
        "v",
        # projected before the per-element lambda uses it (HOF
        # re-evaluation trap: inline array_max re-runs per element)
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))).alias("scale"),
    )
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("v"),
            lambda x: F.floor(x * F.lit(levels) / F.col("scale")).cast("int"),
        ),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0)))
    return src.select("id", "scale", q.alias("qvec"))


def quantized_cosine_topk(
    emb: DataFrame,
    query_pred,
    k: int = 5,
    base_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """Brute-force top-k by the cosine of the QUANTIZED vectors —
    the int8 search path whose agreement with float search
    ``ann_quantized`` measures.  Same shape as cosine_topk: the query
    side broadcasts, the base scans once, integer dot/norms fold in
    codegen, the float division and sqrt touch only the final
    per-pair score.  Returns (query_id, rank, neighbor_id, qsim)."""
    from pyspark.sql import Window

    qt = quantize_embeddings(emb, id_col=id_col, vec_col=vec_col, levels=levels)
    qt = qt.select(
        "id",
        "qvec",
        F.aggregate(
            F.zip_with(F.col("qvec"), F.col("qvec"), lambda a, b: (a * b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n2"),
    )
    base = qt.filter(base_pred) if base_pred is not None else qt
    queries = emb.filter(query_pred).select(F.col(id_col).alias("qid"))
    q_side = qt.join(queries, qt.id == queries.qid).select(
        F.col("id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("n2").alias("q_n2"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("q_qvec"), F.col("qvec"), lambda a, b: (a * b).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(q_side)
        .crossJoin(base)
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.when(
                (F.col("q_n2") > 0) & (F.col("n2") > 0),
                dot / F.sqrt(F.col("q_n2").cast("double") * F.col("n2")),
            )
            .otherwise(F.lit(0.0))
            .alias("qsim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("qsim", 6).alias("qsim"))
    )


def kmeans_train_int(
    emb: DataFrame,
    centroid_filter: Column,
    iterations: int = 2,
    dim: int = 64,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the IVF coarse quantizer: Lloyd's k-means (Lloyd 1982,
    the FAISS IVF training step) over fixed-point integer vectors —
    the piece :func:`ann_topk_ivf` deliberately stubs with a corpus
    subset.  Components are scaled to ``round(x*scale)`` longs so
    every distance, centroid sum, and the final inertia is INTEGER —
    no float-summation-order hazard between Spark's partial
    aggregation and any serial re-computation (the property that lets
    a DuckDB oracle unroll the same iterations and match hashes).

    Per iteration: one broadcast cross join of N vectors against the
    (tiny, ≤ a few thousand) centroid set, collapsed by ``min_by``
    with map-side partials — the exchange moves N rows, never
    N×|cells| — then ONE reduced aggregate (64 per-dim sums) keyed by
    cell.  No window over the scored set, no driver collect in the
    loop: the centroid relation stays a DataFrame and is re-broadcast
    by the optimizer each round (at 10^9 vectors each iteration is
    two map-side passes + one |cells|-sized shuffle).  Empty cells
    drop out, as in the standard algorithm.  Centroid update uses
    ``div`` (truncation toward zero — identical to DuckDB's ``//``),
    so the trained centroids are bit-reproducible.

    Returns one row per surviving cell: (cell_id, n_members, inertia,
    min_member, cnorm1) — membership count, total squared distance in
    scaled² units, the smallest member id, and the trained centroid's
    L1 norm (pins the centroid VALUES, not just the partition)."""
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * scale).cast("long"),
        ).alias("iv"),
    )
    cents = base.filter(centroid_filter).select(
        F.col("vec_id").alias("cell_id"), F.col("iv").alias("cv")
    )

    # UNROLLED getItem chain, NOT zip_with+aggregate — the inverse of
    # _dot_lit's pinned trade: one 64-term flat chain stays inside
    # whole-stage codegen (it is _dot_lit's 24-plane × 64-term total
    # that trips the size fallback), while the HOF form allocates a
    # 64-element intermediate array per candidate PAIR and runs
    # interpreted — measured 98 s (HOF) vs 11 s (this form) for one
    # assignment pass over 10.8M pairs at the 10× corpus.
    sq_expr = F.expr(
        " + ".join(f"(iv[{d}]-cv[{d}])*(iv[{d}]-cv[{d}])" for d in range(dim))
    )

    def assign(cdf: DataFrame) -> DataFrame:
        scored = base.crossJoin(F.broadcast(cdf)).select(
            "vec_id",
            "iv",
            "cell_id",
            sq_expr.alias("sqd"),
        )
        # argmin by (sqd asc, cell_id asc): min_by over a struct —
        # field-by-field comparison reproduces the window's tie order
        # without ranking the N×|cells| scored set
        best = scored.groupBy("vec_id").agg(
            F.min_by(
                F.struct("cell_id", "iv", "sqd"), F.struct("sqd", "cell_id")
            ).alias("b")
        )
        return best.select(
            "vec_id",
            F.col("b.iv").alias("iv"),
            F.col("b.cell_id").alias("cell_id"),
            F.col("b.sqd").alias("sqd"),
        )

    for _ in range(iterations):
        assigned = assign(cents)
        sums = assigned.groupBy("cell_id").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("iv")[d]).alias(f"s{d}") for d in range(dim)],
        )
        # localCheckpoint the |cells|-row centroid relation: truncating
        # lineage keeps every assignment plan one-iteration shallow
        # (without it the iteration-T cross join drags T nested
        # 64-wide aggregate plans through analysis + codegen — measured
        # 21 s → 3 s at sf0.1; the data cost is K rows, negligible)
        cents = sums.select(
            "cell_id",
            F.array(*[F.expr(f"s{d} div n") for d in range(dim)]).alias("cv"),
        ).localCheckpoint(eager=True)

    final = assign(cents)
    per_cell = final.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("sqd").alias("inertia"),
        F.min("vec_id").alias("min_member"),
    )
    cnorm = cents.select(
        "cell_id",
        F.aggregate(
            "cv", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("cnorm1"),
    )
    return per_cell.join(F.broadcast(cnorm), "cell_id").select(
        "cell_id", "n_members", "inertia", "min_member", "cnorm1"
    )
