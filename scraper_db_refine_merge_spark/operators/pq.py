"""Product-quantization ANN (r6): the vector-compression scale path.

At 100 TB of embeddings, even the LSH/IVF indexes (operators/similarity.py)
still store full float vectors. Product quantization (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) compresses each
d-dim vector to ``m`` one-byte codes — 64 floats (256 B) → 8 codes — and
answers queries with Asymmetric Distance Computation (ADC): the query stays
uncompressed, each candidate's distance is the sum of ``m`` precomputed
sub-distances looked up by code. A 100 TB corpus becomes a ~3 TB code
table; the ADC scan reads codes, never vectors.

Determinism / oracle parity:
- Codebook = the subvectors of ``k`` md5-priority sample vectors (a sampled
  codebook — the honest baseline; k-means refinement of codebooks is the
  same deterministic machinery as q51's coarse quantizer and would slot in
  per subspace). Sampling by md5 keeps the codebook engine-independent.
- Sub-distances are sequential-fold sums in array order (zip_with +
  aggregate ≡ DuckDB list_sum(list_transform)) — bit-identical doubles —
  and ADC partials are converted to integer micro-units with
  ``floor(d2·1e6 + 0.5)`` BEFORE summation, so the per-candidate ADC score
  is an order-independent BIGINT sum (never a float sum across engines).
- Code assignment compares raw (bit-identical) sub-distances with the
  codeword index as tie-break.

Scale shape: the codebook is config-constant (m·k subvectors) — the one
relation here that may be force-broadcast, same class as region/nation.
Encoding is a narrow map over vectors (explode to m rows, join the
broadcast codebook, one bounded window over k rows per (vector, subspace)).
The ADC join broadcasts the query LUT (bounded by the query batch ×
m·k) onto the code table keyed by (subspace, code) — the corpus never
shuffles; the only wide exchange is the final (query, neighbor) partial
aggregation, map-side-combined to |queries|·|corpus| rows, which is the
ADC scan PQ exists to make cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PQ_M = 8  # subspaces
PQ_DSUB = 8  # dims per subspace (m · dsub = 64, the corpus dim)
PQ_K = 16  # codewords per subspace


def _subvectors(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    """Explode vectors into (out_id, s, sv): one row per subspace, sv the
    dsub-dim double subvector. Narrow map, zero shuffle."""
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.transform(
                    F.slice(F.col(vec_col), s * PQ_DSUB + 1, PQ_DSUB),
                    lambda x: x.cast("double"),
                ).alias("sv"),
            )
            for s in range(PQ_M)
        ]
    )
    return df.select(F.col(id_col).alias(out_id), F.explode(subs).alias("p")).select(
        out_id, F.col("p.s").alias("s"), F.col("p.sv").alias("sv")
    )


def _d2(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 distance, sequential fold in array order (bit-identical
    to DuckDB's list_sum(list_transform(...)))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(df: DataFrame, id_col: str, vec_col: str, k: int = PQ_K) -> DataFrame:
    """(s, j, cbv): per-subspace codewords = subvectors of the k
    md5-priority sample vectors. Config-constant size (m·k rows)."""
    pri = F.md5(F.col("__sid").cast("string"))
    seeds = (
        df.select(F.col(id_col).alias("__sid"), vec_col)
        .orderBy(pri, "__sid")  # TakeOrdered — per-partition top-k merge
        .limit(k)
        # row_number window runs over the k surviving rows only — bounded
        .withColumn("j", F.row_number().over(Window.orderBy(pri, "__sid")) - 1)
    )
    return _subvectors(seeds, "j", vec_col, "j").select(
        "s", "j", F.col("sv").alias("cbv")
    )


def pq_codebook_trained(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = PQ_K,
    iters: int = 2,
    round_scale: int = 6,
) -> DataFrame:
    """Per-subspace k-means (Lloyd) refinement of the sampled codebook —
    the training step real PQ deployments run (Jégou 2011 §III trains each
    subquantizer with k-means); the md5-sampled ``pq_codebook`` is the
    honest zero-training baseline, this is the quality path.

    Same derandomized machinery as q51's coarse quantizer, applied per
    subspace: md5-priority init, raw sequential-fold d2 assignment with
    codeword-index tie-break, exact-DECIMAL per-dimension means rounded to
    ``round_scale`` (order-independent across partial aggregations). A
    codeword that attracts no subvectors keeps its previous value
    (left-join + coalesce) — deterministic, never drops a code point.

    Scale shape: each round is one broadcast-codebook join over the
    subvector map (narrow, the same plan as pq_encode), one bounded window
    (k rows per (vector, subspace)), and one (m·k·dsub)-group aggregation —
    the update state is config-constant. Fixed ``iters`` keeps the plan
    static and the oracle mirrorable (generated CTE per round)."""
    sub = _subvectors(df, id_col, vec_col, "vec_id")
    cb = pq_codebook(df, id_col, vec_col, k)
    for _ in range(iters):
        d = sub.join(F.broadcast(cb), "s").select(
            "vec_id", "s", "j", _d2(F.col("sv"), F.col("cbv")).alias("d2")
        )
        w = Window.partitionBy("vec_id", "s").orderBy("d2", "j")
        asg = (
            d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("vec_id", "s", "j")
        )
        upd = (
            asg.join(sub, ["vec_id", "s"])
            .select("s", "j", F.posexplode("sv").alias("pos0", "val"))
            .groupBy("s", "j", (F.col("pos0") + 1).alias("pos"))
            .agg(
                F.round(
                    F.sum(F.col("val").cast("decimal(18,12)")).cast("double")
                    / F.count("*"),
                    round_scale,
                ).alias("cval")
            )
            .groupBy("s", "j")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda st: st["cval"],
                ).alias("__new")
            )
        )
        cb = cb.join(upd, ["s", "j"], "left").select(
            "s", "j", F.coalesce("__new", "cbv").alias("cbv")
        )
    return cb


def pq_quantization_error(
    df: DataFrame, codebook: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """One row ``(err_units BIGINT)``: total squared quantization error of
    encoding ``df`` against ``codebook``, per-subvector d2 floored into
    integer micro-units BEFORE the sum (order-independent, cross-engine
    exact) — the metric codebook training must strictly improve."""
    sub = _subvectors(df, id_col, vec_col, "vec_id")
    codes = pq_encode(df, codebook, id_col, vec_col)
    cb = codebook.select("s", F.col("j").alias("code"), "cbv")
    return (
        codes.join(sub, ["vec_id", "s"])
        .join(F.broadcast(cb), ["s", "code"])
        .select(
            F.floor(_d2(F.col("sv"), F.col("cbv")) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("__u")
        )
        .agg(F.sum("__u").alias("err_units"))
    )


def pq_encode(df: DataFrame, codebook: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, s, code): nearest codeword per (vector, subspace) —
    raw-double distance compare, codeword index tie-break. The codebook is
    config-constant, hence the forced broadcast (region/nation class)."""
    sub = _subvectors(df, id_col, vec_col, "vec_id")
    d = sub.join(F.broadcast(codebook), "s").select(
        "vec_id", "s", "j", _d2(F.col("sv"), F.col("cbv")).alias("d2")
    )
    w = Window.partitionBy("vec_id", "s").orderBy("d2", "j")  # k rows per group
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "s", F.col("j").alias("code"))
    )


def pq_adc_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_neighbors: int = 5,
    train_iters: int = 0,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_units, rank) — approximate
    squared L2 in integer micro-units, ascending, neighbor id tie-break.
    Queries score against PQ CODES only; their own row is excluded.
    ``train_iters > 0`` refines the codebook with that many per-subspace
    Lloyd rounds (q133) instead of the sampled baseline (q127)."""
    cb = (
        pq_codebook_trained(df, id_col, vec_col, iters=train_iters)
        if train_iters
        else pq_codebook(df, id_col, vec_col)
    )
    codes = pq_encode(df, cb, id_col, vec_col)
    qsub = _subvectors(queries, id_col, vec_col, "query_id")
    lut = qsub.join(F.broadcast(cb), "s").select(
        "query_id",
        "s",
        "j",
        F.floor(_d2(F.col("sv"), F.col("cbv")) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("pd2"),
    )
    scored = (
        codes.join(
            F.broadcast(lut),
            (codes.s == lut.s) & (codes.code == lut.j) & (codes.vec_id != lut.query_id),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pd2").alias("adc_units"))
    )
    from .ranking import topk_per_group

    # ADC scores are corpus-sized per query — two-phase top-k, not a
    # per-query single-task window (see similarity.cosine_topk)
    return topk_per_group(
        scored, ["query_id"], [F.col("adc_units"), F.col("neighbor_id")], k_neighbors
    ).select("query_id", "neighbor_id", "adc_units", "rank")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k_neighbors: int = 5,
    nprobe: int = 2,
    train_iters: int = 0,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC shape): coarse per-label centroid cells +
    product quantization of the RESIDUALS (v − centroid(cell)), queried by
    probing ``nprobe`` cells and running ADC with the query's PER-CELL
    residual. Residual quantization is what makes PQ codes sharp at scale:
    residual norms are much smaller than vector norms, so the same 16
    codewords cover a far tighter distribution.

    ``train_iters > 0`` refines the RESIDUAL codebook with that many
    per-subspace Lloyd rounds (pq_codebook_trained) instead of the
    md5-sampled baseline — residuals are exactly where k-means refinement
    pays most (FAISS trains IVFADC codebooks on residuals; Jégou 2011
    §IV-B), and the refinement state stays config-constant (m·k
    codewords), so the scale shape is unchanged: each round is one more
    broadcast-codebook join over the residual subvector map.

    Deterministic end-to-end: exact-decimal centroids (label_centroids),
    rounded-cosine cell assignment with id tie-breaks, md5-priority
    codebook sample, sequential-fold distances, integer micro-unit ADC.
    Scale shape: centroids and codebook are constant-size broadcasts;
    corpus → residual codes is a narrow map; the probe joins broadcast the
    query-side LUT (bounded by batch × nprobe × m·k); at production scale
    the code table is written bucketed by cell so each probe touches
    nprobe/n_cells of it — IVF pruning on top of 32× PQ compression.
    """
    from .similarity import cosine, ivf_assign, label_centroids

    cent = label_centroids(corpus, vec_col, label_col)
    assigned = ivf_assign(corpus, cent, id_col, vec_col, label_col)

    # corpus residuals vs own-cell centroid
    resid = (
        assigned.join(F.broadcast(cent.withColumnRenamed(label_col, "cell")), "cell")
        .select(
            id_col,
            "cell",
            F.zip_with(
                F.col(vec_col), "centroid", lambda x, y: x.cast("double") - y
            ).alias("rvec"),
        )
    )
    # pq_encode always emits the id as 'vec_id' — normalize the cell lookup
    # (and every downstream reference) to that name, or any non-default
    # id_col raises AnalysisException (ADVICE r6).
    cb = (
        pq_codebook_trained(resid, id_col, "rvec", iters=train_iters)
        if train_iters
        else pq_codebook(resid, id_col, "rvec")
    )
    codes = pq_encode(resid, cb, id_col, "rvec").join(
        resid.select(F.col(id_col).alias("vec_id"), "cell"), "vec_id"
    )

    # query probes: nprobe nearest cells, residual per probed cell
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    pw = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col(label_col).asc())
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__sim", F.round(cosine(F.col("__qvec"), F.col("centroid")), 5))
        .withColumn("__rn", F.row_number().over(pw))
        .filter(F.col("__rn") <= nprobe)
        .select(
            F.struct(F.col("query_id"), F.col(label_col).alias("cell")).alias("qc"),
            F.zip_with(
                F.col("__qvec"), F.col("centroid"), lambda x, y: x.cast("double") - y
            ).alias("rvec"),
        )
    )
    qsub = _subvectors(probes, "qc", "rvec", "qc")
    lut = qsub.join(F.broadcast(cb), "s").select(
        F.col("qc.query_id").alias("query_id"),
        F.col("qc.cell").alias("cell"),
        "s",
        "j",
        F.floor(_d2(F.col("sv"), F.col("cbv")) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("pd2"),
    )
    scored = (
        codes.join(
            F.broadcast(lut),
            (codes.cell == lut.cell)
            & (codes.s == lut.s)
            & (codes.code == lut.j)
            & (codes.vec_id != lut.query_id),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pd2").alias("adc_units"))
    )
    from .ranking import topk_per_group

    return topk_per_group(
        scored, ["query_id"], [F.col("adc_units"), F.col("neighbor_id")], k_neighbors
    ).select("query_id", "neighbor_id", "adc_units", "rank")


def fold_pq_codes(spark, target_root: str, new_vectors: DataFrame, id_col: str, vec_col: str) -> None:
    """Fold a batch of NEW vectors into a persistent PQ code index.

    Production PQ is train-once/encode-forever: the codebook is fitted on
    the first batch and FROZEN (re-fitting would silently re-mean every
    previously issued code), then each arriving batch is encoded against
    it and appended as an immutable ``codes`` part via the manifest store
    — commit I/O is O(batch), the accumulated code table is the union of
    parts, and codebook + codes move under one atomic pointer. Pair this
    with a partitionBy(cell) rewrite of the code parts for the IVF-PQ
    probe layout (tests/test_pq.py pins the pruning).
    """
    from ..streaming.store import store_commit_parts, store_read_part

    cb = store_read_part(spark, target_root, "codebook")
    parts = {}
    if cb is None:
        cb = pq_codebook(new_vectors, id_col, vec_col)
        parts["codebook"] = cb
    parts["codes"] = pq_encode(new_vectors, cb, id_col, vec_col)
    store_commit_parts(parts, target_root)


def pq_codes_from_index(spark, target_root: str) -> DataFrame:
    """The accumulated (vec_id, s, code) table of a folded PQ index."""
    from ..streaming.store import store_read_part

    codes = store_read_part(spark, target_root, "codes")
    if codes is None:
        # mirror contamination_scan's missing-index error (ADVICE r7 class)
        raise ValueError(f"no committed PQ index at {target_root}")
    return codes
