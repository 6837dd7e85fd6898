"""Approximate-nearest-neighbour search over an embedding column.

Baseline: brute-force cosine top-k as a broadcast join + window rank —
exact, and the yardstick every approximate variant is measured against.
Scale path: hyperplane-LSH bucketing (candidates share a bucket) and an
IVF-style coarse quantiser (assign to nearest of k seed centroids, search
within cell ± neighbouring cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, hyperplane_bucket, norm


def brute_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus — the corpus is never shuffled, ranking is a per-query window.
    Norms are computed once per row, not per pair (float-identical).
    Returns (query_id, rank, neighbor_id, cosine)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def lsh_buckets(
    emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id",
    vec_col: str = "embedding", dims: int = 64,
) -> DataFrame:
    """(vec_id, bucket): random-hyperplane signature — the ANN partition
    key.  At scale this is the repartition column; same-bucket search is
    a co-partitioned local scan."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        hyperplane_bucket(F.col(vec_col), n_planes, dims).alias("bucket"),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    band_planes: int = 4,
    n_bands: int = 8,
) -> DataFrame:
    """Approximate top-k: multi-band hyperplane candidates (any shared
    band bucket), then exact cosine rank over the candidate set.  Recall
    amplifies as 1-(1-p^r)^L; the corpus is only ever touched by bounded
    (band, bval) equi-joins plus an id-spine join-back for scoring."""
    from ..operators.dedup import lsh_band_keys

    qb = lsh_band_keys(queries, id_col, vec_col, band_planes, n_bands, dims).withColumnRenamed("id", "query_id")
    cb = lsh_band_keys(corpus, id_col, vec_col, band_planes, n_bands, dims).withColumnRenamed("id", "neighbor_id")
    cand = (
        cb.join(F.broadcast(qb), ["band", "bval"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def _centroid_rank(
    emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, centroid_id, rn): every vector ranked against every
    (broadcast) centroid — the shared core of assignment (rn=1) and probe
    selection (rn<=nprobe)."""
    c = centroids.select(F.col("centroid_id"), F.col("cv"), norm(F.col("cv")).alias("cn"))
    scored = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("vn"),
    ).join(F.broadcast(c)).withColumn(
        "cosine", dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("centroid_id"))
    return scored.withColumn("rn", F.row_number().over(w))


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """IVF coarse quantiser: assign each vector to its nearest centroid
    (broadcast centroids, argmax cosine).  (vec_id, centroid_id)."""
    return (
        _centroid_rank(emb, centroids, id_col, vec_col)
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_search(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus vectors live in their nearest-centroid cell
    (inverted lists = the corpus partitioning key at scale); each query
    probes its `nprobe` nearest cells and ranks exact cosine within the
    probed candidates.  Returns (query_id, rank, neighbor_id, cosine).

    Plan: two broadcast centroid argmax passes (no corpus shuffle beyond
    the cell equi-join), candidates bounded by the probed cells' sizes —
    the standard IVF recall/cost dial (nprobe ↑ ⇒ recall ↑)."""
    cells = ivf_assign(corpus, centroids, id_col, vec_col).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    probes = (
        _centroid_rank(queries, centroids, id_col, vec_col)
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), "centroid_id")
    )
    cand = cells.join(F.broadcast(probes), "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id").distinct()
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """IVF TRAINING: Lloyd's k-means over the embedding column, fully
    deterministic so a SQL oracle can replay it — init = the k vectors
    with id < k, squared-Euclidean assignment with (d2, centroid_id)
    tie-break, per-dimension means rounded to 6 decimals each update
    (kills summation-order FP noise between engines; the repo's standard
    float-parity pattern).  Returns the final assignment
    (vec_id, centroid_id, dist2) after ``iters`` assignment passes
    (means update between passes, empty clusters keep their centroid).

    Scale shape (the MLlib plan): centroids are k·dims doubles — they live
    on the DRIVER by design (bounded side data, not O(input)); each
    assignment pass is one scan with a per-row array_min over k candidate
    structs (zero shuffle), and each means update is one posexplode +
    partial-agg groupBy whose shuffle carries ≤ partitions × k × dims
    rows.  d2 = (vv - 2·v·c) + cc with every dot a sequential in-order
    fold — bit-identical in Spark HOFs, Python, and DuckDB
    list_dot_product."""
    v = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vv", dot(F.col("v"), F.col("v")))

    cent = [
        (int(r.vec_id), [float(x) for x in r.v])
        for r in v.filter(F.col("vec_id") < k).select("vec_id", "v").collect()
    ]
    cent.sort()
    if not cent:
        raise ValueError(
            f"kmeans_lloyd seeds its centroids from rows with {id_col} < k={k} "
            "(deterministic init); no such rows exist — remap ids to a dense "
            "0..n-1 range (e.g. row_number() - 1) before calling"
        )

    def assignment(cent_list):
        cand = F.array(*[
            F.struct(
                (
                    (F.col("vv")
                     - F.lit(2.0) * dot(F.col("v"), F.array(*[F.lit(x) for x in cv])))
                    + F.lit(sum(x * x for x in cv))
                ).alias("d2"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, cv in cent_list
        ])
        return v.select("vec_id", "v", F.array_min(cand).alias("best"))

    for it in range(iters):
        assigned = assignment(cent)
        if it == iters - 1:
            return assigned.select(
                "vec_id",
                F.col("best.cid").alias("centroid_id"),
                F.round("best.d2", 6).alias("dist2"),
            )
        means = (
            assigned.select(F.col("best.cid").alias("cid"), F.posexplode("v").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .collect()
        )
        by_cid: dict = {}
        for r in means:
            by_cid.setdefault(int(r.cid), {})[int(r.dim)] = float(r.m)
        cent = [
            (cid, [by_cid[cid][d] for d in range(dims)] if cid in by_cid else cv)
            for cid, cv in cent
        ]
