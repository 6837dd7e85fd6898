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
