"""Vector column builders over array<float> embeddings — dot product,
norms, cosine — as native higher-order functions (zip_with/aggregate).

JVM-side; no Python in the similarity hot path.  A Pandas-UDF variant
(`cosine_topk_pandas`) exists for the dense-matrix case where one batch
holds many queries and numpy BLAS wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def plane_weight(j: int, k: int) -> int:
    """w_j[k] = (int(md5(f"{j}_{k}")[:8 hex], 16) % 1000) - 500 — the shared
    md5-derived hyperplane weights, computable identically in Python, Spark
    SQL and DuckDB."""
    import hashlib

    return int(hashlib.md5(f"{j}_{k}".encode()).hexdigest()[:8], 16) % 1000 - 500


def hyperplane_bucket(emb: Column, n_planes: int = 8, dims: int = 64) -> Column:
    """Random-hyperplane LSH bucket: sign bits of dot(emb, w_j) where the
    plane weights are derived from the shared md5 hash — reproducible in
    plain SQL (the DuckDB oracle builds the identical planes).

    Weights are folded to integer literals at plan-build time (hashlib ==
    md5() in the engines) and each dot is one zip_with/aggregate HOF pass —
    the expanded per-term expression tree (n_planes × dims md5+conv nodes)
    made codegen explode past ~8 planes."""
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        wj = F.array(*[F.lit(plane_weight(j, k)) for k in range(dims)])
        d = F.aggregate(
            F.zip_with(emb, wj, lambda x, w: x.cast("double") * w.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket
