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


def hyperplane_bucket(emb: Column, n_planes: int = 8, dims: int = 64) -> Column:
    """Random-hyperplane LSH bucket: sign bits of dot(emb, w_j) where the
    plane weights are derived from the shared md5 hash — reproducible in
    plain SQL (the DuckDB oracle builds the identical planes).

    w_j[d] = (int(md5(f"{j}_{d}")[:8 hex], 16) % 1000) - 500
    """
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        d = F.lit(0.0)
        for k in range(dims):
            w = F.conv(F.substring(F.md5(F.lit(f"{j}_{k}")), 1, 8), 16, 10).cast(
                "long"
            ) % 1000 - 500
            d = d + F.element_at(emb, k + 1).cast("double") * w.cast("double")
        bucket = bucket + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket
