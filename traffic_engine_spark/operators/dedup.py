"""Deduplication operators over a documents table — the training-data
pipeline family: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine.  All native Spark SQL (explodes + hash joins + window); at 100 TB
each stage is a shuffle on a bounded key (band bucket / block / hash) with
partial aggregation — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64, normalize, shingles_from_tokens, word_shingles, ws_tokens
from ..functions.vectors import cosine, hyperplane_bucket


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash → one row per distinct content with its
    cardinality and canonical (min) doc_id.  Map-side partial agg makes
    this a single cheap shuffle at any scale."""
    return (
        docs.select(F.col("doc_id"), hash64(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )


MINHASH_PRIME = 2147483647  # 2^31 - 1; keeps a*h+b < 2^62 (no bigint overflow
# in either Spark or DuckDB, so the SQL oracle is bit-identical)


def _minhash_coeffs(n_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic affine coefficients from the shared md5 hash."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    a = [(h(f"mh_a_{j}") % (MINHASH_PRIME - 2)) + 1 for j in range(n_hashes)]
    b = [h(f"mh_b_{j}") % MINHASH_PRIME for j in range(n_hashes)]
    return a, b


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 16, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, j, h): minhash over word shingles.

    One md5 per shingle, then the j-th hash is the affine rehash
    (a_j·h₀ + b_j) mod p — the standard cheap MinHash family.  The
    explode(shingles) × explode(seeds) feeds groupBy(doc, seed).min with
    map-side partial aggregation, so the shuffle carries only
    |docs| × n_hashes rows regardless of document length."""
    a, b = _minhash_coeffs(n_hashes)
    sh = (
        docs.select("doc_id", ws_tokens(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode(shingles_from_tokens(F.col("toks"), shingle_k)).alias("s"))
        .select("doc_id", (hash64(F.col("s")) % MINHASH_PRIME).alias("h0"))
    )
    seeded = sh.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j"), "h0"
    )
    aj = F.element_at(F.array(*[F.lit(x) for x in a]), F.col("j") + 1)
    bj = F.element_at(F.array(*[F.lit(x) for x in b]), F.col("j") + 1)
    return seeded.groupBy("doc_id", "j").agg(
        F.min((aj * F.col("h0") + bj) % MINHASH_PRIME).alias("h")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """MinHash → LSH band buckets → candidate self-join → exact Jaccard
    verify.  Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    The band-bucket join keys are md5 digests of each band's signature
    slice — a bounded-cardinality equi-join (the canonical LSH shuffle)."""
    sig = minhash_signatures(docs, text_col, n_hashes, shingle_k)
    bands = (
        sig.withColumn("band", F.floor(F.col("j") / band_size))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list(F.struct("j", "h"))).h)
            ).alias("bkey")
        )
    )
    # bucket-explode instead of a self-join: one pass over the signature
    # plan, and the shuffle key is (band, bkey) — bounded buckets.  Pairs
    # come from an in-bucket combination explode (ids sorted ⇒ a < b).
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_combos).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
        # candidates are tiny; materialise them so the signature chain runs
        # exactly once (it would otherwise re-run for the broadcast
        # cand_ids subquery AND the verify join)
        .localCheckpoint()
    )
    # exact verify — shingle sets computed only for candidate docs
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).unionByName(
        cand.select(F.col("doc_b").alias("doc_id"))
    ).distinct()
    sh = (
        docs.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select("doc_id", ws_tokens(F.col(text_col)).alias("toks"))
        .select(
            "doc_id",
            F.array_distinct(shingles_from_tokens(F.col("toks"), shingle_k)).alias("sh"),
        )
    )
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")).cast("double"))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """(doc_id, simhash): sign-sum SimHash over whitespace tokens using the
    shared md5 hash.  token-explode × bit-explode with map-side partial sum;
    the reconstruction is a single integer aggregation."""
    from ..functions.text import ws_tokens

    toks = docs.select("doc_id", F.explode(ws_tokens(F.col(text_col))).alias("t"))
    h = toks.select("doc_id", hash64(F.col("t")).alias("h"))
    bit = h.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        "h",
    ).withColumn(
        "v",
        F.when(F.expr("shiftrightunsigned(h, cast(b as int)) % 2") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    return (
        bit.groupBy("doc_id", "b")
        .agg(F.sum("v").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("b").cast("double")).cast("long")).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    shingle_k: int = 3,
    min_jaccard: float = 0.1,
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: pairs share the blocking key
    (e.g. (lang, source)), the quadratic blow-up is bounded per block.
    Skewed blocks at scale: salt the block key or fall back to LSH."""
    sh = docs.select(
        *block_cols, "doc_id", ws_tokens(F.col(text_col)).alias("toks")
    ).select(
        *block_cols, "doc_id",
        F.array_distinct(shingles_from_tokens(F.col("toks"), shingle_k)).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    return (
        a.join(b, on)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("inter", F.size(F.array_intersect("a.sh", "b.sh")).cast("double"))
        .withColumn("uni", F.size(F.array_union("a.sh", "b.sh")).cast("double"))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "jaccard",
        )
    )


def embedding_cosine_pairs(
    emb: DataFrame, min_cosine: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold (a < b).

    Brute-force O(n²) — correct baseline for small/blocked sets; the scale
    path buckets by `hyperplane_bucket` first (see operators/ann.py)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def embedding_lsh_pairs(
    emb: DataFrame, min_cosine: float = 0.9, n_planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", dims: int = 64,
) -> DataFrame:
    """Scale path: hyperplane-bucket candidates, then exact cosine verify —
    the shuffle carries only same-bucket pairs."""
    bucketed = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        hyperplane_bucket(F.col(vec_col), n_planes, dims).alias("bucket"),
    )
    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
