"""Focused tests for the round-6 optimization internals: the rewritten
operators must be OUTPUT-identical to their simple definitions on
adversarial shapes the registry data does not exercise.

* hamming_pairs' exactly-once emission (first intact band) — pairs that
  share SEVERAL bands must still appear exactly once.
* the kNN position collapse — duplicated probe/station positions with
  station-id ties crossing the k boundary.
* the signature kernels — factorize+md5-over-uniques must equal the
  definitional per-row hash64 computation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from traffic_engine_spark import get_spark
from traffic_engine_spark.operators import dedup as D
from traffic_engine_spark.operators import spatial as SP


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="r06-tests", cores=4, shuffle_partitions=4)
    yield s


def _hash64_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hamming_pairs_exactly_once_multi_band(spark):
    """Pairs sharing 1, 2, 3 and 4 bands (identical sigs) must each appear
    exactly once, with the right Hamming distance."""
    sigs = [
        (1, 0x11223344),
        (2, 0x11223344),  # identical to 1: shares all 4 bands, hamming 0
        (3, 0x11223345),  # differs from 1 in band 0 only (1 bit): shares 3
        (4, 0x11223444),  # differs in band 1 (2 bits): shares 3
        (5, 0x91223344),  # differs in band 3 (1 bit): shares 3
        (6, 0x11F2F344),  # differs in bands 1,2 (>3 bits total?) check below
        (7, 0x0F223344),  # differs in band 3 by 4 bits -> excluded (h=4)
    ]
    df = spark.createDataFrame(pd.DataFrame(sigs, columns=["doc_id", "sig"]))
    out = (
        D.hamming_pairs(df, "doc_id", "sig", bits=32, n_bands=4, max_hamming=3)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # brute-force reference
    ref_rows = []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin(sigs[i][1] ^ sigs[j][1]).count("1")
            # banding completeness guarantee only holds for h <= 3
            if h <= 3:
                ref_rows.append((sigs[i][0], sigs[j][0], h))
    ref = pd.DataFrame(ref_rows, columns=["doc_a", "doc_b", "hamming"]).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    # exactly once: no duplicates, exact multiset equality
    assert not out.duplicated(["doc_a", "doc_b"]).any()
    pd.testing.assert_frame_equal(
        out.astype({"hamming": "int64"}), ref.astype({"hamming": "int64"})
    )


def test_knn_collapse_duplicate_positions_and_ties(spark):
    """Probes sharing a position and >k stations tied at one position:
    the collapse must reproduce the definitional window result, including
    the min-station-id tie-break across the k boundary."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # 3 probes at one position, 2 at another; 5 stations at ONE position
    # (ties!), 2 stations elsewhere
    probes = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 10, 11],
                "lat": [0.0, 0.0, 0.0, 1.0, 1.0],
                "lon": [0.0, 0.0, 0.0, 1.0, 1.0],
            }
        )
    )
    stations = spark.createDataFrame(
        pd.DataFrame(
            {
                "station_id": [7, 5, 9, 6, 8, 100, 101],
                "lat": [0.5, 0.5, 0.5, 0.5, 0.5, 2.0, 3.0],
                "lon": [0.5, 0.5, 0.5, 0.5, 0.5, 2.0, 3.0],
            }
        )
    )
    out = (
        SP.knn_join_broadcast(probes, stations, k=3, point_id="event_id")
        .toPandas()
        .sort_values(["event_id", "rank"])
        .reset_index(drop=True)
    )
    # definitional reference: full cross + window
    s = stations.select(
        F.col("station_id"),
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
    )
    scored = probes.join(s).withColumn(
        "dist2",
        SP.equirect_dist2(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")),
    )
    w = Window.partitionBy("event_id").orderBy(F.col("dist2"), F.col("station_id"))
    ref = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_id", "rank", "station_id", F.round("dist2", 12).alias("dist2"))
        .toPandas()
        .sort_values(["event_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)
    # ties at the nearest position resolve to the 3 smallest station ids
    assert out[out.event_id == 1].station_id.tolist() == [5, 6, 7]


def test_signature_kernels_match_definitional_hash(spark):
    """simhash / minhash signatures from the factorize+md5-over-uniques
    kernels equal a straight per-row Python recomputation."""
    docs_pd = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat sat on the mat",
                "the cat sat on the mat",   # duplicate content
                "a b a b a b a b",          # heavy repetition
                "unique words only here now friend",
            ],
        }
    )
    docs = spark.createDataFrame(docs_pd)

    # --- simhash ---
    out = D.simhash(docs).toPandas().set_index("doc_id")["simhash"].to_dict()
    for _, row in docs_pd.iterrows():
        toks = row["text"].lower().split()
        hs = [_hash64_py(t) for t in toks]
        n = len(hs)
        sig = 0
        for bit in range(32):
            s = sum((h >> bit) & 1 for h in hs)
            if 2 * s > n:
                sig += 1 << bit
        assert out[row["doc_id"]] == sig, row["text"]

    # --- minhash ---
    a, b = D._minhash_coeffs(16)
    sigs = (
        D.minhash_signature_array(docs)
        .toPandas()
        .set_index("doc_id")["sig"]
        .to_dict()
    )
    for _, row in docs_pd.iterrows():
        toks = row["text"].lower().split()
        shingles = [
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
        ]
        h0 = [_hash64_py(s) % D.MINHASH_PRIME for s in shingles]
        ref = [
            min((a[j] * h + b[j]) % D.MINHASH_PRIME for h in h0)
            for j in range(16)
        ]
        assert list(sigs[row["doc_id"]]) == ref, row["text"]


def test_viterbi_batch_matches_per_trace():
    """The lockstep batch decode must equal the per-trace reference on
    adversarial shapes: uncovered fixes mid-trace, fully-uncovered
    traces, single-fix traces, ragged candidate widths, cost ties."""
    from traffic_engine_spark.functions.viterbi import (
        viterbi_decode_batch_np,
        viterbi_decode_np,
    )

    rng = np.random.RandomState(7)
    for trial in range(20):
        n_traces = rng.randint(1, 8)
        k = rng.randint(1, 5)
        tf_starts, tf_ends = [], []
        cf, cs_, ce_, cseg, cd = [], [], [], [], []
        f = 0
        for _t in range(n_traces):
            n_fix_t = rng.randint(1, 9)
            tf_starts.append(f)
            for i in range(n_fix_t):
                # ~25% of fixes uncovered (no candidates)
                n_cand = 0 if rng.rand() < 0.25 else rng.randint(1, k + 1)
                segs = np.sort(rng.choice(100, size=n_cand, replace=False))
                for sgm in segs:
                    cf.append(f + i)
                    cseg.append(int(sgm))
                    cs_.append(int(sgm) % 7)   # few node ids -> adjacency rich
                    ce_.append(int(sgm) % 5)
                    # quantised distances -> frequent exact cost ties
                    cd.append(float(rng.randint(0, 4) * 10.0))
            f += n_fix_t
            tf_ends.append(f)
        n_fix = f
        args = (
            np.array(cf, dtype=np.int64),
            np.array(cseg, dtype=np.int64),
            np.array(cs_, dtype=np.int64),
            np.array(ce_, dtype=np.int64),
            np.array(cd, dtype=np.float64),
        )
        bs, bd = viterbi_decode_batch_np(
            *args, n_fix,
            np.array(tf_starts, dtype=np.int64),
            np.array(tf_ends, dtype=np.int64),
            k,
        )
        for a, b in zip(tf_starts, tf_ends):
            lo = np.searchsorted(args[0], a, side="left")
            hi = np.searchsorted(args[0], b, side="left")
            rs, rd = viterbi_decode_np(
                args[0][lo:hi] - a, args[1][lo:hi], args[2][lo:hi],
                args[3][lo:hi], args[4][lo:hi], b - a,
            )
            np.testing.assert_array_equal(bs[a:b], rs, err_msg=f"trial {trial}")
            np.testing.assert_array_equal(bd[a:b], rd, err_msg=f"trial {trial}")
