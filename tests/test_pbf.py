"""S4/S5 protobuf wire-format codec (sources/pbf.py).

Layer 1: golden bytes hand-derived from the PUBLIC wire-format spec
(tag = (field << 3) | wire; varint; LE doubles/floats) for the message
layout in ExchangeFormat.java:10516-10549 — the encoder must produce
exactly these bytes, byte for byte.
Layer 2: decode is a real parser — unknown fields skip, packed repeated
floats accepted, truncated input raises.
Layer 3: the Spark surface round-trips fixes and BaselineTiles exactly
(multiset identity) through applyInPandas/mapInPandas.
"""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from traffic_engine_spark.sources import pbf


def _v(n: int) -> bytes:
    out = bytearray()
    while n > 0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def test_location_golden_bytes():
    # required-only: 1:varint ts, 2:double lat, 3:double lon
    got = pbf.encode_location(1, 2.0, 3.0)
    want = (b"\x08\x01"
            + b"\x11" + struct.pack("<d", 2.0)
            + b"\x19" + struct.pack("<d", 3.0))
    assert got == want
    # optional heading (4:varint) and speed (5:float) append in order
    got = pbf.encode_location(300, -1.5, 2.25, heading=359, speed=7.5)
    want = (b"\x08" + _v(300)
            + b"\x11" + struct.pack("<d", -1.5)
            + b"\x19" + struct.pack("<d", 2.25)
            + b"\x20" + _v(359)
            + b"\x2d" + struct.pack("<f", 7.5))
    assert got == want


def test_envelope_golden_bytes():
    loc = pbf.encode_location(1, 2.0, 3.0)
    msg = b"\x08\x07" + b"\x12" + _v(len(loc)) + loc  # vehicleId=7 + location
    want = b"\x08\x05" + b"\x12" + _v(len(msg)) + msg  # sourceId=5 + message
    assert pbf.encode_envelope(5, [(7, [(1, 2.0, 3.0, None, None)])]) == want
    env = pbf.decode_envelope(want)
    assert env["source_id"] == 5
    assert env["messages"][0]["vehicle_id"] == 7
    assert env["messages"][0]["locations"][0] == {
        "timestamp": 1, "lat": 2.0, "lon": 3.0, "heading": None, "speed": None}


def test_decode_skips_unknown_fields():
    loc = pbf.encode_location(9, 1.0, 2.0)
    # unknown field 15 varint, unknown field 16 length-delimited
    # (tag (16<<3)|2 = 130 encodes as the two-byte varint 82 01)
    extra = b"\x78\x2a" + _v((16 << 3) | 2) + _v(3) + b"abc"
    got = pbf.decode_location(loc + extra)
    assert got["timestamp"] == 9 and got["lat"] == 1.0


def test_decode_accepts_packed_repeated_floats():
    hdr = (b"\x08\x00" + b"\x10\x00" + b"\x18\x01" + b"\x20\x02" + b"\x28\x03")
    seg = b"\x08\x01" + b"\x10\x02" + b"\x18\x03"  # way/start/end ids
    floats = struct.pack("<2f", 1.5, 2.5)
    stats = (b"\x0a" + _v(len(seg)) + seg
             + b"\x15" + struct.pack("<f", 9.0)          # averageSpeed
             + b"\x1a" + _v(len(floats)) + floats)       # PACKED field 3
    tile = (b"\x0a" + _v(len(hdr)) + hdr
            + b"\x12" + _v(len(stats)) + stats)
    got = pbf.decode_baseline_tile(tile)
    assert got["header"]["tile_x"] == 1
    s = got["segments"][0]
    assert s["average_speed"] == 9.0
    assert s["hour_of_week_avgs"] == [1.5, 2.5]


def test_truncated_input_raises():
    with pytest.raises(ValueError):
        pbf.decode_location(b"\x08")  # varint cut mid-field
    with pytest.raises(ValueError):
        pbf.decode_location(b"\x08\x01\x11\x00\x00")  # double cut short
        # (struct.unpack on a short slice raises struct.error -> surfaced)


def test_baseline_tile_roundtrip_python():
    hdr = {"osm_commit_id": 42, "creation_ts": 1700000000000,
           "tile_x": 327, "tile_y": 791, "tile_z": 11}
    segs = [
        {"way_id": 10, "start_node_id": 1, "end_node_id": 2,
         "average_speed": 13.25, "hour_of_week_avgs": [float(i) for i in range(168)],
         "top_quartile": 20.5, "bottom_quartile": 6.75,
         "start_lat": 37.5, "start_lon": -122.5},
        {"way_id": 11, "start_node_id": 2, "end_node_id": 3,
         "average_speed": 8.0, "length": 120},
    ]
    buf = pbf.encode_baseline_tile(hdr, segs)
    got = pbf.decode_baseline_tile(buf)
    assert got["header"] == hdr
    g0, g1 = got["segments"]
    assert g0["way_id"] == 10 and g0["hour_of_week_avgs"][167] == 167.0
    assert g0["top_quartile"] == 20.5 and g0["bottom_quartile"] == 6.75
    assert g0["start_lat"] == 37.5 and g0["start_lon"] == -122.5
    assert g1["length"] == 120 and g1["top_quartile"] is None
    assert g1["hour_of_week_avgs"] == []


def test_spark_fix_roundtrip(spark):
    pdf = pd.DataFrame({
        "source_id": [1, 1, 1, 2, 2],
        "vehicle_id": [7, 7, 8, 7, 9],
        "ts": [1000, 2000, 1500, 500, 1],
        "lat": [37.5, 37.5005, 37.6, -1.25, 0.0],
        "lon": [-122.5, -122.4995, -122.6, 3.5, 0.0],
        "heading": pd.array([0, 90, None, 359, 180], dtype="Int32"),
        "speed": pd.array([1.5, None, 3.25, 0.0, 31.0], dtype="Float32"),
    })
    fixes = spark.createDataFrame(pdf, schema=pbf.FIX_SCHEMA)
    env = pbf.fixes_to_envelopes(fixes).toPandas()
    assert sorted(env["source_id"]) == [1, 2]
    assert int(env.loc[env.source_id == 1, "n_messages"].iloc[0]) == 2
    assert int(env.loc[env.source_id == 1, "n_fixes"].iloc[0]) == 3
    back = pbf.envelopes_to_fixes(
        pbf.fixes_to_envelopes(fixes)).toPandas()
    key = ["source_id", "vehicle_id", "ts"]
    a = pdf.sort_values(key).reset_index(drop=True)
    b = back.sort_values(key).reset_index(drop=True)[pdf.columns.tolist()]
    pd.testing.assert_frame_equal(
        a.astype({"heading": "Int32", "speed": "Float32"}),
        b.astype({"heading": "Int32", "speed": "Float32"}),
        check_dtype=False)


def test_spark_fixes_feed_the_pipeline_shape(spark):
    """The decoded fix rows carry the exact (trace_id, ts, lat, lon)
    contract plans/match expects (vehicle_id ≡ trace_id)."""
    pdf = pd.DataFrame({
        "source_id": [3], "vehicle_id": [12], "ts": [1000],
        "lat": [37.5], "lon": [-122.5],
        "heading": pd.array([None], dtype="Int32"),
        "speed": pd.array([None], dtype="Float32"),
    })
    fixes = spark.createDataFrame(pdf, schema=pbf.FIX_SCHEMA)
    back = pbf.envelopes_to_fixes(pbf.fixes_to_envelopes(fixes))
    row = (back.selectExpr("vehicle_id AS trace_id", "ts", "lat", "lon")
           .collect()[0])
    assert (row.trace_id, row.ts, row.lat, row.lon) == (12, 1000, 37.5, -122.5)


def test_spark_baseline_tile_roundtrip(spark):
    pdf = pd.DataFrame({
        "tile_x": [327, 327, 328],
        "tile_y": [791, 791, 791],
        "tile_z": [11, 11, 11],
        "way_id": [10, 11, 12],
        "start_node_id": [1, 2, 3],
        "end_node_id": [2, 3, 4],
        "average_speed": pd.array([13.25, 8.0, 5.5], dtype="Float32"),
        "top_quartile": pd.array([20.5, None, 7.0], dtype="Float32"),
        "bottom_quartile": pd.array([6.75, None, 4.0], dtype="Float32"),
    })
    stats = spark.createDataFrame(pdf)
    tiles = pbf.export_baseline_tiles_pbf(stats, osm_commit_id=1,
                                          creation_ts=2)
    tp = tiles.toPandas()
    assert len(tp) == 2  # one payload per tile
    assert int(tp.loc[tp.tile_x == 327, "n_segments"].iloc[0]) == 2
    back = pbf.baseline_tiles_from_pbf(tiles).toPandas()
    key = ["tile_x", "way_id"]
    fcols = {"average_speed": "Float32", "top_quartile": "Float32",
             "bottom_quartile": "Float32"}
    a = pdf.sort_values(key).reset_index(drop=True).astype(fcols)
    b = (back.sort_values(key).reset_index(drop=True)[pdf.columns.tolist()]
         .astype(fcols))
    # unify <NA> vs nan null representations before the frame compare
    pd.testing.assert_frame_equal(a.fillna(-1.0), b.fillna(-1.0),
                                  check_dtype=False)


def test_differential_vs_google_protobuf():
    gp = pytest.importorskip("google.protobuf")  # not in this container
    del gp


def test_envelope_roundtrip_property_fuzz():
    """decode ∘ encode is the identity on arbitrary envelopes: full-range
    int64 ids/timestamps (negative → 10-byte two's-complement varints),
    arbitrary finite doubles, optional int32/float32 fields, empty
    location lists and empty envelopes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    dbl = st.floats(allow_nan=False, allow_infinity=False, width=64)
    loc = st.tuples(
        i64, dbl, dbl,
        st.one_of(st.none(),
                  st.integers(min_value=-(2**31), max_value=2**31 - 1)),
        st.one_of(st.none(),
                  st.floats(allow_nan=False, allow_infinity=False, width=32)),
    )
    msg = st.tuples(i64, st.lists(loc, max_size=5))
    env = st.tuples(st.one_of(st.none(), i64), st.lists(msg, max_size=4))

    @settings(max_examples=200, deadline=None)
    @given(env)
    def check(e):
        source_id, messages = e
        buf = pbf.encode_envelope(source_id, messages)
        got = pbf.decode_envelope(buf)
        assert got["source_id"] == source_id
        assert len(got["messages"]) == len(messages)
        for m_got, (vid, locs) in zip(got["messages"], messages):
            assert m_got["vehicle_id"] == vid
            assert len(m_got["locations"]) == len(locs)
            for l_got, (ts, lat, lon, heading, speed) in zip(
                    m_got["locations"], locs):
                assert l_got["timestamp"] == ts
                assert l_got["lat"] == lat and l_got["lon"] == lon
                assert l_got["heading"] == heading
                assert l_got["speed"] == speed

    check()


def test_streaming_envelope_ingest_matches_batch(spark, tmp_path):
    """read_envelope_stream (S3×S4): availableNow over an envelope parquet
    directory produces exactly the batch decode's fix rows in the
    streaming FIX_SCHEMA shape."""
    from traffic_engine_spark.streaming.match_stream import FIX_SCHEMA

    pdf = pd.DataFrame({
        "source_id": [1, 1, 2, 2, 2],
        "vehicle_id": [7, 8, 7, 7, 9],
        "ts": [1000, 1500, 500, 900, 1],
        "lat": [37.5, 37.6, -1.25, -1.26, 0.0],
        "lon": [-122.5, -122.6, 3.5, 3.6, 0.0],
        "heading": pd.array([None] * 5, dtype="Int32"),
        "speed": pd.array([None] * 5, dtype="Float32"),
    })
    fixes = spark.createDataFrame(pdf, schema=pbf.FIX_SCHEMA)
    env_dir = str(tmp_path / "envelopes")
    pbf.fixes_to_envelopes(fixes).select("source_id", "payload") \
        .write.parquet(env_dir)

    stream = pbf.read_envelope_stream(spark, env_dir)
    assert stream.isStreaming
    want_schema = spark.createDataFrame([], FIX_SCHEMA).schema
    assert [(f.name, f.dataType) for f in stream.schema.fields] == \
        [(f.name, f.dataType) for f in want_schema.fields]
    q = (stream.writeStream.format("memory").queryName("pbf_ingest")
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.awaitTermination(120)
    got = (spark.table("pbf_ingest").toPandas()
           .sort_values(["trace_id", "ts"]).reset_index(drop=True))
    want = (pdf.rename(columns={"vehicle_id": "trace_id"})
            [["trace_id", "ts", "lat", "lon"]]
            .sort_values(["trace_id", "ts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["trace_id", "ts", "lat", "lon"]], want, check_dtype=False)
    # image_id is the deterministic source-vehicle-ts triplet
    src = {(v, t): s for s, v, t in
           zip(pdf["source_id"], pdf["vehicle_id"], pdf["ts"])}
    expect_ids = [f"{src[(r.trace_id, r.ts)]}-{r.trace_id}-{r.ts}"
                  for r in got.itertuples(index=False)]
    assert got["image_id"].tolist() == expect_ids
