"""S4/S5 — the reference's protobuf exchange wire format, dependency-free.

The reference ingests GPS fixes and (in dead code) exports stats tiles as
proto2 messages.  Message/field layout from the generated descriptor
(`data/pbf/ExchangeFormat.java:10516-10549`, field tables `:10563-10624`;
SURVEY Appendix A):

    VehicleLocation        {1: req int64 timestamp, 2: req double lat,
                            3: req double lon, 4: opt int32 heading,
                            5: opt float speed}
    VehicleMessage         {1: req int64 vehicleId,
                            2: rep VehicleLocation locations}
    VehicleMessageEnvelope {1: opt int64 sourceId,
                            2: rep VehicleMessage messages}
    Header                 {1: req int64 osmCommitId,
                            2: req int64 creationTimestamp,
                            3: req int32 tileX, 4: req int32 tileY,
                            5: req int32 tileZ}
    SegmentDefinition      {1: req int64 wayId, 2: req int64 startNodeId,
                            3: req int64 endNodeId,
                            4-7: opt double startLat/startLon/endLat/endLon,
                            8: opt int32 length}
    BaselineStats          {1: req SegmentDefinition segment,
                            2: req float averageSpeed,
                            3: rep float hourOfWeekAverages,
                            4: opt float topQuartile,
                            5: rep float hourOfWeekTopQuartile,
                            6: opt float bottomQuartile,
                            7: rep float hourOfWeekBottomQuartile}
    BaselineTile           {1: req Header header,
                            2: rep BaselineStats segments}

The codec below implements the PUBLISHED protobuf wire format (varint
tags ``(field_num << 3) | wire_type``; wire types 0 = varint,
1 = 64-bit LE, 2 = length-delimited, 5 = 32-bit LE) directly — no
protobuf library in this container, and none needed: the format is a
public spec and the schema is ten flat messages.  Encode matches the
proto2 generated code's choices (repeated scalars UNPACKED, fields in
field-number order); decode additionally accepts packed repeated floats
and skips unknown fields, so payloads from a newer schema revision still
parse.

Scale posture: the codec is a BOUNDARY, not the analytic hot path — it
runs inside mapInPandas/applyInPandas at the ingest/export edge, one
Python pass per payload byte-string, fully parallel across partitions
and never on the driver.  Everything downstream of `envelopes_to_fixes`
is the same JVM-side pipeline the parquet path feeds.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# wire-format primitives (public spec: protobuf.dev/programming-guides/encoding)
# ---------------------------------------------------------------------------

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5
_U64 = (1 << 64) - 1


def _put_varint(out: bytearray, n: int) -> None:
    n &= _U64  # two's-complement 64-bit, per proto2 int32/int64 encoding
    while n > 0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _get_varint(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")
    return result & _U64, pos


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _signed32(n: int) -> int:
    n &= 0xFFFFFFFF
    return n - (1 << 32) if n >= (1 << 31) else n


def _put_tag(out: bytearray, field: int, wire: int) -> None:
    _put_varint(out, (field << 3) | wire)


def _put_i64(out: bytearray, field: int, v: int) -> None:
    _put_tag(out, field, _WIRE_VARINT)
    _put_varint(out, int(v))


def _put_double(out: bytearray, field: int, v: float) -> None:
    _put_tag(out, field, _WIRE_I64)
    out += struct.pack("<d", v)


def _put_float(out: bytearray, field: int, v: float) -> None:
    _put_tag(out, field, _WIRE_I32)
    out += struct.pack("<f", v)


def _put_msg(out: bytearray, field: int, payload: bytes) -> None:
    _put_tag(out, field, _WIRE_LEN)
    _put_varint(out, len(payload))
    out += payload


def _fields(buf) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, raw_value) over a message buffer.
    LEN fields yield a memoryview slice; numeric fields yield ints/bytes.
    Unknown field numbers are yielded too and ignored by the decoders —
    that IS the spec's forward-compatibility skip."""
    mv = memoryview(buf)
    pos = 0
    n = len(mv)
    while pos < n:
        tag, pos = _get_varint(mv, pos)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            v, pos = _get_varint(mv, pos)
        elif wire == _WIRE_I64:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            v = bytes(mv[pos:pos + 8])
            pos += 8
        elif wire == _WIRE_LEN:
            ln, pos = _get_varint(mv, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            v = mv[pos:pos + ln]
            pos += ln
        elif wire == _WIRE_I32:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            v = bytes(mv[pos:pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")
        yield field, wire, v


def _floats(wire: int, v) -> list[float]:
    """A repeated-float field element: unpacked (I32) or packed (LEN)."""
    if wire == _WIRE_I32:
        return [struct.unpack("<f", v)[0]]
    return [x[0] for x in struct.iter_unpack("<f", bytes(v))]


# ---------------------------------------------------------------------------
# message codecs — dicts in, bytes out (and back)
# ---------------------------------------------------------------------------


def encode_location(ts: int, lat: float, lon: float,
                    heading: int | None = None,
                    speed: float | None = None) -> bytes:
    out = bytearray()
    _put_i64(out, 1, ts)
    _put_double(out, 2, lat)
    _put_double(out, 3, lon)
    if heading is not None:
        _put_i64(out, 4, heading)
    if speed is not None:
        _put_float(out, 5, speed)
    return bytes(out)


def decode_location(buf) -> dict:
    loc = {"timestamp": None, "lat": None, "lon": None,
           "heading": None, "speed": None}
    for field, wire, v in _fields(buf):
        if field == 1 and wire == _WIRE_VARINT:
            loc["timestamp"] = _signed64(v)
        elif field == 2 and wire == _WIRE_I64:
            loc["lat"] = struct.unpack("<d", v)[0]
        elif field == 3 and wire == _WIRE_I64:
            loc["lon"] = struct.unpack("<d", v)[0]
        elif field == 4 and wire == _WIRE_VARINT:
            loc["heading"] = _signed32(v)
        elif field == 5 and wire == _WIRE_I32:
            loc["speed"] = struct.unpack("<f", v)[0]
    if loc["timestamp"] is None or loc["lat"] is None or loc["lon"] is None:
        raise ValueError("VehicleLocation missing required field")
    return loc


def encode_envelope(source_id: int | None,
                    messages: list[tuple[int, list[tuple]]]) -> bytes:
    """messages: [(vehicle_id, [(ts, lat, lon, heading?, speed?), ...]), ...]"""
    out = bytearray()
    if source_id is not None:
        _put_i64(out, 1, source_id)
    for vehicle_id, locations in messages:
        msg = bytearray()
        _put_i64(msg, 1, vehicle_id)
        for loc in locations:
            _put_msg(msg, 2, encode_location(*loc))
        _put_msg(out, 2, bytes(msg))
    return bytes(out)


def decode_envelope(buf) -> dict:
    env = {"source_id": None, "messages": []}
    for field, wire, v in _fields(buf):
        if field == 1 and wire == _WIRE_VARINT:
            env["source_id"] = _signed64(v)
        elif field == 2 and wire == _WIRE_LEN:
            msg = {"vehicle_id": None, "locations": []}
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == _WIRE_VARINT:
                    msg["vehicle_id"] = _signed64(v2)
                elif f2 == 2 and w2 == _WIRE_LEN:
                    msg["locations"].append(decode_location(v2))
            if msg["vehicle_id"] is None:
                raise ValueError("VehicleMessage missing vehicleId")
            env["messages"].append(msg)
    return env


def encode_baseline_tile(header: dict, segments: list[dict]) -> bytes:
    """header: {osm_commit_id, creation_ts, tile_x, tile_y, tile_z};
    segments: [{way_id, start_node_id, end_node_id, start_lat?, start_lon?,
                end_lat?, end_lon?, length?, average_speed,
                hour_of_week_avgs: [float]*, top_quartile?,
                bottom_quartile?}, ...]"""
    out = bytearray()
    hdr = bytearray()
    _put_i64(hdr, 1, header["osm_commit_id"])
    _put_i64(hdr, 2, header["creation_ts"])
    _put_i64(hdr, 3, header["tile_x"])
    _put_i64(hdr, 4, header["tile_y"])
    _put_i64(hdr, 5, header["tile_z"])
    _put_msg(out, 1, bytes(hdr))
    for s in segments:
        seg = bytearray()
        _put_i64(seg, 1, s["way_id"])
        _put_i64(seg, 2, s["start_node_id"])
        _put_i64(seg, 3, s["end_node_id"])
        for i, k in ((4, "start_lat"), (5, "start_lon"),
                     (6, "end_lat"), (7, "end_lon")):
            if s.get(k) is not None:
                _put_double(seg, i, s[k])
        if s.get("length") is not None:
            _put_i64(seg, 8, s["length"])
        st = bytearray()
        _put_msg(st, 1, bytes(seg))
        _put_float(st, 2, s["average_speed"])
        for v in s.get("hour_of_week_avgs") or ():
            _put_float(st, 3, v)
        if s.get("top_quartile") is not None:
            _put_float(st, 4, s["top_quartile"])
        for v in s.get("hour_top_quartile") or ():
            _put_float(st, 5, v)
        if s.get("bottom_quartile") is not None:
            _put_float(st, 6, s["bottom_quartile"])
        for v in s.get("hour_bottom_quartile") or ():
            _put_float(st, 7, v)
        _put_msg(out, 2, bytes(st))
    return bytes(out)


def decode_baseline_tile(buf) -> dict:
    tile = {"header": None, "segments": []}
    for field, wire, v in _fields(buf):
        if field == 1 and wire == _WIRE_LEN:
            hdr = {}
            keys = {1: "osm_commit_id", 2: "creation_ts",
                    3: "tile_x", 4: "tile_y", 5: "tile_z"}
            for f2, w2, v2 in _fields(v):
                if f2 in keys and w2 == _WIRE_VARINT:
                    hdr[keys[f2]] = _signed64(v2)
            tile["header"] = hdr
        elif field == 2 and wire == _WIRE_LEN:
            s = {"hour_of_week_avgs": [], "hour_top_quartile": [],
                 "hour_bottom_quartile": [], "top_quartile": None,
                 "bottom_quartile": None, "start_lat": None,
                 "start_lon": None, "end_lat": None, "end_lon": None,
                 "length": None}
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == _WIRE_LEN:
                    dkeys = {4: "start_lat", 5: "start_lon",
                             6: "end_lat", 7: "end_lon"}
                    ikeys = {1: "way_id", 2: "start_node_id",
                             3: "end_node_id", 8: "length"}
                    for f3, w3, v3 in _fields(v2):
                        if f3 in ikeys and w3 == _WIRE_VARINT:
                            s[ikeys[f3]] = _signed64(v3)
                        elif f3 in dkeys and w3 == _WIRE_I64:
                            s[dkeys[f3]] = struct.unpack("<d", v3)[0]
                elif f2 == 2 and w2 == _WIRE_I32:
                    s["average_speed"] = struct.unpack("<f", v2)[0]
                elif f2 == 3:
                    s["hour_of_week_avgs"] += _floats(w2, v2)
                elif f2 == 4 and w2 == _WIRE_I32:
                    s["top_quartile"] = struct.unpack("<f", v2)[0]
                elif f2 == 5:
                    s["hour_top_quartile"] += _floats(w2, v2)
                elif f2 == 6 and w2 == _WIRE_I32:
                    s["bottom_quartile"] = struct.unpack("<f", v2)[0]
                elif f2 == 7:
                    s["hour_bottom_quartile"] += _floats(w2, v2)
            tile["segments"].append(s)
    return tile


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

FIX_SCHEMA = StructType([
    StructField("source_id", LongType()),
    StructField("vehicle_id", LongType()),
    StructField("ts", LongType()),
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
    StructField("heading", IntegerType()),
    StructField("speed", FloatType()),
])

ENVELOPE_SCHEMA = StructType([
    StructField("source_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("n_messages", IntegerType()),
    StructField("n_fixes", IntegerType()),
])


def fixes_to_envelopes(fixes: DataFrame,
                       source_col: str = "source_id") -> DataFrame:
    """(source_id, vehicle_id, ts, lat, lon[, heading, speed]) → one
    VehicleMessageEnvelope payload per source: applyInPandas grouped by
    the source key (the shuffle key IS the envelope boundary — each
    envelope is built whole on one executor, nothing on the driver).
    Messages sort by vehicle_id and locations by ts so the bytes are
    deterministic under any input partitioning."""
    has_heading = "heading" in fixes.columns
    has_speed = "speed" in fixes.columns

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf[source_col].iloc[0])
        pdf = pdf.sort_values(["vehicle_id", "ts"], kind="mergesort")
        messages = []
        n_fixes = 0
        for vid, g in pdf.groupby("vehicle_id", sort=True):
            locs = []
            for r in g.itertuples(index=False):
                heading = getattr(r, "heading", None) if has_heading else None
                speed = getattr(r, "speed", None) if has_speed else None
                locs.append((
                    int(r.ts), float(r.lat), float(r.lon),
                    None if heading is None or pd.isna(heading) else int(heading),
                    None if speed is None or pd.isna(speed) else float(speed),
                ))
            messages.append((int(vid), locs))
            n_fixes += len(locs)
        return pd.DataFrame({
            "source_id": [sid],
            "payload": [encode_envelope(sid, messages)],
            "n_messages": [len(messages)],
            "n_fixes": [n_fixes],
        })

    return fixes.groupBy(source_col).applyInPandas(_encode, ENVELOPE_SCHEMA)


def envelopes_to_fixes(envelopes: DataFrame,
                       payload_col: str = "payload") -> DataFrame:
    """Envelope payloads → one row per GPS fix (the S4 ingest edge).
    mapInPandas: decodes each Arrow batch of byte-strings in place — no
    shuffle, no driver involvement; feeds plans/match.run_pipeline the
    same (trace_id, ts, lat, lon) shape decode_fixes produces."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("source_id", "vehicle_id", "ts", "lat", "lon",
                     "heading", "speed")}
            for buf in pdf[payload_col]:
                env = decode_envelope(bytes(buf))
                for m in env["messages"]:
                    for loc in m["locations"]:
                        rows["source_id"].append(env["source_id"])
                        rows["vehicle_id"].append(m["vehicle_id"])
                        rows["ts"].append(loc["timestamp"])
                        rows["lat"].append(loc["lat"])
                        rows["lon"].append(loc["lon"])
                        rows["heading"].append(loc["heading"])
                        rows["speed"].append(loc["speed"])
            out = pd.DataFrame(rows)
            out["heading"] = out["heading"].astype("Int32")
            out["speed"] = out["speed"].astype("Float32")
            yield out

    return envelopes.mapInPandas(_decode, FIX_SCHEMA)


def read_envelope_stream(spark: SparkSession, path: str) -> DataFrame:
    """S3×S4 — streaming ingest of envelope payloads: readStream over a
    parquet directory of (source_id, payload) rows → the streaming
    pipeline's fix-source shape (streaming/match_stream.FIX_SCHEMA), so
    wire-format feeds compose with the medallion exactly like the image
    table does.  The decode is the same mapInPandas kernel as the batch
    path (one code path, no drift); image_id is the deterministic
    source/vehicle/ts triplet (the wire format carries no image ids)."""
    env = spark.readStream.schema(
        "source_id long, payload binary").parquet(path)
    return envelopes_to_fixes(env).select(
        F.concat_ws("-", "source_id", "vehicle_id", "ts").alias("image_id"),
        F.col("vehicle_id").alias("trace_id"),
        "ts", "lat", "lon",
    )


TILE_PBF_SCHEMA = StructType([
    StructField("tile_x", LongType()),
    StructField("tile_y", LongType()),
    StructField("tile_z", LongType()),
    StructField("payload", BinaryType()),
    StructField("n_segments", IntegerType()),
])


def export_baseline_tiles_pbf(stats: DataFrame, osm_commit_id: int = 0,
                              creation_ts: int = 0) -> DataFrame:
    """S5's protobuf sink (the reference's is dead code,
    osm/OSMDataStore.java:442-473): per (tile_x, tile_y, tile_z) one
    BaselineTile payload.  Expects columns (tile_x, tile_y, tile_z,
    way_id, start_node_id, end_node_id, average_speed) plus optional
    (start_lat, start_lon, end_lat, end_lon, length, hour_of_week_avgs,
    top_quartile, bottom_quartile).  Same applyInPandas shape as the
    envelope encoder: the tile is the shuffle key and the payload unit."""
    opt = [c for c in ("start_lat", "start_lon", "end_lat", "end_lon",
                       "length", "hour_of_week_avgs", "top_quartile",
                       "bottom_quartile") if c in stats.columns]

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty, tz = (int(pdf["tile_x"].iloc[0]), int(pdf["tile_y"].iloc[0]),
                      int(pdf["tile_z"].iloc[0]))
        pdf = pdf.sort_values(
            ["way_id", "start_node_id", "end_node_id"], kind="mergesort")
        segs = []
        for r in pdf.to_dict("records"):
            s = {"way_id": int(r["way_id"]),
                 "start_node_id": int(r["start_node_id"]),
                 "end_node_id": int(r["end_node_id"]),
                 "average_speed": float(r["average_speed"])}
            for k in opt:
                v = r.get(k)
                if k == "hour_of_week_avgs":
                    s[k] = None if v is None else [float(x) for x in v]
                elif v is not None and not pd.isna(v):
                    s[k] = int(v) if k == "length" else float(v)
            segs.append(s)
        hdr = {"osm_commit_id": osm_commit_id, "creation_ts": creation_ts,
               "tile_x": tx, "tile_y": ty, "tile_z": tz}
        return pd.DataFrame({
            "tile_x": [tx], "tile_y": [ty], "tile_z": [tz],
            "payload": [encode_baseline_tile(hdr, segs)],
            "n_segments": [len(segs)],
        })

    return stats.groupBy("tile_x", "tile_y", "tile_z").applyInPandas(
        _encode, TILE_PBF_SCHEMA)


def baseline_tiles_from_pbf(tiles: DataFrame,
                            payload_col: str = "payload") -> DataFrame:
    """Inverse of export_baseline_tiles_pbf (reader side of the exchange):
    payloads → one row per segment with the header columns repeated."""
    schema = StructType([
        StructField("tile_x", LongType()),
        StructField("tile_y", LongType()),
        StructField("tile_z", LongType()),
        StructField("way_id", LongType()),
        StructField("start_node_id", LongType()),
        StructField("end_node_id", LongType()),
        StructField("average_speed", FloatType()),
        StructField("top_quartile", FloatType()),
        StructField("bottom_quartile", FloatType()),
    ])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            for buf in pdf[payload_col]:
                tile = decode_baseline_tile(bytes(buf))
                h = tile["header"]
                for s in tile["segments"]:
                    rows["tile_x"].append(h["tile_x"])
                    rows["tile_y"].append(h["tile_y"])
                    rows["tile_z"].append(h["tile_z"])
                    rows["way_id"].append(s["way_id"])
                    rows["start_node_id"].append(s["start_node_id"])
                    rows["end_node_id"].append(s["end_node_id"])
                    rows["average_speed"].append(s["average_speed"])
                    rows["top_quartile"].append(s["top_quartile"])
                    rows["bottom_quartile"].append(s["bottom_quartile"])
            out = pd.DataFrame(rows)
            for c in ("average_speed", "top_quartile", "bottom_quartile"):
                out[c] = out[c].astype("Float32")
            yield out

    return tiles.mapInPandas(_decode, schema)
