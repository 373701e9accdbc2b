"""MySQL binary-JSON (JSONB) decode: bytes → JSON text.

Reference: MysqlTypeDeserializer.java:99-109 delegates JSON cells to
JsonBinary.parseAsString (mysql-binlog-connector-java), which walks the
MySQL JSONB wire format — the format itself is public, documented in
MySQL's sql/json_binary.h:
  type byte 0x00/0x01 small/large object, 0x02/0x03 small/large array,
  0x04 literal (null/true/false), 0x05/0x06 int16/uint16,
  0x07/0x08 int32/uint32, 0x09/0x0a int64/uint64, 0x0b double,
  0x0c utf8mb4 string (varint length).
Small documents use 2-byte counts/offsets, large use 4-byte; literals
and 16-bit ints are inlined in value entries, everything else is
offset-addressed from the start of the enclosing document.

A per-cell byte-walk has no built-in-expression form, so the decode is
a vectorized Arrow-batched pandas UDF (the sanctioned slow path —
per-BATCH python dispatch, not per-row). Emission contract: compact
separators, object keys in stored order (MySQL stores them sorted by
(length, bytes)), standard JSON string escaping — matching
JsonBinary.parseAsString's output for the supported subset.

The encoder exists for fixtures/tests (the binlog would supply real
JSONB bytes); it stores keys in MySQL's canonical (length, bytes)
order so round-trips match server behavior.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType

from ..session import prep, read_table

# --- type tags (sql/json_binary.h) ---
T_SMALL_OBJ = 0x00
T_LARGE_OBJ = 0x01
T_SMALL_ARR = 0x02
T_LARGE_ARR = 0x03
T_LITERAL = 0x04
T_INT16 = 0x05
T_UINT16 = 0x06
T_INT32 = 0x07
T_UINT32 = 0x08
T_INT64 = 0x09
T_UINT64 = 0x0A
T_DOUBLE = 0x0B
T_STRING = 0x0C

LIT_NULL, LIT_TRUE, LIT_FALSE = 0x00, 0x01, 0x02

_INLINE_SMALL = {T_LITERAL, T_INT16, T_UINT16}

_ESCAPES = {
    '"': '\\"', "\\": "\\\\", "\n": "\\n", "\r": "\\r", "\t": "\\t",
    "\b": "\\b", "\f": "\\f",
}


def _esc(s: str) -> str:
    out = []
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


# --- decode -----------------------------------------------------------


def _read_varint(b: bytes, pos: int) -> tuple[int, int]:
    """JSONB string length: 7 bits per byte, high bit = continuation."""
    n, shift = 0, 0
    while True:
        byte = b[pos]
        pos += 1
        n |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return n, pos
        shift += 7


def _fmt_double(x: float) -> str:
    if x == int(x) and abs(x) < 1e15:
        return f"{int(x)}.0"
    return repr(x)


def _decode_value(tag: int, b: bytes, pos: int) -> str:
    if tag == T_LITERAL:
        lit = b[pos]
        return {LIT_NULL: "null", LIT_TRUE: "true", LIT_FALSE: "false"}[lit]
    if tag == T_INT16:
        return str(struct.unpack_from("<h", b, pos)[0])
    if tag == T_UINT16:
        return str(struct.unpack_from("<H", b, pos)[0])
    if tag == T_INT32:
        return str(struct.unpack_from("<i", b, pos)[0])
    if tag == T_UINT32:
        return str(struct.unpack_from("<I", b, pos)[0])
    if tag == T_INT64:
        return str(struct.unpack_from("<q", b, pos)[0])
    if tag == T_UINT64:
        return str(struct.unpack_from("<Q", b, pos)[0])
    if tag == T_DOUBLE:
        return _fmt_double(struct.unpack_from("<d", b, pos)[0])
    if tag == T_STRING:
        n, p = _read_varint(b, pos)
        return '"' + _esc(b[p : p + n].decode("utf-8")) + '"'
    if tag in (T_SMALL_OBJ, T_LARGE_OBJ):
        return _decode_doc(tag, b, pos, obj=True)
    if tag in (T_SMALL_ARR, T_LARGE_ARR):
        return _decode_doc(tag, b, pos, obj=False)
    raise ValueError(f"unsupported JSONB type 0x{tag:02x}")


def _decode_doc(tag: int, b: bytes, base: int, obj: bool) -> str:
    small = tag in (T_SMALL_OBJ, T_SMALL_ARR)
    w = 2 if small else 4
    ifmt = "<H" if small else "<I"
    count = struct.unpack_from(ifmt, b, base)[0]
    pos = base + 2 * w  # skip count + size
    keys = []
    if obj:
        for _ in range(count):
            koff, klen = struct.unpack_from(
                ifmt, b, pos
            )[0], struct.unpack_from("<H", b, pos + w)[0]
            keys.append(b[base + koff : base + koff + klen].decode("utf-8"))
            pos += w + 2  # key offset (w) + key length (2, both formats)
    vals = []
    for _ in range(count):
        vtag = b[pos]
        if vtag in _INLINE_SMALL and small:
            vals.append(_decode_value(vtag, b, pos + 1))
        elif vtag in _INLINE_SMALL or vtag in (T_INT32, T_UINT32):
            # large format inlines anything ≤4 bytes
            if not small and vtag in _INLINE_SMALL | {T_INT32, T_UINT32}:
                vals.append(_decode_value(vtag, b, pos + 1))
            else:
                off = struct.unpack_from(ifmt, b, pos + 1)[0]
                vals.append(_decode_value(vtag, b, base + off))
        else:
            off = struct.unpack_from(ifmt, b, pos + 1)[0]
            vals.append(_decode_value(vtag, b, base + off))
        pos += 1 + w
    if obj:
        inner = ",".join(
            f'"{_esc(k)}":{v}' for k, v in zip(keys, vals)
        )
        return "{" + inner + "}"
    return "[" + ",".join(vals) + "]"


def jsonb_to_json(b: bytes | None) -> str | None:
    """Full-document decode; None/unparseable → None (the reference
    logs and returns null on parse failure, :103-108)."""
    if b is None or len(b) < 1:
        return None
    try:
        return _decode_value(b[0], b, 1)
    except Exception:
        return None


# --- encode (fixture/test side) ---------------------------------------


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        byte = n & 0x7F
        n >>= 7
        if n:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _mysql_key_order(keys):
    return sorted(keys, key=lambda k: (len(k), k.encode("utf-8")))


def _enc_value(v) -> tuple[int, bytes]:
    """→ (type tag, payload bytes) for a python scalar/list/dict."""
    if v is None:
        return T_LITERAL, bytes([LIT_NULL])
    if isinstance(v, bool):
        return T_LITERAL, bytes([LIT_TRUE if v else LIT_FALSE])
    if isinstance(v, int):
        if -(2**15) <= v < 2**15:
            return T_INT16, struct.pack("<h", v)
        if -(2**31) <= v < 2**31:
            return T_INT32, struct.pack("<i", v)
        if v < 2**63:
            return T_INT64, struct.pack("<q", v)
        # [2^63, 2^64): MySQL stores these under the UINT64 tag
        return T_UINT64, struct.pack("<Q", v)
    if isinstance(v, float):
        return T_DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return T_STRING, _enc_varint(len(raw)) + raw
    if isinstance(v, dict):
        return T_SMALL_OBJ, _enc_doc(v, obj=True)
    if isinstance(v, (list, tuple)):
        return T_SMALL_ARR, _enc_doc(list(v), obj=False)
    raise TypeError(type(v))


def _enc_doc(v, obj: bool) -> bytes:
    if obj:
        keys = _mysql_key_order(v.keys())
        items = [v[k] for k in keys]
    else:
        keys, items = [], v
    count = len(items)
    enc = [_enc_value(x) for x in items]
    key_raw = [k.encode("utf-8") for k in keys]
    # layout: count(2) size(2) [key entries 4 ea] [value entries 3 ea]
    #         keys... values...
    n_keyent = 4 * count if obj else 0
    n_valent = 3 * count
    pos_keys = 4 + n_keyent + n_valent
    key_offs = []
    p = pos_keys
    for kr in key_raw:
        key_offs.append(p)
        p += len(kr)
    val_entries = bytearray()
    tail = bytearray()
    tail_base = p
    for tag, payload in enc:
        if tag in _INLINE_SMALL:
            val_entries.append(tag)
            val_entries += payload.ljust(2, b"\x00")[:2]
        else:
            val_entries.append(tag)
            val_entries += struct.pack("<H", tail_base + len(tail))
            tail += payload
    out = bytearray()
    size = tail_base + len(tail)
    out += struct.pack("<H", count) + struct.pack("<H", size)
    for off, kr in zip(key_offs, key_raw):
        out += struct.pack("<H", off) + struct.pack("<H", len(kr))
    out += val_entries
    for kr in key_raw:
        out += kr
    out += tail
    return bytes(out)


def json_value_to_jsonb(v) -> bytes:
    """Encode a python value as a full JSONB document (fixtures only)."""
    tag, payload = _enc_value(v)
    return bytes([tag]) + payload


# --- Spark surface ----------------------------------------------------


@pandas_udf(StringType())
def jsonb_decode_udf(s: pd.Series) -> pd.Series:
    return s.map(jsonb_to_json)


@pandas_udf(BinaryType())
def _fixture_encode_udf(ids: pd.Series, names: pd.Series) -> pd.Series:
    return pd.Series(
        [
            json_value_to_jsonb(
                {
                    "id": int(i),
                    "name": str(n),
                    "tags": [int(i) % 7, None, True],
                }
            )
            for i, n in zip(ids, names)
        ]
    )


def jsonb_decode(col: Column) -> Column:
    return jsonb_decode_udf(col)


def json_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the JSONB wire format over `part`: encode a per-row
    document (fixture side — a binlog would supply the bytes), decode
    with the JSONB walk, and project fields back out of the decoded
    text with get_json_object to prove it is valid JSON."""
    prep(spark)
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    d = part.withColumn(
        "jsonb", _fixture_encode_udf(F.col("p_partkey"), F.col("p_name"))
    ).withColumn("json_text", jsonb_decode(F.col("jsonb")))
    return d.select(
        "p_partkey",
        "json_text",
        F.get_json_object("json_text", "$.name").alias("name_field"),
        F.get_json_object("json_text", "$.tags[0]")
        .cast("long")
        .alias("tag0"),
    )


# Oracle: build the identical compact JSON text directly (keys in
# MySQL's (length, bytes) canonical order: id, name, tags).
JSON_DECODE_SQL = """
SELECT p_partkey,
    '{"id":' || CAST(p_partkey AS VARCHAR)
        || ',"name":"' || p_name || '"'
        || ',"tags":[' || CAST(p_partkey % 7 AS VARCHAR)
        || ',null,true]}' AS json_text,
    p_name AS name_field,
    p_partkey % 7 AS tag0
FROM part
"""

REGISTRY = [("cdc_json_decode", json_decode_query, JSON_DECODE_SQL)]
