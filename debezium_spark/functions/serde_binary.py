"""Binary Avro / Protobuf wire encodings as pure relational expressions.

Reference: the engine's serialization format family
(``debezium-api/src/main/java/io/debezium/engine/format/Avro.java``,
``Protobuf.java``; Confluent wire framing used by
``converters/CloudEventsConverter.java`` for Avro data encoding).
Round 2 shipped the JSON encodings of both; the binary forms need no
schema-registry client at all — the wire formats are pure byte
assembly, so they are expressed here as Spark column expressions
(whole-stage codegen, no UDF) with DuckDB SQL twins generated from the
same piece structure so an oracle reproduces the bytes exactly.

Encoding output is an UPPERCASE HEX STRING of the wire bytes (both
engines hex identically; raw binary columns hash differently across
drivers). ``unhex()`` of the result is the on-wire frame.

NULL contract: these primitives encode REQUIRED values — a NULL input
null-propagates through Spark's ``concat`` but is silently skipped by
DuckDB's, so the two twins would diverge. Callers must route nullable
fields through an explicit union/presence branch (``CASE WHEN x IS
NULL THEN <null-branch> ELSE <encoded> END``) on BOTH sides, as the
catalog export queries do.

Core primitives (Avro spec §binary encoding; protobuf wire format):

- ``zigzag_varint``: Avro long/int = varint of zigzag(n). DuckDB
  refuses ``<<`` on negatives, so zigzag is folded INTO the varint via
  ``m = n XOR (n >> 63)`` (always ≥ 0) and the sign bit: byte0 carries
  ``(m & 63)·2 + s`` and septet k≥1 is ``(m >> 7k-1) & 127`` — every
  intermediate non-negative, portable to any engine with arithmetic
  shifts.
- ``uvarint``: protobuf int64 = varint of the two's-complement value
  reinterpreted unsigned. Arithmetic shifts + masks are exact for
  septets 0..8; septet 9 is the sign bit alone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _hx(b: Column) -> Column:
    return F.lpad(F.hex(b), 2, "0")


def zigzag_varint_hex(n: Column) -> Column:
    """Hex of the Avro zigzag-varint encoding of a 64-bit value."""
    m = n.bitwiseXOR(F.shiftright(n, 63))
    s = F.shiftright(n, 63).bitwiseAND(F.lit(1))
    b0 = (m.bitwiseAND(F.lit(63)) * 2 + s).bitwiseOR(
        F.when(F.shiftright(m, 6) != 0, F.lit(128)).otherwise(F.lit(0))
    )
    pieces = [_hx(b0)]
    for k in range(1, 10):
        septet = F.shiftright(m, 7 * k - 1).bitwiseAND(F.lit(127))
        # k=9 is the last possible septet (m ≤ 2^63-1): never a
        # continuation. (Spark/Java shiftright wraps the count mod 64,
        # so m >> 69 would silently become m >> 5.)
        more = (
            (F.shiftright(m, 7 * k + 6) != 0) if k < 9 else F.lit(False)
        )
        pieces.append(
            F.when(
                F.shiftright(m, 7 * k - 1) != 0,
                _hx(
                    septet.bitwiseOR(
                        F.when(more, F.lit(128)).otherwise(F.lit(0))
                    )
                ),
            ).otherwise(F.lit(""))
        )
    return F.concat(*pieces)


def zigzag_varint_sql(expr: str) -> str:
    """DuckDB twin of :func:`zigzag_varint_hex` — same piece structure."""
    m = f"xor({expr}, ({expr} >> 63))"
    s = f"(({expr} >> 63) & 1)"
    pieces = [
        f"lpad(hex((({m} & 63) * 2 + {s}) |"
        f" CASE WHEN ({m} >> 6) <> 0 THEN 128 ELSE 0 END), 2, '0')"
    ]
    for k in range(1, 10):
        pieces.append(
            f"CASE WHEN ({m} >> {7 * k - 1}) <> 0 THEN"
            f" lpad(hex((({m} >> {7 * k - 1}) & 127) |"
            f" CASE WHEN ({m} >> {7 * k + 6}) <> 0 THEN 128 ELSE 0 END),"
            f" 2, '0') ELSE '' END"
        )
    return "concat(" + ", ".join(pieces) + ")"


def uvarint_hex(n: Column) -> Column:
    """Hex of the plain (protobuf int64) varint: the two's-complement
    bits reinterpreted unsigned — negatives always take 10 bytes."""
    pieces = []
    for k in range(10):
        septet = (
            F.shiftright(n, 7 * k).bitwiseAND(F.lit(127))
            if k < 9
            else F.shiftright(n, 63).bitwiseAND(F.lit(1))
        )
        if k == 0:
            cond = F.lit(True)
        elif k < 9:
            cond = F.shiftright(n, 7 * k) != 0
        else:
            cond = F.shiftright(n, 63).bitwiseAND(F.lit(1)) == 1
        if k < 8:
            more = F.shiftright(n, 7 * (k + 1)) != 0
        elif k == 8:
            more = F.shiftright(n, 63).bitwiseAND(F.lit(1)) == 1
        else:
            more = F.lit(False)
        byte = septet.bitwiseOR(F.when(more, F.lit(128)).otherwise(F.lit(0)))
        pieces.append(F.when(cond, _hx(byte)).otherwise(F.lit("")))
    return F.concat(*pieces)


def uvarint_sql(expr: str) -> str:
    """DuckDB twin of :func:`uvarint_hex`."""
    pieces = []
    for k in range(10):
        septet = (
            f"(({expr} >> {7 * k}) & 127)"
            if k < 9
            else f"(({expr} >> 63) & 1)"
        )
        if k == 0:
            cond = "TRUE"
        elif k < 9:
            cond = f"(({expr} >> {7 * k}) <> 0)"
        else:
            cond = f"((({expr} >> 63) & 1) = 1)"
        if k < 8:
            more = f"(({expr} >> {7 * (k + 1)}) <> 0)"
        elif k == 8:
            more = f"((({expr} >> 63) & 1) = 1)"
        else:
            more = "FALSE"
        pieces.append(
            f"CASE WHEN {cond} THEN lpad(hex({septet} |"
            f" CASE WHEN {more} THEN 128 ELSE 0 END), 2, '0') ELSE '' END"
        )
    return "concat(" + ", ".join(pieces) + ")"


def avro_string_hex(s: Column) -> Column:
    """Avro string: zigzag-varint byte length + UTF-8 bytes."""
    return F.concat(
        zigzag_varint_hex(F.octet_length(s).cast("long")), F.hex(s)
    )


def avro_string_sql(expr: str) -> str:
    return (
        "concat("
        + zigzag_varint_sql(f"CAST(octet_length(encode({expr})) AS BIGINT)")
        + f", hex({expr}))"
    )


def confluent_frame_hex(body_hex: Column, schema_id: int) -> Column:
    """Confluent schema-registry wire format: magic 0x00 + 4-byte
    big-endian schema id + Avro binary body. The registry client only
    resolves the id — the framing itself needs none."""
    return F.concat(F.lit(f"00{schema_id:08X}"), body_hex)


def protobuf_string_field_hex(tag_byte: int, s: Column) -> Column:
    """Len-delimited protobuf field: tag + uvarint(len) + UTF-8."""
    return F.concat(
        F.lit(f"{tag_byte:02X}"),
        uvarint_hex(F.octet_length(s).cast("long")),
        F.hex(s),
    )


def protobuf_string_field_sql(tag_byte: int, expr: str) -> str:
    return (
        f"concat('{tag_byte:02X}', "
        + uvarint_sql(f"CAST(octet_length(encode({expr})) AS BIGINT)")
        + f", hex({expr}))"
    )
