"""Pure-Python TFRecord framing + protobuf wire-format codec.

The reference decodes Waymo ``.tfrecord`` sequences through
``tf.data.TFRecordDataset`` + the ``waymo_open_dataset`` compiled protos
(reference pcdet/datasets/waymo/waymo_utils.py:11-13,211-226).  Neither
dependency is required for the byte formats themselves:

- a TFRecord is a flat stream of ``[uint64 length][masked crc32c(length)]
  [payload][masked crc32c(payload)]`` records;
- a serialized proto is a sequence of ``(field_number << 3 | wire_type)``
  tagged values (varint / fixed64 / length-delimited / fixed32).

This module implements both ends (read AND write — the writer exists so
unit tests can fabricate byte-identical records without TF), plus small
typed accessors used by :mod:`lvv_tpu.data.waymo_decode` to walk messages
parsed into ``{field_number: [(wire_type, raw_value), ...]}`` dicts.

CRC32C (Castagnoli) is implemented table-driven in pure Python; it only
runs at offline-decode time, never in the jit path.
"""
from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Sequence, Tuple, Union

import numpy as np

# ------------------------------------------------------------------ crc32c

_CRC_TABLE: List[int] = []


def _crc_table() -> List[int]:
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78          # Castagnoli, reflected
        tab = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tab.append(c)
        _CRC_TABLE = tab
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tab = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord's rotated+offset mask over the raw crc."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------- tfrecord IO

def read_tfrecord(path, verify_crc: bool = False) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            head = f.read(12)
            if len(head) < 12:
                return
            (length,) = struct.unpack("<Q", head[:8])
            (len_crc,) = struct.unpack("<I", head[8:12])
            if verify_crc and masked_crc32c(head[:8]) != len_crc:
                raise IOError(f"{path}: length crc mismatch")
            payload = f.read(length)
            (data_crc,) = struct.unpack("<I", f.read(4))
            if verify_crc and masked_crc32c(payload) != data_crc:
                raise IOError(f"{path}: payload crc mismatch")
            yield payload


def write_tfrecord(path, records: Sequence[bytes]) -> None:
    """Write records with proper masked-crc framing (test fabrication)."""
    with open(path, "wb") as f:
        for payload in records:
            head = struct.pack("<Q", len(payload))
            f.write(head)
            f.write(struct.pack("<I", masked_crc32c(head)))
            f.write(payload)
            f.write(struct.pack("<I", masked_crc32c(payload)))


# ------------------------------------------------- proto wire-format parse

WIRE_VARINT = 0
WIRE_FIXED64 = 1
WIRE_LEN = 2
WIRE_FIXED32 = 5

Fields = Dict[int, List[Tuple[int, Union[int, bytes]]]]


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def parse_fields(buf: bytes) -> Fields:
    """Parse one serialized message into {field: [(wire_type, value)]}.

    varint/fixed32/fixed64 values come back as raw unsigned ints;
    length-delimited values come back as bytes.  Groups (deprecated wire
    types 3/4) are rejected — none of the target schemas use them.
    """
    fields: Fields = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == WIRE_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wire == WIRE_FIXED64:
            (val,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        elif wire == WIRE_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            if len(val) < ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wire == WIRE_FIXED32:
            (val,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field, []).append((wire, val))
    return fields


# typed accessors ----------------------------------------------------------

def get_varint(fields: Fields, num: int, default: int = 0) -> int:
    for wire, val in fields.get(num, []):
        if wire == WIRE_VARINT:
            return int(val)
    return default


def get_double(fields: Fields, num: int, default: float = 0.0) -> float:
    for wire, val in fields.get(num, []):
        if wire == WIRE_FIXED64:
            return struct.unpack("<d", struct.pack("<Q", val))[0]
    return default


def get_float(fields: Fields, num: int, default: float = 0.0) -> float:
    for wire, val in fields.get(num, []):
        if wire == WIRE_FIXED32:
            return struct.unpack("<f", struct.pack("<I", val))[0]
    return default


def get_bytes(fields: Fields, num: int, default: bytes = b"") -> bytes:
    for wire, val in fields.get(num, []):
        if wire == WIRE_LEN:
            return bytes(val)
    return default


def get_message(fields: Fields, num: int) -> Fields:
    return parse_fields(get_bytes(fields, num))


def iter_messages(fields: Fields, num: int) -> Iterator[Fields]:
    for wire, val in fields.get(num, []):
        if wire == WIRE_LEN:
            yield parse_fields(bytes(val))


def repeated_double(fields: Fields, num: int) -> np.ndarray:
    """Repeated double, tolerating both packed and unpacked encodings."""
    out: List[float] = []
    for wire, val in fields.get(num, []):
        if wire == WIRE_FIXED64:
            out.append(struct.unpack("<d", struct.pack("<Q", val))[0])
        elif wire == WIRE_LEN:
            out.extend(np.frombuffer(val, "<f8").tolist())
    return np.asarray(out, np.float64)


def repeated_float(fields: Fields, num: int) -> np.ndarray:
    out: List[float] = []
    for wire, val in fields.get(num, []):
        if wire == WIRE_FIXED32:
            out.append(struct.unpack("<f", struct.pack("<I", val))[0])
        elif wire == WIRE_LEN:
            out.extend(np.frombuffer(val, "<f4").tolist())
    return np.asarray(out, np.float32)


def repeated_varint(fields: Fields, num: int) -> List[int]:
    out: List[int] = []
    for wire, val in fields.get(num, []):
        if wire == WIRE_VARINT:
            out.append(int(val))
        elif wire == WIRE_LEN:
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(bytes(val), pos)
                out.append(v)
    return out


# ------------------------------------------------- proto wire-format build
# Encoders fabricate test records; they emit canonical encodings (packed
# repeated scalars) so round-trips also exercise the packed branches.

def encode_varint(value: int) -> bytes:
    v = int(value)
    if v < 0:
        # protobuf encodes negatives as 10-byte two's complement; none of
        # the fabricated schemas use them, so fail loudly instead of
        # spinning on Python's arithmetic right shift
        raise ValueError(f"negative varint {v} not supported")
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return encode_varint((field << 3) | wire)


def field_varint(field: int, value: int) -> bytes:
    return _tag(field, WIRE_VARINT) + encode_varint(value)


def field_double(field: int, value: float) -> bytes:
    return _tag(field, WIRE_FIXED64) + struct.pack("<d", value)


def field_float(field: int, value: float) -> bytes:
    return _tag(field, WIRE_FIXED32) + struct.pack("<f", value)


def field_bytes(field: int, value: bytes) -> bytes:
    return _tag(field, WIRE_LEN) + encode_varint(len(value)) + value


def field_string(field: int, value: str) -> bytes:
    return field_bytes(field, value.encode("utf-8"))


def field_packed_doubles(field: int, values) -> bytes:
    return field_bytes(field, np.asarray(values, "<f8").tobytes())


def field_packed_floats(field: int, values) -> bytes:
    return field_bytes(field, np.asarray(values, "<f4").tobytes())


def field_packed_varints(field: int, values) -> bytes:
    return field_bytes(field, b"".join(encode_varint(v) for v in values))
