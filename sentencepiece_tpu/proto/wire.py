# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Minimal proto2 wire-format codec.

The reference framework stores its entire model artifact as a serialized
proto2 ``ModelProto`` (see reference src/sentencepiece_model.proto). Wire
compatibility with those ``.model`` files is a conformance requirement, so we
implement the proto2 wire format directly: a declarative ``Message`` base
class driven by ``Field`` descriptors, preserving unknown fields and proto2
has-bits, with deterministic ascending-field-number serialization (matching
protobuf C++'s output ordering for messages without extensions).

This is a fresh implementation of the public protobuf wire spec
(https://protobuf.dev/programming-guides/encoding/) — no protobuf runtime
dependency needed at inference or train time.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Tuple, Type

# Wire types.
WIRE_VARINT = 0
WIRE_FIXED64 = 1
WIRE_LEN = 2
WIRE_FIXED32 = 5

# Scalar field kinds.
K_INT32 = "int32"
K_INT64 = "int64"
K_UINT32 = "uint32"
K_UINT64 = "uint64"
K_BOOL = "bool"
K_ENUM = "enum"
K_FLOAT = "float"
K_DOUBLE = "double"
K_STRING = "string"
K_BYTES = "bytes"
K_MESSAGE = "message"

_VARINT_KINDS = frozenset({K_INT32, K_INT64, K_UINT32, K_UINT64, K_BOOL, K_ENUM})
_LEN_KINDS = frozenset({K_STRING, K_BYTES, K_MESSAGE})


def encode_varint(value: int) -> bytes:
    """Encode a non-negative integer (< 2**64) as a base-128 varint."""
    if value < 0:
        # proto2 negative int32/int64 values are sign-extended to 64 bits.
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    """Decode a varint at ``pos``; returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _to_signed32(v: int) -> int:
    v &= (1 << 64) - 1
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _to_signed64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


class Field:
    """Descriptor for a proto2 field."""

    __slots__ = ("number", "name", "kind", "repeated", "default", "message_type")

    def __init__(
        self,
        number: int,
        name: str,
        kind: str,
        repeated: bool = False,
        default: Any = None,
        message_type: Optional[Type["Message"]] = None,
    ):
        self.number = number
        self.name = name
        self.kind = kind
        self.repeated = repeated
        self.message_type = message_type
        if default is None and not repeated:
            default = {
                K_INT32: 0, K_INT64: 0, K_UINT32: 0, K_UINT64: 0,
                K_BOOL: False, K_ENUM: 0, K_FLOAT: 0.0, K_DOUBLE: 0.0,
                K_STRING: "", K_BYTES: b"",
            }.get(kind)
        if kind == K_FLOAT and default is not None:
            # proto2 float defaults are float32 (see Message.__setattr__)
            import struct as _struct

            default = _struct.unpack("<f", _struct.pack("<f",
                                                        float(default)))[0]
        self.default = default


class Message:
    """Base class for declarative proto2 messages.

    Subclasses define ``FIELDS: List[Field]``. Instances store set fields in
    ``self._values`` (proto2 has-bit semantics: reading an unset optional
    returns its default; ``has_x()`` reports set-ness). Unknown fields are
    preserved verbatim for round-tripping.
    """

    FIELDS: List[Field] = []

    def __init__(self, **kwargs: Any):
        cls = type(self)
        if "_by_name" not in cls.__dict__:
            cls._by_name = {f.name: f for f in cls.FIELDS}
            cls._by_number = {f.number: f for f in cls.FIELDS}
        self._values: Dict[str, Any] = {}
        self._unknown: List[Tuple[int, int, Any]] = []  # (number, wiretype, raw)
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        by_name = type(self).__dict__.get("_by_name")
        if by_name is None or name.startswith("_"):
            raise AttributeError(name)
        f = by_name.get(name)
        if f is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        if f.repeated:
            lst: List[Any] = []
            values[name] = lst  # repeated fields are implicitly present-empty
            return lst
        if f.kind == K_MESSAGE:
            return None
        return f.default

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        f = type(self)._by_name.get(name)
        if f is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if f.kind == K_FLOAT and not f.repeated and value is not None:
            # proto2 `float` fields are float32; C++ comparisons against
            # them (e.g. character_coverage, trainer_interface.cc:415)
            # observe the narrowed value, so narrow on assignment too
            import struct as _struct

            value = _struct.unpack("<f", _struct.pack("<f", float(value)))[0]
        self._values[name] = value

    def has(self, name: str) -> bool:
        v = self._values.get(name)
        if v is None:
            return False
        f = type(self)._by_name[name]
        if f.repeated:
            return bool(v)
        return True

    def clear(self, name: str) -> None:
        self._values.pop(name, None)

    def copy_from(self, other: "Message") -> None:
        self._values = dict(other._values)
        self._unknown = list(other._unknown)

    def copy(self) -> "Message":
        """Deep copy via the wire format (fields are value-semantics)."""
        return type(self).parse(self.serialize())

    # -- equality / repr ----------------------------------------------------
    def __eq__(self, other: Any) -> bool:
        return (
            type(self) is type(other)
            and self.serialize() == other.serialize()
        )

    def __repr__(self) -> str:
        parts = []
        for f in self.FIELDS:
            if self.has(f.name):
                parts.append(f"{f.name}={self._values[f.name]!r}")
        return f"{type(self).__name__}({', '.join(parts)})"

    # -- serialization ------------------------------------------------------
    def serialize(self) -> bytes:
        out = bytearray()
        # Ascending field number, matching protobuf C++ output order
        # (sorted once per message class; ModelProto serializes one
        # message per piece, so per-call sorts are O(vocab) overhead).
        fields_sorted = type(self).__dict__.get("_FIELDS_SORTED")
        if fields_sorted is None:
            fields_sorted = sorted(self.FIELDS, key=lambda f: f.number)
            type(self)._FIELDS_SORTED = fields_sorted
        for f in fields_sorted:
            if f.name not in self._values:
                continue
            v = self._values[f.name]
            if f.repeated:
                for item in v:
                    _encode_field(out, f, item)
            else:
                _encode_field(out, f, v)
        for number, wtype, raw in self._unknown:
            out += encode_varint((number << 3) | wtype)
            if wtype == WIRE_VARINT:
                out += encode_varint(raw)
            elif wtype == WIRE_LEN:
                out += encode_varint(len(raw))
                out += raw
            else:
                out += raw
        return bytes(out)

    @classmethod
    def parse(cls, data: bytes) -> "Message":
        msg = cls()
        msg.merge_from_bytes(data)
        return msg

    def merge_from_bytes(self, buf: bytes) -> None:
        by_number = type(self)._by_number
        pos = 0
        n = len(buf)
        while pos < n:
            tag, pos = decode_varint(buf, pos)
            number, wtype = tag >> 3, tag & 7
            f = by_number.get(number)
            if f is None:
                pos = self._skip_unknown(buf, pos, number, wtype)
                continue
            value, pos = _decode_field(buf, pos, f, wtype)
            if f.repeated:
                if f.name not in self._values:
                    self._values[f.name] = []
                if isinstance(value, list):
                    self._values[f.name].extend(value)  # packed
                else:
                    self._values[f.name].append(value)
            else:
                self._values[f.name] = value

    def _skip_unknown(self, buf: bytes, pos: int, number: int, wtype: int) -> int:
        if wtype == WIRE_VARINT:
            v, pos = decode_varint(buf, pos)
            self._unknown.append((number, wtype, v))
        elif wtype == WIRE_FIXED64:
            self._unknown.append((number, wtype, buf[pos:pos + 8]))
            pos += 8
        elif wtype == WIRE_FIXED32:
            self._unknown.append((number, wtype, buf[pos:pos + 4]))
            pos += 4
        elif wtype == WIRE_LEN:
            ln, pos = decode_varint(buf, pos)
            self._unknown.append((number, wtype, buf[pos:pos + ln]))
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        return pos


def _encode_field(out: bytearray, f: Field, v: Any) -> None:
    if f.kind in _VARINT_KINDS:
        out += encode_varint((f.number << 3) | WIRE_VARINT)
        if f.kind == K_BOOL:
            out += encode_varint(1 if v else 0)
        else:
            out += encode_varint(int(v))
    elif f.kind == K_FLOAT:
        out += encode_varint((f.number << 3) | WIRE_FIXED32)
        out += struct.pack("<f", v)
    elif f.kind == K_DOUBLE:
        out += encode_varint((f.number << 3) | WIRE_FIXED64)
        out += struct.pack("<d", v)
    elif f.kind == K_STRING:
        raw = v.encode("utf-8", errors="surrogateescape") if isinstance(v, str) else bytes(v)
        out += encode_varint((f.number << 3) | WIRE_LEN)
        out += encode_varint(len(raw))
        out += raw
    elif f.kind == K_BYTES:
        out += encode_varint((f.number << 3) | WIRE_LEN)
        out += encode_varint(len(v))
        out += bytes(v)
    elif f.kind == K_MESSAGE:
        raw = v.serialize()
        out += encode_varint((f.number << 3) | WIRE_LEN)
        out += encode_varint(len(raw))
        out += raw
    else:
        raise ValueError(f"unknown kind {f.kind}")


def _decode_field(buf: bytes, pos: int, f: Field, wtype: int):
    if f.kind in _VARINT_KINDS:
        if wtype == WIRE_LEN and f.repeated:
            # packed repeated varints
            ln, pos = decode_varint(buf, pos)
            end = pos + ln
            items = []
            while pos < end:
                v, pos = decode_varint(buf, pos)
                items.append(_coerce_varint(f.kind, v))
            return items, pos
        if wtype != WIRE_VARINT:
            raise ValueError(f"field {f.name}: bad wire type {wtype}")
        v, pos = decode_varint(buf, pos)
        return _coerce_varint(f.kind, v), pos
    if f.kind == K_FLOAT:
        if wtype != WIRE_FIXED32:
            raise ValueError(f"field {f.name}: bad wire type {wtype}")
        return struct.unpack("<f", buf[pos:pos + 4])[0], pos + 4
    if f.kind == K_DOUBLE:
        if wtype != WIRE_FIXED64:
            raise ValueError(f"field {f.name}: bad wire type {wtype}")
        return struct.unpack("<d", buf[pos:pos + 8])[0], pos + 8
    if f.kind in _LEN_KINDS:
        if wtype != WIRE_LEN:
            raise ValueError(f"field {f.name}: bad wire type {wtype}")
        ln, pos = decode_varint(buf, pos)
        raw = buf[pos:pos + ln]
        pos += ln
        if f.kind == K_STRING:
            return raw.decode("utf-8", errors="surrogateescape"), pos
        if f.kind == K_BYTES:
            return raw, pos
        sub = f.message_type()
        sub.merge_from_bytes(raw)
        return sub, pos
    raise ValueError(f"unknown kind {f.kind}")


def _coerce_varint(kind: str, v: int) -> Any:
    if kind == K_BOOL:
        return bool(v)
    if kind in (K_INT32, K_ENUM):
        return _to_signed32(v)
    if kind == K_INT64:
        return _to_signed64(v)
    return v & ((1 << 64) - 1) if kind == K_UINT64 else v & 0xFFFFFFFF
