"""Minimal Thrift compact-protocol WRITER — just enough for parquet metadata.

The layouts follow the public Apache Thrift compact protocol spec (the same
wire format parquet-format-structures serializes with, e.g. Util.writePageHeader
/root/reference/parquet-format-structures/.../format/Util.java:120). Only the
writer subset parquet needs: structs, i32/i64 (zigzag uleb128), strings,
lists of i32/string/struct, booleans.
"""

from __future__ import annotations

CT_STOP = 0x00
CT_BOOL_TRUE = 0x01
CT_BOOL_FALSE = 0x02
CT_BYTE = 0x03
CT_I16 = 0x04
CT_I32 = 0x05
CT_I64 = 0x06
CT_DOUBLE = 0x07
CT_BINARY = 0x08
CT_LIST = 0x09
CT_STRUCT = 0x0C


def _uvarint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int, bits: int = 64) -> int:
    return (v << 1) ^ (v >> (bits - 1))


class StructWriter:
    """Appends compact-protocol fields in ascending field-id order."""

    def __init__(self):
        self.buf = bytearray()
        self.last_id = 0

    def _header(self, fid: int, ctype: int) -> None:
        delta = fid - self.last_id
        if 0 < delta <= 15:
            self.buf.append((delta << 4) | ctype)
        else:
            self.buf.append(ctype)
            self.buf += _uvarint(_zigzag(fid, 16))
        self.last_id = fid

    def i8(self, fid: int, v: int) -> "StructWriter":
        # compact BYTE: one raw signed byte (no zigzag/varint) — used by
        # VariantType.specification_version
        self._header(fid, CT_BYTE)
        self.buf.append(v & 0xFF)
        return self

    def i32(self, fid: int, v: int) -> "StructWriter":
        self._header(fid, CT_I32)
        self.buf += _uvarint(_zigzag(v, 32))
        return self

    def i64(self, fid: int, v: int) -> "StructWriter":
        self._header(fid, CT_I64)
        self.buf += _uvarint(_zigzag(v, 64))
        return self

    def boolean(self, fid: int, v: bool) -> "StructWriter":
        self._header(fid, CT_BOOL_TRUE if v else CT_BOOL_FALSE)
        return self

    def binary(self, fid: int, v: bytes) -> "StructWriter":
        self._header(fid, CT_BINARY)
        self.buf += _uvarint(len(v))
        self.buf += v
        return self

    def string(self, fid: int, v: str) -> "StructWriter":
        return self.binary(fid, v.encode("utf-8"))

    def struct(self, fid: int, inner: "StructWriter") -> "StructWriter":
        self._header(fid, CT_STRUCT)
        self.buf += inner.finish()
        return self

    def _list_header(self, fid: int, elem_ctype: int, size: int) -> None:
        self._header(fid, CT_LIST)
        if size < 15:
            self.buf.append((size << 4) | elem_ctype)
        else:
            self.buf.append(0xF0 | elem_ctype)
            self.buf += _uvarint(size)

    def list_i32(self, fid: int, values: list[int]) -> "StructWriter":
        self._list_header(fid, CT_I32, len(values))
        for v in values:
            self.buf += _uvarint(_zigzag(v, 32))
        return self

    def list_string(self, fid: int, values: list[str]) -> "StructWriter":
        self._list_header(fid, CT_BINARY, len(values))
        for v in values:
            e = v.encode("utf-8")
            self.buf += _uvarint(len(e))
            self.buf += e
        return self

    def list_struct(self, fid: int, items: list["StructWriter"]) -> "StructWriter":
        self._list_header(fid, CT_STRUCT, len(items))
        for it in items:
            self.buf += it.finish()
        return self

    def finish(self) -> bytes:
        return bytes(self.buf) + bytes([CT_STOP])
