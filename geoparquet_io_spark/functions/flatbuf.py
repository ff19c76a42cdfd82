"""Minimal FlatBuffers runtime (read + build) — pure Python, no deps.

Implements exactly the subset of the public FlatBuffers binary format
(https://flatbuffers.dev/internals) that FlatGeobuf uses: tables with
vtables, scalars, strings, vectors of scalars and of table offsets.

Read side: absolute byte positions into one ``bytes`` buffer.
Build side: the canonical back-to-front builder — children are pushed
first (landing at the high-address end of the final buffer), parents
reference them with forward uoffsets.  Scalar alignment follows the
spec (the final buffer is padded so 8-byte scalars land 8-aligned).
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------

class Table:
    """A table at absolute position ``pos`` in ``buf``."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos

    def _field_pos(self, field_id: int) -> int | None:
        soffset = struct.unpack_from("<i", self.buf, self.pos)[0]
        vt = self.pos - soffset
        vt_size = struct.unpack_from("<H", self.buf, vt)[0]
        entry = 4 + 2 * field_id
        if entry + 2 > vt_size:
            return None
        fo = struct.unpack_from("<H", self.buf, vt + entry)[0]
        return self.pos + fo if fo else None

    def scalar(self, field_id: int, fmt: str, default=0):
        p = self._field_pos(field_id)
        if p is None:
            return default
        return struct.unpack_from("<" + fmt, self.buf, p)[0]

    def _indirect(self, field_id: int) -> int | None:
        p = self._field_pos(field_id)
        if p is None:
            return None
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, field_id: int) -> str | None:
        t = self._indirect(field_id)
        if t is None:
            return None
        n = struct.unpack_from("<I", self.buf, t)[0]
        return self.buf[t + 4:t + 4 + n].decode("utf-8")

    def table(self, field_id: int) -> "Table | None":
        t = self._indirect(field_id)
        return None if t is None else Table(self.buf, t)

    def vector_scalars(self, field_id: int, fmt: str, size: int):
        t = self._indirect(field_id)
        if t is None:
            return None
        n = struct.unpack_from("<I", self.buf, t)[0]
        # `size` validates the declared length against the buffer (it
        # was previously accepted and IGNORED, implying size-dependent
        # addressing that did not exist) — a corrupt count now raises a
        # descriptive error instead of struct.error deep in a task
        if t + 4 + n * size > len(self.buf):
            raise ValueError(
                f"corrupt FlatBuffers vector: {n} x {size}-byte elements "
                f"overrun the buffer (offset {t})")
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, t + 4))

    def vector_bytes(self, field_id: int) -> bytes | None:
        t = self._indirect(field_id)
        if t is None:
            return None
        n = struct.unpack_from("<I", self.buf, t)[0]
        return bytes(self.buf[t + 4:t + 4 + n])

    def vector_tables(self, field_id: int) -> "list[Table] | None":
        t = self._indirect(field_id)
        if t is None:
            return None
        n = struct.unpack_from("<I", self.buf, t)[0]
        out = []
        for i in range(n):
            p = t + 4 + 4 * i
            out.append(Table(self.buf, p + struct.unpack_from(
                "<I", self.buf, p)[0]))
        return out


def root(buf: bytes) -> Table:
    return Table(buf, struct.unpack_from("<I", buf, 0)[0])


# ---------------------------------------------------------------------------
# Building
# ---------------------------------------------------------------------------

class Builder:
    """Back-to-front builder.  All returned "offsets" are distances from
    the END of the (eventual) buffer; :meth:`finish` pads the front so
    8-byte alignment holds, then returns the final bytes."""

    def __init__(self):
        self.buf = bytearray(1024)
        self.head = len(self.buf)
        self.minalign = 4

    # -- low level ----------------------------------------------------------
    def offset(self) -> int:
        return len(self.buf) - self.head

    def _grow(self, need: int):
        old = self.buf
        new_size = max(len(old) * 2, len(old) + need)
        self.buf = bytearray(new_size)
        used = len(old) - self.head
        self.buf[new_size - used:] = old[self.head:]
        self.head = new_size - used

    def push(self, data: bytes):
        if self.head < len(data):
            self._grow(len(data))
        self.head -= len(data)
        self.buf[self.head:self.head + len(data)] = data

    def pad(self, n: int):
        if n:
            self.push(b"\x00" * n)

    def align(self, size: int, extra: int = 0):
        """Pad so the NEXT push of ``extra`` bytes ends with its last
        ``size``-aligned element aligned (classic prep-before-write)."""
        self.minalign = max(self.minalign, size)
        self.pad((-(self.offset() + extra)) % size)

    # -- leaf objects -------------------------------------------------------
    def string(self, s: str) -> int:
        raw = s.encode("utf-8") + b"\x00"
        self.align(4, len(raw))
        self.push(raw)
        self.align(4, 4)
        self.push(struct.pack("<I", len(raw) - 1))
        return self.offset()

    def vector_scalars(self, fmt: str, size: int, values) -> int:
        values = list(values)
        body = struct.pack(f"<{len(values)}{fmt}", *values)
        # pre-pad so the first element AND the 4-byte length prefix land
        # aligned after ONE contiguous (prefix, body) pair: an align()
        # after the body push would insert padding BETWEEN prefix and
        # data, corrupting sub-4-byte element vectors (readers address
        # elements from t+4).  For size >= 4 this is byte-identical to
        # the old two-step alignment.
        a = max(size, 4)
        self.minalign = max(self.minalign, a)
        self.pad((-(self.offset() + len(body))) % a)
        self.push(body)
        self.push(struct.pack("<I", len(values)))
        return self.offset()

    def vector_bytes(self, data: bytes) -> int:
        self.align(4, 4 + len(data))
        self.push(bytes(data))
        self.push(struct.pack("<I", len(data)))
        return self.offset()

    def vector_offsets(self, offsets: list[int]) -> int:
        self.align(4, 4 * (len(offsets) + 1))
        for off in reversed(offsets):
            self.push(struct.pack("<I", self.offset() + 4 - off))
        self.push(struct.pack("<I", len(offsets)))
        return self.offset()

    # -- tables -------------------------------------------------------------
    def table(self, fields: dict) -> int:
        """Write a table.  ``fields``: id -> ('scalar', fmt, size, value)
        | ('offset', child_offset).  Absent ids fall back to schema
        defaults at read time."""
        slots: dict[int, int] = {}
        data_start = self.offset()
        # push largest scalars first for natural alignment
        def sort_key(item):
            fid, spec = item
            return (-(spec[2] if spec[0] == "scalar" else 4), fid)

        for fid, spec in sorted(fields.items(), key=sort_key):
            if spec[0] == "scalar":
                _, fmt, size, value = spec
                self.align(size, size)
                self.push(struct.pack("<" + fmt, value))
            else:
                child = spec[1]
                self.align(4, 4)
                self.push(struct.pack("<I", self.offset() + 4 - child))
            slots[fid] = self.offset()
        self.align(4, 4)
        self.push(b"\x00\x00\x00\x00")          # soffset placeholder
        table_off = self.offset()
        n_fields = (max(slots) + 1) if slots else 0
        vt = [4 + 2 * n_fields, table_off - data_start]
        for i in range(n_fields):
            vt.append(table_off - slots[i] if i in slots else 0)
        self.push(struct.pack(f"<{len(vt)}H", *vt))
        vt_off = self.offset()
        # patch soffset: addr(vtable) is BELOW addr(table) -> positive
        idx = len(self.buf) - table_off
        struct.pack_into("<i", self.buf, idx, vt_off - table_off)
        return table_off

    def finish(self, root_off: int) -> bytes:
        # pad BEFORE the root uoffset so the total size is minalign'd and
        # the root uoffset stays the first 4 bytes of the buffer
        # (addresses = total - offset, so aligned total => aligned scalars)
        self.align(self.minalign, 4)
        self.push(struct.pack("<I", self.offset() + 4 - root_off))
        return bytes(self.buf[self.head:])
