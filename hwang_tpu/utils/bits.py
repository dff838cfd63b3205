"""MSB-first bit reader + Exp-Golomb codes.

Semantics match the reference bit cursor (hwang/util/bits.h:18-62): an
MSB-first cursor over a byte buffer with `get_bit`, `get_bits(n)`, byte
`align`, and unsigned Exp-Golomb `ue`.  The reference's `get_se_golomb`
(bits.h:64-79) is a known bug — it is a copy of the unsigned variant and
never applies the signed mapping.  Here `se` implements the correct H.264
spec 9.1.1 mapping: k -> (-1)^(k+1) * ceil(k/2).

Also provides the RBSP emulation-prevention strip (00 00 03 -> 00 00)
required before parsing any H.264/HEVC syntax structure.
"""

from __future__ import annotations


class BitReader:
    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes, bit_offset: int = 0):
        self.buf = buf
        self.pos = bit_offset
        self.nbits = len(buf) * 8

    # -- position ---------------------------------------------------------
    def bits_left(self) -> int:
        return self.nbits - self.pos

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def is_byte_aligned(self) -> bool:
        return (self.pos & 7) == 0

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise EOFError("bit reader overrun")

    # -- reads ------------------------------------------------------------
    def u1(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise EOFError("bit reader overrun")
        self.pos = p + 1
        return (self.buf[p >> 3] >> (7 - (p & 7))) & 1

    def u(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned int."""
        if n == 0:
            return 0
        p = self.pos
        end = p + n
        if end > self.nbits:
            raise EOFError("bit reader overrun")
        self.pos = end
        # Gather the covered bytes and shift out the slack.
        first = p >> 3
        last = (end - 1) >> 3
        acc = int.from_bytes(self.buf[first : last + 1], "big")
        slack = ((last + 1) << 3) - end
        return (acc >> slack) & ((1 << n) - 1)

    def ue(self) -> int:
        """Unsigned Exp-Golomb (H.264 spec 9.1)."""
        zeros = 0
        while self.u1() == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("invalid exp-golomb code (>32 leading zeros)")
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.u(zeros)

    def se(self) -> int:
        """Signed Exp-Golomb (H.264 spec 9.1.1): (-1)^(k+1) * ceil(k/2)."""
        k = self.ue()
        mag = (k + 1) >> 1
        return mag if (k & 1) else -mag

    def more_rbsp_data(self) -> bool:
        """True if there is RBSP payload left before the rbsp_stop_one_bit."""
        if self.pos >= self.nbits:
            return False
        # Find the last set bit in the buffer (the stop bit).
        rest = self.nbits - self.pos
        probe = BitReader(self.buf, self.pos)
        # Scan backwards bytewise for the final stop bit.
        i = len(self.buf) - 1
        while i >= 0 and self.buf[i] == 0:
            i -= 1
        if i < 0:
            return False
        b = self.buf[i]
        # Position of the lowest set bit in byte i (the stop bit).
        low = 0
        while not (b >> low) & 1:
            low += 1
        stop_pos = (i << 3) + (7 - low)
        del probe, rest
        return self.pos < stop_pos


def strip_emulation_prevention(nal_payload: bytes) -> bytes:
    """Remove 0x03 emulation-prevention bytes (spec 7.4.1.1).

    Input is the NAL payload *after* the one-byte NAL header (H.264) or
    two-byte header (HEVC). Converts 00 00 03 xx -> 00 00 xx.
    """
    if b"\x00\x00\x03" not in nal_payload:
        return nal_payload
    out = bytearray()
    i = 0
    n = len(nal_payload)
    while i < n:
        if i + 2 < n and nal_payload[i] == 0 and nal_payload[i + 1] == 0 and nal_payload[i + 2] == 3:
            out += nal_payload[i : i + 2]
            i += 3
        else:
            out.append(nal_payload[i])
            i += 1
    return bytes(out)


class ByteReader:
    """Big-endian byte-level reader used by the MP4 box parsers."""

    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf, pos: int = 0, end: int | None = None):
        self.buf = buf
        self.pos = pos
        self.end = len(buf) if end is None else end

    def remaining(self) -> int:
        return self.end - self.pos

    def read(self, n: int) -> bytes:
        if self.pos + n > self.end:
            raise EOFError("byte reader overrun")
        b = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return b

    def skip(self, n: int) -> None:
        if self.pos + n > self.end:
            raise EOFError("byte reader overrun")
        self.pos += n

    def u8(self) -> int:
        if self.pos >= self.end:
            raise EOFError("byte reader overrun")
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        return int.from_bytes(self.read(2), "big")

    def u24(self) -> int:
        return int.from_bytes(self.read(3), "big")

    def u32(self) -> int:
        return int.from_bytes(self.read(4), "big")

    def u64(self) -> int:
        return int.from_bytes(self.read(8), "big")

    def s32(self) -> int:
        return int.from_bytes(self.read(4), "big", signed=True)

    def fourcc(self) -> str:
        return self.read(4).decode("latin-1")
