import pytest

from hwang_tpu.utils.bits import BitReader, strip_emulation_prevention


def test_u_basic():
    r = BitReader(bytes([0b10110100, 0b01100000]))
    assert r.u1() == 1
    assert r.u(3) == 0b011
    assert r.u(4) == 0b0100
    assert r.u(3) == 0b011
    assert r.bits_left() == 5


def test_u_cross_byte():
    r = BitReader(bytes([0xAB, 0xCD, 0xEF]))
    assert r.u(24) == 0xABCDEF
    r = BitReader(bytes([0xAB, 0xCD, 0xEF]))
    r.skip(4)
    assert r.u(16) == 0xBCDE


def test_ue_golomb():
    # codes: 1 -> 0; 010 -> 1; 011 -> 2; 00100 -> 3 ...
    def enc(bits):
        pad = (8 - len(bits) % 8) % 8
        s = bits + "1" * pad
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    assert BitReader(enc("1")).ue() == 0
    assert BitReader(enc("010")).ue() == 1
    assert BitReader(enc("011")).ue() == 2
    assert BitReader(enc("00100")).ue() == 3
    assert BitReader(enc("0001000")).ue() == 7
    assert BitReader(enc("000010001")).ue() == 16


def test_se_golomb_signed_mapping():
    """The reference's get_se_golomb (bits.h:64-79) forgot the signed
    mapping; verify we implement spec 9.1.1: 0,1,-1,2,-2,..."""

    def enc(bits):
        pad = (8 - len(bits) % 8) % 8
        s = bits + "1" * pad
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    assert BitReader(enc("1")).se() == 0
    assert BitReader(enc("010")).se() == 1
    assert BitReader(enc("011")).se() == -1
    assert BitReader(enc("00100")).se() == 2
    assert BitReader(enc("00101")).se() == -2


def test_align_and_overrun():
    r = BitReader(b"\xff\x00")
    r.u(3)
    r.byte_align()
    assert r.pos == 8
    assert r.u(8) == 0
    with pytest.raises(EOFError):
        r.u1()


def test_strip_emulation_prevention():
    assert strip_emulation_prevention(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert strip_emulation_prevention(b"\x00\x00\x03\x00\x00\x03") == b"\x00\x00\x00\x00"
    assert strip_emulation_prevention(b"abc") == b"abc"
    # 00 00 03 followed by >3 byte is NOT an escape per spec, but ffmpeg/ref
    # strip any 00 00 03; we strip when the pattern matches exactly
    assert strip_emulation_prevention(b"\x00\x00\x03\xff") == b"\x00\x00\xff"
