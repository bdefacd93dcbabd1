"""Native Vorbis I decoder (pure numpy + stdlib), used by the
multimodal audio leg for Ogg/Vorbis payloads.

Why this is in scope while MP3/AAC decode is not: Vorbis carries its
ENTIRE entropy-coding state in the stream itself — Huffman codebooks,
VQ lookup tables, floor and residue configurations all arrive in the
setup header — and its transform/window are closed-form
(``w(x) = sin(pi/2 * sin^2(...))``, IMDCT as a cosine sum, the floor
dB table as a geometric series ``10^(7*(i-255)/256)``). Like
PNG/JPEG/FLAC and unlike MP3 (whose Layer III Huffman tables and
synthesis window are normative spec constants), nothing here needs
recalled table data, so the implementation is verifiable from first
principles with independently-constructed streams.

Scope: floor type 1 and residue types 0/1/2, mono or stereo (with
polar coupling), long and short blocks with cross-size window lapping
— i.e. every stream a mainstream encoder emits. Floor type 0 (LSP,
legacy beta encoders) raises ValueError as a format boundary.

Reference surface parity note: the reference pipeline
(S-multimodal scripts) treats audio as an opaque feature source; this
decoder feeds the same ``extract_audio_features`` contract
(mono float64 in [-1, 1], sample rate) as the WAV/FLAC/AIFF paths.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_vorbis"]


# ----------------------------------------------------------- bit I/O


def _ilog(x: int) -> int:
    """Vorbis ilog: position of the highest set bit; ilog(0) = 0."""
    return x.bit_length() if x > 0 else 0


def _float32_unpack(x: int) -> float:
    """Vorbis packed float: 21-bit mantissa, 10-bit exponent biased
    by 788, sign in bit 31."""
    mant = x & 0x1FFFFF
    exp = (x & 0x7FE00000) >> 21
    val = mant * (2.0 ** (exp - 788))
    return -val if x & 0x80000000 else val


class _Bits:
    """LSB-first bit reader over one Vorbis packet. Reading past the
    end raises EOFError (end-of-packet is a meaningful condition in
    Vorbis audio packets: decode stops, partial frame stands)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        got = 0
        while got < n:
            if self.pos >= len(self.data):
                raise EOFError("end of Vorbis packet")
            avail = 8 - self.bit
            take = min(avail, n - got)
            chunk = (self.data[self.pos] >> self.bit) & ((1 << take) - 1)
            out |= chunk << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def flag(self) -> bool:
        return bool(self.read(1))


# ------------------------------------------------------- Ogg packets


def ogg_packets(
    payload: bytes,
) -> tuple[dict[int, list[bytes]], dict[int, int]]:
    """Reassemble full packets per logical stream from an Ogg
    physical stream: lacing values chain (255 = continue), packets
    may span pages (continuation flag 0x01). Also returns the final
    non-negative granule position per stream (for Vorbis: the total
    PCM sample count, used to trim the last partial block)."""
    out: dict[int, list[bytes]] = {}
    granules: dict[int, int] = {}
    partial: dict[int, bytearray] = {}
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"Ogg capture pattern lost at byte {pos}")
        header_type = payload[pos + 5]
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        serial = struct.unpack_from("<I", payload, pos + 14)[0]
        n_segs = payload[pos + 26]
        segs = payload[pos + 27 : pos + 27 + n_segs]
        body = pos + 27 + n_segs
        out.setdefault(serial, [])
        if granule >= 0:
            granules[serial] = granule
        cur = partial.setdefault(serial, bytearray())
        if not (header_type & 0x01) and cur:
            # packet was left open but this page does not continue it
            raise ValueError("Ogg continuation flag missing")
        off = body
        for lace in segs:
            cur += payload[off : off + lace]
            off += lace
            if lace < 255:
                out[serial].append(bytes(cur))
                cur.clear()
        pos = off
    return out, granules


# --------------------------------------------------------- codebooks


class _Codebook:
    """One parsed codebook: Huffman tree over entries plus optional
    VQ lookup (type 1 implicit lattice / type 2 explicit)."""

    __slots__ = ("dimensions", "entries", "tree", "vectors")

    def __init__(self, br: _Bits) -> None:
        if br.read(24) != 0x564342:  # 'BCV'
            raise ValueError("bad codebook sync pattern")
        self.dimensions = br.read(16)
        self.entries = br.read(24)
        lengths = [0] * self.entries  # 0 = unused
        if not br.flag():  # unordered
            sparse = br.flag()
            for i in range(self.entries):
                if sparse:
                    if br.flag():
                        lengths[i] = br.read(5) + 1
                else:
                    lengths[i] = br.read(5) + 1
        else:  # ordered: runs of increasing length
            cur_entry = 0
            cur_len = br.read(5) + 1
            while cur_entry < self.entries:
                num = br.read(_ilog(self.entries - cur_entry))
                if cur_entry + num > self.entries:
                    raise ValueError("codebook ordered runs overflow")
                for i in range(cur_entry, cur_entry + num):
                    lengths[i] = cur_len
                cur_entry += num
                cur_len += 1
        self.tree = _huffman_tree(lengths)

        lookup = br.read(4)
        self.vectors: np.ndarray | None = None
        if lookup == 0:
            return
        if lookup not in (1, 2):
            raise ValueError(f"reserved codebook lookup type {lookup}")
        minimum = _float32_unpack(br.read(32))
        delta = _float32_unpack(br.read(32))
        value_bits = br.read(4) + 1
        sequence_p = br.flag()
        if lookup == 1:
            lv = 0
            while (lv + 1) ** self.dimensions <= self.entries:
                lv += 1
            n_vals = lv
            mults = [br.read(value_bits) for _ in range(n_vals)]
            vec = np.empty((self.entries, self.dimensions))
            for e in range(self.entries):
                last = 0.0
                idx_div = 1
                for d in range(self.dimensions):
                    off = (e // idx_div) % n_vals
                    v = mults[off] * delta + minimum + last
                    vec[e, d] = v
                    if sequence_p:
                        last = v
                    idx_div *= n_vals
            self.vectors = vec
        else:
            n_vals = self.entries * self.dimensions
            mults = [br.read(value_bits) for _ in range(n_vals)]
            vec = np.empty((self.entries, self.dimensions))
            for e in range(self.entries):
                last = 0.0
                for d in range(self.dimensions):
                    v = mults[e * self.dimensions + d] * delta + minimum + last
                    vec[e, d] = v
                    if sequence_p:
                        last = v
            self.vectors = vec

    def decode_scalar(self, br: _Bits) -> int:
        node = self.tree
        while not isinstance(node, int):
            node = node[br.read(1)]
            if node is None:
                raise ValueError("invalid Huffman codeword")
        return node

    def decode_vector(self, br: _Bits) -> np.ndarray:
        if self.vectors is None:
            raise ValueError("codebook has no VQ lookup")
        return self.vectors[self.decode_scalar(br)]


def _huffman_tree(lengths: list[int]):
    """Vorbis canonical Huffman assignment (spec §3.2.1): entries
    claim, in entry order, the lowest available codeword of their
    length; returns a binary tree as nested [zero_branch, one_branch]
    lists with entry numbers at the leaves. Codeword bits are read
    MSB-first off the (LSB-first-packed) stream.

    A single-entry codebook gets the zero-length codeword per the
    spec errata (used by some encoders for degenerate books)."""
    used = [(i, l) for i, l in enumerate(lengths) if l > 0]
    if not used:
        raise ValueError("codebook with no used entries")
    if len(used) == 1:
        # single-entry: spec assigns the 1-bit codeword 0 (historic
        # behaviour; decoders read one bit and return the entry)
        root: list = [used[0][0], None]
        return root
    # first-fit assignment using per-length "available" markers,
    # codewords tracked MSB-justified in 32 bits
    available = [0] * 33
    codes: list[tuple[int, int, int]] = []  # (entry, length, msb_code)
    first_entry, first_len = used[0]
    codes.append((first_entry, first_len, 0))
    for i in range(1, first_len + 1):
        available[i] = 1 << (32 - i)
    for entry, length in used[1:]:
        z = length
        while z > 0 and not available[z]:
            z -= 1
        if z == 0:
            raise ValueError("over-specified Huffman tree")
        res = available[z]
        available[z] = 0
        for y in range(length, z, -1):
            available[y] = res + (1 << (32 - y))
        codes.append((entry, length, res))
    # verify full specification (all leaves used) is NOT required by
    # the spec for sparse books; unreachable prefixes decode as error
    root = [None, None]
    for entry, length, msb in codes:
        node = root
        for b in range(length):
            bit = (msb >> (31 - b)) & 1
            if b == length - 1:
                if node[bit] is not None:
                    raise ValueError("Huffman codeword collision")
                node[bit] = entry
            else:
                if node[bit] is None:
                    node[bit] = [None, None]
                node = node[bit]
                if isinstance(node, int):
                    raise ValueError("Huffman prefix collision")
    return root


# ------------------------------------------------------------ floors


class _Floor1:
    __slots__ = (
        "partition_classes", "class_dims", "class_subclasses",
        "class_masterbooks", "subclass_books", "multiplier", "x_list",
        "neighbors", "sort_order", "_step2",
    )

    def __init__(self, br: _Bits) -> None:
        partitions = br.read(5)
        self.partition_classes = [br.read(4) for _ in range(partitions)]
        n_classes = max(self.partition_classes) + 1 if partitions else 0
        self.class_dims = []
        self.class_subclasses = []
        self.class_masterbooks = []
        self.subclass_books = []
        for _ in range(n_classes):
            dim = br.read(3) + 1
            sub = br.read(2)
            self.class_dims.append(dim)
            self.class_subclasses.append(sub)
            self.class_masterbooks.append(br.read(8) if sub else -1)
            self.subclass_books.append(
                [br.read(8) - 1 for _ in range(1 << sub)]
            )
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        x_list = [0, 1 << rangebits]
        for p in self.partition_classes:
            for _ in range(self.class_dims[p]):
                x_list.append(br.read(rangebits))
        if len(set(x_list)) != len(x_list):
            raise ValueError("floor1 X list has duplicates")
        self.x_list = x_list
        # low/high neighbor offsets among PRECEDING entries (spec)
        self.neighbors = []
        for i in range(2, len(x_list)):
            lo = max(
                (j for j in range(i) if x_list[j] < x_list[i]),
                key=lambda j: x_list[j],
            )
            hi = min(
                (j for j in range(i) if x_list[j] > x_list[i]),
                key=lambda j: x_list[j],
            )
            self.neighbors.append((lo, hi))
        self.sort_order = sorted(range(len(x_list)), key=lambda j: x_list[j])

    def decode(self, br: _Bits, books: list[_Codebook]) -> list[int] | None:
        """Packet-side decode → final Y vector (step 2 values applied)
        or None when the channel is silent this frame."""
        if not br.flag():
            return None
        rng = [256, 128, 86, 64][self.multiplier - 1]
        ybits = _ilog(rng - 1)
        y = [br.read(ybits), br.read(ybits)]
        for p in self.partition_classes:
            cdim = self.class_dims[p]
            cbits = self.class_subclasses[p]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.class_masterbooks[p]].decode_scalar(br)
            for _ in range(cdim):
                book = self.subclass_books[p][cval & csub]
                cval >>= cbits
                y.append(books[book].decode_scalar(br) if book >= 0 else 0)
        return self._amplitude(y, rng)

    def _amplitude(self, y: list[int], rng: int) -> list[int]:
        """Spec §7.2.4 step 2: predict each Y from its decoded
        neighbors, fold the residue around the prediction."""
        final = [y[0], y[1]]
        step2 = [True, True]
        for i in range(2, len(self.x_list)):
            lo, hi = self.neighbors[i - 2]
            pred = _render_point(
                self.x_list[lo], final[lo], self.x_list[hi], final[hi],
                self.x_list[i],
            )
            val = y[i]
            highroom = rng - pred
            lowroom = pred
            room = 2 * min(highroom, lowroom)
            if val:
                step2.append(True)
                if val >= room:
                    final.append(
                        pred + (val - lowroom)
                        if highroom > lowroom
                        else pred - (val - highroom) - 1
                    )
                else:
                    final.append(
                        pred + (val + 1) // 2
                        if val % 2
                        else pred - val // 2
                    )
            else:
                step2.append(False)
                final.append(pred)
        # unflagged posts do not contribute to the curve: mark by
        # clamping into range and carrying the step2 flags alongside
        self._step2 = step2  # type: ignore[attr-defined]
        return [max(0, min(rng - 1, v)) for v in final]

    def curve(self, final_y: list[int], n: int) -> np.ndarray:
        """Synthesize the floor curve over n/2 spectral bins: chained
        integer render_line between the step2-flagged posts (sorted
        by X), horizontal to the edge, then amplitude -> linear via
        the derived inverse-dB map (index clamped to [0, 255] exactly
        as the spec's 256-entry table bounds it)."""
        step2 = self._step2
        xs = self.x_list
        half = n // 2
        pts = [(xs[j], final_y[j]) for j in self.sort_order if step2[j]]
        out = np.zeros(half)
        x0, y0 = pts[0]
        for x1, y1 in pts[1:]:
            if x0 >= half:
                break
            seg = _render_line(x0, y0, x1, y1)
            end = min(x1, half)
            out[x0:end] = seg[: end - x0]
            x0, y0 = x1, y1
        if x0 < half:
            out[x0:] = y0
        idx = np.clip(out * self.multiplier, 0, 255)
        return _inverse_db(idx)


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    """Integer line render (spec §7.2.4 render_line): y per x in
    [x0, x1), exact error accumulation."""
    dy = y1 - y0
    adx = x1 - x0
    base = dy // adx if dy >= 0 else -((-dy) // adx)
    ady = abs(dy) - abs(base) * adx
    out = np.empty(adx, dtype=np.int64)
    y = y0
    err = 0
    sy = base + 1 if dy >= 0 else base - 1
    out[0] = y0
    for i in range(1, adx):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out[i] = y
    return out


def _inverse_db(v: np.ndarray) -> np.ndarray:
    """floor1 inverse dB map. The spec's 256-entry table is the
    geometric series 10^(7*(i-255)/256) (endpoints 1.0649863e-07 at
    i=0 and 1.0 at i=255), so it is computed, not transcribed."""
    return np.power(10.0, 7.0 * (np.asarray(v, np.float64) - 255.0) / 256.0)


# ---------------------------------------------------------- residues


class _Residue:
    __slots__ = ("kind", "begin", "end", "part_size", "classifications",
                 "classbook", "books")

    def __init__(self, br: _Bits, kind: int) -> None:
        self.kind = kind
        self.begin = br.read(24)
        self.end = br.read(24)
        self.part_size = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        cascades = []
        for _ in range(self.classifications):
            low = br.read(3)
            high = br.read(5) if br.flag() else 0
            cascades.append(high * 8 + low)
        self.books = []
        for c in cascades:
            row = []
            for p in range(8):
                row.append(br.read(8) if c & (1 << p) else -1)
            self.books.append(row)

    def decode(
        self,
        br: _Bits,
        books: list[_Codebook],
        do_not_decode: list[bool],
        n: int,
    ) -> np.ndarray:
        """Decode residue vectors for ``len(do_not_decode)`` channels
        of n/2 spectral bins each. Returns (ch, n//2) float array."""
        ch = len(do_not_decode)
        half = n // 2
        if self.kind == 2:
            # all channels interleaved into one vector
            vec = np.zeros(ch * half)
            if not all(do_not_decode):
                self._decode_core(br, books, [vec])
            return vec.reshape(half, ch).T.copy()
        vecs = [np.zeros(half) for _ in range(ch)]
        self._decode_core(
            br, books,
            [v for v, skip in zip(vecs, do_not_decode) if not skip],
        )
        return np.stack(vecs) if vecs else np.zeros((0, half))

    def _decode_core(
        self, br: _Bits, books: list[_Codebook], vecs: list[np.ndarray]
    ) -> None:
        if not vecs:
            return
        classbook = books[self.classbook]
        cwords = classbook.dimensions
        actual_size = len(vecs[0])
        begin = min(self.begin, actual_size)
        end = min(self.end, actual_size)
        n_read = end - begin
        if n_read <= 0:
            return
        parts = n_read // self.part_size
        n_ch = len(vecs)
        classifs = np.zeros((n_ch, parts + cwords), dtype=np.int64)
        try:
            for p in range(8):
                part = 0
                while part < parts:
                    if p == 0:
                        for j in range(n_ch):
                            temp = classbook.decode_scalar(br)
                            for i in range(cwords - 1, -1, -1):
                                classifs[j, part + i] = (
                                    temp % self.classifications
                                )
                                temp //= self.classifications
                    for i in range(cwords):
                        if part >= parts:
                            break
                        for j in range(n_ch):
                            c = classifs[j, part]
                            book_idx = self.books[c][p]
                            if book_idx < 0:
                                continue
                            book = books[book_idx]
                            off = begin + part * self.part_size
                            if self.kind == 0:
                                step = self.part_size // book.dimensions
                                for s in range(step):
                                    v = book.decode_vector(br)
                                    vecs[j][
                                        off + s : off + s + step * len(v) : step
                                    ] += v
                            else:  # formats 1 and 2 share the add loop
                                t = 0
                                while t < self.part_size:
                                    v = book.decode_vector(br)
                                    vecs[j][off + t : off + t + len(v)] += v
                                    t += len(v)
                        part += 1
        except EOFError:
            return  # end of packet mid-residue is valid: stop decode


# ----------------------------------------------------- setup parsing


class _Mapping:
    __slots__ = ("submaps", "coupling", "mux", "submap_floor",
                 "submap_residue")


class _Mode:
    __slots__ = ("blockflag", "mapping")


class _VorbisSetup:
    __slots__ = ("channels", "rate", "blocksizes", "codebooks",
                 "floors", "residues", "mappings", "modes")


def _parse_ident(packet: bytes) -> tuple[int, int, tuple[int, int]]:
    if packet[:7] != b"\x01vorbis":
        raise ValueError("not a Vorbis identification packet")
    br = _Bits(packet[7:])
    if br.read(32) != 0:
        raise ValueError("unsupported Vorbis version")
    channels = br.read(8)
    rate = br.read(32)
    br.read(32)  # bitrate max
    br.read(32)  # nominal
    br.read(32)  # min
    bs0 = 1 << br.read(4)
    bs1 = 1 << br.read(4)
    if not br.flag():
        raise ValueError("Vorbis framing bit unset")
    if channels == 0 or rate == 0 or bs0 > bs1:
        raise ValueError("invalid Vorbis identification header")
    return channels, rate, (bs0, bs1)


def _parse_setup(packet: bytes, channels: int) -> _VorbisSetup:
    if packet[:7] != b"\x05vorbis":
        raise ValueError("not a Vorbis setup packet")
    br = _Bits(packet[7:])
    setup = _VorbisSetup()
    setup.channels = channels
    setup.codebooks = [_Codebook(br) for _ in range(br.read(8) + 1)]
    for _ in range(br.read(6) + 1):  # time domain transforms (unused)
        if br.read(16) != 0:
            raise ValueError("reserved Vorbis time transform")
    setup.floors = []
    for _ in range(br.read(6) + 1):
        ftype = br.read(16)
        if ftype == 1:
            setup.floors.append(_Floor1(br))
        elif ftype == 0:
            raise ValueError(
                "Vorbis floor type 0 (LSP) is a legacy-encoder format "
                "this decoder does not implement"
            )
        else:
            raise ValueError(f"reserved Vorbis floor type {ftype}")
    setup.residues = []
    for _ in range(br.read(6) + 1):
        rtype = br.read(16)
        if rtype not in (0, 1, 2):
            raise ValueError(f"reserved Vorbis residue type {rtype}")
        setup.residues.append(_Residue(br, rtype))
    setup.mappings = []
    for _ in range(br.read(6) + 1):
        if br.read(16) != 0:
            raise ValueError("reserved Vorbis mapping type")
        m = _Mapping()
        m.submaps = br.read(4) + 1 if br.flag() else 1
        m.coupling = []
        if br.flag():
            steps = br.read(8) + 1
            bits = _ilog(channels - 1)
            for _ in range(steps):
                mag = br.read(bits)
                ang = br.read(bits)
                if mag == ang or mag >= channels or ang >= channels:
                    raise ValueError("invalid Vorbis coupling step")
                m.coupling.append((mag, ang))
        if br.read(2) != 0:
            raise ValueError("reserved Vorbis mapping bits")
        m.mux = (
            [br.read(4) for _ in range(channels)]
            if m.submaps > 1
            else [0] * channels
        )
        m.submap_floor = []
        m.submap_residue = []
        for _ in range(m.submaps):
            br.read(8)  # unused time config
            m.submap_floor.append(br.read(8))
            m.submap_residue.append(br.read(8))
        setup.mappings.append(m)
    setup.modes = []
    for _ in range(br.read(6) + 1):
        mode = _Mode()
        mode.blockflag = br.read(1)
        if br.read(16) != 0 or br.read(16) != 0:
            raise ValueError("reserved Vorbis mode transform")
        mode.mapping = br.read(8)
        setup.modes.append(mode)
    if not br.flag():
        raise ValueError("Vorbis setup framing bit unset")
    _validate_setup(setup)
    return setup


def _validate_setup(setup: _VorbisSetup) -> None:
    """Cross-index validation (spec: undecodable setup = fatal).
    Everything an audio packet dereferences is bounds-checked HERE so
    packet decode cannot index out of range or divide by zero on a
    hostile stream."""
    n_books = len(setup.codebooks)

    def book(idx: int, need_vq: bool, ctx: str) -> None:
        if not 0 <= idx < n_books:
            raise ValueError(f"Vorbis {ctx} references codebook {idx}")
        if need_vq and setup.codebooks[idx].vectors is None:
            raise ValueError(f"Vorbis {ctx} needs a VQ codebook, got scalar")

    for fl in setup.floors:
        for p in fl.partition_classes:
            if fl.class_subclasses[p]:
                book(fl.class_masterbooks[p], False, "floor class")
            for b in fl.subclass_books[p]:
                if b >= 0:
                    book(b, False, "floor subclass")
    for res in setup.residues:
        book(res.classbook, False, "residue classbook")
        if setup.codebooks[res.classbook].dimensions < 1:
            raise ValueError("Vorbis residue classbook has zero dimensions")
        for row in res.books:
            for b in row:
                if b >= 0:
                    book(b, True, "residue partition")
    for m in setup.mappings:
        for f in m.submap_floor:
            if not 0 <= f < len(setup.floors):
                raise ValueError(f"Vorbis mapping references floor {f}")
        for r in m.submap_residue:
            if not 0 <= r < len(setup.residues):
                raise ValueError(f"Vorbis mapping references residue {r}")
        for mux in m.mux:
            if not 0 <= mux < m.submaps:
                raise ValueError(f"Vorbis mapping mux {mux} out of range")
    for mode in setup.modes:
        if not 0 <= mode.mapping < len(setup.mappings):
            raise ValueError(
                f"Vorbis mode references mapping {mode.mapping}"
            )


# --------------------------------------------------------- synthesis

_IMDCT_CACHE: dict[int, np.ndarray] = {}
_WINDOW_CACHE: dict[int, np.ndarray] = {}


def _imdct_matrix(n: int) -> np.ndarray:
    """IMDCT as an (n, n/2) cosine matrix (spec §4.3.7):
    y[j] = sum_k X[k] cos(pi/(2n) (2j + 1 + n/2)(2k + 1))."""
    mat = _IMDCT_CACHE.get(n)
    if mat is None:
        j = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        mat = np.cos(np.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
        _IMDCT_CACHE[n] = mat
    return mat


def _half_window(n: int) -> np.ndarray:
    """Rising Vorbis window slope over n points — the first half of
    the full-window formula sin(pi/2 * sin^2(pi/(2n) (x + 0.5)));
    the falling slope is its reverse (the formula is symmetric)."""
    w = _WINDOW_CACHE.get(n)
    if w is None:
        x = np.arange(n) + 0.5
        w = np.sin(0.5 * np.pi * np.sin(0.5 * np.pi * x / n) ** 2)
        _WINDOW_CACHE[n] = w
    return w


def _window_block(n: int, prev_n: int, next_n: int) -> np.ndarray:
    """Full window for a block of size n whose neighbors have sizes
    prev_n / next_n: slopes are sized by the smaller of the two
    adjacent blocks and centered on the lap regions (spec §4.3.1)."""
    w = np.zeros(n)
    left = min(n, prev_n) // 2
    right = min(n, next_n) // 2
    left_start = n // 4 - left // 2
    right_end = n - (n // 4 - right // 2)
    w[left_start : left_start + left] = _half_window(left)
    w[left_start + left : right_end - right] = 1.0
    w[right_end - right : right_end] = _half_window(right)[::-1]
    return w


def decode_vorbis(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an Ogg/Vorbis payload → (mono float64 in [-1, 1],
    sample_rate), matching the WAV/FLAC decode contract. Multi-stream
    Ogg: the first Vorbis logical stream is decoded."""
    streams, granules = ogg_packets(payload)
    packets = total = None
    for serial, plist in streams.items():
        if plist and plist[0][:7] == b"\x01vorbis":
            packets = plist
            total = granules.get(serial)
            break
    if packets is None:
        raise ValueError("no Vorbis logical stream in Ogg payload")
    if len(packets) < 3:
        raise ValueError("Vorbis stream missing header packets")
    try:
        channels, rate, blocksizes = _parse_ident(packets[0])
        if packets[1][:7] != b"\x03vorbis":
            raise ValueError("not a Vorbis comment packet")
        setup = _parse_setup(packets[2], channels)
    except EOFError as e:
        raise ValueError("truncated Vorbis header packet") from e
    setup.rate = rate
    setup.blocksizes = blocksizes

    mode_bits = _ilog(len(setup.modes) - 1)
    pcm: list[np.ndarray] = []
    prev_right: np.ndarray | None = None  # (ch, prev_n//2) tail
    prev_n = 0
    prev_mode_blockflag = None

    for packet in packets[3:]:
        br = _Bits(packet)
        try:
            if br.read(1) != 0:
                continue  # not an audio packet
            mode_idx = br.read(mode_bits)
            if mode_idx >= len(setup.modes):
                continue  # corrupt packet: undecodable mode number
            mode = setup.modes[mode_idx]
        except EOFError:
            continue
        n = setup.blocksizes[mode.blockflag]
        long_block = mode.blockflag == 1
        prev_flag = next_flag = True
        if long_block:  # long windows always carry the two lap flags
            try:
                prev_flag = bool(br.read(1))
                next_flag = bool(br.read(1))
            except EOFError:
                continue
        mapping = setup.mappings[mode.mapping]

        # ---- floors
        floors_y: list = []
        no_residue = []
        try:
            for ch in range(channels):
                fl = setup.floors[mapping.submap_floor[mapping.mux[ch]]]
                y = fl.decode(br, setup.codebooks)
                flags = list(fl._step2) if y is not None else None
                floors_y.append((fl, y, flags))
                no_residue.append(y is None)
        except EOFError:
            continue
        # coupling propagation: a coupled pair decodes residue if
        # either half has a floor
        for mag, ang in mapping.coupling:
            if not (no_residue[mag] and no_residue[ang]):
                no_residue[mag] = False
                no_residue[ang] = False

        # ---- residues
        spec = np.zeros((channels, n // 2))
        for sm in range(mapping.submaps):
            ch_idx = [c for c in range(channels) if mapping.mux[c] == sm]
            dnd = [no_residue[c] for c in ch_idx]
            res = setup.residues[mapping.submap_residue[sm]]
            out = res.decode(br, setup.codebooks, dnd, n)
            for k, c in enumerate(ch_idx):
                spec[c] = out[k]

        # ---- inverse coupling (polar, spec §4.3.5)
        for mag, ang in reversed(mapping.coupling):
            m = spec[mag].copy()
            a = spec[ang].copy()
            pos_m = m > 0
            pos_a = a > 0
            new_m = np.where(
                pos_m,
                np.where(pos_a, m, m + a),
                np.where(pos_a, m, m - a),
            )
            new_a = np.where(
                pos_m,
                np.where(pos_a, m - a, m),
                np.where(pos_a, m + a, m),
            )
            spec[mag] = new_m
            spec[ang] = new_a

        # ---- floor curve multiply
        for c in range(channels):
            fl, y, step2 = floors_y[c]
            if y is None:
                spec[c] = 0.0
            else:
                fl._step2 = step2  # restore per-channel flags
                spec[c] *= fl.curve(y, n)

        # ---- IMDCT + window (4/n restores the analysis scaling so
        # windowed laps reconstruct unit-amplitude time samples)
        td = (spec @ _imdct_matrix(n).T) * (4.0 / n)  # (ch, n)
        this_prev_n = setup.blocksizes[0] if not prev_flag else n
        this_next_n = setup.blocksizes[0] if not next_flag else n
        td *= _window_block(n, this_prev_n if long_block else n,
                            this_next_n if long_block else n)

        # ---- overlap-add (lapped windows: left half laps previous
        # right half, centered)
        left_half = td[:, : n // 2]
        right_half = td[:, n // 2 :]
        if prev_right is not None:
            lap = _lap_add(prev_right, left_half, prev_n, n)
            pcm.append(lap)
        prev_right = right_half
        prev_n = n

    if not pcm:
        if prev_right is None:
            raise ValueError("Vorbis stream has no audio packets")
        return np.zeros(0), rate
    mono = np.concatenate([p.mean(axis=0) for p in pcm])
    if total and total < mono.size:
        # final granule position = total PCM samples: encoders trim
        # the last block's tail. Granule 0 carries no information
        # (header pages are stamped 0), so only positive totals trim.
        mono = mono[:total]
    return np.clip(mono, -1.0, 1.0), rate


def _lap_add(prev_right: np.ndarray, cur_left: np.ndarray,
             prev_n: int, n: int) -> np.ndarray:
    """Overlap-add: a packet emits the samples between the previous
    window's center and the current window's center — prev_n//4 +
    n//4 of them. The previous right half contributes from the
    region's START (anything past it is zero-windowed when the next
    block is short); the current left half contributes its LAST
    out_len samples (anything before is zero-windowed when the
    previous block is short)."""
    out_len = prev_n // 4 + n // 4
    ch = prev_right.shape[0]
    out = np.zeros((ch, out_len))
    pr = prev_right[:, : min(prev_right.shape[1], out_len)]
    out[:, : pr.shape[1]] += pr
    cl = cur_left[:, max(0, cur_left.shape[1] - out_len) :]
    out[:, out_len - cl.shape[1] :] += cl
    return out
