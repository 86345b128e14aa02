"""From-scratch Brotli decoder (RFC 7932) — no external library.

Implements the full bit-stream format: window header, metadata /
uncompressed / compressed meta-blocks, simple and complex prefix codes
(code-length-code with run-length codes 16/17), block switching for all
three categories, context maps with RLE + inverse-move-to-front, the
insert&copy command alphabet, the four-slot distance ring with special
codes and NPOSTFIX/NDIRECT parametrized direct codes.

Reference behaviour target: ``InputStreamUtils.java:399-447`` routes
``Content-Encoding: br`` payloads through ``org.brotli.dec``; this module
is the pure-python stand-in behind the same hint gate
(``functions/payload.py``).

Honest capability gates (raise ``BrotliDictionaryError`` /
``BrotliContextError`` rather than mis-decode):

* **static dictionary words** — a backward distance beyond the written
  output selects one of the 122,784 dictionary bytes + 121 transforms
  from RFC 7932 appendices A/B. That appendix DATA is not present in
  this container and cannot be fabricated, so such streams raise
  ``BrotliDictionaryError`` carrying the (word length, word id) it
  would have needed. All other streams decode fully.
* **UTF8/Signed literal-context modes** are gated ONLY when they would
  actually select between different literal trees (multiple trees whose
  context-map rows differ); LSB6/MSB6 are implemented exactly, and any
  mode with a single literal tree decodes fine. A spec-recalled ASCII
  UTF8 context table ships behind ``allow_unverified_context=True`` —
  the strict default refuses rather than risk a silent mis-decode,
  because no encoder exists in this container to cross-check the table.
"""

from __future__ import annotations

__all__ = [
    "brotli_decompress",
    "BrotliError",
    "BrotliDictionaryError",
    "BrotliContextError",
]


class BrotliError(ValueError):
    pass


class BrotliDictionaryError(BrotliError):
    """Stream references the RFC 7932 appendix-A static dictionary.

    ``partial`` carries everything decoded before the reference — tests
    validate it byte-for-byte against real-encoder output prefixes."""

    def __init__(self, msg: str, partial: bytes = b""):
        super().__init__(msg)
        self.partial = partial


class BrotliContextError(BrotliError):
    """Stream needs the UTF8/Signed context LUTs with multiple trees."""


class _BitReader:
    __slots__ = ("data", "pos")  # pos in bits

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        """n bits, LSB-first within bytes, little-endian across bytes."""
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise BrotliError("unexpected end of stream")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        assert self.pos & 7 == 0
        byte = self.pos >> 3
        if byte + n > len(self.data):
            raise BrotliError("unexpected end of stream (uncompressed block)")
        self.pos += 8 * n
        return self.data[byte : byte + n]


# ---------------------------------------------------------------------------
# prefix codes

_CL_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15]
# static code for the code-length code's own lengths: peek 4 bits
_CL_PREFIX_LEN = [2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4]
_CL_PREFIX_VAL = [0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5]


class _Prefix:
    """Canonical prefix decoder: first bit read = MSB of the code."""

    __slots__ = ("table",)

    def __init__(self, lengths: dict[int, int]):
        # lengths: symbol -> code length (>0)
        items = sorted((l, s) for s, l in lengths.items() if l > 0)
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for l, s in items:
            code <<= l - prev_len
            prev_len = l
            self.table[(l, code)] = s
            code += 1

    @classmethod
    def single(cls, symbol: int) -> "_Prefix":
        p = cls({})
        p.table = {"single": symbol}  # type: ignore[dict-item]
        return p

    def decode(self, br: _BitReader) -> int:
        single = self.table.get("single")  # type: ignore[call-overload]
        if single is not None:
            return single
        code = 0
        length = 0
        for _ in range(16):
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise BrotliError("invalid prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Prefix:
    two = br.read(2)
    if two == 1:  # simple code
        nsym = br.read(2) + 1
        abits = max(1, (alphabet_size - 1).bit_length())
        syms = [br.read(abits) for _ in range(nsym)]
        for s in syms:
            if s >= alphabet_size:
                raise BrotliError("simple-code symbol out of range")
        if len(set(syms)) != nsym:
            raise BrotliError("duplicate symbol in simple code")
        if nsym == 1:
            return _Prefix.single(syms[0])
        if nsym == 2:
            a, b = sorted(syms)
            return _Prefix({a: 1, b: 1})
        if nsym == 3:
            a = syms[0]
            b, c = sorted(syms[1:])
            return _Prefix({a: 1, b: 2, c: 2})
        tree_select = br.read(1)
        if tree_select:
            a, b = syms[0], syms[1]
            c, d = sorted(syms[2:])
            return _Prefix({a: 1, b: 2, c: 3, d: 3})
        return _Prefix({s: 2 for s in syms})

    # complex code: `two` is HSKIP (0, 2 or 3)
    hskip = two
    cl_lengths = [0] * 18
    space = 32
    num_codes = 0
    for i in range(hskip, 18):
        # static 4-bit-peek code (LSB-first peek)
        peek = 0
        save = br.pos
        for k in range(4):
            byte = br.pos >> 3
            if byte < len(br.data):
                peek |= ((br.data[byte] >> (br.pos & 7)) & 1) << k
            br.pos += 1
        br.pos = save
        length = _CL_PREFIX_LEN[peek]
        value = _CL_PREFIX_VAL[peek]
        br.pos += length
        cl_lengths[_CL_ORDER[i]] = value
        if value:
            num_codes += 1
            space -= 32 >> value
            if space <= 0:
                break
    if num_codes == 1:
        # degenerate: the single code-length symbol repeats forever
        pass
    elif space != 0:
        raise BrotliError("code-length code over/under-subscribed")
    cl_code = _Prefix({s: l for s, l in enumerate(cl_lengths) if l})
    if num_codes == 1:
        only = next(s for s, l in enumerate(cl_lengths) if l)
        cl_code = _Prefix.single(only)

    lengths: dict[int, int] = {}
    symbol = 0
    prev_nonzero = 8
    repeat = 0
    repeat_len = 0  # length being repeated by code 16 (0 for code 17)
    space = 32768
    while symbol < alphabet_size and space > 0:
        cl = cl_code.decode(br)
        if cl < 16:
            repeat = 0
            if cl:
                lengths[symbol] = cl
                prev_nonzero = cl
                space -= 32768 >> cl
            symbol += 1
        else:
            extra_bits = 2 if cl == 16 else 3
            new_len = prev_nonzero if cl == 16 else 0
            if repeat and repeat_len == new_len:
                old = repeat
                repeat = ((repeat - 2) << extra_bits) + br.read(extra_bits) + 3
                delta = repeat - old
            else:
                repeat = br.read(extra_bits) + 3
                delta = repeat
            repeat_len = new_len
            for _ in range(delta):
                if symbol >= alphabet_size:
                    raise BrotliError("repeat past alphabet end")
                if new_len:
                    lengths[symbol] = new_len
                    space -= 32768 >> new_len
                symbol += 1
    if space < 0:
        raise BrotliError("prefix code over-subscribed")
    if len(lengths) == 1:
        return _Prefix.single(next(iter(lengths)))
    return _Prefix(lengths)


def _read_varlen_uint8(br: _BitReader) -> int:
    """1..256 (NBLTYPES / NTREES encoding)."""
    if br.read(1) == 0:
        return 1
    n = br.read(3)
    if n == 0:
        return 2
    return br.read(n) + (1 << n) + 1


# ---------------------------------------------------------------------------
# fixed tables (RFC 7932 §5 / §6)

_INSERT_BASE = [0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98,
                130, 194, 322, 578, 1090, 2114, 6210, 22594]
_INSERT_EXTRA = [0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                 6, 7, 8, 9, 10, 12, 14, 24]
_COPY_BASE = [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54,
              70, 102, 134, 198, 326, 582, 1094, 2118]
_COPY_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
               5, 5, 6, 7, 8, 9, 10, 24]
_INSERT_RANGE = [0, 0, 8, 8, 0, 16, 8, 16, 16]
_COPY_RANGE = [0, 8, 0, 8, 16, 0, 16, 8, 16]
_BLOCK_LEN_BASE = [1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145,
                   177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
                   8433, 16625]
_BLOCK_LEN_EXTRA = [2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
                    6, 6, 7, 8, 9, 10, 11, 12, 13, 24]


def _read_block_len(br: _BitReader, code: _Prefix) -> int:
    sym = code.decode(br)
    return _BLOCK_LEN_BASE[sym] + br.read(_BLOCK_LEN_EXTRA[sym])


class _BlockState:
    """Block-type switching for one category (L / I / D)."""

    __slots__ = ("n", "btype", "prev", "length", "type_code", "len_code")

    def __init__(self, br: _BitReader, n: int):
        self.n = n
        self.btype = 0
        self.prev = 1
        if n >= 2:
            self.type_code = _read_prefix_code(br, n + 2)
            self.len_code = _read_prefix_code(br, 26)
            self.length = _read_block_len(br, self.len_code)
        else:
            self.type_code = None
            self.len_code = None
            self.length = 1 << 60

    def tick(self, br: _BitReader) -> None:
        if self.length == 0:
            sym = self.type_code.decode(br)
            if sym == 0:
                new = self.prev
            elif sym == 1:
                new = (self.btype + 1) % self.n
            else:
                new = sym - 2
            self.prev = self.btype
            self.btype = new
            self.length = _read_block_len(br, self.len_code)
        self.length -= 1


def _read_context_map(br: _BitReader, n_trees: int, size: int) -> list[int]:
    if n_trees == 1:
        return [0] * size
    rlemax = 0
    if br.read(1):
        rlemax = br.read(4) + 1
    code = _read_prefix_code(br, n_trees + rlemax)
    cmap: list[int] = []
    while len(cmap) < size:
        sym = code.decode(br)
        if sym == 0:
            cmap.append(0)
        elif sym <= rlemax:
            cmap.extend([0] * ((1 << sym) + br.read(sym)))
        else:
            cmap.append(sym - rlemax)
    if len(cmap) != size:
        raise BrotliError("context map overrun")
    if br.read(1):  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            value = mtf[v]
            cmap[i] = value
            del mtf[v]
            mtf.insert(0, value)
    return cmap


# context modes
_LSB6, _MSB6, _UTF8, _SIGNED = 0, 1, 2, 3

# UTF8 context mode (RFC 7932 §7.1): context = LUT0[p1] | LUT1[p2].
# The ASCII halves below are recalled from the spec's table and are used
# only under ``allow_unverified_context=True`` (they decode the real
# fixture's early literals correctly, but no in-container encoder can
# verify every row, so the strict default gates instead).
_UTF8_LUT0_ASCII = [
    # control / whitespace
    0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 4, 0, 0, 4, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    # space + punctuation
    8, 12, 16, 12, 12, 20, 12, 16, 24, 28, 12, 12, 32, 12, 36, 12,
    # digits + punctuation
    44, 44, 44, 44, 44, 44, 44, 44, 44, 44, 32, 32, 24, 40, 28, 12,
    # @ + uppercase (vowels class 48, consonants 52)
    12, 48, 52, 52, 52, 48, 52, 52, 52, 48, 52, 52, 52, 52, 52, 48,
    52, 52, 52, 52, 52, 48, 52, 52, 52, 52, 52, 24, 12, 28, 12, 12,
    # ` + lowercase (vowels class 56, consonants 60)
    12, 56, 60, 60, 60, 56, 60, 60, 60, 56, 60, 60, 60, 60, 60, 56,
    60, 60, 60, 60, 60, 56, 60, 60, 60, 60, 60, 24, 12, 28, 12, 0,
]
_UTF8_LUT1_ASCII = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
    1, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 1, 1, 1, 1, 0,
]


def brotli_decompress(
    data: bytes,
    max_output: int | None = None,
    dictionary=None,
    allow_unverified_context: bool = False,
) -> bytes:
    """Decode a complete brotli stream (RFC 7932).

    ``dictionary``: optional resolver ``(copy_len, word_id, out) ->
    bytes`` for static-dictionary references — supply one backed by the
    RFC 7932 appendix-A/B data when that file is available (the container
    ships none, so the default is the documented ``BrotliDictionaryError``
    gate). ``copy_len`` is the dictionary word length (4..24),
    ``word_id = distance - maxdist - 1``, and ``out`` is the output
    produced so far (read-only; real resolvers ignore it — differential
    validation tooling uses it). Returns the TRANSFORMED word bytes
    (appendix-B transform already applied)."""
    br = _BitReader(data)
    # window bits
    if br.read(1) == 0:
        wbits = 16
    else:
        n = br.read(3)
        if n != 0:
            wbits = 17 + n
        else:
            n = br.read(3)
            if n == 0:
                wbits = 17
            elif n == 1:
                raise BrotliError("reserved WBITS value")
            else:
                wbits = 8 + n
    window = (1 << wbits) - 16

    out = bytearray()
    dist_ring = [16, 15, 11, 4]  # spec initial values (most recent first)

    while True:
        islast = br.read(1)
        if islast and br.read(1):  # ISLASTEMPTY
            break
        mnibbles = br.read(2)
        if mnibbles == 3:  # metadata block
            if br.read(1):
                raise BrotliError("reserved bit set in metadata block")
            mskip_bytes = br.read(2)
            mskip = 0
            for i in range(mskip_bytes):
                b = br.read(8)
                if i + 1 == mskip_bytes and mskip_bytes > 1 and b == 0:
                    raise BrotliError("non-minimal MSKIPLEN")
                mskip |= b << (8 * i)
            if mskip_bytes:
                mskip += 1
            br.align_byte()
            br.read_bytes(mskip)
            if islast:
                raise BrotliError("metadata block cannot be last")
            continue
        mlen = br.read(16 + 4 * mnibbles) + 1
        if mnibbles > 0 and mlen <= (1 << (12 + 4 * mnibbles)):
            # nibble count must be minimal; tolerated by some decoders,
            # rejected here per spec
            if mlen - 1 < (1 << (16 + 4 * (mnibbles - 1))):
                raise BrotliError("non-minimal MNIBBLES")
        if max_output is not None and len(out) + mlen > max_output:
            raise BrotliError("output limit exceeded")
        if not islast:
            if br.read(1):  # ISUNCOMPRESSED
                br.align_byte()
                out += br.read_bytes(mlen)
                continue

        bs_l = _BlockState(br, _read_varlen_uint8(br))
        bs_i = _BlockState(br, _read_varlen_uint8(br))
        bs_d = _BlockState(br, _read_varlen_uint8(br))
        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        cmodes = [br.read(2) for _ in range(bs_l.n)]
        ntrees_l = _read_varlen_uint8(br)
        cmap_l = _read_context_map(br, ntrees_l, 64 * bs_l.n)
        ntrees_d = _read_varlen_uint8(br)
        cmap_d = _read_context_map(br, ntrees_d, 4 * bs_d.n)
        lit_codes = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        cmd_codes = [_read_prefix_code(br, 704) for _ in range(bs_i.n)]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_codes = [_read_prefix_code(br, dist_alpha) for _ in range(ntrees_d)]

        def lit_context() -> int:
            mode = cmodes[bs_l.btype]
            p1 = out[-1] if len(out) >= 1 else 0
            p2 = out[-2] if len(out) >= 2 else 0
            if mode == _LSB6:
                return p1 & 0x3F
            if mode == _MSB6:
                return p1 >> 2
            # UTF8 / Signed: only gate when the choice of tree actually
            # depends on the context value
            row = cmap_l[64 * bs_l.btype : 64 * (bs_l.btype + 1)]
            if len(set(row)) == 1:
                return 0
            if mode == _UTF8:
                if allow_unverified_context and p1 < 128 and p2 < 128:
                    return _UTF8_LUT0_ASCII[p1] | _UTF8_LUT1_ASCII[p2]
                raise BrotliContextError(
                    "UTF8 context mode with context-dependent literal "
                    "trees: the context tables below are spec-recalled "
                    "but UNVERIFIED in this container (no encoder to "
                    "cross-check) — pass allow_unverified_context=True "
                    "to decode anyway, or a silent mis-decode stays "
                    "impossible by default"
                )
            raise BrotliContextError(
                "Signed context mode with context-dependent literal "
                "trees is not supported (context LUT data unavailable)"
            )

        while mlen > 0:
            bs_i.tick(br)
            cmd = cmd_codes[bs_i.btype].decode(br)
            range_idx = cmd >> 6
            implicit_dist0 = range_idx < 2
            if implicit_dist0:
                range_idx_adj = range_idx
            else:
                range_idx_adj = range_idx - 2
            icode = _INSERT_RANGE[range_idx_adj] + ((cmd >> 3) & 7)
            ccode = _COPY_RANGE[range_idx_adj] + (cmd & 7)
            ilen = _INSERT_BASE[icode] + br.read(_INSERT_EXTRA[icode])
            clen = _COPY_BASE[ccode] + br.read(_COPY_EXTRA[ccode])

            for _ in range(ilen):
                bs_l.tick(br)
                ctx = lit_context()
                tree = cmap_l[64 * bs_l.btype + ctx]
                out.append(lit_codes[tree].decode(br))
            mlen -= ilen
            if mlen <= 0:
                if mlen < 0:
                    raise BrotliError("insert length exceeds meta-block")
                break

            if implicit_dist0:
                dcode = 0
            else:
                bs_d.tick(br)
                ctx = min(clen, 5) - 2
                tree = cmap_d[4 * bs_d.btype + ctx]
                dcode = dist_codes[tree].decode(br)

            if dcode < 16:
                d1, d2 = dist_ring[0], dist_ring[1]
                table = (
                    d1, d2, dist_ring[2], dist_ring[3],
                    d1 - 1, d1 + 1, d1 - 2, d1 + 2, d1 - 3, d1 + 3,
                    d2 - 1, d2 + 1, d2 - 2, d2 + 2, d2 - 3, d2 + 3,
                )
                distance = table[dcode]
                if distance <= 0:
                    raise BrotliError("non-positive distance")
            elif dcode < 16 + ndirect:
                distance = dcode - 16 + 1
            else:
                x = dcode - ndirect - 16
                postfix = x & ((1 << npostfix) - 1)
                hcode = x >> npostfix
                nbits = 1 + (x >> (npostfix + 1))
                offset = ((2 + (hcode & 1)) << nbits) - 4
                distance = (
                    ((offset + br.read(nbits)) << npostfix)
                    + postfix + ndirect + 1
                )

            maxdist = min(len(out), window)
            if distance > maxdist:
                # static dictionary reference (RFC 7932 §8)
                if not (4 <= clen <= 24):
                    raise BrotliError("invalid dictionary copy length")
                word_id = distance - maxdist - 1
                if dictionary is not None:
                    word = dictionary(clen, word_id, out)
                    out += word
                    mlen -= len(word)
                    if mlen < 0:
                        raise BrotliError("dictionary word exceeds meta-block")
                    continue  # dictionary refs never touch the ring
                raise BrotliDictionaryError(
                    f"stream references static dictionary word "
                    f"(copy length {clen}, word id {word_id}) — appendix-A "
                    f"dictionary data unavailable in this environment",
                    partial=bytes(out),
                )
            if dcode != 0:
                dist_ring.insert(0, distance)
                dist_ring.pop()
            for _ in range(clen):
                out.append(out[-distance])
            mlen -= clen
            if mlen < 0:
                raise BrotliError("copy length exceeds meta-block")

        if islast:
            break
    return bytes(out)
