"""Unix ``compress`` (.Z) LZW codec, from scratch (SURVEY.md §2.9 X10
family — the reference unpacks .Z via Tika/commons-compress'
ZCompressorInputStream; stdlib Python has no decoder).

PUBLIC byte layout (the ncompress file format):

- magic ``1F 9D``, then a flags byte: low 5 bits = max code width
  (9..16), bit 7 = block mode (code 256 is CLEAR; first free code 257);
- LZW codes packed LSB-first, starting at 9 bits, width w -> w+1 when
  the next free code exceeds ``(1 << w) - 1``;
- the infamous alignment quirk: the stream is consumed in groups of
  8 codes per width — on every width change (and after CLEAR) the bit
  position advances to the next multiple of ``8 * w`` bits relative to
  the group start, mirroring compress' buffered writer.

The encoder here is validated against the system ``uncompress`` tool in
tests (real external compatibility); the decoder is bounded-output
(decompression-bomb posture, same contract as binarchive's other
wrappers) and round-trips the encoder across width changes, dictionary
saturation, and CLEAR resets.
"""

from __future__ import annotations

MAGIC = b"\x1f\x9d"
_CLEAR = 256


class BadLzc(ValueError):
    """Malformed .Z stream (maps to the corrupt taxonomy)."""


class _BitWriter:
    """LSB-first code packer with compress' 8-codes-per-width grouping."""

    __slots__ = ("out", "acc", "nbits", "group_bits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self.group_bits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        self.group_bits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def align_group(self, width: int) -> None:
        """Pad with zero bits to the next 8-code boundary of ``width``."""
        pad = (-self.group_bits) % (8 * width)
        while pad > 0:
            step = min(pad, 8)
            self.write(0, step)
            pad -= step
        self.group_bits = 0

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def compress(
    data: bytes, maxbits: int = 16, clear_every: int | None = None
) -> bytes:
    """LZW-compress ``data`` into a genuine .Z stream (block mode).

    ``clear_every`` (testing hook) emits a CLEAR + dictionary reset every
    N codes, exercising the decoder's reset + realignment path that real
    ``compress`` only takes under degrading ratios."""
    if not 9 <= maxbits <= 16:
        raise ValueError("maxbits out of range")
    w = _BitWriter()
    # sequences are keyed (code << 8) | next_byte — no per-byte bytes
    # allocation in the hot loop (measured ~4x vs the bytes-keyed table);
    # literal codes 0..255 are implicit, emitted codes are identical.
    table: dict[int, int] = {}
    width = 9
    free_ent = _CLEAR + 1
    maxmax = 1 << maxbits
    cur = -1  # current sequence's code; -1 = none
    n_codes = 0

    def bump_if_needed() -> None:
        # compress.c runs this check inside output(), BEFORE the table
        # insert — so the width changes one code later than a post-add
        # check would; real uncompress depends on this exact timing
        nonlocal width
        if free_ent > (1 << width) - 1 and width < maxbits:
            w.align_group(width)
            width += 1

    get = table.get
    for byte in data:
        if cur < 0:
            cur = byte
            continue
        key = (cur << 8) | byte
        nxt_code = get(key)
        if nxt_code is not None:
            cur = nxt_code
            continue
        w.write(cur, width)
        n_codes += 1
        bump_if_needed()
        if free_ent < maxmax:
            table[key] = free_ent
            free_ent += 1
        cur = byte
        if clear_every and n_codes % clear_every == 0:
            # flush current seq, emit CLEAR, reset
            w.write(cur, width)
            w.write(_CLEAR, width)
            w.align_group(width)
            table = {}
            get = table.get
            width = 9
            free_ent = _CLEAR + 1
            cur = -1
    if cur >= 0:
        w.write(cur, width)
    return MAGIC + bytes([maxbits | 0x80]) + w.finish()


def decompress(data: bytes, limit: int) -> tuple[bytes, bool]:
    """Decode a .Z stream emitting at most ``limit`` bytes.

    Returns ``(payload, overflowed)`` — on overflow the payload holds the
    first ``limit + 1`` bytes produced (caller truncates to a sniff
    head). Raises :class:`BadLzc` on malformed input."""
    if data[:2] != MAGIC or len(data) < 3:
        raise BadLzc("bad magic")
    flags = data[2]
    maxbits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if not 9 <= maxbits <= 16:
        raise BadLzc("bad maxbits")
    body = data[3:]
    nbits_total = len(body) * 8

    pos = 0            # bit position
    group_start = 0    # bit position where the current width group began
    width = 9
    first_free = _CLEAR + 1 if block_mode else 256
    free_ent = first_free
    maxmax = 1 << maxbits

    # code -> (prefix_code, byte); literals implicit
    prefix = [0] * maxmax
    suffix = bytearray(maxmax)

    def read_code() -> int | None:
        nonlocal pos
        if pos + width > nbits_total:
            return None
        byte_i = pos >> 3
        bit_off = pos & 7
        chunk = int.from_bytes(body[byte_i : byte_i + 3], "little")
        pos += width
        return (chunk >> bit_off) & ((1 << width) - 1)

    def realign() -> None:
        nonlocal pos, group_start
        span = pos - group_start
        pos = group_start + -(-span // (8 * width)) * (8 * width)
        group_start = pos

    def bump_if_needed() -> None:
        # checked after each table add, i.e. before reading the next
        # code; the decoder's lag-by-one table exactly cancels the
        # encoder's pre-add check timing (the classic .Z off-by-one)
        nonlocal width
        if free_ent > (1 << width) - 1 and width < maxbits:
            realign()
            width += 1

    def expand(code: int) -> bytes:
        outb = bytearray()
        guard = 0
        while code >= 256:
            if code >= free_ent:
                raise BadLzc("code out of range")
            outb.append(suffix[code])
            code = prefix[code]
            guard += 1
            if guard > maxmax:
                raise BadLzc("cycle in code table")
        outb.append(code)
        return bytes(reversed(outb))

    out = bytearray()
    prev: int | None = None
    prev_bytes = b""
    while True:
        code = read_code()
        if code is None:
            return bytes(out), False
        if block_mode and code == _CLEAR:
            realign()
            width = 9
            free_ent = first_free
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise BadLzc("first code not a literal")
            cur = bytes([code])
        elif code < free_ent:
            cur = expand(code)
        elif code == free_ent:  # KwKwK
            cur = prev_bytes + prev_bytes[:1]
        else:
            raise BadLzc("code out of range")
        out += cur
        if len(out) > limit:
            return bytes(out[: limit + 1]), True
        if prev is not None and free_ent < maxmax:
            prefix[free_ent] = prev
            suffix[free_ent] = cur[0]
            free_ent += 1
            bump_if_needed()
        prev = code if code < free_ent else free_ent - 1
        prev_bytes = cur
