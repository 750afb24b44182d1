"""Pure-stdlib GIF codec (grayscale luma extraction) — fourth member
of the dependency-free image decode family (BMP, PNG, JPEG in
``operators/multimodal.py`` / ``operators/jpeg.py``): web corpora are
full of GIFs, and the multimodal pipeline should decode them in CI
without the optional ``pillow`` extra.

Decoder scope: GIF87a/GIF89a, global or local color table, full LZW
decompression (variable code width, clear/EOI codes), interlaced and
non-interlaced, first frame of an animation (the corpus-feature
convention: one image per payload; frame sampling is the video
operator's job), extension blocks skipped. Palette entries collapse to
BT.601 integer luma ``(299R + 587G + 114B + 500) // 1000`` — the same
convention as the JPEG luma path, exact integer so tests replay it.
ValueError (never a bare IndexError) for truncated/corrupt payloads.

The encoder emits GIF87a with a 256-entry gray palette and real LZW
compression (so decode exercises genuine variable-width code streams,
not degenerate clear-code-per-symbol output) — the CI fixture
generator and interop probe.

No reference-repo counterpart (`cubicerpetl.py` has no media
handling); part of the LLM-pipeline multimodal extension. Scale note:
runs per-payload inside Arrow-batched ``mapInPandas`` — map-only,
embarrassingly parallel.
"""

from __future__ import annotations

import struct


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b + 500) // 1000


class _LZWDecoder:
    """GIF-flavor LZW: code width grows from min_code_size+1 up to 12
    bits; CLEAR resets the table; codes are packed LSB-first."""

    def __init__(self, min_code_size: int, data: bytes):
        self.min_code_size = min_code_size
        self.data = data
        self.bitpos = 0

    def _read_code(self, width: int) -> int:
        d, p = self.data, self.bitpos
        byte = p >> 3
        if byte >= len(d):
            raise ValueError("LZW stream truncated")
        acc = d[byte] | (d[byte + 1] << 8 if byte + 1 < len(d) else 0) | (
            d[byte + 2] << 16 if byte + 2 < len(d) else 0
        )
        self.bitpos += width
        return (acc >> (p & 7)) & ((1 << width) - 1)

    def decode(self, expected: int) -> bytes:
        mcs = self.min_code_size
        clear = 1 << mcs
        eoi = clear + 1
        out = bytearray()
        table: list[bytes] = []

        def reset() -> int:
            table.clear()
            table.extend(bytes((i,)) for i in range(clear))
            table.append(b"")  # clear
            table.append(b"")  # eoi
            return mcs + 1

        width = reset()
        prev: bytes | None = None
        while len(out) < expected:
            code = self._read_code(width)
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                break
            if code < len(table) and code not in (clear, eoi):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW code")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
        if len(out) < expected:
            raise ValueError("LZW output short of pixel count")
        return bytes(out[:expected])


class _LZWEncoder:
    """Matching encoder: greedy longest-match with a dict table,
    emitting CLEAR on table overflow — real variable-width streams."""

    def __init__(self, min_code_size: int):
        self.mcs = min_code_size
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def _emit(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def encode(self, pixels: bytes) -> bytes:
        clear = 1 << self.mcs
        eoi = clear + 1

        def reset():
            return {bytes((i,)): i for i in range(clear)}, eoi + 1, self.mcs + 1

        table, nxt, width = reset()
        self._emit(clear, width)
        buf = b""
        for px in pixels:
            cand = buf + bytes((px,))
            if cand in table:
                buf = cand
                continue
            self._emit(table[buf], width)
            if nxt < 4096:
                table[cand] = nxt
                if nxt == (1 << width) and width < 12:
                    width += 1
                nxt += 1
            else:
                self._emit(clear, width)
                table, nxt, width = reset()
            buf = bytes((px,))
        if buf:
            self._emit(table[buf], width)
        self._emit(eoi, width)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame of a GIF to ``(width, height, pixels)``
    — row-major BT.601 luma of the palette entries."""
    try:
        return _decode_gif_gray(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt GIF payload: {exc}") from exc


def _decode_gif_gray(payload: bytes) -> tuple[int, int, bytes]:
    if len(payload) < 13 or payload[:3] != b"GIF" or payload[3:6] not in (
        b"87a",
        b"89a",
    ):
        raise ValueError("not a GIF payload (missing GIF87a/89a header)")
    _w, _h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: list[int] | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = [
            _luma(payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image descriptor")
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError("GIF block sync lost")
        left, top, width, height, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        if width < 1 or height < 1:
            raise ValueError("degenerate GIF frame dimensions")
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = [
                _luma(payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        idx = _LZWDecoder(min_code_size, b"".join(chunks)).decode(width * height)
        lut = bytes(
            lct[i] if i < len(lct) else 0 for i in range(256)
        )
        flat = bytes(lut[i] for i in idx)
        if not (iflags & 0x40):
            return width, height, flat
        out = bytearray(width * height)
        src = 0
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                out[y * width : (y + 1) * width] = flat[src : src + width]
                src += width
        return width, height, bytes(out)
    raise ValueError("GIF truncated before image data")


def encode_gif_gray(
    width: int, height: int, pixels: bytes, interlace: bool = False
) -> bytes:
    """Serialize row-major grayscale ``pixels`` as a GIF87a with a
    256-entry gray palette (palette luma == pixel value, so the
    round-trip is pixel-exact) and real LZW compression."""
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    head = b"GIF87a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    palette = b"".join(bytes((i, i, i)) for i in range(256))
    desc = b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
    )
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                rows.append(pixels[y * width : (y + 1) * width])
        src = b"".join(rows)
    else:
        src = pixels
    lzw = _LZWEncoder(8).encode(src)
    blocks = bytearray(b"\x08")  # min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return head + palette + desc + bytes(blocks) + b"\x3b"
