"""Pure-Python FLAC codec (public format spec / RFC 9639).

Decoder: full frame decode to PCM — metadata-block walk (STREAMINFO
for the code-0 rate/size fallbacks), frame-header parse (block-size /
sample-rate / channel-assignment / sample-size codes, UTF-8-coded
frame number, CRC-8), all four subframe types (CONSTANT, VERBATIM,
FIXED orders 0-4, LPC orders 1-32 with quantized coefficients and
shift), Rice/Rice2 residual partitions incl. the raw-bitcount escape,
wasted-bits unshift, left/right/mid-side stereo decorrelation, and
frame CRC-16 verification. Corruption — bad sync, CRC mismatch,
reserved codes, truncated bitstream — raises ValueError (the
quarantine contract).

Encoder: a spec-conformant fixture/synthesis encoder (CONSTANT /
VERBATIM / FIXED subframes with per-block best-order selection and
Rice parameter search) so tests exercise the decoder with REAL
Rice-coded streams from an independent implementation; it is not a
production encoder.

Reference parity note: the reference ships no audio handling at all
(binary payloads pass through, main.py:694-707); this module extends
the from-scratch multimodal surface (SURVEY.md §2 X5) the same way
jpegcodec.py does for images.
"""

from __future__ import annotations

import struct

__all__ = ["decode_pcm", "decode_samples", "encode_flac"]


# ---------------------------------------------------------------------------
# CRCs (FLAC frame integrity): CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, non-reflected.
# ---------------------------------------------------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader that remembers byte offsets so CRC spans
    can be computed over the raw bytes afterwards."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos  # next unread byte
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = self.acc >> self.n
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if nbits and v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:  # corrupt stream guard
                raise ValueError("FLAC unary run absurdly long")
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        if self.n % 8:
            raise ValueError("FLAC bit reader not byte-aligned")
        return self.pos - self.n // 8


_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients by order (RFC 9639 §9.2.2)
_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    extra = 0
    mask = 0x40
    while first & mask:
        extra += 1
        mask >>= 1
    if extra < 1 or extra > 6:
        raise ValueError("FLAC frame number has invalid UTF-8 prefix")
    v = first & (mask - 1)
    for _ in range(extra):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC frame number continuation byte invalid")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"FLAC residual method {method} reserved")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    if blocksize % (1 << po):
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(1 << po):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC first partition shorter than order")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            out.extend(bits.read_signed(raw) if raw else 0
                       for _ in range(count))
        else:
            for _ in range(count):
                q = bits.read_unary()
                u = (q << param) | (bits.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    code = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if code == 0:  # CONSTANT
        out = [bits.read_signed(eff)] * blocksize
    elif code == 1:  # VERBATIM
        out = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= code <= 12:  # FIXED
        order = code & 7
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds block size")
        out = [bits.read_signed(eff) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        coef = _FIXED_COEF[order]
        for i, r in enumerate(res):
            k = order + i
            out.append(r + sum(c * out[k - 1 - j]
                               for j, c in enumerate(coef)))
    elif code >= 32:  # LPC
        order = (code & 31) + 1
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds block size")
        out = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC precision code reserved")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift reserved")
        coef = [bits.read_signed(prec) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        for i, r in enumerate(res):
            k = order + i
            pred = sum(c * out[k - 1 - j] for j, c in enumerate(coef))
            out.append(r + (pred >> shift))
    else:
        raise ValueError(f"FLAC subframe type {code} reserved")
    if wasted:
        out = [s << wasted for s in out]
    return out


def _streaminfo(content: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bps, total_samples) from the mandatory
    first metadata block; returns the offset past all metadata via
    raising-free scan in _frames_start."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    if len(content) < 8 or content[4] & 0x7F != 0:
        raise ValueError("FLAC first metadata block is not STREAMINFO")
    ln = int.from_bytes(content[5:8], "big")
    if ln < 34 or 8 + ln > len(content):
        raise ValueError("FLAC STREAMINFO block truncated")
    b = content[8 : 8 + 34]
    sr = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x7) + 1
    bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0xF) << 32) | int.from_bytes(b[14:18], "big")
    if sr == 0:
        raise ValueError("FLAC has zero sample rate")
    return sr, channels, bps, total


def _frames_start(content: bytes) -> int:
    pos = 4
    while True:
        if pos + 4 > len(content):
            raise ValueError("FLAC metadata blocks truncated")
        hdr = content[pos]
        ln = int.from_bytes(content[pos + 1 : pos + 4], "big")
        pos += 4 + ln
        if pos > len(content):
            raise ValueError("FLAC metadata block overruns payload")
        if hdr & 0x80:  # last-metadata-block flag
            return pos


def decode_pcm(content: bytes) -> tuple[dict, list[list[int]]]:
    """Decode every frame to PCM. Returns (meta, channels) where
    channels is one list of signed ints per channel."""
    sr, n_ch, bps_si, total = _streaminfo(content)
    pos = _frames_start(content)
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    while pos < len(content):
        frame_at = pos
        # Trailing-garbage tolerance: once the stream has delivered
        # every sample STREAMINFO promised, bytes that don't start a
        # valid frame (ID3v1 tags, padding some tools append after
        # the frame sequence) end the decode instead of quarantining
        # an otherwise-complete file. Before that point, a broken
        # sync is still a hard error — the sample count contract
        # would be violated.
        if total and len(channels[0]) >= total:
            if pos + 2 > len(content):
                break
            if _Bits(content, pos).read(14) != 0x3FFE:
                break
        bits = _Bits(content, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"FLAC frame sync lost at byte {frame_at}")
        if bits.read(1):
            raise ValueError("FLAC frame reserved bit set")
        bits.read(1)  # blocking strategy (informational)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        sz_code = bits.read(3)
        if bits.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("FLAC block size code 0 reserved")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            pass
        elif sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC sample rate code 15 invalid")
        bps = bps_si if sz_code == 0 else _SAMPLE_SIZES.get(sz_code)
        if bps is None:
            raise ValueError(f"FLAC sample size code {sz_code} reserved")
        hdr_end = bits.byte_pos()
        if _crc8(content[frame_at:hdr_end]) != bits.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            sub = [_read_subframe(bits, blocksize, bps)
                   for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("FLAC stereo decorrelation needs 2 channels")
            side0 = ch_code == 9  # right/side stores side first
            bps0 = bps + (1 if side0 else 0)
            bps1 = bps + (0 if side0 else 1)
            a = _read_subframe(bits, blocksize, bps0)
            b = _read_subframe(bits, blocksize, bps1)
            if ch_code == 8:  # left/side
                sub = [a, [left - s for left, s in zip(a, b)]]
            elif ch_code == 9:  # side/right
                sub = [[r + s for s, r in zip(a, b)], b]
            else:  # mid/side
                sub = [[], []]
                for m, s in zip(a, b):
                    m2 = (m << 1) | (s & 1)
                    sub[0].append((m2 + s) >> 1)
                    sub[1].append((m2 - s) >> 1)
        else:
            raise ValueError(f"FLAC channel assignment {ch_code} reserved")

        bits.align()
        crc_at = bits.byte_pos()
        if crc_at + 2 > len(content):
            raise ValueError("FLAC frame CRC-16 truncated")
        want = int.from_bytes(content[crc_at : crc_at + 2], "big")
        if _crc16(content[frame_at:crc_at]) != want:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = crc_at + 2
        for ch, s in zip(channels, sub):
            ch.extend(s)
    if total and any(len(c) != total for c in channels):
        raise ValueError(
            f"FLAC decoded {len(channels[0])} samples, STREAMINFO "
            f"declares {total}"
        )
    meta = {"sample_rate": sr, "channels": n_ch, "bits_per_sample": bps_si,
            "total_samples": len(channels[0]) if channels else 0}
    return meta, channels


def decode_samples(content: bytes) -> list[int]:
    """16-bit mono PCM as Python ints — the FLAC twin of
    :func:`multimodal.decode_wav_samples` (same contract, for the
    audio-fingerprint operators)."""
    meta, channels = decode_pcm(content)
    if meta["channels"] != 1 or meta["bits_per_sample"] != 16:
        raise ValueError("only 16-bit mono PCM supported here")
    return channels[0]


# ---------------------------------------------------------------------------
# Encoder — deterministic fixture/synthesis path.
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)


def _utf8_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.put(v, 8)
        return
    payload = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    for _ in range(nbytes - 1):
        payload.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | v
    w.put(lead, 8)
    for b in reversed(payload):
        w.put(b, 8)


def _rice_cost(res: list[int], param: int) -> int:
    cost = 0
    for r in res:
        u = (-r << 1) - 1 if r < 0 else r << 1
        cost += (u >> param) + 1 + param
    return cost


def _write_rice(w: _BitWriter, res: list[int], param: int) -> None:
    for r in res:
        u = (-r << 1) - 1 if r < 0 else r << 1
        q = u >> param
        if q > 1 << 20:
            raise ValueError("residual too large for chosen Rice parameter")
        w.put(0, q)
        w.put(1, 1)
        w.put(u & ((1 << param) - 1), param)


def _fixed_residual(s: list[int], order: int) -> list[int]:
    coef = _FIXED_COEF[order]
    return [s[k] - sum(c * s[k - 1 - j] for j, c in enumerate(coef))
            for k in range(order, len(s))]


def encode_flac(
    samples: list[int], sample_rate: int = 8000, block_size: int = 256
) -> bytes:
    """Encode 16-bit mono PCM as a REAL FLAC stream: per block the
    cheapest of CONSTANT / FIXED order 0-2 (single Rice partition,
    searched parameter) / VERBATIM. Deterministic; decodes bit-exactly
    with :func:`decode_pcm`."""
    if not 16 <= block_size <= 65535:
        raise ValueError("block size out of range")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError("sample out of 16-bit range")
    total = len(samples)

    info = bytearray(34)
    struct.pack_into(">HH", info, 0, block_size, block_size)
    # 24-bit min/max frame size: 0 = unknown
    info[10] = (sample_rate >> 12) & 0xFF
    info[11] = (sample_rate >> 4) & 0xFF
    info[12] = ((sample_rate & 0xF) << 4) | ((1 - 1) << 1) | ((16 - 1) >> 4)
    info[13] = (((16 - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    info[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    out = bytearray(b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big")
                    + info)

    for fi in range(0, max(total, 1), block_size):
        block = samples[fi : fi + block_size]
        if not block:
            break
        bs = len(block)
        w = _BitWriter()
        w.put(0x3FFE, 14)
        w.put(0, 1)  # reserved
        w.put(0, 1)  # fixed block size strategy
        w.put(6 if bs <= 256 else 7, 4)  # 8/16-bit explicit block size
        w.put(0, 4)  # sample rate from STREAMINFO
        w.put(0, 4)  # 1 channel, independent
        w.put(4, 3)  # 16-bit samples
        w.put(0, 1)  # reserved
        _utf8_number(w, fi // block_size)
        w.put(bs - 1, 8 if bs <= 256 else 16)
        w.align()
        w.out.append(_crc8(bytes(w.out)))

        if all(s == block[0] for s in block):
            w.put(0, 1)
            w.put(0, 6)  # CONSTANT
            w.put(0, 1)
            w.put(block[0], 16)
        else:
            best = None  # (cost, order, param, residual)
            for order in (0, 1, 2):
                if order >= bs:
                    break
                res = _fixed_residual(block, order)
                for param in range(15):
                    c = 16 * order + _rice_cost(res, param)
                    if best is None or c < best[0]:
                        best = (c, order, param, res)
            cost, order, param, res = best
            if cost > 16 * bs:  # VERBATIM is cheaper
                w.put(0, 1)
                w.put(1, 6)
                w.put(0, 1)
                for s in block:
                    w.put(s, 16)
            else:
                w.put(0, 1)
                w.put(8 | order, 6)  # FIXED
                w.put(0, 1)  # no wasted bits
                for s in block[:order]:
                    w.put(s, 16)
                w.put(0, 2)  # Rice method 0
                w.put(0, 4)  # partition order 0
                w.put(param, 4)
                _write_rice(w, res, param)
        w.align()
        w.out += _crc16(bytes(w.out)).to_bytes(2, "big")
        out += w.out
    return bytes(out)
