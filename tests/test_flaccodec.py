"""FLAC codec: encoder→decoder round-trips, hand-built frames for the
decoder-only paths (LPC, stereo decorrelation, Rice escape, wasted
bits, Rice2), CRC quarantines, and the audio-fingerprint dispatch."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_etl_engine_spark.functions import flaccodec as FL


def test_roundtrip_shapes():
    rng = np.random.default_rng(9)
    cases = [
        rng.integers(-32768, 32768, 1000).tolist(),  # noise -> verbatim
        [int(100 * i / 7) - 500 for i in range(777)],  # ramp -> fixed
        [int(3000 * np.sin(i / 10)) for i in range(2050)],
        [1234] * 300,  # constant subframes
        [5], [],
    ]
    for s in cases:
        data = FL.encode_flac(s, block_size=256)
        meta, ch = FL.decode_pcm(data)
        assert meta["channels"] == 1 and meta["bits_per_sample"] == 16
        assert meta["total_samples"] == len(s)
        assert ch[0] == s


@settings(max_examples=25, deadline=None)
@given(n=st.integers(0, 700), seed=st.integers(0, 2**31),
       spread=st.sampled_from([3, 300, 30000]),
       bs=st.sampled_from([16, 192, 256]))
def test_property_roundtrip(n, seed, spread, bs):
    rng = np.random.default_rng(seed)
    s = rng.integers(-spread, spread + 1, n).tolist()
    assert FL.decode_pcm(FL.encode_flac(s, block_size=bs))[1][0] == s


def test_crc_quarantines():
    s = [int(3000 * np.sin(i / 10)) for i in range(600)]
    good = FL.encode_flac(s, block_size=256)
    b = bytearray(good)
    b[-5] ^= 0x40  # inside last frame's data
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_pcm(bytes(b))
    with pytest.raises(ValueError, match="truncated|sync|CRC"):
        FL.decode_pcm(good[: len(good) - 3])
    with pytest.raises(ValueError, match="fLaC"):
        FL.decode_pcm(b"RIFFxxxxWAVE")
    # declared total != decoded total
    b2 = bytearray(good)
    b2[8 + 17] ^= 0x01  # low byte of STREAMINFO total-samples (info[17])
    with pytest.raises(ValueError, match="STREAMINFO declares"):
        FL.decode_pcm(bytes(b2))


# ---------------------------------------------------------------------------
# Hand-built frames: paths the fixture encoder never emits.
# ---------------------------------------------------------------------------

def _stream(frames: bytes, channels: int, total: int,
            bps: int = 16) -> bytes:
    import struct

    info = bytearray(34)
    struct.pack_into(">HH", info, 0, 16, 65535)
    sr = 8000
    info[10] = (sr >> 12) & 0xFF
    info[11] = (sr >> 4) & 0xFF
    info[12] = ((sr & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4)
    info[13] = (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    info[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    return (b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
            + frames)


def _frame(subframes_cb, blocksize: int, ch_code: int) -> bytes:
    w = FL._BitWriter()
    w.put(0x3FFE, 14)
    w.put(0, 2)
    w.put(7, 4)          # explicit 16-bit block size
    w.put(0, 4)          # rate from STREAMINFO
    w.put(ch_code, 4)
    w.put(4, 3)          # 16-bit
    w.put(0, 1)
    w.put(0, 8)          # frame number 0
    w.put(blocksize - 1, 16)
    w.align()
    w.out.append(FL._crc8(bytes(w.out)))
    subframes_cb(w)
    w.align()
    w.out += FL._crc16(bytes(w.out)).to_bytes(2, "big")
    return bytes(w.out)


def _verbatim(w, samples, bps):
    w.put(0, 1)
    w.put(1, 6)
    w.put(0, 1)
    for s in samples:
        w.put(s, bps)


def test_lpc_subframe_decodes():
    # s[i] = ((3*s[i-1] - s[i-2]) >> 1) + residual, warmup [100, 120]
    order, shift, coef = 2, 1, [3, -1]
    warm = [100, 120]
    res = [5, -3, 0, 7, -2, 1]
    expect = list(warm)
    for r in res:
        pred = coef[0] * expect[-1] + coef[1] * expect[-2]
        expect.append((pred >> shift) + r)

    def sub(w):
        w.put(0, 1)
        w.put(32 | (order - 1), 6)  # LPC, order 2
        w.put(0, 1)                 # no wasted bits
        for s in warm:
            w.put(s, 16)
        w.put(4 - 1, 4)             # coefficient precision 4 bits
        w.put(shift, 5)
        for c in coef:
            w.put(c, 4)
        w.put(0, 2)                 # Rice method 0
        w.put(0, 4)                 # one partition
        w.put(2, 4)                 # rice param
        FL._write_rice(w, res, 2)

    data = _stream(_frame(sub, len(expect), 0), 1, len(expect))
    meta, ch = FL.decode_pcm(data)
    assert ch[0] == expect


def test_stereo_decorrelation_all_three():
    left = [100, 220, -50, 7, 0, -32768, 32767, 14]
    right = [90, 200, -60, 7, 12, -32768, 32767, -14]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    n = len(left)

    def ls(w):  # left/side: ch1 (side) gets bps+1
        _verbatim(w, left, 16)
        _verbatim(w, side, 17)

    def rs(w):  # side/right: ch0 (side) gets bps+1
        _verbatim(w, side, 17)
        _verbatim(w, right, 16)

    def ms(w):  # mid/side: ch1 (side) gets bps+1
        _verbatim(w, mid, 16)
        _verbatim(w, side, 17)

    for code, cb in ((8, ls), (9, rs), (10, ms)):
        data = _stream(_frame(cb, n, code), 2, n)
        _meta, ch = FL.decode_pcm(data)
        assert ch[0] == left and ch[1] == right, f"assignment {code}"


def test_rice_escape_rice2_and_wasted_bits():
    vals = [-1024, 512, 0, 768, -256, 256, -512, 1024]

    def esc(w):  # verbatim-coded residual partition via the escape
        w.put(0, 1)
        w.put(8, 6)  # FIXED order 0
        w.put(0, 1)
        w.put(1, 2)  # Rice2 (5-bit params)
        w.put(0, 4)
        w.put(31, 5)  # escape
        w.put(12, 5)  # raw 12-bit residuals
        for v in vals:
            w.put(v, 12)

    data = _stream(_frame(esc, len(vals), 0), 1, len(vals))
    assert FL.decode_pcm(data)[1][0] == vals

    def wasted(w):  # constant 6 stored as 3 with 1 wasted bit
        w.put(0, 1)
        w.put(0, 6)
        w.put(1, 1)  # wasted-bits flag
        w.put(1, 1)  # unary 0 -> wasted = 1
        w.put(3, 15)  # constant, bps 16-1

    data = _stream(_frame(wasted, 4, 0), 1, 4)
    assert FL.decode_pcm(data)[1][0] == [6, 6, 6, 6]


def test_reserved_codes_quarantine():
    def bad_sub(w):
        w.put(0, 1)
        w.put(2, 6)  # reserved subframe type
        w.put(0, 1)

    with pytest.raises(ValueError, match="reserved"):
        FL.decode_pcm(_stream(_frame(bad_sub, 4, 0), 1, 4))


def test_audio_fingerprint_dispatch_wav_and_flac():
    """decode_audio_samples feeds the x43 fingerprint from either
    container; identical PCM -> identical fingerprint."""
    import struct

    from pdf_etl_engine_spark.sources import multimodal as M

    samples = [((2 * 41 + 13) * i) % 4096 for i in range(64)]
    data = struct.pack("<64h", *samples)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    flac = FL.encode_flac(samples, block_size=16)
    assert M.decode_audio_samples(wav) == samples
    assert M.decode_audio_samples(flac) == samples


def test_fuzz_decoder_only_valueerror_escapes():
    """Quarantine contract under mutation: byte flips, truncations,
    and splices of valid FLAC streams raise ValueError (or decode
    fine) — never IndexError/KeyError/struct.error/infinite types."""
    rng = np.random.default_rng(77)
    sigs = [
        (3000 * np.sin(np.arange(400) / 9)).astype(int).tolist(),
        rng.integers(-32768, 32768, 300).tolist(),
        [7] * 250,
    ]
    corpus = [FL.encode_flac(s, block_size=64) for s in sigs]
    for trial in range(400):
        base = bytearray(corpus[trial % len(corpus)])
        kind = trial % 4
        if kind == 0:  # single byte flip
            base[rng.integers(0, len(base))] ^= int(rng.integers(1, 256))
        elif kind == 1:  # truncate
            base = base[: rng.integers(4, len(base))]
        elif kind == 2:  # splice two streams
            other = corpus[(trial + 1) % len(corpus)]
            cut = rng.integers(4, min(len(base), len(other)))
            base = base[:cut] + other[cut:]
        else:  # multi-flip
            for _ in range(5):
                base[rng.integers(0, len(base))] ^= int(rng.integers(1, 256))
        try:
            FL.decode_pcm(bytes(base))
        except ValueError:
            pass  # the contract


def test_trailing_bytes_after_last_frame_tolerated():
    """ID3v1 tags / padding appended AFTER the final frame must not
    quarantine a complete stream: once STREAMINFO's total_samples has
    been delivered, non-sync trailing bytes end the decode. Before
    that point a broken sync is still a hard error."""
    s = [int(3000 * np.sin(i / 10)) for i in range(1000)]
    data = FL.encode_flac(s, block_size=256)
    id3v1 = b"TAG" + b"\x00" * 125  # classic 128-byte ID3v1 trailer
    for tail in (id3v1, b"\x00", b"APETAGEX" + b"\x00" * 24):
        meta, ch = FL.decode_pcm(data + tail)
        assert ch[0] == s
        assert meta["total_samples"] == len(s)
    # truncating the stream mid-frame still quarantines: the promised
    # sample count was not reached, so strictness is preserved
    with pytest.raises(ValueError):
        FL.decode_pcm(data[:-40] + id3v1)
