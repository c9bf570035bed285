"""Minimal pure-Python AES (FIPS-197) — CBC mode only, as needed by
the PDF standard security handler's AESV2/AESV3 crypt filters
(PDF 32000-1 §7.6.2-7.6.3) and the R6 password KDF (Algorithm 2.B).

Tables are generated from the GF(2^8) arithmetic in the spec rather
than transcribed, so a typo can't silently corrupt a single S-box
entry. This is a correctness-first implementation for document
decryption (KB-scale payloads) — not a performance-sensitive path.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# GF(2^8) arithmetic and generated tables
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverses via exp/log tables over generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    exp[255] = exp[0]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = bytearray(256)
    for a in range(256):
        b = inv(a)
        r = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            r ^= b
        sbox[a] = r ^ 0x63
    inv_sbox = bytearray(256)
    for a, v in enumerate(sbox):
        inv_sbox[v] = a
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
while len(_RCON) < 15:
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # round keys as 16-byte flat lists, column-major state order
    return [
        [b for w in words[4 * r : 4 * r + 4] for b in w]
        for r in range(nr + 1)
    ]


def _shift_rows(s: list[int], inverse: bool) -> list[int]:
    out = [0] * 16
    for c in range(4):
        for r in range(4):
            src_c = (c + r) % 4 if not inverse else (c - r) % 4
            out[4 * c + r] = s[4 * src_c + r]
    return out


def _mix_columns(s: list[int], inverse: bool) -> list[int]:
    m = (
        (0x0E, 0x0B, 0x0D, 0x09) if inverse else (0x02, 0x03, 0x01, 0x01)
    )
    out = [0] * 16
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            out[4 * c + r] = (
                _gmul(col[0], m[(0 - r) % 4])
                ^ _gmul(col[1], m[(1 - r) % 4])
                ^ _gmul(col[2], m[(2 - r) % 4])
                ^ _gmul(col[3], m[(3 - r) % 4])
            )
    return out


def _encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, len(rk) - 1):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s, False)
        s = _mix_columns(s, False)
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s, False)
    return bytes(b ^ k for b, k in zip(s, rk[-1]))


def _decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[-1])]
    s = _shift_rows(s, True)
    s = [_INV_SBOX[b] for b in s]
    for rnd in range(len(rk) - 2, 0, -1):
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        s = _mix_columns(s, True)
        s = _shift_rows(s, True)
        s = [_INV_SBOX[b] for b in s]
    return bytes(b ^ k for b, k in zip(s, rk[0]))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt; ``data`` must already be block-aligned (the PDF
    callers pad per RFC 2898 themselves)."""
    if len(data) % 16:
        raise ValueError("AES-CBC input not block-aligned")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(rk, block)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("AES-CBC ciphertext not block-aligned")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        ct = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, ct), prev))
        prev = ct
    return bytes(out)
