"""BLAKE2b-256 transcript compression on device (JAX, u32-pair words).

The Fiat-Shamir transcript (transcripts/blake2b.py, mirroring reference
joltworks/src/transcripts/blake2b.rs) hashes fixed-size single-block
messages: every absorb is BLAKE2b-256(state[32] || zeros[28] ||
n_rounds_be[4] || payload[32]) = 96 bytes, every squeeze hashes just the
64-byte prefix. Both fit in one BLAKE2b block, so the whole transcript
step is a single compression call — cheap enough to run *inside* the
per-round device graph, which is what lets a whole batched sumcheck run
as one asynchronous dispatch chain with no host round-trips (the tunnel
to the device charges ~0.6 s per device->host fetch; see tpu/reduction.py).

Words are (lo, hi) uint32 pairs (TPU-native; no 64-bit lowering needed).
Bit-exactness vs hashlib.blake2b is covered by tests/test_tpu_kernels.py.
"""

from __future__ import annotations

import numpy as np

IV = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B,
    0x3C6EF372FE94F82B, 0xA54FF53A5F1D36F1,
    0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
]

# h0 ^= 0x01010000 ^ digest_size for keyless BLAKE2b-256
_H0 = [iv for iv in IV]
_H0[0] ^= 0x01010020

H0_U32 = np.array(
    [w for x in _H0 for w in (x & 0xFFFFFFFF, x >> 32)], dtype=np.uint32
)
IV_U32 = np.array(
    [w for x in IV for w in (x & 0xFFFFFFFF, x >> 32)], dtype=np.uint32
)


def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(lo.dtype)
    return (lo, a[1] + b[1] + carry)


def _xor64(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _rotr64(a, n):
    lo, hi = a
    if n == 32:
        return (hi, lo)
    if n < 32:
        return ((lo >> n) | (hi << (32 - n)), (hi >> n) | (lo << (32 - n)))
    n -= 32  # rotr by 32 then by n
    return ((hi >> n) | (lo << (32 - n)), (lo >> n) | (hi << (32 - n)))


def compress(h, m, t: int, final: bool = True):
    """One BLAKE2b compression.

    h: list of 8 (lo, hi) u32 pairs; m: list of 16 pairs; t: static byte
    count. `final` sets the last-block flag (multi-block messages pass
    False for all but the last). Returns the new h as 8 pairs. Pure jnp
    ops — call inside jit.
    """
    import jax.numpy as jnp

    v = list(h) + [
        (jnp.uint32(IV_U32[2 * i]), jnp.uint32(IV_U32[2 * i + 1]))
        for i in range(8)
    ]
    v[12] = _xor64(v[12], (jnp.uint32(t & 0xFFFFFFFF), jnp.uint32(t >> 32)))
    if final:
        # final-block flag: v14 ^= ~0
        v[14] = (~v[14][0], ~v[14][1])

    def G(a, b, c, d, x, y):
        a = _add64(_add64(a, b), x)
        d = _rotr64(_xor64(d, a), 32)
        c = _add64(c, d)
        b = _rotr64(_xor64(b, c), 24)
        a = _add64(_add64(a, b), y)
        d = _rotr64(_xor64(d, a), 16)
        c = _add64(c, d)
        b = _rotr64(_xor64(b, c), 63)
        return a, b, c, d

    for r in range(12):
        s = SIGMA[r]
        v[0], v[4], v[8], v[12] = G(v[0], v[4], v[8], v[12], m[s[0]], m[s[1]])
        v[1], v[5], v[9], v[13] = G(v[1], v[5], v[9], v[13], m[s[2]], m[s[3]])
        v[2], v[6], v[10], v[14] = G(v[2], v[6], v[10], v[14], m[s[4]], m[s[5]])
        v[3], v[7], v[11], v[15] = G(v[3], v[7], v[11], v[15], m[s[6]], m[s[7]])
        v[0], v[5], v[10], v[15] = G(v[0], v[5], v[10], v[15], m[s[8]], m[s[9]])
        v[1], v[6], v[11], v[12] = G(v[1], v[6], v[11], v[12], m[s[10]], m[s[11]])
        v[2], v[7], v[8], v[13] = G(v[2], v[7], v[8], v[13], m[s[12]], m[s[13]])
        v[3], v[4], v[9], v[14] = G(v[3], v[4], v[9], v[14], m[s[14]], m[s[15]])

    return [_xor64(_xor64(h[i], v[i]), v[i + 8]) for i in range(8)]


def bswap32(x):
    return (
        ((x & 0xFF) << 24)
        | ((x & 0xFF00) << 8)
        | ((x >> 8) & 0xFF00)
        | (x >> 24)
    )


def transcript_absorb(state, n_rounds, payload):
    """One transcript absorb: BLAKE2b-256(state || 28*0 || n_rounds_be ||
    payload[32]) -> new 32-byte state (as 4 (lo,hi) pairs).

    state: list of 4 (lo,hi) u32 pairs (little-endian byte order, i.e.
    state[0][0] holds state bytes 0-3). n_rounds: u32 scalar array.
    payload: list of 4 (lo,hi) pairs = payload bytes 0..31 LE-word order.
    """
    import jax.numpy as jnp

    zero = jnp.uint32(0)
    m = list(state)
    m += [(zero, zero)] * 3                      # bytes 32..55
    m += [(zero, bswap32(n_rounds))]             # bytes 56..63 (BE counter)
    m += list(payload)                           # bytes 64..95
    m += [(zero, zero)] * 4                      # zero pad to 128
    h = [
        (jnp.uint32(H0_U32[2 * i]), jnp.uint32(H0_U32[2 * i + 1]))
        for i in range(8)
    ]
    out = compress(h, m, 96)
    return out[:4]


def transcript_absorb_long(state, n_rounds, payload):
    """Absorb a payload longer than one block's tail: BLAKE2b-256(state ||
    28*0 || n_rounds_be || payload bytes). payload: list of (lo, hi) u32
    pairs (8 bytes each). Used for the batched UniPoly absorb (8-byte
    framing + all coefficients in ONE transcript update,
    poly/unipoly.py append_to_transcript)."""
    import jax.numpy as jnp

    zero = jnp.uint32(0)
    total = 64 + 8 * len(payload)
    m = list(state)
    m += [(zero, zero)] * 3
    m += [(zero, bswap32(n_rounds))]
    m += list(payload)
    h = [
        (jnp.uint32(H0_U32[2 * i]), jnp.uint32(H0_U32[2 * i + 1]))
        for i in range(8)
    ]
    consumed = 0
    while len(m) > 16:
        consumed += 128  # t = cumulative bytes after this block
        h = compress(h, m[:16], consumed, final=False)
        m = m[16:]
    pad = [(zero, zero)] * (16 - len(m))
    out = compress(h, m + pad, total)
    return out[:4]


def transcript_squeeze(state, n_rounds):
    """One squeeze: BLAKE2b-256(state || pad || n_rounds_be) (64 bytes).
    Returns the full 32-byte digest as 4 pairs (new state AND random)."""
    import jax.numpy as jnp

    zero = jnp.uint32(0)
    m = list(state)
    m += [(zero, zero)] * 3
    m += [(zero, bswap32(n_rounds))]
    m += [(zero, zero)] * 8
    h = [
        (jnp.uint32(H0_U32[2 * i]), jnp.uint32(H0_U32[2 * i + 1]))
        for i in range(8)
    ]
    out = compress(h, m, 64)
    return out[:4]


def state_to_pairs(state_bytes: bytes):
    """Host 32-byte state -> numpy (8,) u32 in (lo,hi)-interleaved order."""
    w = np.frombuffer(state_bytes, dtype="<u4")
    return w.copy()  # w[2i], w[2i+1] are the (lo, hi) of word i


def pairs_to_state(arr) -> bytes:
    a = np.asarray(arr, dtype=np.uint32)
    return a.astype("<u4").tobytes()
