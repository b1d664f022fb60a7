"""64-bit integer arithmetic on TPU as (hi, lo) uint32 pairs.

TPUs have no native 64-bit integer path worth using; every 64-bit quantity in
the device engine (m-mer values, mixer hashes, MPHF key hashes) is a pair of
uint32 arrays. These helpers mirror sshash_tpu.hashing bit-for-bit (the host
builder and the device query MUST agree on every hash).

All functions are shape-polymorphic and jit-friendly (constant shifts only).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

MIXER_MULT = (0x517CC1B7, 0x27220A95)  # hashing.MIXER_MULT as (hi, lo)
_SPLIT_C1 = (0xBF58476D, 0x1CE4E5B9)
_SPLIT_C2 = (0x94D049BB, 0x133111EB)
_GOLDEN = (0x9E3779B9, 0x7F4A7C15)


class u64(NamedTuple):
    """A 64-bit value as two uint32 arrays. Use equal()/less() helpers for
    comparisons (NamedTuple equality must stay structural for jax)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def const64(v):
    """Python int -> u64 of scalar uint32 constants."""
    v = int(v) & 0xFFFFFFFFFFFFFFFF
    return u64(jnp.asarray(v >> 32, dtype=U32), jnp.asarray(v & 0xFFFFFFFF, dtype=U32))


def from_u32(x):
    x = jnp.asarray(x, dtype=U32)
    return u64(jnp.zeros_like(x), x)


def to_np(x):
    return (np.asarray(x.hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(x.lo, dtype=np.uint64)


def xor(a, b):
    return u64(a.hi ^ b.hi, a.lo ^ b.lo)


def and_(a, b):
    return u64(a.hi & b.hi, a.lo & b.lo)


def or_(a, b):
    return u64(a.hi | b.hi, a.lo | b.lo)


def add(a, b):
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(U32)
    return u64(a.hi + b.hi + carry, lo)


def shr(a, s):
    """Right shift by a CONSTANT s in [0, 64)."""
    s = int(s)
    if s == 0:
        return a
    if s < 32:
        return u64(a.hi >> s, (a.lo >> s) | (a.hi << (32 - s)))
    return u64(jnp.zeros_like(a.hi), a.hi >> (s - 32) if s > 32 else a.hi)


def shl(a, s):
    s = int(s)
    if s == 0:
        return a
    if s < 32:
        return u64((a.hi << s) | (a.lo >> (32 - s)), a.lo << s)
    return u64(a.lo << (s - 32) if s > 32 else a.lo, jnp.zeros_like(a.lo))


def less(a, b):
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def less_eq(a, b):
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo <= b.lo))


def equal(a, b):
    return (a.hi == b.hi) & (a.lo == b.lo)


def select(pred, a, b):
    return u64(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def mulhi32(a, b):
    """High 32 bits of the 32x32->64 product, via 16-bit limbs."""
    a = jnp.asarray(a, dtype=U32)
    b = jnp.asarray(b, dtype=U32)
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    lo_prod = a0 * b0
    mid1 = a1 * b0
    mid2 = a0 * b1
    carry = ((lo_prod >> 16) + (mid1 & 0xFFFF) + (mid2 & 0xFFFF)) >> 16
    return a1 * b1 + (mid1 >> 16) + (mid2 >> 16) + carry


def mul(a, b):
    """(a * b) mod 2**64."""
    lo = a.lo * b.lo
    hi = mulhi32(a.lo, b.lo) + a.lo * b.hi + a.hi * b.lo
    return u64(hi, lo)


def mul_const(a, c_hi_lo):
    ch, cl = c_hi_lo
    ch = jnp.asarray(ch, dtype=U32)
    cl = jnp.asarray(cl, dtype=U32)
    lo = a.lo * cl
    hi = mulhi32(a.lo, cl) + a.lo * ch + a.hi * cl
    return u64(hi, lo)


# --------------------------------------------------------------------- hashes


def splitmix64(x):
    """Matches hashing.splitmix64 exactly."""
    x = add(x, const64(0x9E3779B97F4A7C15))
    x = mul_const(xor(x, shr(x, 30)), _SPLIT_C1)
    x = mul_const(xor(x, shr(x, 27)), _SPLIT_C2)
    return xor(x, shr(x, 31))


def mixer64(x, magic):
    """Matches hashing.mixer64: (x * C) ^ magic. magic: u64 (broadcastable)."""
    return xor(mul_const(x, MIXER_MULT), magic)


def fmix32(x):
    x = jnp.asarray(x, dtype=U32)
    x ^= x >> 16
    x *= U32(0x85EBCA6B)
    x ^= x >> 13
    x *= U32(0xC2B2AE35)
    x ^= x >> 16
    return x


def hash64_u64(key, seed_mix):
    """Matches hashing.hash64_u64 given seed_mix = splitmix64(seed)."""
    return splitmix64(xor(key, seed_mix))


def hash64_words(words, seed_mix, golden_i):
    """Matches hashing.hash64_words. words: (..., W) uint32;
    seed_mix: u64 of splitmix64(seed) scalars; golden_i: list of W
    precomputed (i * GOLDEN mod 2**64) python ints."""
    W = words.shape[-1]
    h = u64(jnp.broadcast_to(seed_mix.hi, words.shape[:-1]),
            jnp.broadcast_to(seed_mix.lo, words.shape[:-1]))
    for i in range(W):
        wi = add(from_u32(words[..., i]), const64(golden_i[i]))
        h = splitmix64(xor(h, wi))
    return h
