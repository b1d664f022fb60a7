"""Minimal perfect hash function, TPU-evaluable.

Functional equivalent of the reference's PTHash layer (reference:
include/hash_util.hpp:39-45, external/pthash) but designed for branch-free
batched evaluation on TPU with 32-bit integer ops only:

    h          = splitmix64(key ^ splitmix64(seed))            (64-bit)
    bucket     = mulhi32(hi32(h), num_buckets)                 (fair map, no mod)
    pilot      = pilots[bucket]                                (1 gather)
    slot       = mulhi32(fmix32(lo32(h) ^ fmix32(pilot)), table_size)
    position   = slot if slot < n else remap[slot - n]         (<=1 gather)

Construction is the classic pilot search (sort buckets by size descending,
find the smallest pilot mapping every key of the bucket to distinct free
slots). Evaluation cost: ~2 gathers + a handful of VPU integer ops, fully
vectorizable. `remap` is stored dense (one uint32 per slot in [n, table_size))
— ~2 bits/key at alpha=0.94; the compact on-disk form can narrow this later.

Multi-word keys (kmers) hash through hashing.hash64_words.
"""

import numpy as np

from . import hashing as H
from .constants import ALPHA, LAMBDA

U64 = np.uint64
U32 = np.uint32

_MAX_PILOT = 1 << 22
_PILOT_BATCH = 64


class MPHFBuildError(RuntimeError):
    pass


class MPHF:
    """num_keys == 0 is allowed (empty function)."""

    __slots__ = ("n", "table_size", "num_buckets", "seed", "pilots", "remap")

    def __init__(self, n, table_size, num_buckets, seed, pilots, remap):
        self.n = int(n)
        self.table_size = int(table_size)
        self.num_buckets = int(num_buckets)
        self.seed = int(seed)
        self.pilots = pilots
        self.remap = remap

    # ---------------------------------------------------------- evaluation

    def _hash(self, keys):
        return H.hash64_u64(keys, U64(self.seed))

    def eval_hashes(self, h):
        hi = (h >> U64(32)).astype(U32)
        lo = (h & U64(0xFFFFFFFF)).astype(U32)
        bucket = H.mulhi32(hi, U32(self.num_buckets))
        pilot = np.take(self.pilots, bucket)
        slot = H.mulhi32(H.fmix32(lo ^ H.fmix32(pilot)), U32(self.table_size)).astype(np.int64)
        if self.table_size > self.n:
            over = slot >= self.n
            slot = np.where(over, np.take(self.remap, np.where(over, slot - self.n, 0)).astype(np.int64), slot)
        return slot

    def __call__(self, keys):
        """uint64 scalar keys -> positions in [0, n)."""
        return self.eval_hashes(self._hash(np.asarray(keys, dtype=U64)))

    def eval_words(self, words):
        """(N, W) uint32 multi-word keys -> positions in [0, n)."""
        return self.eval_hashes(H.hash64_words(words, U64(self.seed)))

    # ---------------------------------------------------------- num_bits (space accounting)

    def num_bits(self):
        return 8 * (self.pilots.nbytes + self.remap.nbytes) + 5 * 64

    # ---------------------------------------------------------- construction

    @classmethod
    def build_from_hashes(cls, make_hashes, n, seed0, lmbda=LAMBDA, alpha=ALPHA):
        """make_hashes(seed) -> uint64[n] of key hashes under that seed."""
        if n == 0:
            return cls(0, 0, 1, seed0, np.zeros(1, dtype=U32), np.zeros(0, dtype=U32))
        for attempt in range(64):
            seed = int(H.splitmix64(U64(seed0) + U64(attempt * 0x9E3779B9)))
            h = make_hashes(U64(seed))
            try:
                return cls._search(h, n, seed, lmbda, alpha)
            except MPHFBuildError:
                continue
        raise MPHFBuildError(f"MPHF build failed after 64 seeds for n={n}")

    @classmethod
    def build_u64(cls, keys, seed, lmbda=LAMBDA, alpha=ALPHA):
        keys = np.asarray(keys, dtype=U64)
        return cls.build_from_hashes(lambda s: H.hash64_u64(keys, s), len(keys), seed, lmbda, alpha)

    @classmethod
    def build_words(cls, words, seed, lmbda=LAMBDA, alpha=ALPHA):
        words = np.asarray(words, dtype=U32)
        return cls.build_from_hashes(
            lambda s: H.hash64_words(words, s), len(words), seed, lmbda, alpha
        )

    @classmethod
    def _search(cls, h, n, seed, lmbda, alpha):
        table_size = max(n, int(np.ceil(n / alpha)))
        if table_size % 2 == 0:
            table_size += 1
        num_buckets = max(1, int(np.ceil(n / lmbda)))

        hi = (h >> U64(32)).astype(U32)
        lo = (h & U64(0xFFFFFFFF)).astype(U32)
        bucket = H.mulhi32(hi, U32(num_buckets)).astype(np.int64)

        # group keys by bucket, order buckets by size descending
        order = np.argsort(bucket, kind="stable")
        bsorted = bucket[order]
        lo_sorted = lo[order]
        ub, starts, counts = np.unique(bsorted, return_index=True, return_counts=True)
        bucket_order = np.argsort(-counts, kind="stable")

        from . import native

        if native.available():
            out = native.pilot_search(lo_sorted, starts, counts, bucket_order,
                                      ub, table_size, _MAX_PILOT, num_buckets)
            if out is None:
                raise MPHFBuildError("native pilot search failed (re-seed)")
            pilots, taken = out
            return cls._finish(n, table_size, num_buckets, seed, pilots, taken)

        taken = np.zeros(table_size, dtype=bool)
        pilots = np.zeros(num_buckets, dtype=U32)
        ts32 = U32(table_size)

        pilot_batch = H.fmix32(np.arange(_PILOT_BATCH, dtype=U32))

        for bi in bucket_order:
            s, c = starts[bi], counts[bi]
            blo = lo_sorted[s : s + c]
            if c > 1 and len(np.unique(blo)) != c:
                raise MPHFBuildError("in-bucket hash collision")
            placed = False
            for p0 in range(0, _MAX_PILOT, _PILOT_BATCH):
                if p0 == 0:
                    fm = pilot_batch
                else:
                    fm = H.fmix32(np.arange(p0, p0 + _PILOT_BATCH, dtype=U32))
                slots = H.mulhi32(H.fmix32(blo[None, :] ^ fm[:, None]), ts32).astype(np.int64)
                free = ~taken[slots]
                ok = free.all(axis=1)
                if c > 1:
                    ss = np.sort(slots, axis=1)
                    ok &= (ss[:, 1:] != ss[:, :-1]).all(axis=1)
                hit = np.flatnonzero(ok)
                if hit.size:
                    r = hit[0]
                    pilots[ub[bi]] = U32(p0 + r)
                    taken[slots[r]] = True
                    placed = True
                    break
            if not placed:
                raise MPHFBuildError("pilot search exhausted")

        return cls._finish(n, table_size, num_buckets, seed, pilots, taken)

    @classmethod
    def _finish(cls, n, table_size, num_buckets, seed, pilots, taken):
        # minimal remap: taken slots >= n  ->  free slots < n
        if table_size > n:
            free_lt = np.flatnonzero(~taken[:n])
            taken_ge = np.flatnonzero(taken[n:])
            assert len(free_lt) == len(taken_ge)
            remap = np.zeros(table_size - n, dtype=U32)
            remap[taken_ge] = free_lt.astype(U32)
        else:
            remap = np.zeros(0, dtype=U32)

        return cls(n, table_size, num_buckets, seed, pilots, remap)
