"""Streaming FASTA/FASTQ membership queries — batched, TPU-native.

The reference resolves reads sequentially with O(1) per-step state
(reference: include/streaming_query.hpp:56-109 — rolling kmer/RC, rolling
minimizers, extension cache, negative-minimizer cache). On TPU the
throughput axis is the batch, not per-step state: every position of every
read becomes one lane of a single batched lookup (the same fresh lookup the
reference asserts its fast path equals, streaming_query.hpp:107), and the
report counters are derived afterwards from result adjacency:

  * ``num_searches`` counts only POSITIVE non-extension lookups
    (streaming_query.hpp:182-188: a failed search increments num_negative
    and returns before ++m_num_searches);
  * an extension happens iff the previous position was found and the
    current result is the adjacent kmer in the same string in the previous
    orientation (streaming_query.hpp:86-100) — a property of the results,
    not of the cache;
  * the negative-minimizer cache only skips work; skipped positions are
    counted negative exactly like failed searches (streaming_query.hpp:
    150-157, 182-185).

Hence every counter of streaming_query_report (util.hpp:29-36) is a pure
function of the batched fresh-lookup results, and the derivation is
vectorized NumPy.

File drivers mirror src/query.cpp:9-116: 2-line FASTA, multiline FASTA
with k-1 overlap carry (equivalent to whole-record processing), 4-line
FASTQ, gz sniffed by extension.
"""

import gzip
import time

import numpy as np

from . import kmer as K
from . import oracle
from .constants import INVALID_UINT64

INVALID = np.uint64(INVALID_UINT64)


# --------------------------------------------------------------- file parsing


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def parse_reads(path, fmt=None, multiline=False):
    """Yield read sequences (bytes) from a FASTA/FASTQ file (optionally .gz).

    fmt: 'fasta' | 'fastq' | None (sniff by extension like tools/query.cpp).
    multiline FASTA concatenates sequence lines per record; the reference's
    k-1 overlap carry (src/query.cpp:28-37) makes its kmer stream identical
    to processing whole records.
    """
    name = str(path)
    if fmt is None:
        base = name[:-3] if name.endswith(".gz") else name
        if base.endswith((".fq", ".fastq")):
            fmt = "fastq"
        elif base.endswith((".fa", ".fasta")):
            fmt = "fasta"
        else:
            raise ValueError(f"cannot sniff format of {name}")

    with _open(path) as f:
        if fmt == "fastq":
            while True:
                header = f.readline()
                if not header:
                    break
                seq = f.readline().rstrip(b"\r\n")
                f.readline()  # '+'
                f.readline()  # scores
                yield seq
        elif multiline:
            seq = bytearray()
            for line in f:
                line = line.rstrip(b"\r\n")
                if line.startswith(b">"):
                    if seq:
                        yield bytes(seq)
                    seq = bytearray()
                else:
                    seq.extend(line)
            if seq:
                yield bytes(seq)
        else:  # 2-line fasta
            while True:
                header = f.readline()
                if not header:
                    break
                seq = f.readline().rstrip(b"\r\n")
                yield seq


# ------------------------------------------------------------- report derive


def derive_report(found, string_id, kmer_id, orientation, valid, first_pos):
    """streaming_query_report counters from per-position fresh results.

    first_pos: bool mask, True at each read's first kmer position (breaks
    extension chains across reads; reference reset(), src/query.cpp:58).
    """
    found = np.asarray(found, dtype=bool) & valid
    prev = np.roll(found, 1)
    prev[0] = False
    same_read = ~first_pos

    ext = (
        found
        & prev
        & same_read
        & (string_id == np.roll(string_id, 1))
        & (orientation == np.roll(orientation, 1))
        & (kmer_id.astype(np.int64) == np.roll(kmer_id.astype(np.int64), 1) + np.roll(orientation, 1))
    )
    num_kmers = int(len(found))
    num_positive = int(found.sum())
    num_extensions = int(ext.sum())
    num_invalid = int((~valid).sum())
    return {
        "num_kmers": num_kmers,
        "num_positive_kmers": num_positive,
        "num_negative_kmers": num_kmers - num_positive - num_invalid,
        "num_invalid_kmers": num_invalid,
        "num_searches": num_positive - num_extensions,
        "num_extensions": num_extensions,
    }


# ------------------------------------------------------------- batched query


class _Batcher:
    """Accumulates per-position packed kmers across reads, flushes through a
    lookup callable in fixed-size chunks, and folds counters."""

    def __init__(self, index, lookup_fn, k, chunk=1 << 18):
        self.index = index
        self.lookup_fn = lookup_fn
        self.k = k
        self.chunk = chunk
        self._kmers = []
        self._valid = []
        self._first = []
        self._pending = 0
        # adjacency state carried across chunk boundaries
        self._carry = None
        self.report = {
            "num_kmers": 0,
            "num_positive_kmers": 0,
            "num_negative_kmers": 0,
            "num_invalid_kmers": 0,
            "num_searches": 0,
            "num_extensions": 0,
        }

    def add_read(self, seq):
        k = self.k
        n = len(seq)
        if n < k:
            return
        codes, ok = K.encode_chars(seq)
        npos = n - k + 1
        okc = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(ok, out=okc[1:])
        valid = (okc[k:] - okc[:-k]) == k  # (npos,)
        words = K.pack_codes(np.where(ok, codes, 0), pad_words=K.num_words64(k) + 1)
        kmers = K.read_kmers_at(words, np.arange(npos), k)
        first = np.zeros(npos, dtype=bool)
        first[0] = True
        self._kmers.append(kmers)
        self._valid.append(valid)
        self._first.append(first)
        self._pending += npos
        if self._pending >= self.chunk:
            self.flush()

    def flush(self):
        if not self._pending:
            return
        kmers = np.concatenate(self._kmers)
        valid = np.concatenate(self._valid)
        first = np.concatenate(self._first)
        self._kmers, self._valid, self._first = [], [], []
        self._pending = 0

        res = self.lookup_fn(kmers, valid)
        found = (res["kmer_id"] != INVALID) & valid
        sid = np.asarray(res["string_id"], dtype=np.uint64)
        kid = np.asarray(res["kmer_id"], dtype=np.uint64)
        orient = np.asarray(res["kmer_orientation"], dtype=np.int64)

        # stitch adjacency across the previous chunk boundary
        if self._carry is not None and not first[0]:
            c_found, c_sid, c_kid, c_orient = self._carry
            if (
                c_found
                and found[0]
                and sid[0] == c_sid
                and orient[0] == c_orient
                and np.int64(kid[0]) == np.int64(c_kid) + c_orient
            ):
                # counted as a search by derive_report's roll (prev unknown
                # there); reclassify as extension
                self.report["num_searches"] -= 1
                self.report["num_extensions"] += 1

        rep = derive_report(found, sid, kid, orient, valid, first)
        for key, v in rep.items():
            self.report[key] += v
        self._carry = (bool(found[-1]), sid[-1], kid[-1], orient[-1])

    def finalize(self):
        self.flush()
        r = self.report
        assert r["num_kmers"] == (
            r["num_positive_kmers"] + r["num_negative_kmers"] + r["num_invalid_kmers"]
        )
        return dict(r)


def _host_lookup(index):
    def fn(kmers, valid):
        return oracle.lookup(index, kmers)

    return fn


def _device_lookup(engine, chunk):
    """Fixed-shape device batches (pad to `chunk`) to avoid recompiles."""
    import jax
    import jax.numpy as jnp

    def fn(kmers64, valid):
        n = len(kmers64)
        kmers32 = K.kmers_to_u32(kmers64, engine.cfg.k)
        if n < chunk:
            kmers32 = np.concatenate(
                [kmers32, np.zeros((chunk - n, kmers32.shape[1]), dtype=np.uint32)]
            )
        res = engine.lookup_device(jnp.asarray(kmers32))
        res = jax.tree.map(np.asarray, res)
        found = res.pop("found")
        out = {}
        for key, v in res.items():
            if v.dtype == np.uint32:
                v64 = v.astype(np.uint64)
                v64[~found] = INVALID
                out[key] = v64[:n]
            else:
                out[key] = v[:n].astype(np.int64) if key == "kmer_orientation" else v[:n]
        return out

    return fn


def streaming_query_from_file(dictionary, path, multiline=False, fmt=None,
                              use_device=False, chunk=1 << 18):
    """Run streaming membership queries; returns the report dict of
    streaming_query_report (reference util.hpp:29-36) plus timing."""
    index = dictionary.index
    if use_device:
        engine = dictionary.to_device()
        lookup_fn = _device_lookup(engine, chunk)
    else:
        lookup_fn = _host_lookup(index)

    t0 = time.perf_counter()
    batcher = _Batcher(index, lookup_fn, index.k, chunk=chunk)
    for seq in parse_reads(path, fmt=fmt, multiline=multiline):
        batcher.add_read(seq)
    report = batcher.finalize()
    report["elapsed_millisec"] = (time.perf_counter() - t0) * 1e3
    return report
