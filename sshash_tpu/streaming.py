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
    """Accumulates reads, encodes/extracts per-position kmers fully
    vectorized at flush time, runs the batched lookup, folds counters."""

    def __init__(self, index, lookup_fn, k, chunk=1 << 18):
        self.index = index
        self.lookup_fn = lookup_fn
        self.k = k
        self.chunk = chunk
        self._seqs = []
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
        n = len(seq)
        if n < self.k:
            return
        self._seqs.append(bytes(seq))
        self._pending += n - self.k + 1
        if self._pending >= self.chunk:
            self.flush()

    def flush(self):
        if not self._pending:
            return
        k = self.k
        lens = np.array([len(s) for s in self._seqs], dtype=np.int64)
        codes, ok = K.encode_chars(b"".join(self._seqs))
        self._seqs = []
        self._pending = 0

        ends = np.cumsum(lens)
        starts = ends - lens
        npos = lens - k + 1
        total = int(npos.sum())
        # per-read position lists, vectorized
        pstart = np.cumsum(npos) - npos
        pos = np.repeat(starts, npos) + (np.arange(total) - np.repeat(pstart, npos))
        first = np.zeros(total, dtype=bool)
        first[pstart] = True
        okc = np.zeros(len(ok) + 1, dtype=np.int64)
        np.cumsum(ok, out=okc[1:])
        valid = (okc[pos + k] - okc[pos]) == k
        words = K.pack_codes(np.where(ok, codes, 0), pad_words=K.num_words64(k) + 1)
        kmers = K.read_kmers_at(words, pos, k)

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


class _DeviceStream:
    """TPU streaming pipeline. Per chunk, uploads only the 2-bit PACKED read
    chars + tiny per-read metadata (host<->device links can be slow; the
    expanded per-position kmers would be ~30x larger), extracts kmers,
    runs the batched lookup, and derives the report counters ON DEVICE —
    only a handful of scalars come back per chunk."""

    def __init__(self, engine, k, pmax=1 << 19, rmax_shift=4):
        import jax
        import jax.numpy as jnp

        from .engine import make_lookup

        self.engine = engine
        self.k = k
        self.P = pmax
        self.R = pmax >> rmax_shift  # max reads (segments) per chunk
        self.CW = (pmax + (self.R * (k - 1)) + 31) // 32 + 4  # u32 words of chars
        self._seqs = []  # (bytes, is_read_start)
        self._pending = 0
        self._chars = 0
        self._carry = None
        self._inflight = []  # queued (device outputs, starts_fresh) per chunk
        self.report = dict.fromkeys(
            ["num_kmers", "num_positive_kmers", "num_negative_kmers",
             "num_invalid_kmers", "num_searches", "num_extensions"], 0)

        cfg = engine.cfg
        # one compiled step per (engine, P, R): cache on the engine
        cache = getattr(engine, "_stream_steps", None)
        if cache is None:
            cache = engine._stream_steps = {}
        if (self.P, self.R) in cache:
            self._step = cache[(self.P, self.R)]
            self._jnp = jnp
            return
        lookup = make_lookup(cfg)
        P_, R_ = self.P, self.R
        I32 = jnp.int32
        U32j = jnp.uint32

        S = 16  # anchor stride: 1 full lookup per S positions on hit-dense data
        A = P_ // S
        FWD = 1

        def _char_at(words, idx):
            """2-bit char at char-offset idx from packed u32 words."""
            w = jnp.take(words, (idx >> 4).astype(I32), mode="clip")
            return (w >> ((idx & U32j(15)) * U32j(2))) & U32j(3)

        def _bit_at(bits, idx):
            w = jnp.take(bits, (idx >> 5).astype(I32), mode="clip")
            return ((w >> (idx & U32j(31))) & U32j(1)) != 0

        def step(arrs, words32, rstart, rnpos, rfirst_bits, valid_bits, count, nreads):
            """Anchored seed-and-extend (the batched analog of the reference
            extension cache, streaming_query.hpp:86-100): full lookups only at
            every S-th position; the S-1 followers of a found anchor resolve
            with ONE string-char comparison each (chain prefix-AND per row);
            broken chains fall back to compacted full lookups."""
            from .ops import packed as Pk
            from .ops import u64 as u

            lane = jnp.arange(P_, dtype=I32)
            active = lane < count
            # lane -> segment mapping WITHOUT full-width scatters: segment
            # starts scatter into a P/32-bit mask (R-sized op), and the char
            # position is AFFINE in the segment index because segments are
            # concatenated contiguously: cstart[r] = pstart[r] + r*(k-1).
            pstart = jnp.cumsum(rnpos) - rnpos
            valid_r = jnp.arange(R_, dtype=I32) < nreads
            pbit = U32j(1) << (pstart & U32j(31))
            sbits = jnp.zeros((P_ // 32 + 1,), dtype=U32j).at[
                jnp.where(valid_r, (pstart >> 5).astype(I32), P_)].add(
                pbit, mode="drop")
            rr = jnp.arange(R_, dtype=I32)
            ris_first = ((jnp.take(rfirst_bits, rr >> 5, mode="clip")
                          >> (rr & 31)) & 1) != 0
            fbits = jnp.zeros((P_ // 32 + 1,), dtype=U32j).at[
                jnp.where(valid_r & ris_first, (pstart >> 5).astype(I32),
                          P_)].add(pbit, mode="drop")
            sb = ((sbits[lane >> 5] >> (lane & 31).astype(U32j)) & 1) != 0
            r = jnp.cumsum(sb.astype(I32)) - 1
            pos = (lane + r * (cfg.k - 1)).astype(U32j)
            first = ((fbits[lane >> 5] >> (lane & 31).astype(U32j)) & 1) != 0
            valid = (((valid_bits[lane >> 5] >> (lane & 31).astype(U32j)) & 1) != 0) & active

            # ---- phase 1: anchor lookups (compacted to A = P/S lanes)
            apos = pos[::S]
            ares = lookup(arrs, Pk.read_kmers_at(words32, apos, cfg.k))
            afound = ares["found"] & valid[::S]
            aoff = ares["kmer_offset"]
            asid = ares["string_id"]
            akid = ares["kmer_id"]
            aorient = ares["kmer_orientation"]  # (A,) i32

            # ---- phase 2: chain extension, one char compare per follower.
            # The in-string test uses the ANCHOR's string bounds (VPU only —
            # the chain stays in the anchor's string by construction, like
            # the reference's cursor remaining_string_bases,
            # streaming_query.hpp:182-197); the only gather is the string
            # char compare.
            # computed in (S, A) layout: A rides the 128-lane axis (an (A, S)
            # layout would put S=16 on it, wasting 7/8 of the VPU)
            t = jnp.arange(S, dtype=U32j)[:, None]
            fwd = (aorient[None, :] == FWD)
            og = jnp.where(fwd, aoff[None, :] + t, aoff[None, :] - t)
            under = ~fwd & (aoff[None, :] < t)
            k1 = U32j(cfg.k - 1)
            qs = jnp.where(fwd, og + k1, og)
            posg = pos.reshape(A, S).T
            schar = _char_at(arrs["strings32"], qs)
            rchar = _char_at(words32, posg + k1)
            charok = jnp.where(fwd, schar == rchar, schar == (rchar ^ U32j(2)))
            vg = valid.reshape(A, S).T
            fg = first.reshape(A, S).T
            asb = ares["string_begin"][None, :]
            ase = ares["string_end"][None, :]
            instr = (og >= asb) & ((og + U32j(cfg.k)) <= ase)
            cond = vg & ~fg & charok & instr & ~under
            cond = cond.at[0, :].set(afound)
            matched = jnp.cumprod(cond.astype(I32), axis=0) > 0

            sgn = jnp.where(fwd, U32j(1), U32j(0xFFFFFFFF))  # +1 / -1 mod 2^32
            found_l = matched.T.reshape(P_)
            sid_l = jnp.broadcast_to(asid[:, None], (A, S)).reshape(P_)
            kid_l = (akid[None, :] + sgn * t).T.reshape(P_)
            ori_l = jnp.broadcast_to(aorient[:, None], (A, S)).reshape(P_)

            # ---- phase 3: fallback lookups with the negative-minimizer-run
            # skip (reference streaming_query.hpp:150-157): consecutive
            # unresolved positions with identical both-strand minimizer
            # values form a RUN; one lookup per run head suffices to prove
            # the whole run absent when its minimizer is not in the index.
            need = active & valid & ~found_l
            Wp = P_ // 8

            def phase3(carry):
                """Fallback searches with the negative-minimizer-run skip;
                the whole phase (incl. the per-char minimizer hashing) is
                gated by lax.cond — hit-dense chunks pay nothing for it."""
                found_l, sid_l, kid_l, ori_l = carry
                # both-strand minimizer hash per position (VPU + 4 gathers)
                w_ = cfg.k - cfg.m + 1
                h_f, h_r = Pk.char_mmer_hashes(words32, words32.shape[0] * 16,
                                               cfg.m, u.const64(cfg.magic))
                mh_f = Pk.sliding_min_u64(h_f, w_)
                mh_r = Pk.sliding_min_u64(h_r, w_)
                pmh_f = u.u64(jnp.take(mh_f.hi, pos.astype(I32), mode="clip"),
                              jnp.take(mh_f.lo, pos.astype(I32), mode="clip"))
                pmh_r = u.u64(jnp.take(mh_r.hi, pos.astype(I32), mode="clip"),
                              jnp.take(mh_r.lo, pos.astype(I32), mode="clip"))

                def prev64(v):
                    return u.u64(jnp.roll(v.hi, 1).at[0].set(0xFFFFFFFF),
                                 jnp.roll(v.lo, 1).at[0].set(0xFFFFFFFF))

                same_pair = (u.equal(pmh_f, prev64(pmh_f))
                             & u.equal(pmh_r, prev64(pmh_r)) & ~first)
                prev_need = jnp.roll(need, 1).at[0].set(False)
                head = need & ~(prev_need & same_pair)

                # per-lane run-head lane index (segmented broadcast)
                seg = jnp.cumsum(head.astype(I32)) - 1
                nheads = seg[-1] + 1
                head_mf = jnp.zeros((P_,), dtype=bool)  # per-HEAD-rank mf

                def run_windows(sel, nsel, carry, record_mf):
                    """Compacted full lookups over `sel` lanes."""
                    found_l, sid_l, kid_l, ori_l, head_mf = carry
                    rank = jnp.cumsum(sel.astype(I32)) - 1
                    lids = jnp.zeros((P_,), dtype=I32).at[
                        jnp.where(sel, rank, P_)].set(lane, mode="drop")

                    def wbody(w, carry):
                        found_l, sid_l, kid_l, ori_l, head_mf = carry
                        slot = w * Wp + jnp.arange(Wp, dtype=I32)
                        lid = jnp.take(lids, jnp.clip(slot, 0, P_ - 1), mode="clip")
                        ok = slot < nsel
                        lp = jnp.take(pos, lid, mode="clip")
                        km = Pk.read_kmers_at(words32, jnp.where(ok, lp, U32j(0)), cfg.k)
                        r2 = lookup(arrs, km)
                        f2 = r2["found"] & ok
                        tgt = jnp.where(f2, lid, P_)
                        found_l = found_l.at[tgt].set(True, mode="drop")
                        sid_l = sid_l.at[tgt].set(r2["string_id"], mode="drop")
                        kid_l = kid_l.at[tgt].set(r2["kmer_id"], mode="drop")
                        ori_l = ori_l.at[tgt].set(r2["kmer_orientation"], mode="drop")
                        if record_mf:
                            # store minimizer_found per head RANK
                            hrank = jnp.take(seg, jnp.clip(lid, 0, P_ - 1), mode="clip")
                            head_mf = head_mf.at[jnp.where(ok, hrank, P_)].set(
                                r2["minimizer_found"] | f2, mode="drop")
                        return found_l, sid_l, kid_l, ori_l, head_mf

                    nw = (nsel + Wp - 1) // Wp
                    _, out = jax.lax.while_loop(
                        lambda c: c[0] < nw,
                        lambda c: (c[0] + 1, wbody(c[0], c[1])),
                        (jnp.int32(0), carry))
                    return out

                carry5 = (found_l, sid_l, kid_l, ori_l, head_mf)
                carry5 = run_windows(head, nheads, carry5, record_mf=True)
                found_l, sid_l, kid_l, ori_l, head_mf = carry5

                # skip non-head run members whose head proved the minimizer
                # pair absent; the rest (head found or minimizer present)
                # round 2
                my_mf = jnp.take(head_mf, jnp.clip(seg, 0, P_ - 1), mode="clip")
                round2 = need & ~head & my_mf
                n2 = round2.sum()
                carry5 = run_windows(round2, n2, carry5, record_mf=False)
                found_l, sid_l, kid_l, ori_l, _ = carry5
                return found_l, sid_l, kid_l, ori_l

            found_l, sid_l, kid_l, ori_l = jax.lax.cond(
                need.sum() > 0, phase3, lambda c: c,
                (found_l, sid_l, kid_l, ori_l))

            # ---- derive the report counters (see module docstring)
            found = found_l & valid
            sid = sid_l
            kid = kid_l
            orient = ori_l
            pf = jnp.roll(found, 1).at[0].set(False)
            ext = (found & pf & ~first
                   & (sid == jnp.roll(sid, 1))
                   & (orient == jnp.roll(orient, 1))
                   & (kid == jnp.roll(kid, 1) + jnp.roll(orient, 1).astype(U32j)))
            n_pos = found.sum().astype(U32j)
            n_ext = ext.sum().astype(U32j)
            n_inv = (active & ~valid).sum().astype(U32j)
            last = jnp.clip(count - 1, 0, P_ - 1)
            counters = jnp.stack([count.astype(U32j), n_pos, n_ext, n_inv])
            lane0 = jnp.stack([found[0].astype(U32j), sid[0], kid[0],
                               orient[0].astype(U32j)])
            lastv = jnp.stack([found[last].astype(U32j), sid[last], kid[last],
                               orient[last].astype(U32j)])
            return counters, lane0, lastv

        self._step = cache[(self.P, self.R)] = jax.jit(step)
        self._jnp = jnp

    def add_read(self, seq):
        k = self.k
        n = len(seq)
        if n < k:
            return
        # split long reads into <=P-position segments with k-1 char overlap
        # (the reference's multiline buffer carry, src/query.cpp:28-37)
        seg = self.P
        for off in range(0, n - k + 1, seg):
            chunk = seq[off : off + seg + k - 1]
            self._add_segment(bytes(chunk), off == 0)

    def _add_segment(self, seq, is_start):
        npos = len(seq) - self.k + 1
        if (self._pending + npos > self.P
                or len(self._seqs) + 1 > self.R
                or self._chars + len(seq) > self.CW * 16):
            self.flush()
        self._seqs.append((seq, is_start))
        self._pending += npos
        self._chars += len(seq)

    def flush(self):
        if not self._pending:
            return
        import jax.numpy as jnp

        from . import native

        k = self.k
        seqs = [s for s, _ in self._seqs]
        starts_flag = np.array([f for _, f in self._seqs], dtype=bool)
        self._seqs = []
        count = self._pending
        self._pending = 0
        self._chars = 0

        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        ends = np.cumsum(lens)
        cstarts = ends - lens
        npos = lens - k + 1
        total = int(npos.sum())
        assert total == count

        words32 = np.zeros(self.CW, dtype=np.uint32)
        valid_bits = np.zeros(self.P // 32 + 1, dtype=np.uint32)
        joined = b"".join(seqs)
        if native.available():
            # single-pass C++ encode: pack + per-position validity in one
            # sweep (the multi-pass NumPy path below dominated warm
            # streaming time on slow hosts)
            t = native.encode_stream(joined, cstarts, lens, k, words32,
                                     valid_bits)
            assert t == count
        else:
            codes, ok = K.encode_chars(joined)
            words = K.pack_codes(np.where(ok, codes, 0))
            w32 = K.pack_words_to_u32(words)
            words32[: len(w32)] = w32
            pstart = np.cumsum(npos) - npos
            pos_all = np.repeat(cstarts, npos) + (
                np.arange(total) - np.repeat(pstart, npos))
            okc = np.zeros(len(ok) + 1, dtype=np.int64)
            np.cumsum(ok, out=okc[1:])
            valid = (okc[pos_all + k] - okc[pos_all]) == k
            vb = np.packbits(valid, bitorder="little")
            valid_bits[: (len(vb) + 3) // 4] = np.pad(
                vb, (0, (-len(vb)) % 4)).view(np.uint32)

        R = self.R
        rstart = np.zeros(R, dtype=np.uint32)
        rnpos = np.zeros(R, dtype=np.uint32)
        rstart[: len(lens)] = cstarts.astype(np.uint32)
        rnpos[: len(lens)] = npos.astype(np.uint32)
        fb = np.packbits(starts_flag, bitorder="little")
        rfirst = np.zeros(R // 32 + 1, dtype=np.uint32)
        rfirst[: (len(fb) + 3) // 4] = np.pad(fb, (0, (-len(fb)) % 4)).view(np.uint32)

        out = self._step(
            self.engine.arrs, jnp.asarray(words32), jnp.asarray(rstart),
            jnp.asarray(rnpos), jnp.asarray(rfirst), jnp.asarray(valid_bits),
            jnp.uint32(count), jnp.uint32(len(lens)))
        # defer the scalar fetch: dispatches stay queued on the device so
        # consecutive chunks pipeline; results fold at finalize()
        self._inflight.append((out, bool(starts_flag[0])))

    def _fold(self, out, chunk_starts_fresh):
        counters, lane0, lastv = (np.asarray(x) for x in out)
        counters = counters.astype(np.int64)
        n_kmers, n_pos, n_ext, n_inv = counters
        # stitch adjacency across the previous chunk boundary (the first
        # segment of this chunk may continue a split read)
        if self._carry is not None and not chunk_starts_fresh:
            c_found, c_sid, c_kid, c_orient = self._carry
            co = np.int64(np.int32(lane0[3]))
            if (c_found and lane0[0]
                    and lane0[1] == c_sid and co == c_orient
                    and int(lane0[2]) == (int(c_kid) + c_orient) & 0xFFFFFFFF):
                n_ext += 1
        self.report["num_kmers"] += int(n_kmers)
        self.report["num_positive_kmers"] += int(n_pos)
        self.report["num_extensions"] += int(n_ext)
        self.report["num_invalid_kmers"] += int(n_inv)
        self.report["num_negative_kmers"] += int(n_kmers - n_pos - n_inv)
        self.report["num_searches"] += int(n_pos - n_ext)
        self._carry = (bool(lastv[0]), np.uint64(lastv[1]), np.uint64(lastv[2]),
                       int(np.int32(lastv[3])))

    def finalize(self):
        self.flush()
        for out, fresh in self._inflight:
            self._fold(out, fresh)
        self._inflight = []
        r = self.report
        assert r["num_kmers"] == (
            r["num_positive_kmers"] + r["num_negative_kmers"] + r["num_invalid_kmers"])
        return dict(r)


def streaming_query_from_file(dictionary, path, multiline=False, fmt=None,
                              use_device=False, chunk=None):
    """Run streaming membership queries; returns the report dict of
    streaming_query_report (reference util.hpp:29-36) plus timing.
    chunk: positions per batch (device default 2^22 — big chunks amortize
    the per-dispatch cost; host default 2^18)."""
    index = dictionary.index
    t0 = time.perf_counter()
    if use_device:
        engine = dictionary.to_device()
        batcher = _DeviceStream(engine, index.k,
                                pmax=max(chunk or (1 << 22), 1 << 16))
    else:
        batcher = _Batcher(index, _host_lookup(index), index.k,
                           chunk=chunk or (1 << 18))
    for seq in parse_reads(path, fmt=fmt, multiline=multiline):
        batcher.add_read(seq)
    report = batcher.finalize()
    report["elapsed_millisec"] = (time.perf_counter() - t0) * 1e3
    return report
