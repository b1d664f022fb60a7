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
            # block-bulk read + one C-speed split per block (per-record
            # readline() cost ~225ms for 10K records of the bundled SRR
            # file on the throttled host — more than the whole device
            # budget of the low-hit streaming row). Line phase carries
            # across blocks so records never split.
            yield from _grouped_lines(f, group=4, seq_line=1)
        elif multiline:
            # block-bulk read + C-speed translate: the per-line Python loop
            # cost ~90ms on the 4.9MB salmonella genome (throttled host), a
            # visible slice of the streaming end-to-end budget. Records are
            # split on line-initial '>'; newlines strip in one pass. Blocks
            # carry the trailing partial record, so resident memory is one
            # block + one record — never the whole file.
            for rec, first in _ml_records(f):
                if first and not rec.startswith(b">"):
                    seq = rec.translate(None, b"\r\n")  # headerless lines
                else:
                    nl = rec.find(b"\n")
                    seq = rec[nl + 1:].translate(None, b"\r\n") if nl >= 0 else b""
                if seq:
                    yield seq
        else:  # 2-line fasta
            yield from _grouped_lines(f, group=2, seq_line=1)


def _ml_records(f, block=1 << 25):
    """Yield (record_bytes, is_first_record) from a multiline FASTA, reading
    in bulk blocks: records split on the line-initial '>' separator; the
    trailing partial record carries into the next block, so a record is
    always yielded whole and resident memory stays ~block + one record.
    The carry is a LIST of chunks joined only when a separator appears, so
    a record spanning many blocks costs one join, not one per block."""
    carry = []  # chunks of the current (unterminated) record
    first = True
    while True:
        data = f.read(block)
        if not data:
            break
        # the separator may live inside `data` or straddle the boundary
        # (carry ends with '\n', data starts with '>')
        straddle = carry and carry[-1].endswith(b"\n") and data.startswith(b">")
        if b"\n>" not in data and not straddle:
            carry.append(data)
            continue
        parts = (b"".join(carry) + data).split(b"\n>")
        carry = [parts.pop()]
        for rec in parts:
            yield rec, first
            first = False
    if carry:
        rec = b"".join(carry)
        if rec:
            yield rec, first


def _grouped_lines(f, group, seq_line, block=1 << 25):
    """Yield line `seq_line` of every `group`-line record, reading in
    C-speed bulk blocks with a line-phase carry (so a record spanning a
    block boundary is never split). Tolerates a truncated final record the
    way the readline drivers did: the sequence line is yielded if present."""
    pending = []
    tail = b""
    while True:
        data = f.read(block)
        if not data:
            break
        if b"\r" in data:
            data = data.replace(b"\r", b"")
        lines = (tail + data).split(b"\n")
        tail = lines.pop()  # possibly-incomplete last line
        pending.extend(lines)
        ngroups = len(pending) // group
        for i in range(ngroups):
            yield pending[i * group + seq_line]
        del pending[: ngroups * group]
    if tail:
        pending.append(tail)
    if len(pending) > seq_line:
        yield pending[seq_line]


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


def make_stream_step(cfg, lookup, P_, R_, swin=None, debug_stage=None,
                     packed_cw=None, all_valid=False):
    """Build the per-chunk anchored seed-and-extend streaming step
    (jit-ready). Parameterized so the sharded engine can reuse it:

      lookup(arrs, kmers32) -> engine result dict (full fields + found)
      swin(arrs, base, win16) -> one aligned uint32 holding 16 string chars
        per anchor (defaults to a plain local strings32 read; the sharded
        engine passes an owner-masked read combined over the bucket axis)
      debug_stage: profiling hook (scripts/profile_stream_stages.py) —
        'masks' | 'anchor' | 'chain' | 'fast' | 'full' truncates the step
        after that phase / forces a derive branch (output shape unchanged)
      packed_cw: when set (the char-buffer word count CW), the returned fn
        takes ONE uint32 buffer instead of 5 arrays + 2 scalars — every
        separate host->device transfer pays a tunnel round trip, so chunks
        upload a single [count, nreads, rnpos, rfirst, valid, words] vector
        and the step slices it at static offsets (free under XLA fusion)
    """
    import jax
    import jax.numpy as jnp

    if getattr(cfg, "row_v2", False):
        raise ValueError(
            "streaming needs full lookup fields (string bounds for the "
            "chain-extension in-string test) and char-offset cursors; "
            "rebased v2-row indexes (>= 2^32 chars) serve point queries "
            "only — shard the input into < 2^32-char sub-indexes to stream")
    I32 = jnp.int32
    U32j = jnp.uint32
    S = 16  # anchor stride: 1 full lookup per S positions on hit-dense data
    A = P_ // S
    FWD = 1
    if swin is None:
        def swin(arrs, base, win16):
            return win16(arrs["strings32"], base)

    def step(arrs, words32, rnpos, rfirst_bits, valid_bits, count, nreads):
        """Anchored seed-and-extend (the batched analog of the reference
        extension cache, streaming_query.hpp:86-100): full lookups only at
        every S-th position; the S-1 followers of a found anchor resolve
        with ONE string-char comparison each (chain prefix-AND per row);
        broken chains fall back to compacted full lookups."""
        from .ops import packed as Pk
        from .ops import u64 as u

        lane = jnp.arange(P_, dtype=I32)
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
        # groups of S=16 lanes: every per-lane mask is a HALFWORD of its
        # bit array, so all (S, A) masks come from A-wide extractions —
        # no full-width bit expands on the fast path
        g = jnp.arange(A, dtype=I32)
        t = jnp.arange(S, dtype=U32j)[:, None]  # (S, 1)

        def halves(bits):
            w = jnp.take(bits, g >> 1, mode="clip")
            return (w >> ((g & 1) * 16).astype(U32j)) & U32j(0xFFFF)

        vhalf = halves(valid_bits)
        fhalf = halves(fbits)
        shalf = halves(sbits)
        vg = ((vhalf[None, :] >> t) & 1) != 0  # (S, A) valid
        fg = ((fhalf[None, :] >> t) & 1) != 0  # read starts
        sg = ((shalf[None, :] >> t) & 1) != 0  # segment starts

        def pc16(v):
            v = v - ((v >> 1) & U32j(0x5555))
            v = (v & U32j(0x3333)) + ((v >> 2) & U32j(0x3333))
            v = (v + (v >> 4)) & U32j(0x0F0F)
            return (v + (v >> 8)) & U32j(0x1F)

        # r at each anchor lane from group popcounts (A-wide cumsum)
        pch = pc16(shalf).astype(I32)
        cum_g = jnp.cumsum(pch) - pch
        r_a = cum_g + (shalf & 1).astype(I32) - 1
        apos = (16 * g + r_a * (cfg.k - 1)).astype(U32j)

        if debug_stage == "masks":
            s = (apos.sum() + vg.sum() + fg.sum() + sg.sum()).astype(U32j)
            return jnp.full((3, 4), s, dtype=U32j)

        # ---- phase 1: anchor lookups (A = P/S lanes)
        ares = lookup(arrs, Pk.read_kmers_at(words32, apos, cfg.k))
        if debug_stage == "anchor":
            s = (apos.sum() + vg.sum() + ares["kmer_id"].sum()
                 + ares["kmer_offset"].sum()).astype(U32j)
            return jnp.full((3, 4), s, dtype=U32j)
        afound = ares["found"] & vg[0]
        aoff = ares["kmer_offset"]
        asid = ares["string_id"]
        akid = ares["kmer_id"]
        aorient = ares["kmer_orientation"]  # (A,) i32
        fwd_a = aorient == FWD
        sgn_a = jnp.where(fwd_a, U32j(1), U32j(0xFFFFFFFF))  # +-1 mod 2^32

        # ---- phase 2: chain extension. A chain's S string chars and S
        # read chars are CONSECUTIVE, so each anchor fetches ONE aligned
        # 2-word window per source (A-wide gathers) and the per-follower
        # compares are pure VPU in (S, A) layout. The in-string test
        # uses the anchor's string bounds (streaming_query.hpp:182-197).
        k1 = U32j(cfg.k - 1)

        def win16(words, base):
            """chars [base, base+16) as one aligned uint32 per anchor."""
            w0i = (base >> 4).astype(I32)
            w0 = jnp.take(words, w0i, mode="clip")
            w1 = jnp.take(words, w0i + 1, mode="clip")
            sh = (base & U32j(15)) * 2
            nz = sh != 0
            return (w0 >> sh) | jnp.where(nz, w1 << ((U32j(32) - sh) & U32j(31)), U32j(0))

        base_s = jnp.where(fwd_a, aoff + k1,
                           aoff - jnp.minimum(aoff, U32j(S - 1)))
        saw = swin(arrs, base_s, win16)
        raw = win16(words32, apos + k1)

        og = jnp.where(fwd_a[None, :], aoff[None, :] + t, aoff[None, :] - t)
        under = (~fwd_a)[None, :] & (aoff[None, :] < t)
        idx_s = jnp.where(fwd_a[None, :], t, og - base_s[None, :])
        schar = (saw[None, :] >> ((idx_s & U32j(15)) * 2)) & 3
        rchar = (raw[None, :] >> (t * 2)) & 3
        charok = jnp.where(fwd_a[None, :], schar == rchar,
                           schar == (rchar ^ U32j(2)))
        asb = ares["string_begin"][None, :]
        ase = ares["string_end"][None, :]
        instr = (og >= asb) & ((og + U32j(cfg.k)) <= ase)
        cond = vg & ~fg & ~sg & charok & instr & ~under
        cond = cond.at[0, :].set(afound)
        matched = jnp.cumprod(cond.astype(I32), axis=0) > 0  # (S, A)
        if debug_stage == "chain":
            s = (matched.sum() + akid.sum()).astype(U32j)
            return jnp.full((3, 4), s, dtype=U32j)
        miss = vg & ~matched
        # fallback window width (ONLY derive_full — the low-hit branch —
        # uses run_windows; high-hit chunks take derive_corr). Each
        # fallback lane pays a full lookup, so window PADDING waste matters
        # as much as per-window fixed passes: P/8 windows measured WORSE
        # than P/64 (last window ~97% padding on a ~13%-heads chunk).
        # Knobs: StaticCfg.stream_wdiv / stream_cdiv (env override).
        Wp = max(4096, P_ // getattr(cfg, "stream_wdiv", 64))
        Wc_corr = max(1024, P_ // getattr(cfg, "stream_cdiv", 64))
        wide = getattr(cfg, "wide_ids", False)

        def pk_pack(kid, ori):
            """Per-lane result carry: [kid+1 | backward-bit] packed in one
            u32 column, or two columns when ids exceed 31 bits
            (cfg.wide_ids; 0 in column 0 still means not-found)."""
            bb = (ori < 0).astype(U32j)
            if wide:
                return jnp.stack([kid + U32j(1), bb], axis=1)
            return ((kid + U32j(1)) << 1) | bb

        def pk_unpack(pk):
            if wide:
                return pk[:, 0] > 0, pk[:, 0] - U32j(1), pk[:, 1]
            return pk > 0, (pk >> 1) - U32j(1), pk & 1

        def derive_fast(_):
            """No fallback needed (every valid position chained): all
            counters derive from the (S, A) matrices + anchor arrays."""
            n_valid = vg.sum().astype(U32j)
            n_pos = n_valid  # matched == vg here
            ext_in = matched[1:, :].sum().astype(U32j)
            prev_ok = jnp.concatenate([jnp.zeros(1, bool), matched[S - 1, :-1]])
            extg = (matched[0] & prev_ok & ~((fhalf & 1) != 0)
                    & ~((shalf & 1) != 0)
                    & (asid == jnp.roll(asid, 1))
                    & (aorient == jnp.roll(aorient, 1))
                    & (akid == jnp.roll(akid, 1)
                       + jnp.roll(sgn_a, 1) * U32j(S)))
            n_ext = ext_in + extg.sum().astype(U32j)
            n_inv = count.astype(U32j) - n_valid
            last = jnp.clip(count.astype(I32) - 1, 0, P_ - 1)
            gl = last // S
            tl = (last % S).astype(U32j)
            fl = jnp.take(matched.reshape(-1), (last % S) * A + gl) != 0
            counters = jnp.stack([count.astype(U32j), n_pos, n_ext, n_inv])
            lane0 = jnp.stack([matched[0, 0].astype(U32j), asid[0], akid[0],
                               aorient[0].astype(U32j)])
            lastv = jnp.stack([
                fl.astype(U32j), jnp.take(asid, gl),
                jnp.take(akid, gl) + jnp.take(sgn_a, gl) * tl,
                jnp.take(aorient, gl).astype(U32j)])
            return jnp.stack([counters, lane0, lastv])

        def derive_full(_):
            """Some positions missed their chain: build per-lane arrays,
            run the fallback searches (with the negative-minimizer-run
            skip, reference streaming_query.hpp:150-157), then derive
            counters from per-lane adjacency."""
            found_l = matched.T.reshape(P_)
            sid_l = jnp.broadcast_to(asid[:, None], (A, S)).reshape(P_)
            kid_l = (akid[None, :] + sgn_a[None, :] * t).T.reshape(P_)
            ori_l = jnp.broadcast_to(aorient[:, None], (A, S)).reshape(P_)
            valid = vg.T.reshape(P_)
            first = fg.T.reshape(P_)
            sb = ((sbits[lane >> 5] >> (lane & 31).astype(U32j)) & 1) != 0
            sb_i = sb.astype(I32)
            r = Pk.prefix_sum_ex(sb_i) + sb_i - 1
            pos = (lane + r * (cfg.k - 1)).astype(U32j)
            need = valid & ~found_l
            n_need = need.sum()

            def dbg(*vals):
                s = sum(v.sum().astype(U32j) for v in vals)
                return jnp.full((3, 4), s, dtype=U32j)

            if debug_stage == "dfl_lanes":
                return dbg(found_l, sid_l, kid_l, ori_l, valid, first)
            if debug_stage == "dfl_pos":
                return dbg(pos, need, n_need.astype(U32j))

            def heads_runskip(_):
                """Negative-minimizer-run skip (streaming_query.hpp:
                150-157): only worth the per-char hashing when misses
                are NUMEROUS (low-hit chunks)."""
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
                return need & ~(prev_need & same_pair)

            head = jax.lax.cond(n_need > P_ // 64, heads_runskip,
                                lambda _: need, jnp.int32(0))
            if debug_stage == "dfl_head":
                return dbg(head)

            # per-lane run-head lane index (segmented broadcast)
            head_i = head.astype(I32)
            seg = Pk.prefix_sum_ex(head_i) + head_i - 1
            nheads = seg[-1] + 1
            head_mf = jnp.zeros((P_,), dtype=bool)  # per-HEAD-rank mf
            if debug_stage == "dfl_seg":
                return dbg(seg, nheads.astype(U32j))

            def run_windows(sel, nsel, carry, record_mf):
                """Compacted full lookups over `sel` lanes. The per-lane
                result carries are PACKED — [kid+1 | backward-bit] + sid —
                so each window iteration pays 2-3 P-wide scatter passes,
                not 5 (they were the dominant low-hit cost)."""
                pk_l, sid_l, head_mf = carry
                rank = Pk.prefix_sum_ex(sel.astype(I32))
                lids = jnp.zeros((P_,), dtype=I32).at[
                    jnp.where(sel, rank, P_)].set(lane, mode="drop")

                def wbody(w, carry):
                    pk_l, sid_l, head_mf = carry
                    slot = w * Wp + jnp.arange(Wp, dtype=I32)
                    lid = jnp.take(lids, jnp.clip(slot, 0, P_ - 1), mode="clip")
                    ok = slot < nsel
                    lp = jnp.take(pos, lid, mode="clip")
                    km = Pk.read_kmers_at(words32, jnp.where(ok, lp, U32j(0)), cfg.k)
                    r2 = lookup(arrs, km)
                    f2 = r2["found"] & ok
                    tgt = jnp.where(f2, lid, P_)
                    pk2 = pk_pack(r2["kmer_id"], r2["kmer_orientation"])
                    pk_l = pk_l.at[tgt].set(pk2, mode="drop")
                    sid_l = sid_l.at[tgt].set(r2["string_id"], mode="drop")
                    if record_mf:
                        # store minimizer_found per head RANK
                        hrank = jnp.take(seg, jnp.clip(lid, 0, P_ - 1), mode="clip")
                        head_mf = head_mf.at[jnp.where(ok, hrank, P_)].set(
                            r2["minimizer_found"] | f2, mode="drop")
                    return pk_l, sid_l, head_mf

                nw = (nsel + Wp - 1) // Wp
                _, out = jax.lax.while_loop(
                    lambda c: c[0] < nw,
                    lambda c: (c[0] + 1, wbody(c[0], c[1])),
                    (jnp.int32(0), carry))
                return out

            pk0 = pk_pack(kid_l, ori_l)
            fmask = found_l[:, None] if wide else found_l
            pk_l = jnp.where(fmask, pk0, U32j(0))
            carry3 = (pk_l, sid_l, head_mf)
            carry3 = run_windows(head, nheads, carry3, record_mf=True)
            pk_l, sid_l, head_mf = carry3
            if debug_stage == "dfl_win1":
                return dbg(pk_l, sid_l, head_mf)

            # skip non-head run members whose head proved the minimizer
            # pair absent; the rest (head found or minimizer present)
            # round 2
            my_mf = jnp.take(head_mf, jnp.clip(seg, 0, P_ - 1), mode="clip")
            round2 = need & ~head & my_mf
            n2 = round2.sum()
            carry3 = run_windows(round2, n2, carry3, record_mf=False)
            pk_l, sid_l, _ = carry3
            found_l, kid_u, bbit = pk_unpack(pk_l)
            kid_l = jnp.where(found_l, kid_u, kid_l)
            ori_l = jnp.where(found_l, I32(1) - I32(2) * bbit.astype(I32),
                              ori_l)
            if debug_stage == "dfl_win2":
                return dbg(found_l, sid_l, kid_l, ori_l)

            # per-lane counter derivation (see module docstring)
            found = found_l & valid
            pf = jnp.roll(found, 1).at[0].set(False)
            ext = (found & pf & ~first
                   & (sid_l == jnp.roll(sid_l, 1))
                   & (ori_l == jnp.roll(ori_l, 1))
                   & (kid_l == jnp.roll(kid_l, 1) + jnp.roll(ori_l, 1).astype(U32j)))
            n_pos = found.sum().astype(U32j)
            n_ext = ext.sum().astype(U32j)
            n_inv = count.astype(U32j) - valid.sum().astype(U32j)
            last = jnp.clip(count.astype(I32) - 1, 0, P_ - 1)
            counters = jnp.stack([count.astype(U32j), n_pos, n_ext, n_inv])
            lane0 = jnp.stack([found[0].astype(U32j), sid_l[0], kid_l[0],
                               ori_l[0].astype(U32j)])
            lastv = jnp.stack([jnp.take(found, last).astype(U32j),
                               jnp.take(sid_l, last), jnp.take(kid_l, last),
                               jnp.take(ori_l, last).astype(U32j)])
            return jnp.stack([counters, lane0, lastv])

        def derive_corr(_):
            """0 < misses <= P/64 (the common high-hit shape: a chain
            break per unitig end): resolve every miss with ONE compacted
            Wc-lane lookup addressed in RANK space (rank -> lane via an
            A-wide searchsorted + in-group bit select), then CORRECT the
            fast-path counters at the miss lanes. No P-wide transpose /
            prefix-sum / scatter / gather runs on this branch — those
            were the +44 ns/pos of the general path
            (scripts/profile_stream_stages.py). Window capacity knob:
            StaticCfg.stream_cdiv / SSHASH_STREAM_CDIV (the miss-count
            threshold below tracks it)."""
            Wc = Wc_corr
            mhalf = (matched.astype(U32j) << t).sum(axis=0)  # (A,) packed
            needh = vhalf & ~mhalf
            pcn = pc16(needh).astype(I32)
            cumn = jnp.cumsum(pcn)          # inclusive, A-wide
            basen = cumn - pcn
            nneed = cumn[-1]
            slot = jnp.arange(Wc, dtype=I32)
            okb = slot < nneed
            gj = jnp.clip(jnp.searchsorted(cumn, slot, side="right"),
                          0, A - 1).astype(I32)
            jj = slot - jnp.take(basen, gj)
            mk = jnp.take(needh, gj)
            # jj-th set bit of the 16-bit mask (unrolled ALU select)
            tj = jnp.zeros((Wc,), dtype=I32)
            cnt = jnp.zeros((Wc,), dtype=I32)
            for b in range(S):
                bit = ((mk >> b) & 1).astype(I32)
                tj = jnp.where((cnt == jj) & (bit == 1), b, tj)
                cnt = cnt + bit
            lane_j = 16 * gj + tj
            tju = tj.astype(U32j)
            inc_mask = (U32j(2) << tju) - U32j(1)  # bits 0..tj inclusive
            rj = (jnp.take(cum_g, gj)
                  + pc16(jnp.take(shalf, gj) & inc_mask).astype(I32) - 1)
            posj = (lane_j + rj * (cfg.k - 1)).astype(U32j)
            r2 = lookup(arrs, Pk.read_kmers_at(
                words32, jnp.where(okb, posj, U32j(0)), cfg.k))
            f2 = r2["found"] & okb
            sid2 = r2["string_id"]
            kid2 = r2["kmer_id"]
            ori2 = r2["kmer_orientation"]

            # base tallies: pairs with BOTH members chain-matched
            ext_in = matched[1:, :].sum().astype(U32j)
            prev_ok = jnp.concatenate([jnp.zeros(1, bool), matched[S - 1, :-1]])
            extg = (matched[0] & prev_ok & ~((fhalf & 1) != 0)
                    & ~((shalf & 1) != 0)
                    & (asid == jnp.roll(asid, 1))
                    & (aorient == jnp.roll(aorient, 1))
                    & (akid == jnp.roll(akid, 1)
                       + jnp.roll(sgn_a, 1) * U32j(S)))

            # C1: pairs whose RIGHT member is this miss lane. The left
            # neighbour is either the previous rank (also a miss) or a
            # chain-matched lane whose values derive from anchor arrays.
            t_l = jnp.where(tj == 0, S - 1, tj - 1)
            g_lc = jnp.clip(jnp.where(tj == 0, gj - 1, gj), 0, A - 1)
            tlu = t_l.astype(U32j)
            left_miss = ((jnp.take(needh, g_lc) >> tlu) & 1) != 0
            left_mat = ((jnp.take(mhalf, g_lc) >> tlu) & 1) != 0
            firstj = ((jnp.take(fhalf, gj) >> tju) & 1) != 0
            lfound = jnp.where(left_miss, jnp.roll(f2, 1), left_mat)
            lsid = jnp.where(left_miss, jnp.roll(sid2, 1),
                             jnp.take(asid, g_lc))
            lkid = jnp.where(left_miss, jnp.roll(kid2, 1),
                             jnp.take(akid, g_lc)
                             + jnp.take(sgn_a, g_lc) * tlu)
            lori = jnp.where(left_miss, jnp.roll(ori2, 1),
                             jnp.take(aorient, g_lc))
            c1 = (okb & f2 & lfound & (lane_j > 0) & ~firstj
                  & (sid2 == lsid) & (ori2 == lori)
                  & (kid2 == lkid + lori.astype(U32j)))

            # C2: left member is this miss at row S-1, right is the NEXT
            # group's chain-matched anchor (the only left-miss/right-match
            # shape the cumprod chain permits)
            g_rc = jnp.clip(gj + 1, 0, A - 1)
            c2 = (okb & (tj == S - 1) & (gj + 1 < A) & f2
                  & ((jnp.take(mhalf, g_rc) & 1) != 0)
                  & ((jnp.take(fhalf, g_rc) & 1) == 0)
                  & (jnp.take(asid, g_rc) == sid2)
                  & (jnp.take(aorient, g_rc) == ori2)
                  & (jnp.take(akid, g_rc) == kid2 + ori2.astype(U32j)))

            n_valid = vg.sum().astype(U32j)
            n_pos = matched.sum().astype(U32j) + f2.sum().astype(U32j)
            n_ext = (ext_in + extg.sum().astype(U32j)
                     + c1.sum().astype(U32j) + c2.sum().astype(U32j))
            n_inv = count.astype(U32j) - n_valid
            counters = jnp.stack([count.astype(U32j), n_pos, n_ext, n_inv])

            l0_miss = (needh[0] & 1) != 0
            lane0 = jnp.stack([
                jnp.where(l0_miss, f2[0], matched[0, 0]).astype(U32j),
                jnp.where(l0_miss, sid2[0], asid[0]),
                jnp.where(l0_miss, kid2[0], akid[0]),
                jnp.where(l0_miss, ori2[0], aorient[0]).astype(U32j)])

            last = jnp.clip(count.astype(I32) - 1, 0, P_ - 1)
            gl = last // S
            tl = last % S
            tlu2 = tl.astype(U32j)
            nh_l = jnp.take(needh, gl)
            l_missb = ((nh_l >> tlu2) & 1) != 0
            rank_l = jnp.clip(jnp.take(basen, gl) + pc16(
                nh_l & ((U32j(1) << tlu2) - U32j(1))).astype(I32), 0, Wc - 1)
            m_l = jnp.take(matched.reshape(-1), tl * A + gl) != 0
            lastv = jnp.stack([
                jnp.where(l_missb, jnp.take(f2, rank_l), m_l).astype(U32j),
                jnp.where(l_missb, jnp.take(sid2, rank_l),
                          jnp.take(asid, gl)),
                jnp.where(l_missb, jnp.take(kid2, rank_l),
                          jnp.take(akid, gl) + jnp.take(sgn_a, gl) * tlu2),
                jnp.where(l_missb, jnp.take(ori2, rank_l),
                          jnp.take(aorient, gl)).astype(U32j)])
            return jnp.stack([counters, lane0, lastv])

        n_miss = miss.sum()

        def derive_miss(_):
            return jax.lax.cond(n_miss > Wc_corr, derive_full, derive_corr,
                                jnp.int32(0))

        # one (3, 4) output array: the host folds a chunk with a SINGLE
        # round trip (3 separate fetches cost ~40ms each on slow links)
        if debug_stage == "fast":
            return derive_fast(jnp.int32(0))
        if debug_stage == "full":
            return derive_full(jnp.int32(0))
        if debug_stage == "corr":
            return derive_corr(jnp.int32(0))
        return jax.lax.cond(miss.any(), derive_miss, derive_fast,
                            jnp.int32(0))

    if packed_cw is None:
        return step

    o0 = 2
    o1 = o0 + R_
    o2 = o1 + R_ // 32 + 1
    o3 = o2 + P_ // 32 + 1

    if all_valid:
        # clean-data variant: the valid mask region is NOT uploaded (it is
        # ~25% of a long-read chunk's bytes); lanes < count are all valid,
        # so the mask derives from the count scalar on device
        def step_packed_av(arrs, packed):
            cnt = packed[0]
            w = jnp.arange(P_ // 32 + 1, dtype=U32j)
            full = cnt >> U32j(5)
            rem = cnt & U32j(31)
            vb = jnp.where(w < full, U32j(0xFFFFFFFF),
                           jnp.where(w == full,
                                     (U32j(1) << rem) - U32j(1), U32j(0)))
            return step(arrs, packed[o2:o2 + packed_cw], packed[o0:o1],
                        packed[o1:o2], vb, cnt, packed[1])

        return step_packed_av

    def step_packed(arrs, packed):
        return step(arrs, packed[o3:o3 + packed_cw], packed[o0:o1],
                    packed[o1:o2], packed[o2:o3], packed[0], packed[1])

    return step_packed


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
        self._init_host(k, pmax, rmax_shift)
        cfg = engine.cfg
        # one compiled step per (engine, P, R): cache on the engine
        cache = getattr(engine, "_stream_steps", None)
        if cache is None:
            cache = engine._stream_steps = {}
        if (self.P, self.R) not in cache:
            cache[(self.P, self.R)] = jax.jit(make_stream_step(
                cfg, make_lookup(cfg), self.P, self.R, packed_cw=self.CW))
        self._step_fn = cache[(self.P, self.R)]
        self._jnp = jnp

    def _step(self, arrs, words32, rnpos, rfirst, valid_bits, count, nreads):
        """Dispatch one chunk: pack all per-chunk inputs into ONE uint32
        upload (each separate transfer pays a ~40ms tunnel round trip).
        All-valid chunks (clean ACGT data — the common case) skip the valid
        mask region entirely; the device derives it from count.

        With the upload pipeline (SSHASH_STREAM_PIPELINE, default on) the
        upload + dispatch run on a single-worker thread so the HOST work of
        chunk n+1 (file parse + native encode) overlaps the TRANSFER of
        chunk n — on slow host->device links the serial
        encode->upload->dispatch chain was the end-to-end wall (round-5
        VERDICT ask #3a). A 3-slot semaphore bounds buffered chunks; the
        single worker preserves chunk order for the carry stitch."""
        if int(np.bitwise_count(valid_bits).sum()) == int(count):
            buf = np.empty(self._o2 + self.CW, dtype=np.uint32)
            buf[self._o2:] = words32
            fn = self._av_step()
        else:
            buf = np.empty(self._o3 + self.CW, dtype=np.uint32)
            buf[self._o2:self._o3] = valid_bits
            buf[self._o3:] = words32
            fn = self._step_fn
        buf[0] = count
        buf[1] = nreads
        buf[2:self._o1] = rnpos
        buf[self._o1:self._o2] = rfirst
        if self._pipe is not None and getattr(self, "_capture", None) is None:
            self._pipe_slots.acquire()
            jnp_ = self._jnp
            eng_arrs = self.engine.arrs

            def run(buf=buf, fn=fn):
                try:
                    return fn(eng_arrs, jnp_.asarray(buf))
                finally:
                    self._pipe_slots.release()

            return self._pipe.submit(run)
        jbuf = self._jnp.asarray(buf)
        if getattr(self, "_capture", None) is not None:
            # profiling hook: record (compiled fn, device-resident buffer)
            # so kernel-only cost can be re-timed without the upload
            self._capture.append((fn, jbuf))
        return fn(self.engine.arrs, jbuf)

    def _av_step(self):
        """Lazily compiled all-valid variant (second shape per (P, R); only
        the variants a workload actually hits pay a compile)."""
        import jax

        from .engine import make_lookup

        cache = self.engine._stream_steps
        key = (self.P, self.R, "av")
        if key not in cache:
            cfg = self.engine.cfg
            cache[key] = jax.jit(make_stream_step(
                cfg, make_lookup(cfg), self.P, self.R, packed_cw=self.CW,
                all_valid=True))
        return cache[key]

    def _init_host(self, k, pmax, rmax_shift):
        """Host-side chunking state (shared with parallel.ShardedStream)."""
        self.k = k
        self.P = pmax
        # max reads (segments) per chunk. This sizes the uploaded rnpos
        # array AND the char-buffer slack, so it dominates per-chunk upload
        # bytes on slow links: short-read workloads need R ~ P/16; long-read
        # (multiline genome) workloads only a handful of segments — callers
        # pass rmax_shift=12 there (streaming_query_from_file does).
        self.rmax_shift = rmax_shift
        self.R = max(16, pmax >> rmax_shift)
        # char-buffer budget in u32 words (16 chars each). Deliberately ~half
        # the absolute worst case (P + R*(k-1) chars) to keep uploads small —
        # in practice reads are long so few segments pay the k-1 overlap; the
        # budget is ENFORCED by add_read's segment cap and _add_segment's
        # flush check (advisor r2: an unconditional P-position split
        # overflowed this buffer for k <= 16, corrupting the native encoder).
        self.CW = self._cw_words(pmax, self.R, k)
        # packed single-upload layout offsets (see make_stream_step)
        self._o1 = 2 + self.R
        self._o2 = self._o1 + self.R // 32 + 1
        self._o3 = self._o2 + pmax // 32 + 1
        self._seqs = []  # (bytes, is_read_start)
        self._pending = 0
        self._chars = 0
        self._carry = None
        self._inflight = []  # queued (device outputs, starts_fresh) per chunk
        self._no_ladder = False  # subclasses with fixed step shapes set True
        # upload pipeline (see _step); ShardedStream overrides _step and
        # never uses it
        import os

        self._pipe = None
        if os.environ.get("SSHASH_STREAM_PIPELINE", "1") not in ("", "0"):
            import threading
            from concurrent.futures import ThreadPoolExecutor

            self._pipe = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="sshash-upload")
            self._pipe_slots = threading.Semaphore(3)
        self.report = dict.fromkeys(
            ["num_kmers", "num_positive_kmers", "num_negative_kmers",
             "num_invalid_kmers", "num_searches", "num_extensions"], 0)

    @staticmethod
    def _cw_words(pmax, rmax, k):
        # capacity must fit ONE full-P single segment (long reads /
        # multiline genomes — otherwise a genome splits into multiple
        # chunks that each pay the full P-shaped kernel); beyond that,
        # budget half the all-R worst case (short-read slack)
        chars = max((pmax + rmax * (k - 1) + 1) // 2, pmax + k - 1 + 16)
        return (chars + 15) // 16 + 2

    def add_read(self, seq):
        k = self.k
        n = len(seq)
        if n < k:
            return
        # split long reads into segments with k-1 char overlap (the
        # reference's multiline buffer carry, src/query.cpp:28-37); a segment
        # must fit BOTH the position budget P and the char budget CW*16
        # (which is below P + k - 1 for small k — see __init__)
        seg = min(self.P, self.CW * 16 - (k - 1))
        # the device counter derivations assume a non-read-start segment can
        # only START a chunk (lane 0): derive_fast/derive_corr exclude
        # segment-start anchors from group-crossing extensions on that
        # basis. It holds because long-read splits are exactly P positions
        # (_cw_words budgets CW*16 >= P + k - 1 + 16, so seg == P) — a
        # tighter char budget would silently undercount num_extensions,
        # so this must survive python -O (no assert).
        if seg != self.P:
            raise ValueError(
                f"char budget allows segments of only {seg} < P={self.P} "
                f"positions (CW={self.CW}); the counter derivation requires "
                f"exact-P long-read splits — widen _cw_words")
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
        from . import native

        k = self.k
        seqs = [s for s, _ in self._seqs]
        starts_flag = np.array([f for _, f in self._seqs], dtype=bool)
        self._seqs = []
        count = self._pending
        self._pending = 0
        self._chars = 0

        # pick the smallest compiled shape that fits this batch (tail
        # chunks would otherwise pay the full-width kernel; each shape
        # compiles once and is cached on the engine)
        P_eff = self.P
        chars_total = sum(len(s) for s in seqs)
        sh = self.rmax_shift
        while not self._no_ladder and P_eff // 4 >= count \
                and P_eff // 4 >= 1 << 16 \
                and len(seqs) <= max(16, (P_eff // 4) >> sh) \
                and chars_total <= self._cw_words(
                    P_eff // 4, max(16, (P_eff // 4) >> sh), k) * 16:
            P_eff //= 4
        # R ladder: short-read chunks rarely fill R = P>>sh segments, and
        # rnpos is R uint32s of upload (44% of the bundled-SRR chunk at the
        # default shift) — shrink R in 4x steps while the actual segment
        # count and char budget still fit
        while not self._no_ladder and max(16, P_eff >> (sh + 2)) >= len(seqs) \
                and (P_eff >> (sh + 2)) >= 16 \
                and chars_total <= self._cw_words(
                    P_eff, max(16, P_eff >> (sh + 2)), k) * 16:
            sh += 2
        if P_eff != self.P or sh != self.rmax_shift:
            sub = _DeviceStream(self.engine, k, pmax=P_eff, rmax_shift=sh)
            if getattr(self, "_capture", None) is not None:
                sub._capture = self._capture  # keep the profiling hook live
            sub._seqs = [(s, f) for (s, f) in zip(seqs, starts_flag)]
            sub._pending = count
            sub._chars = sum(len(s) for s in seqs)
            sub.flush()
            self._inflight.extend(sub._inflight)
            return

        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        ends = np.cumsum(lens)
        cstarts = ends - lens
        npos = lens - k + 1
        total = int(npos.sum())
        assert total == count

        words32 = np.zeros(self.CW, dtype=np.uint32)
        valid_bits = np.zeros(self.P // 32 + 1, dtype=np.uint32)
        joined = b"".join(seqs)
        # the native encoder writes len(joined) chars into words32 with no
        # bounds checks; the budget must hold by construction
        assert len(joined) <= self.CW * 16, (len(joined), self.CW)
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
        rnpos = np.zeros(R, dtype=np.uint32)
        rnpos[: len(lens)] = npos.astype(np.uint32)
        fb = np.packbits(starts_flag, bitorder="little")
        rfirst = np.zeros(R // 32 + 1, dtype=np.uint32)
        rfirst[: (len(fb) + 3) // 4] = np.pad(fb, (0, (-len(fb)) % 4)).view(np.uint32)

        out = self._step(self.engine.arrs, words32, rnpos, rfirst,
                         valid_bits, np.uint32(count), np.uint32(len(lens)))
        # defer the scalar fetch: dispatches stay queued on the device so
        # consecutive chunks pipeline; results fold at finalize()
        self._inflight.append((out, bool(starts_flag[0])))

    def _fold(self, out, chunk_starts_fresh):
        out = np.asarray(out)  # (3, 4): ONE device round trip per chunk
        counters, lane0, lastv = out[0], out[1], out[2]
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
        import jax

        from concurrent.futures import Future

        # resolve pipelined uploads to device outputs (order is list order,
        # so the carry stitch is unaffected by completion order)
        self._inflight = [(o.result() if isinstance(o, Future) else o, fresh)
                          for o, fresh in self._inflight]
        if self._pipe is not None:
            self._pipe.shutdown(wait=True)
            self._pipe = None

        if len(self._inflight) > 1 and all(
                isinstance(o, jax.Array) for o, _ in self._inflight):
            # ONE device round trip for all queued chunk results (each
            # separate (3,4) fetch pays the ~40ms tunnel round trip);
            # ShardedStream's deferred _ChunkRow handles keep the per-chunk
            # path (their group dispatch already batches)
            outs = np.asarray(self._jnp.stack([o for o, _ in self._inflight]))
            for out, (_, fresh) in zip(outs, self._inflight):
                self._fold(out, fresh)
        else:
            for out, fresh in self._inflight:
                self._fold(out, fresh)
        self._inflight = []
        r = self.report
        assert r["num_kmers"] == (
            r["num_positive_kmers"] + r["num_negative_kmers"] + r["num_invalid_kmers"])
        return dict(r)


def streaming_query_from_file(dictionary, path, multiline=False, fmt=None,
                              use_device=False, chunk=None, rmax_shift=None):
    """Run streaming membership queries; returns the report dict of
    streaming_query_report (reference util.hpp:29-36) plus timing.
    chunk: positions per batch (device default 2^22 — big chunks amortize
    the per-dispatch cost; host default 2^18). rmax_shift: log2(P/R) segment
    budget; defaults to 12 for multiline (few long records — minimizes
    upload bytes) and 4 otherwise (short-read fastq)."""
    index = dictionary.index
    t0 = time.perf_counter()
    if use_device:
        engine = dictionary.to_device()
        if rmax_shift is None:
            rmax_shift = 12 if multiline else 4
        batcher = _DeviceStream(engine, index.k,
                                pmax=max(chunk or (1 << 22), 1 << 16),
                                rmax_shift=rmax_shift)
    else:
        batcher = _Batcher(index, _host_lookup(index), index.k,
                           chunk=chunk or (1 << 18))
    for seq in parse_reads(path, fmt=fmt, multiline=multiline):
        batcher.add_read(seq)
    report = batcher.finalize()
    report["elapsed_millisec"] = (time.perf_counter() - t0) * 1e3
    return report
