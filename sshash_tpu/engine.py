"""JAX device query engine — batched, jitted, TPU-native.

The index lives on device as a pytree of uint32 arrays; every query API is a
large-batch array program. The design minimizes DEPENDENT GATHER ROUNDS
(each round costs a full-batch random-access pass over HBM):

  * minimizer computation: unrolled window scan, pure VPU (ops/packed.py);
  * MPHF evaluation: ONE pilot gather — tables are re-keyed by the raw hash
    slot at load (_expand_to_slots), so no remap gather or minimal-position
    fix-up (semantics equal to mphf.MPHF.eval_hashes);
  * codeword decode + first candidate: ONE row gather from cw_row[slot] =
    [status|b<<2, a, candidate0] (bit semantics of reference
    sparse_and_skew_index.hpp:112-137 / build_sparse_and_skew_index.cpp);
  * candidate 0 verification: one packed-string window read that doubles as
    the minimizer-guard read (spss:47-65), guard m-mer extracted in-register
    at a dynamic bit offset; a failed guard deactivates the lane (no
    candidate can match, see lookup_with_info);
  * candidates 1..size-1 (midload) are COMPACTED into dense (lane, j) pair
    windows — work proportional to actual bucket content, not
    max_bucket x batch;
  * the regular-mode RC fallback and canonical tie retry run as compacted
    windows over actual misses/ties (dense full-width pass only for
    mostly-miss batches — nested while_loops schedule poorly);
  * id resolution rides the SAME candidate-row gather: every fused row
    carries a [sid0, ep0, ep1, ep2] resolve quad for its start span
    (replaces Elias-Fano locate / binary search, offsets.hpp:41-65 —
    round 3 removed the last dependent resolve gather).

64-bit quantities are (hi, lo) uint32 pairs (ops/u64.py) — no int64 on
device. Char offsets / ids are uint32 (one shard handles < 2^32 chars; larger
sets shard by minimizer slot range across devices, see parallel/).
"""



import jax
import jax.numpy as jnp
import numpy as np

from . import hashing as H
from . import kmer as K
from .constants import BACKWARD_ORIENTATION, FORWARD_ORIENTATION, INVALID_UINT64
from .ops import packed as P
from .ops import u64 as u

U32 = jnp.uint32
I32 = jnp.int32
INVALID32 = np.uint32(0xFFFFFFFF)
_NUM_SKEW = 8


def _env_int(name, default, minimum=1):
    """Perf knobs live in StaticCfg with the environment as override (one
    visible home; they bake into the jitted kernels at StaticCfg
    construction). Invalid values fail loudly, never silently default."""
    import os

    raw = os.environ.get(name, "")
    if raw == "":
        return default
    try:
        v = int(raw)
    except ValueError as e:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from e
    if v < minimum:
        raise ValueError(f"{name} must be >= {minimum}, got {v}")
    return v


def _env_flag(name):
    import os

    return os.environ.get(name, "") not in ("", "0")


def use_row_v2(index):
    """Row format v2 ("rebased rows"): the per-candidate resolve quad stores
    [kid0, sid0, rel_ep1] — kmer-ID-space values — instead of the v1 char
    offsets [sid0, ep0, ep1, ep2]. Verification never needed global char
    offsets (the packed-string window rides the row; only the in-window bit
    offset matters), so v2 rows serve indexes whose CHAR space exceeds
    uint32 (>= 2^32 chars) as long as ids fit uint32 (< 2^32 kmers ≈ 4.29B,
    beyond the reference's largest published set, human k63 2.77B —
    include/dictionary.hpp:28-136 uses 64-bit ids throughout). v2 rows are
    also one word narrower per candidate block (HBM locality at GB-scale
    tables). fields="full" (string bounds) needs the v1 quad; v2 engines
    serve the id-returning contract (the reference's plain lookup(),
    dictionary.hpp:34) plus windowed access.

    SSHASH_ROW_V2=1 forces v2 on small indexes (A/B + equivalence tests)."""
    return index.num_chars >= 1 << 32 or _env_flag("SSHASH_ROW_V2")


def use_c1(index):
    """Carry candidate 1 in the fused row? It pays cand_block_width u32/row
    for a gather-free second probe — a win when size>=2 buckets are common
    (salmonella m17: ~14% of buckets) and pure row bloat at human-config m
    (m21: 99.998% singletons; the round-5 200M A/B measured 12-col no-c1
    rows FASTER, 60.8 vs 62.0 ns, at ~45% fewer hot bytes — BENCH_NOTES).
    Gate on the index's own bucket histogram: keep c1 when >= 0.1% of
    buckets hold 2+ positions. Both sides are chip-measured: salmonella
    m17 sits at 0.31% multi and NEEDS c1 (dropping it measured 78 vs 47 ns
    positive — the size-2 buckets attract ~17% of query lanes), while m21
    builds sit at ~0.002% where the block is pure row bloat (12-col rows
    measured faster, 58.8 vs 62.0 ns at 200M). Indexes without a histogram
    (pre-round-3 files) keep it for compatibility. SSHASH_C1=1 forces on,
    SSHASH_NO_C1=1 forces off."""
    if _env_flag("SSHASH_NO_C1"):
        return False
    if _env_flag("SSHASH_C1"):
        return True
    hist = index.stats.get("bucket_size_histogram") or {}
    nmini = int(index.stats.get("num_minimizers", 0))
    singles = int(hist.get("1", hist.get(1, 0)))
    if not (nmini and hist):
        return True
    return (1.0 - singles / nmini) >= 0.001


def row_width(cfg):
    """Fused cw_row width in u32 words: [status|b, a] + 1 or 2 candidate
    blocks, each [ext_off, vbits, window, resolve quad]. SSHASH_NO_C1=1
    drops the candidate-1 block (size-2 buckets then ride the pair sweep)
    — roughly halves the hot-row bytes, the HBM-locality lever at GB-scale
    tables (round-5 A/B, BENCH_NOTES)."""
    return 2 + (2 if cfg.c1_in_row else 1) * cand_block_width(cfg)


def cand_block_width(cfg):
    return 1 + cfg.vbits_words + cfg.win_words + cfg.quad_w


def _expand_to_slots(arr, mphf):
    """Re-index an array keyed by MINIMAL mphf position into one keyed by the
    raw hash SLOT in [0, table_size): slot < n reads arr[slot], overflow slots
    read through the remap. Evaluation then needs no remap gather; untaken
    overflow slots alias arr[remap=0], bit-equal to the minimal eval's
    garbage for absent keys (mphf.py eval_hashes)."""
    from .mphf import PartitionedMPHF, _get

    if isinstance(mphf, PartitionedMPHF):
        return mphf.expand_to_slots(arr)
    ts = max(1, mphf.table_size)
    out = np.zeros(ts, dtype=arr.dtype)
    n = min(mphf.n, len(arr))
    out[:n] = arr[:n]
    if ts > mphf.n and len(arr):
        rmp = _get(mphf.remap, np.arange(ts - mphf.n))
        out[mphf.n:] = arr[np.clip(rmp, 0, len(arr) - 1)]
    return out


def _access_C(index):
    """True max string crossings per 32-KMER-ID block (for make_access).
    Unlike char-offset space (where strings >= k chars bound crossings by
    32//k+1), a string can contribute a single kmer, so up to 32 strings
    can start inside one 32-id block — compute the real bound."""
    ep = index.string_endpoints.astype(np.int64)
    kmer_cum = ep - np.arange(len(ep)) * (index.k - 1)
    nk = int(index.num_kmers)
    if nk == 0:
        return 1
    blk = np.arange((nk + 31) // 32, dtype=np.int64) * 32
    lo = np.searchsorted(kmer_cum, blk, side="right")
    hi = np.searchsorted(kmer_cum, np.minimum(blk + 31, nk - 1), side="right")
    return max(1, int((hi - lo).max()))


def _acc_win_words(k, C):
    """Packed-string words covering every char a 32-id block's accesses can
    touch: offsets span [o_min, o_min + 31 + C*(k-1)] and each read takes k
    chars, from the word floor(o_min/16)."""
    return (31 + C * (k - 1) + k - 1 + 15) // 16 + 1


def _acc_windowed(k, C):
    """Static gate: fuse the char window into the access row only while the
    row stays within the cheap row-gather regime (w<=16 measured flat,
    scripts/profile_lookup.py); wide-k / fragmented-string indexes fall
    back to the 2-round row+chars path."""
    return 1 + C + _acc_win_words(k, C) <= 16


def _acc_rows(sidk32, kmer_cum, C, s32=None, k=None):
    """Fused per-32-id-block access rows [sid hint, kmer_cum[hint+1..hint+C]]
    — access(id) resolves its string in ONE row gather instead of a hint
    gather followed by a dependent kmer_cum window gather (the clip
    semantics match jnp.take(..., mode="clip") of the unfused path).

    When the geometry allows (_acc_windowed), the row ALSO carries the
    packed-string window covering every char the block can touch, so the
    whole access is ONE dependent gather round: row -> in-register word
    select + funnel shift (no strings32 gather at all)."""
    hint = sidk32.astype(np.int64)
    kidx = np.clip(hint[:, None] + np.arange(1, C + 1, dtype=np.int64)[None, :],
                   0, len(kmer_cum) - 1)
    cols = [sidk32[:, None], kmer_cum[kidx].astype(np.uint32)]
    if s32 is not None and _acc_windowed(k, C):
        Wa = _acc_win_words(k, C)
        o_min = np.arange(len(sidk32), dtype=np.int64) * 32 + hint * (k - 1)
        ws = o_min >> 4
        widx = np.clip(ws[:, None] + np.arange(Wa, dtype=np.int64)[None, :],
                       0, len(s32) - 1)
        cols.append(s32[widx])
    return np.concatenate(cols, axis=1)


def _device_arrays(index):
    """Host Index -> device pytree (all uint32).

    Capacity (reference include/dictionary.hpp:28-136 uses 64-bit ids and
    offsets; here ids/offsets are uint32 with format escalation):
      * kmers >= 2^31 switch the ids-mode pair scatter to two columns
        (StaticCfg.wide_ids) — everything else already addressed ids as
        full uint32, so e.g. human k31 (2.51B kmers, 2.82B chars) serves;
      * chars >= 2^32 switch to rebased v2 rows (use_row_v2): candidate
        resolution in kmer-ID space, no char offsets on the lookup path;
      * kmers >= 2^32-1 exceed uint32 ids (+ the INVALID sentinel) — that
        needs (hi, lo) id splits; fail loudly.
    """
    row_v2 = use_row_v2(index)
    if index.num_kmers >= (1 << 32) - 1:
        raise ValueError(
            f"device ids are uint32 (with 0xFFFFFFFF as the not-found "
            f"sentinel); this index has {index.num_kmers} kmers. Split the "
            f"input into sub-indexes below 2^32-1 kmers each.")
    from .index import decode_codeword

    status, a, b = decode_codeword(index.codewords)
    # midload: precompute absolute begin into mid_load_buckets
    mid = status == 1
    msize = b.astype(np.int64)
    mlist = a.astype(np.int64)
    mbegin = index.begin_buckets_of_size[np.where(mid, msize, 0)].astype(np.int64) + mlist * msize
    a = np.where(mid, mbegin.astype(np.uint64), a)

    # valid-start bitmask: bit o set iff a kmer may start at char offset o,
    # i.e. o+k <= end of o's string. Replaces the reference's per-candidate
    # offset_to_id acceptance (spss::_lookup_regular:227-235) with one
    # gather + bit test; ids resolve once after the candidate loop.
    ep = index.string_endpoints.astype(np.int64)
    delta = np.zeros(index.num_chars + 1, dtype=np.int32)
    np.add.at(delta, ep[:-1], 1)
    np.add.at(delta, ep[1:] - (index.k - 1), -1)
    vstart = np.cumsum(delta[:-1]) > 0

    kmer_cum64 = ep - np.arange(len(ep)) * (index.k - 1)
    nkb = (index.num_kmers + 31) // 32 + 1
    sidk32 = (np.searchsorted(kmer_cum64, np.arange(nkb, dtype=np.int64) * 32,
                              side="right") - 1).astype(np.uint32)

    f = index.minimizer_mphf
    s32 = K.pack_words_to_u32(index.strings64)
    # valid-start bits packed 32/word for the sequential iterator (bit o of
    # word o//32 == a kmer may start at char offset o); padded with zeros to
    # cover every sentinel word of strings32
    vpad = np.zeros(-(-16 * len(s32) // 32) * 32, dtype=bool)
    vpad[: len(vstart)] = vstart
    vstart32 = np.packbits(vpad, bitorder="little").view(np.uint32)
    # one row per raw MPHF slot: [status|b<<2, a, candidate0, vbits..,
    # window..]. candidate0 is precomputed (the singleton offset, or
    # mid_load[a] for midload) and the row carries the packed-string window
    # + valid-start bits around it — codeword decode, first-candidate fetch
    # AND its verification ride ONE row gather (cf. the measured TPU gather
    # cost model: row width <= 4 words is latency-free, scripts/
    # profile_lookup.py).
    sb = (status.astype(np.uint32) | (b.astype(np.uint32) << 2))
    mid_arr = np.asarray(index.mid_load_buckets).astype(np.uint32)
    cand0 = a.astype(np.uint32)
    midm = status == 1
    if len(mid_arr):
        cand0 = np.where(midm, mid_arr[np.clip(a.astype(np.int64), 0, len(mid_arr) - 1)], cand0)
    k, m = index.k, index.m
    kmw = k - m
    Ww = ((4 * k - 2 * m + 29) >> 5) + 1
    Wv = (kmw + 1 + 31) // 32
    QW = 3 if row_v2 else 4

    def fused_rows(dpos):
        """(n,) candidate char offsets -> (n, 1+Wv+Ww+QW) rows
        [col0, valid-start bits, packed-string window, resolve quad]
        — one gather verifies AND id-resolves a candidate entirely
        in-register. The candidate's possible kmer starts span
        [dpos-(k-m), dpos], shorter than any string (>= k chars), so at most
        ONE string boundary falls inside. Replaces the block-row sid_rows
        gather (reference offsets.hpp:41-65 locate analog) with
        row-resident data.

        v1 quad: col0 = dpos, quad = [sid0, ep0, ep1, ep2] (char offsets):
        sid = sid0 + (off >= ep1), (begin, end) = (ep0, ep1) or (ep1, ep2).

        v2 quad (rebased rows, >= 2^32-char capable): col0 = ext_off =
        dpos - word-aligned window start (all the verifier ever needed from
        dpos), quad = [kid0, sid0, rel_ep1] where kid0 = dpos - sid0*(k-1)
        (kmer-ID space, uint32 for any < 2^32-kmer index) and rel_ep1 =
        clip(ep1 - (dpos-(k-m)), 0, k-m+1): a match at position try p has
        kid = kid0 - p - over*(k-1), sid = sid0 + over with
        over = (k-m-p) >= rel_ep1 — no char offsets anywhere.

        Chunked: the (n, k-m+1) intermediate offset matrices would peak at
        tens of GB for the 263M-minimizer 2.2B-kmer build; 16M-row chunks
        bound the transient to ~2 GB with identical output."""
        CH = 16 << 20
        if len(dpos) > CH:
            return np.concatenate([fused_rows(dpos[i : i + CH])
                                   for i in range(0, len(dpos), CH)])
        c0 = dpos.astype(np.int64)
        wlo = np.maximum(c0 - kmw, 0) >> 4
        win = s32[np.clip(wlo[:, None] + np.arange(Ww)[None, :], 0, len(s32) - 1)]
        offs = c0[:, None] - kmw + np.arange(kmw + 1)[None, :]
        okoff = (offs >= 0) & (offs < len(vstart))
        bits = np.where(okoff, vstart[np.clip(offs, 0, len(vstart) - 1)], False)
        vb8 = np.packbits(bits, axis=1, bitorder="little")
        vbp = np.zeros((len(c0), Wv * 4), dtype=np.uint8)
        vbp[:, : vb8.shape[1]] = vb8
        sid0 = np.searchsorted(ep, np.maximum(c0 - kmw, 0), side="right") - 1
        if row_v2:
            ep1 = ep[np.clip(sid0 + 1, 0, len(ep) - 1)]
            kid0 = (c0 - sid0 * (k - 1)).astype(np.uint32)
            rel = np.clip(ep1 - (c0 - kmw), 0, kmw + 1).astype(np.uint32)
            rsv = np.stack([kid0, sid0.astype(np.uint32), rel], axis=1)
            col0 = (c0 - (wlo << 4)).astype(np.uint32)
        else:
            eidx = np.clip(sid0[:, None] + np.arange(3)[None, :], 0, len(ep) - 1)
            rsv = np.concatenate([sid0[:, None].astype(np.uint32),
                                  ep[eidx].astype(np.uint32)], axis=1)
            col0 = dpos.astype(np.uint32)
        return np.concatenate([col0[:, None],
                               np.ascontiguousarray(vbp).view(np.uint32), win,
                               rsv], axis=1)

    heavym = status == 2
    c0rows = fused_rows(np.where(heavym, 0, cand0.astype(np.int64)).astype(np.uint32))
    c0rows[heavym, 1:] = 0
    c0rows[heavym, 0] = cand0[heavym]
    # candidate 1 rides the SAME row: buckets of size 2 (the overwhelming
    # majority of non-singletons at any sane m — e.g. salmonella m17 is
    # 99.4% singleton / 0.5% size-2 / 0.1% bigger by lane weight) then
    # resolve entirely in the one codeword gather; the compacted pair sweep
    # only serves the size>=3 tail
    cols = [sb, a.astype(np.uint32)] \
        + [c0rows[:, i] for i in range(c0rows.shape[1])]
    c1rows = None
    if use_c1(index):
        has2 = midm & (b >= 2)
        cand1 = np.zeros_like(cand0)
        if len(mid_arr):
            cand1 = np.where(
                has2,
                mid_arr[np.clip(a.astype(np.int64) + 1, 0, len(mid_arr) - 1)],
                np.uint32(0))
        c1rows = fused_rows(cand1)
        c1rows[~has2, :] = 0
        cols += [c1rows[:, i] for i in range(c1rows.shape[1])]
    # stream columns into a preallocated table (np.stack would duplicate
    # the ~22 GB slot-expanded matrix of a 2.2B-kmer build)
    col0 = _expand_to_slots(cols[0], f)
    cw_row = np.empty((len(col0), len(cols)), np.uint32)
    cw_row[:, 0] = col0
    del col0
    for j in range(1, len(cols)):
        cw_row[:, j] = _expand_to_slots(cols[j], f)
    del cols, c0rows, c1rows
    mid_rows = fused_rows(mid_arr) \
        if len(mid_arr) else np.zeros((1, 1 + Wv + Ww + QW), np.uint32)
    heavy_arr = np.asarray(index.heavy_load_buckets).astype(np.uint32)
    heavy_rows = fused_rows(heavy_arr) \
        if len(heavy_arr) else np.zeros((1, 1 + Wv + Ww + QW), np.uint32)
    kmer_cum32 = (
        index.string_endpoints.astype(np.int64)
        - np.arange(len(index.string_endpoints)) * (index.k - 1)
    ).astype(np.uint32)
    arrs = {
        "strings32": s32,
        "vstart32": vstart32,
        "sidk32": sidk32,
        "kmer_cum": kmer_cum32,
        "acc_rows": _acc_rows(sidk32, kmer_cum32, _access_C(index),
                              s32=s32, k=index.k),
        "cw_row": cw_row,
        "mid_rows": mid_rows,
        "heavy_rows": heavy_rows,
        # hot-path tables expand at load to the smallest divisor-of-32
        # field width: the gather stays single-round (a field never
        # straddles a word) and the replicated-at-scale pilots shrink 2-8x
        "pilots": _nz(_pack_pilots(_pilots_u32(f), pilot_width(f))),
    }
    from .mphf import PartitionedMPHF

    if isinstance(f, PartitionedMPHF):
        smix = f.seedmixes()
        arrs["mphf_seedrows"] = np.stack(
            [(smix >> np.uint64(32)).astype(np.uint32),
             (smix & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1)

    # skew partitions: concatenated arrays + per-partition params (8 slots);
    # re-keyed by raw slot (no remap gather at eval). When the index carries
    # hindex (>= v1.2 builds), each slot maps straight to a FUSED heavy row
    # (sk_hrows[pos_off[pid] + slot]) — one gather fewer than the
    # positions -> heavy_rows chain, and slot-range shardable.
    use_hrows = (len(heavy_arr) > 0 and len(index.skew_partitions) > 0
                 and all(p.hindex is not None for p in index.skew_partitions))
    # >= v1.2 builds use PartitionedMPHF for every size class (P=1 when
    # small): uniform partitioned eval, human-scale classes supported
    from .mphf import PartitionedMPHF as _PMPHF

    use_part_skew = (len(index.skew_partitions) > 0
                     and all(isinstance(p.mphf, _PMPHF)
                             for p in index.skew_partitions if p.mphf.n > 0)
                     and any(p.mphf.n > 0 for p in index.skew_partitions))
    sk_pilots, sk_aux, sk_seedrows = [], [], []
    # one static field width across size classes (pilot_off stays a plain
    # word offset); each partition packs to whole words
    sk_w = max([pilot_width(p.mphf)
                for p in index.skew_partitions[:_NUM_SKEW]], default=32)
    params = {name: np.zeros(_NUM_SKEW, dtype=np.uint32) for name in
              ("table", "nbuckets", "seedmix_hi", "seedmix_lo",
               "pilot_off", "pos_off", "np2", "seed_off")}
    params["nbuckets"][:] = 1
    params["table"][:] = 1
    params["np2"][:] = 1
    for i, part in enumerate(index.skew_partitions[:_NUM_SKEW]):
        fp = part.mphf
        smix = int(H.splitmix64(np.uint64(fp.seed)))
        params["seedmix_hi"][i] = smix >> 32
        params["seedmix_lo"][i] = smix & 0xFFFFFFFF
        params["pilot_off"][i] = sum(len(x) for x in sk_pilots)
        params["pos_off"][i] = sum(len(x) for x in sk_aux)
        if use_part_skew:
            params["seed_off"][i] = sum(len(x) for x in sk_seedrows)
            if isinstance(fp, _PMPHF):
                params["table"][i] = max(1, fp.part_table)
                params["nbuckets"][i] = fp.part_buckets
                params["np2"][i] = fp.num_partitions
                smx = fp.seedmixes()
                sk_seedrows.append(np.stack(
                    [(smx >> np.uint64(32)).astype(np.uint32),
                     (smx & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1))
            else:  # empty class placeholder
                sk_seedrows.append(np.zeros((1, 2), np.uint32))
        else:
            params["table"][i] = max(1, fp.table_size)
            params["nbuckets"][i] = fp.num_buckets
        sk_pilots.append(_pack_pilots(_pilots_u32(fp), sk_w))
        sk_aux.append(_expand_to_slots(part.hindex if use_hrows
                                       else part.positions, fp))
    if use_part_skew:
        arrs["sk_seedrows"] = (np.concatenate(sk_seedrows) if sk_seedrows
                               else np.zeros((1, 2), np.uint32))
    arrs["sk_pilots"] = _nz(np.concatenate(sk_pilots) if sk_pilots else np.zeros(0, np.uint32))
    if use_hrows:
        allh = np.concatenate(sk_aux) if sk_aux else np.zeros(0, np.uint32)
        gidx = np.clip(allh.astype(np.int64), 0, max(0, len(heavy_arr) - 1))
        arrs["sk_hrows"] = (fused_rows(heavy_arr[gidx]) if len(allh)
                            else np.zeros((1, 1 + Wv + Ww + QW), np.uint32))
        # the positions->heavy_rows chain is dead in this mode
        arrs["heavy_rows"] = np.zeros((1, 1 + Wv + Ww + QW), np.uint32)
    else:
        arrs["sk_positions"] = _nz(np.concatenate(sk_aux) if sk_aux else np.zeros(0, np.uint32))
    for name, v in params.items():
        arrs[f"sk_{name}"] = v

    if index.weights is not None:
        w = index.weights
        arrs["w_value_ids"] = w.interval_value_ids.astype(np.uint32)
        arrs["w_endpoints"] = w.interval_endpoints.astype(np.uint32)
        arrs["w_dictionary"] = w.dictionary.astype(np.uint32)
    # device row gathers cast row indices to int32 (jnp.take above): every
    # table must stay int32-row-addressable, not just < 2^32 — same
    # fail-loudly contract as the chars/ids guard at the top
    for name, a in arrs.items():
        if a.shape[0] >= 1 << 31:
            raise ValueError(
                f"device table {name!r} has {a.shape[0]} rows (>= 2^31); "
                f"row gathers address int32. Shard the index over a mesh "
                f"(parallel.ShardedEngine) instead.")
    return arrs


def vstart32_from_index(index):
    """The packed valid-start bitmask alone (no slot expansion): bit o set
    iff a kmer may start at char offset o. Used to top up host_arrs caches
    written before the sequential iterator landed, and cheap even at 200M
    chars (k-1 vectorized scatters over string ends + one packbits)."""
    nW = len(K.pack_words_to_u32(index.strings64))
    nbits = -(-16 * nW // 32) * 32
    v = np.zeros(nbits, dtype=bool)
    v[: index.num_chars] = True
    ep = index.string_endpoints.astype(np.int64)[1:]
    for j in range(1, index.k):
        v[ep - j] = False
    return np.packbits(v, bitorder="little").view(np.uint32)


def _pilots_u32(mphf):
    from .compact import CompactVector

    p = mphf.pilots
    return p.to_array(np.uint32) if isinstance(p, CompactVector) else p


def pilot_width(mphf):
    """Device pilot field width: the smallest divisor of 32 in {4,8,16,32}
    that fits every pilot. Divisor widths never straddle a u32 word, so the
    packed read is the SAME single gather plus a shift+mask — the pilots
    table (the big replicated array at multi-chip scale) shrinks 2-8x."""
    from .compact import CompactVector

    p = mphf.pilots
    if isinstance(p, CompactVector):
        b = p.width
    else:
        b = int(np.max(p, initial=0)).bit_length() if len(p) else 1
    for w in (4, 8, 16):
        if b <= w:
            return w
    return 32


def _pack_pilots(vals, w):
    """Pack u32 pilot values (< 2^w) into u32 words, 32//w per word,
    little-end first; pads to a whole word."""
    if w == 32:
        return vals.astype(np.uint32)
    ppw = 32 // w
    v = np.pad(vals, (0, (-len(vals)) % ppw)).astype(np.uint32)
    v = v.reshape(-1, ppw) << (np.arange(ppw, dtype=np.uint32) * w)
    return np.bitwise_or.reduce(v, axis=1)


def _pilot_read(cfg_w, words, bucket, word_off=None):
    """pilot = packed_words[word_off + bucket] at static field width cfg_w
    (word_off is a per-lane WORD offset for concatenated per-partition
    tables; each partition's segment is whole-word aligned)."""
    if cfg_w == 32:
        idx = bucket if word_off is None else word_off + bucket
        return _take(words, idx)
    ppw = 32 // cfg_w
    shift = ppw.bit_length() - 1
    widx = bucket >> U32(shift)
    if word_off is not None:
        widx = word_off + widx
    word = _take(words, widx)
    sub = (bucket & U32(ppw - 1)) * U32(cfg_w)
    return (word >> sub) & U32((1 << cfg_w) - 1)


def _nz(x):
    """Never ship zero-length arrays to device (gathers clip into them)."""
    return x if len(x) else np.zeros(1, dtype=x.dtype if hasattr(x, "dtype") else np.uint32)


def _take(arr, idx):
    return jnp.take(arr, idx.astype(I32), mode="clip")


def u64_take(v, idx):
    """Gather a u64 (hi, lo) pair by integer lanes."""
    return u.u64(jnp.take(v.hi, idx, mode="clip"), jnp.take(v.lo, idx, mode="clip"))


class StaticCfg:
    """Hashable static config closed over by the jitted kernels.

    Perf knobs (environment override -> baked at construction; one home for
    what round 3-4 scattered across os.environ reads, VERDICT r4 weak #4):

      SSHASH_PAIR_DIV   pair-sweep window = B/div (default 64; measured
                        div 8/32/64/256/1024 = 73.5/51.8/50.1/56.8/89.7 ns,
                        scripts/exp_r4_lookup.py)
      SSHASH_FB_DIV     regular-mode RC-fallback window = B/div (default 2:
                        one window covers any <=50%-RC workload)
      SSHASH_TIE_RETRY  =1 forces the canonical tie retry as a cond'd probe
                        instead of the in-probe position-try fold
      SSHASH_STREAM_WDIV streaming low-hit fallback window = P/div (64)
      SSHASH_STREAM_CDIV streaming corr-window capacity = P/div (64); the
                        fast-path miss-count threshold tracks it
      SSHASH_STREAM_PIPELINE =0 disables the host->device upload pipeline
                        thread (streaming._DeviceStream)
      SSHASH_ROW_V2     =1 forces rebased rows on small indexes (see
                        use_row_v2)
      SSHASH_WIDE_IDS   =1 forces the 2-column pair scatter (auto for
                        >= 2^31-kmer indexes whose ids don't fit the packed
                        31-bit column)
      SSHASH_REG_DUAL_OFF =1 disables the regular-mode fused dual-strand
                        probe (falls back to the windowed RC second pass)
    """

    def __init__(self, index):
        self.k = index.k
        self.m = index.m
        self.canonical = index.canonical
        self.W = P.num_words32(index.k)
        # pair-sweep window = B/pair_div: the window should be sized to the
        # lanes that actually need a sweep. Multi-rich buckets (c1 kept —
        # salmonella m17) measured div 64 optimal; singleton-rich indexes
        # (c1 auto-dropped — human-config m21) have a ~0.003% sweep tail
        # and narrow windows win: div 512 = 58.8 vs div 64 = 59.4 ns at
        # 200M canonical (round-5 sweep, BENCH_NOTES).
        self.pair_div = _env_int("SSHASH_PAIR_DIV",
                                 64 if use_c1(index) else 512)
        self.fb_div = _env_int("SSHASH_FB_DIV", 2)
        self.tie_retry = _env_flag("SSHASH_TIE_RETRY")
        self.stream_wdiv = _env_int("SSHASH_STREAM_WDIV", 64)
        self.stream_cdiv = _env_int("SSHASH_STREAM_CDIV", 64)
        self.row_v2 = use_row_v2(index)
        self.quad_w = 3 if self.row_v2 else 4
        # ids >= 2^31 don't fit the packed single-column pair scatter
        self.wide_ids = (index.num_kmers >= 1 << 31
                         or _env_flag("SSHASH_WIDE_IDS"))
        self.reg_dual = not _env_flag("SSHASH_REG_DUAL_OFF")
        self.c1_in_row = use_c1(index)
        self.num_chars = int(index.num_chars)
        # fused-row geometry: each codeword row carries the packed-string
        # window around candidate 0 (chars [16*(max(0,cand0-(k-m))>>4),
        # cand0+k)) plus the valid-start bits for its k-m+1 possible kmer
        # starts — candidate-0 verification then needs NO extra gather.
        self.kmw = index.k - index.m
        self.win_words = ((4 * index.k - 2 * index.m + 29) >> 5) + 1
        self.vbits_words = (self.kmw + 1 + 31) // 32
        # windows start word-aligned at max(0, cand-(k-m)) & ~15, so the
        # in-window bit offset is bounded: its start word takes few values
        self.max_start_word = (2 * (15 + self.kmw)) >> 5
        magic = int(H.mixer_magic(index.seed))
        self.magic = magic
        f = index.minimizer_mphf
        from .mphf import PartitionedMPHF

        self.mphf_partitioned = isinstance(f, PartitionedMPHF)
        self.mphf_n = f.n
        self.mphf_table = max(1, f.table_size)
        self.mphf_nbuckets = f.num_buckets
        self.mphf_seedmix = int(H.splitmix64(np.uint64(f.seed)))
        self.pilot_w = pilot_width(f)
        self.sk_pilot_w = max([pilot_width(p.mphf)
                               for p in index.skew_partitions[:_NUM_SKEW]],
                              default=32)
        if self.mphf_partitioned:
            self.mphf_P = f.num_partitions
            self.mphf_part_table = max(1, f.part_table)
            self.mphf_part_buckets = f.part_buckets
        self.golden = [(i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF for i in range(self.W)]
        self.max_bucket_size = index.stats.get("max_bucket_size", 1 << 6)
        # static: no skew partitions -> HEAVYLOAD never occurs, skip its kernel
        self.has_skew = any(p.mphf.n > 0 for p in index.skew_partitions)
        # >= v1.2 builds carry hindex: heavy lanes resolve slot -> fused row
        # directly (one gather fewer; slot-range shardable)
        self.skew_hrows = (self.has_skew
                           and all(p.hindex is not None
                                   for p in index.skew_partitions))
        # >= v1.2 builds use PartitionedMPHF for skew size classes
        from .mphf import PartitionedMPHF as _PM

        self.skew_partitioned = (self.has_skew
                                 and all(isinstance(p.mphf, _PM)
                                         for p in index.skew_partitions
                                         if p.mphf.n > 0))
        # set by ShardedEngine when the skew rows shard over a mesh axis
        self.bucket_axis = None
        self.access_C = _access_C(index)


def mphf_eval_minimizer(cfg, arrs, minval):
    """Batched minimizer-MPHF eval returning the raw hash SLOT in
    [0, table_size); codeword arrays are slot-keyed (_expand_to_slots), so
    no remap gather is needed (cf. mphf.MPHF.eval_hashes).

    Partitioned layout (mphf.PartitionedMPHF): uniform per-partition
    geometry keeps this branch-free — one extra tiny row gather for the
    partition seedmix, then the same pilot gather."""
    mh = u.splitmix64(u.xor(minval, u.const64(cfg.mphf_seedmix)))
    if getattr(cfg, "mphf_partitioned", False):
        pid = u.mulhi32(mh.hi, U32(cfg.mphf_P))
        row = jnp.take(arrs["mphf_seedrows"], pid.astype(I32), axis=0, mode="clip")
        h2 = u.splitmix64(u.xor(mh, u.u64(row[:, 0], row[:, 1])))
        bucket = pid * U32(cfg.mphf_part_buckets) + u.mulhi32(
            h2.hi, U32(cfg.mphf_part_buckets))
        pilot = _pilot_read(cfg.pilot_w, arrs["pilots"], bucket)
        local = u.mulhi32(u.fmix32(h2.lo ^ u.fmix32(pilot)),
                          U32(cfg.mphf_part_table))
        return pid * U32(cfg.mphf_part_table) + local
    bucket = u.mulhi32(mh.hi, U32(cfg.mphf_nbuckets))
    pilot = _pilot_read(cfg.pilot_w, arrs["pilots"], bucket)
    return u.mulhi32(u.fmix32(mh.lo ^ u.fmix32(pilot)), U32(cfg.mphf_table))


def skew_slot(cfg, arrs, kmers32, pid):
    """Per-size-class kmer-MPHF slot of each (canonicalized) kmer (reference
    skew_index::lookup hashing, sparse_and_skew_index.hpp:34-44). v1.2
    classes are PartitionedMPHFs (P=1 when small): one extra tiny seedrow
    gather, mirroring mphf_eval_minimizer's partitioned branch."""
    seedmix = u.u64(_take(arrs["sk_seedmix_hi"], pid), _take(arrs["sk_seedmix_lo"], pid))
    h = u.hash64_words(kmers32, seedmix, cfg.golden)
    nb = _take(arrs["sk_nbuckets"], pid)
    table = _take(arrs["sk_table"], pid)
    if getattr(cfg, "skew_partitioned", False):
        pid2 = u.mulhi32(h.hi, _take(arrs["sk_np2"], pid))
        row = jnp.take(arrs["sk_seedrows"],
                       (_take(arrs["sk_seed_off"], pid) + pid2).astype(I32),
                       axis=0, mode="clip")
        h2 = u.splitmix64(u.xor(h, u.u64(row[:, 0], row[:, 1])))
        bucket = pid2 * nb + u.mulhi32(h2.hi, nb)
        pilot = _pilot_read(cfg.sk_pilot_w, arrs["sk_pilots"], bucket,
                            word_off=_take(arrs["sk_pilot_off"], pid))
        local = u.mulhi32(u.fmix32(h2.lo ^ u.fmix32(pilot)), table)
        return pid2 * table + local
    bucket = u.mulhi32(h.hi, nb)
    pilot = _pilot_read(cfg.sk_pilot_w, arrs["sk_pilots"], bucket,
                        word_off=_take(arrs["sk_pilot_off"], pid))
    return u.mulhi32(u.fmix32(h.lo ^ u.fmix32(pilot)), table)


def skew_eval(cfg, arrs, kmers32, cw_a, pid):
    """HEAVYLOAD resolution via per-partition kmer MPHFs. Returns the INDEX
    into heavy_rows (the caller gathers the fused candidate row). Legacy
    (pre-hindex) path: slot -> pos-in-bucket -> cw_a + pos."""
    slot = skew_slot(cfg, arrs, kmers32, pid)
    pos_in_bucket = _take(arrs["sk_positions"], _take(arrs["sk_pos_off"], pid) + slot)
    return cw_a + pos_in_bucket


def _empty_res(B, fields="full"):
    out = {
        "kmer_id": jnp.full((B,), INVALID32, dtype=U32),
        "kmer_orientation": jnp.full((B,), FORWARD_ORIENTATION, dtype=I32),
        "minimizer_found": jnp.ones((B,), dtype=bool),
    }
    if fields == "full":
        out.update({
            "kmer_id_in_string": jnp.full((B,), INVALID32, dtype=U32),
            "kmer_offset": jnp.full((B,), INVALID32, dtype=U32),
            "string_id": jnp.full((B,), INVALID32, dtype=U32),
            "string_begin": jnp.full((B,), INVALID32, dtype=U32),
            "string_end": jnp.full((B,), INVALID32, dtype=U32),
        })
    return out


def lookup_with_info(cfg, arrs, kmers32, kmers_rc32, minval, minpos, active0,
                     fields="full", minpos2=None, probe_light=False):
    """Shared probe kernel. Regular mode: kmers_rc32 is None.
    Canonical mode: candidates verified at two pos_in_kmer values against both
    strands (spss:237-275). Returns result dict (+ 'found').

    minpos2 (canonical): the OTHER strand's minimizer position where the two
    strand minimizer VALUES tie (equal elsewhere). A tie probes the SAME
    bucket (same value -> same MPHF slot), so the reference's whole tie
    RETRY (src/dictionary.cpp:34-41) folds into two extra position tries
    here — exact because a present kmer matches at exactly ONE offset, so
    try order cannot change the result.

    fields="ids" skips the string_begin/end/kmer_id_in_string/offset outputs
    (the reference's plain lookup() returns only the id, dictionary.hpp:34;
    lookup_advanced is the full form) — fewer scatters on the pair sweep.

    Structure (all static shapes):
      1. one full-width probe of candidate 0 (resolves singletons, heavy via
         the skew index, and the first slot of midload buckets), gated by the
         minimizer guard — a failed guard proves no candidate can match
         (spss:47-65), so guarded-out lanes probe nothing;
      2. remaining (lane, candidate_j) probes are COMPACTED into a dense pair
         buffer (work proportional to actual bucket content, not to
         max_bucket x batch) and verified in fixed-width windows;
      3. ids resolve once at the end with a single searchsorted.
    """
    B = kmers32.shape[0]
    k, m = cfg.k, cfg.m
    canonical = kmers_rc32 is not None
    full = fields == "full"
    if cfg.row_v2 and full:
        raise ValueError(
            "rebased (v2) rows carry no char-offset resolve quad: serve "
            "fields='ids' (the reference's plain lookup(), "
            "dictionary.hpp:34); string bounds need a v1-format index "
            "(< 2^32 chars)")

    ids = mphf_eval_minimizer(cfg, arrs, minval)
    if "cw_lo" in arrs:
        # codeword arrays are a contiguous MPHF-slot range on this shard
        # (parallel/sharded.py); lanes whose minimizer hashes elsewhere go
        # inactive here and are answered by the owning shard.
        owner = (ids >= arrs["cw_lo"]) & (ids < arrs["cw_hi"])
        active0 = active0 & owner
        ids = jnp.where(owner, ids - arrs["cw_lo"], U32(0))
    row = jnp.take(arrs["cw_row"], ids.astype(I32), axis=0, mode="clip")
    sb = row[:, 0]
    cw_a = row[:, 1]
    cand0_pre = row[:, 2]
    Wv, Ww, QW = cfg.vbits_words, cfg.win_words, cfg.quad_w
    vb = row[:, 3 : 3 + Wv]
    win = row[:, 3 + Wv : 3 + Wv + Ww]
    rsv0 = row[:, 3 + Wv + Ww : 3 + Wv + Ww + QW]
    status = sb & U32(3)
    cw_b = sb >> U32(2)
    heavy = status == 2
    midload = status == 1
    size = jnp.where(midload, cw_b, U32(1))
    pid = jnp.where(heavy, cw_b, U32(0))

    minpos_u = minpos.astype(U32)
    if canonical:
        tries = [minpos_u, U32(k - m) - minpos_u]
        if minpos2 is not None:
            mp2 = minpos2.astype(U32)
            tries += [mp2, U32(k - m) - mp2]
    else:
        tries = [minpos_u]

    minval_rc = P.revcomp_mmer64(minval, m) if canonical else None
    kmw = U32(cfg.kmw)

    def verify_fused(cand, vbw, winw, rsv, active, lane_kmers, lane_kmers_rc,
                     lane_tries):
        """Verify AND id-resolve one fused candidate row per lane ENTIRELY
        in-register: the row carries the packed-string window, valid-start
        bits and the resolve quad — no string or offsets gather. Returns
        (match, bko, orient, sid, sbeg, send); bko is the matching char
        offset (v1 quad) or the kmer id itself (v2 rebased quad — the final
        resolve is then the identity). Only the in-window extraction offset
        ext0 is needed for verification, so v2 rows never touch global char
        space; (ext0 >= pos_try) == (cand >= pos_try) because windows are
        word-aligned at max(0, cand-(k-m)): cand >= k-m implies
        ext0 >= k-m >= pos_try, else ext0 == cand."""
        if cfg.row_v2:
            ext0 = cand
            kid0, sid0, rel1 = rsv[:, 0], rsv[:, 1], rsv[:, 2]
        else:
            ext0 = cand - (((cand - jnp.minimum(cand, kmw)) >> U32(4)) << U32(4))
            sid0, ep1 = rsv[:, 0], rsv[:, 2]
        match = jnp.zeros(cand.shape, dtype=bool)
        bko = jnp.zeros(cand.shape, dtype=U32)
        bor = jnp.full(cand.shape, FORWARD_ORIENTATION, dtype=I32)
        bsid = jnp.zeros(cand.shape, dtype=U32)
        bsb = jnp.zeros(cand.shape, dtype=U32)
        bse = jnp.zeros(cand.shape, dtype=U32)
        for pos_try in lane_tries:
            can = active & ~match & (ext0 >= pos_try)
            j = kmw - pos_try
            if vbw.shape[1] == 1:
                vword = vbw[:, 0]
            else:
                vword = jnp.zeros(cand.shape, dtype=U32)
                for t in range(vbw.shape[1]):
                    vword = jnp.where((j >> U32(5)) == t, vbw[:, t], vword)
            vbit = ((vword >> (j & U32(31))) & U32(1)) != 0
            read = P.extract_kmer_dyn(winw, (ext0 - pos_try) * U32(2), k,
                                      max_start_word=cfg.max_start_word)
            ok = can & vbit
            if canonical:
                eq_f = P.kmer_equal(read, lane_kmers)
                eq_r = P.kmer_equal(read, lane_kmers_rc)
                hit = ok & (eq_f | eq_r)
                bor = jnp.where(hit, jnp.where(eq_r & ~eq_f, I32(BACKWARD_ORIENTATION),
                                               I32(FORWARD_ORIENTATION)), bor)
            else:
                hit = ok & P.kmer_equal(read, lane_kmers)
            if cfg.row_v2:
                over = j >= rel1  # at most one boundary in the start span
                bko = jnp.where(hit,
                                kid0 - pos_try - over.astype(U32) * U32(k - 1),
                                bko)
            else:
                off = jnp.where(can, cand - pos_try, U32(0))
                over = off >= ep1  # at most one boundary in the start span
                bko = jnp.where(hit, off, bko)
            bsid = jnp.where(hit, sid0 + over, bsid)
            if full:
                bsb = jnp.where(hit, jnp.where(over, ep1, rsv[:, 1]), bsb)
                bse = jnp.where(hit, jnp.where(over, rsv[:, 3], ep1), bse)
            match = match | hit
        return match, bko, bor, bsid, bsb, bse

    # ---- candidate 0 (SINGLETON/MIDLOAD): its fused row came with the
    # codeword gather. The guard m-mer compare (spss:47-65) extracts from
    # the same window.
    res = _empty_res(B, fields)
    c0 = cand0_pre
    if cfg.row_v2:
        gext0 = c0  # col0 is already the in-window extraction offset
    else:
        gext0 = c0 - (((c0 - jnp.minimum(c0, kmw)) >> U32(4)) << U32(4))
    gv = P.extract_window_dyn(win, gext0 * U32(2), 2 * m,
                              max_start_word=cfg.max_start_word)
    guard_ok = u.equal(gv, minval)
    if canonical:
        guard_ok = guard_ok | u.equal(gv, minval_rc)

    found, bko, bor, bsid, bsb, bse = verify_fused(
        c0, vb, win, rsv0, active0 & ~heavy, kmers32, kmers_rc32, tries)

    # HEAVYLOAD lanes: candidate row located by the skew index
    if cfg.has_skew:
        if canonical:
            use_rc = P.kmer_less(kmers_rc32, kmers32)
            canon = jnp.where(use_rc[:, None], kmers_rc32, kmers32)
        else:
            canon = kmers32
        h_active = active0 & heavy
        if cfg.skew_hrows:
            # slot -> fused row directly (hindex-keyed table, one gather
            # fewer than the positions -> heavy_rows chain)
            slot = skew_slot(cfg, arrs, canon, pid)
            hidx = _take(arrs["sk_pos_off"], pid) + slot
            if "sk_lo" in arrs:
                # sk_hrows shard by row range over the bucket axis; only the
                # MINIMIZER owner knows pid, so it broadcasts the global row
                # index and the ROW owner answers (parallel/sharded.py)
                r = jnp.where(h_active, hidx, U32(0xFFFFFFFF))
                r = jax.lax.pmin(r, cfg.bucket_axis)
                h_active = (r >= arrs["sk_lo"]) & (r < arrs["sk_hi"])
                hidx = jnp.where(h_active, r - arrs["sk_lo"], U32(0))
            hrow = jnp.take(arrs["sk_hrows"], hidx.astype(I32), axis=0,
                            mode="clip")
        else:
            hidx = skew_eval(cfg, arrs, canon, cw_a, pid)
            hrow = jnp.take(arrs["heavy_rows"], hidx.astype(I32), axis=0,
                            mode="clip")
        Wvh = cfg.vbits_words
        fh, bkoh, borh, hsid, hsb, hse = verify_fused(
            hrow[:, 0], hrow[:, 1 : 1 + Wvh],
            hrow[:, 1 + Wvh : 1 + Wvh + Ww], hrow[:, 1 + Wvh + Ww :],
            h_active, kmers32, kmers_rc32, tries)
        found = found | fh
        bko = jnp.where(fh, bkoh, bko)
        bor = jnp.where(fh, borh, bor)
        bsid = jnp.where(fh, hsid, bsid)
        bsb = jnp.where(fh, hsb, bsb)
        bse = jnp.where(fh, hse, bse)

    res["minimizer_found"] = jnp.where(active0 & ~guard_ok & ~heavy, False,
                                       res["minimizer_found"])
    # a failed guard proves the bucket belongs to a different minimizer:
    # no candidate can match (all are occurrences of that other m-mer)
    active0 = active0 & (guard_ok | heavy)

    # ---- candidate 1 rides the same row (size-2 buckets need no sweep);
    # SSHASH_NO_C1 drops the block (half the row bytes) and lets the sweep
    # serve size >= 2
    if cfg.c1_in_row:
        rowW = 1 + Wv + Ww + QW
        c1blk = row[:, 2 + rowW : 2 + 2 * rowW]
        f1, bko1, bor1, sid1, sb1, se1 = verify_fused(
            c1blk[:, 0], c1blk[:, 1 : 1 + Wv], c1blk[:, 1 + Wv : 1 + Wv + Ww],
            c1blk[:, 1 + Wv + Ww :],
            active0 & midload & (size >= U32(2)) & ~found,
            kmers32, kmers_rc32, tries)
        found = found | f1
        bko = jnp.where(f1, bko1, bko)
        bor = jnp.where(f1, bor1, bor)
        bsid = jnp.where(f1, sid1, bsid)
        bsb = jnp.where(f1, sb1, bsb)
        bse = jnp.where(f1, se1, bse)
    jmin = U32(2 if cfg.c1_in_row else 1)  # first sweep candidate index

    if probe_light:
        # light probe (regular-mode fused dual-strand RC pass): skip the
        # pair sweep entirely and report which lanes would have needed
        # it; the caller resolves them in a compacted window (the
        # size>=3 tail is ~0.1% of lanes at sane m)
        res["unresolved"] = active0 & midload & ~found & (size > jmin)
    else:
        # ---- candidates 2..size-1 (midload size >= 3 only): compacted pair sweep
        # Window width trades per-window cost (the PMAX-wide mrow gather
        # dominates it) against window COUNT for pair-heavy batches; with
        # candidates 0-1 in-row only the size>=3 tail (~0.1% of lanes at m17)
        # reaches here, so narrow windows win decisively — the round-4 sweep
        # (scripts/exp_r4_lookup.py) measured div 8/32/64/256/1024 at
        # 73.5/51.8/50.1/56.8/89.7 ns on salmonella m17 canonical.
        PMAX = max(128, B // cfg.pair_div)  # pair-window width; multiple windows when exceeded
        need = active0 & midload & ~found & (size > jmin)
        nprobe = jnp.where(need, size - jmin, U32(0)).astype(jnp.int32)
        # both compaction sums ride ONE two-column grouped scan
        ps2 = P.prefix_sum_ex(jnp.stack([nprobe, need.astype(jnp.int32)], axis=1))
        starts, rank = ps2[:, 0], ps2[:, 1]
        ends = starts + nprobe
        total = ends[-1]

        # compacted lane list: lane_ids[rank] = lane (rank in start order)
        lane_ids = jnp.zeros((B,), dtype=jnp.int32).at[
            jnp.where(need, rank, B)].set(jnp.arange(B, dtype=jnp.int32), mode="drop")

        def pair_window(w, carry):
            found, bko, bor, bsid, bsb, bse = carry
            base = w * PMAX
            slot = jnp.arange(PMAX, dtype=jnp.int32)
            gid = base + slot
            in_w = need & (ends > base) & (starts < base + PMAX)
            local_start = jnp.clip(starts - base, 0, PMAX - 1)
            marks = jnp.zeros((PMAX,), dtype=jnp.int32).at[
                jnp.where(in_w, local_start, PMAX)].add(1, mode="drop")
            rank_base = jnp.sum((need & (ends <= base)).astype(jnp.int32))
            seg = P.prefix_sum_ex(marks) + marks - 1 + rank_base
            lane = _take(lane_ids, jnp.clip(seg, 0, B - 1).astype(U32))
            pvalid = gid < total
            lane_u = lane.astype(U32)
            j = (gid - _take(starts, lane_u)).astype(U32) + jmin
            midx = _take(cw_a, lane_u) + j
            mrow = jnp.take(arrs["mid_rows"], midx.astype(I32), axis=0, mode="clip")
            lk = jnp.take(kmers32, lane, axis=0, mode="clip")
            lkr = jnp.take(kmers_rc32, lane, axis=0, mode="clip") if canonical else None
            Wvm = cfg.vbits_words
            pm, pko, por, psid, psb, pse = verify_fused(
                mrow[:, 0], mrow[:, 1 : 1 + Wvm], mrow[:, 1 + Wvm : 1 + Wvm + Ww],
                mrow[:, 1 + Wvm + Ww :], pvalid, lk, lkr,
                [_take(t, lane_u) for t in tries])
            # at most one candidate per lane can match (kmers are distinct in the
            # SPSS), so scatter-max combines are exact; all result fields ride
            # ONE (B, C) scatter (each B-wide scatter pass costs ~2 ns/lane).
            # ids mode resolves kmer_id per-probe in-register (id = off -
            # sid*(k-1), the quad is already in the row) and packs
            # [id+1 | backward-bit] into ONE scatter column (ids < 2^31 by the
            # uint32 chars/ids guard); the carry then holds (bko=id, bsid=0) so
            # the shared final resolve `bko - bsid*(k-1)` stays correct.
            tgt = jnp.where(pm, lane, B)
            if full:
                cols = [pko + U32(1), (por + I32(2)).astype(U32), psid, psb, pse]
                acc = jnp.zeros((B, len(cols)), dtype=U32).at[tgt].max(
                    jnp.stack(cols, axis=1), mode="drop")
                hit = acc[:, 0]
                newly = hit > 0
                bko = jnp.where(newly, hit - U32(1), bko)
                bor = jnp.where(newly, acc[:, 1].astype(I32) - I32(2), bor)
                bsid = jnp.where(newly, acc[:, 2], bsid)
                bsb = jnp.where(newly, acc[:, 3], bsb)
                bse = jnp.where(newly, acc[:, 4], bse)
            else:
                pkid = pko if cfg.row_v2 else pko - psid * U32(k - 1)
                if cfg.wide_ids:
                    # ids >= 2^31 don't fit the packed column: two-column
                    # scatter [id+1, orient+2] (same exactness argument)
                    acc = jnp.zeros((B, 2), dtype=U32).at[tgt].max(jnp.stack(
                        [jnp.where(pm, pkid + U32(1), U32(0)),
                         (por + I32(2)).astype(U32)], axis=1), mode="drop")
                    newly = acc[:, 0] > 0
                    bko = jnp.where(newly, acc[:, 0] - U32(1), bko)
                    bor = jnp.where(newly, acc[:, 1].astype(I32) - I32(2), bor)
                else:
                    packed = ((pkid + U32(1)) << U32(1)) | (por < 0).astype(U32)
                    acc1 = jnp.zeros((B,), dtype=U32).at[tgt].max(
                        jnp.where(pm, packed, U32(0)), mode="drop")
                    newly = acc1 > 0
                    bko = jnp.where(newly, (acc1 >> U32(1)) - U32(1), bko)
                    bor = jnp.where(newly,
                                    I32(1) - I32(2) * (acc1 & U32(1)).astype(I32),
                                    bor)
                bsid = jnp.where(newly, U32(0), bsid)
            found = found | newly
            return found, bko, bor, bsid, bsb, bse

        num_windows = (total + PMAX - 1) // PMAX

        def cond(carry):
            w, _ = carry
            return w < num_windows

        def body(carry):
            w, state = carry
            return w + 1, pair_window(w, state)

        _, (found, bko, bor, bsid, bsb, bse) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), (found, bko, bor, bsid, bsb, bse)))

    # ---- ids come straight from the winning row's resolve quad (no gather)
    off = jnp.where(found, bko, U32(0))
    kid_final = off if cfg.row_v2 else off - bsid * U32(k - 1)
    res["kmer_id"] = jnp.where(found, kid_final, res["kmer_id"])
    res["kmer_orientation"] = jnp.where(found, bor, res["kmer_orientation"])
    if full:
        res["kmer_offset"] = jnp.where(found, off, res["kmer_offset"])
        res["string_id"] = jnp.where(found, bsid, res["string_id"])
        res["string_begin"] = jnp.where(found, bsb, res["string_begin"])
        res["string_end"] = jnp.where(found, bse, res["string_end"])
        res["kmer_id_in_string"] = jnp.where(found, off - bsb,
                                             res["kmer_id_in_string"])
    res["found"] = found
    return res


def make_lookup(cfg, fields="full"):
    """Top-level batched lookup kernel (src/dictionary.cpp:58-78 semantics).
    fields="ids" returns only kmer_id/orientation/minimizer_found (the
    reference's plain lookup(), dictionary.hpp:34)."""
    if getattr(cfg, "row_v2", False) and fields == "full":
        raise ValueError(
            "rebased (v2) rows carry no char-offset resolve quad: serve "
            "fields='ids' (the reference's plain lookup(), "
            "dictionary.hpp:34); string bounds need a v1-format index "
            "(< 2^32 chars)")

    def fn(arrs, kmers32):
        B = kmers32.shape[0]
        magic = u.const64(cfg.magic)
        all_active = jnp.ones((B,), dtype=bool)

        if cfg.canonical:
            kmers_rc32 = P.revcomp_kmers(kmers32, cfg.k)
            mv_f, mp_f, mv_r, mp_r = P.compute_minimizer_two_strand(
                kmers32, kmers_rc32, cfg.k, cfg.m, magic)
            rc_first = u.less(mv_r, mv_f)
            tie = u.equal(mv_r, mv_f)
            mv1 = u.select(rc_first, mv_r, mv_f)
            mp1 = jnp.where(rc_first, mp_r, mp_f)
            if (cfg.max_start_word + 1) * cfg.W <= 8 and not cfg.tie_retry:
                # a TIE (both strand minimizer values equal) probes the same
                # bucket, so the reference's retry (src/dictionary.cpp:34-41)
                # folds into two extra tie-gated position tries — no second
                # probe pass, no compaction machinery
                mp2 = jnp.where(tie, mp_r, mp1)
                res = lookup_with_info(cfg, arrs, kmers32, kmers_rc32, mv1,
                                       mp1, all_active, fields, minpos2=mp2)
            else:
                # wide kmers: the 4-try unroll blows up XLA compile times
                # (k>~55, cf. the minimizer-fusion cap in ops/packed.py);
                # ties are rare, so a dense masked retry probe under cond.
                # SSHASH_TIE_RETRY=1 forces this shape on narrow kmers too:
                # it trades the fold's 2 extra ALWAYS-evaluated full-width
                # verify tries for a cond that is almost never taken
                # (A/B'd on TPU, scripts/exp_r3_lookup4.py)
                res = lookup_with_info(cfg, arrs, kmers32, kmers_rc32, mv1,
                                       mp1, all_active, fields)
                retry = tie & ~res["found"]

                def retried(r):
                    r2 = lookup_with_info(cfg, arrs, kmers32, kmers_rc32,
                                          mv_r, mp_r, retry, fields)
                    return _merge(r, r2, retry & r2["found"], retry)

                res = jax.lax.cond(retry.any(), retried, lambda r: r, res)
        else:
            mv, mp = P.compute_minimizer(kmers32, cfg.k, cfg.m, magic)
            res = lookup_with_info(cfg, arrs, kmers32, None, mv, mp, all_active,
                                   fields)

            # RC fallback (src/dictionary.cpp:71-76), COMPACTED to actual
            # misses and processed in B/4-wide windows: free when everything
            # hits forward, ~half cost when ~50% of queries are RC'd.
            miss = ~res["found"]
            # width B/2: ONE window covers any <=50%-RC workload; div
            # 1/2/4/8 measured 113.6/85.1/94.4/86.4 ns on the 50% RC
            # regular batch (scripts/exp_r4_fbdiv.py)
            Wf = max(128, B // cfg.fb_div)
            lane = jnp.arange(B, dtype=I32)
            n_miss = miss.sum()

            def fb_window(w, res, lane_ids, total, Wfx=Wf):
                slot = w * Wfx + jnp.arange(Wfx, dtype=I32)
                lid = jnp.take(lane_ids, jnp.clip(slot, 0, B - 1), mode="clip")
                ok = slot < total
                km = jnp.take(kmers32, lid, axis=0, mode="clip")
                rc = P.revcomp_kmers(km, cfg.k)
                mv_r, mp_r = P.compute_minimizer(rc, cfg.k, cfg.m, magic)
                r2 = lookup_with_info(cfg, arrs, rc, None, mv_r, mp_r, ok,
                                      fields)
                f2 = r2["found"] & ok
                res = dict(res)
                tgt_f = jnp.where(f2, lid, B)
                tgt_ok = jnp.where(ok, lid, B)
                for key in r2:
                    if key in ("found", "minimizer_found", "kmer_orientation"):
                        continue
                    res[key] = res[key].at[tgt_f].set(r2[key], mode="drop")
                # reference sets BACKWARD orientation on the RC attempt even
                # when it also misses (src/dictionary.cpp:71-76)
                res["kmer_orientation"] = res["kmer_orientation"].at[tgt_ok].set(
                    I32(BACKWARD_ORIENTATION), mode="drop")
                # minimizer_found combines for streaming
                # (streaming_query.hpp:172-178)
                mf = jnp.take(res["minimizer_found"], lid) | r2["minimizer_found"]
                res["minimizer_found"] = res["minimizer_found"].at[tgt_ok].set(
                    mf, mode="drop")
                res["found"] = res["found"].at[tgt_f].set(True, mode="drop")
                return res

            def windowed(res):
                # compaction prep lives here so an all-found batch (the cond
                # below) pays nothing for the fallback
                rank = P.prefix_sum_ex(miss.astype(I32))
                lane_ids = jnp.zeros((B,), dtype=I32).at[
                    jnp.where(miss, rank, B)].set(lane, mode="drop")
                total = rank[-1] + miss[-1].astype(I32)
                nw = (total + Wf - 1) // Wf
                _, out = jax.lax.while_loop(
                    lambda c: c[0] < nw,
                    lambda c: (c[0] + 1, fb_window(c[0], c[1], lane_ids, total)),
                    (jnp.int32(0), res))
                return out

            def full_width(res):
                # mostly-miss batches (e.g. negative workloads): one dense
                # pass beats windowed looping (nested while_loops schedule
                # poorly on TPU)
                kmers_rc32 = P.revcomp_kmers(kmers32, cfg.k)
                mv_r, mp_r = P.compute_minimizer(kmers_rc32, cfg.k, cfg.m, magic)
                res2 = lookup_with_info(cfg, arrs, kmers_rc32, None, mv_r, mp_r,
                                        miss, fields)
                merged = _merge(res, res2, miss & res2["found"], miss)
                merged["minimizer_found"] = jnp.where(
                    miss, res["minimizer_found"] | res2["minimizer_found"],
                    res["minimizer_found"])
                merged["kmer_orientation"] = jnp.where(
                    miss, I32(BACKWARD_ORIENTATION), merged["kmer_orientation"])
                return merged

            def dual(r):
                """Fused dual-strand RC pass (round 5, regular-mode >=10x
                push): when ANY lane missed forward, resolve the whole RC
                attempt (src/dictionary.cpp:71-76) with ONE full-width
                masked LIGHT probe — RC minimizer scan + the two dependent
                gathers (MPHF pilot, fused row with candidates 0-1 + heavy
                in-row), none of the pair-sweep compaction machinery. The
                size>=3 tail of RC buckets (~0.1% of lanes at sane m) falls
                to a narrow compacted window. Replaces the B/2-wide
                windowed second pass whose width was paid in full at any
                miss fraction. Disable via SSHASH_REG_DUAL_OFF=1."""
                rc = P.revcomp_kmers(kmers32, cfg.k)
                mv_r, mp_r = P.compute_minimizer(rc, cfg.k, cfg.m, magic)
                r2 = lookup_with_info(cfg, arrs, rc, None, mv_r, mp_r, miss,
                                      fields, probe_light=True)
                unresolved = r2.pop("unresolved")
                merged = _merge(r, r2, miss & r2["found"], miss)
                merged["minimizer_found"] = jnp.where(
                    miss, r["minimizer_found"] | r2["minimizer_found"],
                    r["minimizer_found"])
                merged["kmer_orientation"] = jnp.where(
                    miss, I32(BACKWARD_ORIENTATION),
                    merged["kmer_orientation"])
                left = miss & unresolved & ~r2["found"]
                Wf2 = max(128, B // cfg.pair_div)

                def leftovers(rr):
                    rank = P.prefix_sum_ex(left.astype(I32))
                    lane_ids = jnp.zeros((B,), dtype=I32).at[
                        jnp.where(left, rank, B)].set(lane, mode="drop")
                    total = rank[-1] + left[-1].astype(I32)
                    nw = (total + Wf2 - 1) // Wf2
                    _, out = jax.lax.while_loop(
                        lambda c: c[0] < nw,
                        lambda c: (c[0] + 1, fb_window(c[0], c[1], lane_ids,
                                                       total, Wf2)),
                        (jnp.int32(0), rr))
                    return out

                return jax.lax.cond(left.any(), leftovers, lambda x: x,
                                    merged)

            if cfg.reg_dual:
                res = jax.lax.cond(n_miss > 0, dual, lambda r: r, res)
            else:
                res = jax.lax.cond(
                    n_miss > 0,
                    lambda r: jax.lax.cond(n_miss > (B * 5) // 8, full_width,
                                           windowed, r),
                    lambda r: r,
                    res)
        return res

    return fn


def _merge(res_a, res_b, use_b, use_b_flags):
    out = {}
    for key in res_a:
        if key in ("minimizer_found",):
            out[key] = jnp.where(use_b_flags, res_b[key], res_a[key])
        elif key == "found":
            out[key] = res_a[key] | (use_b & res_b[key])
        else:
            out[key] = jnp.where(use_b, res_b[key], res_a[key])
    return out


def _acc_resolve(cfg, row, ids):
    """Shared access-row decode: (sid, char offset) from a gathered row."""
    hint = row[:, 0].astype(I32)
    cross = jnp.zeros_like(hint)
    for c in range(cfg.access_C):
        cross = cross + (ids >= row[:, 1 + c]).astype(I32)
    sid = hint + cross
    off = ids + sid.astype(U32) * U32(cfg.k - 1)
    return sid, off


def _acc_read_window(cfg, row, ids, off):
    """Windowed access rows: decode the kmer from the row's own packed-char
    words — in-register word select + funnel shift, NO strings32 gather."""
    k, C = cfg.k, cfg.access_C
    W = P.num_words32(k)
    Wa = _acc_win_words(k, C)
    # the window starts at word floor(o_min/16), o_min = 32*blk + hint*(k-1)
    o_min = (ids & ~U32(31)) + row[:, 0] * U32(k - 1)
    local = off - (o_min & ~U32(15))
    w = (local >> U32(4)).astype(I32)
    sh = (U32(2) * (local & U32(15)))[:, None]
    winp = jnp.concatenate(
        [row[:, 1 + C:], jnp.zeros((row.shape[0], W), dtype=U32)], axis=1)
    g = winp[:, 0 : W + 1]
    for j in range(1, Wa):
        g = jnp.where((w == I32(j))[:, None], winp[:, j : j + W + 1], g)
    lo = g[:, :W] >> sh
    hi = jnp.where(sh == 0, U32(0), g[:, 1:] << ((U32(32) - sh) & U32(31)))
    return P.mask_last_word(lo | hi, k)


def make_access(cfg):
    """ids -> packed kmers in ONE dependent gather round when the geometry
    allows: the fused per-block access row [sid hint, kmer_cum window,
    packed-char window] resolves the string AND carries every char the
    block can touch, so the kmer decodes in-register (word select + funnel
    shift). Wide-k / fragmented indexes fall back to a 2-round shape (row
    gather -> strings32 gather). Reference: 3-gather-round equivalent via
    rank/select locate, offsets.hpp:41-65. The crossing bound C is the
    build-time measured max number of string starts inside any 32-id block
    (cfg.access_C) — NOT 32//k+1, which only bounds char-offset space."""
    windowed = _acc_windowed(cfg.k, cfg.access_C)

    def fn(arrs, ids):
        if not windowed and getattr(cfg, "num_chars", 0) >= 1 << 32:
            # the 2-round fallback gathers strings32 at a uint32 char
            # offset, which wraps past 2^32 chars; the windowed form is
            # char-safe (offsets resolve against row-resident data) but
            # this geometry (wide k / fragmented strings) fell outside its
            # row-width gate. Raise at first use, not engine construction
            # — lookups on such an index still serve.
            raise ValueError(
                f"access at {cfg.num_chars} chars needs the windowed row "
                f"form, but k={cfg.k}, C={cfg.access_C} exceeds its width "
                f"gate; shard into < 2^32-char sub-indexes")
        row = jnp.take(arrs["acc_rows"], (ids >> U32(5)).astype(I32),
                       axis=0, mode="clip")
        sid, off = _acc_resolve(cfg, row, ids)
        if windowed:
            return _acc_read_window(cfg, row, ids, off)
        return P.read_kmers_at(arrs["strings32"], off, cfg.k)

    return fn


def make_iterator(cfg, materialize=False):
    """Full-iteration kernel (reference dictionary::begin + iterator::next,
    spectrum_preserving_string_set.hpp:120-179; perf analog
    tools/perf.hpp:10-24): ONE linear shift-window pass over strings32 —
    no gathers, unlike make_access over precomputed offsets. Every char
    offset decodes its kmer in parallel; the valid-start bitmask keeps
    exactly the num_kmers true starts, whose offset order IS the
    sequential id order (ids never materialize — rank == id).

    materialize=True returns (valid (C,), kmers (C, W)) for tests;
    default returns (count, checksum) scalars — the perf-harness shape
    (the reference materializes each kmer and reads kmer.at(0),
    perf.hpp:10-24; the checksum here XOR-folds ALL W words of every
    valid kmer so the full decode cannot be dead-code-eliminated).

    The reduce path never materializes the (C, W) kmer matrix or a
    per-offset bool mask: offset o = 16*w + c decodes from words w..w+W
    shifted by 2c, and its valid bit is bit (16*(w&1) + c) of
    vstart32[w>>1] — both pure (NW,)-wide u32 vector ops per phase, 16
    phases. Count is a SWAR popcount of the vstart bitmask."""
    k = cfg.k

    def fn(arrs):
        s = arrs["strings32"]
        v32 = arrs["vstart32"]
        if materialize:
            kmers = P.iterate_kmers(s, k)
            C = kmers.shape[0]
            bits = (v32[:, None] >> jnp.arange(32, dtype=U32)[None, :]) & U32(1)
            valid = bits.reshape(-1)[:C] != 0
            return valid, kmers
        W = P.num_words32(k)
        NW = s.shape[0]
        sp = jnp.concatenate([s, jnp.zeros((W,), dtype=U32)])
        srcs = [jax.lax.dynamic_slice_in_dim(sp, j, NW) for j in range(W + 1)]
        last_bits = 2 * k - 32 * (W - 1)
        last_mask = U32(0xFFFFFFFF if last_bits >= 32 else (1 << last_bits) - 1)
        # per-word valid half + bit: word w uses vstart32[w>>1], upper half
        # when w is odd
        NV = v32.shape[0]
        vv = jnp.broadcast_to(v32[:, None], (NV, 2)).reshape(-1)[:NW]
        half = (jnp.arange(NW, dtype=U32) & U32(1)) * U32(16)
        acc = jnp.zeros((NW,), dtype=U32)
        for c in range(16):
            b = 2 * c
            fold = None
            for j in range(W):
                xj = srcs[j] if b == 0 else (
                    (srcs[j] >> U32(b)) | (srcs[j + 1] << U32(32 - b)))
                if j == W - 1:
                    xj = xj & last_mask
                fold = xj if fold is None else fold ^ xj
            m = (vv >> (half + U32(c))) & U32(1)
            acc = acc + fold * m
        chk = jnp.sum(acc, dtype=U32)
        # SWAR popcount of the valid-start bitmask (zero-padded past C)
        x = v32 - ((v32 >> 1) & U32(0x55555555))
        x = (x & U32(0x33333333)) + ((x >> 2) & U32(0x33333333))
        x = (x + (x >> 4)) & U32(0x0F0F0F0F)
        # U32 accumulator: counts up to 2^32-1 kmers (int32 overflows at 2^31)
        cnt = jnp.sum((x * U32(0x01010101)) >> U32(24), dtype=U32)
        return cnt, chk

    return fn


def make_weight(cfg):
    def fn(arrs, ids):
        i = jnp.searchsorted(arrs["w_endpoints"], ids, side="right").astype(I32) - 1
        return _take(arrs["w_dictionary"], _take(arrs["w_value_ids"], i))

    return fn


def make_neighbours(cfg, fields="full"):
    """Batched navigational queries (src/dictionary.cpp:112-128): one fused
    lookup over the 8 neighbour variants (4 forward, 4 backward) per kmer."""
    lookup = make_lookup(cfg, fields)

    def fn(arrs, kmers32):
        B = kmers32.shape[0]
        k = cfg.k
        fwd_base = P.drop_one_char(kmers32)
        bwd_base = P.shift_up_one_char(kmers32, k)
        variants = [P.set_char(fwd_base, k - 1, c) for c in range(4)]
        variants += [P.set_char(bwd_base, 0, c) for c in range(4)]
        allk = jnp.concatenate(variants, axis=0)  # (8B, W)
        res = lookup(arrs, allk)
        return {key: v.reshape(8, B).T for key, v in res.items()}

    return fn


class DeviceEngine:
    """Device-resident index + jitted batched query entry points."""

    def __init__(self, index, device=None, host_arrs=None):
        self.index = index
        self.cfg = StaticCfg(index)
        # host_arrs: a precomputed _device_arrays(index) pytree (e.g. cached
        # to disk for very large indexes — the slot expansion is a multi-pass
        # host job; scripts/exp_scale_device.py)
        if host_arrs is None:
            host_arrs = _device_arrays(index)
        else:
            want_w = row_width(self.cfg)
            if host_arrs["cw_row"].shape[1] != want_w:
                raise ValueError(
                    f"stale host_arrs cache: cw_row has "
                    f"{host_arrs['cw_row'].shape[1]} columns, this engine "
                    f"expects {want_w} (candidates 0-1 in-row, quad format "
                    f"v{'2' if self.cfg.row_v2 else '1'}). Recompute with "
                    f"engine._device_arrays(index).")
            if "vstart32" not in host_arrs:
                # cache written before the sequential iterator landed
                host_arrs = dict(host_arrs)
                host_arrs["vstart32"] = vstart32_from_index(index)
            C = self.cfg.access_C
            want_acc = 1 + C + (_acc_win_words(self.cfg.k, C)
                                if _acc_windowed(self.cfg.k, C) else 0)
            if ("acc_rows" not in host_arrs
                    or host_arrs["acc_rows"].shape[1] != want_acc):
                # cache written before the fused access row landed (or with
                # an older row layout): synthesize from the cached
                # sidk32/kmer_cum/strings32 (cheap single-pass takes)
                host_arrs = dict(host_arrs)
                host_arrs["acc_rows"] = _acc_rows(
                    host_arrs["sidk32"], host_arrs["kmer_cum"], C,
                    s32=host_arrs["strings32"], k=self.cfg.k)
        self.arrs = {k2: jax.device_put(v, device) for k2, v in host_arrs.items()}
        # v2 (rebased) rows serve the id-returning contract only — the full
        # lookup_advanced fields need the v1 char-offset quad
        main_fields = "ids" if self.cfg.row_v2 else "full"
        self._lookup_fn = make_lookup(self.cfg, fields=main_fields)
        self._lookup = jax.jit(self._lookup_fn)
        # id-only kernel (the reference's plain lookup(), dictionary.hpp:34):
        # fewer outputs and pair-sweep scatters; compiled lazily on first use
        self._lookup_ids_fn = make_lookup(self.cfg, fields="ids")
        self._lookup_ids = jax.jit(self._lookup_ids_fn)
        self._access = jax.jit(make_access(self.cfg))
        self._weight = jax.jit(make_weight(self.cfg)) if index.weights is not None else None
        self._neighbours = jax.jit(make_neighbours(self.cfg, fields=main_fields))
        self._iterator = jax.jit(make_iterator(self.cfg))
        # SSHASH_DEBUG=1: sanitizer mode (debug.py) — postcondition-checked
        # lookups + NaN trapping, the reference's -D SSHASH_USE_SANITIZERS
        # analog (CMakeLists.txt:39-41)
        import os

        self._debug = os.environ.get("SSHASH_DEBUG", "") not in ("", "0")
        if self._debug:
            from .debug import checkified_lookup

            jax.config.update("jax_debug_nans", True)
            self._ck_lookup = checkified_lookup(self)

    # ---- raw jitted entry points (device in/out)

    def lookup_device(self, kmers32):
        if self._debug:
            return self._ck_lookup(kmers32)
        return self._lookup(self.arrs, kmers32)

    def access_device(self, ids_u32):
        return self._access(self.arrs, ids_u32)

    # ---- numpy-convenience wrappers (u64 result semantics like the oracle)

    def lookup(self, kmers64):
        kmers64 = np.atleast_2d(np.asarray(kmers64, dtype=np.uint64))
        kmers32 = K.kmers_to_u32(kmers64, self.cfg.k)
        res = jax.tree.map(np.asarray, self.lookup_device(jnp.asarray(kmers32)))
        return _to_host_result(res)

    def access(self, ids):
        ids = np.asarray(ids, dtype=np.uint32)
        out32 = np.asarray(self.access_device(jnp.asarray(ids)))
        return K.u32_to_kmers64(out32, self.cfg.k)

    def weight(self, ids):
        ids = np.asarray(ids, dtype=np.uint32)
        return np.asarray(self._weight(self.arrs, jnp.asarray(ids))).astype(np.uint64)

    def is_member(self, kmers64):
        return self.lookup(kmers64)["kmer_id"] != np.uint64(INVALID_UINT64)

    def kmer_neighbours(self, kmers64):
        """dict of (B, 8) arrays; columns 0-3 forward A,C,T,G then 4-7
        backward (neighbourhood<kmer_t>, util.hpp:77-81)."""
        kmers64 = np.atleast_2d(np.asarray(kmers64, dtype=np.uint64))
        kmers32 = K.kmers_to_u32(kmers64, self.cfg.k)
        res = jax.tree.map(np.asarray, self._neighbours(self.arrs, jnp.asarray(kmers32)))
        found = res.pop("found")
        out = {}
        for key, v in res.items():
            if v.dtype == np.uint32:
                v64 = v.astype(np.uint64)
                v64[~found] = np.uint64(INVALID_UINT64)
                out[key] = v64
            else:
                out[key] = v
        return out


def _to_host_result(res):
    found = res.pop("found")
    out = {}
    for key, v in res.items():
        if v.dtype == np.uint32:
            v64 = v.astype(np.uint64)
            v64[~found] = np.uint64(INVALID_UINT64)
            out[key] = v64
        elif key == "kmer_orientation":
            out[key] = v.astype(np.int64)
        else:
            out[key] = v
    return out
