"""Device-side packed 2-bit string algebra (JAX, uint32 words).

Device layout: char at global offset o lives in uint32 word o // 16 at bit
offset 2*(o % 16) — the uint32 view of the host's little-endian uint64
packing (kmer.py). Kmers are (B, W32) uint32, char j at word j//16 bit
2*(j%16).

The packed-string reads here replace the reference's kmer_iterator /
util::read_kmer_at (include/kmer_iterator.hpp, util.hpp:248-257) with batched
gathers + funnel shifts.
"""

import jax.numpy as jnp

from . import u64 as u

U32 = jnp.uint32


def num_words32(k):
    return (2 * k + 31) // 32


def mask_last_word(words, k):
    W = num_words32(k)
    rem = 2 * k - 32 * (W - 1)
    if rem == 32:
        return words
    mask = U32((1 << rem) - 1)
    return words.at[..., W - 1].set(words[..., W - 1] & mask)


def read_kmers_at2(strings_v32, offsets, k):
    """Like read_kmers_at but over the interleaved (NW, 2) table whose col0
    is the packed word and col1 carries the 16 valid-start bits of that
    word's char offsets. Returns (kmers (B, W32), valid_start_bit (B,)) —
    the acceptance test rides the same row gather."""
    W = num_words32(k)
    offsets = offsets.astype(U32)
    widx = (offsets >> 4).astype(jnp.int32)
    sh = (2 * (offsets & 15)).astype(U32)[:, None]
    idx = widx[:, None] + jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    rows = jnp.take(strings_v32, idx, axis=0, mode="clip")  # (B, W+1, 2)
    g = rows[:, :, 0]
    lo = g[:, :W] >> sh
    hi = jnp.where(sh == 0, U32(0), g[:, 1:] << ((U32(32) - sh) & U32(31)))
    vbit = ((rows[:, 0, 1] >> (offsets & U32(15))) & U32(1)) != 0
    return mask_last_word(lo | hi, k), vbit


def read_kmers_at(strings32, offsets, k):
    """Gather k-char windows at `offsets` (uint32 (B,)) from the packed
    strings (uint32 (NW,), sentinel-padded). Returns (B, W32) uint32."""
    W = num_words32(k)
    offsets = offsets.astype(U32)
    widx = (offsets >> 4).astype(jnp.int32)
    sh = (2 * (offsets & 15)).astype(U32)[:, None]
    idx = widx[:, None] + jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    g = jnp.take(strings32, idx, axis=0)  # (B, W+1)
    lo = g[:, :W] >> sh
    hi = jnp.where(sh == 0, U32(0), g[:, 1:] << ((U32(32) - sh) & U32(31)))
    return mask_last_word(lo | hi, k)


def extract_window(kmers32, bit, width_bits):
    """Extract up to 64 bits starting at constant bit offset `bit` from packed
    kmers (B, W). Returns u64 masked to width_bits."""
    B, W = kmers32.shape
    w, b = divmod(bit, 32)

    def word(i):
        if i < W:
            return kmers32[:, i]
        return jnp.zeros((B,), dtype=U32)

    if b == 0:
        lo = word(w)
        hi = word(w + 1)
    else:
        lo = (word(w) >> b) | (word(w + 1) << (32 - b))
        hi = (word(w + 1) >> b) | (word(w + 2) << (32 - b))
    out = u.u64(hi, lo)
    if width_bits < 64:
        return u.and_(out, u.const64((1 << width_bits) - 1))
    return out


def extract_window_dyn(kmers32, bitpos, width_bits, max_start_word=None):
    """Extract up to 64 bits at a PER-LANE dynamic bit offset from packed
    kmers (B, W). bitpos: uint32 (B,), even. Pure register selects + variable
    shifts — no gathers. Returns u64 masked to width_bits.
    max_start_word: see extract_kmer_dyn."""
    B, W = kmers32.shape
    w0 = (bitpos >> 5).astype(U32)
    b = (bitpos & U32(31)).astype(U32)
    up = (U32(32) - b) & U32(31)
    nz = b != 0

    def word(i):
        return kmers32[:, i] if i < W else jnp.zeros((B,), dtype=U32)

    nvar = W if max_start_word is None else min(W, max_start_word + 1)
    variants = []
    for v in range(nvar):
        lo = (word(v) >> b) | jnp.where(nz, word(v + 1) << up, U32(0))
        hi = (word(v + 1) >> b) | jnp.where(nz, word(v + 2) << up, U32(0))
        variants.append((lo, hi))
    lo, hi = variants[0]
    for v in range(1, nvar):
        pick = w0 == v
        lo = jnp.where(pick, variants[v][0], lo)
        hi = jnp.where(pick, variants[v][1], hi)
    out = u.u64(hi, lo)
    if width_bits < 64:
        return u.and_(out, u.const64((1 << width_bits) - 1))
    return out


def extract_kmer_dyn(win, bitpos, k, max_start_word=None):
    """Extract a k-char kmer at a PER-LANE dynamic bit offset from an
    in-register window (B, Ww) of packed words. Pure selects + funnel
    shifts — no gathers (the fused-row verify path). Returns (B, W32).

    max_start_word bounds bitpos >> 5 (known per call site from the window
    geometry): the extraction then computes one STATIC funnel shift per
    possible start word and selects, instead of per-lane word indexing."""
    B, Ww = win.shape
    W = num_words32(k)
    w0 = (bitpos >> U32(5)).astype(U32)
    b = (bitpos & U32(31)).astype(U32)
    up = (U32(32) - b) & U32(31)
    nz = b != 0

    def word(i):
        return win[:, i] if i < Ww else jnp.zeros((B,), dtype=U32)

    nvar = Ww if max_start_word is None else min(Ww, max_start_word + 1)
    variants = []
    for v in range(nvar):
        variants.append([
            (word(v + j) >> b) | jnp.where(nz, word(v + j + 1) << up, U32(0))
            for j in range(W)
        ])
    cols = variants[0]
    for v in range(1, nvar):
        pick = w0 == v
        cols = [jnp.where(pick, variants[v][j], cols[j]) for j in range(W)]
    return mask_last_word(jnp.stack(cols, axis=1), k)


def revcomp_mmer64(val, m):
    """RC of u64-packed m-mers (m <= 31), register-only (host analog:
    kmer.revcomp_mmers)."""
    hi = crc32_word(val.lo)
    lo = crc32_word(val.hi)
    return u.shr(u.u64(hi, lo), 64 - 2 * m)


def _tree_min(items, wins):
    """Tournament-tree reduction of per-window tuples. `wins(a, b)` returns
    the lanes where b beats a; it MUST be a total order (explicit
    lexicographic tie-break on position), so the winner is independent of
    association order. A linear select chain here MISCOMPILED on the axon
    TPU backend at k63 window counts (deterministic wrong minimizer
    positions for 0.03% of kmers once fused into the full lookup kernel —
    round-4 repro in scripts/exp_r4_k63_weight.py); the tree's explicit
    order-free semantics dodge that, and its log-depth dependency chain
    schedules better than the nw-deep chain regardless."""
    while len(items) > 1:
        nxt = []
        for a in range(0, len(items) - 1, 2):
            ia, ib = items[a], items[a + 1]
            bwins = wins(ia, ib)
            nxt.append(tuple(
                u.select(bwins, eb, ea) if isinstance(ea, u.u64)
                else jnp.where(bwins, eb, ea)
                for ea, eb in zip(ia, ib)))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]


def compute_minimizer(kmers32, k, m, magic):
    """Leftmost minimal mixer-hash m-mer per kmer (util.hpp:262-283).
    magic: u64 scalar. Returns (val u64 (B,), pos int32 (B,)).

    Short scans (nw <= 24: every k31-class config) use the linear select
    chain — cheapest, and empirically sound on the TPU backend (bench
    asserts all 8M random positives found). Wide scans switch to the
    tournament tree (_tree_min): the chain MISCOMPILES on the axon TPU
    backend at k63 window counts once fused into the full lookup kernel."""
    B = kmers32.shape[0]
    nw = k - m + 1
    import os

    force_tree = os.environ.get("SSHASH_TREE_MIN", "") not in ("", "0")
    if nw > 24 or force_tree:
        items = []
        for j in range(nw):
            v = extract_window(kmers32, 2 * j, 2 * m)
            h = u.mixer64(v, magic)
            items.append((h, v, jnp.full((B,), j, dtype=jnp.int32)))

        def wins(a, b):
            # lexicographic (hash, position): leftmost wins equal hashes
            return u.less(b[0], a[0]) | (u.equal(b[0], a[0]) & (b[2] < a[2]))

        _, v, p = _tree_min(items, wins)
        return v, p
    best_h = None
    best_v = None
    best_p = jnp.zeros((B,), dtype=jnp.int32)
    for j in range(nw):
        v = extract_window(kmers32, 2 * j, 2 * m)
        h = u.mixer64(v, magic)
        if best_h is None:
            best_h, best_v = h, v
        else:
            upd = u.less(h, best_h)  # strict: leftmost wins ties
            best_h = u.select(upd, h, best_h)
            best_v = u.select(upd, v, best_v)
            best_p = jnp.where(upd, jnp.int32(j), best_p)
    return best_v, best_p


def compute_minimizer_both(kmers32, k, m, magic):
    """Both-strand minimizers from ONE window scan: the RC kmer's window at
    RC-position l is the reverse complement of the forward window at
    j = k-m-l, so the RC scan reuses each extracted forward window (a cheap
    per-window revcomp instead of a second full extraction pass).
    Tie rules: forward keeps the leftmost minimum (strict <); the RC scan
    must keep the LEFTMOST minimum in RC coordinates = rightmost j (<=).
    Only called for nw <= 24 (compute_minimizer_two_strand splits wider
    scans into two compute_minimizer passes, which switch to the
    miscompile-safe tournament tree). Returns (mv_f, mp_f, mv_r, mp_r)
    matching two compute_minimizer calls on (kmers, revcomp(kmers)) bit
    for bit."""
    B = kmers32.shape[0]
    nw = k - m + 1
    bf_h = bf_v = br_h = br_v = None
    bf_p = jnp.zeros((B,), dtype=jnp.int32)
    br_j = jnp.zeros((B,), dtype=jnp.int32)
    for j in range(nw):
        v = extract_window(kmers32, 2 * j, 2 * m)
        h = u.mixer64(v, magic)
        vr = revcomp_mmer64(v, m)
        hr = u.mixer64(vr, magic)
        if bf_h is None:
            bf_h, bf_v, br_h, br_v = h, v, hr, vr
        else:
            upd = u.less(h, bf_h)
            bf_h = u.select(upd, h, bf_h)
            bf_v = u.select(upd, v, bf_v)
            bf_p = jnp.where(upd, jnp.int32(j), bf_p)
            updr = ~u.less(br_h, hr)  # hr <= best: rightmost j wins
            br_h = u.select(updr, hr, br_h)
            br_v = u.select(updr, vr, br_v)
            br_j = jnp.where(updr, jnp.int32(j), br_j)
    return bf_v, bf_p, br_v, jnp.int32(k - m) - br_j


def compute_minimizer_two_strand(kmers32, kmers_rc32, k, m, magic):
    """Both-strand minimizers; uses the fused single-scan kernel for short
    window counts and falls back to two passes for long ones (the 40+-step
    dual dependency chain of the fused form triggers pathological XLA
    compile times at k>~55)."""
    import os

    force_tree = os.environ.get("SSHASH_TREE_MIN", "") not in ("", "0")
    if k - m + 1 <= 24 and not force_tree:
        return compute_minimizer_both(kmers32, k, m, magic)
    # SSHASH_TREE_MIN=1 forces the reassociation-safe tournament tree on
    # short scans too (toolchain-proofing knob: the linear chain is
    # empirically sound at k31 but MISCOMPILED at k63 window counts on the
    # TPU backend — the bench canary asserts it stays sound; see
    # BENCH_NOTES k63 section)
    mv_f, mp_f = compute_minimizer(kmers32, k, m, magic)
    mv_r, mp_r = compute_minimizer(kmers_rc32, k, m, magic)
    return mv_f, mp_f, mv_r, mp_r


def char_mmer_hashes(words32, n_chars_padded, m, magic):
    """Per-CHAR m-mer mixer hashes over a packed buffer: h[c] = mixer(m-mer
    starting at char c), and the RC-strand hashes. VPU-only (funnel shifts
    over word lanes, no gathers). Returns (h_f u64 (C,), h_r u64 (C,))."""
    C = n_chars_padded
    # extract 2m bits at every char: char c = 16*wi + p reads word wi shifted
    # by 2p; stacking the 16 phases then reshaping row-major yields char order
    w0 = words32
    w1 = jnp.concatenate([words32[1:], jnp.zeros((1,), U32)])
    w2 = jnp.concatenate([words32[2:], jnp.zeros((2,), U32)])
    nwords = (C + 15) // 16
    los, his = [], []
    for p in range(16):
        b = 2 * p
        if b == 0:
            los.append(w0[:nwords])
            his.append(w1[:nwords])
        else:
            los.append(((w0 >> b) | (w1 << (32 - b)))[:nwords])
            his.append(((w1 >> b) | (w2 << (32 - b)))[:nwords])
    lo = jnp.stack(los, axis=1).reshape(-1)[:C]
    hi = jnp.stack(his, axis=1).reshape(-1)[:C]
    v = u.and_(u.u64(hi, lo), u.const64((1 << (2 * m)) - 1))
    h_f = u.mixer64(v, magic)
    vr = revcomp_mmer64(v, m)
    h_r = u.mixer64(vr, magic)
    return h_f, h_r


def iterate_kmers(words32, k):
    """SEQUENTIAL-DECODE iteration: the kmer starting at EVERY char offset
    of the packed strings, as ONE linear shift-window pass — no gathers
    (device analog of the reference spss iterator,
    spectrum_preserving_string_set.hpp:120-179: a cursor walking the
    bit_vector one char at a time; here all offsets decode at once).

    Char offset o = 16*q + p reads words q..q+W shifted by 2p; stacking the
    16 phases and reshaping row-major yields offset order (same trick as
    char_mmer_hashes). Returns (16*nW, W32) uint32 — callers mask with the
    valid-start bits (offsets whose kmer would cross a string end)."""
    W = num_words32(k)
    srcs = [words32]
    for j in range(1, W + 1):
        srcs.append(jnp.concatenate([words32[j:], jnp.zeros((j,), U32)]))
    cols = []
    for j in range(W):
        phases = []
        for p in range(16):
            b = 2 * p
            if b == 0:
                phases.append(srcs[j])
            else:
                phases.append((srcs[j] >> b) | (srcs[j + 1] << (32 - b)))
        cols.append(jnp.stack(phases, axis=1).reshape(-1))
    return mask_last_word(jnp.stack(cols, axis=1), k)


def sliding_min_u64(h, w):
    """min over windows [c, c+w) of a u64 array (C,), via log-steps of
    shifted mins (value-only; ties don't matter for equality tests)."""
    cur = h
    span = 1

    def shift(x, s):
        pad_hi = jnp.full((s,), 0xFFFFFFFF, dtype=U32)
        return u.u64(jnp.concatenate([x.hi[s:], pad_hi]),
                     jnp.concatenate([x.lo[s:], pad_hi]))

    while span < w:
        s = min(span, w - span)
        sh = shift(cur, s)
        cur = u.select(u.less(sh, cur), sh, cur)
        span += s
    return cur


def prefix_sum_ex(v):
    """EXCLUSIVE prefix sum over axis 0 of an int32 (B,) or (B, C) array
    via a two-level grouped cumsum: intra-group (B/16, 16, ...) axis-1 scan
    + one A-wide group scan — much cheaper than a flat B-wide cumsum on TPU
    (the flat scan's log-depth passes each cost a full-width pass). A (B, C)
    input scans all C columns in ONE pass (callers needing several
    compaction sums stack them). Falls back to the flat form when B is not
    a multiple of 16."""
    B = v.shape[0]
    if B % 16:
        return jnp.cumsum(v, axis=0) - v
    g = v.reshape(B // 16, 16, *v.shape[1:])
    intra = jnp.cumsum(g, axis=1)  # inclusive within group
    tot = intra[:, -1]
    base = jnp.cumsum(tot, axis=0) - tot  # exclusive group bases (A-wide)
    return (base[:, None] + intra - g).reshape(v.shape)


def crc32_word(x):
    """Reverse-complement 16 chars packed in a uint32 (device analog of
    reference crc64, kmer.hpp:141-157)."""
    c = x ^ U32(0xAAAAAAAA)
    r = ((c & U32(0x0000FFFF)) << 16) | ((c & U32(0xFFFF0000)) >> 16)
    r = ((r & U32(0x00FF00FF)) << 8) | ((r & U32(0xFF00FF00)) >> 8)
    r = ((r & U32(0x0F0F0F0F)) << 4) | ((r & U32(0xF0F0F0F0)) >> 4)
    r = ((r & U32(0x33333333)) << 2) | ((r & U32(0xCCCCCCCC)) >> 2)
    return r


def revcomp_kmers(kmers32, k):
    """(B, W) -> reverse complement, same layout."""
    W = kmers32.shape[-1]
    rev = crc32_word(kmers32)[:, ::-1]
    s = W * 32 - 2 * k
    if s == 0:
        return rev
    out = rev >> s
    out = out.at[:, :-1].set(out[:, :-1] | (rev[:, 1:] << (32 - s)))
    return out


def kmer_less(a, b):
    """uint_kmer_t::operator< — integer compare, word W-1 most significant."""
    W = a.shape[-1]
    less = jnp.zeros(a.shape[:-1], dtype=bool)
    decided = jnp.zeros(a.shape[:-1], dtype=bool)
    for w in range(W - 1, -1, -1):
        lt = a[..., w] < b[..., w]
        gt = a[..., w] > b[..., w]
        less = less | (~decided & lt)
        decided = decided | lt | gt
    return less


def kmer_equal(a, b):
    return (a == b).all(axis=-1)


def drop_one_char(kmers32):
    out = kmers32 >> 2
    if kmers32.shape[-1] > 1:
        out = out.at[..., :-1].set(out[..., :-1] | (kmers32[..., 1:] << 30))
    return out


def shift_up_one_char(kmers32, k):
    out = kmers32 << 2
    if kmers32.shape[-1] > 1:
        out = out.at[..., 1:].set(out[..., 1:] | (kmers32[..., :-1] >> 30))
    return mask_last_word(out, k)


def set_char(kmers32, i, code):
    w, b = divmod(2 * i, 32)
    return kmers32.at[..., w].set(kmers32[..., w] | (U32(code) << b))
