"""Stage-cost breakdown of the device streaming step kernel on real data
(salmonella genome, all-positive). Prints json lines."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"
P_ = 1 << 22
S = 16
A = P_ // S
R_ = P_ >> 4


def timeit(fn, *args, reps=3):
    float(np.asarray(fn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import native
    from sshash_tpu.engine import make_lookup
    from sshash_tpu.ops import packed as Pk
    from sshash_tpu.streaming import parse_reads

    d = Dictionary.build(INPUT, BuildConfig(k=31, m=15, verbose=False))
    eng = d.to_device()
    cfg = eng.cfg
    arrs = eng.arrs
    lookup = make_lookup(cfg)
    I32 = jnp.int32
    U32j = jnp.uint32
    k = 31

    # prepare ONE full chunk from the genome
    reads = list(parse_reads(GENOME, multiline=True))
    seq = bytes(reads[0][: P_ + k - 1])
    lens = np.array([len(seq)], dtype=np.int64)
    cstarts = np.array([0], dtype=np.int64)
    CW = (P_ + (R_ * (k - 1)) + 31) // 32 + 4
    words32 = np.zeros(CW, dtype=np.uint32)
    valid_bits = np.zeros(P_ // 32 + 1, dtype=np.uint32)
    native.encode_stream(seq, cstarts, lens, k, words32, valid_bits)
    rstart = np.zeros(R_, dtype=np.uint32)
    rnpos = np.zeros(R_, dtype=np.uint32)
    rnpos[0] = P_
    rfirst = np.zeros(R_ // 32 + 1, dtype=np.uint32)
    rfirst[0] = 1
    w32 = jax.device_put(jnp.asarray(words32))
    rs = jax.device_put(jnp.asarray(rstart))
    rn = jax.device_put(jnp.asarray(rnpos))
    rf = jax.device_put(jnp.asarray(rfirst))
    vb = jax.device_put(jnp.asarray(valid_bits))

    def mapping(words32, rstart, rnpos, rfirst_bits, valid_bits):
        lane = jnp.arange(P_, dtype=I32)
        pstart = jnp.cumsum(rnpos) - rnpos
        marks = jnp.zeros((P_,), dtype=I32).at[
            jnp.where(jnp.arange(R_) < 1, pstart, P_)].add(1, mode="drop")
        r = jnp.clip(jnp.cumsum(marks) - 1, 0, R_ - 1)
        pos = jnp.take(rstart, r, mode="clip") + (
            lane - jnp.take(pstart, r, mode="clip")).astype(U32j)
        first = ((jnp.take(rfirst_bits, r >> 5, mode="clip") >> (r & 31)) & 1) != 0
        first = first & (lane == jnp.take(pstart, r, mode="clip"))
        valid = (((valid_bits[lane >> 5] >> (lane & 31).astype(U32j)) & 1) != 0)
        return lane, pos, first, valid

    @jax.jit
    def s_map(w, rs_, rn_, rf_, vb_):
        lane, pos, first, valid = mapping(w, rs_, rn_, rf_, vb_)
        return pos.sum() + first.sum() + valid.sum()

    @jax.jit
    def s_anchor(w, rs_, rn_, rf_, vb_):
        lane, pos, first, valid = mapping(w, rs_, rn_, rf_, vb_)
        apos = pos[::S]
        ares = lookup(arrs, Pk.read_kmers_at(w, apos, k))
        return ares["kmer_id"].sum() + pos.sum()

    @jax.jit
    def s_phase2(w, rs_, rn_, rf_, vb_):
        lane, pos, first, valid = mapping(w, rs_, rn_, rf_, vb_)
        apos = pos[::S]
        ares = lookup(arrs, Pk.read_kmers_at(w, apos, k))
        afound = ares["found"] & valid[::S]
        aoff = ares["kmer_offset"]
        aorient = ares["kmer_orientation"]
        t = jnp.arange(S, dtype=U32j)[None, :]
        fwd = (aorient[:, None] == 1)
        og = jnp.where(fwd, aoff[:, None] + t, aoff[:, None] - t)
        under = ~fwd & (aoff[:, None] < t)
        k1 = U32j(k - 1)
        qs = jnp.where(fwd, og + k1, og)
        posg = pos.reshape(A, S)
        schar = (jnp.take(arrs["strings32"], (qs >> 4).astype(I32), mode="clip")
                 >> ((qs & U32j(15)) * 2)) & 3
        rchar = (jnp.take(w, ((posg + k1) >> 4).astype(I32), mode="clip")
                 >> (((posg + k1) & U32j(15)) * 2)) & 3
        charok = jnp.where(fwd, schar == rchar, schar == (rchar ^ U32j(2)))
        asb = ares["string_begin"][:, None]
        ase = ares["string_end"][:, None]
        instr = (og >= asb) & ((og + U32j(k)) <= ase)
        cond = (valid.reshape(A, S) & ~first.reshape(A, S) & charok
                & instr & ~under)
        cond = cond.at[:, 0].set(afound)
        matched = jnp.cumprod(cond.astype(I32), axis=1) > 0
        return matched.sum() + og.sum()

    full = eng._stream_steps if hasattr(eng, "_stream_steps") else None
    from sshash_tpu.streaming import _DeviceStream

    ds = _DeviceStream(eng, k)
    step = ds._step

    @jax.jit
    def s_full(w, rs_, rn_, rf_, vb_):
        counters, lane0, lastv = step(arrs, w, rs_, rn_, rf_, vb_,
                                      jnp.uint32(P_), jnp.uint32(1))
        return counters.sum()

    for name, fn in [("map", s_map), ("anchor", s_anchor),
                     ("phase2", s_phase2), ("full_step", s_full)]:
        t = timeit(fn, w32, rs, rn, rf, vb)
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 1),
                          "ns_per_pos": round(t / P_ * 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
