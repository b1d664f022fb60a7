"""Stage-cost profile of the device lookup on the real TPU.

Times cumulative pipeline prefixes (minimizer -> mphf -> row -> verify ->
full) plus raw-gather microbenchmarks (row width sweep, independent vs
dependent gather pairs), to locate the remaining dependent-gather rounds.
Prints json lines. Timing per CLAUDE.md: fetch a scalar per rep (block_until
_ready does not block over the axon tunnel).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
B = 1 << 22


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(np.asarray(out)[()] if np.ndim(out) == 0 else np.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out)[()] if np.ndim(out) == 0 else np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu.engine import StaticCfg, lookup_with_info, mphf_eval_minimizer
    from sshash_tpu.ops import packed as P
    from sshash_tpu.ops import u64 as u
    from sshash_tpu.oracle import access

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))

    d = Dictionary.build(INPUT, BuildConfig(k=31, m=15, verbose=False))
    index = d.index
    eng = d.to_device()
    cfg = eng.cfg
    arrs = eng.arrs

    rng = np.random.default_rng(0xBE7C)
    ids = rng.integers(0, index.num_kmers, B)
    kmers64 = access(index, ids)
    half = B // 2
    kmers64[:half] = K.revcomp_kmers(kmers64[:half], index.k)
    kmers32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))
    km_fwd = jax.device_put(jnp.asarray(K.kmers_to_u32(access(index, ids), index.k)))

    magic = u.const64(cfg.magic)

    @jax.jit
    def s0_minimizer(a, x):
        mv, mp = P.compute_minimizer(x, cfg.k, cfg.m, magic)
        return mv.lo.sum() + mp.sum()

    @jax.jit
    def s1_mphf(a, x):
        mv, mp = P.compute_minimizer(x, cfg.k, cfg.m, magic)
        slot = mphf_eval_minimizer(cfg, a, mv)
        return slot.sum()

    @jax.jit
    def s2_row(a, x):
        mv, mp = P.compute_minimizer(x, cfg.k, cfg.m, magic)
        slot = mphf_eval_minimizer(cfg, a, mv)
        row = jnp.take(a["cw_row"], slot.astype(jnp.int32), axis=0, mode="clip")
        return row.sum()

    @jax.jit
    def s3_verify(a, x):
        # fused-row verify: extract the kmer from the row's window in-register
        mv, mp = P.compute_minimizer(x, cfg.k, cfg.m, magic)
        slot = mphf_eval_minimizer(cfg, a, mv)
        row = jnp.take(a["cw_row"], slot.astype(jnp.int32), axis=0, mode="clip")
        cand = row[:, 2]
        win = row[:, 3 + cfg.vbits_words :]
        pos = mp.astype(jnp.uint32)
        off = cand - jnp.minimum(pos, cand)
        wlo16 = ((cand - jnp.minimum(cand, jnp.uint32(cfg.kmw))) >> 4) << 4
        read = P.extract_kmer_dyn(win, (off - wlo16) * jnp.uint32(2), cfg.k)
        hit = P.kmer_equal(read, x)
        return hit.sum() + read[:, 0].sum()

    @jax.jit
    def full_probe(a, x):
        mv, mp = P.compute_minimizer(x, cfg.k, cfg.m, magic)
        res = lookup_with_info(cfg, a, x, None, mv, mp,
                               jnp.ones((x.shape[0],), dtype=bool))
        return res["kmer_id"].sum() + res["found"].sum()

    @jax.jit
    def full_lookup(a, x):
        return eng._lookup_fn(a, x)["kmer_id"].sum()

    stages = [
        ("s0_minimizer", s0_minimizer, kmers32),
        ("s1_mphf", s1_mphf, kmers32),
        ("s2_row", s2_row, kmers32),
        ("s3_verify", s3_verify, kmers32),
        ("full_probe_fwd", full_probe, km_fwd),
        ("full_lookup_fwd", full_lookup, km_fwd),
        ("full_lookup_50rc", full_lookup, kmers32),
    ]
    for name, fn, x in stages:
        t = timeit(fn, arrs, x)
        print(json.dumps({"stage": name, "ns_per_kmer": round(t / B * 1e9, 1),
                          "sec": round(t, 4)}), flush=True)

    # canonical engine, stage by stage
    dc = Dictionary.build(INPUT, BuildConfig(k=31, m=15, canonical=True, verbose=False))
    engc = dc.to_device()
    cfgc = engc.cfg

    @jax.jit
    def c0_two_strand(a, x):
        rc = P.revcomp_kmers(x, cfgc.k)
        mv_f, mp_f, mv_r, mp_r = P.compute_minimizer_two_strand(
            x, rc, cfgc.k, cfgc.m, magic)
        return mv_f.lo.sum() + mv_r.lo.sum() + mp_f.sum() + mp_r.sum()

    @jax.jit
    def c1_pick(a, x):
        rc = P.revcomp_kmers(x, cfgc.k)
        mv_f, mp_f, mv_r, mp_r = P.compute_minimizer_two_strand(
            x, rc, cfgc.k, cfgc.m, magic)
        rc_first = u.less(mv_r, mv_f)
        mv1 = u.select(rc_first, mv_r, mv_f)
        slot = mphf_eval_minimizer(cfgc, a, mv1)
        return slot.sum()

    @jax.jit
    def c2_probe(a, x):
        rc = P.revcomp_kmers(x, cfgc.k)
        mv_f, mp_f, mv_r, mp_r = P.compute_minimizer_two_strand(
            x, rc, cfgc.k, cfgc.m, magic)
        rc_first = u.less(mv_r, mv_f)
        mv1 = u.select(rc_first, mv_r, mv_f)
        mp1 = jnp.where(rc_first, mp_r, mp_f)
        res = lookup_with_info(cfgc, a, x, rc, mv1, mp1,
                               jnp.ones((x.shape[0],), dtype=bool))
        return res["kmer_id"].sum() + res["found"].sum()

    @jax.jit
    def full_lookup_canon(a, x):
        return engc._lookup_fn(a, x)["kmer_id"].sum()

    ids_c = rng.integers(0, dc.num_kmers(), B)
    kc = access(dc.index, ids_c)
    kc[:half] = K.revcomp_kmers(kc[:half], 31)
    kc32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kc, 31)))
    for name, fn in (("c0_two_strand_minimizer", c0_two_strand),
                     ("c1_pick_mphf", c1_pick),
                     ("c2_full_probe", c2_probe),
                     ("full_lookup_canonical_50rc", full_lookup_canon)):
        t = timeit(fn, engc.arrs, kc32)
        print(json.dumps({"stage": name,
                          "ns_per_kmer": round(t / B * 1e9, 1)}), flush=True)

    # batch-size scaling of the full kernel
    for BB in (1 << 23,):
        ids2 = rng.integers(0, index.num_kmers, BB)
        kk = access(index, ids2)
        kk[: BB // 2] = K.revcomp_kmers(kk[: BB // 2], index.k)
        kk32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kk, index.k)))
        t = timeit(full_lookup, arrs, kk32)
        print(json.dumps({"stage": f"full_lookup_50rc_B{BB}",
                          "ns_per_kmer": round(t / BB * 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
