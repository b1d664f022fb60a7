"""Stage-cost breakdown of the CURRENT device streaming step kernel
(make_stream_step debug_stage hook) on real data: salmonella genome
vs its own index, the exact bench.py shape (P=2^22, rmax_shift=12,
k=31 m=17). Prints json lines."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"
P_ = 1 << 22
SHIFT = 12


def timeit(fn, args, reps=3):
    float(np.asarray(fn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import os

    import jax

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.engine import make_lookup
    from sshash_tpu.streaming import _DeviceStream, make_stream_step, parse_reads

    os.environ["SSHASH_STREAM_PIPELINE"] = "0"  # kernel-only timings
    # SSHASH_PROFILE_IDX: profile against a cached scale index (+ .arrs)
    # instead of the salmonella build; streams stream_part.fa next to it
    idx_dir = os.environ.get("SSHASH_PROFILE_IDX")
    if idx_dir:
        from sshash_tpu.engine import DeviceEngine
        from sshash_tpu.index import Index

        idx = Index.load(idx_dir)
        cache = idx_dir.rstrip("/") + ".arrs"
        host_arrs = {f[:-4]: np.load(os.path.join(cache, f), mmap_mode="r")
                     for f in sorted(os.listdir(cache)) if f.endswith(".npy")}
        eng = DeviceEngine(idx, host_arrs=host_arrs)
        genome = os.path.join(os.path.dirname(idx_dir), "stream_part.fa")
    else:
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False))
        eng = d.to_device()
        genome = GENOME
    cfg = eng.cfg

    ds = _DeviceStream(eng, cfg.k, pmax=P_, rmax_shift=SHIFT)
    ds._no_ladder = True  # keep every chunk on the full-P step (capturable)
    captured = []
    real_step = ds._step
    ds._step = lambda *a: captured.append(a) or real_step(*a)
    for seq in parse_reads(genome, multiline=True):
        ds.add_read(seq)
    ds.flush()
    args = captured[0]  # the one full-P chunk
    print(json.dumps({"chunks": len(captured),
                      "count": int(args[5])}), flush=True)
    # flush hands the step HOST arrays since the packed-upload refactor;
    # device_put once so stage timings stay kernel-only
    import jax.numpy as jnp

    args = tuple(jnp.asarray(a) if isinstance(a, np.ndarray) else a
                 for a in args)

    stages = sys.argv[1:] or ["masks", "anchor", "chain", "fast", "corr",
                              "dfl_lanes", "dfl_pos", "dfl_head", "dfl_seg",
                              "dfl_win1", "dfl_win2", "full", None]
    for name in stages:
        if name == "none":
            name = None
        fn = jax.jit(make_stream_step(cfg, make_lookup(cfg), ds.P, ds.R,
                                      debug_stage=name))
        t = timeit(fn, args)
        print(json.dumps({"stage": name or "full_step",
                          "ms": round(t * 1e3, 1),
                          "ns_per_pos": round(t / P_ * 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
