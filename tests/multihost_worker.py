"""One JAX process of a multi-process CPU fleet (spawned by
test_multihost.py): bootstraps jax.distributed with gloo collectives,
builds a ShardedEngine over the GLOBAL mesh, and asserts sharded-lookup /
streaming parity for this process's rows. argv:
  <process_id> <num_processes> <coordinator_port> <index_path>
"""

import os
import sys

# spawned by file path: sys.path[0] is tests/, not the repo root, and the
# package is not pip-installed in dev environments — bootstrap explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    idx_path = sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # share the suite's persistent compile cache (big sharded kernels)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from sshash_tpu.parallel import multihost

    assert multihost.initialize(f"localhost:{port}", nproc, pid) is True
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert len(jax.local_devices()) == 4

    import numpy as np

    from sshash_tpu import kmer as K
    from sshash_tpu import oracle
    from sshash_tpu.index import Index
    from sshash_tpu.parallel import ShardedEngine
    from sshash_tpu.parallel.sharded import _local_rows
    from sshash_tpu.streaming import derive_report

    INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)
    index = Index.load(idx_path)
    mesh = multihost.global_mesh(bucket=2)  # data axis spans both processes
    assert dict(mesh.shape) == {"data": 2 * nproc, "bucket": 2}
    eng = ShardedEngine(index, mesh)

    # same rng on every process => identical global batch everywhere
    rng = np.random.default_rng(7)
    ids = rng.integers(0, index.num_kmers, 512)
    kmers = oracle.access(index, ids)
    kmers[:256] = K.revcomp_kmers(kmers[:256], index.k)
    neg = rng.integers(0, 1 << 62, (256, index.kmer_words64), dtype=np.uint64)
    neg &= np.uint64((1 << min(2 * index.k, 63)) - 1)
    batch = np.concatenate([kmers, neg])

    res, report, (lo, hi) = eng.lookup_multiprocess(batch)
    assert hi - lo == len(batch) // nproc  # each host owns half the rows
    want = oracle.lookup(index, batch)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_id_in_string",
                "kmer_orientation"):
        np.testing.assert_array_equal(res[key], want[key][lo:hi], err_msg=key)
    assert report["num_kmers"] == len(batch)
    assert report["num_positive"] == int((want["kmer_id"] != INVALID).sum())

    # host-local feeding round-trips: slice locally, assemble globally,
    # results must match the full-batch path
    local = multihost.host_local_batch(batch, mesh)
    np.testing.assert_array_equal(local, batch[lo:hi])
    k32 = K.kmers_to_u32(batch, index.k)
    garr = multihost.make_global_batch(K.kmers_to_u32(local, index.k), mesh,
                                       k32.shape)
    res2, _ = eng.lookup_device(garr)
    lo2, hi2, kid2 = _local_rows(res2["kmer_id"])
    assert (lo2, hi2) == (lo, hi)
    found2 = _local_rows(res2["found"])[2]
    kid2 = kid2.astype(np.uint64)
    kid2[~found2] = INVALID
    np.testing.assert_array_equal(kid2, res["kmer_id"])

    # streaming counters psum over the global mesh (reads straddle the
    # process boundary: the ppermute stitch crosses DCN)
    n_shards = mesh.shape["data"]
    per_shard, read_len = 128, 96
    B = n_shards * per_shard
    sids, first = [], np.zeros(B, dtype=bool)
    pos = 0
    while pos < B:
        L = min(read_len, B - pos)
        start = int(rng.integers(0, index.num_kmers - L))
        sids.extend(range(start, start + L))
        first[pos] = True
        pos += L
    skm = oracle.access(index, np.asarray(sids))
    valid = np.ones(B, dtype=bool)
    rep = eng.stream_report(skm, valid, first)
    sres = oracle.lookup(index, skm)
    swant = derive_report(sres["kmer_id"] != INVALID, sres["string_id"],
                          sres["kmer_id"], sres["kmer_orientation"], valid,
                          first)
    assert {k2: rep[k2] for k2 in swant} == swant, (rep, swant)

    # MULTI-CONTROLLER packed ShardedStream: each process feeds its OWN
    # reads (2-bit uploads through the anchored seed-and-extend step); the
    # collective rounds align at finalize (process 1 feeds more reads than
    # process 0, so process 0 runs empty rounds) and the report allreduces.
    # Expected counters = sum of per-process host-batcher reports —
    # additive because reads never straddle processes.
    from sshash_tpu.parallel import ShardedStream
    from sshash_tpu.streaming import _Batcher, _host_lookup

    k = index.k
    ep = index.string_endpoints.astype(np.int64)
    kmer_cum = ep - np.arange(len(ep)) * (k - 1)

    def string_text(s):
        kms = oracle.access(index, np.arange(kmer_cum[s], kmer_cum[s + 1]))
        flat = kms[:, 0]
        txt = "".join("ACTG"[(int(flat[0]) >> (2 * j)) & 3] for j in range(k))
        txt += "".join("ACTG"[(int(v) >> (2 * (k - 1))) & 3]
                       for v in flat[1:])
        return txt.encode()

    def reads_for(p):
        r = np.random.default_rng(100 + p)
        reads = [string_text(int(r.integers(0, len(ep) - 1)))
                 for _ in range(2 + 3 * p)]
        reads.append("".join("ACGT"[c] for c in r.integers(0, 4, 64)).encode())
        return reads

    st = ShardedStream(eng, pmax=1 << 12)
    for rd in reads_for(pid):
        st.add_read(rd)
    got = st.finalize()
    want2 = {}
    for p in range(nproc):
        hb = _Batcher(index, _host_lookup(index), k)
        for rd in reads_for(p):
            hb.add_read(rd)
        for k2, v in hb.finalize().items():
            want2[k2] = want2.get(k2, 0) + v
    assert got == want2, (got, want2)

    print(f"MULTIHOST_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
