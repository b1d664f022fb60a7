"""Multi-chip sharded lookup must agree with the NumPy oracle
(2D mesh: data-parallel batch x bucket-sharded codewords)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sshash_tpu import kmer as K
from sshash_tpu import oracle
from sshash_tpu.constants import INVALID_UINT64

INVALID = np.uint64(INVALID_UINT64)


def _mesh(data, bucket):
    from sshash_tpu.parallel import make_mesh

    return make_mesh(shape=(data, bucket))


def _mixed_batch(index, rng, n=512):
    ids = rng.integers(0, index.num_kmers, n)
    kmers = oracle.access(index, ids)
    half = n // 2
    kmers[:half] = K.revcomp_kmers(kmers[:half], index.k)
    # sprinkle negatives
    neg = rng.integers(0, 1 << 62, (n // 4, index.kmer_words64), dtype=np.uint64)
    mask = np.uint64((1 << min(2 * index.k, 63)) - 1)
    return np.concatenate([kmers, neg & mask])


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_matches_oracle_regular(dict_k31, rng, mesh_shape):
    from sshash_tpu.parallel import ShardedEngine

    index = dict_k31.index
    eng = ShardedEngine(index, _mesh(*mesh_shape))
    kmers = _mixed_batch(index, rng)
    want = oracle.lookup(index, kmers)
    got, report = eng.lookup(kmers)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_id_in_string",
                "kmer_orientation", "minimizer_found"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
    assert report["num_positive"] == int((want["kmer_id"] != INVALID).sum())


def test_sharded_matches_oracle_canonical(dict_k31_canonical, rng):
    from sshash_tpu.parallel import ShardedEngine

    index = dict_k31_canonical.index
    eng = ShardedEngine(index, _mesh(4, 2))
    kmers = _mixed_batch(index, rng)
    want = oracle.lookup(index, kmers)
    got, _ = eng.lookup(kmers)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_orientation"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)


def test_sharded_stream_report(dict_k31, rng):
    """psum'd streaming counters over the mesh == host derivation."""
    from sshash_tpu.parallel import ShardedEngine
    from sshash_tpu.streaming import derive_report

    index = dict_k31.index
    eng = ShardedEngine(index, _mesh(4, 2))
    # per-shard read batches: each data shard gets 2 reads of 64 positions
    # (consecutive ids = one string walk), read boundaries aligned to shards
    n_shards, per_shard, read_len = 4, 128, 64
    B = n_shards * per_shard
    ids = []
    first = np.zeros(B, dtype=bool)
    for r in range(B // read_len):
        start = int(rng.integers(0, index.num_kmers - read_len))
        # clamp into one string so consecutive ids are true adjacencies
        ids.extend(range(start, start + read_len))
        first[r * read_len] = True
    ids = np.asarray(ids)
    kmers = oracle.access(index, ids)
    valid = np.ones(B, dtype=bool)
    rep = eng.stream_report(kmers, valid, first)
    assert rep["num_kmers"] == B

    # host derivation on the same per-shard slices
    want = {k2: 0 for k2 in rep}
    res = oracle.lookup(index, kmers)
    for s in range(n_shards):
        sl = slice(s * per_shard, (s + 1) * per_shard)
        found = res["kmer_id"][sl] != INVALID
        r = derive_report(found, res["string_id"][sl], res["kmer_id"][sl],
                          res["kmer_orientation"][sl], valid[sl], first[sl])
        for k2 in want:
            want[k2] += r[k2]
    assert rep == want, (rep, want)


def test_sharded_from_loaded_index(dict_k31, tmp_path, rng):
    """save -> load -> shard across a mesh must stay bit-exact."""
    from sshash_tpu.dictionary import Dictionary
    from sshash_tpu.parallel import ShardedEngine

    path = str(tmp_path / "idx.npz")
    dict_k31.save(path)
    d2 = Dictionary.load(path)
    eng = ShardedEngine(d2.index, _mesh(2, 4))
    kmers = _mixed_batch(d2.index, rng, n=256)
    want = oracle.lookup(dict_k31.index, kmers)
    got, _ = eng.lookup(kmers)
    np.testing.assert_array_equal(got["kmer_id"], want["kmer_id"])


def test_sharded_stream_unaligned_reads(dict_k31, rng):
    """Reads straddling data-shard boundaries: the ppermute boundary stitch
    must reproduce the GLOBAL (unsharded) counter derivation."""
    from sshash_tpu.parallel import ShardedEngine
    from sshash_tpu.streaming import derive_report

    index = dict_k31.index
    eng = ShardedEngine(index, _mesh(4, 2))
    n_shards, per_shard, read_len = 4, 128, 96  # 96 does not divide 128
    B = n_shards * per_shard
    ids = []
    first = np.zeros(B, dtype=bool)
    pos = 0
    while pos < B:
        L = min(read_len, B - pos)
        start = int(rng.integers(0, index.num_kmers - L))
        ids.extend(range(start, start + L))
        first[pos] = True
        pos += L
    ids = np.asarray(ids)
    kmers = oracle.access(index, ids)
    valid = np.ones(B, dtype=bool)
    rep = eng.stream_report(kmers, valid, first)

    res = oracle.lookup(index, kmers)
    want = derive_report(res["kmer_id"] != INVALID, res["string_id"],
                         res["kmer_id"], res["kmer_orientation"], valid, first)
    assert {k2: rep[k2] for k2 in want} == want, (rep, want)


def test_sharded_per_device_bytes_drop(dict_k31):
    """The dominant arrays shard on the bucket axis: per-device bytes must
    drop going 1 -> 4 bucket shards."""
    from sshash_tpu.parallel import ShardedEngine

    e1 = ShardedEngine(dict_k31.index, _mesh(8, 1))
    e4 = ShardedEngine(dict_k31.index, _mesh(2, 4))
    b1, b4 = e1.per_device_bytes(), e4.per_device_bytes()
    assert b4 < 0.55 * b1, (b1, b4)


def test_sharded_access_and_neighbours(dict_k31, rng):
    """Sharded access (id-owner resolve + char-owner read + 2 combines) and
    navigation must match the single-device engine/oracle."""
    from sshash_tpu.parallel import ShardedEngine

    index = dict_k31.index
    eng = ShardedEngine(index, _mesh(2, 4))
    ids = rng.integers(0, index.num_kmers, 513)  # not a batch multiple
    np.testing.assert_array_equal(eng.access(ids), oracle.access(index, ids))
    km = oracle.access(index, ids[:64])
    want = dict_k31.kmer_neighbours(km)
    got = eng.kmer_neighbours(km)
    np.testing.assert_array_equal(got["kmer_id"][:, :4],
                                  want["forward"]["kmer_id"])
    np.testing.assert_array_equal(got["kmer_id"][:, 4:],
                                  want["backward"]["kmer_id"])


def test_sharded_weight(dict_weighted, rng):
    from sshash_tpu.parallel import ShardedEngine

    widx = dict_weighted.index
    engw = ShardedEngine(widx, _mesh(4, 2))
    wids = rng.integers(0, widx.num_kmers, 257)
    np.testing.assert_array_equal(engw.weight(wids), dict_weighted.weight(wids))


def test_sharded_strings_bytes_drop(dict_k31):
    """With strings/resolve tables sharded too, 8-way bucket sharding must
    push per-device bytes well below the replicated-remainder-only floor."""
    from sshash_tpu.parallel import ShardedEngine

    e1 = ShardedEngine(dict_k31.index, _mesh(8, 1))
    e8 = ShardedEngine(dict_k31.index, _mesh(1, 8))
    assert e8.per_device_bytes() < 0.3 * e1.per_device_bytes(), (
        e1.per_device_bytes(), e8.per_device_bytes())


def test_sharded_stream_packed(dict_k31):
    """The PACKED sharded streaming pipeline (2-bit char uploads, anchored
    seed-and-extend with bucket-sharded lookups and owner-answered string
    chains) must reproduce the host batcher's counters exactly — including
    a read split across chunks on different data shards (carry stitch)."""
    from sshash_tpu.parallel import ShardedEngine, ShardedStream
    from sshash_tpu.streaming import _Batcher, _host_lookup, parse_reads
    from conftest import QUERIES_FASTA_MULTI, QUERIES_FASTQ

    index = dict_k31.index
    genome = next(parse_reads(QUERIES_FASTA_MULTI, multiline=True))
    fastq = [r for _, r in zip(range(20), parse_reads(QUERIES_FASTQ))]
    reads = [genome[:30000]] + fastq + [genome[100000:170500]]
    # the last read splits across >=2 chunks (P=2^16) => cross-chunk carry

    eng = ShardedEngine(index, _mesh(4, 2))
    st = ShardedStream(eng, pmax=1 << 16)
    hb = _Batcher(index, _host_lookup(index), index.k)
    for r in reads:
        st.add_read(r)
        hb.add_read(r)
    got = st.finalize()
    want = hb.finalize()
    assert got == want, (got, want)


def test_multihost_helpers_single_process():
    """multihost helpers degrade gracefully single-process: no-op bootstrap,
    global mesh over local devices, identity-ish local batch slicing."""
    import numpy as np
    from sshash_tpu.parallel import multihost

    assert multihost.initialize() is False  # nothing to bootstrap here
    mesh = multihost.global_mesh(bucket=2)
    assert dict(mesh.shape) == {"data": 4, "bucket": 2}
    batch = np.arange(100)
    local = multihost.host_local_batch(batch, mesh)
    np.testing.assert_array_equal(local, batch)  # single process owns all
