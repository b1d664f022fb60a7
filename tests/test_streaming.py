"""Streaming query engine: report parity against a faithful sequential
emulation of the reference state machine (streaming_query.hpp:56-198) and
against a brute-force membership oracle (test/check.cpp style)."""

import gzip

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sshash_tpu import kmer as K
from sshash_tpu import oracle
from sshash_tpu.constants import FORWARD_ORIENTATION, INVALID_UINT64
from sshash_tpu.streaming import parse_reads, streaming_query_from_file

from conftest import QUERIES_FASTQ, QUERIES_FASTA_MULTI

INVALID = np.uint64(INVALID_UINT64)


def sequential_reference_report(index, reads):
    """Faithful emulation of streaming_query + the fastq driver: rolling
    state replaced by per-position fresh lookups (the reference asserts
    both are equal, streaming_query.hpp:107); the extension test reads the
    expected adjacent kmer from the packed strings exactly like
    kmer_iterator next/next_reverse."""
    k = index.k
    rep = dict.fromkeys(
        ["num_kmers", "num_positive_kmers", "num_negative_kmers",
         "num_invalid_kmers", "num_searches", "num_extensions"], 0)
    for seq in reads:
        if len(seq) < k:
            continue
        codes, ok = K.encode_chars(seq)
        npos = len(seq) - k + 1
        rep["num_kmers"] += npos
        words = K.pack_codes(np.where(ok, codes, 0), pad_words=K.num_words64(k) + 1)
        kmers = K.read_kmers_at(words, np.arange(npos), k)
        okc = np.concatenate([[0], np.cumsum(ok)])
        valid = (okc[k:] - okc[:-k]) == k
        res = oracle.lookup(index, kmers)

        rem = 0
        prev = None  # (offset, orientation) of previous result
        for i in range(npos):
            if not valid[i]:
                rep["num_invalid_kmers"] += 1
                rem = 0
                prev = None
                continue
            extended = False
            if rem > 0 and prev is not None:
                off, orient = prev
                nxt_off = off + orient
                expected = K.read_kmers_at(index.strings64, [nxt_off], k)
                kf = kmers[i : i + 1]
                kr = K.revcomp_kmers(kf, k)
                if (expected == kf).all() or (expected == kr).all():
                    rep["num_extensions"] += 1
                    rem -= 1
                    prev = (nxt_off, orient)
                    extended = True
            if not extended:
                # seed(): fresh lookup
                if res["kmer_id"][i] == INVALID:
                    rep["num_negative_kmers"] += 1
                    rem = 0
                    prev = None
                else:
                    rep["num_searches"] += 1
                    orient = int(res["kmer_orientation"][i])
                    off = int(res["kmer_offset"][i])
                    se, sb = int(res["string_end"][i]), int(res["string_begin"][i])
                    kis = int(res["kmer_id_in_string"][i])
                    if orient == FORWARD_ORIENTATION:
                        rem = (se - sb - k) - kis
                    else:
                        rem = kis
                    prev = (off, orient)
    rep["num_positive_kmers"] = rep["num_searches"] + rep["num_extensions"]
    return rep


def brute_force_positive_count(index, reads):
    """test/check.cpp-style oracle: canonical set membership of all kmers."""
    k = index.k
    # all index kmers, canonicalized
    all_ids = np.arange(index.num_kmers)
    kms = oracle.access(index, all_ids)
    rcs = K.revcomp_kmers(kms, k)
    canon = np.where(oracle._kmer_less_mask(rcs, kms)[:, None], rcs, kms)
    member = np.sort(_fold(canon))

    count = 0
    for seq in reads:
        if len(seq) < k:
            continue
        codes, ok = K.encode_chars(seq)
        npos = len(seq) - k + 1
        words = K.pack_codes(np.where(ok, codes, 0), pad_words=K.num_words64(k) + 1)
        kmers = K.read_kmers_at(words, np.arange(npos), k)
        okc = np.concatenate([[0], np.cumsum(ok)])
        valid = (okc[k:] - okc[:-k]) == k
        rc = K.revcomp_kmers(kmers, k)
        q = np.where(oracle._kmer_less_mask(rc, kmers)[:, None], rc, kmers)
        qf = _fold(q)
        pos = np.searchsorted(member, qf)
        pos = np.clip(pos, 0, len(member) - 1)
        count += int(((member[pos] == qf) & valid).sum())
    return count


def _fold(kmers2d):
    """(N, W) uint64 -> single uint64 key (W==1 for k31)."""
    assert kmers2d.shape[1] == 1
    return kmers2d[:, 0]


@pytest.fixture(scope="module")
def reads_sample():
    return list(parse_reads(QUERIES_FASTQ))[:300]


def test_report_matches_sequential_emulator(dict_k31, reads_sample):
    index = dict_k31.index
    want = sequential_reference_report(index, reads_sample)

    # run the batched engine over the same reads via a temp file
    import tempfile, os
    with tempfile.NamedTemporaryFile("wb", suffix=".fq", delete=False) as f:
        for i, seq in enumerate(reads_sample):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        path = f.name
    try:
        got = streaming_query_from_file(dict_k31, path, chunk=4096)
    finally:
        os.unlink(path)
    for key in want:
        assert got[key] == want[key], (key, got, want)


def test_positive_count_matches_brute_force(dict_k31, reads_sample):
    index = dict_k31.index
    want = brute_force_positive_count(index, reads_sample)

    import tempfile, os
    with tempfile.NamedTemporaryFile("wb", suffix=".fq", delete=False) as f:
        for i, seq in enumerate(reads_sample):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        path = f.name
    try:
        got = streaming_query_from_file(dict_k31, path)
    finally:
        os.unlink(path)
    assert got["num_positive_kmers"] == want


def test_invariant_and_device_parity(dict_k31, reads_sample, tmp_path):
    path = str(tmp_path / "sample.fq")
    with open(path, "wb") as f:
        for i, seq in enumerate(reads_sample):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
    host = streaming_query_from_file(dict_k31, path)
    assert host["num_kmers"] == (
        host["num_positive_kmers"] + host["num_negative_kmers"] + host["num_invalid_kmers"]
    )
    dev = streaming_query_from_file(dict_k31, path, use_device=True, chunk=4096)
    for key in ("num_kmers", "num_positive_kmers", "num_negative_kmers",
                "num_invalid_kmers", "num_searches", "num_extensions"):
        assert host[key] == dev[key], (key, host, dev)


def test_multiline_fasta_high_hit(dict_k31, tmp_path):
    # first 60K chars of the salmonella genome, re-wrapped at 70 cols to
    # exercise the multiline driver (reference src/query.cpp:9-47)
    seq = next(parse_reads(QUERIES_FASTA_MULTI, multiline=True))[:60000]
    path = str(tmp_path / "multi.fa")
    with open(path, "wb") as f:
        f.write(b">genome\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + b"\n")
    rep = streaming_query_from_file(dict_k31, path, multiline=True)
    assert rep["num_kmers"] == len(seq) - 31 + 1
    # querying the salmonella genome against the salmonella index: nearly
    # every kmer should be positive, mostly via extensions
    assert rep["num_positive_kmers"] / rep["num_kmers"] > 0.6
    assert rep["num_extensions"] > rep["num_searches"]


def test_canonical_streaming(dict_k31_canonical, reads_sample):
    index = dict_k31_canonical.index
    want = sequential_reference_report(index, reads_sample)
    import tempfile, os
    with tempfile.NamedTemporaryFile("wb", suffix=".fq", delete=False) as f:
        for i, seq in enumerate(reads_sample):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        path = f.name
    try:
        got = streaming_query_from_file(dict_k31_canonical, path)
    finally:
        os.unlink(path)
    for key in want:
        assert got[key] == want[key], (key, got, want)


def test_canonical_device_streaming_parity(dict_k31_canonical, reads_sample, tmp_path):
    """Canonical-mode device streaming report == host report."""
    path = str(tmp_path / "c.fq")
    with open(path, "wb") as f:
        for i, seq in enumerate(reads_sample[:100]):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
    host = streaming_query_from_file(dict_k31_canonical, path)
    dev = streaming_query_from_file(dict_k31_canonical, path, use_device=True, chunk=4096)
    for key in ("num_kmers", "num_positive_kmers", "num_negative_kmers",
                "num_invalid_kmers", "num_searches", "num_extensions"):
        assert host[key] == dev[key], (key, host, dev)


def test_device_high_hit_compact_fallback_parity(dict_k31, tmp_path):
    """High-hit device streaming (misses <= P/64 per chunk) takes the
    compacted-correction derive branch (streaming.make_stream_step
    derive_corr); its report must match the host engine bit-for-bit.
    Workload: the index's own unitigs (all positive; the only fallback
    lanes are read starts landing mid-group and unitig-end chain breaks)
    plus a few mutated reads so found2=False lanes are exercised too."""
    from conftest import SE_K31

    reads = list(parse_reads(SE_K31, fmt="fasta"))[:200]
    path = str(tmp_path / "hh.fa")
    with open(path, "wb") as f:
        for i, seq in enumerate(reads):
            if i % 37 == 5:  # sprinkle negatives (still far below P/64)
                seq = seq[:40] + b"T" * 31 + seq[40:]
            f.write(b">u%d\n%s\n" % (i, seq))
    host = streaming_query_from_file(dict_k31, path, fmt="fasta")
    dev = streaming_query_from_file(dict_k31, path, fmt="fasta",
                                    use_device=True, chunk=1 << 16)
    assert host["num_positive_kmers"] > 0.9 * host["num_kmers"]
    for key in ("num_kmers", "num_positive_kmers", "num_negative_kmers",
                "num_invalid_kmers", "num_searches", "num_extensions"):
        assert host[key] == dev[key], (key, host, dev)


def test_ml_records_block_boundaries(tmp_path, rng):
    """The block-based multiline parser must yield the same records at ANY
    block size (records carry across block boundaries; headers/sequences may
    split mid-line)."""
    import io

    from sshash_tpu.streaming import _ml_records

    recs = []
    body = []
    for i in range(40):
        n = int(rng.integers(1, 200))
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n))
        width = int(rng.integers(1, 60))
        lines = [seq[j:j + width] for j in range(0, n, width)]
        body.append(b">r%d some header\r\n" % i + b"\r\n".join(lines)
                    + (b"\n" if i % 3 else b"\r\n"))
        recs.append(seq)
    data = b"".join(body)

    def parse(block):
        out = []
        for rec, first in _ml_records(io.BytesIO(data), block=block):
            if first and not rec.startswith(b">"):
                s = rec.translate(None, b"\r\n")
            else:
                nl = rec.find(b"\n")
                s = rec[nl + 1:].translate(None, b"\r\n") if nl >= 0 else b""
            if s:
                out.append(s)
        return out

    want = parse(1 << 25)  # single block
    assert want == recs
    for block in (1, 3, 7, 64, 1024):
        assert parse(block) == recs, block
