"""End-to-end walkthrough on the bundled reference data (the README
examples of jermp/sshash, §"Examples" — build, query, check, permute).

Usage: python scripts/demo.py [--device]
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

DATA = "/root/reference/data"


def main():
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.check import check_all
    from sshash_tpu.cover import permute_file
    from sshash_tpu.oracle import access
    from sshash_tpu.streaming import streaming_query_from_file

    use_device = "--device" in sys.argv

    print("== Example 1: build (salmonella k31 m13) ==")
    d = Dictionary.build(f"{DATA}/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz",
                         BuildConfig(k=31, m=13, verbose=False))
    d.print_info()

    print("\n== Lookup / Access / Membership / Navigation ==")
    ids = np.array([0, 1, 12345, d.num_kmers() - 1])
    kmers = d.access(ids, as_strings=True)
    print("access:", ids.tolist(), "->", kmers)
    res = d.lookup(kmers)
    print("lookup round-trip ids:", res["kmer_id"].tolist())
    print("is_member:", d.is_member(kmers).tolist())
    nb = d.kmer_neighbours(access(d.index, ids[:1]))
    print("neighbours of kmer 0 (fwd ids):", nb["forward"]["kmer_id"][0].tolist())

    print("\n== Example 2: streaming queries (SRR5833294.10K.fastq.gz) ==")
    rep = streaming_query_from_file(d, f"{DATA}/queries/SRR5833294.10K.fastq.gz",
                                    use_device=use_device)
    print({k: rep[k] for k in ("num_kmers", "num_positive_kmers",
                               "num_searches", "num_extensions")})

    print("\n== check (exhaustive self-consistency) ==")
    check_all(d, verbose=False)
    print("check: OK")

    print("\n== Example 4: permute (ecoli_sakai weighted) ==")
    out = tempfile.mktemp(suffix=".fa")
    stats = permute_file(f"{DATA}/unitigs_stitched/with_weights/ecoli_sakai.ust.k31.fa.gz",
                         31, out)
    print(stats, "(reference README reports 5820 -> 3723)")

    print("\n== weighted build on the permuted collection ==")
    dw = Dictionary.build(out, BuildConfig(k=31, m=13, weighted=True, verbose=False))
    print("weights of first 8 kmers:", dw.weight(np.arange(8)).tolist())
    print("\nall good.")


if __name__ == "__main__":
    main()
