"""Build driver: input file -> Index.

Host-side pipeline mirroring the reference's 7 steps
(include/builder/dictionary_builder.hpp:17-79), with per-step timing emitted
as json-compatible stats. The external-memory sort/merge machinery of the
reference (builder/util.hpp:157-300) is replaced by in-memory vectorized
NumPy; out-of-core sharding by minimizer-hash range is the multi-host path
(see parallel/).
"""

import json
import time

import numpy as np
from dataclasses import dataclass



from .. import kmer as K
from ..constants import SEED
from ..hashing import mixer_magic
from .assemble import assemble
from .minimizers import compute_tuples
from .parse import parse_input


@dataclass
class BuildConfig:
    k: int = 31
    m: int = 20
    seed: int = SEED
    canonical: bool = False
    weighted: bool = False
    verbose: bool = True

    def validate(self):
        if self.k < 1 or self.m < 1 or self.m > self.k:
            raise ValueError(f"need 1 <= m <= k, got k={self.k} m={self.m}")
        if self.m > 31:
            raise ValueError("m must be <= 31 (minimizer values are uint64)")
        if self.k - self.m + 1 > 255:
            raise ValueError("k - m + 1 must fit in 8 bits")


def build(input_path, config: BuildConfig):
    config.validate()
    k, m = config.k, config.m
    stats = {"input_filename": str(input_path), "k": k, "m": m,
             "canonical": config.canonical, "seed": config.seed}
    t_total = time.perf_counter()

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        stats[name] = round(dt * 1e6)  # microseconds, like the reference json
        if config.verbose:
            print(f"=== {name}: {dt:.3f} [sec]")
        return out

    parsed = timed("step 1 (encode strings)", lambda: parse_input(input_path, k, config.weighted))
    # small-m warning (reference encode_strings.cpp:201-214): with m below
    # ~log4(num_kmers)+1, buckets blow up and queries degrade sharply
    rec_m = int(np.ceil(np.log(max(2, parsed.num_kmers)) / np.log(4))) + 1
    if m < rec_m:
        print(f"WARNING: m = {m} is small for {parsed.num_kmers} kmers; "
              f"recommended m >= {rec_m} (query speed degrades with tiny m)")
    # sentinel pad so packed reads never go out of bounds (reference
    # encode_strings.cpp:183-188)
    words64 = timed("step 1b (pack 2-bit strings)",
                    lambda: K.pack_codes(parsed.codes, pad_words=K.num_words64(k) + 1))

    magic = mixer_magic(config.seed)
    tuples = timed(
        "step 2+3 (compute + sort minimizer tuples)",
        lambda: compute_tuples(words64, parsed.endpoints, k, m, magic, config.canonical,
                               codes=parsed.codes),
    )

    steps_seen = []
    index = timed(
        "steps 4-7 (mphf + sparse and skew index)",
        lambda: assemble(parsed, tuples, words64, k, m, config.seed, config.canonical,
                         verbose=config.verbose, on_step=steps_seen.append),
    )

    stats["total_build_time_sec"] = time.perf_counter() - t_total
    stats["num_kmers"] = index.num_kmers
    stats.update(index.stats)
    index.stats = stats
    if config.verbose:
        ns_per_kmer = stats["total_build_time_sec"] * 1e9 / max(1, index.num_kmers)
        print(f"=== total: {stats['total_build_time_sec']:.3f} [sec] "
              f"({ns_per_kmer:.1f} [ns/kmer])")
        print(json.dumps({kk: vv for kk, vv in stats.items() if not kk.startswith('step')}))
    return index
