"""sshash_tpu — a TPU-native k-mer dictionary engine.

A from-scratch reimplementation of the capabilities of jermp/sshash (sparse &
skew hashing of minimizers over a spectrum-preserving string set), designed
for batched array execution on TPUs with JAX/XLA/Pallas:

  * the index is a handful of dense uint32/uint64 arrays (packed 2-bit
    strings, string endpoints, MPHF pilots, control codewords, bucket arrays);
  * queries (Lookup / Access / Weight / Membership / streaming membership)
    run as large batched jitted array programs;
  * construction runs on host (NumPy + optional C++ accelerators) and emits
    the device arrays.

Observable contract (matching the reference): every kmer of the input gets
the sequential id determined by input file order; reverse complements are
considered equal; weights and navigation match the reference semantics.
"""

from .builder.build import BuildConfig, build
from .dictionary import Dictionary
from .index import Index

__version__ = "0.1.0"

__all__ = ["BuildConfig", "build", "Dictionary", "Index"]
