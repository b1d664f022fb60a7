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

import os as _os


def _enable_jax_compilation_cache():
    """Persistent jit cache: first compile of the query kernels can take
    tens of seconds (more over remote-compile tunnels); caching makes every
    later process start warm. Opt out with SSHASH_TPU_JAX_CACHE=0."""
    d = _os.environ.get("SSHASH_TPU_JAX_CACHE",
                        _os.path.expanduser("~/.cache/sshash_tpu_jax"))
    if not d or d == "0":
        return
    try:
        import jax

        _os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_enable_jax_compilation_cache()

from .builder.build import BuildConfig, build
from .dictionary import Dictionary
from .index import Index

__version__ = "0.1.0"

__all__ = ["BuildConfig", "build", "Dictionary", "Index"]
