"""Debug / sanitizer mode — the TPU analog of the reference's sanitizer
build (`-D SSHASH_USE_SANITIZERS=On` adds `-fsanitize=address`,
reference CMakeLists.txt:39-41, README.md:84-89 debug-build recipe).

Address sanitizers don't exist for XLA programs; on TPU the equivalent
failure class is a clipped gather silently reading the WRONG row (every
device gather runs with mode="clip", so an out-of-bounds index produces a
wrong value instead of a crash). This module provides three layers that
surface such bugs at runtime:

  1. ``debug_mode()`` — context manager flipping ``jax_debug_nans`` (traps
     NaN-producing ops inside any jitted kernel, the direct analog of a
     hardware trap);
  2. ``checkified_lookup(engine)`` — the batched lookup kernel wrapped in
     ``jax.experimental.checkify`` with explicit postcondition checks
     (found lanes must carry an in-range kmer_id/kmer_offset and a +-1
     orientation) — violations raise instead of propagating wrong values;
  3. ``assert_matches_oracle(dictionary, kmers64)`` — device-vs-NumPy
     cross-check, the fast-vs-slow assertion pattern the suite itself uses
     (SURVEY §4.5).

Set ``SSHASH_DEBUG=1`` in the environment to engage layers 1+2 on every
``DeviceEngine`` automatically (engine.py reads it at construction).
"""

import contextlib

import numpy as np


@contextlib.contextmanager
def debug_mode():
    """Enable jax_debug_nans for the dynamic extent of the block."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkified_lookup(engine, num_kmers_bound=None, num_chars_bound=None):
    """Return ``run(kmers32) -> result dict`` executing the engine's full
    lookup under checkify; raises ``checkify.JaxRuntimeError`` when a found
    lane violates the index postconditions. The bound overrides exist for
    tests (force a violation without corrupting device arrays)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify

    nk = int(num_kmers_bound if num_kmers_bound is not None
             else engine.index.num_kmers)
    nc = int(num_chars_bound if num_chars_bound is not None
             else engine.index.num_chars)
    base = engine._lookup_fn

    def body(arrs, kmers32):
        res = base(arrs, kmers32)
        found = res["found"]
        checkify.check(
            jnp.all(~found | (res["kmer_id"] < np.uint32(nk))),
            "sanitizer: found lane with kmer_id >= num_kmers")
        checkify.check(
            jnp.all(~found | (res["kmer_offset"] < np.uint32(nc))),
            "sanitizer: found lane with kmer_offset >= num_chars")
        ori = res["kmer_orientation"]
        checkify.check(
            jnp.all((ori == 1) | (ori == -1) | ~found),
            "sanitizer: orientation not in {+1, -1}")
        checkify.check(
            jnp.all(~found | (res["string_begin"] <= res["kmer_offset"])),
            "sanitizer: kmer_offset before its string_begin")
        return res

    ck = jax.jit(checkify.checkify(body, errors=checkify.user_checks))

    def run(kmers32):
        err, res = ck(engine.arrs, kmers32)
        checkify.check_error(err)
        return res

    return run


def assert_matches_oracle(dictionary, kmers64):
    """Device lookup vs the NumPy oracle on the same batch; raises
    AssertionError naming the first mismatching field."""
    from . import oracle

    kmers64 = np.atleast_2d(np.asarray(kmers64, dtype=np.uint64))
    dev = dictionary.to_device().lookup(kmers64)
    ref = oracle.lookup(dictionary.index, kmers64)
    for key in ("kmer_id", "kmer_orientation", "string_id", "kmer_offset"):
        if key in dev and key in ref:
            d, r = np.asarray(dev[key]), np.asarray(ref[key])
            bad = np.nonzero(d != r)[0]
            assert bad.size == 0, (
                f"device/oracle mismatch on {key} at lanes {bad[:8]}: "
                f"device={d[bad[:8]]} oracle={r[bad[:8]]}")
