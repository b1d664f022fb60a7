"""Sanitizer/debug mode (debug.py) — the reference's ASAN-build analog
(-D SSHASH_USE_SANITIZERS=On, CMakeLists.txt:39-41): checkify'd lookup
postconditions, jax_debug_nans toggling, device-vs-oracle cross-check,
and the SSHASH_DEBUG engine switch."""

import numpy as np
import pytest

from sshash_tpu import kmer as K
from sshash_tpu.debug import (assert_matches_oracle, checkified_lookup,
                              debug_mode)
from sshash_tpu.oracle import access


def _pos_batch(d, n, rng):
    idx = d.index
    ids = rng.integers(0, idx.num_kmers, n)
    return ids, K.kmers_to_u32(access(idx, ids), idx.k)


def test_checkified_lookup_passes_on_valid_batch(dict_k31, rng):
    import jax.numpy as jnp

    eng = dict_k31.to_device()
    ids, kmers32 = _pos_batch(dict_k31, 256, rng)
    run = checkified_lookup(eng)
    res = run(jnp.asarray(kmers32))
    assert int(np.asarray(res["found"]).sum()) == len(ids)
    np.testing.assert_array_equal(np.asarray(res["kmer_id"]),
                                  ids.astype(np.uint32))


def test_checkified_lookup_raises_on_violation(dict_k31, rng):
    import jax.numpy as jnp
    from jax.experimental import checkify

    eng = dict_k31.to_device()
    _, kmers32 = _pos_batch(dict_k31, 256, rng)
    # shrink the accepted id range: real results now violate the
    # postcondition, proving the checks actually fire
    run = checkified_lookup(eng, num_kmers_bound=1)
    with pytest.raises(checkify.JaxRuntimeError, match="kmer_id"):
        run(jnp.asarray(kmers32))


def test_debug_mode_toggles_and_restores():
    import jax

    prev = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == prev


def test_assert_matches_oracle(dict_k31, rng):
    idx = dict_k31.index
    ids = rng.integers(0, idx.num_kmers, 128)
    kmers64 = access(idx, ids)
    kmers64[::2] = K.revcomp_kmers(kmers64[::2], idx.k)
    assert_matches_oracle(dict_k31, kmers64)


def test_sshash_debug_env_engages_sanitizer(dict_k31, rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    from sshash_tpu.engine import DeviceEngine

    monkeypatch.setenv("SSHASH_DEBUG", "1")
    prev_nans = jax.config.jax_debug_nans
    try:
        eng = DeviceEngine(dict_k31.index)
        assert eng._debug
        ids, kmers32 = _pos_batch(dict_k31, 64, rng)
        res = eng.lookup_device(jnp.asarray(kmers32))
        assert int(np.asarray(res["found"]).sum()) == len(ids)
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
