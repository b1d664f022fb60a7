"""Multi-chip sharded query engine (jax.sharding.Mesh + shard_map).

The reference is strictly single-node single-thread at query time
(reference: benchmarks/README.md:22 "Queries were run using one thread");
this module is the TPU-native scale-out story promised by SURVEY.md §2.5:

  * axis ``data``  — pure data parallelism over the query batch (reads are
    independent; the DP analogue).
  * axis ``bucket`` — the control codewords (the dominant index component,
    ~5.1 of 8.67 bits/kmer on human, BASELINE.md) are sharded by contiguous
    MPHF-slot range. Each device answers only the lanes whose minimizer
    hashes into its range (an EP-style layout: the MPHF slot *is* a hash
    range, so sharding aligns with PTHash partitions); per-lane results are
    combined with ``lax.pmin``/``pmax`` over ICI. Strings and the small
    side arrays stay replicated in round 1.

Everything is branch-free across shards: the regular-mode RC fallback and
the canonical tie-retry are computed as unconditionally-masked probes
instead of `lax.cond`s, because "found" is only known after the cross-shard
combine.
"""



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exports shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import kmer as K
from ..constants import BACKWARD_ORIENTATION
from ..engine import (
    StaticCfg,
    _device_arrays,
    _empty_res,
    _to_host_result,
    lookup_with_info,
)
from ..ops import packed as Pk
from ..ops import u64 as u
from ..streaming import _DeviceStream, make_stream_step

U32 = jnp.uint32
I32 = jnp.int32

_CW_KEYS = ("cw_row",)
# combine rule per result field over the bucket axis: non-owner shards hold
# the identity (INVALID32 = all-ones for "min" fields, False for "max").
_MIN_FIELDS = ("kmer_id", "kmer_id_in_string", "kmer_offset", "string_id",
               "string_begin", "string_end")


def _ranges(sizes):
    """[3,2] -> [0,1,2,0,1] (per-group aranges)."""
    if not len(sizes):
        return np.zeros(0, dtype=np.int64)
    total = int(sizes.sum())
    out = np.arange(total, dtype=np.int64)
    starts = np.cumsum(sizes) - sizes
    return out - np.repeat(starts, sizes)


def _put_global(arr, sharding):
    """device_put single-controller; multi-controller every process holds
    the full host array, so assemble per-device shards via callback (plain
    device_put cannot target non-addressable devices)."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def _local_rows(v):
    """(lo, hi, values) — this process's contiguous row range of a global
    jax.Array sharded on axis 0 (bucket-replicated copies deduped)."""
    shards = {}
    for s in v.addressable_shards:
        sl = s.index[0] if s.index else slice(0, 1)
        shards[sl.start or 0] = np.asarray(s.data)
    starts = sorted(shards)
    parts = [shards[s] for s in starts]
    lo = starts[0]
    return lo, lo + sum(len(p) for p in parts), np.concatenate(parts)


def make_mesh(shape=None, axis_names=("data", "bucket"), devices=None):
    """Default 2D mesh over all local devices: bucket axis of 2 when
    possible, the rest data-parallel."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        b = 2 if n % 2 == 0 and n >= 2 else 1
        shape = (n // b, b)
    return Mesh(devices.reshape(shape), axis_names)


def _combine_bucket(res, axis):
    """Merge per-shard masked results over the bucket axis."""
    out = {}
    for key, v in res.items():
        if key in _MIN_FIELDS:
            out[key] = jax.lax.pmin(v, axis)
        elif key == "kmer_orientation":
            out[key] = jax.lax.pmin(v, axis)  # default FORWARD=1 >= owner's
        elif key == "minimizer_found":
            out[key] = jax.lax.pmin(v.astype(I32), axis).astype(bool)
        elif key == "found":
            out[key] = jax.lax.pmax(v.astype(I32), axis).astype(bool)
        else:
            out[key] = v
    return out


def _merge_pref_a(res_a, res_b, use_b, use_b_flags):
    """res_a unless (use_b); minimizer_found follows use_b_flags
    (mirrors engine._merge, semantics of src/dictionary.cpp:64-78)."""
    out = {}
    for key in res_a:
        if key == "minimizer_found":
            out[key] = jnp.where(use_b_flags, res_b[key], res_a[key])
        elif key == "found":
            out[key] = res_a[key] | (use_b & res_b[key])
        else:
            out[key] = jnp.where(use_b, res_b[key], res_a[key])
    return out


def _branchfree_lookup(cfg, arrs, kmers32, per_shard, bucket_axis,
                       per_shard_hrows=None, fields="full"):
    """Full lookup with RC-fallback / tie-retry as unconditionally-masked
    probes (found is only global after the cross-shard combine); codeword
    ownership by MPHF-slot range on the bucket axis (and skew heavy rows by
    row range when the index carries hindex). fields="ids" serves the
    id-returning contract (required for rebased v2-row indexes)."""
    lo = jax.lax.axis_index(bucket_axis).astype(U32) * U32(per_shard)
    arrs = dict(arrs)
    arrs["cw_lo"] = lo
    arrs["cw_hi"] = lo + U32(per_shard)
    if per_shard_hrows is not None:
        hlo = jax.lax.axis_index(bucket_axis).astype(U32) * U32(per_shard_hrows)
        arrs["sk_lo"] = hlo
        arrs["sk_hi"] = hlo + U32(per_shard_hrows)

    B = kmers32.shape[0]
    magic = u.const64(cfg.magic)
    all_active = jnp.ones((B,), dtype=bool)

    if True:
        if cfg.canonical:
            kmers_rc32 = Pk.revcomp_kmers(kmers32, cfg.k)
            mv_f, mp_f, mv_r, mp_r = Pk.compute_minimizer_two_strand(
                kmers32, kmers_rc32, cfg.k, cfg.m, magic)
            rc_first = u.less(mv_r, mv_f)
            tie = u.equal(mv_r, mv_f)
            mv1 = u.select(rc_first, mv_r, mv_f)
            mp1 = jnp.where(rc_first, mp_r, mp_f)
            if (cfg.max_start_word + 1) * cfg.W <= 8:
                # a tie probes the SAME bucket, so the reference's retry
                # folds into two extra tie-gated position tries
                # (engine.lookup_with_info) — one probe + one combine
                mp2 = jnp.where(tie, mp_r, mp1)
                res = _combine_bucket(
                    lookup_with_info(cfg, arrs, kmers32, kmers_rc32, mv1, mp1,
                                     all_active, fields, minpos2=mp2),
                    bucket_axis)
            else:
                # wide kmers: unconditionally-masked retry probe (the 4-try
                # unroll blows up compile times past k~55)
                res1 = _combine_bucket(
                    lookup_with_info(cfg, arrs, kmers32, kmers_rc32, mv1, mp1,
                                     all_active, fields),
                    bucket_axis)
                res2 = _combine_bucket(
                    lookup_with_info(cfg, arrs, kmers32, kmers_rc32, mv_r,
                                     mp_r, tie, fields),
                    bucket_axis)
                retry = tie & ~res1["found"]
                res = _merge_pref_a(res1, res2, retry & res2["found"], retry)
        else:
            mv, mp = Pk.compute_minimizer(kmers32, cfg.k, cfg.m, magic)
            res1 = _combine_bucket(
                lookup_with_info(cfg, arrs, kmers32, None, mv, mp, all_active,
                                 fields),
                bucket_axis)
            kmers_rc32 = Pk.revcomp_kmers(kmers32, cfg.k)
            mv_r, mp_r = Pk.compute_minimizer(kmers_rc32, cfg.k, cfg.m, magic)
            res2 = _combine_bucket(
                lookup_with_info(cfg, arrs, kmers_rc32, None, mv_r, mp_r,
                                 all_active, fields),
                bucket_axis)
            miss = ~res1["found"]
            res = _merge_pref_a(res1, res2, miss & res2["found"], miss)
            res["minimizer_found"] = jnp.where(
                miss, res1["minimizer_found"] | res2["minimizer_found"],
                res1["minimizer_found"])
            # reference leaves BACKWARD orientation after an RC attempt even
            # on a miss (src/dictionary.cpp:71-76)
            res["kmer_orientation"] = jnp.where(
                miss, I32(BACKWARD_ORIENTATION), res["kmer_orientation"])
    return res


def make_sharded_lookup(cfg, per_shard, data_axis="data", bucket_axis="bucket",
                        per_shard_hrows=None, fields="full"):
    """Branch-free multi-shard lookup body (to be wrapped in shard_map)."""

    def body(arrs, kmers32):
        res = _branchfree_lookup(cfg, arrs, kmers32, per_shard, bucket_axis,
                                 per_shard_hrows, fields)
        # per-step report, psum'd over the data axis (SURVEY.md §2.5: the
        # streaming_query_report counters merge via psum)
        B = kmers32.shape[0]
        report = {
            "num_kmers": jax.lax.psum(jnp.full((), B, dtype=U32), data_axis),
            "num_positive": jax.lax.psum(res["found"].sum().astype(U32), data_axis),
        }
        return res, report

    return body


def make_sharded_access(cfg, per_blk, per_sw, data_axis="data",
                        bucket_axis="bucket"):
    """Sharded access(id) -> packed kmer: the id-block owner resolves the
    char offset from its fused acc_rows range (ONE local row gather per
    32-id block). With windowed rows (the common geometry) the owner
    decodes the whole kmer from row-resident chars and a single pmax
    combines — no strings stage at all. Otherwise the offset broadcasts
    (pmin) and the char-range owner reads from its haloed strings slice —
    2 combines (reference access, spectrum_preserving_string_set.hpp:
    114-118)."""
    from ..engine import _acc_read_window, _acc_resolve, _acc_windowed

    k = cfg.k
    windowed = _acc_windowed(k, cfg.access_C)

    def body(arrs, ids):
        j = jax.lax.axis_index(bucket_axis).astype(I32)
        blk = (ids >> U32(5)).astype(I32)
        blo = j * I32(per_blk)
        own_id = (blk >= blo) & (blk < blo + I32(per_blk))
        row = jnp.take(arrs["acc_rows"], jnp.where(own_id, blk - blo, 0),
                       axis=0, mode="clip")
        sid, off_w = _acc_resolve(cfg, row, ids)
        if windowed:
            km = _acc_read_window(cfg, row, ids, off_w)
            km = jnp.where(own_id[:, None], km, U32(0))
            return jax.lax.pmax(km, bucket_axis)
        off = jnp.where(own_id, off_w, U32(0xFFFFFFFF))
        off = jax.lax.pmin(off, bucket_axis)
        # char-range owner reads
        widx = (off >> U32(4)).astype(I32)
        wlo = j * I32(per_sw)
        own_c = (widx >= wlo) & (widx < wlo + I32(per_sw)) & (off != U32(0xFFFFFFFF))
        local_off = jnp.where(own_c, off - (wlo * 16).astype(U32), U32(0))
        km = Pk.read_kmers_at(arrs["strings32"], local_off, k)
        km = jnp.where(own_c[:, None], km, U32(0))
        return jax.lax.pmax(km, bucket_axis)

    return body


def make_sharded_weight(cfg, data_axis="data", bucket_axis="bucket"):
    """Sharded weight(id): interval endpoints shard by range; the covering
    shard searches locally and the value combines with pmax (reference
    weights.hpp:147-152)."""

    def body(arrs, ids):
        epl = arrs["w_endpoints"]
        own = (ids >= epl[0]) & (ids < epl[-1])
        i = jnp.searchsorted(epl, ids, side="right").astype(I32) - 1
        vid = jnp.take(arrs["w_value_ids"], jnp.clip(i, 0, len(arrs["w_value_ids"]) - 1), mode="clip")
        w = jnp.take(arrs["w_dictionary"], vid.astype(I32), mode="clip")
        w = jnp.where(own, w, U32(0))
        return jax.lax.pmax(w, bucket_axis)

    return body


def make_sharded_neighbours(cfg, per_shard, data_axis="data",
                            bucket_axis="bucket", per_shard_hrows=None,
                            fields="full"):
    """Batched navigation on the mesh: the 8 neighbour variants ride one
    branch-free sharded lookup (reference src/dictionary.cpp:112-128)."""

    def body(arrs, kmers32):
        Bl = kmers32.shape[0]
        k = cfg.k
        fwd = Pk.drop_one_char(kmers32)
        bwd = Pk.shift_up_one_char(kmers32, k)
        allk = jnp.concatenate(
            [Pk.set_char(fwd, k - 1, c) for c in range(4)]
            + [Pk.set_char(bwd, 0, c) for c in range(4)], axis=0)
        res = _branchfree_lookup(cfg, arrs, allk, per_shard, bucket_axis,
                                 per_shard_hrows, fields)
        return {key: v.reshape(8, Bl).T for key, v in res.items()}

    return body


def make_sharded_stream(cfg, per_shard, data_axis="data", bucket_axis="bucket",
                        data_size=1, per_shard_hrows=None):
    """One sharded streaming step: per-position lookups over reads sharded
    on the data axis, report counters derived on device (see streaming.py's
    adjacency rules) and psum'd over the mesh. Chains crossing a data-shard
    boundary are stitched with a ppermute of the previous shard's last-lane
    state — reads need NOT align with shard boundaries."""

    def body(arrs, kmers32, valid, first):
        res = _branchfree_lookup(cfg, arrs, kmers32, per_shard, bucket_axis,
                                 per_shard_hrows)
        found = res["found"] & valid
        sid = res["string_id"]
        kid = res["kmer_id"]
        orient = res["kmer_orientation"]
        pf = jnp.roll(found, 1).at[0].set(False)
        ext = (found & pf & ~first
               & (sid == jnp.roll(sid, 1))
               & (orient == jnp.roll(orient, 1))
               & (kid == jnp.roll(kid, 1) + jnp.roll(orient, 1).astype(U32)))
        # boundary stitch: shard i receives shard i-1's last-lane state
        # (shard 0 receives zeros => found=False => no stitch)
        last = jnp.stack([found[-1].astype(U32), sid[-1], kid[-1],
                          orient[-1].astype(U32)])
        prev = jax.lax.ppermute(last, data_axis,
                                [(i, i + 1) for i in range(data_size - 1)])
        ext0 = (found[0] & ~first[0] & (prev[0] != 0)
                & (sid[0] == prev[1])
                & (orient[0] == prev[3].astype(I32))
                & (kid[0] == prev[2] + prev[3]))
        # counters are identical on every bucket shard after the combine,
        # so psum over data only
        n_pos = jax.lax.psum(found.sum().astype(U32), data_axis)
        n_ext = jax.lax.psum(ext.sum().astype(U32) + ext0.astype(U32), data_axis)
        n_inv = jax.lax.psum((~valid).sum().astype(U32), data_axis)
        n_all = jax.lax.psum(jnp.full((), valid.shape[0], dtype=U32), data_axis)
        return {
            "num_kmers": n_all,
            "num_positive_kmers": n_pos,
            "num_extensions": n_ext,
            "num_searches": n_pos - n_ext,
            "num_invalid_kmers": n_inv,
            "num_negative_kmers": n_all - n_pos - n_inv,
        }

    return body


class _ChunkRow:
    """Deferred handle to one data-shard row of a stacked stream-step output
    (resolves after the group dispatch; consumed by _DeviceStream._fold).
    Multi-controller: the stacked output is sharded over processes, so the
    handle's index is LOCAL and only this process's rows resolve."""

    __slots__ = ("value",)

    def __init__(self):
        self.value = None

    def __array__(self, dtype=None, copy=None):
        assert self.value is not None, "stream group was never dispatched"
        arr, i = self.value
        if getattr(arr, "is_fully_addressable", True):
            out = np.asarray(arr)[i]
        else:
            out = _local_rows(arr)[2][i]
        return out.astype(dtype) if dtype is not None else out


class ShardedStream(_DeviceStream):
    """Packed sharded streaming: the anchored seed-and-extend step
    (streaming.make_stream_step) runs as data_size independent chunk
    pipelines — one per data-axis row — with BUCKET-sharded lookups inside
    (the same _branchfree_lookup as point queries) and string-chain reads
    answered by the char-range owner (pmax over the bucket axis). Uploads
    are 2-bit packed chars (0.25 B/char), NOT host-expanded kmers — the
    multi-chip throughput path SURVEY §2.5 promises.

    Host-side chunking, segment splitting, counter folding and the
    cross-chunk carry stitch are inherited from streaming._DeviceStream;
    chunks fold in stream order, so consecutive chunks may land on
    different data shards.

    MULTI-CONTROLLER (jax.process_count() > 1): each process feeds its OWN
    reads — its chunks fill the data rows its devices hold, the stacked
    step is a collective (inputs assembled with
    make_array_from_process_local_data, each host uploading only its rows),
    and each process folds only its own chunks' counters (reads never
    straddle processes, so the k-1 carry stays local). finalize() aligns
    the number of collective rounds across processes (idle processes run
    empty rounds) and allreduces the report. Every process must construct
    the stream and call finalize() (SPMD contract)."""

    def __init__(self, engine, pmax=1 << 18, rmax_shift=4):
        import jax.numpy as jnp

        self.engine = engine
        self.eng = engine
        cfg = engine.cfg
        self._init_host(cfg.k, pmax, rmax_shift)
        self._no_ladder = True  # one compiled stacked shape
        data_axis, bucket_axis = engine.mesh.axis_names
        self.D = engine.mesh.shape[data_axis]
        self._data_axis = data_axis
        self.procs = jax.process_count()
        if self.procs > 1:
            from . import multihost

            lo, hi = multihost.local_row_range(engine.mesh, self.D, data_axis)
            self.D_local = hi - lo
        else:
            self.D_local = self.D
        self._rounds = 0
        self._slots = []
        self._jnp = jnp

        per_sw = engine.per_shard_swords
        per_shard = engine.per_shard
        per_shard_hrows = engine.per_shard_hrows

        def lookup_fn(a, km):
            return _branchfree_lookup(cfg, a, km, per_shard, bucket_axis,
                                      per_shard_hrows)

        def swin(a, base, win16):
            j = jax.lax.axis_index(bucket_axis).astype(U32)
            wlo = j * U32(per_sw)
            w0 = base >> U32(4)
            own = (w0 >= wlo) & (w0 < wlo + U32(per_sw))
            local = jnp.where(own, base - wlo * U32(16), U32(0))
            w = win16(a["strings32"], local)
            return jax.lax.pmax(jnp.where(own, w, U32(0)), bucket_axis)

        key = ("sharded_stream", self.P, self.R)
        cache = getattr(engine, "_stream_steps", None)
        if cache is None:
            cache = engine._stream_steps = {}
        if key in cache:
            self._stacked = cache[key]
            return
        body = make_stream_step(cfg, lookup_fn, self.P, self.R, swin=swin)

        def wrapped(a, w, rn, rf, vb, cnt, nr):
            return body(a, w[0], rn[0], rf[0], vb[0], cnt[0], nr[0])[None]

        self._stacked = cache[key] = jax.jit(shard_map(
            wrapped, mesh=engine.mesh,
            in_specs=(engine._in_specs, P(data_axis, None), P(data_axis, None),
                      P(data_axis, None), P(data_axis, None), P(data_axis),
                      P(data_axis)),
            out_specs=P(data_axis, None, None), check_vma=False))

    # _DeviceStream.flush calls this with device-ready args; buffer a slot
    # per chunk and dispatch when every LOCAL data shard has one (the
    # dispatch is async, so a multi-controller round merely enqueues the
    # collective — it executes once every process has enqueued its match)
    def _step(self, arrs, words32, rnpos, rfirst, valid_bits, count, nreads):
        h = _ChunkRow()
        self._slots.append((np.asarray(words32), np.asarray(rnpos),
                            np.asarray(rfirst), np.asarray(valid_bits),
                            int(count), int(nreads), h))
        if len(self._slots) == self.D_local:
            self._dispatch()
        return h

    def _dispatch(self, force_empty=False):
        import jax.numpy as jnp

        if not self._slots and not force_empty:
            return
        slots = self._slots
        self._slots = []
        shapes = ((self.CW,), (self.R,), (self.R // 32 + 1,),
                  (self.P // 32 + 1,))
        pad = self.D_local - len(slots)
        z = tuple(np.zeros(s, np.uint32) for s in shapes) + (0, 0, _ChunkRow())
        slots = slots + [z] * pad
        stk = [np.stack([s[i] for s in slots]) for i in range(4)]
        cnt = np.array([s[4] for s in slots], dtype=np.uint32)
        nr = np.array([s[5] for s in slots], dtype=np.uint32)
        if self.procs == 1:
            ins = [jnp.asarray(x) for x in stk + [cnt, nr]]
        else:
            from . import multihost

            mesh, ax = self.eng.mesh, self._data_axis
            ins = [multihost.make_global_batch(x, mesh, (self.D,) + x.shape[1:],
                                               data_axis=ax)
                   for x in stk + [cnt, nr]]
        out = self._stacked(self.eng.arrs, *ins)
        self._rounds += 1
        for i, s in enumerate(slots):
            s[6].value = (out, i)

    def finalize(self):
        self.flush()
        self._dispatch()  # partial last group
        if self.procs > 1:
            from jax.experimental import multihost_utils

            rounds = multihost_utils.process_allgather(
                np.array([self._rounds]))
            for _ in range(int(rounds.max()) - self._rounds):
                self._dispatch(force_empty=True)
            rep = super().finalize()  # local chunks only
            keys = sorted(rep)
            allv = multihost_utils.process_allgather(
                np.array([rep[k2] for k2 in keys], dtype=np.int64))
            return dict(zip(keys, (int(x) for x in allv.sum(axis=0))))
        return super().finalize()


class ShardedEngine:
    """Index sharded/replicated over a Mesh + jitted collective lookup.

    Layout: codeword arrays P(bucket); query batch P(data); everything else
    replicated. Results come back sharded over data, replicated over bucket.
    """

    def __init__(self, index, mesh=None, host_arrs=None):
        self.index = index
        self.mesh = mesh if mesh is not None else make_mesh()
        self.cfg = StaticCfg(index)
        data_axis, bucket_axis = self.mesh.axis_names
        nb = self.mesh.shape[bucket_axis]

        # host_arrs: a precomputed _device_arrays(index) pytree (e.g. the
        # mmapped .arrs cache of a multi-GB index,
        # scripts/cache_device_arrays.py); the shard transforms below copy
        # what they rewrite, so mmapped inputs stay on disk
        if host_arrs is not None:
            from ..engine import row_width

            if host_arrs["cw_row"].shape[1] != row_width(self.cfg):
                raise ValueError(
                    f"stale host_arrs cache: cw_row has "
                    f"{host_arrs['cw_row'].shape[1]} columns, this engine "
                    f"expects {row_width(self.cfg)}")
            host = dict(host_arrs)
        else:
            host = _device_arrays(index)
        n_cw = len(host["cw_row"])
        per_shard = -(-n_cw // nb)
        padded = np.zeros((per_shard * nb, host["cw_row"].shape[1]),
                          dtype=host["cw_row"].dtype)
        padded[:n_cw] = host["cw_row"]
        host["cw_row"] = padded
        self.per_shard = per_shard

        # shard the mid-load rows along with their owning codeword range:
        # each shard gets a local mid_rows array holding only the entries of
        # its MPHF-slot range, and its cw_a rewritten to local offsets.
        status = host["cw_row"][:, 0] & 3
        cw_a = host["cw_row"][:, 1].copy()
        cw_b = host["cw_row"][:, 0] >> 2
        glob_mid = host["mid_rows"]
        WR = glob_mid.shape[1]
        shard_mids = []
        for j in range(nb):
            sl = slice(j * per_shard, (j + 1) * per_shard)
            mid = status[sl] == 1
            sizes = np.where(mid, cw_b[sl], 0).astype(np.int64)
            local_begin = np.cumsum(sizes) - sizes
            idx = np.repeat(cw_a[sl][mid].astype(np.int64), sizes[mid]) + _ranges(sizes[mid])
            shard_mids.append(glob_mid[idx] if len(idx)
                              else np.zeros((0, WR), glob_mid.dtype))
            cw_a[sl] = np.where(mid, local_begin.astype(cw_a.dtype), cw_a[sl])
        # shard the HEAVY rows the same way: bucket sizes are recovered from
        # the global begin layout (begins are segment starts of heavy_rows).
        # _expand_to_slots duplicates remapped codeword entries, so the same
        # begin can appear at several slots — sizes must come from the UNIQUE
        # sorted begins (a plain diff over sorted begins would hand one
        # duplicate size 0 and silently drop a whole bucket; advisor r2).
        # hindex-mode indexes (>= v1.2) skip all this: heavy lanes resolve
        # through sk_hrows, itself sharded by row range below.
        glob_heavy = host["heavy_rows"]
        heavy_any = (status == 2).any() and not self.cfg.skew_hrows
        if heavy_any:
            hv_all = np.flatnonzero(status == 2)
            hb = cw_a[hv_all].astype(np.int64)
            ub = np.unique(hb)
            usz = np.diff(np.concatenate([ub, [len(glob_heavy)]]))
            hsize = usz[np.searchsorted(ub, hb)]
            size_of_slot = np.zeros(len(status), dtype=np.int64)
            size_of_slot[hv_all] = hsize
        shard_heavies = []
        for j in range(nb):
            sl = slice(j * per_shard, (j + 1) * per_shard)
            hv = status[sl] == 2
            if not heavy_any or not hv.any():
                shard_heavies.append(np.zeros((0, glob_heavy.shape[1]),
                                              glob_heavy.dtype))
                continue
            sizes = np.where(hv, size_of_slot[sl], 0)
            local_begin = np.cumsum(sizes) - sizes
            idx = np.repeat(cw_a[sl][hv].astype(np.int64), sizes[hv]) + _ranges(sizes[hv])
            shard_heavies.append(glob_heavy[idx])
            cw_a[sl] = np.where(hv, local_begin.astype(cw_a.dtype), cw_a[sl])
        host["cw_row"][:, 1] = cw_a
        mid_len = max(1, max(len(s) for s in shard_mids))
        host["mid_rows"] = np.concatenate([
            np.pad(s, ((0, mid_len - len(s)), (0, 0))) for s in shard_mids])
        heavy_len = max(1, max(len(s) for s in shard_heavies))
        host["heavy_rows"] = np.concatenate([
            np.pad(s, ((0, heavy_len - len(s)), (0, 0))) for s in shard_heavies])

        # skew heavy rows (hindex mode): slot-keyed fused rows shard by
        # contiguous row range; the MINIMIZER owner broadcasts the row index
        # over the bucket axis (see engine.lookup_with_info)
        self.per_shard_hrows = None
        if self.cfg.skew_hrows and "sk_hrows" in host:
            hr = host["sk_hrows"]
            per_hr = max(1, -(-len(hr) // nb))
            padded_hr = np.zeros((per_hr * nb, hr.shape[1]), hr.dtype)
            padded_hr[: len(hr)] = hr
            host["sk_hrows"] = padded_hr
            self.per_shard_hrows = per_hr
            self.cfg.bucket_axis = bucket_axis

        # ---- strings + id-resolve + weight tables shard by contiguous
        # ranges on the bucket axis too (the LOOKUP path no longer touches
        # them — fused rows carry windows and resolve quads — so they only
        # serve access / chain reads, each routed to its range owner)
        s32 = host["strings32"]
        halo = self.cfg.W + 1  # a k-char read spans <= W+1 words
        per_sw = max(1, -(-len(s32) // nb))
        sw = np.zeros((nb, per_sw + halo), s32.dtype)
        for j in range(nb):
            seg = s32[j * per_sw : j * per_sw + per_sw + halo]
            sw[j, : len(seg)] = seg
        host["strings32"] = sw.reshape(-1)
        self.per_shard_swords = per_sw

        acc = host["acc_rows"]
        per_blk = max(1, -(-len(acc) // nb))
        acc_pad = np.zeros((per_blk * nb, acc.shape[1]), acc.dtype)
        acc_pad[: len(acc)] = acc
        host["acc_rows"] = acc_pad
        self.per_shard_blocks = per_blk
        # the unfused id-resolve tables only served access — dead on the mesh
        for dead in ("sidk32", "kmer_cum"):
            host.pop(dead, None)

        self.weighted = "w_endpoints" in host
        if self.weighted:
            ep = host["w_endpoints"]
            I = len(ep) - 1
            per_iv = max(1, -(-I // nb))
            eps, vids = [], []
            for j in range(nb):
                lo, hi = j * per_iv, min(I, (j + 1) * per_iv)
                e = ep[lo : hi + 1] if hi > lo else np.array([ep[-1]], ep.dtype)
                v = host["w_value_ids"][lo:hi]
                eps.append(np.pad(e, (0, per_iv + 1 - len(e)),
                                  constant_values=ep[-1]))
                vids.append(np.pad(v, (0, per_iv - len(v))))
            host["w_endpoints"] = np.concatenate(eps)
            host["w_value_ids"] = np.concatenate(vids)

        in_specs = {}
        self.arrs = {}
        sharded_keys = _CW_KEYS + ("mid_rows", "heavy_rows", "strings32",
                                   "acc_rows", "w_endpoints", "w_value_ids")
        if self.per_shard_hrows is not None:
            sharded_keys = sharded_keys + ("sk_hrows",)
        for key, arr in host.items():
            spec = P(bucket_axis) if key in sharded_keys else P()
            in_specs[key] = spec
            self.arrs[key] = _put_global(arr, NamedSharding(self.mesh, spec))

        self._in_specs = in_specs
        # rebased v2-row indexes (>= 2^32 chars) serve the id-returning
        # contract; v1 indexes keep the full lookup_advanced fields
        fields = "ids" if self.cfg.row_v2 else "full"
        body = make_sharded_lookup(self.cfg, per_shard, data_axis, bucket_axis,
                                   self.per_shard_hrows, fields)
        res_spec = {k2: P(data_axis)
                    for k2 in list(_empty_res(1, fields)) + ["found"]}
        rep_spec = {"num_kmers": P(), "num_positive": P()}
        self._lookup = jax.jit(
            shard_map(
                body,
                mesh=self.mesh,
                in_specs=(in_specs, P(data_axis, None)),
                out_specs=(res_spec, rep_spec),
                check_vma=False,
            )
        )
        stream_body = make_sharded_stream(self.cfg, per_shard, data_axis,
                                          bucket_axis,
                                          data_size=self.mesh.shape[data_axis],
                                          per_shard_hrows=self.per_shard_hrows)
        cnt_spec = {k2: P() for k2 in ("num_kmers", "num_positive_kmers",
                                       "num_extensions", "num_searches",
                                       "num_invalid_kmers", "num_negative_kmers")}
        self._stream = jax.jit(
            shard_map(
                stream_body,
                mesh=self.mesh,
                in_specs=(in_specs, P(data_axis, None), P(data_axis), P(data_axis)),
                out_specs=cnt_spec,
                check_vma=False,
            )
        )
        acc_body = make_sharded_access(self.cfg, per_blk, per_sw,
                                       data_axis, bucket_axis)
        self._access = jax.jit(shard_map(
            acc_body, mesh=self.mesh,
            in_specs=(in_specs, P(data_axis)),
            out_specs=P(data_axis, None), check_vma=False))
        nb_body = make_sharded_neighbours(self.cfg, per_shard, data_axis,
                                          bucket_axis, self.per_shard_hrows,
                                          fields)
        nb_spec = {k2: P(data_axis, None)
                   for k2 in list(_empty_res(1, fields)) + ["found"]}
        self._neighbours = jax.jit(shard_map(
            nb_body, mesh=self.mesh,
            in_specs=(in_specs, P(data_axis, None)),
            out_specs=nb_spec, check_vma=False))
        if self.weighted:
            w_body = make_sharded_weight(self.cfg, data_axis, bucket_axis)
            self._weight = jax.jit(shard_map(
                w_body, mesh=self.mesh,
                in_specs=(in_specs, P(data_axis)),
                out_specs=P(data_axis), check_vma=False))
        self._kmer_sharding = NamedSharding(self.mesh, P(data_axis, None))
        self._flag_sharding = NamedSharding(self.mesh, P(data_axis))
        self._batch_multiple = self.mesh.shape[data_axis]

    def per_device_bytes(self):
        """Index bytes resident on ONE device (sharded arrays count only
        their local shard). The fused candidate rows — the dominant index
        component — shard on the bucket axis, so this drops ~linearly in
        mesh.shape['bucket']."""
        dev0 = self.mesh.devices.ravel()[0]
        total = 0
        for arr in self.arrs.values():
            for s in arr.addressable_shards:
                if s.device == dev0:
                    total += s.data.nbytes
        return total

    def lookup_device(self, kmers32):
        return self._lookup(self.arrs, kmers32)

    def lookup_multiprocess(self, kmers64):
        """Multi-controller lookup: every process passes the same GLOBAL
        batch (length a multiple of the data-axis size); returns
        (res, report, (lo, hi)) where res holds only THIS process's rows
        [lo, hi) of the global result (non-addressable rows cannot be
        fetched here)."""
        kmers64 = np.atleast_2d(np.asarray(kmers64, dtype=np.uint64))
        if len(kmers64) % self._batch_multiple:
            raise ValueError("multiprocess batch length must be a multiple "
                             f"of the data-axis size {self._batch_multiple}")
        kmers32 = K.kmers_to_u32(kmers64, self.cfg.k)
        dev = _put_global(kmers32, self._kmer_sharding)
        res, report = self.lookup_device(dev)
        report = jax.tree.map(int, report)  # out_specs P() => replicated
        out = {}
        lo = hi = 0
        for key, v in res.items():
            lo, hi, out[key] = _local_rows(v)
        return _to_host_result(out), report, (lo, hi)

    def lookup(self, kmers64):
        """NumPy convenience wrapper; pads the batch to the data-axis size."""
        kmers64 = np.atleast_2d(np.asarray(kmers64, dtype=np.uint64))
        n = len(kmers64)
        mult = self._batch_multiple
        pad = (-n) % mult
        kmers32 = K.kmers_to_u32(kmers64, self.cfg.k)
        if pad:
            kmers32 = np.concatenate([kmers32, np.tile(kmers32[-1:], (pad, 1))])
        dev = jax.device_put(jnp.asarray(kmers32), self._kmer_sharding)
        res, report = self.lookup_device(dev)
        res = jax.tree.map(np.asarray, res)
        report = jax.tree.map(int, report)
        if pad:
            # the device report counted the padded lanes; correct it here
            report["num_kmers"] -= pad
            report["num_positive"] -= int(res["found"][n:].sum())
        res = {key: v[:n] for key, v in res.items()}
        return _to_host_result(res), report


    def _pad_batch(self, arr, fill=0):
        n = len(arr)
        pad = (-n) % self._batch_multiple
        if pad:
            arr = np.concatenate([arr, np.full((pad,) + arr.shape[1:], fill,
                                               dtype=arr.dtype)])
        return arr, n

    def access(self, ids):
        """ids -> packed uint64 kmers, resolved and read across the mesh."""
        ids32, n = self._pad_batch(np.asarray(ids, dtype=np.uint32))
        dev = jax.device_put(jnp.asarray(ids32), self._flag_sharding)
        out32 = np.asarray(self._access(self.arrs, dev))[:n]
        return K.u32_to_kmers64(out32, self.cfg.k)

    def weight(self, ids):
        assert self.weighted, "index built without weights"
        ids32, n = self._pad_batch(np.asarray(ids, dtype=np.uint32))
        dev = jax.device_put(jnp.asarray(ids32), self._flag_sharding)
        return np.asarray(self._weight(self.arrs, dev))[:n].astype(np.uint64)

    def kmer_neighbours(self, kmers64):
        """dict of (B, 8) arrays, columns 0-3 forward A,C,T,G then 4-7
        backward (reference neighbourhood<kmer_t>, util.hpp:77-81)."""
        from ..constants import INVALID_UINT64

        kmers64 = np.atleast_2d(np.asarray(kmers64, dtype=np.uint64))
        k32, n = self._pad_batch(K.kmers_to_u32(kmers64, self.cfg.k))
        dev = jax.device_put(jnp.asarray(k32), self._kmer_sharding)
        res = jax.tree.map(np.asarray, self._neighbours(self.arrs, dev))
        found = res.pop("found")[:n]
        out = {}
        for key, v in res.items():
            v = v[:n]
            if v.dtype == np.uint32:
                v64 = v.astype(np.uint64)
                v64[~found] = np.uint64(INVALID_UINT64)
                out[key] = v64
            else:
                out[key] = v
        return out

    def stream_report(self, kmers64, valid, first):
        """One sharded streaming step over per-position kmers of a read
        batch: returns the psum'd streaming_query_report counters.
        Batch length must be a multiple of the data-axis size; reads may
        straddle shard boundaries (chains are stitched with a ppermute of
        the previous shard's last-lane state)."""
        kmers64 = np.atleast_2d(np.asarray(kmers64, dtype=np.uint64))
        kmers32 = K.kmers_to_u32(kmers64, self.cfg.k)
        dev = _put_global(kmers32, self._kmer_sharding)
        v = _put_global(np.asarray(valid, dtype=bool), self._flag_sharding)
        f = _put_global(np.asarray(first, dtype=bool), self._flag_sharding)
        rep = self._stream(self.arrs, dev, v, f)
        return jax.tree.map(int, rep)
