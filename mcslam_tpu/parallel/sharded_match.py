"""Map-scale descriptor matching sharded over a device mesh.

The reference matches query descriptors against one candidate keyframe's
landmarks at a time (Relocalization::checkRelocalization,
/root/reference/MCSlam/src/relocalization.cpp:180) — fine for a few
hundred landmarks, host-bound for city-scale maps. TPU-native scaling
path: the map descriptor table is sharded across the mesh's `map` axis,
every device computes Hamming distances of ALL queries against ITS shard
(one popcount-matmul), reduces its local best/second-best per query, and
the global (best, second-best, argmin) is combined with `pmin`-style
collectives — the cross-device payload is O(queries), not O(map).

Global top-2 combine: for per-device (d1, i1, d2), the global second
best is min over {all d2} ∪ {all d1 except the global winner's} — both
reductions ride ICI as a pair of `psum`-class collectives on packed
(Q,)-sized vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcslam_tpu.ops import hamming

AXIS = "map"
_BIG = jnp.int32(1 << 20)


def make_mesh(n_devices: int | None = None, platform: str | None = None) -> Mesh:
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], axis_names=(AXIS,))


def shard_map_desc(mesh: Mesh, map_desc, map_valid, pad_multiple: int = 8):
    """Pad the map table to a mesh-divisible length and device_put it
    sharded on axis 0. Returns (desc (Np, 8), valid (Np,), Np)."""
    import numpy as np

    n_dev = mesh.devices.size
    N = len(map_desc)
    Np = -(-max(N, 1) // (n_dev * pad_multiple)) * n_dev * pad_multiple
    d = np.zeros((Np, 8), np.uint32)
    v = np.zeros(Np, bool)
    d[:N] = np.asarray(map_desc, np.uint32)
    v[:N] = np.asarray(map_valid, bool)
    sh = NamedSharding(mesh, P(AXIS))
    return (jax.device_put(d, sh), jax.device_put(v, sh), Np)


@functools.partial(jax.jit, static_argnames=("mesh", "max_dist", "ratio"))
def sharded_hamming_match(
    mesh: Mesh,
    query_desc: jax.Array,  # (Q, 8) uint32, replicated
    query_valid: jax.Array,  # (Q,) bool
    map_desc: jax.Array,  # (Np, 8) uint32, sharded on axis 0
    map_valid: jax.Array,  # (Np,) bool, sharded on axis 0
    max_dist: int = 64,
    ratio: float = 0.85,
):
    """-> (idx (Q,) int32 global map row of the best match, ok (Q,) bool
    passing distance + Lowe-ratio gates). One popcount-matmul per device
    over its map shard; O(Q) collectives to combine."""
    n_dev = mesh.devices.size
    n_local = map_desc.shape[0] // n_dev

    def shard_fn(qd, qv, md, mv):
        # local distances: (Q, n_local)
        d = hamming.hamming_matrix(qd, md)
        d = jnp.where(mv[None, :], d, _BIG)
        # local best / second best per query
        i1 = jnp.argmin(d, axis=1)
        d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
        d_wo = d.at[jnp.arange(d.shape[0]), i1].set(_BIG)
        d2 = jnp.min(d_wo, axis=1)
        # globalize the local index
        dev = jax.lax.axis_index(AXIS)
        gi1 = i1.astype(jnp.int32) + dev.astype(jnp.int32) * n_local
        # global best: pack distance+device so argmin is one pmin
        # (distance in the high bits, device id in the low bits keeps the
        # comparison lexicographic and deterministic; distances are
        # <= 256 and device counts small, so int32 never overflows)
        packed = d1.astype(jnp.int32) * (n_dev + 1) + dev.astype(jnp.int32)
        gbest = jax.lax.pmin(packed, AXIS)
        best_dev = (gbest % (n_dev + 1)).astype(jnp.int32)
        best_d = (gbest // (n_dev + 1)).astype(jnp.int32)
        # winner's global index: contributed only by the winning device
        contrib = jnp.where(best_dev == dev, gi1, 0)
        best_idx = jax.lax.psum(contrib, AXIS)
        # global second best: min over all local d2 and all LOSING d1
        d1_losing = jnp.where(best_dev == dev, _BIG, d1)
        gsecond = jnp.minimum(
            jax.lax.pmin(d2, AXIS), jax.lax.pmin(d1_losing, AXIS)
        )
        ok = (
            qv
            & (best_d <= max_dist)
            & (best_d.astype(jnp.float32)
               <= ratio * gsecond.astype(jnp.float32))
        )
        return best_idx, ok, best_d

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(query_desc, query_valid, map_desc, map_valid)
