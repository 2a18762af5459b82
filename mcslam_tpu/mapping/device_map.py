"""Device-resident mirror of the landmark map.

The host LandmarkMap stays the source of truth for bookkeeping (ids, free
list), but tracking kernels read landmark positions/descriptors from this
HBM-resident mirror so the whole per-frame track step chains on device with
a single host fetch at the end. Updates are device-side scatters driven by
small (ids, values) uploads — never a full-array upload (the host<->device
tunnel is slow).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _bucket(n: int) -> int:
    """Round update sizes to power-of-two buckets: every distinct shape of
    an eager scatter op compiles a fresh executable (seconds each on a
    remote-compile TPU), so update shapes must come from a tiny fixed set."""
    b = 16
    while b < n:
        b *= 2
    return b


def _pad_ids(ids: np.ndarray, values: np.ndarray | None):
    n = len(ids)
    b = _bucket(n)
    if b == n:
        return ids, values
    # pad with repeats of the first element: duplicate .set writes of the
    # same value are idempotent
    pad_ids = np.concatenate([ids, np.repeat(ids[:1], b - n)])
    pad_vals = None
    if values is not None:
        pad_vals = np.concatenate(
            [values, np.repeat(values[:1], b - n, axis=0)]
        )
    return pad_ids, pad_vals


class DeviceMap:
    def __init__(self, capacity: int = 65536):
        self.capacity = capacity
        self.pos = jnp.zeros((capacity, 3), jnp.float32)
        self.desc = jnp.zeros((capacity, 8), jnp.uint32)
        self.normal = jnp.zeros((capacity, 3), jnp.float32)
        self.valid = jnp.zeros(capacity, bool)

    def upsert(self, ids, pos=None, desc=None, valid=None, normal=None):
        ids = np.asarray(ids, np.int32)
        if len(ids) == 0:
            return
        if pos is not None:
            i, v = _pad_ids(ids, np.asarray(pos, np.float32))
            self.pos = self.pos.at[jnp.asarray(i)].set(jnp.asarray(v))
        if normal is not None:
            i, v = _pad_ids(ids, np.asarray(normal, np.float32))
            self.normal = self.normal.at[jnp.asarray(i)].set(jnp.asarray(v))
        if desc is not None:
            i, v = _pad_ids(ids, np.asarray(desc, np.uint32))
            self.desc = self.desc.at[jnp.asarray(i)].set(jnp.asarray(v))
        if valid is not None:
            i, _ = _pad_ids(ids, None)
            self.valid = self.valid.at[jnp.asarray(i)].set(bool(valid))

    def remove(self, ids):
        ids = np.asarray(ids, np.int32)
        if len(ids) == 0:
            return
        i, _ = _pad_ids(ids, None)
        self.valid = self.valid.at[jnp.asarray(i)].set(False)
