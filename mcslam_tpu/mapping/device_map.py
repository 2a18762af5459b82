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


class DeviceMap:
    def __init__(self, capacity: int = 65536):
        self.capacity = capacity
        self.pos = jnp.zeros((capacity, 3), jnp.float32)
        self.desc = jnp.zeros((capacity, 8), jnp.uint32)
        self.valid = jnp.zeros(capacity, bool)

    def upsert(self, ids, pos=None, desc=None, valid=None):
        ids = jnp.asarray(np.asarray(ids, np.int32))
        if pos is not None:
            self.pos = self.pos.at[ids].set(jnp.asarray(pos, jnp.float32))
        if desc is not None:
            self.desc = self.desc.at[ids].set(jnp.asarray(desc, jnp.uint32))
        if valid is not None:
            self.valid = self.valid.at[ids].set(bool(valid))

    def remove(self, ids):
        ids = jnp.asarray(np.asarray(ids, np.int32))
        self.valid = self.valid.at[ids].set(False)
