"""Grid-balanced keypoint selection from dense score maps.

Replaces (WHAT) the reference's quad-tree keypoint distribution
(DistributeOctTree, /root/reference/MCSlam/src/ORBextractor.cpp:554): the goal
there is spatial uniformity of the selected corners. TPU-native equivalent:
partition the image into fixed cells, take the top-k responses per cell
(one reshaped top_k), then take the global top-N over the per-cell survivors.
Static output shape (N keypoints + validity mask), no recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_keypoints(
    score: jax.Array,
    num_points: int,
    cell: int = 16,
    per_cell: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """score: (H, W) dense NMS'd score map -> spatially balanced keypoints.

    Returns (yx (N, 2) int32, resp (N,) float32, valid (N,) bool), where
    N = num_points; invalid slots have resp 0 and yx (0, 0).
    """
    h, w = score.shape
    gh, gw = -(-h // cell), -(-w // cell)
    padded = jnp.pad(
        score, ((0, gh * cell - h), (0, gw * cell - w)), constant_values=0.0
    )
    cells = padded.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(gh * gw, cell * cell)

    k = min(per_cell, cell * cell)
    # per-cell top-k by iterative max+mask: k is tiny (<=4 in practice),
    # so k passes of (max, argmax, one-hot mask) beat the sort lax.top_k
    # lowers to on TPU
    if k <= 8:
        vals = cells
        lane = jnp.arange(cells.shape[1], dtype=jnp.int32)[None, :]
        rv, ra = [], []
        for _ in range(k):
            a = jnp.argmax(vals, axis=1).astype(jnp.int32)
            rv.append(jnp.max(vals, axis=1))
            ra.append(a)
            vals = jnp.where(lane == a[:, None], -jnp.inf, vals)
        cell_resp = jnp.stack(rv, axis=1)  # (G, k)
        cell_arg = jnp.stack(ra, axis=1)
    else:
        cell_resp, cell_arg = jax.lax.top_k(cells, k)  # (G, k)

    # flat pixel coordinates of every candidate
    cy = cell_arg // cell
    cx = cell_arg % cell
    gy = (jnp.arange(gh * gw, dtype=jnp.int32) // gw)[:, None]
    gx = (jnp.arange(gh * gw, dtype=jnp.int32) % gw)[:, None]
    ys = gy * cell + cy
    xs = gx * cell + cx

    flat_resp = cell_resp.reshape(-1)
    flat_ys = ys.reshape(-1)
    flat_xs = xs.reshape(-1)

    n = min(num_points, flat_resp.shape[0])
    top_resp, top_arg = jax.lax.top_k(flat_resp, n)
    yx = jnp.stack([flat_ys[top_arg], flat_xs[top_arg]], axis=-1)
    valid = top_resp > 0.0
    yx = jnp.where(valid[:, None], yx, 0)
    if n < num_points:
        pad = num_points - n
        yx = jnp.pad(yx, ((0, pad), (0, 0)))
        top_resp = jnp.pad(top_resp, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return yx.astype(jnp.int32), top_resp, valid


def select_keypoints_count(
    score: jax.Array,
    max_out: int,
    target,
    cell: int = 16,
    per_cell: int = 4,
    search_iters: int = 12,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sort-free variant of select_keypoints: picks ~`target` keypoints
    (a TRACED count, so one compiled program serves every pyramid level's
    budget) by binary-searching a response threshold and compacting the
    survivors with a one-hot matmul — no TPU sort anywhere. The output is
    position-ordered, not response-ordered; validity (not prefix order)
    carries the budget.
    """
    h, w = score.shape
    gh, gw = -(-h // cell), -(-w // cell)
    padded = jnp.pad(
        score, ((0, gh * cell - h), (0, gw * cell - w)), constant_values=0.0
    )
    cells = padded.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(gh * gw, cell * cell)

    k = min(per_cell, cell * cell)
    # per-cell top-k by iterative max+mask (k is tiny)
    vals = cells
    lane = jnp.arange(cells.shape[1], dtype=jnp.int32)[None, :]
    rv, ra = [], []
    for _ in range(k):
        a = jnp.argmax(vals, axis=1).astype(jnp.int32)
        rv.append(jnp.max(vals, axis=1))
        ra.append(a)
        vals = jnp.where(lane == a[:, None], -jnp.inf, vals)
    cell_resp = jnp.stack(rv, axis=1)
    cell_arg = jnp.stack(ra, axis=1)

    cy = cell_arg // cell
    cx = cell_arg % cell
    gy = (jnp.arange(gh * gw, dtype=jnp.int32) // gw)[:, None]
    gx = (jnp.arange(gh * gw, dtype=jnp.int32) % gw)[:, None]
    flat_resp = cell_resp.reshape(-1)
    flat_ys = (gy * cell + cy).reshape(-1).astype(jnp.float32)
    flat_xs = (gx * cell + cx).reshape(-1).astype(jnp.float32)
    pos_ok = flat_resp > 0.0
    # tie-break jitter: on score plateaus (saturated textures, the rank
    # bonus) the threshold search cannot split survivors and the
    # positional cap would keep only the TOP of the image; a tiny hashed
    # per-slot epsilon breaks ties without spatial bias (too small to
    # reorder genuinely distinct responses)
    idx32 = jnp.arange(flat_resp.shape[0], dtype=jnp.uint32)
    jitter = (
        ((idx32 * jnp.uint32(2654435761)) >> 16).astype(jnp.float32)
        / 65536.0 * 1e-4
    )
    flat_sel = flat_resp + jitter

    # binary-search the response threshold whose survivor count ~ target
    tgt = jnp.asarray(target, jnp.float32)
    lo = jnp.asarray(0.0, jnp.float32)
    hi = jnp.max(jnp.where(pos_ok, flat_sel, 0.0)) + 1e-6

    def body(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((flat_sel >= mid) & pos_ok).astype(jnp.float32)
        too_many = cnt > tgt
        return jnp.where(too_many, mid, lo), jnp.where(too_many, hi, mid)

    lo, hi = jax.lax.fori_loop(0, search_iters + 12, body, (lo, hi))
    sel = (flat_sel >= lo) & pos_ok  # count >= target side

    # compact survivors into max_out slots with a one-hot matmul (MXU)
    pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
    keep = sel & (pos < max_out)
    oh = (
        (pos[:, None] == jnp.arange(max_out, dtype=jnp.int32)[None, :])
        & keep[:, None]
    ).astype(jnp.float32)  # (M, max_out)
    payload = jnp.stack(
        [flat_ys, flat_xs, flat_resp, jnp.ones_like(flat_resp)], axis=0
    )  # (4, M)
    out = payload @ oh  # (4, max_out)
    valid = out[3] > 0.5
    yx = jnp.stack([out[0], out[1]], axis=-1).astype(jnp.int32)
    yx = jnp.where(valid[:, None], yx, 0)
    return yx, jnp.where(valid, out[2], 0.0), valid
