"""Closed-form small-matrix linear algebra for TPU.

Batched jnp.linalg.solve/inv/det lower to LU decompositions that are
scalar-sequential and slow on TPU vector units; 3x3 systems (triangulation,
landmark Schur blocks) use the adjugate closed form instead — pure
elementwise VPU arithmetic that fuses with the surrounding ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det3(A: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (...,) determinant, closed form."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adjugate3(A: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3, 3) adjugate (inverse * det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )


def inv3(A: jax.Array, eps: float = 1e-20) -> jax.Array:
    """(..., 3, 3) -> (..., 3, 3) inverse via adjugate / det."""
    det = det3(A)
    safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    return adjugate3(A) / safe[..., None, None]


def solve3(A: jax.Array, b: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Solve A x = b for (..., 3, 3) x (..., 3) -> (..., 3), closed form."""
    det = det3(A)
    safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    adj = adjugate3(A)
    return jnp.einsum("...ij,...j->...i", adj, b) / safe[..., None]
