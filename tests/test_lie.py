import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcslam_tpu.geometry import lie


def rand_w(key, n, scale=2.0):
    return jax.random.normal(key, (n, 3)) * scale


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    w = rand_w(key, 64, scale=1.0)
    # keep |w| < pi: log returns the principal tangent, so only principal
    # tangents round-trip elementwise
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.where(norm > 3.0, w * (3.0 / norm), w)
    R = lie.so3_exp(w)
    # valid rotations
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)),
        np.broadcast_to(np.eye(3), (64, 3, 3)),
        atol=1e-5,
    )
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_so3_small_angle():
    w = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
    assert np.all(np.isfinite(np.asarray(lie.so3_log(R))))


def test_so3_exp_grad_finite_at_zero():
    g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda x: jnp.sum(lie.se3_exp(x)))(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_so3_log_near_pi():
    axis = jnp.array([0.3, -0.5, 0.81])
    axis = axis / jnp.linalg.norm(axis)
    for theta in [np.pi - 1e-3, np.pi - 1e-5]:
        w = axis * theta
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        R2 = lie.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    xi = jax.random.normal(key, (32, 6))
    norm = jnp.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
    xi = xi.at[:, :3].multiply(jnp.minimum(1.0, 3.0 / norm))
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_inverse_apply():
    key = jax.random.PRNGKey(2)
    xi = jax.random.normal(key, (8, 6))
    T = lie.se3_exp(xi)
    Ti = lie.se3_inverse(T)
    np.testing.assert_allclose(
        np.asarray(T @ Ti), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
    )
    p = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    p2 = lie.se3_apply(Ti, lie.se3_apply(T, p))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-4)


def test_se3_retract_identity():
    T = lie.se3_exp(jnp.ones(6) * 0.1)
    np.testing.assert_allclose(
        np.asarray(lie.se3_retract(T, jnp.zeros(6))), np.asarray(T), atol=1e-7
    )


def test_quat_roundtrip():
    key = jax.random.PRNGKey(4)
    w = rand_w(key, 128, scale=2.5)
    R = lie.so3_exp(w)
    q = lie.quat_from_rot(R)
    R2 = lie.rot_from_quat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)
    # unit norm, canonical sign
    n = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    assert np.all(np.asarray(q)[:, 3] >= -1e-7)


def test_adjoint_property():
    # Adj(T) xi == log(T exp(xi) T^-1)
    key = jax.random.PRNGKey(5)
    T = lie.se3_exp(jax.random.normal(key, (6,)) * 0.5)
    xi = jax.random.normal(jax.random.PRNGKey(6), (6,)) * 0.1
    lhs = lie.se3_adjoint(T) @ xi
    rhs = lie.se3_log(T @ lie.se3_exp(xi) @ lie.se3_inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_interpolate_endpoints():
    key = jax.random.PRNGKey(7)
    T0 = lie.se3_exp(jax.random.normal(key, (6,)) * 0.3)
    T1 = lie.se3_exp(jax.random.normal(jax.random.PRNGKey(8), (6,)) * 0.3)
    np.testing.assert_allclose(
        np.asarray(lie.se3_interpolate(T0, T1, 0.0)), np.asarray(T0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lie.se3_interpolate(T0, T1, 1.0)), np.asarray(T1), atol=1e-4
    )


def test_left_jacobian_numerical():
    # J_l: exp(w + dw) ~ exp(J_l dw) exp(w)
    w = jnp.array([0.3, -0.2, 0.5])
    J = lie.so3_left_jacobian(w)
    eps = 1e-4
    for i in range(3):
        dw = jnp.zeros(3).at[i].set(eps)
        lhs = lie.so3_exp(w + dw)
        rhs = lie.so3_exp(J @ dw) @ lie.so3_exp(w)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)
    Jinv = lie.so3_left_jacobian_inv(w)
    np.testing.assert_allclose(np.asarray(J @ Jinv), np.eye(3), atol=1e-5)
