"""Quaternion algebra tests; mirrors the role of the reference's
QuaternionTest (/root/reference/src/molecules/tests/)."""

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.quaternion import (
    from_axis_angle,
    qdifferentiate,
    qmul,
    qnormalize,
    qrotate,
    qrotate_inv,
)


def rand_q(n, rng):
    q = rng.normal(size=(n, 4))
    return np.asarray(qnormalize(jnp.asarray(q)))


def test_rotate_roundtrip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rand_q(64, rng))
    v = jnp.asarray(rng.normal(size=(64, 3)))
    w = qrotate(q, v)
    back = qrotate_inv(q, w)
    np.testing.assert_allclose(back, v, atol=1e-12)


def test_rotate_is_orthogonal():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rand_q(32, rng))
    v = jnp.asarray(rng.normal(size=(32, 3)))
    np.testing.assert_allclose(
        np.linalg.norm(qrotate(q, v), axis=-1),
        np.linalg.norm(v, axis=-1),
        rtol=1e-12,
    )


def test_axis_angle_90deg_z():
    q = from_axis_angle(np.pi / 2, jnp.asarray([0.0, 0.0, 1.0]))
    v = jnp.asarray([1.0, 0.0, 0.0])
    np.testing.assert_allclose(qrotate(q, v), [0.0, 1.0, 0.0], atol=1e-12)


def test_qmul_matches_sequential_rotation():
    rng = np.random.default_rng(3)
    qa = jnp.asarray(rand_q(16, rng))
    qb = jnp.asarray(rand_q(16, rng))
    v = jnp.asarray(rng.normal(size=(16, 3)))
    # (qa*qb).rotate(v) == qa.rotate(qb.rotate(v))
    np.testing.assert_allclose(
        qrotate(qmul(qa, qb), v), qrotate(qa, qrotate(qb, v)), atol=1e-12
    )


def test_differentiate_matches_finite_difference():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rand_q(8, rng))
    w_body = jnp.asarray(rng.normal(size=(8, 3)))
    dq = qdifferentiate(q, w_body)
    # finite-difference check: rotating by small angle dt*|w| about the
    # world-frame axis R(q) w_body
    dt = 1e-7
    w_world = qrotate(q, w_body)
    ang = jnp.linalg.norm(w_world, axis=-1)
    axis = w_world / ang[:, None]
    q_next = qmul(from_axis_angle(ang * dt, axis), q)
    fd = (q_next - q) / dt
    np.testing.assert_allclose(dq, fd, atol=1e-5)
