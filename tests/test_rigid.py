"""Property tests for the SE(3) rigid-transform core."""
import jax.numpy as jnp
import numpy as np

from mdgen_tpu.geometry import (
    Rigid,
    canonicalize_quat_sign,
    get_offsets,
    invert_quat,
    quat_multiply,
    quat_to_rotmat,
    rotmat_to_quat,
)


def random_quats(rng, shape):
    q = rng.normal(size=(*shape, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotmat_roundtrip(rng):
    q = random_quats(rng, (64,))
    r = quat_to_rotmat(jnp.asarray(q))
    q2 = rotmat_to_quat(r)
    # q and -q encode the same rotation
    dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rotmat_orthonormal(rng):
    q = random_quats(rng, (32,))
    r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(
        r @ np.swapaxes(r, -1, -2), np.broadcast_to(np.eye(3), r.shape), atol=1e-6
    )
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)


def test_quat_multiply_matches_rotmat_product(rng):
    q1, q2 = random_quats(rng, (16,)), random_quats(rng, (16,))
    lhs = quat_to_rotmat(quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    rhs = quat_to_rotmat(jnp.asarray(q1)) @ quat_to_rotmat(jnp.asarray(q2))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_invert_quat(rng):
    q = random_quats(rng, (16,))
    prod = quat_multiply(jnp.asarray(q), invert_quat(jnp.asarray(q)))
    expect = np.zeros((16, 4))
    expect[:, 0] = 1.0
    np.testing.assert_allclose(np.asarray(prod), expect, atol=1e-5)


def random_rigid(rng, shape):
    q = random_quats(rng, shape)
    t = rng.normal(size=(*shape, 3)) * 5.0
    return Rigid(quat_to_rotmat(jnp.asarray(q)), jnp.asarray(t))


def test_compose_invert_identity(rng):
    r = random_rigid(rng, (8, 4))
    ident = r.compose(r.invert())
    np.testing.assert_allclose(
        np.asarray(ident.rots), np.broadcast_to(np.eye(3), (8, 4, 3, 3)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ident.trans), 0.0, atol=1e-5)


def test_apply_invert_apply_roundtrip(rng):
    r = random_rigid(rng, (8,))
    pts = jnp.asarray(rng.normal(size=(8, 3)))
    np.testing.assert_allclose(
        np.asarray(r.invert_apply(r.apply(pts))), np.asarray(pts), atol=1e-5
    )


def test_compose_is_associative_application(rng):
    a = random_rigid(rng, (8,))
    b = random_rigid(rng, (8,))
    pts = jnp.asarray(rng.normal(size=(8, 3)))
    lhs = a.compose(b).apply(pts)
    rhs = a.apply(b.apply(pts))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_from_3_points_orthonormal(rng):
    p0 = jnp.asarray(rng.normal(size=(32, 3)))
    p1 = jnp.asarray(rng.normal(size=(32, 3)))
    p2 = jnp.asarray(rng.normal(size=(32, 3)))
    r = Rigid.from_3_points(p0, p1, p2)
    rots = np.asarray(r.rots)
    np.testing.assert_allclose(
        rots @ np.swapaxes(rots, -1, -2),
        np.broadcast_to(np.eye(3), rots.shape),
        atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(r.trans), np.asarray(p1))
    # e0 column points from p0 to p1
    e0 = np.asarray(p1 - p0)
    e0 = e0 / np.linalg.norm(e0, axis=-1, keepdims=True)
    np.testing.assert_allclose(rots[..., :, 0], e0, atol=1e-4)


def test_tensor7_roundtrip(rng):
    r = random_rigid(rng, (16,))
    t7 = r.to_tensor_7()
    r2 = Rigid.from_tensor_7(t7, normalize_quats=True)
    np.testing.assert_allclose(np.asarray(r2.rots), np.asarray(r.rots), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2.trans), np.asarray(r.trans), atol=1e-5)


def test_tensor_4x4_roundtrip(rng):
    r = random_rigid(rng, (16,))
    r2 = Rigid.from_tensor_4x4(r.to_tensor_4x4())
    np.testing.assert_allclose(np.asarray(r2.rots), np.asarray(r.rots), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2.trans), np.asarray(r.trans), atol=1e-6)


def test_canonicalize_quat_sign(rng):
    t7 = jnp.asarray(rng.normal(size=(32, 7)))
    out = np.asarray(canonicalize_quat_sign(t7))
    assert (out[:, 0] >= 0).all()
    np.testing.assert_allclose(out[:, 4:], np.asarray(t7)[:, 4:])


def test_get_offsets_relative_to_frame0(rng):
    rigids = random_rigid(rng, (2, 5, 3))  # B, T, L
    off = get_offsets(rigids[:, 0:1], rigids)
    assert off.shape == (2, 5, 3, 7)
    # offset at t=0 must be the identity transform
    ident = np.asarray(off)[:, 0]
    np.testing.assert_allclose(np.abs(ident[..., 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(ident[..., 1:], 0.0, atol=1e-4)
