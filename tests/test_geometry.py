"""Golden tests for SE(2) geometry and positional encodings.

Expected values are computed with independent numpy implementations of the
formulas cited from the reference (SURVEY.md section 4, golden-value parity).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from trafficbots_tpu import geometry as G


def test_cast_rad():
    x = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3.5 * np.pi, 0.5], dtype=np.float32)
    out = np.asarray(G.cast_rad(jnp.asarray(x)))
    expected = (x + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(out, expected, rtol=0, atol=0)
    assert (out >= -np.pi).all() and (out < np.pi).all()


def test_rad2rot_known_values():
    rot = np.asarray(G.rad2rot(jnp.asarray(np.float32(np.pi / 2))))
    np.testing.assert_allclose(rot, np.array([[0, -1], [1, 0]], dtype=np.float32), atol=1e-6)
    # batched orthogonality
    rads = jnp.asarray(np.random.RandomState(0).uniform(-3, 3, size=(4, 5)).astype(np.float32))
    R = np.asarray(G.rad2rot(rads))
    eye = np.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(2), eye.shape), atol=1e-6)


def test_pos_local_global_roundtrip():
    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.uniform(-100, 100, size=(3, 7, 2)).astype(np.float32))
    center = jnp.asarray(rng.uniform(-50, 50, size=(3, 1, 2)).astype(np.float32))
    rot = G.rad2rot(jnp.asarray(rng.uniform(-3, 3, size=(3,)).astype(np.float32)))
    local = G.pos2local(pos, center, rot)
    back = G.pos2global(local, center, rot)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pos), atol=1e-4)


def test_dir_local_global_roundtrip():
    rng = np.random.RandomState(2)
    d = jnp.asarray(rng.uniform(-1, 1, size=(3, 7, 2)).astype(np.float32))
    rot = G.rad2rot(jnp.asarray(rng.uniform(-3, 3, size=(3,)).astype(np.float32)))
    np.testing.assert_allclose(
        np.asarray(G.dir2global(G.dir2local(d, rot), rot)), np.asarray(d), atol=1e-5
    )


def test_rad_local_global():
    rng = np.random.RandomState(3)
    r = jnp.asarray(rng.uniform(-3, 3, size=(3, 7)).astype(np.float32))
    local = jnp.asarray(rng.uniform(-3, 3, size=(3,)).astype(np.float32))
    out = G.rad2global(G.rad2local(r, local), local)
    # equal as angles mod 2pi
    diff = np.asarray(G.cast_rad(out - r))
    np.testing.assert_allclose(diff, np.zeros_like(diff), atol=1e-5)


def test_positional_embedding_golden():
    """Golden: freqs = 1/theta^(2i/dim) repeated twice; cat(cos(even), sin(odd))."""
    dim, theta = 8, 1e3
    x = np.array([0.0, 1.0, -2.5], dtype=np.float32)
    half = np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim
    freqs = np.repeat(1.0 / theta ** half, 2)
    enc = x[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(enc[:, ::2]), np.sin(enc[:, 1::2])], axis=-1)
    out = np.asarray(G.positional_embedding(jnp.asarray(x), dim, theta))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_positional_embedding_rad_golden():
    """Golden: integer freqs [1,1,2,2,...]; dim=2 reduces to [cos, sin]."""
    x = np.array([0.3, -1.2], dtype=np.float32)
    out = np.asarray(G.positional_embedding_rad(jnp.asarray(x), 2))
    np.testing.assert_allclose(out, np.stack([np.cos(x), np.sin(x)], -1), atol=1e-6)
    out4 = np.asarray(G.positional_embedding_rad(jnp.asarray(x), 4))
    expected = np.stack([np.cos(x), np.cos(2 * x), np.sin(x), np.sin(2 * x)], -1)
    np.testing.assert_allclose(out4, expected, atol=1e-6)


@pytest.mark.parametrize(
    "mode,pe_dim,expected",
    [("xy_dir", 96, 4), ("mpa_pl", 96, 7), ("pe_xy_unit_dir", 96, 98), ("pe_xy_dir", 96, 96), ("pe_xy_yaw", 96, 96)],
)
def test_pose_pe_out_dims(mode, pe_dim, expected):
    assert G.pose_pe_out_dim(mode, pe_dim) == expected
    rng = np.random.RandomState(4)
    xy = jnp.asarray(rng.uniform(-10, 10, size=(2, 3, 2)).astype(np.float32))
    yaw = jnp.asarray(rng.uniform(-3, 3, size=(2, 3, 1)).astype(np.float32))
    out = G.pose_pe(xy, yaw, mode, pe_dim)
    assert out.shape == (2, 3, expected)
    # dir given as cos/sin must also work
    d = jnp.concatenate([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
    out2 = G.pose_pe(xy, d, mode, pe_dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_mpa_polyline_feature():
    """A point on the segment start: closest point is the start itself."""
    pos = jnp.asarray(np.array([[3.0, 4.0]], dtype=np.float32))
    direction = jnp.asarray(np.array([[1.0, 0.0]], dtype=np.float32))
    out = np.asarray(G.encode_polyline_mpa(pos, direction))[0]
    # segment from (3,4) towards +x; origin projects to t=-3 -> clamped 0
    assert out.shape == (7,)
    np.testing.assert_allclose(out[0], 5.0, atol=1e-5)  # |closest| = |(3,4)| = 5
    np.testing.assert_allclose(out[1:3], [3 / 5, 4 / 5], atol=1e-4)
    np.testing.assert_allclose(out[3:5], [1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(out[5], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[6], 1.0, atol=1e-5)  # |start+vec-closest| = |(1,0)|
