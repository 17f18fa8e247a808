"""SE(2) geometry, angle utilities and pose positional encodings.

TPU-native reimplementation of the math in the reference TrafficBots repo:
  - angle casting / SE(2) transforms: /root/reference/src/utils/transform_utils.py:9-226
  - sinusoidal embeddings:            /root/reference/src/utils/pos_emb.py:6-58
  - pose positional encodings:        /root/reference/src/utils/pose_pe.py:7-96

Everything here is a pure function on jnp arrays (fp32 unless stated), safe to
call inside jit / scan / pallas launch wrappers. There are no trainable
parameters in any of these encodings (the reference registers the frequency
tables as non-trainable buffers), so no module framework is needed.
"""
from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp
import numpy as np


def cast_rad(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to the [-pi, pi) range. Ref: transform_utils.py:9-11."""
    return (angle + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


# ---------------------------------------------------------------------------
# Batched SE(2) transforms. All operate on trailing dims and broadcast over
# leading batch dims, mirroring the torch_* helpers in the reference.
# ---------------------------------------------------------------------------

def rad2rot(rad: jnp.ndarray) -> jnp.ndarray:
    """[...] -> [..., 2, 2] rotation matrices. Ref: transform_utils.py:121-131."""
    c = jnp.cos(rad)
    s = jnp.sin(rad)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def sincos2rot(in_sin: jnp.ndarray, in_cos: jnp.ndarray) -> jnp.ndarray:
    """Ref: transform_utils.py:134-143."""
    return jnp.stack(
        [jnp.stack([in_cos, -in_sin], axis=-1), jnp.stack([in_sin, in_cos], axis=-1)],
        axis=-2,
    )


def _rowvec_matmul(v: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """v [..., M, 2] @ rot [..., 2, 2] expanded elementwise.

    2x2 rotations are computed on the VPU instead of the MXU: TPU fp32
    matmuls default to reduced-precision passes, which is unacceptable for
    coordinate transforms (meters-scale inputs would lose ~cm precision).
    """
    r = rot[..., None, :, :]  # [..., 1, 2, 2] broadcast over M
    x = v[..., 0:1] * r[..., 0, 0:1] + v[..., 1:2] * r[..., 1, 0:1]
    y = v[..., 0:1] * r[..., 0, 1:2] + v[..., 1:2] * r[..., 1, 1:2]
    return jnp.concatenate([x, y], axis=-1)


def pos2local(in_pos: jnp.ndarray, local_pos: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Transform positions into a local frame.

    in_pos: [..., M, 2]; local_pos: [..., 1, 2]; local_rot: [..., 2, 2].
    Ref: transform_utils.py:146-157.
    """
    return _rowvec_matmul(in_pos - local_pos, local_rot)


def pos2global(in_pos: jnp.ndarray, local_pos: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pos2local. Ref: transform_utils.py:160-171."""
    return _rowvec_matmul(in_pos, jnp.swapaxes(local_rot, -1, -2)) + local_pos


def dir2local(in_dir: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Ref: transform_utils.py:174-184."""
    return _rowvec_matmul(in_dir, local_rot)


def dir2global(in_dir: jnp.ndarray, local_rot: jnp.ndarray) -> jnp.ndarray:
    """Ref: transform_utils.py:187-197."""
    return _rowvec_matmul(in_dir, jnp.swapaxes(local_rot, -1, -2))


def rad2local(in_rad: jnp.ndarray, local_rad: jnp.ndarray, cast: bool = True) -> jnp.ndarray:
    """in_rad: [..., M], local_rad: [...]. Ref: transform_utils.py:200-213."""
    out = in_rad - local_rad[..., None]
    if cast:
        out = cast_rad(out)
    return out


def rad2global(in_rad: jnp.ndarray, local_rad: jnp.ndarray) -> jnp.ndarray:
    """Ref: transform_utils.py:216-226."""
    return cast_rad(in_rad + local_rad[..., None])


# ---------------------------------------------------------------------------
# Sinusoidal positional embeddings.
# ---------------------------------------------------------------------------

def _pe_freqs(dim: int, theta: float) -> np.ndarray:
    """Frequency table of PositionalEmbedding. Ref: pos_emb.py:6-14.

    freqs = 1/theta^(2i/dim) for i in [0, dim/2), each repeated twice.
    """
    assert dim % 2 == 0
    half = np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim
    freqs = 1.0 / (theta ** half)
    return np.repeat(freqs, 2).astype(np.float32)


def _pe_freqs_rad(dim: int) -> np.ndarray:
    """Integer frequency table of PositionalEmbeddingRad: [1,1,2,2,3,3,...].

    Ref: pos_emb.py:31-44.
    """
    assert dim % 2 == 0
    freqs = np.arange(0, dim // 2, dtype=np.float32) + 1.0
    return np.repeat(freqs, 2).astype(np.float32)


def _apply_pe(x: jnp.ndarray, freqs: np.ndarray) -> jnp.ndarray:
    """x: [...] -> [..., dim]; cat(cos(even), sin(odd)). Ref: pos_emb.py:16-28.

    The freq tables repeat each frequency twice, so the reference's strided
    even/odd slices of x*freqs both equal x*f on the UNREPEATED table f —
    computed directly here because lane-strided slices force a relayout on
    TPU (measured: the map PE was ~18 ms of the batch-64 eval program, half
    of all pre-processing, almost entirely this slice). Bit-identical output.
    """
    half = jnp.asarray(freqs[::2].copy(), dtype=x.dtype)
    enc = x[..., None] * half
    return jnp.concatenate([jnp.cos(enc), jnp.sin(enc)], axis=-1)


def positional_embedding(x: jnp.ndarray, dim: int, theta: float = 10000.0) -> jnp.ndarray:
    return _apply_pe(x, _pe_freqs(dim, theta))


def positional_embedding_rad(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    return _apply_pe(x, _pe_freqs_rad(dim))


# ---------------------------------------------------------------------------
# PosePE: encodes an (xy, dir-or-yaw) pose into a feature vector.
# ---------------------------------------------------------------------------

POSE_PE_MODES = ("xy_dir", "mpa_pl", "pe_xy_unit_dir", "pe_xy_dir", "pe_xy_yaw")


def pose_pe_out_dim(mode: str, pe_dim: int) -> int:
    """Output feature dim for a PosePE mode. Ref: pose_pe.py:8-27."""
    if mode == "xy_dir":
        return 4
    if mode == "mpa_pl":
        return 7
    if mode == "pe_xy_unit_dir":
        return pe_dim + 2
    if mode in ("pe_xy_dir", "pe_xy_yaw"):
        return pe_dim
    raise NotImplementedError(mode)


def _dir_as_unit(direction: jnp.ndarray) -> jnp.ndarray:
    """Accept [..., 1] yaw or [..., 2] cos/sin; return [..., 2]."""
    if direction.shape[-1] == 1:
        return jnp.concatenate([jnp.cos(direction), jnp.sin(direction)], axis=-1)
    return direction


def encode_polyline_mpa(pos: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """MultiPath++-style 7-d polyline feature. Ref: pose_pe.py:65-96."""
    eps = jnp.finfo(pos.dtype).eps
    seg_start = pos
    seg_vec = direction
    seg_proj = jnp.sum(-seg_start * seg_vec, axis=-1) / (
        jnp.sum(seg_vec * seg_vec, axis=-1) + eps
    )
    closest = seg_start + jnp.clip(seg_proj, 0.0, 1.0)[..., None] * seg_vec
    r_norm = jnp.linalg.norm(closest, axis=-1, keepdims=True)
    seg_norm = jnp.linalg.norm(seg_vec, axis=-1, keepdims=True)
    return jnp.concatenate(
        [
            r_norm,
            closest / (r_norm + eps),
            seg_vec / (seg_norm + eps),
            seg_norm,
            jnp.linalg.norm(seg_start + seg_vec - closest, axis=-1, keepdims=True),
        ],
        axis=-1,
    )


def pose_pe(
    xy: jnp.ndarray,
    direction: jnp.ndarray,
    mode: str,
    pe_dim: int = 256,
    theta_xy: float = 1e3,
    theta_cs: float = 1e1,
) -> jnp.ndarray:
    """Pose positional encoding; xy [..., 2], direction [..., 1] yaw or [..., 2].

    Ref: pose_pe.py:29-63. The default configuration uses mode=pe_xy_yaw with
    pe_dim=96 (configs/model/traffic_bots.yaml:20-24).
    """
    if mode == "xy_dir":
        return jnp.concatenate([xy, _dir_as_unit(direction)], axis=-1)
    if mode == "mpa_pl":
        return encode_polyline_mpa(xy, _dir_as_unit(direction))
    if mode == "pe_xy_unit_dir":
        d = _dir_as_unit(direction)
        return jnp.concatenate(
            [
                positional_embedding(xy[..., 0], pe_dim // 2, theta_xy),
                positional_embedding(xy[..., 1], pe_dim // 2, theta_xy),
                d[..., 0:1],
                d[..., 1:2],
            ],
            axis=-1,
        )
    if mode == "pe_xy_dir":
        d = _dir_as_unit(direction)
        return jnp.concatenate(
            [
                positional_embedding(xy[..., 0], pe_dim // 4, theta_xy),
                positional_embedding(xy[..., 1], pe_dim // 4, theta_xy),
                positional_embedding(d[..., 0], pe_dim // 4, theta_cs),
                positional_embedding(d[..., 1], pe_dim // 4, theta_cs),
            ],
            axis=-1,
        )
    if mode == "pe_xy_yaw":
        if direction.shape[-1] == 1:
            yaw = direction[..., 0]
        else:
            yaw = jnp.arctan2(direction[..., 1], direction[..., 0])
        if pe_dim % 8 == 0:
            return _pe_xy_yaw_packed(xy, yaw, pe_dim, theta_xy)
        return jnp.concatenate(
            [
                positional_embedding(xy[..., 0], pe_dim // 4, theta_xy),
                positional_embedding(xy[..., 1], pe_dim // 4, theta_xy),
                positional_embedding_rad(yaw, pe_dim // 2),
            ],
            axis=-1,
        )
    raise NotImplementedError(mode)


def _pe_xy_yaw_packed(
    xy: jnp.ndarray, yaw: jnp.ndarray, pe_dim: int, theta_xy: float
) -> jnp.ndarray:
    """pe_xy_yaw as ONE elementwise expression over the full [..., pe_dim].

    Bit-identical to concat(PE(x), PE(y), PE_rad(yaw)): each output channel is
    cos/sin of exactly the same `coord * freq` product; only the concat of six
    narrow pieces is replaced by per-channel constant tables. The narrow
    pieces were a memory disaster on TPU: each [..., n_node, 12|24] trig temp
    tile-pads its trailing dims 6.4-12.8x (minor dim 12|24 -> 128 lanes), and
    the map PE materialized SIX of them at ~3 GB apiece for batch 256
    (measured: the whole-program OOM at BENCH_N_SCENE=256 was dominated by
    these, 18 GB of padded temps for 1.9 GB of payload). Here XLA emits one
    fused kLoop producing [..., pe_dim] directly (1.33x padding at pe_dim=96),
    which also feeds the downstream feature concat as a single operand.

    Tables: channel c has arg = x*FX[c] + y*FY[c] + yaw*FR[c] where exactly
    one table is nonzero per channel, and out = where(IS_COS[c], cos, sin).
    Adding the two zero terms is exact in fp32 (x + 0.0 == x), so the args
    match the unpacked path bit-for-bit.
    """
    fx = _pe_freqs(pe_dim // 4, theta_xy)[::2]  # [pe_dim//8]
    fr = _pe_freqs_rad(pe_dim // 2)[::2]  # [pe_dim//4]
    zx = np.zeros_like(fx)
    zr = np.zeros_like(fr)
    ox = np.ones_like(fx)
    or_ = np.ones_like(fr)
    freq_x = np.concatenate([fx, fx, zx, zx, zr, zr])
    freq_y = np.concatenate([zx, zx, fx, fx, zr, zr])
    freq_r = np.concatenate([zx, zx, zx, zx, fr, fr])
    is_cos = np.concatenate([ox, zx, ox, zx, or_, zr]).astype(bool)
    dt = xy.dtype
    arg = (
        xy[..., 0:1] * jnp.asarray(freq_x, dt)
        + xy[..., 1:2] * jnp.asarray(freq_y, dt)
        + yaw[..., None].astype(dt) * jnp.asarray(freq_r, dt)
    )
    return jnp.where(jnp.asarray(is_cos), jnp.cos(arg), jnp.sin(arg))
