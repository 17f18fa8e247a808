"""Distributions as immutable pytrees with pure sample/log_prob functions.

TPU-native redesign of /root/reference/src/models/modules/distributions.py.
The reference wraps torch.distributions in mutable `MyDist` objects with an
in-place `repeat_interleave_` used to expand K=6 joint futures; here every
distribution is a `flax.struct` pytree, sampling threads explicit PRNG keys,
and K-future expansion is a pure `repeat` returning a new pytree. Sampling
supports per-agent mixed deterministic/stochastic masks exactly like
distributions.py:19-37 (the K=0 future is deterministic, K=1..5 stochastic).
"""
from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = math.log(2.0 * math.pi)

DetType = Union[bool, jnp.ndarray]


def _mix_det(det: jnp.ndarray, rnd: jnp.ndarray, deterministic: DetType) -> jnp.ndarray:
    """Select deterministic vs stochastic sample, per-row if mask given."""
    if isinstance(deterministic, bool):
        return det if deterministic else rnd
    mask = deterministic
    while mask.ndim < det.ndim:
        mask = mask[..., None]
    return jnp.where(mask, det, rnd)


@struct.dataclass
class DiagGaussian:
    """Independent Normal over the last dim. Ref: distributions.py:40-59."""

    mean: jnp.ndarray  # [..., d]
    log_std: jnp.ndarray  # broadcastable to mean
    valid: Optional[jnp.ndarray] = None  # [...]

    @property
    def stddev(self) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.exp(self.log_std), self.mean.shape)

    def sample(self, key: jax.Array, deterministic: DetType = True) -> jnp.ndarray:
        det = self.mean
        eps = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        rnd = self.mean + self.stddev * eps
        return _mix_det(det, rnd, deterministic)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        std = self.stddev
        z = (x - self.mean) / std
        lp = -0.5 * (z * z) - jnp.log(std) - 0.5 * _LOG_2PI
        return jnp.sum(lp, axis=-1)

    def repeat(self, n: int, axis: int = 0) -> "DiagGaussian":
        """Pure equivalent of repeat_interleave_. Ref: distributions.py:53-59."""
        log_std = jnp.broadcast_to(self.log_std, self.mean.shape)
        return DiagGaussian(
            mean=jnp.repeat(self.mean, n, axis=axis),
            log_std=jnp.repeat(log_std, n, axis=axis),
            valid=None if self.valid is None else jnp.repeat(self.valid, n, axis=axis),
        )


@struct.dataclass
class Gaussian:
    """Full-covariance multivariate Normal (cholesky parametrization).

    Parity item for ref distributions.py:62-81 (MultivariateNormal wrapper);
    not used by any default config but part of the distribution inventory.
    `tril` is the lower-triangular cholesky factor of the covariance.
    """

    mean: jnp.ndarray  # [..., d]
    tril: jnp.ndarray  # [..., d, d]
    valid: Optional[jnp.ndarray] = None

    def sample(self, key: jax.Array, deterministic: DetType = True) -> jnp.ndarray:
        det = self.mean
        eps = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        rnd = self.mean + jnp.einsum("...ij,...j->...i", self.tril, eps)
        return _mix_det(det, rnd, deterministic)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.mean.shape[-1]
        diff = x - self.mean
        # solve L z = diff  (forward substitution via triangular solve)
        z = jax.scipy.linalg.solve_triangular(
            self.tril, diff[..., None], lower=True
        )[..., 0]
        log_det = jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(self.tril, axis1=-2, axis2=-1))), axis=-1
        )
        return -0.5 * jnp.sum(z * z, axis=-1) - log_det - 0.5 * d * _LOG_2PI

    def repeat(self, n: int, axis: int = 0) -> "Gaussian":
        return Gaussian(
            mean=jnp.repeat(self.mean, n, axis=axis),
            tril=jnp.repeat(self.tril, n, axis=axis),
            valid=None if self.valid is None else jnp.repeat(self.valid, n, axis=axis),
        )


def kl_diag_gaussian(p: DiagGaussian, q: DiagGaussian) -> jnp.ndarray:
    """KL(p || q) summed over the event dim (Independent(Normal, 1))."""
    p_std = p.stddev
    q_std = q.stddev
    var_ratio = (p_std / q_std) ** 2
    t1 = ((p.mean - q.mean) / q_std) ** 2
    return 0.5 * jnp.sum(var_ratio + t1 - 1.0 - jnp.log(var_ratio), axis=-1)


@struct.dataclass
class DummyLatent:
    """Zero latent for the SimNet ablation. Ref: distributions.py:84-99."""

    zeros: jnp.ndarray  # [..., d]
    valid: Optional[jnp.ndarray] = None

    def sample(self, key: jax.Array, deterministic: DetType = True) -> jnp.ndarray:
        return jnp.zeros_like(self.zeros)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros_like(self.zeros[..., 0])

    def repeat(self, n: int, axis: int = 0) -> "DummyLatent":
        return DummyLatent(
            zeros=jnp.repeat(self.zeros, n, axis=axis),
            valid=None if self.valid is None else jnp.repeat(self.valid, n, axis=axis),
        )


@struct.dataclass
class MultiCategorical:
    """n_cat independent straight-through one-hot categoricals.

    Ref: distributions.py:102-155. Samples are flattened one-hots
    [..., n_cat*n_class] with straight-through gradients (probs +
    stop_grad(onehot - probs)), matching OneHotCategoricalStraightThrough.
    """

    probs: jnp.ndarray  # [..., n_cat, n_class]
    valid: Optional[jnp.ndarray] = None

    @property
    def n_cat(self) -> int:
        return self.probs.shape[-2]

    @property
    def n_class(self) -> int:
        return self.probs.shape[-1]

    def _st(self, one_hot: jnp.ndarray) -> jnp.ndarray:
        return self.probs + jax.lax.stop_gradient(one_hot - self.probs)

    def sample(self, key: jax.Array, deterministic: DetType = True) -> jnp.ndarray:
        det_idx = jnp.argmax(self.probs, axis=-1)
        det = jax.nn.one_hot(det_idx, self.n_class, dtype=self.probs.dtype)
        logits = jnp.log(jnp.maximum(self.probs, jnp.finfo(self.probs.dtype).tiny))
        rnd_idx = jax.random.categorical(key, logits, axis=-1)
        rnd = self._st(jax.nn.one_hot(rnd_idx, self.n_class, dtype=self.probs.dtype))
        out = _mix_det(det, rnd, deterministic)
        return out.reshape(*out.shape[:-2], self.n_cat * self.n_class)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        one_hot = x.reshape(*x.shape[:-1], self.n_cat, self.n_class)
        logp = jnp.log(jnp.maximum(self.probs, jnp.finfo(self.probs.dtype).tiny))
        return jnp.sum(one_hot * logp, axis=(-2, -1))

    def repeat(self, n: int, axis: int = 0) -> "MultiCategorical":
        return MultiCategorical(
            probs=jnp.repeat(self.probs, n, axis=axis),
            valid=None if self.valid is None else jnp.repeat(self.valid, n, axis=axis),
        )


def kl_multi_categorical(p: MultiCategorical, q: MultiCategorical) -> jnp.ndarray:
    tiny = jnp.finfo(p.probs.dtype).tiny
    kl = p.probs * (jnp.log(jnp.maximum(p.probs, tiny)) - jnp.log(jnp.maximum(q.probs, tiny)))
    return jnp.sum(kl, axis=(-2, -1))


@struct.dataclass
class DestCategorical:
    """Categorical over map polyline indices. Ref: distributions.py:158-201."""

    logits: jnp.ndarray  # [..., n_pl], normalized log-probs
    valid: Optional[jnp.ndarray] = None

    @classmethod
    def from_logits(cls, logits: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "DestCategorical":
        return cls(logits=jax.nn.log_softmax(logits, axis=-1), valid=valid)

    @classmethod
    def from_probs(cls, probs: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "DestCategorical":
        tiny = jnp.finfo(probs.dtype).tiny
        return cls(logits=jnp.log(jnp.maximum(probs, tiny)), valid=valid)

    @property
    def probs(self) -> jnp.ndarray:
        return jnp.exp(self.logits)

    def sample(self, key: jax.Array, deterministic: DetType = True) -> jnp.ndarray:
        det = jnp.argmax(self.logits, axis=-1)
        rnd = jax.random.categorical(key, self.logits, axis=-1)
        if isinstance(deterministic, bool):
            return det if deterministic else rnd
        return jnp.where(deterministic, det, rnd)

    def log_prob(self, idx: jnp.ndarray) -> jnp.ndarray:
        return jnp.take_along_axis(self.logits, idx[..., None], axis=-1)[..., 0]

    def repeat(self, n: int, axis: int = 0) -> "DestCategorical":
        return DestCategorical(
            logits=jnp.repeat(self.logits, n, axis=axis),
            valid=None if self.valid is None else jnp.repeat(self.valid, n, axis=axis),
        )
