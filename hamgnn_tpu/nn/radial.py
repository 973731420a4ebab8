"""Radial basis functions and cutoff envelopes (JAX/flax).

Re-implements the reference's radial toolbox:
  * BesselBasis (trainable n*pi freqs)      — toolbox/nequip/nn/radial_basis.py:46-93
  * GaussianSmearing                        — utils/basis_functions.py:211-224
  * (Exp-)Gaussian / (Exp-)Bernstein bases  — utils/basis_functions.py:16-130
  * CosineCutoff / polynomial envelope /
    smooth bump cutoff_function             — utils/cutoff_functions.py
  * SoftUnitStepCutoff                      — utils/activation.py:57-93
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn


def smooth_cutoff(x, cutoff: float):
    """C-inf bump: exp(-x^2/((c-x)(c+x))) inside, 0 outside."""
    x_ = jnp.where(x < cutoff, x, 0.0)
    val = jnp.exp(-(x_**2) / ((cutoff - x_) * (cutoff + x_)))
    return jnp.where(x < cutoff, val, 0.0)


def cosine_cutoff(r, cutoff: float):
    return 0.5 * (jnp.cos(r * math.pi / cutoff) + 1.0) * (r < cutoff)


def polynomial_envelope(x, cutoff: float, p: int = 6):
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    xs = x / cutoff
    xp = xs**p
    return (1.0 + a * xp + b * xp * xs + c * xp * xs * xs) * (xs < 1.0)


def softplus_inverse(x: float) -> float:
    return float(x + np.log(-np.expm1(-x)))


class CosineCutoff(fnn.Module):
    cutoff: float

    def __call__(self, r):
        return cosine_cutoff(r, self.cutoff)


class SoftUnitStepCutoff(fnn.Module):
    """soft_unit_step(k * (1 - r/c)) with trainable sharpness k (init 10)."""

    cutoff: float

    @fnn.compact
    def __call__(self, r):
        k = self.param("cut_param", fnn.initializers.constant(10.0), ())
        x = k * (1.0 - r / self.cutoff)
        # e3nn soft_unit_step: x -> exp(-1/x) for x > 0 else 0
        safe = jnp.where(x > 0, x, 1.0)
        return jnp.where(x > 0, jnp.exp(-1.0 / safe), 0.0)


class BesselBasis(fnn.Module):
    cutoff: float
    num_basis: int = 8
    trainable: bool = True

    @fnn.compact
    def __call__(self, r):
        init = np.linspace(1.0, self.num_basis, self.num_basis) * math.pi
        if self.trainable:
            freqs = self.param("bessel_weights", lambda _: jnp.asarray(init, jnp.float32))
        else:
            freqs = jnp.asarray(init, jnp.float32)
        r = r[..., None]
        prefactor = 2.0 / self.cutoff
        return prefactor * jnp.sin(freqs * r / self.cutoff) / r


class GaussianSmearing(fnn.Module):
    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    def __call__(self, r):
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / float((self.stop - self.start) / (self.num_gaussians - 1)) ** 2
        d = r[..., None] - offset
        return jnp.exp(coeff * d * d)


def _log_binomial(n: int) -> np.ndarray:
    logf = np.zeros(n)
    for i in range(2, n):
        logf[i] = logf[i - 1] + np.log(i)
    v = np.arange(n)
    return logf[-1] - logf[v] - logf[n - 1 - v]


class BernsteinRadialBasis(fnn.Module):
    num_basis: int
    cutoff: float

    def __call__(self, r):
        logc = jnp.asarray(_log_binomial(self.num_basis), jnp.float32)
        v = jnp.arange(self.num_basis, dtype=jnp.float32)
        n = (self.num_basis - 1) - v
        x = jnp.log(jnp.maximum(r[..., None] / self.cutoff, 1e-12))
        x = logc + n * x + v * jnp.log(-jnp.expm1(jnp.minimum(x, -1e-7)))
        return smooth_cutoff(r, self.cutoff)[..., None] * jnp.exp(x)


class ExponentialBernsteinRadialBasis(fnn.Module):
    num_basis: int
    cutoff: float
    ini_alpha: float = 0.5

    @fnn.compact
    def __call__(self, r):
        alpha0 = softplus_inverse(self.ini_alpha)
        raw = self.param("_alpha", fnn.initializers.constant(alpha0), ())
        alpha = jnp.logaddexp(raw, 0.0)  # softplus
        logc = jnp.asarray(_log_binomial(self.num_basis), jnp.float32)
        v = jnp.arange(self.num_basis, dtype=jnp.float32)
        n = (self.num_basis - 1) - v
        x = -alpha * r[..., None]
        x = logc + n * x + v * jnp.log(-jnp.expm1(jnp.minimum(x, -1e-7)))
        return smooth_cutoff(r, self.cutoff)[..., None] * jnp.exp(x)


class ExponentialGaussianRadialBasis(fnn.Module):
    num_basis: int
    cutoff: float
    ini_alpha: float = 0.5

    @fnn.compact
    def __call__(self, r):
        alpha0 = softplus_inverse(self.ini_alpha)
        raw = self.param("_alpha", fnn.initializers.constant(alpha0), ())
        alpha = jnp.logaddexp(raw, 0.0)
        center = jnp.linspace(1.0, 0.0, self.num_basis)
        width = float(self.num_basis)
        d = jnp.exp(-alpha * r[..., None]) - center
        return smooth_cutoff(r, self.cutoff)[..., None] * jnp.exp(-width * d * d)


class GaussianRadialBasis(fnn.Module):
    num_basis: int
    cutoff: float

    def __call__(self, r):
        center = jnp.linspace(0.0, self.cutoff, self.num_basis)
        width = self.num_basis / self.cutoff
        d = r[..., None] - center
        return smooth_cutoff(r, self.cutoff)[..., None] * jnp.exp(-width * d * d)


RBF_REGISTRY = {
    "bessel": lambda num, cutoff, **kw: BesselBasis(cutoff=cutoff, num_basis=num, **kw),
    "gaussian": lambda num, cutoff, **kw: GaussianSmearing(start=0.0, stop=cutoff, num_gaussians=num, **kw),
    "exp-gaussian": lambda num, cutoff, **kw: ExponentialGaussianRadialBasis(num_basis=num, cutoff=cutoff, **kw),
    "exp-bernstein": lambda num, cutoff, **kw: ExponentialBernsteinRadialBasis(num_basis=num, cutoff=cutoff, **kw),
    "bernstein": lambda num, cutoff, **kw: BernsteinRadialBasis(num_basis=num, cutoff=cutoff, **kw),
}
