"""Masked loss/metric registry.

Reference: /root/reference/hamgnn/utils/losses.py and the sparsity-corrected
loss accumulation in models/Model.py:128-179.  All metrics are masked means:
padded rows never contribute, so a padded batch reproduces the reference's
variable-size means exactly.

Every metric takes an optional ``psum`` reduction hook (identity by default).
Under the halo edge partition each shard holds a disjoint row subset; passing
``view.psum`` turns the masked means into exact global means (sum and count
are both psummed, so replicated inputs — e.g. band energies computed
identically on every shard — also come out right: the shard factor cancels).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp


def _identity(x):
    return x


def _masked_mean(x, mask, psum=_identity):
    """Mean of x over rows where mask is 1 (mask broadcasts along features)."""
    w = jnp.broadcast_to(mask, x.shape)
    return psum(jnp.sum(x * w)) / jnp.maximum(psum(jnp.sum(w)), 1.0)


def mae(pred, target, mask, psum=_identity):
    return _masked_mean(jnp.abs(pred - target), mask, psum)


def mse(pred, target, mask, psum=_identity):
    return _masked_mean((pred - target) ** 2, mask, psum)


def rmse(pred, target, mask, psum=_identity):
    return jnp.sqrt(mse(pred, target, mask, psum))


def cosine_similarity(pred, target, mask, psum=_identity):
    dot = jnp.sum(pred * target, axis=-1)
    pn = jnp.linalg.norm(pred, axis=-1)
    tn = jnp.linalg.norm(target, axis=-1)
    per_row = 1.0 - dot / jnp.maximum(pn * tn, 1e-12)
    m = jnp.squeeze(mask, -1) if mask.ndim == per_row.ndim + 1 else mask
    return _masked_mean(per_row, m, psum)


def euclidean(pred, target, mask, psum=_identity):
    d = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1))
    m = jnp.squeeze(mask, -1) if mask.ndim == d.ndim + 1 else mask
    return _masked_mean(d, m, psum)


def sum_zero(pred, target, mask, psum=_identity):
    s = psum(jnp.sum(pred * jnp.broadcast_to(mask, pred.shape), axis=0))
    return jnp.sqrt(jnp.sum(s**2, axis=-1))


METRICS: Dict[str, Callable] = {
    "mae": mae,
    "mse": mse,
    "rmse": rmse,
    "cosine_similarity": cosine_similarity,
    "euclidean_loss": euclidean,
    "sum_zero": sum_zero,
}


def get_metric(name: str) -> Callable:
    return METRICS[name.lower()]
