"""Scalar MLPs: e3nn-style FullyConnectedNet and an efficient-KAN equivalent.

FullyConnectedNet semantics (used as radial weight generator throughout the
reference, e.g. /root/reference/hamgnn/nn/message_passing.py:186-193): weights
init N(0,1), forward scales by 1/sqrt(fan_in), hidden activations are
variance-normalized (normalize2mom), no biases, last layer linear.

KANLinear reimplements the vendored efficient-kan B-spline layer
(/root/reference/hamgnn/toolbox/efficient_kan/kan.py:6-285) with a fixed grid
(grid_size=3, range [-1,1] per utils/macro.py) — evaluated as a dense
basis-expansion matmul, which is the MXU-friendly formulation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..e3.gate import act


class FullyConnectedNet(fnn.Module):
    hs: Sequence[int]          # layer widths, e.g. [in, 64, 64, out]
    act_name: str = "silu"
    # static permutation applied as a *view* of the last layer's weight
    # columns: output channel k reads param column out_perm[k].  Used by the
    # packed TP pipeline (e3/packed_tp.py scale_perm) so per-edge radial
    # weights are emitted directly in packed channel order while the stored
    # parameter keeps the reference (chunked) channel order.
    out_perm: Optional[tuple] = None

    @fnn.compact
    def __call__(self, x):
        f = act(self.act_name)
        n = len(self.hs) - 1
        for i in range(n):
            d_in, d_out = self.hs[i], self.hs[i + 1]
            w = self.param(f"w{i}", fnn.initializers.normal(stddev=1.0), (d_in, d_out))
            if i == n - 1 and self.out_perm is not None:
                w = w[:, np.asarray(self.out_perm)]
            x = x @ (w / np.sqrt(d_in)).astype(x.dtype)
            if i < n - 1:
                x = f(x)
        return x


class KANLinear(fnn.Module):
    """B-spline KAN layer on a fixed uniform grid (no grid updates).

    y = base_w . silu(x) + spline_w . B(x) where B are spline_order-degree
    B-spline bases over grid_size intervals on [-1, 1].
    """

    in_features: int
    out_features: int
    grid_size: int = 3
    spline_order: int = 3
    grid_range: tuple = (-1.0, 1.0)
    scale_base: float = 1.0
    scale_spline: float = 1.0
    out_perm: Optional[tuple] = None   # static column-permutation view

    def _grid(self):
        g0, g1 = self.grid_range
        h = (g1 - g0) / self.grid_size
        k = self.spline_order
        return np.arange(-k, self.grid_size + k + 1) * h + g0  # (grid_size + 2k + 1,)

    def b_splines(self, x):
        """x: (..., in) -> (..., in, grid_size + spline_order) basis values."""
        grid = jnp.asarray(self._grid(), x.dtype)
        k = self.spline_order
        xx = x[..., None]
        bases = ((xx >= grid[:-1]) & (xx < grid[1:])).astype(x.dtype)
        for p in range(1, k + 1):
            left = (xx - grid[: -(p + 1)]) / (grid[p:-1] - grid[: -(p + 1)]) * bases[..., :-1]
            right = (grid[p + 1 :] - xx) / (grid[p + 1 :] - grid[1:-p]) * bases[..., 1:]
            bases = left + right
        return bases

    @fnn.compact
    def __call__(self, x):
        n_b = self.grid_size + self.spline_order
        base_w = self.param(
            "base_weight",
            fnn.initializers.variance_scaling(self.scale_base**2 * 1.0 / 3, "fan_in", "uniform"),
            (self.in_features, self.out_features),
        )
        spline_w = self.param(
            "spline_weight",
            fnn.initializers.variance_scaling(self.scale_spline**2 * 1.0 / 3, "fan_in", "uniform"),
            (self.in_features * n_b, self.out_features),
        )
        if self.out_perm is not None:
            perm = np.asarray(self.out_perm)
            base_w = base_w[:, perm]
            spline_w = spline_w[:, perm]
        silu = lambda v: v * jnp.reciprocal(1.0 + jnp.exp(-v))
        base = silu(x) @ base_w
        b = self.b_splines(x).reshape(*x.shape[:-1], self.in_features * n_b)
        return base + b @ spline_w


class KAN(fnn.Module):
    hs: Sequence[int]
    grid_size: int = 3
    grid_range: tuple = (-1.0, 1.0)
    out_perm: Optional[tuple] = None

    @fnn.compact
    def __call__(self, x):
        n = len(self.hs) - 1
        for i in range(n):
            x = KANLinear(
                in_features=self.hs[i],
                out_features=self.hs[i + 1],
                grid_size=self.grid_size,
                grid_range=self.grid_range,
                out_perm=self.out_perm if i == n - 1 else None,
            )(x)
        return x


def make_weight_generator(input_dim: int, hidden: Sequence[int], output_dim: int,
                          use_kan: bool = False, grid_size: int = 3,
                          grid_range: tuple = (-1.0, 1.0), out_perm=None):
    hs = [input_dim, *hidden, output_dim]
    out_perm = tuple(int(i) for i in out_perm) if out_perm is not None else None
    if use_kan:
        return KAN(hs=tuple(hs), grid_size=grid_size, grid_range=grid_range,
                   out_perm=out_perm)
    return FullyConnectedNet(hs=tuple(hs), act_name="silu", out_perm=out_perm)
