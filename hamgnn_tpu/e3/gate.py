"""Equivariant nonlinearities: Gate, NormActivation, and scalar activations.

Reimplements the e3nn ``Gate``/``NormActivation`` used by the reference's
``ResidualBlock`` (/root/reference/hamgnn/nn/interaction_blocks.py:264-358)
with the reference's activation registry
(/root/reference/hamgnn/utils/irreps_utils.py:26-31): ssp (shifted softplus),
tanh, abs, silu.

Note on e3nn parity: e3nn wraps scalar activations in ``e3nn.math.normalize2mom``
which rescales the activation so its output has unit second moment under a
standard normal input.  We apply the same correction with constants computed
once host-side by quadrature.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from .irreps import Irreps, irreps2gate


def _ssp_np(x):
    return np.logaddexp(x, 0.0) - math.log(2.0)


@functools.lru_cache(maxsize=None)
def _second_moment(name: str) -> float:
    """E[f(z)^2]^(1/2) for z ~ N(0,1), by Gauss-Hermite quadrature."""
    fns = {
        "ssp": _ssp_np,
        "tanh": np.tanh,
        "abs": np.abs,
        "silu": lambda x: x / (1.0 + np.exp(-x)),
    }
    f = fns[name]
    x, w = np.polynomial.hermite_e.hermegauss(101)
    m2 = float(np.sum(w * f(x) ** 2) / np.sum(w))
    return float(1.0 / np.sqrt(m2))


def shifted_softplus(x):
    return jnp.logaddexp(x, 0.0) - math.log(2.0)


_RAW_ACTS: Dict[str, Callable] = {
    "ssp": shifted_softplus,
    "tanh": jnp.tanh,
    "abs": jnp.abs,
    "silu": lambda x: x * jnp.reciprocal(1.0 + jnp.exp(-x)),
}


def act(name: str, normalized: bool = True) -> Callable:
    f = _RAW_ACTS[name]
    if not normalized:
        return f
    c = _second_moment(name)
    return lambda x: c * f(x)


class Gate(fnn.Module):
    """e3nn-style Gate: scalars pass through activations; non-scalar irreps are
    multiplied by activated gate scalars.

    Input layout: [scalars | gates | gated]; output: [act(scalars) | act(gates)*gated].
    """

    irreps_scalars: Irreps
    irreps_gates: Irreps
    irreps_gated: Irreps
    act_scalars: tuple  # names per scalar chunk
    act_gates: tuple    # names per gate chunk

    @property
    def irreps_in(self) -> Irreps:
        return Irreps(self.irreps_scalars) + Irreps(self.irreps_gates) + Irreps(self.irreps_gated)

    @property
    def irreps_out(self) -> Irreps:
        return (Irreps(self.irreps_scalars) + Irreps(self.irreps_gated)).simplify()

    def __call__(self, x):
        irreps_scalars = Irreps(self.irreps_scalars)
        irreps_gates = Irreps(self.irreps_gates)
        irreps_gated = Irreps(self.irreps_gated)
        ds, dg = irreps_scalars.dim, irreps_gates.dim

        scalars = x[..., :ds]
        gates = x[..., ds : ds + dg]
        gated = x[..., ds + dg :]

        # scalar activations per chunk
        out_s = []
        for sl, name in zip(irreps_scalars.slices(), self.act_scalars):
            out_s.append(act(name)(scalars[..., sl]))
        # gate activations per chunk
        out_g = []
        for sl, name in zip(irreps_gates.slices(), self.act_gates):
            out_g.append(act(name)(gates[..., sl]))

        out = out_s
        if irreps_gated.dim > 0:
            g = jnp.concatenate(out_g, axis=-1) if out_g else gates
            # expand gates over the (2l+1) components via one precomputed gather
            import numpy as _np

            idx = []
            ch = 0
            for mi in irreps_gated:
                for _ in range(mi.mul):
                    idx.extend([ch] * mi.ir.dim)
                    ch += 1
            gate_full = jnp.take(g, jnp.asarray(_np.asarray(idx, _np.int32)), axis=-1)
            out.append(gated * gate_full)
        return jnp.concatenate(out, axis=-1)


class NormActivation(fnn.Module):
    """Norm-based nonlinearity: scale each channel by f(|x_u|)/|x_u|."""

    irreps_in: Irreps
    scalar_nonlinearity: str = "ssp"
    epsilon: float = 1e-8

    def __call__(self, x):
        irreps = Irreps(self.irreps_in)
        f = act(self.scalar_nonlinearity)
        chunks = []
        for sl, mi in zip(irreps.slices(), irreps):
            c = x[..., sl].reshape(x.shape[:-1] + (mi.mul, mi.ir.dim))
            n = jnp.sqrt(jnp.sum(c * c, axis=-1, keepdims=True) + self.epsilon**2)
            c = c * (f(n) / n)
            chunks.append(c.reshape(x.shape[:-1] + (mi.dim,)))
        return jnp.concatenate(chunks, axis=-1)


def make_gate(irreps_mid: Irreps,
              nonlinearity_scalars=("ssp", "tanh"),
              nonlinearity_gates=("ssp", "abs")):
    """Build a Gate for target irreps, mirroring the reference's irreps2gate
    wiring.  Returns (gate_module, irreps_in_required)."""
    irreps_scalars, irreps_gates, irreps_gated = irreps2gate(irreps_mid)
    sc_e, sc_o = nonlinearity_scalars
    g_e, g_o = nonlinearity_gates
    act_scalars = tuple(sc_e if mi.ir.p == 1 else sc_o for mi in irreps_scalars)
    act_gates = tuple(g_e if mi.ir.p == 1 else g_o for mi in irreps_gates)
    gate = Gate(
        irreps_scalars=irreps_scalars,
        irreps_gates=irreps_gates,
        irreps_gated=irreps_gated,
        act_scalars=act_scalars,
        act_gates=act_gates,
    )
    return gate, gate.irreps_in
