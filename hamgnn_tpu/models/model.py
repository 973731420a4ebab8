"""Combined model: representation network + output head + loss computation.

Equivalent of the reference's LightningModule wrapper
(/root/reference/hamgnn/models/Model.py:23-567) minus the framework glue: a
flax module for the forward pass plus a pure ``compute_losses`` used by the
jitted train/eval steps.  Predictions are exposed both as padded per-row arrays
and under the reference's names ("hamiltonian", "band_energy", ...) where the
row sets coincide (losses are masked means, so layout differences don't matter).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as fnn

from ..data.graph import Graph
from ..train.losses import get_metric
from .output import HamGNNPlusPlusOut
from .representation import HamGNNConvE3


class HamGNNModel(fnn.Module):
    representation: HamGNNConvE3
    output: HamGNNPlusPlusOut

    def __call__(self, graph: Graph, k_vecs=None) -> Dict[str, jnp.ndarray]:
        feats = self.representation(graph)
        return self.output(graph, feats, k_vecs=k_vecs)

    def forward_view(self, view, k_vecs=None) -> Dict[str, jnp.ndarray]:
        """Forward over a GraphView (models/view.py): the halo edge partition
        calls this shard-local with all_to_all hooks injected; identical
        parameters and math to ``__call__`` (which uses the dense view)."""
        feats = self.representation.forward_view(view)
        if not hasattr(self.output, "forward_view"):
            raise NotImplementedError(
                f"{type(self.output).__name__} has no GraphView forward")
        return self.output.forward_view(view, feats, k_vecs=k_vecs)


def _stack_pred_target(name: str, preds: Dict, graph: Graph):
    """Map a reference loss name to (pred rows, target rows, row mask)."""
    nm = name.lower()
    if nm == "hamiltonian":
        pred = jnp.concatenate([preds["hamiltonian_on"], preds["hamiltonian_off"]], 0)
        target = jnp.concatenate([graph.Hon, graph.Hoff], 0)
        mask = jnp.concatenate([graph.node_mask, graph.edge_mask], 0)[:, None]
        # collinear-spin stacks carry an extra spin-channel dim: flatten rows
        pred = pred.reshape(pred.shape[0], -1)
        target = target.reshape(target.shape[0], -1)
        return pred, target, mask
    if nm == "overlap":
        pred = jnp.concatenate([preds["overlap_on"], preds["overlap_off"]], 0)
        target = jnp.concatenate([graph.Son, graph.Soff], 0)
        mask = jnp.concatenate([graph.node_mask, graph.edge_mask], 0)[:, None]
        return pred, target, mask
    if nm == "band_energy":
        pred = preds["band_energy"]
        target = preds["band_energy_ref"]
        if "band_mask" in preds:
            # per-species band_num_control: only bands below the per-crystal
            # count are physical (reference hamgnn_output.py:1939-1942)
            mask = jnp.broadcast_to(preds["band_mask"], pred.shape)
        else:
            mask = jnp.ones(pred.shape[:1] + (1,) * (pred.ndim - 1), pred.dtype)
        return pred, target, mask
    if nm == "band_gap":
        pred = preds["band_gap"]
        target = preds["band_gap_ref"]
        return pred, target, jnp.ones_like(pred)
    if nm == "hamiltonian_real":
        pred = jnp.concatenate([preds["hamiltonian_real_on"], preds["hamiltonian_real_off"]], 0)
        target = jnp.concatenate([graph.Hon, graph.Hoff], 0)
        mask = jnp.concatenate([graph.node_mask, graph.edge_mask], 0)[:, None]
        return pred, target, mask
    if nm == "hamiltonian_imag":
        pred = jnp.concatenate([preds["hamiltonian_imag_on"], preds["hamiltonian_imag_off"]], 0)
        target = jnp.concatenate([graph.iHon, graph.iHoff], 0)
        mask = jnp.concatenate([graph.node_mask, graph.edge_mask], 0)[:, None]
        return pred, target, mask
    # Generic result-dict keys (the reference's loss loop iterates arbitrary
    # keys: predictions[prediction] vs batch[target], Model.py:128-179) —
    # covers H_sym, wavefunction, HK/SK/dSK and any future exports.  The
    # target comes from the packed graph data when it carries a field of that
    # name, else from the result dict itself (band-style "<name>_ref").
    by_lower = {k.lower(): k for k in preds}
    if nm in by_lower:
        key = by_lower[nm]
        pred = preds[key]
        target = getattr(graph, name, None)
        if target is None:
            target = getattr(graph, key, None)
        if target is None:
            target = preds.get(key + "_ref")
        if target is None:
            raise KeyError(
                f"loss target '{name}': no '{nm}' field in the graph data and "
                f"no '{nm}_ref' prediction; available predictions: "
                f"{sorted(preds)}")
        pred = pred.reshape(pred.shape[0], -1)
        target = target.reshape(target.shape[0], -1)
        mask = jnp.ones((pred.shape[0], 1), jnp.float32)
        return pred, target, mask
    raise KeyError(
        f"unknown loss target {name} (available predictions: {sorted(preds)})")


def compute_losses(
    preds: Dict[str, jnp.ndarray],
    graph: Graph,
    losses: Sequence[Dict[str, Any]],
    psum=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted total loss + per-component logs.

    ``losses``: list of {"metric": str, "prediction": str, "target": str,
    "loss_weight": float} — the reference's YAML loss spec.  Hamiltonian-family
    components are scaled by the sparsity ratio (Model.py:159-162).

    ``graph`` may be a padded Graph or a GraphView (halo partition): both
    expose the target/mask fields.  Pass ``psum=view.psum`` under the
    partition so masked means are global.
    """
    kw = {} if psum is None else {"psum": psum}
    total = jnp.asarray(0.0, jnp.float32)
    logs = {}
    for spec in losses:
        fn = get_metric(spec["metric"])
        pname = spec["prediction"].lower()
        if "target" in spec and spec["target"] is not None:
            pred, target, mask = _stack_pred_target(pname, preds, graph)
        else:
            # target-less spec (reference Model.py:161-162: loss_fn(pred)
            # alone, e.g. a sum_zero regularizer on one prediction)
            pred = preds[pname]
            pred = pred.reshape(pred.shape[0], -1)
            target = jnp.zeros_like(pred)
            mask = jnp.ones((pred.shape[0], 1), jnp.float32)
        value = fn(pred, target, mask, **kw)
        if pname in ("hamiltonian", "hamiltonian_real", "hamiltonian_imag") and \
                "sparsity_ratio" in preds:
            value = value * preds["sparsity_ratio"]
        logs[f"{spec['metric']}_{pname}"] = value
        total = total + spec.get("loss_weight", 1.0) * value
    return total, logs


def compute_metrics(preds, graph, metrics: Sequence[Dict[str, Any]], psum=None):
    kw = {} if psum is None else {"psum": psum}
    out = {}
    for spec in metrics:
        fn = get_metric(spec["metric"])
        pname = spec["prediction"].lower()
        pred, target, mask = _stack_pred_target(pname, preds, graph)
        value = fn(pred, target, mask, **kw)
        if pname.startswith("hamiltonian") and "sparsity_ratio" in preds:
            value = value * preds["sparsity_ratio"]
        out[f"{spec['metric']}_{pname}"] = value
    return out
