"""Multi-chip parallelism: device mesh, sharding specs, parallel train step.

The reference scales with PyTorch-Lightning DDP over NCCL
(/root/reference/hamgnn/main.py:300-323) and nothing else.  The TPU-native
design uses one jit-compiled SPMD program over a 2-axis
``Mesh(('data', 'graph'))``:

  * **data axis** — batch-of-crystals dimension: each data-slice processes its
    own padded Graph; gradient all-reduce is inserted by XLA because params are
    replicated while the batch is sharded (DDP equivalent, riding ICI).
  * **graph axis** — the edge partition (the reference's missing
    sequence-parallel analog, SURVEY.md §5): per-edge arrays are sharded along
    the edge dimension, node arrays replicated; XLA turns segment-sums into
    local partial sums + AllReduce over the graph axis and inserts gathers for
    the inverse-edge Hermitization.

No NCCL-style hand-written communication: shardings are declared, XLA places
the collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import Graph
from ..models.model import compute_losses

DATA_AXIS = "data"
GRAPH_AXIS = "graph"

# Graph fields partitioned along their leading (edge) dimension.
_EDGE_FIELDS = {
    "edge_mask", "nbr_shift", "cell_shift", "inv_edge_idx",
    "Hoff", "Hoff0", "iHoff", "iHoff0", "Soff", "Loff",
}
# edge_index has the edge dim second (2, E).
_EDGE_DIM1_FIELDS = {"edge_index"}


def make_mesh(n_data: int, n_graph: int, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_data * n_graph, (len(devices), n_data, n_graph)
    arr = np.asarray(devices[: n_data * n_graph]).reshape(n_data, n_graph)
    return Mesh(arr, (DATA_AXIS, GRAPH_AXIS))


def stack_graphs(graphs: Sequence[Graph]) -> Graph:
    """Stack same-shape padded Graphs along a new leading batch dim."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *graphs)


def graph_sharding(mesh: Mesh, stacked: bool = True) -> Graph:
    """Pytree of NamedShardings for a (stacked) Graph."""

    def spec_for(name: str):
        lead = (DATA_AXIS,) if stacked else ()
        if name in _EDGE_FIELDS:
            return P(*lead, GRAPH_AXIS)
        if name in _EDGE_DIM1_FIELDS:
            return P(*lead, None, GRAPH_AXIS)
        return P(*lead)

    def build(g: Graph):
        kwargs = {}
        for field in g.__dataclass_fields__:
            val = getattr(g, field)
            kwargs[field] = (
                None if val is None else NamedSharding(mesh, spec_for(field))
            )
        return Graph(**kwargs)

    return build


def shard_stacked_graph(mesh: Mesh, stacked: Graph) -> Graph:
    """Device-put a stacked Graph with DP x edge-partition shardings."""
    shardings = graph_sharding(mesh, stacked=True)(stacked)

    def put(x, s):
        return None if x is None else jax.device_put(x, s)

    kwargs = {
        f: put(getattr(stacked, f), getattr(shardings, f))
        for f in stacked.__dataclass_fields__
    }
    return Graph(**kwargs)


def replicate_to_mesh(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh (params/opt state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_parallel_train_step(model, tx, losses: List[Dict[str, Any]], mesh: Mesh,
                             example: Graph):
    """jit-compiled SPMD train step over a stacked, sharded Graph batch.

    params/opt_state replicated; the vmapped per-graph losses are averaged over
    the data axis; XLA inserts the gradient AllReduce.
    """
    import optax

    replicated = NamedSharding(mesh, P())
    gshard = graph_sharding(mesh, stacked=True)(example)

    def loss_fn(params, gstack: Graph):
        def per_graph(g):
            preds = model.apply(params, g)
            total, logs = compute_losses(preds, g, losses)
            return total, logs

        totals, logs = jax.vmap(per_graph)(gstack)
        return jnp.mean(totals), jax.tree.map(jnp.mean, logs)

    @functools.partial(
        jax.jit,
        in_shardings=(replicated, replicated, gshard, replicated),
    )
    def step(params, opt_state, gstack, lr):
        (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, gstack)
        # flat-vector optimizer (see train/trainer.py): opt_state is over the
        # raveled parameter vector, init with init_flat_opt_state
        gflat, _ = ravel_pytree(grads)
        pflat, unravel = ravel_pytree(params)
        updates, opt_state2 = tx.update(gflat, opt_state, pflat)
        params2 = unravel(pflat + updates * lr)
        return params2, opt_state2, total, logs

    return step


def init_flat_opt_state(tx, params):
    """Optimizer state over the raveled parameter vector (matches the flat
    update inside make_parallel_train_step / Trainer)."""
    flat0, _ = ravel_pytree(params)
    return tx.init(flat0)


def make_parallel_eval_step(model, losses: List[Dict[str, Any]], mesh: Mesh,
                            example: Graph):
    replicated = NamedSharding(mesh, P())
    gshard = graph_sharding(mesh, stacked=True)(example)

    @functools.partial(jax.jit, in_shardings=(replicated, gshard))
    def step(params, gstack):
        def per_graph(g):
            preds = model.apply(params, g)
            total, logs = compute_losses(preds, g, losses)
            return total, logs

        totals, logs = jax.vmap(per_graph)(gstack)
        return jnp.mean(totals), jax.tree.map(jnp.mean, logs)

    return step
