"""Multi-chip trainer: DP x edge-partition SPMD training loop.

Extends the single-chip :class:`hamgnn_tpu.train.trainer.Trainer`: per step,
``n_data`` crystals are padded to one common bucket, stacked, sharded over the
``Mesh(('data','graph'))``, and run through the jit-compiled SPMD step of
:mod:`hamgnn_tpu.parallel.sharding` (XLA inserts the gradient all-reduce and
the edge-partition collectives).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, pad_and_batch
from ..train.trainer import Trainer
from .sharding import (
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_to_mesh,
    shard_stacked_graph,
    stack_graphs,
)


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


class ParallelTrainer(Trainer):
    def __init__(self, *args, n_data: int = 1, n_graph: int = 1,
                 node_quantum: int = 16, edge_quantum: int = 512, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = make_mesh(n_data, n_graph)
        self.n_data = n_data
        self.node_quantum = node_quantum
        self.edge_quantum = edge_quantum
        self._pstep_cache: Dict[Tuple, object] = {}
        self._pev_cache: Dict[Tuple, object] = {}

    def init_params(self, example: Graph, seed: int = 666):
        params = super().init_params(example, seed)
        self.params = replicate_to_mesh(self.mesh, params)
        # replicate_to_mesh also commits every leaf (fresh eager optax arrays
        # are uncommitted, which would flip the jit cache key after the first
        # donated step — see Trainer.init_params)
        from .sharding import init_flat_opt_state

        self.opt_state = replicate_to_mesh(
            self.mesh, init_flat_opt_state(self.tx, self.params))
        return self.params

    # -- stacked-batch construction -------------------------------------

    def _stack(self, crystals: List[Dict]) -> Graph:
        """Pad each crystal group member to a common bucket, stack, shard."""
        n_bucket = _round_up(max(c["z"].shape[0] for c in crystals),
                             self.node_quantum)
        e_bucket = _round_up(max(c["edge_index"].shape[1] for c in crystals),
                             self.edge_quantum)
        graphs = [pad_and_batch([c], node_bucket=n_bucket, edge_bucket=e_bucket)
                  for c in crystals]
        return shard_stacked_graph(self.mesh, stack_graphs(graphs))

    def _iter_stacked(self, crystals: List[Dict], shuffle: bool, rng=None):
        order = list(range(len(crystals)))
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        d = self.n_data
        for i in range(0, len(order) - d + 1, d):
            yield self._stack([crystals[j] for j in order[i : i + d]])

    # -- loops -----------------------------------------------------------

    def _get_pstep(self, stacked: Graph):
        key = (stacked.z.shape, stacked.edge_index.shape)
        if key not in self._pstep_cache:
            self._pstep_cache[key] = make_parallel_train_step(
                self.model, self.tx, self.losses, self.mesh, stacked)
        return self._pstep_cache[key]

    def _get_pev(self, stacked: Graph):
        key = (stacked.z.shape, stacked.edge_index.shape)
        if key not in self._pev_cache:
            self._pev_cache[key] = make_parallel_eval_step(
                self.model, self.losses, self.mesh, stacked)
        return self._pev_cache[key]

    def train_epoch_crystals(self, crystals: List[Dict], rng=None) -> float:
        losses = []
        lr = jnp.asarray(self.sched.lr, jnp.float32)
        for stacked in self._iter_stacked(crystals, shuffle=True, rng=rng):
            step = self._get_pstep(stacked)
            self.params, self.opt_state, loss, _ = step(
                self.params, self.opt_state, stacked, lr)
            losses.append(loss)  # device scalar; one host sync per epoch
        if not losses:
            return 0.0
        import numpy as np

        return float(np.mean(jax.device_get(losses)))

    def eval_epoch_crystals(self, crystals: List[Dict]) -> float:
        tot, n = 0.0, 0
        for stacked in self._iter_stacked(crystals, shuffle=False):
            ev = self._get_pev(stacked)
            loss, _ = ev(self.params, stacked)
            tot += float(loss)
            n += 1
        return tot / max(n, 1)
