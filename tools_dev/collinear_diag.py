"""Diagnose the collinear spin-constrained training stall.

Checks, on one batch of the sk_collinear teacher dataset:
  1. loss/grad finiteness + per-param-group grad norms at init,
  2. whether 400 Adam steps overfit a single batch (representability +
     optimization sanity),
  3. the irreducible floor: MAE of predicting target's crystal-mean vs the
     actual target, and the MAE decomposition (base vs spin-splitting part).
"""

import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=1"
import sys
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")

import json
import numpy as np
import jax.numpy as jnp
import optax

from hamgnn_tpu.data.dataset import load_graph_npz
from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.models.model import HamGNNModel, compute_losses
from hamgnn_tpu.models.representation import HamGNNConvE3
from hamgnn_tpu.models.spin import HamGNNMagneticOut

crystals = load_graph_npz("datasets/sk_collinear/graph_data.npz")
batch = crystals[:4] if isinstance(crystals, list) else [crystals[k] for k in sorted(crystals)[:4]]
graph = pad_and_batch(batch, bucket_multiple=64)
print("batch nodes/edges:", int(graph.num_nodes), int(graph.num_edges),
      "Hon shape:", graph.Hon.shape)
print("spin present:", graph.spin_vec is not None, "sum|spin|:", None if graph.spin_length is None else float(graph.spin_length.sum()))

FEAT = "32x0e+8x0o+12x1o+6x1e+8x2e+4x2o+4x3o+3x3e+2x4e+1x4o"
rep = HamGNNConvE3(num_types=96, irreps_edge_sh="0e + 1o + 2e + 3o + 4e",
                   irreps_node_features=FEAT, num_layers=2, num_radial=64,
                   cutoff=9.0, radial_mlp=(64, 64), rbf_func="bessel")
out = HamGNNMagneticOut(irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
                        ham_type="openmx", soc_switch=False,
                        collinear_spin=True, add_H0=True, symmetrize=True)
model = HamGNNModel(representation=rep, output=out)
losses = [{"metric": "mae", "prediction": "hamiltonian", "target": "hamiltonian",
           "loss_weight": 27.211}]

params = model.init(jax.random.PRNGKey(0), graph)

def loss_fn(p, g):
    preds = model.apply(p, g)
    total, logs = compute_losses(preds, g, losses)
    return total, logs

(val, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, graph)
print("init loss:", float(val), {k: float(v) for k, v in logs.items()})
flat = jax.tree_util.tree_leaves_with_path(grads)
bad = [jax.tree_util.keystr(k) for k, v in flat if not np.isfinite(np.asarray(v)).all()]
print("nonfinite grads:", bad[:8] or "none")

# grad norms per head
groups = {}
for k, v in flat:
    ks = jax.tree_util.keystr(k)
    top = ks.split("'")[3] if "'" in ks else ks
    groups[top] = groups.get(top, 0.0) + float(jnp.sum(v * v))
print("grad sq-norms by module:")
for k in sorted(groups, key=lambda x: -groups[x])[:14]:
    print(f"  {k:40s} {groups[k]:.3e}")

# irreducible-floor decomposition
preds = model.apply(params, graph)
pred = jnp.concatenate([preds["hamiltonian_on"], preds["hamiltonian_off"]], 0)
tgt = jnp.concatenate([graph.Hon, graph.Hoff], 0)
mask = jnp.concatenate([graph.node_mask, graph.edge_mask], 0)
mask2 = jnp.broadcast_to(mask[:, None, None], tgt.shape)
h0 = jnp.concatenate([graph.Hon0, graph.Hoff0], 0)
mae = lambda a, b: float(jnp.sum(jnp.abs(a - b) * mask2) / jnp.sum(mask2))
print("raw MAE(pred, target) @init:", mae(pred, tgt))
print("raw MAE(H0, target):", mae(h0, tgt))
sp = float(preds["sparsity_ratio"])
print("sparsity ratio:", sp, "-> scaled init MAE:", mae(pred, tgt) * sp)
split = 0.5 * (tgt[:, 0] - tgt[:, 1])
print("mean |spin splitting|:", float(jnp.sum(jnp.abs(split) * mask2[:, 0]) / jnp.sum(mask2[:, 0])))

# overfit probe
import optax as _ox
sched = _ox.exponential_decay(3e-3, 300, 0.5)
opt = optax.adamw(sched)
ost = opt.init(params)

@jax.jit
def step(p, o, g):
    (v, lg), gr = jax.value_and_grad(loss_fn, has_aux=True)(p, g)
    up, o = opt.update(gr, o, p)
    return optax.apply_updates(p, up), o, v, lg

hist = []
for i in range(1500):
    params, ost, v, lg = step(params, ost, graph)
    if i % 100 == 0 or i == 1499:
        hist.append((i, float(v), float(lg["mae_hamiltonian"])))
        print("step", i, "loss", float(v), "mae", float(lg["mae_hamiltonian"]))
print(json.dumps(hist))
