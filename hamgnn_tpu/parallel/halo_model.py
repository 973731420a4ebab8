"""Full-model training under the halo edge partition (SURVEY §5 north star).

Round 1 wired :mod:`hamgnn_tpu.parallel.halo` to single layers; this module
runs the ENTIRE model — embeddings, all ConvBlockE3/CorrProduct/Pair layers,
and the HamGNN++ output head with Hermitian symmetrization, H0 addition,
orbital masks, zero-point shift, sparsity correction and the MAE loss — inside
one ``shard_map`` over the ``graph`` mesh axis, replacing the replicated-node
GSPMD fallback (parallel/sharding.py) in the multi-chip train step.

Communication per step (everything else is shard-local):
  * one node-feature ``all_to_all`` per layer for the conv gather and one for
    the pair-lift gather — O(halo · D) bytes, the partition's surface/volume;
  * one off-site-block ``all_to_all`` in the head for Hermitian
    symmetrization (each boundary edge's inverse lives with the src owner);
  * scalar ``psum`` reductions for zero-point shift, sparsity and the loss.

Parameters stay replicated; ``jax.grad`` through the ``shard_map`` inserts the
matching psums for the weight gradients, so the step is numerically the
single-device step (equivalence-tested in tests/test_halo_model.py).

Reference counterpart: the DDP data-parallel setup in
/root/reference/hamgnn/main.py:300-323 — which cannot split one large crystal
at all; this partition is the capability the reference lacks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import Graph
from ..e3.irreps import Irreps
from ..e3.linear import Linear
from ..e3.spherical import spherical_harmonics
from ..models.basis import get_basis_set, hamiltonian_irreps
from ..models.output import HamLayer, _merge_reorder_matrix
from ..nn.blocks import (
    ConvBlockE3,
    CorrProductBlock,
    PairInteractionBlock,
    PairInteractionEmbeddingBlock,
)
from ..nn.radial import RBF_REGISTRY, cosine_cutoff
from .halo import GRAPH_AXIS, EdgePartitionPlan, halo_gather, make_plan

try:  # jax>=0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def build_halo_inputs(graph: Graph, plan: EdgePartitionPlan) -> Dict[str, np.ndarray]:
    """Host-side pack of a padded Graph into per-shard halo inputs.

    Node-side arrays keep their global (S*N_loc) leading axis (ownership
    blocks are contiguous, so P('graph') sharding IS the partition); per-edge
    arrays are reindexed to (S, E_loc, ...) via the plan's edge ids.
    """
    assert plan.inv_pos is not None, "plan must be built with inv_edge_idx"
    src, dst = np.asarray(graph.edge_index[0]), np.asarray(graph.edge_index[1])
    eid = plan.edge_id

    def per_edge(a):
        return np.asarray(a)[eid]

    doping = (None if graph.doping_charge is None
              else np.asarray(graph.doping_charge)[np.asarray(graph.batch)])
    out = {
        # node side, sharded on leading axis
        "z": np.asarray(graph.z),
        "node_mask": np.asarray(graph.node_mask),
        "Hon": np.asarray(graph.Hon),
        "Son": None if graph.Son is None else np.asarray(graph.Son),
        "Hon0": None if graph.Hon0 is None else np.asarray(graph.Hon0),
        "doping_node": doping,
        # edge side, (S, E_loc, ...)
        "edge_vec": per_edge(np.asarray(graph.edge_vectors())),
        "z_src": np.asarray(graph.z)[src][eid],
        "z_dst": np.asarray(graph.z)[dst][eid],
        "doping_src": None if doping is None else doping[src][eid],
        "doping_dst": None if doping is None else doping[dst][eid],
        "Hoff": per_edge(graph.Hoff),
        "Soff": None if graph.Soff is None else per_edge(graph.Soff),
        "Hoff0": None if graph.Hoff0 is None else per_edge(graph.Hoff0),
        # plan arrays
        "src_pos": plan.src_pos,
        "dst_local": plan.dst_local,
        "edge_mask_sh": plan.edge_mask,
        "send_idx": plan.send_idx,
        "inv_pos": plan.inv_pos,
        "edge_send_idx": plan.edge_send_idx,
    }
    return {k: v for k, v in out.items() if v is not None}


def edge_halo_gather(local_rows: jnp.ndarray, edge_send_idx: jnp.ndarray) -> jnp.ndarray:
    """[local edge rows ‖ received inverse-edge rows] table (one all_to_all)."""
    send = local_rows[edge_send_idx]                 # (S, HE, D)
    recv = jax.lax.all_to_all(send, GRAPH_AXIS, split_axis=0, concat_axis=0)
    return jnp.concatenate(
        [local_rows, recv.reshape(-1, local_rows.shape[-1])], axis=0)


def _psum(x):
    return jax.lax.psum(x, GRAPH_AXIS)


def make_halo_loss_fn(model, mesh: Mesh,
                      losses: Optional[Sequence[Dict[str, Any]]] = None,
                      data_axis: Optional[str] = None):
    """Build ``loss_fn(params, inputs) -> (loss, logs)`` for the full model
    under the halo partition.

    ``model`` is a :class:`hamgnn_tpu.models.model.HamGNNModel`;
    hyperparameters are read off its representation/output modules and
    standalone blocks are applied with the matching parameter subtrees, so the
    same ``params`` pytree drives both this and the single-device step.
    Supported head config: HamGNNConvE3 representation, non-SOC output
    (band-energy secondary training stays single-chip/data-parallel, as in the
    reference where DDP never splits a crystal).
    """
    rep = model.representation
    out_mod = model.output
    from ..models.representation import HamGNNConvE3

    if not isinstance(rep, HamGNNConvE3):
        raise NotImplementedError(
            f"halo edge-partition training supports the HamGNNConvE3 "
            f"representation; got {type(rep).__name__} (use data-parallel "
            f"mode for the transformer)")
    losses = losses or [{"metric": "mae", "prediction": "hamiltonian",
                         "target": "hamiltonian", "loss_weight": 27.211}]
    for spec in losses:
        pred_name = spec["prediction"].lower()
        assert pred_name in ("hamiltonian", "overlap"), (
            "halo step computes hamiltonian/overlap losses")
        assert pred_name == "hamiltonian" or not out_mod.ham_only, (
            "overlap loss needs ham_only=False")
        assert spec["metric"].lower() == "mae", "halo step: mae loss"
    # overlap branch only when an overlap loss is actually requested — a
    # ham_only=False model trained without overlap targets must not index
    # Son/Soff (KeyError) nor double the off-site all_to_all payload
    # (ADVICE r2)
    with_overlap = any(s["prediction"].lower() == "overlap" for s in losses)

    irreps_sh = Irreps(rep.irreps_edge_sh)
    irreps_feat = Irreps(rep.irreps_node_features)
    irreps_onehot = Irreps(f"{rep.num_types}x0e")
    sh_ls = [ir.l for _, ir in irreps_sh]
    basis = get_basis_set(out_mod.ham_type, out_mod.nao_max)
    nao = basis.nao_max
    ham_irreps = hamiltonian_irreps(basis)
    M_np = _merge_reorder_matrix(out_mod.ham_type, out_mod.nao_max)
    mask_table_np = basis.orbital_mask_table
    n_orb_np = basis.num_orbital_table

    # standalone blocks bound to the representation's submodule param names
    pair_embedding = PairInteractionEmbeddingBlock(
        irreps_node_feats=irreps_onehot, irreps_edge_feats=irreps_feat,
        irreps_edge_attrs=irreps_sh, num_edge_scalars=rep.num_radial,
        radial_mlp=tuple(rep.radial_mlp), use_kan=rep.use_kan,
        lite_mode=rep.lite_mode)
    chemical_embedding = Linear(irreps_onehot, irreps_feat)
    convs, corrs, pairs = [], [], []
    for i in range(rep.num_layers):
        convs.append(ConvBlockE3(
            irreps_in=irreps_feat, irreps_out=irreps_feat,
            irreps_edge_attrs=irreps_sh, num_edge_scalars=rep.num_radial,
            radial_mlp=tuple(rep.radial_mlp), use_skip_connections=True,
            use_kan=rep.use_kan, lite_mode=rep.lite_mode))
        corrs.append(CorrProductBlock(
            irreps_node_feats=irreps_feat,
            num_hidden_features=rep.num_hidden_features,
            correlation=rep.correlation, num_elements=rep.num_types,
            use_skip_connections=True) if rep.use_corr_prod else None)
        pairs.append(PairInteractionBlock(
            irreps_node_feats=irreps_feat, irreps_edge_feats=irreps_feat,
            irreps_edge_attrs=irreps_sh, num_edge_scalars=rep.num_radial,
            radial_mlp=tuple(rep.radial_mlp),
            use_skip_connections=((i > 0) if rep.legacy_edge_update else True),
            use_kan=rep.use_kan, lite_mode=rep.lite_mode,
            legacy_edge_update=rep.legacy_edge_update))
    on_head = HamLayer(irreps_in=Irreps(out_mod.irreps_in_node),
                       irreps_out=ham_irreps,
                       nonlinearity_type=out_mod.nonlinearity_type)
    off_head = HamLayer(irreps_in=Irreps(out_mod.irreps_in_edge),
                        irreps_out=ham_irreps,
                        nonlinearity_type=out_mod.nonlinearity_type)
    s_on_head = s_off_head = None
    if with_overlap:
        s_on_head = HamLayer(irreps_in=Irreps(out_mod.irreps_in_node),
                             irreps_out=ham_irreps,
                             nonlinearity_type=out_mod.nonlinearity_type)
        s_off_head = HamLayer(irreps_in=Irreps(out_mod.irreps_in_edge),
                              irreps_out=ham_irreps,
                              nonlinearity_type=out_mod.nonlinearity_type)

    def local_loss(params, inp):
        rp = params["params"]["representation"]
        op = params["params"]["output"]
        dtype = jnp.float32

        if data_axis is not None:
            inp = {k: v[0] for k, v in inp.items()}

        # squeeze the leading per-shard axis shard_map adds to (S, ...) arrays
        def sq(name):
            return inp[name][0]

        z_loc = inp["z"]
        node_mask = inp["node_mask"].astype(dtype)
        edge_mask = sq("edge_mask_sh")
        emask = edge_mask.astype(dtype)
        edge_vec = sq("edge_vec")
        src_pos = sq("src_pos")
        dst_local = sq("dst_local")
        send_idx = sq("send_idx")
        inv_pos = sq("inv_pos")
        edge_send_idx = sq("edge_send_idx")
        z_src, z_dst = sq("z_src"), sq("z_dst")

        # --- embeddings (shard-local) --------------------------------
        # charge-doped one-hot is a per-node function of (z, q): with q
        # carried per edge endpoint it stays shard-local (no halo exchange)
        if rep.apply_charge_doping and "doping_node" in inp:
            from ..models.representation import ChargeDopedOneHot

            emb = ChargeDopedOneHot(
                num_types=rep.num_types, apply_charge_doping=True,
                num_charge_attr_feas=rep.num_charge_attr_feas)
            emb_p = {"params": rp["atomic_embedding"]}
            onehot_own = emb.apply(emb_p, z_loc, inp["doping_node"])
            onehot_src = emb.apply(emb_p, z_src, sq("doping_src"))
            onehot_dst = emb.apply(emb_p, z_dst, sq("doping_dst"))
        else:
            onehot_own = jax.nn.one_hot(z_loc, rep.num_types, dtype=dtype)
            onehot_src = jax.nn.one_hot(z_src, rep.num_types, dtype=dtype)
            onehot_dst = jax.nn.one_hot(z_dst, rep.num_types, dtype=dtype)
        edge_len = jnp.sqrt(jnp.sum(edge_vec * edge_vec, axis=-1))
        edge_len = jnp.where(edge_mask, edge_len, 1.0)
        edge_sh = spherical_harmonics(sh_ls, edge_vec, normalize=True)
        # RBFs are flax modules (Bessel has trainable freqs); the compact
        # representation auto-names them "<Class>_0"
        rbf_mod = RBF_REGISTRY[rep.rbf_func](rep.num_radial, rep.cutoff)
        rbf_name = type(rbf_mod).__name__ + "_0"
        rbf = rbf_mod.apply(
            {"params": rp[rbf_name]} if rbf_name in rp else {}, edge_len)
        edge_scalars = rbf * cosine_cutoff(edge_len, rep.cutoff)[:, None]

        edge_feats = pair_embedding.apply(
            {"params": rp["pair_embedding"]},
            (onehot_src, onehot_dst), edge_sh, edge_scalars, None)
        node_feats = chemical_embedding.apply(
            {"params": rp["chemical_embedding"]}, onehot_own)

        # --- layers: halo-exchange node features, aggregate locally --
        for i in range(rep.num_layers):
            table = halo_gather(node_feats, send_idx)
            node_feats = convs[i].apply(
                {"params": rp[f"conv_{i}"]},
                node_feats, table[src_pos], node_feats[dst_local], edge_feats,
                edge_sh, edge_scalars, dst_local, edge_mask,
                method=convs[i].gathered_call)
            if corrs[i] is not None:
                node_feats = corrs[i].apply(
                    {"params": rp[f"corr_{i}"]}, node_feats, onehot_own)
            up_src, up_dst = pairs[i].apply(
                {"params": rp[f"pair_{i}"]}, node_feats,
                method=pairs[i].lift)
            src_table = halo_gather(up_src, send_idx)
            edge_feats = pairs[i].apply(
                {"params": rp[f"pair_{i}"]}, src_table[src_pos],
                up_dst[dst_local], edge_feats, edge_sh, edge_scalars,
                method=pairs[i].gathered_call)

        # --- output head ---------------------------------------------
        M = jnp.asarray(M_np, dtype)
        mask_table = jnp.asarray(mask_table_np, dtype)
        h_on = on_head.apply({"params": op["onsite_hamiltonian"]},
                             node_feats) @ M
        h_off = off_head.apply({"params": op["offsite_hamiltonian"]},
                               edge_feats) @ M
        s_on = s_off = None
        if with_overlap:
            s_on = s_on_head.apply({"params": op["onsite_overlap"]},
                                   node_feats) @ M
            s_off = s_off_head.apply({"params": op["offsite_overlap"]},
                                     edge_feats) @ M

        if out_mod.symmetrize:
            def herm_on(h):
                hm = h.reshape(-1, nao, nao)
                return (0.5 * (hm + jnp.swapaxes(hm, -1, -2))).reshape(
                    -1, nao * nao)

            h_on = herm_on(h_on)
            if s_on is not None:
                s_on = herm_on(s_on)
            # inverse-edge blocks: STILL one all_to_all for the boundary
            # edges — the hamiltonian and overlap rows ride one payload
            payload = (h_off if s_off is None
                       else jnp.concatenate([h_off, s_off], axis=-1))
            etable = edge_halo_gather(payload, edge_send_idx)

            def herm_off(h, col0):
                hm = h.reshape(-1, nao, nao)
                hinv = etable[inv_pos, col0 : col0 + nao * nao].reshape(
                    -1, nao, nao)
                return (0.5 * (hm + jnp.swapaxes(hinv, -1, -2))).reshape(
                    -1, nao * nao)

            h_off = herm_off(h_off, 0)
            if s_off is not None:
                s_off = herm_off(s_off, nao * nao)

        if out_mod.add_H0 and "Hon0" in inp:
            h_on = h_on + inp["Hon0"]
            h_off = h_off + sq("Hoff0")

        node_orb = mask_table[z_loc]
        on_mask = (node_orb[:, :, None] * node_orb[:, None, :]).reshape(
            -1, nao * nao) * node_mask[:, None]
        off_mask = (mask_table[z_src][:, :, None]
                    * mask_table[z_dst][:, None, :]).reshape(
            -1, nao * nao) * emask[:, None]
        h_on = h_on * on_mask
        h_off = h_off * off_mask
        if with_overlap:
            s_on = s_on * on_mask
            s_off = s_off * off_mask

        Hon_t, Hoff_t = inp["Hon"], sq("Hoff")
        if out_mod.zero_point_shift and "Son" in inp:
            thresh = 1e-6
            Son_t, Soff_t = inp["Son"], sq("Soff")
            w_on = (Son_t > thresh).astype(dtype) * on_mask
            w_off = (Soff_t > thresh).astype(dtype) * off_mask
            num = _psum(jnp.sum(w_on * (h_on - Hon_t))
                        + jnp.sum(w_off * (h_off - Hoff_t)))
            den = _psum(jnp.sum(w_on * Son_t) + jnp.sum(w_off * Soff_t))
            shift = num / jnp.maximum(den, 1e-12)
            h_on = h_on - shift * Son_t * on_mask
            h_off = h_off - shift * Soff_t * off_mask

        # --- sparsity ratio ------------------------------------------
        n_orb = jnp.asarray(n_orb_np, jnp.float32)
        n_i = n_orb[z_loc] * node_mask
        eff = _psum(jnp.sum(n_i * n_i)
                    + jnp.sum(n_orb[z_src] * n_orb[z_dst] * emask))
        total_rows = _psum(jnp.sum(node_mask) + jnp.sum(emask)) * float(nao * nao)
        sparsity = total_rows / jnp.maximum(eff, 1.0)

        # --- masked-mean losses (global row mask, like train/losses) --
        num_rows = _psum(jnp.sum(node_mask) + jnp.sum(emask)) * float(nao * nao)

        def masked_mae(p_on, p_off, t_on, t_off):
            a = jnp.sum(jnp.abs(p_on - t_on) * node_mask[:, None])
            b = jnp.sum(jnp.abs(p_off - t_off) * emask[:, None])
            return _psum(a + b) / jnp.maximum(num_rows, 1.0)

        mae = masked_mae(h_on, h_off, Hon_t, Hoff_t)
        mae_s = (masked_mae(s_on, s_off, inp["Son"], sq("Soff"))
                 if with_overlap else None)
        logs = {}
        total = jnp.asarray(0.0, jnp.float32)
        for spec in losses:
            pname = spec["prediction"].lower()
            # sparsity correction applies to hamiltonian losses only
            # (reference Model.py:159-162)
            value = mae * sparsity if pname == "hamiltonian" else mae_s
            logs[f"{spec['metric']}_{pname}"] = value
            total = total + spec.get("loss_weight", 1.0) * value
        if data_axis is not None:
            total = jax.lax.pmean(total, data_axis)
            logs = jax.tree.map(lambda x: jax.lax.pmean(x, data_axis), logs)
        return total, logs

    def loss_fn(params, inputs):
        lead = (data_axis,) if data_axis is not None else ()
        specs = {k: P(*lead, GRAPH_AXIS) for k in inputs}
        fn = shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(), specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(params, inputs)

    return loss_fn


def halo_bucket_sizes(graphs: Sequence[Graph], n_shards: int,
                      edge_quantum: int = 64) -> Tuple[int, int, int]:
    """Dataset-wide (edge_loc, halo, edge_halo) bucket sizes: the max of the
    natural plan sizes, so every stacked batch shares ONE jit shape."""
    nat = [plan_for_graph(g, n_shards, edge_quantum) for g in graphs]
    return (max(p.edge_id.shape[1] for p in nat),
            max(p.halo_bucket for p in nat),
            max(p.edge_halo_bucket for p in nat))


def stack_halo_inputs(graphs: Sequence[Graph], n_shards: int,
                      edge_quantum: int = 64,
                      force_sizes: Optional[Tuple[int, int, int]] = None,
                      ) -> Dict[str, np.ndarray]:
    """Pack several same-bucket padded graphs for a DP x halo mesh.

    Two passes: natural plans fix the max local-edge/halo bucket sizes (or
    ``force_sizes`` pins them dataset-wide), then plans are rebuilt with the
    forced common sizes (table positions depend on the bucket sizes, so plain
    padding would corrupt them) and every input is stacked along a leading
    data axis.
    """
    if force_sizes is not None:
        e_loc, halo, ehalo = force_sizes
    else:
        e_loc, halo, ehalo = halo_bucket_sizes(graphs, n_shards, edge_quantum)
    packed = []
    for g in graphs:
        plan = make_plan(
            np.asarray(g.edge_index), np.asarray(g.edge_mask), g.num_nodes,
            n_shards, edge_quantum=edge_quantum,
            inv_edge_idx=np.asarray(g.inv_edge_idx),
            force_edge_loc=e_loc, force_halo=halo, force_edge_halo=ehalo)
        packed.append(build_halo_inputs(g, plan))
    keys = set(packed[0])
    for p in packed[1:]:
        keys &= set(p)
    return {k: np.stack([p[k] for p in packed]) for k in keys}


def make_halo_train_step(model, tx, losses, mesh: Mesh,
                         data_axis: Optional[str] = "data"):
    """jitted DP x halo train step: flat-vector optimizer like the
    single-chip Trainer; XLA inserts the gradient psums from the shard_map."""
    import functools

    from jax.flatten_util import ravel_pytree

    loss_fn = make_halo_loss_fn(model, mesh, losses, data_axis=data_axis)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, inputs, lr):
        (total, logs), grads = jax.value_and_grad(
            lambda p: loss_fn(p, inputs), has_aux=True)(params)
        gflat, _ = ravel_pytree(grads)
        pflat, unravel = ravel_pytree(params)
        updates, opt_state2 = tx.update(gflat, opt_state, pflat)
        params2 = unravel(pflat + updates * lr)
        return params2, opt_state2, total, logs

    return step


def shard_halo_inputs(mesh: Mesh, inputs: Dict[str, np.ndarray],
                      data_axis: Optional[str] = None):
    """device_put the packed inputs with their halo shardings."""
    lead = (data_axis,) if data_axis is not None else ()
    sh = NamedSharding(mesh, P(*lead, GRAPH_AXIS))
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in inputs.items()}


def plan_for_graph(graph: Graph, n_shards: int,
                   edge_quantum: int = 64) -> EdgePartitionPlan:
    """Halo plan (with inverse-edge exchange) for a padded graph."""
    return make_plan(
        np.asarray(graph.edge_index), np.asarray(graph.edge_mask),
        graph.num_nodes, n_shards, edge_quantum=edge_quantum,
        inv_edge_idx=np.asarray(graph.inv_edge_idx))
