"""Reference-parametrization (e3nn-compat) execution path + full ckpt import.

The native TPU pipeline deliberately fuses the e3nn ``o3.TensorProduct``
internal uvw weights into the post-scale equivariant Linear
(:mod:`hamgnn_tpu.e3.packed_tp`) — faster on MXU, but a *different
parametrization*, so a reference checkpoint cannot be loaded into it
weight-for-weight.  This module provides the missing piece (VERDICT round-1
item 3): flax blocks that mirror the reference's module structure exactly —

    MessagePackBlock   = TP(internal uvw weights) -> LinearScaleWithWeights
                         (per-channel radial scale + o3.Linear) -> Linear out
                         (/root/reference/hamgnn/nn/message_passing.py:26-231)
    ConvBlockE3        = skip Linear + scatter-sum + ResidualBlock
                         (nn/convolution.py:23-160)
    PairInteraction[Embedding]Block                (nn/interaction_blocks.py,
                         nn/embeddings.py:215-337)
    HamGNNConvE3Compat (models/hamgnn_conv.py:88-284)

— with flax scope names equal to the reference's attribute names, plus
:func:`map_reference_state`, the automatic state_dict -> params mapping
(o3.Linear reindex, per-instruction TP weight split, FCN copy).  Imported
reference checkpoints run through this path; native training keeps the fused
parametrization.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..e3.gate import make_gate
from ..e3.irreps import Irreps
from ..e3.linear import ElementwiseChannelScale, Linear
from ..e3.tensor_product import (
    TensorProduct,
    TensorProductPlan,
    tp_out_irreps_with_instructions,
)
from ..nn.blocks import ResidualBlock, fuse_src_dst, segment_sum
from ..nn.mlp import FullyConnectedNet
from ..nn.radial import RBF_REGISTRY, cosine_cutoff
from .torch_ckpt import convert_o3_linear_weight

# ---------------------------------------------------------------------------
# compat blocks
# ---------------------------------------------------------------------------


def _weight_gen(num_in: int, radial_mlp, numel: int, name: str):
    return FullyConnectedNet(hs=(num_in, *radial_mlp, numel), act_name="silu",
                             name=name)


class MessagePackBlockCompat(fnn.Module):
    """Reference-parametrized edge message kernel (message_passing.py:26-231)."""

    irreps_node_feats: Irreps
    irreps_edge_feats: Irreps
    irreps_sh: Irreps
    irreps_out: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64)

    @fnn.compact
    def __call__(self, src_feats, dst_feats, edge_feats, edge_sh, edge_scalars):
        irreps_node = Irreps(self.irreps_node_feats)
        irreps_edge = Irreps(self.irreps_edge_feats)
        irreps_sh = Irreps(self.irreps_sh)
        irreps_out = Irreps(self.irreps_out)
        combined = Irreps([(2 * mul, ir) for mul, ir in irreps_node])

        mid_n, ins_n = tp_out_irreps_with_instructions(combined, irreps_sh, irreps_out)
        mid_e, ins_e = tp_out_irreps_with_instructions(irreps_edge, irreps_sh, irreps_out)

        node_inter = fuse_src_dst(irreps_node, src_feats, dst_feats)
        up_n = TensorProduct(
            irreps_in1=combined, irreps_in2=irreps_sh, irreps_out=mid_n,
            instructions=tuple(ins_n), name="node_tensor_product",
        )(node_inter, edge_sh)
        up_e = TensorProduct(
            irreps_in1=irreps_edge, irreps_in2=irreps_sh, irreps_out=mid_e,
            instructions=tuple(ins_e), name="edge_tensor_product",
        )(edge_feats, edge_sh)

        scaler_n = ElementwiseChannelScale(
            irreps_in=mid_n.simplify(), irreps_out=irreps_out,
            name="node_linear_scaler")
        scaler_e = ElementwiseChannelScale(
            irreps_in=mid_e.simplify(), irreps_out=irreps_out,
            name="edge_linear_scaler")
        w_n = _weight_gen(self.num_edge_scalars, self.radial_mlp,
                          scaler_n.weight_numel, "node_weight_generator")(edge_scalars)
        w_e = _weight_gen(self.num_edge_scalars, self.radial_mlp,
                          scaler_e.weight_numel, "edge_weight_generator")(edge_scalars)
        dn_n = scaler_n(up_n, w_n)
        dn_e = scaler_e(up_e, w_e)
        return (Linear(irreps_out, irreps_out, name="node_linear_out")(dn_n)
                + Linear(irreps_out, irreps_out, name="edge_linear_out")(dn_e))


class TPWithMemoryOptCompat(fnn.Module):
    """TensorProductWithMemoryOptimizationWithWeight (tensor_products.py:51-189)."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64)

    @fnn.compact
    def __call__(self, x1, x2, edge_scalars):
        irreps1, irreps2 = Irreps(self.irreps_in1), Irreps(self.irreps_in2)
        irreps_out = Irreps(self.irreps_out)
        mid, ins = tp_out_irreps_with_instructions(irreps1, irreps2, irreps_out)
        up = TensorProduct(
            irreps_in1=irreps1, irreps_in2=irreps2, irreps_out=mid,
            instructions=tuple(ins), name="tensor_product")(x1, x2)
        scaler = ElementwiseChannelScale(
            irreps_in=mid.simplify(), irreps_out=irreps_out,
            name="linear_scaler")
        w = _weight_gen(self.num_edge_scalars, self.radial_mlp,
                        scaler.weight_numel, "weight_generator")(edge_scalars)
        return scaler(up, w)


class PairInteractionEmbeddingBlockCompat(fnn.Module):
    irreps_node_attrs: Irreps
    irreps_edge_feats: Irreps
    irreps_sh: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64)

    @fnn.compact
    def __call__(self, node_attrs, edge_sh, edge_scalars, edge_index):
        irreps_attr = Irreps(self.irreps_node_attrs)
        src, dst = edge_index[0], edge_index[1]
        up_src = Linear(irreps_attr, irreps_attr, name="linear_up_src")(node_attrs)
        up_dst = Linear(irreps_attr, irreps_attr, name="linear_up_dst")(node_attrs)
        x = up_src[src] + up_dst[dst]
        return TPWithMemoryOptCompat(
            irreps_in1=irreps_attr, irreps_in2=Irreps(self.irreps_sh),
            irreps_out=Irreps(self.irreps_edge_feats),
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp), name="conv_tp",
        )(x, edge_sh, edge_scalars)


class ConvBlockE3Compat(fnn.Module):
    irreps_in: Irreps
    irreps_out: Irreps
    irreps_sh: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64)
    use_skip_connections: bool = True

    @fnn.compact
    def __call__(self, node_feats, edge_feats, edge_sh, edge_scalars,
                 edge_index, edge_mask):
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        src, dst = edge_index[0], edge_index[1]
        skip = Linear(irreps_in, irreps_out, name="skip_linear")(node_feats) \
            if self.use_skip_connections else None
        messages = MessagePackBlockCompat(
            irreps_node_feats=irreps_in, irreps_edge_feats=irreps_in,
            irreps_sh=Irreps(self.irreps_sh), irreps_out=irreps_out,
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp), name="conv_tp",
        )(node_feats[src], node_feats[dst], edge_feats, edge_sh, edge_scalars)
        messages = messages * edge_mask[:, None].astype(messages.dtype)
        agg = segment_sum(messages, dst, node_feats.shape[0])
        out = ResidualBlock(irreps_in=irreps_out, irreps_hidden=irreps_out,
                            name="residual")(agg)
        return out + skip if skip is not None else out


class PairInteractionBlockCompat(fnn.Module):
    irreps_node_feats: Irreps
    irreps_edge_feats: Irreps
    irreps_sh: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64)
    use_skip_connections: bool = True
    legacy_edge_update: bool = False

    @fnn.compact
    def __call__(self, node_feats, edge_feats, edge_sh, edge_scalars, edge_index):
        irreps_node = Irreps(self.irreps_node_feats)
        irreps_edge = Irreps(self.irreps_edge_feats)
        src, dst = edge_index[0], edge_index[1]
        up_src = Linear(irreps_node, irreps_node, name="linear_up_src")(node_feats)
        up_tar = Linear(irreps_node, irreps_node, name="linear_up_tar")(node_feats)
        mix = MessagePackBlockCompat(
            irreps_node_feats=irreps_node, irreps_edge_feats=irreps_edge,
            irreps_sh=Irreps(self.irreps_sh), irreps_out=irreps_edge,
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp), name="conv_tp",
        )(up_src[src], up_tar[dst], edge_feats, edge_sh, edge_scalars)
        if self.use_skip_connections:
            return mix + Linear(irreps_edge, irreps_edge, name="skip_linear")(edge_feats)
        if self.legacy_edge_update:
            return edge_feats
        return mix


class DenseRegressionCompat(fnn.Module):
    """Reference ``denseRegression`` (utils/regression_layers.py:7-21) with
    use_batch_norm=False: (n_h-1) x [Linear+bias -> Softplus] -> Linear+bias.
    Torch Linear weights are (out, in); import transposes into flax kernels."""

    in_features: int
    out_features: int
    n_h: int = 2

    @fnn.compact
    def __call__(self, x):
        for i in range(self.n_h - 1):
            x = fnn.softplus(fnn.Dense(self.in_features, name=f"fc_{i}")(x))
        return fnn.Dense(self.out_features, name="fc_out")(x)


class ChargeDopedOneHotCompat(fnn.Module):
    """Reference ``Embedding_block_q`` (toolbox/nequip/nn/embedding/
    _embedding_block.py:56-137): one-hot + mlp_q(smear(q)) - mlp_q(smear(0))."""

    num_types: int
    num_charge_attr_feas: int = 8

    @fnn.compact
    def __call__(self, z, per_node_charge):
        one_hot = jax.nn.one_hot(z, self.num_types, dtype=jnp.float32)
        cmin, cmax = -8.0, 8.0
        n = self.num_charge_attr_feas
        width = (cmax - cmin) / (n - 1) if n > 1 else 1.0
        centers = jnp.linspace(cmin, cmax, n)
        gamma = 1.0 / width**2

        def smear(q):
            d = jnp.clip(q, cmin, cmax)[..., None] - centers
            return jnp.exp(-gamma * d * d)

        mlp = DenseRegressionCompat(in_features=n, out_features=self.num_types,
                                    name="mlp_q")
        q = smear(per_node_charge)
        neutral = smear(jnp.zeros_like(per_node_charge))
        return one_hot + mlp(q) - mlp(neutral)


class HamGNNConvE3Compat(fnn.Module):
    """Reference-parametrized representation net for imported checkpoints."""

    num_types: int = 96
    irreps_edge_sh: str = "0e + 1o + 2e + 3o + 4e + 5o"
    irreps_node_features: str = "64x0e+32x1o+16x2e"
    num_layers: int = 3
    num_radial: int = 64
    rbf_func: str = "bessel"
    cutoff: float = 26.0
    radial_mlp: Tuple[int, ...] = (64, 64)
    legacy_edge_update: bool = False
    use_corr_prod: bool = False
    correlation: int = 2
    num_hidden_features: int = 16
    apply_charge_doping: bool = False
    num_charge_attr_feas: int = 8

    @fnn.compact
    def __call__(self, graph):
        from ..e3.spherical import spherical_harmonics

        irreps_sh = Irreps(self.irreps_edge_sh)
        irreps_feat = Irreps(self.irreps_node_features)
        irreps_onehot = Irreps(f"{self.num_types}x0e")
        sh_ls = [ir.l for _, ir in irreps_sh]

        if self.apply_charge_doping and graph.doping_charge is not None:
            node_attrs = ChargeDopedOneHotCompat(
                num_types=self.num_types,
                num_charge_attr_feas=self.num_charge_attr_feas,
                name="atomic_embedding",
            )(graph.z, graph.doping_charge[graph.batch])
        else:
            node_attrs = jnp.asarray(
                np.eye(self.num_types, dtype=np.float32))[graph.z]
        edge_vec = graph.edge_vectors()
        edge_len = jnp.sqrt(jnp.sum(edge_vec * edge_vec, axis=-1))
        edge_len = jnp.where(graph.edge_mask, edge_len, 1.0)
        edge_sh = spherical_harmonics(sh_ls, edge_vec, normalize=True)
        rbf = RBF_REGISTRY[self.rbf_func](
            self.num_radial, self.cutoff, name="radial_basis")(edge_len)
        edge_scalars = rbf * cosine_cutoff(edge_len, self.cutoff)[:, None]

        edge_feats = PairInteractionEmbeddingBlockCompat(
            irreps_node_attrs=irreps_onehot, irreps_edge_feats=irreps_feat,
            irreps_sh=irreps_sh, num_edge_scalars=self.num_radial,
            radial_mlp=tuple(self.radial_mlp), name="pair_embedding",
        )(node_attrs, edge_sh, edge_scalars, graph.edge_index)
        node_feats = Linear(irreps_onehot, irreps_feat,
                            name="chemical_embedding")(node_attrs)

        for i in range(self.num_layers):
            node_feats = ConvBlockE3Compat(
                irreps_in=irreps_feat, irreps_out=irreps_feat,
                irreps_sh=irreps_sh, num_edge_scalars=self.num_radial,
                radial_mlp=tuple(self.radial_mlp), name=f"convolutions_{i}",
            )(node_feats, edge_feats, edge_sh, edge_scalars, graph.edge_index,
              graph.edge_mask)
            if self.use_corr_prod:
                from ..nn.blocks import CorrProductBlock

                node_feats = CorrProductBlock(
                    irreps_node_feats=irreps_feat,
                    num_hidden_features=self.num_hidden_features,
                    correlation=self.correlation,
                    num_elements=self.num_types,
                    use_skip_connections=True,
                    name=f"corr_products_{i}",
                )(node_feats, node_attrs)
            edge_feats = PairInteractionBlockCompat(
                irreps_node_feats=irreps_feat, irreps_edge_feats=irreps_feat,
                irreps_sh=irreps_sh, num_edge_scalars=self.num_radial,
                radial_mlp=tuple(self.radial_mlp),
                use_skip_connections=(
                    (i > 0) if self.legacy_edge_update else True),
                legacy_edge_update=self.legacy_edge_update,
                name=f"pair_interactions_{i}",
            )(node_feats, edge_feats, edge_sh, edge_scalars, graph.edge_index)
        return {"node_attr": node_feats, "edge_attr": edge_feats}


# ---------------------------------------------------------------------------
# automatic state_dict -> params mapping
# ---------------------------------------------------------------------------


def split_e3nn_tp_weight(flat: np.ndarray, irreps1, irreps2, irreps_out,
                         instructions) -> Dict[str, np.ndarray]:
    """e3nn TensorProduct flat internal ``weight`` -> our per-instruction
    ``w{idx}`` dict (same instruction order, row-major shapes)."""
    plan = TensorProductPlan(irreps1, irreps2, irreps_out, instructions)
    flat = np.asarray(flat).reshape(-1)
    out: Dict[str, np.ndarray] = {}
    ofs = 0
    for idx, shape in enumerate(plan.weight_shapes):
        if shape is None:
            continue
        n = int(np.prod(shape))
        out[f"w{idx}"] = flat[ofs : ofs + n].reshape(shape)
        ofs += n
    if ofs != flat.size:
        raise ValueError(f"TP weight numel {flat.size} != expected {ofs}")
    return out


def _gate_in_irreps(irreps: Irreps) -> Tuple[Irreps, Irreps]:
    gate, gate_in = make_gate(Irreps(irreps))
    return Irreps(gate_in), Irreps(gate.irreps_out)


def map_reference_state(state: Mapping[str, np.ndarray], *,
                        num_types: int,
                        irreps_node_features,
                        irreps_edge_sh,
                        num_layers: int,
                        irreps_ham,
                        rep_prefix: str = "representation.",
                        out_prefix: str = "output_module.",
                        use_corr_prod: bool = False,
                        correlation: int = 2,
                        num_hidden_features: int = 16,
                        apply_charge_doping: bool = False,
                        ham_only: bool = True,
                        soc_basis: Optional[str] = None,
                        irreps_ham_su2=None,
                        nao_max: Optional[int] = None,
                        add_H_nonsoc: bool = False,
                        ) -> Dict[str, np.ndarray]:
    """Reference Lightning ``state_dict`` -> flat assignments for a
    {"representation": HamGNNConvE3Compat, "output": HamGNN heads}
    parameter tree (paths "/"-joined for
    :func:`hamgnn_tpu.interfaces.torch_ckpt.assign_params`).

    Covers the HamGNNConvE3 stack — o3.Linear (reindexed), TP internal
    weights (per-instruction split), radial FCNs, Bessel frequencies — plus
    CorrProductBlock / MACE symmetric-contraction weights
    (toolbox/mace/modules/symmetric_contraction.py:24-233), the
    charge-doping embedding (_embedding_block.py:56-137), overlap heads
    (hamgnn_output.py:248-256), and the SOC su2/so3 heads
    (hamgnn_output.py:188-208).  Raises KeyError for any reference key it
    does not understand, so coverage failures are loud.
    """
    feat = Irreps(irreps_node_features)
    sh = Irreps(irreps_edge_sh)
    onehot = Irreps(f"{num_types}x0e")
    combined = Irreps([(2 * mul, ir) for mul, ir in feat])
    ham = Irreps(irreps_ham)
    gate_in_feat, gate_out_feat = _gate_in_irreps(feat)

    mid_n, ins_n = tp_out_irreps_with_instructions(combined, sh, feat)
    mid_e, ins_e = tp_out_irreps_with_instructions(feat, sh, feat)
    mid_pe, ins_pe = tp_out_irreps_with_instructions(onehot, sh, feat)

    # site tables: linear sites -> (irreps_in, irreps_out), tp sites -> specs
    linears: Dict[str, Tuple[Irreps, Irreps]] = {
        "representation/chemical_embedding": (onehot, feat),
        "representation/pair_embedding/linear_up_src": (onehot, onehot),
        "representation/pair_embedding/linear_up_dst": (onehot, onehot),
        "representation/pair_embedding/conv_tp/linear_scaler/linear_out":
            (mid_pe.simplify(), feat),
    }
    tps: Dict[str, Tuple[Irreps, Irreps, Irreps, list]] = {
        "representation/pair_embedding/conv_tp/tensor_product":
            (onehot, sh, mid_pe, ins_pe),
    }
    fcns = {"representation/pair_embedding/conv_tp/weight_generator"}

    def add_msgpack(base: str, irreps_edge_in: Irreps):
        mid_e_l, ins_e_l = tp_out_irreps_with_instructions(irreps_edge_in, sh, feat)
        tps[f"{base}/node_tensor_product"] = (combined, sh, mid_n, ins_n)
        tps[f"{base}/edge_tensor_product"] = (irreps_edge_in, sh, mid_e_l, ins_e_l)
        linears[f"{base}/node_linear_scaler/linear_out"] = (mid_n.simplify(), feat)
        linears[f"{base}/edge_linear_scaler/linear_out"] = (mid_e_l.simplify(), feat)
        linears[f"{base}/node_linear_out"] = (feat, feat)
        linears[f"{base}/edge_linear_out"] = (feat, feat)
        fcns.add(f"{base}/node_weight_generator")
        fcns.add(f"{base}/edge_weight_generator")

    for i in range(num_layers):
        conv = f"representation/convolutions_{i}"
        linears[f"{conv}/skip_linear"] = (feat, feat)
        linears[f"{conv}/residual/linear1"] = (feat, gate_in_feat)
        linears[f"{conv}/residual/linear2"] = (gate_out_feat, feat)
        add_msgpack(f"{conv}/conv_tp", feat)
        pair = f"representation/pair_interactions_{i}"
        linears[f"{pair}/linear_up_src"] = (feat, feat)
        linears[f"{pair}/linear_up_tar"] = (feat, feat)
        if not (i == 0 and False):
            linears[f"{pair}/skip_linear"] = (feat, feat)
        add_msgpack(f"{pair}/conv_tp", feat)

    # --- output heads (HamLayer = residual + linear head) ---------------
    heads: List[Tuple[str, Irreps]] = []
    if soc_basis == "su2":
        assert irreps_ham_su2 is not None, "su2 import needs irreps_ham_su2"
        su2 = Irreps(irreps_ham_su2)
        doubled = su2 + su2
        heads += [("onsite_hamiltonian", doubled),
                  ("offsite_hamiltonian", doubled)]
    else:
        if not (soc_basis == "so3" and add_H_nonsoc):
            heads += [("onsite_hamiltonian", ham),
                      ("offsite_hamiltonian", ham)]
        if soc_basis == "so3":
            assert nao_max is not None, "so3 import needs nao_max"
            ksi = Irreps(f"{nao_max * nao_max}x0e")
            heads += [("onsite_ksi", ksi), ("offsite_ksi", ksi)]
    if not ham_only:
        heads += [("onsite_overlap", ham), ("offsite_overlap", ham)]
    for head, irreps_out_head in heads:
        base = f"output/{head}"
        linears[f"{base}/residual/linear1"] = (feat, gate_in_feat)
        linears[f"{base}/residual/linear2"] = (gate_out_feat, feat)
        linears[f"{base}/head"] = (feat, irreps_out_head)

    # --- corr_products (MACE symmetric contraction) ---------------------
    feat_s = feat.simplify()
    hidden = Irreps([(num_hidden_features, ir) for _, ir in feat_s])
    if use_corr_prod:
        for i in range(num_layers):
            cp = f"representation/corr_products_{i}"
            linears[f"{cp}/linear_pre"] = (feat_s, hidden)
            linears[f"{cp}/linear_sc"] = (feat_s, feat_s)
            linears[f"{cp}/prod_linear"] = (hidden, hidden)
            linears[f"{cp}/linear_out"] = (hidden, feat_s)
    hidden_irs = [ir for _, ir in feat_s]

    # buffers in the reference state_dict that carry no parameters
    _buffer_markers = ("U_matrix_", "charge_centers", "charge_gamma",
                       "neutral_charge_attrs", ".cutoff_func.",
                       "cg_calculator", "oyzx2spin", "Us_openmx",
                       "hamiltonian_irreps_dimensions")

    # reference key -> our path renames
    def ours_path(ref_key: str) -> str:
        k = ref_key
        k = k.replace("convolutions.", "convolutions_")
        k = k.replace("pair_interactions.", "pair_interactions_")
        k = k.replace("corr_products.", "corr_products_")
        k = k.replace(".prod.linear.", ".prod_linear.")
        k = k.replace("chemical_embedding.linear", "chemical_embedding")
        k = k.replace("onsite_hamiltonian_network.", "onsite_hamiltonian.")
        k = k.replace("offsite_hamiltonian_network.", "offsite_hamiltonian.")
        k = k.replace("onsite_overlap_network.", "onsite_overlap.")
        k = k.replace("offsite_overlap_network.", "offsite_overlap.")
        k = k.replace("onsite_ksi_network.", "onsite_ksi.")
        k = k.replace("offsite_ksi_network.", "offsite_ksi.")
        k = k.replace("residual_block.", "residual.")
        k = k.replace("linear_transform", "head")
        k = k.replace("radial_basis.basis.", "radial_basis.")
        return k.replace(".", "/")

    import re as _re

    assignments: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        if any(m in key for m in _buffer_markers):
            continue
        if (soc_basis == "so3" and add_H_nonsoc and key.startswith(out_prefix)
                and "hamiltonian_network" in key):
            # present in the reference checkpoint but unused at inference:
            # under add_H_nonsoc the spatial H comes from the stage-1 model
            # (hamgnn_output.py:3028-3049)
            continue
        if key.startswith(rep_prefix):
            path = "representation/" + ours_path(key[len(rep_prefix):])
        elif key.startswith(out_prefix):
            path = "output/" + ours_path(key[len(out_prefix):])
        else:
            raise KeyError(f"unrecognized state_dict key {key!r}")

        if path.endswith("/bessel_weights"):
            assignments[path] = np.asarray(value)
            continue

        # charge-doping mlp_q (denseRegression, n_h=2, no batch norm):
        # fcs.{i}.0.{weight,bias} -> fc_{i}/{kernel,bias}; fc_out likewise.
        # torch Linear weight is (out, in) -> transpose into flax kernels.
        m = _re.search(r"/mlp_q/(?:fcs/(\d+)/0|fc_out)/(weight|bias)$", path)
        if m is not None:
            layer = "fc_out" if m.group(1) is None else f"fc_{m.group(1)}"
            base = path[: m.start()] + "/mlp_q/" + layer
            if m.group(2) == "weight":
                assignments[base + "/kernel"] = np.asarray(value).T
            else:
                assignments[base + "/bias"] = np.asarray(value)
            continue

        # MACE symmetric-contraction weights:
        # .../prod/symmetric_contractions/contractions/{j}/weights_max -> the
        # nu=correlation tensor of contraction_{ir_j}; /weights/{k} -> the
        # nu=correlation-1-k tensor.  Our Contraction divides its parameter
        # by num_params at use (MACE only divides at init), so imported
        # values are multiplied by num_params.
        m = _re.search(r"/prod/symmetric_contractions/contractions/(\d+)/"
                       r"(weights_max|weights/(\d+))$", path)
        if m is not None:
            if np.asarray(value).shape[1] == 0:
                continue  # zero-path order: no matching parameter on our side
            j = int(m.group(1))
            nu = (correlation if m.group(2) == "weights_max"
                  else correlation - 1 - int(m.group(3)))
            ir_j = hidden_irs[j]
            base = path[: path.index("/prod/symmetric_contractions")]
            num_params = int(np.asarray(value).shape[1])
            assignments[f"{base}/prod/contraction_{ir_j}/w{nu}"] = (
                np.asarray(value) * num_params)
            continue

        assert path.endswith("/weight"), path
        site = path[: -len("/weight")]
        if site in linears:
            ir_in, ir_out = linears[site]
            assignments[site + "/w"] = convert_o3_linear_weight(
                value, ir_in, ir_out)
        elif site in tps:
            i1, i2, io, ins = tps[site]
            for wname, wval in split_e3nn_tp_weight(value, i1, i2, io, ins).items():
                assignments[f"{site}/{wname}"] = wval
        else:
            # FCN layer weights: site = <fcn>/layers/<i>
            parts = site.rsplit("/layers/", 1)
            if len(parts) == 2 and parts[0] in fcns:
                assignments[f"{parts[0]}/w{parts[1]}"] = np.asarray(value)
            else:
                raise KeyError(f"no mapping for reference key {key!r}")
    return assignments
