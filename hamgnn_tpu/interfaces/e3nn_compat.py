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

    @fnn.compact
    def __call__(self, graph):
        from ..e3.spherical import spherical_harmonics

        irreps_sh = Irreps(self.irreps_edge_sh)
        irreps_feat = Irreps(self.irreps_node_features)
        irreps_onehot = Irreps(f"{self.num_types}x0e")
        sh_ls = [ir.l for _, ir in irreps_sh]

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
                        ) -> Dict[str, np.ndarray]:
    """Reference Lightning ``state_dict`` -> flat assignments for a
    {"representation": HamGNNConvE3Compat, "output": HamGNNPlusPlusOut-heads}
    parameter tree (paths "/"-joined for
    :func:`hamgnn_tpu.interfaces.torch_ckpt.assign_params`).

    Covers every parameter of the non-SOC HamGNNConvE3 + Hamiltonian-head
    stack: o3.Linear (reindexed), TP internal weights (per-instruction split),
    radial FCNs (copied), Bessel frequencies.  Raises KeyError for any
    reference key it does not understand, so coverage failures are loud.
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

    for head in ("onsite_hamiltonian", "offsite_hamiltonian"):
        base = f"output/{head}"
        linears[f"{base}/residual/linear1"] = (feat, gate_in_feat)
        linears[f"{base}/residual/linear2"] = (gate_out_feat, feat)
        linears[f"{base}/head"] = (feat, ham)

    # reference key -> our path renames
    def ours_path(ref_key: str) -> str:
        k = ref_key
        k = k.replace("convolutions.", "convolutions_")
        k = k.replace("pair_interactions.", "pair_interactions_")
        k = k.replace("chemical_embedding.linear", "chemical_embedding")
        k = k.replace("onsite_hamiltonian_network.", "onsite_hamiltonian.")
        k = k.replace("offsite_hamiltonian_network.", "offsite_hamiltonian.")
        k = k.replace("residual_block.", "residual.")
        k = k.replace("linear_transform", "head")
        k = k.replace("radial_basis.basis.", "radial_basis.")
        return k.replace(".", "/")

    assignments: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        if key.startswith(rep_prefix):
            path = "representation/" + ours_path(key[len(rep_prefix):])
        elif key.startswith(out_prefix):
            path = "output/" + ours_path(key[len(out_prefix):])
        else:
            raise KeyError(f"unrecognized state_dict key {key!r}")

        if path.endswith("/bessel_weights"):
            assignments[path] = np.asarray(value)
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
