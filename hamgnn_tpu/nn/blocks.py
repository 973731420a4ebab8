"""Equivariant GNN blocks: message packing, convolution, pair interaction.

TPU-native redesign of the reference's block set
(/root/reference/hamgnn/nn/{message_passing,convolution,interaction_blocks}.py):
pure-functional flax modules over explicit arrays (no dict mutation), gather /
batched-tensor-product / segment-sum structure that XLA fuses, and static
``num_segments`` everywhere (the reference's fixed ``dim_size`` scatter,
convolution.py:147-149, is the default here).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ..e3.fused_tp import SHTensorProductExpansion
from ..e3.gate import NormActivation, make_gate
from ..e3.irreps import Irreps
from ..e3.linear import ElementwiseChannelScale, Linear
from .mlp import make_weight_generator
from .symmetric_contraction import SymmetricContraction


def segment_sum(messages, receiver, num_nodes: int):
    """Edge-to-node aggregation with static output size."""
    return jax.ops.segment_sum(messages, receiver, num_segments=num_nodes)


def fuse_src_dst(irreps: Irreps, src_feats, dst_feats):
    """Interleave src/dst features into doubled-multiplicity irreps.

    Equivalent to the reference's stack + AttentionHeadsToVector
    (message_passing.py:66-67,201-202): each (mul, ir) chunk becomes
    (2*mul, ir) = [src muls | dst muls].
    """
    chunks = []
    for sl in Irreps(irreps).slices():
        chunks.append(src_feats[..., sl])
        chunks.append(dst_feats[..., sl])
    return jnp.concatenate(chunks, axis=-1)


class ResidualBlock(fnn.Module):
    """linear -> Gate/NormActivation -> linear (+ resnet).

    Reference: interaction_blocks.py:264-358 (HamLayer variant in the output
    net shares this structure).
    """

    irreps_in: Irreps
    irreps_hidden: Irreps
    resnet: bool = True
    nonlinearity_type: str = "gate"
    nonlinearity_scalars: Tuple[str, str] = ("ssp", "tanh")
    nonlinearity_gates: Tuple[str, str] = ("ssp", "abs")

    @fnn.compact
    def __call__(self, x):
        irreps_in = Irreps(self.irreps_in)
        irreps_hidden = Irreps(self.irreps_hidden)
        if self.nonlinearity_type == "gate":
            gate, gate_in = make_gate(
                irreps_hidden, self.nonlinearity_scalars, self.nonlinearity_gates
            )
            h = Linear(irreps_in, gate_in, name="linear1")(x)
            h = gate(h)
            h = Linear(gate.irreps_out, irreps_in, name="linear2")(h)
        else:
            h = Linear(irreps_in, irreps_hidden, name="linear1")(x)
            h = NormActivation(irreps_in=irreps_hidden,
                               scalar_nonlinearity=self.nonlinearity_scalars[0])(h)
            h = Linear(irreps_hidden, irreps_in, name="linear2")(h)
        return x + h if self.resnet else h


class MessagePackBlock(fnn.Module):
    """Edge message kernel (reference message_passing.py:26-231).

    Pathways: fused (src,dst) node features (x) edge SH, and edge features (x)
    edge SH; per-edge radial weights scale each channel; both pathways pass
    through equivariant linears and are summed.
    """

    irreps_node_feats: Irreps
    irreps_edge_feats: Irreps
    irreps_local_env_edge: Irreps   # edge SH attrs
    irreps_out: Irreps
    num_edge_scalars: int           # rbf channel count
    radial_mlp: Tuple[int, ...] = (64, 64)
    use_kan: bool = False
    lite_mode: bool = False

    @fnn.compact
    def __call__(self, node_feats_src, node_feats_dst, edge_feats, local_env_edge,
                 edge_scalars):
        irreps_node = Irreps(self.irreps_node_feats)
        irreps_edge = Irreps(self.irreps_edge_feats)
        irreps_sh = Irreps(self.irreps_local_env_edge)
        irreps_out = Irreps(self.irreps_out)

        combined = Irreps([(2 * mul, ir) for mul, ir in irreps_node])
        mid_node = SHTensorProductExpansion.mid_irreps(combined, irreps_sh, irreps_out)
        mid_edge = SHTensorProductExpansion.mid_irreps(irreps_edge, irreps_sh, irreps_out)

        # packed lane-dense TP -> radial scale -> linear (e3/packed_tp.py):
        # the wide mid-irreps tensors stay (k,u)-flattened on full 128-lane
        # tiles; same parameters as the chunked path, ~10x fewer XLA ops
        node_inter = fuse_src_dst(irreps_node, node_feats_src, node_feats_dst)

        if self.lite_mode:
            node_dn = Linear(mid_node.simplify(), irreps_out,
                             name="node_scaler").packed_tp_call(
                combined, irreps_sh, node_inter, local_env_edge,
                sh_needs_grad=False)
            edge_dn = Linear(mid_edge.simplify(), irreps_out,
                             name="edge_scaler").packed_tp_call(
                irreps_edge, irreps_sh, edge_feats, local_env_edge,
                sh_needs_grad=False)
            combine = ElementwiseChannelScale(
                irreps_in=irreps_out.simplify(), irreps_out=irreps_out, name="combine")
            w = make_weight_generator(
                self.num_edge_scalars, self.radial_mlp, combine.weight_numel,
                self.use_kan)(edge_scalars)
            return combine(node_dn + edge_dn, w)

        node_scaler = ElementwiseChannelScale(
            irreps_in=mid_node.simplify(), irreps_out=irreps_out, name="node_scaler")
        edge_scaler = ElementwiseChannelScale(
            irreps_in=mid_edge.simplify(), irreps_out=irreps_out, name="edge_scaler")
        node_plan = node_scaler.packed_plan(combined, irreps_sh)
        edge_plan = edge_scaler.packed_plan(irreps_edge, irreps_sh)
        # radial generators emit packed channel order directly (static column
        # permutation of their last-layer weight view): the per-group scale is
        # then one contiguous broadcast multiply
        w_node = make_weight_generator(
            self.num_edge_scalars, self.radial_mlp, node_scaler.weight_numel,
            self.use_kan, out_perm=node_plan.scale_perm)(edge_scalars)
        w_edge = make_weight_generator(
            self.num_edge_scalars, self.radial_mlp, edge_scaler.weight_numel,
            self.use_kan, out_perm=edge_plan.scale_perm)(edge_scalars)
        node_dn = node_scaler.packed_tp_call(
            combined, irreps_sh, node_inter, local_env_edge, w_node,
            weight_packed=True, sh_needs_grad=False)
        edge_dn = edge_scaler.packed_tp_call(
            irreps_edge, irreps_sh, edge_feats, local_env_edge, w_edge,
            weight_packed=True, sh_needs_grad=False)
        out = (Linear(irreps_out, irreps_out, name="node_out")(node_dn)
               + Linear(irreps_out, irreps_out, name="edge_out")(edge_dn))
        return out


class ConvBlockE3(fnn.Module):
    """Node update: skip + segment-sum of edge messages + residual.

    Reference: convolution.py:23-160.  ``gathered_call`` takes pre-gathered
    src/dst features so the halo edge partition (parallel/halo.py) can reuse
    the exact same parameters with a device-local node table.
    """

    irreps_in: Irreps
    irreps_out: Irreps
    irreps_edge_attrs: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64, 64)
    use_skip_connections: bool = True
    use_kan: bool = False
    lite_mode: bool = False

    @fnn.compact
    def gathered_call(self, node_feats_own, src_feats, dst_feats, edge_feats,
                      edge_sh, edge_scalars, dst_idx, edge_mask,
                      boundary=None):
        """``boundary``: optional comm/compute-overlap split (halo partition):
        a tuple ``(src_b, dst_b, edge_b, sh_b, scal_b, dst_idx_b, mask_b)``
        of the boundary-edge rows.  When given, ``src_feats``/``edge_mask``
        must cover the INTERIOR edges only (boundary rows masked out); the
        boundary messages are computed with the SAME MessagePackBlock
        parameters and added to the aggregate, so the math equals the joint
        call while the source-row all_to_all is consumed only here."""
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        num_nodes = node_feats_own.shape[0]

        skip = Linear(irreps_in, irreps_out, name="skip")(node_feats_own) \
            if self.use_skip_connections else None

        mpb = MessagePackBlock(
            irreps_node_feats=irreps_in,
            irreps_edge_feats=irreps_in,
            irreps_local_env_edge=Irreps(self.irreps_edge_attrs),
            irreps_out=irreps_out,
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp),
            use_kan=self.use_kan,
            lite_mode=self.lite_mode,
            name="conv_tp",
        )
        messages = mpb(src_feats, dst_feats, edge_feats, edge_sh, edge_scalars)
        messages = messages * edge_mask[:, None].astype(messages.dtype)

        agg = segment_sum(messages, dst_idx, num_nodes)
        if boundary is not None:
            src_b, dst_b, edge_b, sh_b, scal_b, dst_idx_b, mask_b = boundary
            msg_b = mpb(src_b, dst_b, edge_b, sh_b, scal_b)
            msg_b = msg_b * mask_b[:, None].astype(msg_b.dtype)
            agg = agg + segment_sum(msg_b, dst_idx_b, num_nodes)
        out = ResidualBlock(irreps_in=irreps_out, irreps_hidden=irreps_out,
                            name="residual")(agg)
        if skip is not None:
            out = out + skip
        return out

    def __call__(self, node_feats, edge_feats, edge_sh, edge_scalars, edge_index,
                 edge_mask):
        src, dst = edge_index[0], edge_index[1]
        return self.gathered_call(node_feats, node_feats[src], node_feats[dst],
                                  edge_feats, edge_sh, edge_scalars, dst,
                                  edge_mask)


class PairInteractionBlock(fnn.Module):
    """Edge update from lifted node features (reference interaction_blocks.py:30-164).

    setup-style so the halo edge partition can call ``lift`` (per-node
    linears, applied on owned rows before the halo exchange) and
    ``gathered_call`` (per-edge mix on pre-gathered lifted features)
    separately with the same parameter tree as ``__call__``.
    """

    irreps_node_feats: Irreps
    irreps_edge_feats: Irreps
    irreps_edge_attrs: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64, 64)
    use_skip_connections: bool = True
    use_kan: bool = False
    lite_mode: bool = False
    # reference interaction_blocks.py:156-158: old-checkpoint compat where
    # (without skip connections) edge features are NOT updated by the conv-TP
    # output.  The mix branch still runs so parameter shapes stay identical.
    legacy_edge_update: bool = False

    def setup(self):
        irreps_node = Irreps(self.irreps_node_feats)
        irreps_edge = Irreps(self.irreps_edge_feats)
        self.linear_up_src = Linear(irreps_node, irreps_node)
        self.linear_up_tar = Linear(irreps_node, irreps_node)
        self.conv_tp = MessagePackBlock(
            irreps_node_feats=irreps_node,
            irreps_edge_feats=irreps_edge,
            irreps_local_env_edge=Irreps(self.irreps_edge_attrs),
            irreps_out=irreps_edge,
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp),
            use_kan=self.use_kan,
            lite_mode=self.lite_mode,
        )
        if self.use_skip_connections:
            self.skip = Linear(irreps_edge, irreps_edge)

    def lift(self, node_feats):
        return self.linear_up_src(node_feats), self.linear_up_tar(node_feats)

    def gathered_call(self, src_lifted, dst_lifted, edge_feats, edge_sh,
                      edge_scalars, boundary=None):
        """``boundary``: optional overlap split, a tuple ``(src_b, dst_b,
        edge_b, sh_b, scal_b, pos_b, mask_b)``: when given, ``src_lifted``
        carries owned rows only (boundary rows arbitrary) and the boundary
        rows are recomputed from the halo exchange and scatter-added at
        ``pos_b`` — output identical to the joint call per edge."""
        mix = self.conv_tp(src_lifted, dst_lifted, edge_feats, edge_sh,
                           edge_scalars)
        if boundary is not None:
            src_b, dst_b, edge_b, sh_b, scal_b, pos_b, mask_b = boundary
            mix_b = self.conv_tp(src_b, dst_b, edge_b, sh_b, scal_b)
            # zero the (garbage-src) boundary rows of the main pass, then
            # scatter-add the boundary results; padded pos_b rows add zero
            keep = jnp.ones((mix.shape[0],), mix.dtype)
            keep = keep.at[pos_b].min(
                1.0 - mask_b.astype(mix.dtype))
            mix = mix * keep[:, None]
            mix = mix.at[pos_b].add(
                mix_b * mask_b[:, None].astype(mix_b.dtype))
        if self.use_skip_connections:
            return mix + self.skip(edge_feats)
        if self.legacy_edge_update:
            return edge_feats
        return mix

    def __call__(self, node_feats, edge_feats, edge_sh, edge_scalars, edge_index):
        src, dst = edge_index[0], edge_index[1]
        up_src, up_dst = self.lift(node_feats)
        return self.gathered_call(up_src[src], up_dst[dst], edge_feats, edge_sh,
                                  edge_scalars)


class PairInteractionEmbeddingBlock(fnn.Module):
    """Initial edge features: TP of (lin(src)+lin(dst)) with edge SH, channel-
    scaled by radial weights (reference embeddings.py:215-337)."""

    irreps_node_feats: Irreps       # node attr irreps (one-hot scalars)
    irreps_edge_feats: Irreps       # output edge feature irreps
    irreps_edge_attrs: Irreps       # SH irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64, 64)
    use_kan: bool = False
    lite_mode: bool = False

    @fnn.compact
    def __call__(self, node_feats, edge_sh, edge_scalars, edge_index):
        """``node_feats`` is (N, D) with ``edge_index`` for the dense path, or
        a pre-gathered ``(src_rows, dst_rows)`` pair of (E, D) arrays with
        ``edge_index=None`` (halo edge partition: the lift linears commute
        with the gather, so parameters and math are identical)."""
        irreps_node = Irreps(self.irreps_node_feats)
        irreps_out = Irreps(self.irreps_edge_feats)
        irreps_sh = Irreps(self.irreps_edge_attrs)

        lin_src = Linear(irreps_node, irreps_node, name="linear_up_src")
        lin_dst = Linear(irreps_node, irreps_node, name="linear_up_dst")
        if edge_index is None:
            src_rows, dst_rows = node_feats
            x = lin_src(src_rows) + lin_dst(dst_rows)
        else:
            src, dst = edge_index[0], edge_index[1]
            up_src = lin_src(node_feats)
            up_dst = lin_dst(node_feats)
            x = up_src[src] + up_dst[dst]

        mid = SHTensorProductExpansion.mid_irreps(irreps_node, irreps_sh, irreps_out)
        scaler = ElementwiseChannelScale(
            irreps_in=mid.simplify(), irreps_out=irreps_out, name="scaler")
        plan = scaler.packed_plan(irreps_node, irreps_sh)
        w = make_weight_generator(
            self.num_edge_scalars, self.radial_mlp, scaler.weight_numel,
            self.use_kan, out_perm=plan.scale_perm)(edge_scalars)
        return scaler.packed_tp_call(irreps_node, irreps_sh, x, edge_sh, w,
                                     weight_packed=True, sh_needs_grad=False)


class CorrProductBlock(fnn.Module):
    """Many-body node update via symmetric contraction
    (reference interaction_blocks.py:168-260)."""

    irreps_node_feats: Irreps
    num_hidden_features: int
    correlation: int
    num_elements: int
    use_skip_connections: bool = True

    @fnn.compact
    def __call__(self, node_feats, node_attrs):
        irreps_node = Irreps(self.irreps_node_feats).simplify()
        irreps_hidden = Irreps([(self.num_hidden_features, ir) for _, ir in irreps_node])
        coupling = Irreps([(1, ir) for _, ir in irreps_node])

        h = Linear(irreps_node, irreps_hidden, name="linear_pre")(node_feats)
        # reshape_irreps: (N, sum mul*dim) -> (N, channels, n_ell)
        chunks = []
        for sl, (mul, ir) in zip(irreps_hidden.slices(), irreps_hidden):
            c = h[..., sl].reshape(h.shape[:-1] + (mul, ir.dim))
            chunks.append(c)
        x = jnp.concatenate(chunks, axis=-1)

        prod = SymmetricContraction(
            coupling_irreps=repr(coupling),
            irreps_out=repr(irreps_hidden),
            correlation=self.correlation,
            num_features=self.num_hidden_features,
            num_elements=self.num_elements,
            name="prod",
        )(x, node_attrs)
        # MACE applies a linear inside EquivariantProductBasisBlock
        prod = Linear(irreps_hidden, irreps_hidden, name="prod_linear")(prod)
        out = Linear(irreps_hidden, irreps_node, name="linear_out")(prod)
        if self.use_skip_connections:
            out = out + Linear(irreps_node, irreps_node, name="linear_sc")(node_feats)
        return out


class NodePairTensorProduct(fnn.Module):
    """Exact uvu node (x) node pathway of the reference's MessagePackBlockV2
    (message_passing.py:289-311, 330-339, 404-408): an internally-weighted
    ``uvu`` tensor product of dst (x) src node features at full multiplicity,
    followed by per-edge radial channel scaling (LinearScaleWithWeights) and
    an equivariant Linear."""

    irreps_node_feats: Irreps
    irreps_out: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64)
    use_kan: bool = False

    @fnn.compact
    def __call__(self, feats_dst, feats_src, edge_scalars):
        from ..e3.tensor_product import TensorProduct, tp_out_irreps_with_instructions

        irreps = Irreps(self.irreps_node_feats)
        irreps_out = Irreps(self.irreps_out)
        mid, instructions = tp_out_irreps_with_instructions(
            irreps, irreps, irreps_out, mode="uvu")
        up = TensorProduct(
            irreps_in1=irreps, irreps_in2=irreps, irreps_out=mid,
            instructions=tuple(instructions), name="tp",
        )(feats_dst, feats_src)
        scaler = ElementwiseChannelScale(
            irreps_in=mid.simplify(), irreps_out=irreps_out, name="scaler")
        w = make_weight_generator(
            self.num_edge_scalars, self.radial_mlp, scaler.weight_numel,
            self.use_kan)(edge_scalars)
        out = scaler(up, w)
        return Linear(irreps_out, irreps_out, name="out")(out)


class MessagePackBlockV2(fnn.Module):
    """MessagePackBlock + a node (x) node tensor-product pathway
    (reference message_passing.py:234-418)."""

    irreps_node_feats: Irreps
    irreps_edge_feats: Irreps
    irreps_local_env_edge: Irreps
    irreps_out: Irreps
    num_edge_scalars: int
    radial_mlp: Tuple[int, ...] = (64, 64)
    use_kan: bool = False

    @fnn.compact
    def __call__(self, node_feats_src, node_feats_dst, edge_feats,
                 local_env_edge, edge_scalars):
        base = MessagePackBlock(
            irreps_node_feats=Irreps(self.irreps_node_feats),
            irreps_edge_feats=Irreps(self.irreps_edge_feats),
            irreps_local_env_edge=Irreps(self.irreps_local_env_edge),
            irreps_out=Irreps(self.irreps_out),
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp),
            use_kan=self.use_kan,
            name="base",
        )(node_feats_src, node_feats_dst, edge_feats, local_env_edge,
          edge_scalars)
        nn_path = NodePairTensorProduct(
            irreps_node_feats=Irreps(self.irreps_node_feats),
            irreps_out=Irreps(self.irreps_out),
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp),
            use_kan=self.use_kan,
            name="node_node",
        )(node_feats_dst, node_feats_src, edge_scalars)
        return base + nn_path
