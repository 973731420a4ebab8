"""Equivariant graph attention (TPU-native).

Reimplements the reference's attention stack
(/root/reference/hamgnn/nn/attention.py, attention_utils.py): multi-head
irreps head split, dot-product edge logits, cutoff-weighted edge softmax over
destination nodes, and scatter aggregation — expressed with masked segment ops
(padded edges contribute zero attention).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..e3.irreps import Irreps
from ..e3.linear import Linear
from .blocks import MessagePackBlock, ResidualBlock
from ..nn.radial import SoftUnitStepCutoff


def heads_irreps(irreps: Irreps, num_heads: int) -> Irreps:
    """Per-head irreps: multiplicities divided by num_heads
    (reference scale_irreps(irreps, 1/num_heads))."""
    return Irreps([(max(1, int(mul / num_heads)), ir) for mul, ir in Irreps(irreps)])


def split_heads(x, irreps: Irreps, num_heads: int):
    """(N, irreps.dim) -> (N, H, head_dim): per chunk reshape then concat
    (reference VectorToAttentionHeads)."""
    irreps = Irreps(irreps)
    pieces = []
    for sl, (mul, ir) in zip(irreps.slices(), irreps):
        c = x[..., sl].reshape(x.shape[:-1] + (num_heads, (mul // num_heads) * ir.dim))
        pieces.append(c)
    return jnp.concatenate(pieces, axis=-1)


def merge_heads(x, head_irreps: Irreps):
    """(N, H, head_dim) -> (N, H*head_dim) per-chunk (reference
    AttentionHeadsToVector)."""
    head_irreps = Irreps(head_irreps)
    pieces = []
    ofs = 0
    n, h, _ = x.shape
    for mul, ir in head_irreps:
        d = mul * ir.dim
        pieces.append(x[:, :, ofs : ofs + d].reshape(n, h * d))
        ofs += d
    return jnp.concatenate(pieces, axis=-1)


def edge_softmax(logits, dst, num_nodes: int, edge_mask=None):
    """Numerically-stable segment softmax of per-edge logits over dst."""
    if edge_mask is not None:
        logits = jnp.where(edge_mask[:, None] if logits.ndim == 2 else edge_mask,
                           logits, -1e9)
    seg_max = jax.ops.segment_max(logits, dst, num_segments=num_nodes)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(logits - seg_max[dst])
    if edge_mask is not None:
        ex = ex * (edge_mask[:, None] if ex.ndim == 2 else edge_mask)
    denom = jax.ops.segment_sum(ex, dst, num_segments=num_nodes)
    return ex / jnp.maximum(denom[dst], 1e-12)


class AttentionBlockE3(fnn.Module):
    """Node update via multi-head equivariant attention
    (reference attention.py:167-358)."""

    irreps_in: Irreps
    irreps_out: Irreps
    irreps_edge_attrs: Irreps
    num_edge_scalars: int
    num_heads: int = 4
    max_radius: float = 6.0
    radial_mlp: Tuple[int, ...] = (64, 64, 64)
    use_skip_connections: bool = True
    use_kan: bool = False

    @fnn.compact
    def gathered_call(self, node_feats_own, gather_src, gather_dst, edge_feats,
                      edge_sh, edge_scalars, edge_len, dst_idx, edge_mask):
        """Core with injected endpoint gathers: the attention softmax and
        aggregation segment over ``dst_idx``, which is shard-local under the
        dst-owned halo edge partition (parallel/halo.py) — so the same
        parameters/math run dense and partitioned."""
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        num_nodes = node_feats_own.shape[0]

        sc = Linear(irreps_in, irreps_out, name="skip")(node_feats_own) \
            if self.use_skip_connections else None

        # per-node linears run on owned rows; the gather commutes with them
        key = gather_src(Linear(irreps_in, irreps_in,
                                name="linear_key")(node_feats_own))
        query = gather_dst(Linear(irreps_in, irreps_in,
                                  name="linear_key2")(node_feats_own))

        value = MessagePackBlock(
            irreps_node_feats=irreps_in,
            irreps_edge_feats=irreps_in,
            irreps_local_env_edge=Irreps(self.irreps_edge_attrs),
            irreps_out=irreps_in,
            num_edge_scalars=self.num_edge_scalars,
            radial_mlp=tuple(self.radial_mlp),
            use_kan=self.use_kan,
            name="conv_tp_value",
        )(
            gather_src(Linear(irreps_in, irreps_in,
                              name="linear_up_src")(node_feats_own)),
            gather_dst(Linear(irreps_in, irreps_in,
                              name="linear_up_tar")(node_feats_own)),
            Linear(irreps_in, irreps_in, name="linear_up_edge")(edge_feats),
            edge_sh, edge_scalars,
        )

        h_irreps = heads_irreps(irreps_in, self.num_heads)
        k_h = split_heads(key, irreps_in, self.num_heads)
        q_h = split_heads(query, irreps_in, self.num_heads)
        v_h = split_heads(value, irreps_in, self.num_heads)

        logits = jnp.sum(q_h * k_h, axis=-1)  # (E, H)
        cutoff = SoftUnitStepCutoff(cutoff=self.max_radius, name="cutoff")(edge_len)
        logits = cutoff[:, None] * logits
        logits = logits / math.sqrt(h_irreps.dim)
        w = edge_softmax(logits, dst_idx, num_nodes, edge_mask)  # (E, H)

        agg = jax.ops.segment_sum(w[:, :, None] * v_h, dst_idx,
                                  num_segments=num_nodes)
        out = merge_heads(agg, h_irreps)

        out = ResidualBlock(irreps_in=irreps_in, irreps_hidden=irreps_out,
                            name="residual")(out)
        if sc is not None:
            out = out + sc
        return out

    def __call__(self, node_feats, edge_feats, edge_sh, edge_scalars, edge_len,
                 edge_index, edge_mask):
        src, dst = edge_index[0], edge_index[1]
        return self.gathered_call(
            node_feats, lambda rows: rows[src], lambda rows: rows[dst],
            edge_feats, edge_sh, edge_scalars, edge_len, dst, edge_mask)
