"""HamGNNConvE3 — the E(3)-equivariant representation network, TPU-native.

Mirrors the reference stack (/root/reference/hamgnn/models/hamgnn_conv.py:88-284):
one-hot / charge-doped embedding -> edge spherical harmonics -> RBF x cosine
cutoff -> pair-interaction edge embedding -> atomwise chemical embedding ->
num_layers x (ConvBlockE3 [-> CorrProductBlock] -> PairInteractionBlock).

Differences by design (TPU):
  * pure-functional over a padded :class:`hamgnn_tpu.data.graph.Graph`;
  * jax.checkpoint (remat) instead of the clone-based torch checkpoint wrapper
    (hamgnn_conv.py:40-85) — layers are pure, so no cloning is needed;
  * static shapes; padded edges are masked inside ConvBlock aggregation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ..data.graph import Graph
from ..e3.irreps import Irreps
from ..e3.linear import Linear
from ..e3.spherical import spherical_harmonics
from ..nn.blocks import (
    ConvBlockE3,
    CorrProductBlock,
    PairInteractionBlock,
    PairInteractionEmbeddingBlock,
)
from ..nn.mlp import FullyConnectedNet
from ..nn.radial import RBF_REGISTRY, cosine_cutoff, polynomial_envelope


class ChargeDopedOneHot(fnn.Module):
    """One-hot(z) with optional Gaussian-smeared doping-charge residual
    (reference toolbox/nequip/nn/embedding/_embedding_block.py:56-137)."""

    num_types: int
    apply_charge_doping: bool = False
    num_charge_attr_feas: int = 8

    @fnn.compact
    def __call__(self, z, doping_charge_per_node=None):
        one_hot = jax.nn.one_hot(z, self.num_types, dtype=jnp.float32)
        if not self.apply_charge_doping:
            return one_hot
        cmin, cmax = -8.0, 8.0
        n = self.num_charge_attr_feas
        width = (cmax - cmin) / (n - 1) if n > 1 else 1.0
        centers = jnp.linspace(cmin, cmax, n)
        gamma = 1.0 / width**2

        def smear(q):
            d = jnp.clip(q, cmin, cmax)[..., None] - centers
            return jnp.exp(-gamma * d * d)

        mlp = FullyConnectedNet(hs=(n, n, n, self.num_types), act_name="silu")
        q_attr = smear(doping_charge_per_node)
        neutral = smear(jnp.zeros_like(doping_charge_per_node))
        return one_hot + mlp(q_attr) - mlp(neutral)


class HamGNNConvE3(fnn.Module):
    """Representation network producing {node_attr, edge_attr} irreps features."""

    num_types: int = 96
    irreps_edge_sh: str = "0e + 1o + 2e + 3o + 4e + 5o"
    irreps_node_features: str = "64x0e+32x1o+16x2e"
    num_layers: int = 3
    num_radial: int = 64
    rbf_func: str = "bessel"
    cutoff: float = 26.0
    cutoff_func: str = "cos"   # 'cos' | 'pol' (reference cutoff_functions.py)
    radial_mlp: Tuple[int, ...] = (64, 64)
    use_corr_prod: bool = False
    correlation: int = 2
    num_hidden_features: int = 16
    use_kan: bool = False
    lite_mode: bool = False
    apply_charge_doping: bool = False
    num_charge_attr_feas: int = 8
    use_gradient_checkpointing: bool = False
    # old-checkpoint compat (reference hamgnn_conv.py:113-114, 228-230):
    # layer 0's edge update gets no skip connection and leaves edge features
    # untouched (interaction_blocks.py:156-158)
    legacy_edge_update: bool = False

    def __call__(self, graph: Graph):
        from .view import as_view

        return self.forward_view(as_view(graph))

    @fnn.compact
    def forward_view(self, view):
        """Shared forward over a :class:`hamgnn_tpu.models.view.GraphView`.

        Single-device ``__call__`` wraps the Graph in a dense view; the halo
        edge partition (parallel/halo_model.py) builds a shard-local view
        with all_to_all gather hooks and calls this method directly — one
        forward, no duplicated plumbing.
        """
        irreps_sh = Irreps(self.irreps_edge_sh)
        irreps_feat = Irreps(self.irreps_node_features)
        irreps_onehot = Irreps(f"{self.num_types}x0e")
        sh_ls = [ir.l for _, ir in irreps_sh]

        # --- embeddings -------------------------------------------------
        # one shared embedding module evaluated at own/src/dst atoms: a
        # per-node function of (z, q), so endpoint features need no exchange
        emb = ChargeDopedOneHot(
            num_types=self.num_types,
            apply_charge_doping=self.apply_charge_doping,
            num_charge_attr_feas=self.num_charge_attr_feas,
            name="atomic_embedding",
        )
        node_attrs = emb(view.z, view.doping_own)
        onehot_src = emb(view.z_src, view.doping_src)
        onehot_dst = emb(view.z_dst, view.doping_dst)

        edge_vec = view.edge_vec
        edge_len = jnp.sqrt(jnp.sum(edge_vec * edge_vec, axis=-1))
        edge_len = jnp.where(view.edge_mask, edge_len, 1.0)  # avoid 0-length pads
        edge_sh = spherical_harmonics(sh_ls, edge_vec, normalize=True)

        rbf = RBF_REGISTRY[self.rbf_func](self.num_radial, self.cutoff)(edge_len)
        cut = (polynomial_envelope(edge_len, self.cutoff)
               if self.cutoff_func.lower().startswith("pol")
               else cosine_cutoff(edge_len, self.cutoff))
        edge_scalars = rbf * cut[:, None]

        edge_feats = PairInteractionEmbeddingBlock(
            irreps_node_feats=irreps_onehot,
            irreps_edge_feats=irreps_feat,
            irreps_edge_attrs=irreps_sh,
            num_edge_scalars=self.num_radial,
            radial_mlp=tuple(self.radial_mlp),
            use_kan=self.use_kan,
            lite_mode=self.lite_mode,
            name="pair_embedding",
        )((onehot_src, onehot_dst), edge_sh, edge_scalars, None)

        node_feats = Linear(irreps_onehot, irreps_feat, name="chemical_embedding")(node_attrs)

        # --- interaction layers ----------------------------------------
        # jax remat replaces the reference's clone-based checkpoint wrapper
        # (hamgnn_conv.py:40-85) — blocks are pure functions here.
        ckpt = self.use_gradient_checkpointing
        Conv = (fnn.remat(ConvBlockE3, methods=("gathered_call",))
                if ckpt else ConvBlockE3)
        Corr = fnn.remat(CorrProductBlock) if ckpt else CorrProductBlock
        Pair = (fnn.remat(PairInteractionBlock,
                          methods=("lift", "gathered_call"))
                if ckpt else PairInteractionBlock)
        for i in range(self.num_layers):
            conv = Conv(
                irreps_in=irreps_feat,
                irreps_out=irreps_feat,
                irreps_edge_attrs=irreps_sh,
                num_edge_scalars=self.num_radial,
                radial_mlp=tuple(self.radial_mlp),
                use_skip_connections=True,
                use_kan=self.use_kan,
                lite_mode=self.lite_mode,
                name=f"conv_{i}",
            )
            corr = (
                Corr(
                    irreps_node_feats=irreps_feat,
                    num_hidden_features=self.num_hidden_features,
                    correlation=self.correlation,
                    num_elements=self.num_types,
                    use_skip_connections=True,
                    name=f"corr_{i}",
                )
                if self.use_corr_prod
                else None
            )
            pair = Pair(
                irreps_node_feats=irreps_feat,
                irreps_edge_feats=irreps_feat,
                irreps_edge_attrs=irreps_sh,
                num_edge_scalars=self.num_radial,
                radial_mlp=tuple(self.radial_mlp),
                use_skip_connections=(
                    (i > 0) if self.legacy_edge_update else True),
                use_kan=self.use_kan,
                lite_mode=self.lite_mode,
                legacy_edge_update=self.legacy_edge_update,
                name=f"pair_{i}",
            )

            overlap = view.boundary_pos is not None
            if overlap:
                # comm/compute overlap (SURVEY §5): issue the source-row
                # all_to_all first; its result feeds ONLY the small
                # boundary-edge pass, so the interior contraction runs while
                # the exchange is in flight (XLA latency-hiding scheduler).
                b_pos, b_mask = view.boundary_pos, view.boundary_mask
                halo_tab = view.halo_rows(node_feats)
                dst_rows = view.gather_dst(node_feats)
                boundary = (halo_tab[view.src_halo_pos], dst_rows[b_pos],
                            edge_feats[b_pos], edge_sh[b_pos],
                            edge_scalars[b_pos], view.dst_index[b_pos],
                            b_mask)
                node_feats = conv.gathered_call(
                    node_feats, view.gather_src_interior(node_feats),
                    dst_rows, edge_feats, edge_sh, edge_scalars,
                    view.dst_index, view.interior_mask, boundary)
            else:
                node_feats = conv.gathered_call(
                    node_feats, view.gather_src(node_feats),
                    view.gather_dst(node_feats), edge_feats, edge_sh,
                    edge_scalars, view.dst_index, view.edge_mask)
            if corr is not None:
                node_feats = corr(node_feats, node_attrs)
            up_src, up_dst = pair.lift(node_feats)
            if overlap:
                halo_tab2 = view.halo_rows(up_src)
                up_dst_rows = view.gather_dst(up_dst)
                boundary2 = (halo_tab2[view.src_halo_pos], up_dst_rows[b_pos],
                             edge_feats[b_pos], edge_sh[b_pos],
                             edge_scalars[b_pos], b_pos, b_mask)
                edge_feats = pair.gathered_call(
                    view.gather_src_interior(up_src), up_dst_rows,
                    edge_feats, edge_sh, edge_scalars, boundary2)
            else:
                edge_feats = pair.gathered_call(
                    view.gather_src(up_src), view.gather_dst(up_dst),
                    edge_feats, edge_sh, edge_scalars)

        return {"node_attr": node_feats, "edge_attr": edge_feats}


class HamGNNTransformer(fnn.Module):
    """Attention-based representation net (reference hamgnn_transformer.py:36-174):
    same embedding frontend, layers = AttentionBlockE3 -> CorrProductBlock ->
    PairInteractionBlock (CorrProduct always on)."""

    num_types: int = 96
    irreps_edge_sh: str = "0e + 1o + 2e + 3o + 4e + 5o"
    irreps_node_features: str = "64x0e+32x1o+16x2e"
    num_layers: int = 3
    num_radial: int = 64
    rbf_func: str = "bessel"
    cutoff: float = 26.0
    cutoff_func: str = "cos"   # 'cos' | 'pol' (reference cutoff_functions.py)
    radial_mlp: Tuple[int, ...] = (64, 64)
    num_heads: int = 4
    correlation: int = 2
    num_hidden_features: int = 16
    use_kan: bool = False
    apply_charge_doping: bool = False
    num_charge_attr_feas: int = 8

    def __call__(self, graph: Graph):
        from .view import as_view

        return self.forward_view(as_view(graph))

    @fnn.compact
    def forward_view(self, view):
        """Shared forward over a GraphView (see HamGNNConvE3.forward_view):
        the attention softmax/aggregation segment over the view's local dst
        index, which the dst-owned halo partition keeps shard-local."""
        from ..nn.attention import AttentionBlockE3

        irreps_sh = Irreps(self.irreps_edge_sh)
        irreps_feat = Irreps(self.irreps_node_features)
        irreps_onehot = Irreps(f"{self.num_types}x0e")
        sh_ls = [ir.l for _, ir in irreps_sh]

        emb = ChargeDopedOneHot(
            num_types=self.num_types,
            apply_charge_doping=self.apply_charge_doping,
            num_charge_attr_feas=self.num_charge_attr_feas,
            name="atomic_embedding",
        )
        node_attrs = emb(view.z, view.doping_own)
        onehot_src = emb(view.z_src, view.doping_src)
        onehot_dst = emb(view.z_dst, view.doping_dst)

        edge_vec = view.edge_vec
        edge_len = jnp.sqrt(jnp.sum(edge_vec * edge_vec, axis=-1))
        edge_len = jnp.where(view.edge_mask, edge_len, 1.0)
        edge_sh = spherical_harmonics(sh_ls, edge_vec, normalize=True)
        rbf = RBF_REGISTRY[self.rbf_func](self.num_radial, self.cutoff)(edge_len)
        cut = (polynomial_envelope(edge_len, self.cutoff)
               if self.cutoff_func.lower().startswith("pol")
               else cosine_cutoff(edge_len, self.cutoff))
        edge_scalars = rbf * cut[:, None]

        edge_feats = PairInteractionEmbeddingBlock(
            irreps_node_feats=irreps_onehot,
            irreps_edge_feats=irreps_feat,
            irreps_edge_attrs=irreps_sh,
            num_edge_scalars=self.num_radial,
            radial_mlp=tuple(self.radial_mlp),
            use_kan=self.use_kan,
            name="pair_embedding",
        )((onehot_src, onehot_dst), edge_sh, edge_scalars, None)
        node_feats = Linear(irreps_onehot, irreps_feat, name="chemical_embedding")(node_attrs)

        for i in range(self.num_layers):
            att = AttentionBlockE3(
                irreps_in=irreps_feat,
                irreps_out=irreps_feat,
                irreps_edge_attrs=irreps_sh,
                num_edge_scalars=self.num_radial,
                num_heads=self.num_heads,
                max_radius=self.cutoff,
                radial_mlp=tuple(self.radial_mlp),
                use_kan=self.use_kan,
                name=f"orb_transformer_{i}",
            )
            node_feats = att.gathered_call(
                node_feats, view.gather_src, view.gather_dst, edge_feats,
                edge_sh, edge_scalars, edge_len, view.dst_index,
                view.edge_mask)
            node_feats = CorrProductBlock(
                irreps_node_feats=irreps_feat,
                num_hidden_features=self.num_hidden_features,
                correlation=self.correlation,
                num_elements=self.num_types,
                use_skip_connections=True,
                name=f"corr_{i}",
            )(node_feats, node_attrs)
            pair = PairInteractionBlock(
                irreps_node_feats=irreps_feat,
                irreps_edge_feats=irreps_feat,
                irreps_edge_attrs=irreps_sh,
                num_edge_scalars=self.num_radial,
                radial_mlp=tuple(self.radial_mlp),
                use_kan=self.use_kan,
                name=f"pair_{i}",
            )
            up_src, up_dst = pair.lift(node_feats)
            edge_feats = pair.gathered_call(
                view.gather_src(up_src), view.gather_dst(up_dst),
                edge_feats, edge_sh, edge_scalars)

        return {"node_attr": node_feats, "edge_attr": edge_feats}


class ElectronConfigurationEmbedding(fnn.Module):
    """Z -> feature embedding combining a learned per-element table with a
    linear map of the (scaled) electron configuration (reference
    nn/embeddings.py:344-360 ``Embedding``)."""

    num_features: int
    zmax: int = 87

    @fnn.compact
    def __call__(self, z):
        import numpy as _np

        from ..nn.electron_configurations import electron_configurations

        table = jnp.asarray(_np.asarray(electron_configurations, _np.float32))
        elem = self.param(
            "element_embedding",
            fnn.initializers.uniform(scale=2 * _np.sqrt(3)),
            (self.zmax, self.num_features))
        elem = elem - _np.sqrt(3)  # uniform(-sqrt3, sqrt3) like the reference
        w = self.param("config_linear",
                       fnn.initializers.orthogonal(), (table.shape[1], self.num_features))
        emb = elem + table @ w
        return emb[z]
