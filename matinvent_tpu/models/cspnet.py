"""CSPNet: periodic-graph EGNN score network, re-designed for TPU.

Capability parity with /root/reference/models/diffcsp/cspnet.py:94-294
(CSPNet/CSPLayer/SinusoidsEmbedding), restructured TPU-first:

* Edges are the **dense fully-connected graph per crystal** as a masked
  ``[B, A, A, ...]`` tensor — this matches the reference's default
  ``edge_style='fc'`` semantics (block-diag ones incl. self-loops,
  cspnet.py:238-242) while avoiding ragged gather/scatter entirely; all
  aggregation is a masked mean the XLA fuses into the surrounding matmuls.
* The first edge-MLP layer is algebraically decomposed: for input
  ``concat(h_i, h_j, lattice_ip, dist_emb)`` the matmul splits into two
  ``[B, A, H]`` node terms (broadcast over the other atom axis), one ``[B, H]``
  lattice term and a single true ``[B, A, A, E]`` matmul over the distance
  embedding — >4x FLOP reduction on the dominant op with bit-identical math.
  The parameter layout stays a single fused kernel, so torch checkpoints map
  1:1.
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from matinvent_tpu.models.batch import MAX_ATOMIC_NUM
from matinvent_tpu.ops.segment import masked_mean


def sinusoids_embedding(x: jax.Array, n_frequencies: int = 10) -> jax.Array:
    """Fourier embedding of periodic offsets (cspnet.py:12-24 parity).

    Args:
        x: ``[..., n_space]`` periodic differences.
    Returns:
        ``[..., n_frequencies * 2 * n_space]`` with layout
        ``concat(sin(x ⊗ f), cos(x ⊗ f))`` where the inner reshape is
        space-major (matching the reference's ``.reshape(-1, F * S)``).
    """
    freqs = 2 * math.pi * jnp.arange(n_frequencies, dtype=x.dtype)
    emb = x[..., None] * freqs  # [..., S, F]
    emb = emb.reshape(*x.shape[:-1], x.shape[-1] * n_frequencies)
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class _DenseParams(nn.Module):
    """Parameter-only twin of ``nn.Dense`` (same scope/param names), so the
    fused-kernel path can hand the raw kernel/bias to Pallas while staying
    checkpoint-compatible with the XLA path's ``nn.Dense``."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class CSPLayer(nn.Module):
    """One message-passing layer over the dense masked edge tensor."""

    hidden_dim: int = 128
    num_freqs: int = 10
    use_dis_emb: bool = True
    ln: bool = False
    ip: bool = True
    dtype: object = jnp.float32  # activation/compute dtype; params stay f32
    # Fuse the whole edge branch (Fourier emb -> edge_mlp_0 -> silu ->
    # edge_mlp_1 -> silu -> masked mean) into one Pallas kernel — fc edges
    # only (separable mask); used by the sampling nets, never under grad.
    fused_edge: bool = False

    @nn.compact
    def __call__(
        self,
        node_features: jax.Array,  # [B, A, H]
        frac_diff: jax.Array,  # [B, A, A, 3]  (x_j - x_i) mod 1
        lattice: jax.Array,  # [B, 3, 3]
        edge_mask: jax.Array,  # [B, A, A] bool: j is a neighbor of i
        denom: jax.Array,  # [B, A] aggregation denominator per node
        dist_emb: jax.Array | None = None,  # precomputed edge features
        frac_coords: jax.Array | None = None,  # [B, A, 3] (fused path)
        mask: jax.Array | None = None,  # [B, A] atom mask (fused path)
    ) -> jax.Array:
        H = self.hidden_dim
        dis_dim = self.num_freqs * 2 * 3 if self.use_dis_emb else 3
        node_input = node_features
        if self.ln:
            node_features = nn.LayerNorm(name="layer_norm", dtype=self.dtype)(node_features)
        node_features = node_features.astype(self.dtype)

        # periodic Fourier features in f32 (bf16 coords are too coarse for
        # high-frequency phases), cast afterwards for the MXU matmul.
        # ``dist_emb`` lets the caller hoist this out of the layer loop:
        # frac_diff is layer-independent, but XLA does NOT CSE the sin/cos
        # chain across layers (measured on v5e: 1.27e9 transcendentals/step
        # at the bench operating point = per-layer recompute, plus an f32
        # [E, 60] materialization per layer ~30% of the step's HBM bytes) —
        # bit-identical math, computed once per net eval instead of once per
        # layer (experiments/results/profile_step_r4.json).
        fused = (
            self.fused_edge
            and self.use_dis_emb
            and frac_coords is not None
            and mask is not None
        )
        if fused:
            dist = None  # computed in-register inside the kernel
        elif dist_emb is not None:
            dist = dist_emb.astype(self.dtype)
        elif self.use_dis_emb:
            dist = sinusoids_embedding(
                frac_diff.astype(jnp.float32), self.num_freqs
            ).astype(self.dtype)
        else:
            dist = frac_diff.astype(self.dtype)

        if self.ip:
            lattice_ips = jnp.einsum(
                "bij,bkj->bik", lattice, lattice, precision=jax.lax.Precision.HIGHEST
            )
        else:
            lattice_ips = lattice
        lattice_flat = lattice_ips.reshape(-1, 9)  # [B, 9]

        # Fused first edge-MLP kernel over concat(h_i, h_j, lat9, dist); stored
        # as one parameter for checkpoint parity, applied decomposed.
        in_dim = 2 * H + 9 + dis_dim
        w = self.param(
            "edge_mlp_0_kernel",
            nn.initializers.lecun_normal(),
            (in_dim, H),
            jnp.float32,
        )
        b = self.param("edge_mlp_0_bias", nn.initializers.zeros, (H,), jnp.float32)
        w = w.astype(self.dtype)
        b = b.astype(self.dtype)
        lattice_flat = lattice_flat.astype(self.dtype)
        w_i, w_j, w_l, w_d = jnp.split(w, [H, 2 * H, 2 * H + 9], axis=0)
        term_i = node_features @ w_i  # [B, A, H] -> broadcast over j
        term_j = node_features @ w_j  # [B, A, H] -> broadcast over i
        term_l = lattice_flat @ w_l  # [B, H]
        if fused:
            # the whole edge branch in one Pallas kernel: the [E, H]
            # intermediates never touch HBM (see ops/fused_edge.py). Param
            # names match the nn.Dense of the XLA path 1:1.
            from matinvent_tpu.ops.fused_edge import fused_edge_chain

            w1, b1 = _DenseParams(
                in_features=H, features=H, name="edge_mlp_1"
            )()
            inv_denom = (
                mask.astype(jnp.float32) / jnp.maximum(denom, 1.0)
            )[..., None]
            agg = fused_edge_chain(
                term_i + (term_l + b)[:, None, :],
                term_j,
                frac_coords,
                inv_denom,
                mask.astype(jnp.float32)[..., None],
                w_d,
                w1,
                b1,
                num_freqs=self.num_freqs,
            )
        else:
            term_d = dist @ w_d  # [B, A, A, H] (the only true edge matmul)
            edge = (
                term_i[:, :, None, :]
                + term_j[:, None, :, :]
                + term_l[:, None, None, :]
                + term_d
                + b
            )
            edge = nn.silu(edge)
            edge = nn.silu(nn.Dense(H, name="edge_mlp_1", dtype=self.dtype)(edge))

            # Aggregate at node i over its neighbors j (scatter-mean parity:
            # for fc edges denom = num_atoms incl. the self-loop; for knn
            # edges denom = per-node neighbor count). A mask-weighted
            # dot_general formulation was A/B'd on v5e and is time-identical
            # (XLA already fuses this mask+reduce into the edge MLP's
            # consumer chain) — keep the simpler masked sum.
            edge = edge * edge_mask[..., None].astype(edge.dtype)
            agg = jnp.sum(edge, axis=2) / jnp.maximum(denom, 1.0).astype(
                edge.dtype
            )[:, :, None]

        out = jnp.concatenate([node_features, agg], axis=-1)
        out = nn.silu(nn.Dense(H, name="node_mlp_0", dtype=self.dtype)(out))
        out = nn.silu(nn.Dense(H, name="node_mlp_1", dtype=self.dtype)(out))
        return node_input + out.astype(node_input.dtype)


class CSPNet(nn.Module):
    """Joint lattice/coord/type score network (cspnet.py:94-294 parity)."""

    hidden_dim: int = 128
    latent_dim: int = 256
    num_layers: int = 4
    max_atoms: int = MAX_ATOMIC_NUM  # type vocabulary size
    num_freqs: int = 10
    use_dis_emb: bool = True
    ln: bool = False
    ip: bool = True
    smooth: bool = True  # diffusion uses relaxed one-hot "probs" inputs
    pred_type: bool = True
    pred_scalar: bool = False
    dtype: object = jnp.float32  # activation/compute dtype; params stay f32
    edge_style: str = "fc"  # 'fc' (dense per-crystal) or 'knn' (PBC radius+rank)
    cutoff: float = 6.0
    max_neighbors: int = 20

    @nn.compact
    def __call__(
        self,
        t_emb: jax.Array,  # [B, latent_dim]
        atom_feats: jax.Array,  # [B, A, K] probs (smooth) or [B, A] int types
        frac_coords: jax.Array,  # [B, A, 3]
        lattice: jax.Array,  # [B, 3, 3]
        num_atoms: jax.Array,  # [B]
        mask: jax.Array,  # [B, A]
    ):
        if self.smooth:
            node = nn.Dense(self.hidden_dim, name="node_embedding", dtype=self.dtype)(
                atom_feats
            )
        else:
            node = nn.Embed(
                self.max_atoms, self.hidden_dim, name="node_embedding",
                dtype=self.dtype,
            )(atom_feats - 1)

        t_per_atom = jnp.broadcast_to(
            t_emb[:, None, :], (node.shape[0], node.shape[1], t_emb.shape[-1])
        )
        node = jnp.concatenate([node, t_per_atom.astype(node.dtype)], axis=-1)
        node = nn.Dense(self.hidden_dim, name="atom_latent_emb", dtype=self.dtype)(node)

        # (x_j - x_i) mod 1 over the dense edge tensor. Note: for the knn
        # style the reference uses min-image offsets (utils.py:335-514); the
        # Fourier features are 1-periodic, so mod-1 differences embed
        # identically to min-image vectors.
        frac_diff = (frac_coords[:, None, :, :] - frac_coords[:, :, None, :]) % 1.0
        # hoisted once per eval and shared across layers (see CSPLayer)
        dist_emb = (
            sinusoids_embedding(frac_diff.astype(jnp.float32), self.num_freqs)
            .astype(self.dtype)
            if self.use_dis_emb else None
        )

        if self.edge_style == "fc":
            edge_mask = mask[:, :, None] & mask[:, None, :]
            denom = jnp.broadcast_to(
                num_atoms.astype(jnp.float32)[:, None], mask.shape
            )
        elif self.edge_style == "knn":
            from matinvent_tpu.ops.neighbors import radius_knn_mask

            edge_mask = radius_knn_mask(
                frac_coords, lattice, mask,
                cutoff=self.cutoff, max_neighbors=self.max_neighbors,
            )
            denom = jnp.sum(edge_mask, axis=-1).astype(jnp.float32)
        else:
            raise ValueError(f"unknown edge_style {self.edge_style}")

        for i in range(self.num_layers):
            node = CSPLayer(
                hidden_dim=self.hidden_dim,
                num_freqs=self.num_freqs,
                use_dis_emb=self.use_dis_emb,
                ln=self.ln,
                ip=self.ip,
                dtype=self.dtype,
                name=f"csp_layer_{i}",
            )(node, frac_diff, lattice, edge_mask, denom, dist_emb=dist_emb)

        if self.ln:
            node = nn.LayerNorm(name="final_layer_norm", dtype=self.dtype)(node)

        coord_out = nn.Dense(3, use_bias=False, name="coord_out", dtype=self.dtype)(node)

        graph_features = masked_mean(node, mask[..., None], axis=1)  # [B, H]

        if self.pred_scalar:
            return nn.Dense(1, name="scalar_out")(graph_features)

        lattice_out = nn.Dense(
            9, use_bias=False, name="lattice_out", dtype=self.dtype
        )(graph_features)
        lattice_out = lattice_out.reshape(-1, 3, 3).astype(jnp.float32)
        if self.ip:
            lattice_out = jnp.einsum(
                "bij,bjk->bik", lattice_out, lattice.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )

        if self.pred_type:
            type_out = nn.Dense(self.max_atoms, name="type_out", dtype=self.dtype)(node)
            return lattice_out, coord_out.astype(jnp.float32), type_out.astype(jnp.float32)

        return lattice_out, coord_out.astype(jnp.float32)
