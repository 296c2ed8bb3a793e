"""MatterGen-class score network (TPU-native).

Replaces the external GemNet-style denoiser the reference loads through the
mattergen package (SURVEY.md §2.2, invoked as ``diffusion_module.model(
noisy_batch, t)`` at /root/reference/models/mattergen/pl_module.py:43,73).
Not a GemNet translation: a dense masked message-passing network in the same
spirit as CSPNet (TPU-friendly static shapes), extended with

* D3PM discrete-type inputs (integer classes incl. optional MASK state),
* property conditioning with learned null embeddings for classifier-free
  guidance (mattergen's ``properties_to_condition_on`` +
  ``diffusion_guidance_factor``, models/mattergen/sample.py:134-136),
* a symmetrized per-graph cell-score head (lattice scores are defined on the
  symmetric degrees of freedom),
* per-atom type logits predicting the x0 distribution for the D3PM chain.
"""
from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from matinvent_tpu.models.cspnet import CSPLayer
from matinvent_tpu.ops.segment import masked_mean


class ConditionEmbedding(nn.Module):
    """Embed a dict of scalar conditions; learned null embedding per field.

    Each field embeds its scalar value with a 2-layer MLP; a missing/dropped
    condition contributes its learned null vector instead (the CFG
    'unconditional' token).
    """

    fields: tuple = ()
    dim: int = 128

    @nn.compact
    def __call__(
        self,
        conditions: Mapping[str, jax.Array] | None,  # each [B]
        cond_mask: Mapping[str, jax.Array] | None = None,  # each [B] bool: use cond?
        batch_size: int | None = None,
    ) -> jax.Array:
        if not self.fields:
            return jnp.zeros((batch_size, self.dim))
        conditions = conditions or {}
        outs = []
        for f in self.fields:
            null = self.param(f"null_{f}", nn.initializers.normal(0.02), (self.dim,))
            if f in conditions and conditions[f] is not None:
                v = conditions[f].astype(jnp.float32)[:, None]
                emb = nn.Dense(self.dim, name=f"embed_{f}_0")(v)
                emb = nn.silu(emb)
                emb = nn.Dense(self.dim, name=f"embed_{f}_1")(emb)
                if cond_mask is not None and f in cond_mask:
                    use = cond_mask[f][:, None].astype(emb.dtype)
                    emb = use * emb + (1.0 - use) * null[None, :]
            else:
                b = batch_size if batch_size is not None else 1
                emb = jnp.broadcast_to(null[None, :], (b, self.dim))
            outs.append(emb)
        return sum(outs)


class MatterGenScoreNet(nn.Module):
    """Joint (cell, frac-coord, type) denoiser over padded crystal batches."""

    hidden_dim: int = 256
    time_dim: int = 256
    num_layers: int = 6
    type_vocab: int = 100  # incl. MASK when the D3PM chain is absorbing
    num_freqs: int = 10
    ln: bool = True
    condition_fields: tuple = ()
    dtype: object = jnp.float32  # activation/compute dtype; params stay f32
    # route the edge branch through the fused Pallas kernel
    # (ops/fused_edge.py) — sampling nets only; never under grad
    fused_edge: bool = False
    # 'fc' (reference default: every real atom pair) or 'knn' (PBC
    # min-image radius + rank cutoff, ops/neighbors.radius_knn_mask).
    # In the dense-masked formulation both styles materialize the same
    # [B, A, A, .] tensors — knn changes the mask and the aggregation
    # denominator, not the traffic (measured A/B in PARITY.md r5).
    edge_style: str = "fc"
    cutoff: float = 6.0
    max_neighbors: int = 20

    @nn.compact
    def __call__(
        self,
        t_emb: jax.Array,  # [B, time_dim]
        atom_types: jax.Array,  # [B, A] int (D3PM state, 0-based classes)
        frac_coords: jax.Array,  # [B, A, 3]
        lattice: jax.Array,  # [B, 3, 3]
        num_atoms: jax.Array,  # [B]
        mask: jax.Array,  # [B, A]
        conditions: Mapping[str, jax.Array] | None = None,
        cond_mask: Mapping[str, jax.Array] | None = None,
    ):
        H = self.hidden_dim
        B = frac_coords.shape[0]

        node = nn.Embed(
            self.type_vocab, H, name="type_embedding", dtype=self.dtype
        )(atom_types)

        cond = ConditionEmbedding(
            fields=tuple(self.condition_fields), dim=self.time_dim, name="cond_emb"
        )(conditions, cond_mask, batch_size=B)
        latent = t_emb + cond

        lat_per_atom = jnp.broadcast_to(
            latent[:, None, :], (B, node.shape[1], latent.shape[-1])
        )
        node = nn.Dense(H, name="atom_latent_emb", dtype=self.dtype)(
            jnp.concatenate([node, lat_per_atom.astype(node.dtype)], axis=-1)
        )

        if self.edge_style == "knn":
            from matinvent_tpu.ops.neighbors import radius_knn_mask

            edge_mask = radius_knn_mask(
                frac_coords, lattice, mask,
                cutoff=self.cutoff, max_neighbors=self.max_neighbors,
            )
            denom = jnp.sum(edge_mask, axis=-1).astype(jnp.float32)
        elif self.edge_style == "fc":
            edge_mask = mask[:, :, None] & mask[:, None, :]
            denom = jnp.broadcast_to(
                num_atoms.astype(jnp.float32)[:, None], mask.shape
            )
        else:
            raise ValueError(f"unknown edge_style {self.edge_style}")
        if self.fused_edge and self.edge_style != "fc":
            raise ValueError(
                "fused_edge requires the fc edge style (separable mask)"
            )
        if self.fused_edge:
            # the fused kernel recomputes frac_diff + the Fourier embedding
            # in-register per layer (VPU work traded for the [E, 60+H] HBM
            # round-trips — see ops/fused_edge.py)
            frac_diff = dist_emb = None
        else:
            frac_diff = (
                frac_coords[:, None, :, :] - frac_coords[:, :, None, :]
            ) % 1.0
            # hoisted once per eval and shared across layers (see CSPLayer):
            # measured -0.5 GB/step HBM traffic and -220M transcendentals/step
            # at the bench operating point
            from matinvent_tpu.models.cspnet import sinusoids_embedding

            dist_emb = sinusoids_embedding(
                frac_diff.astype(jnp.float32), self.num_freqs
            ).astype(self.dtype)

        for i in range(self.num_layers):
            node = CSPLayer(
                hidden_dim=H,
                num_freqs=self.num_freqs,
                ln=self.ln,
                ip=True,
                dtype=self.dtype,
                fused_edge=self.fused_edge,
                name=f"layer_{i}",
            )(
                node, frac_diff, lattice, edge_mask, denom, dist_emb=dist_emb,
                frac_coords=frac_coords, mask=mask,
            )

        if self.ln:
            node = nn.LayerNorm(name="final_norm", dtype=self.dtype)(node)

        # per-atom frac-coord score
        pos_out = nn.Dense(3, use_bias=False, name="pos_out", dtype=self.dtype)(
            node
        ).astype(jnp.float32)

        # per-graph symmetric cell score, right-coupled to the current cell
        graph = masked_mean(node.astype(jnp.float32), mask[..., None], axis=1)
        cell_raw = nn.Dense(9, use_bias=False, name="cell_out")(graph).reshape(-1, 3, 3)
        cell_sym = 0.5 * (cell_raw + jnp.swapaxes(cell_raw, -1, -2))
        cell_out = jnp.einsum(
            "bij,bjk->bik", cell_sym, lattice, precision=jax.lax.Precision.HIGHEST
        )

        # per-atom x0-distribution logits for the D3PM chain
        type_out = nn.Dense(self.type_vocab, name="type_out", dtype=self.dtype)(
            node
        ).astype(jnp.float32)

        return {"cell": cell_out, "pos": pos_out, "atomic_numbers": type_out}
