"""Pallas fast-path CSPNet forward for the sampling loop.

Evaluates the exact CSPNet computation (same parameter pytree, same math as
``CSPNet.apply``) with each message-passing layer fused into a single Pallas
kernel (ops/pallas_csp_layer.py). Inference-only; the linen module remains
the autodiff/training path. Supports the DiffCSP diffusion configuration
(smooth inputs, pred_type, ip lattice head, no LayerNorm).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from matinvent_tpu.ops.pallas_csp_layer import fused_csp_layer
from matinvent_tpu.ops.segment import masked_mean


def cspnet_forward_pallas(
    params: dict,
    t_emb: jax.Array,  # [B, latent]
    atom_probs: jax.Array,  # [B, A, K]
    frac_coords: jax.Array,  # [B, A, 3]
    lattice: jax.Array,  # [B, 3, 3]
    num_atoms: jax.Array,  # [B]
    mask: jax.Array,  # [B, A]
    num_layers: int,
    num_freqs: int = 10,
    dtype=jnp.bfloat16,
    block_b: int = 8,
    interpret: bool = False,
):
    p = params["params"]
    dt = jnp.dtype(dtype)

    def dense(name_tree, x):
        k = name_tree["kernel"].astype(dt)
        y = x.astype(dt) @ k
        if "bias" in name_tree:
            y = y + name_tree["bias"].astype(dt)
        return y

    node = dense(p["node_embedding"], atom_probs)
    B, A = node.shape[:2]
    t_per_atom = jnp.broadcast_to(
        t_emb[:, None, :].astype(dt), (B, A, t_emb.shape[-1])
    )
    node = dense(p["atom_latent_emb"], jnp.concatenate([node, t_per_atom], axis=-1))

    lat9 = jnp.einsum(
        "bij,bkj->bik", lattice, lattice, precision=jax.lax.Precision.HIGHEST
    ).reshape(B, 9)

    for i in range(num_layers):
        lp = p[f"csp_layer_{i}"]
        node = fused_csp_layer(
            node,
            frac_coords,
            lat9,
            mask,
            num_atoms,
            lp["edge_mlp_0_kernel"],
            lp["edge_mlp_0_bias"],
            lp["edge_mlp_1"]["kernel"],
            lp["edge_mlp_1"]["bias"],
            lp["node_mlp_0"]["kernel"],
            lp["node_mlp_0"]["bias"],
            lp["node_mlp_1"]["kernel"],
            lp["node_mlp_1"]["bias"],
            num_freqs=num_freqs,
            block_b=block_b,
            interpret=interpret,
        )

    coord_out = (node.astype(dt) @ p["coord_out"]["kernel"].astype(dt)).astype(
        jnp.float32
    )
    graph = masked_mean(node.astype(jnp.float32), mask[..., None], axis=1)
    lattice_out = (graph @ p["lattice_out"]["kernel"]).reshape(-1, 3, 3)
    lattice_out = jnp.einsum(
        "bij,bjk->bik", lattice_out, lattice, precision=jax.lax.Precision.HIGHEST
    )
    type_out = (
        node.astype(dt) @ p["type_out"]["kernel"].astype(dt)
        + p["type_out"]["bias"].astype(dt)
    ).astype(jnp.float32)
    return lattice_out, coord_out, type_out
