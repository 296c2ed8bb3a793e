"""Masked segment reductions over statically padded crystal batches.

The reference relies on ``torch_scatter`` ragged segment ops
(/root/reference/models/diffcsp/cspnet.py:79, diffusion.py:128-130). On TPU we
use dense ``[B, A, ...]`` layouts with an atom-validity mask, so every segment
reduction becomes a masked sum/mean that XLA fuses into adjacent matmuls — no
gather/scatter, no dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: jax.Array, axis: int, eps: float = 1e-12) -> jax.Array:
    """Mean of ``x`` over ``axis`` counting only entries where ``mask`` is True.

    Args:
        x: data array.
        mask: boolean/0-1 array broadcastable to ``x``.
        axis: axis to reduce.
    """
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, eps)


def graph_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-crystal mean over the atom axis of a padded batch.

    Equivalent to the reference's ``scatter(x, node2graph, reduce='mean')``
    on the padded layout.

    Args:
        x: ``[B, A]`` or ``[B, A, F]`` per-atom values.
        mask: ``[B, A]`` validity mask.

    Returns:
        ``[B]`` or ``[B, F]`` per-graph means.
    """
    if x.ndim == mask.ndim + 1:
        m = mask[..., None]
    else:
        m = mask
    return masked_mean(x, m, axis=1)
