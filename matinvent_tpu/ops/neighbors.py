"""Fixed-shape PBC neighbor selection (TPU-native radius_graph_pbc).

Capability parity with the reference's variable-edge-count neighbor machinery
(/root/reference/models/diffcsp/utils.py:335-514 ``radius_graph_pbc`` +
``get_max_neighbors_mask`` and :812 ``min_distance_sqr_pbc``), re-designed for
static shapes: instead of emitting a ragged edge list, we compute dense
minimum-image distances over the 27 neighbor cells and return a boolean
``[B, A, A]`` edge mask (within cutoff, at most ``max_neighbors`` per atom by
distance rank). CSPNet's dense masked aggregation consumes this mask directly
— the knn edge style without any dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_OFFSETS = np.array(
    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=np.float32,
)
_CENTER = 13  # index of the (0,0,0) offset


def min_image_distances(
    frac_coords: jax.Array,  # [B, A, 3]
    lattice: jax.Array,  # [B, 3, 3]
) -> jax.Array:
    """``[B, A, A]`` minimum-image pairwise distances (self -> shortest
    nonzero lattice translation)."""
    cart = jnp.einsum(
        "bai,bij->baj", frac_coords % 1.0, lattice,
        precision=jax.lax.Precision.HIGHEST,
    )
    offsets = jnp.einsum(
        "oi,bij->boj", jnp.asarray(_OFFSETS), lattice,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, 27, 3]
    diff = cart[:, :, None, :] - cart[:, None, :, :]  # [B, A, A, 3]
    d = diff[:, :, :, None, :] + offsets[:, None, None, :, :]
    dist = jnp.sqrt(jnp.sum(d**2, axis=-1) + 1e-12)  # [B, A, A, 27]
    # exclude the true self term (i == j, zero offset)
    A = frac_coords.shape[1]
    eye = jnp.eye(A, dtype=bool)[None, :, :, None]
    center = jnp.zeros((1, 1, 1, 27), bool).at[..., _CENTER].set(True)
    dist = jnp.where(eye & center, jnp.inf, dist)
    return jnp.min(dist, axis=-1)


def radius_knn_mask(
    frac_coords: jax.Array,  # [B, A, 3]
    lattice: jax.Array,  # [B, 3, 3]
    mask: jax.Array,  # [B, A] atom validity
    cutoff: float = 6.0,
    max_neighbors: int = 20,
) -> jax.Array:
    """``[B, A, A]`` bool edge mask: j is a neighbor of i when both atoms are
    real, their minimum-image distance is < cutoff, and j ranks within the
    ``max_neighbors`` closest of i."""
    dist = min_image_distances(frac_coords, lattice)
    pair_ok = mask[:, :, None] & mask[:, None, :]
    dist = jnp.where(pair_ok, dist, jnp.inf)

    within = dist < cutoff
    # rank neighbors of each i by distance; keep the top max_neighbors
    order = jnp.argsort(dist, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    keep = ranks < max_neighbors
    return within & keep & pair_ok
