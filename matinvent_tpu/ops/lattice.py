"""Batched crystal-lattice math in pure JAX.

Capability parity with the reference geometry layer
(/root/reference/models/diffcsp/utils.py:68-134 ``lattice_params_to_matrix_torch``,
``frac_to_cart_coords``, ``cart_to_frac_coords`` and
/root/reference/models/diffcsp/sample.py:103 ``lattices_to_params_shape``), but
written TPU-first: everything operates on dense, statically padded
``[B, A, ...]`` layouts (no ragged ``repeat_interleave`` indexing) so the whole
pipeline stays inside one XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lattice_params_to_matrix(lengths: jax.Array, angles: jax.Array) -> jax.Array:
    """Convert lattice parameters to row-vector lattice matrices.

    Args:
        lengths: ``[..., 3]`` cell edge lengths (Angstrom).
        angles: ``[..., 3]`` cell angles alpha, beta, gamma (degrees).

    Returns:
        ``[..., 3, 3]`` lattice matrices whose rows are the cell vectors a, b, c.
    """
    angles_r = jnp.deg2rad(angles)
    coses = jnp.cos(angles_r)
    sins = jnp.sin(angles_r)

    val = (coses[..., 0] * coses[..., 1] - coses[..., 2]) / (
        sins[..., 0] * sins[..., 1]
    )
    # Rounding errors may push |val| slightly above 1.
    val = jnp.clip(val, -1.0, 1.0)
    gamma_star = jnp.arccos(val)

    zeros = jnp.zeros_like(lengths[..., 0])
    vector_a = jnp.stack(
        [lengths[..., 0] * sins[..., 1], zeros, lengths[..., 0] * coses[..., 1]],
        axis=-1,
    )
    vector_b = jnp.stack(
        [
            -lengths[..., 1] * sins[..., 0] * jnp.cos(gamma_star),
            lengths[..., 1] * sins[..., 0] * jnp.sin(gamma_star),
            lengths[..., 1] * coses[..., 0],
        ],
        axis=-1,
    )
    vector_c = jnp.stack([zeros, zeros, lengths[..., 2]], axis=-1)

    return jnp.stack([vector_a, vector_b, vector_c], axis=-2)


def lattice_matrix_to_params(lattice: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Recover (lengths, angles-in-degrees) from row-vector lattice matrices.

    Args:
        lattice: ``[..., 3, 3]`` lattice matrices (rows are cell vectors).

    Returns:
        Tuple of ``[..., 3]`` lengths and ``[..., 3]`` angles (degrees).
    """
    lengths = jnp.sqrt(jnp.sum(lattice**2, axis=-1))

    def angle(i: int) -> jax.Array:
        j, k = (i + 1) % 3, (i + 2) % 3
        cos = jnp.sum(lattice[..., j, :] * lattice[..., k, :], axis=-1) / (
            lengths[..., j] * lengths[..., k]
        )
        return jnp.arccos(jnp.clip(cos, -1.0, 1.0)) * (180.0 / jnp.pi)

    angles = jnp.stack([angle(i) for i in range(3)], axis=-1)
    return lengths, angles


def frac_to_cart(frac_coords: jax.Array, lattice: jax.Array, regularized: bool = True) -> jax.Array:
    """Fractional -> Cartesian coordinates on a padded batch.

    Args:
        frac_coords: ``[B, A, 3]`` fractional coordinates (padded atoms allowed).
        lattice: ``[B, 3, 3]`` lattice matrices.
        regularized: wrap fractional coordinates into [0, 1) first.

    Returns:
        ``[B, A, 3]`` Cartesian coordinates.
    """
    if regularized:
        frac_coords = frac_coords % 1.0
    # Geometry transforms are tiny but precision-critical: pin full-f32 MXU
    # passes here (default TPU matmul precision is bf16-based).
    return jnp.einsum(
        "...ai,...ij->...aj", frac_coords, lattice, precision=jax.lax.Precision.HIGHEST
    )


def cart_to_frac(cart_coords: jax.Array, lattice: jax.Array, regularized: bool = True) -> jax.Array:
    """Cartesian -> fractional coordinates on a padded batch.

    Uses a pseudo-inverse so degenerate (rank-deficient) predicted lattices do
    not produce NaNs, matching the reference's ``torch.linalg.pinv`` choice
    (/root/reference/models/diffcsp/utils.py:117-134).
    """
    inv_lattice = jnp.linalg.pinv(lattice)
    frac = jnp.einsum(
        "...ai,...ij->...aj", cart_coords, inv_lattice, precision=jax.lax.Precision.HIGHEST
    )
    if regularized:
        frac = frac % 1.0
    return frac


def lattice_volume(lattice: jax.Array) -> jax.Array:
    """Unit-cell volume (absolute determinant) of ``[..., 3, 3]`` lattices."""
    return jnp.abs(jnp.linalg.det(lattice))
