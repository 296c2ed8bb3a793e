"""Statically padded crystal batch container.

TPU-first replacement for the reference's ragged ``torch_geometric.data.Data``
batches (/root/reference/models/diffcsp/sample.py:180-198) and MatterGen's
``ChemGraph``+``collate``: every crystal is padded to ``max_atoms`` and all
per-atom tensors are dense ``[B, A, ...]`` with a validity mask, so the entire
sample/finetune path compiles to fixed shapes (no ragged gathers, no
``repeat_interleave``).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

MAX_ATOMIC_NUM = 100


@struct.dataclass
class CrystalBatch:
    """A batch of (possibly noisy) crystals with static shapes.

    Attributes:
        atom_types: ``[B, A]`` int32 atomic numbers (1-based; 0 = padding).
        frac_coords: ``[B, A, 3]`` fractional coordinates.
        lattice: ``[B, 3, 3]`` row-vector lattice matrices.
        num_atoms: ``[B]`` int32 true atom counts.
    """

    atom_types: jax.Array
    frac_coords: jax.Array
    lattice: jax.Array
    num_atoms: jax.Array

    @property
    def batch_size(self) -> int:
        return self.num_atoms.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.frac_coords.shape[1]

    @property
    def mask(self) -> jax.Array:
        """``[B, A]`` bool — True for real atoms, False for padding."""
        ar = jnp.arange(self.max_atoms, dtype=self.num_atoms.dtype)
        return ar[None, :] < self.num_atoms[:, None]

    def atom_onehot(self, num_classes: int = MAX_ATOMIC_NUM) -> jax.Array:
        """``[B, A, K]`` one-hot of (atom_types - 1); zeros on padding."""
        oh = jax.nn.one_hot(self.atom_types - 1, num_classes, dtype=self.frac_coords.dtype)
        return oh * self.mask[..., None].astype(oh.dtype)

    @classmethod
    def from_lists(
        cls,
        atom_types: Sequence[np.ndarray],
        frac_coords: Sequence[np.ndarray],
        lattices: Sequence[np.ndarray],
        max_atoms: int | None = None,
    ) -> "CrystalBatch":
        """Pad a host-side list of crystals into one batch."""
        n = np.array([len(a) for a in atom_types], dtype=np.int32)
        a_max = int(max_atoms if max_atoms is not None else n.max())
        if (n > a_max).any():
            raise ValueError(f"crystal with {n.max()} atoms exceeds max_atoms={a_max}")
        B = len(atom_types)
        at = np.zeros((B, a_max), dtype=np.int32)
        fc = np.zeros((B, a_max, 3), dtype=np.float32)
        lat = np.zeros((B, 3, 3), dtype=np.float32)
        for i in range(B):
            at[i, : n[i]] = np.asarray(atom_types[i], dtype=np.int32)
            fc[i, : n[i]] = np.asarray(frac_coords[i], dtype=np.float32)
            lat[i] = np.asarray(lattices[i], dtype=np.float32)
        return cls(
            atom_types=jnp.asarray(at),
            frac_coords=jnp.asarray(fc),
            lattice=jnp.asarray(lat),
            num_atoms=jnp.asarray(n),
        )

    def to_lists(self) -> list[dict]:
        """Split back into host-side per-crystal dicts (drops padding)."""
        at = np.asarray(self.atom_types)
        fc = np.asarray(self.frac_coords)
        lat = np.asarray(self.lattice)
        n = np.asarray(self.num_atoms)
        out = []
        for i in range(self.batch_size):
            k = int(n[i])
            out.append(
                dict(
                    atom_types=at[i, :k].copy(),
                    frac_coords=fc[i, :k].copy(),
                    lattice=lat[i].copy(),
                    num_atoms=k,
                )
            )
        return out
