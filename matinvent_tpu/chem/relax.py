"""Batched structure relaxation on device.

Capability counterpart of the reference's MLIP relaxation step
(``relax_structures`` with MatterSim, /root/reference/pipeline/filters/
opt_filter.py:152-163 and the ``mlip_opt`` hook, pipeline/mat_invent.py:89-93).

A relaxer is any callable ``(structures) -> (relaxed_structures, energies)``.
This module provides a TPU-native default — gradient descent on a smooth
pair potential (soft-sphere repulsion + covalent-radius-scaled Morse-like
attraction) over the padded batch, one jitted ``lax.scan`` for all structures
at once. It is NOT a trained MLIP: energies are screening-grade (useful for
overlap removal and relative ranking in tests/smokes); production deployments
plug a real MLIP callback (MatterSim/FairChem) through the same signature.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from matinvent_tpu.chem.structure import OFFSETS_27, Structure
from matinvent_tpu.models.batch import CrystalBatch

# Covalent radii (Angstrom, Cordero 2008-style, public data); index = Z.
_COVALENT_RADII = np.array(
    [0.2,
     0.31, 0.28, 1.28, 0.96, 0.84, 0.76, 0.71, 0.66, 0.57, 0.58,
     1.66, 1.41, 1.21, 1.11, 1.07, 1.05, 1.02, 1.06, 2.03, 1.76,
     1.70, 1.60, 1.53, 1.39, 1.39, 1.32, 1.26, 1.24, 1.32, 1.22,
     1.22, 1.20, 1.19, 1.20, 1.20, 1.16, 2.20, 1.95, 1.90, 1.75,
     1.64, 1.54, 1.47, 1.46, 1.42, 1.39, 1.45, 1.44, 1.42, 1.39,
     1.39, 1.38, 1.39, 1.40, 2.44, 2.15, 2.07, 2.04, 2.03, 2.01,
     1.99, 1.98, 1.98, 1.96, 1.94, 1.92, 1.92, 1.89, 1.90, 1.87,
     1.87, 1.75, 1.70, 1.62, 1.51, 1.44, 1.41, 1.36, 1.36, 1.32,
     1.45, 1.46, 1.48, 1.40, 1.50, 1.50, 2.60, 2.21, 2.15, 2.06,
     2.00, 1.96, 1.90, 1.87, 1.80, 1.69, 1.69, 1.68, 1.67, 1.66],
    dtype=np.float32,
)



def _pair_energy(batch: CrystalBatch, radii: jax.Array) -> jax.Array:
    """Per-crystal smooth pair energy over minimum-image neighbor pairs."""
    mask = batch.mask
    cart = jnp.einsum(
        "bai,bij->baj", batch.frac_coords % 1.0, batch.lattice,
        precision=jax.lax.Precision.HIGHEST,
    )
    offsets = jnp.einsum(
        "oi,bij->boj", jnp.asarray(OFFSETS_27, jnp.float32), batch.lattice,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, 27, 3]
    diff = cart[:, :, None, :] - cart[:, None, :, :]  # [B, A, A, 3]
    d = diff[:, :, :, None, :] + offsets[:, None, None, :, :]  # [B,A,A,27,3]
    dist = jnp.sqrt(jnp.sum(d**2, -1) + 1e-12)

    r = radii[batch.atom_types]  # [B, A] (0 -> dummy radius)
    r0 = r[:, :, None] + r[:, None, :]  # equilibrium distance [B, A, A]
    pair_mask = (mask[:, :, None] & mask[:, None, :]).astype(dist.dtype)
    # drop the zero-distance self term (same atom, zero offset)
    eye = jnp.eye(dist.shape[1], dtype=bool)[None, :, :, None]
    center = jnp.zeros((1, 1, 1, 27), bool).at[..., 13].set(True)
    self_term = eye & center
    dist = jnp.where(self_term, 1e6, dist)

    x = dist / r0[..., None]
    # Morse-like: repulsive near overlap, shallow minimum at x=1, ~0 beyond 2
    e = (jnp.exp(-2.0 * 3.0 * (x - 1.0)) - 2.0 * jnp.exp(-3.0 * (x - 1.0)))
    e = jnp.where(x < 2.5, e, 0.0)
    e = jnp.sum(e, axis=-1) * pair_mask  # sum over images
    return 0.5 * jnp.sum(e, axis=(1, 2))  # [B]


class SoftSphereRelaxer:
    """Jitted batched relaxer: joint gradient descent on coords + cell."""

    def __init__(
        self,
        steps: int = 200,
        lr_coords: float = 2e-3,
        lr_cell: float = 2e-3,
        max_atoms: int = 20,
        depth_scale: float = 0.3,
    ):
        self.steps = steps
        self.lr_coords = lr_coords
        self.lr_cell = lr_cell
        self.max_atoms = max_atoms
        self.depth_scale = depth_scale
        self._radii = jnp.asarray(_COVALENT_RADII)

    @partial(jax.jit, static_argnames=("self",))
    def _relax(self, batch: CrystalBatch):
        radii = self._radii

        def energy(frac, lattice):
            b = batch.replace(frac_coords=frac, lattice=lattice)
            return jnp.sum(_pair_energy(b, radii))

        def step(carry, _):
            frac, lat = carry
            g_frac, g_lat = jax.grad(energy, argnums=(0, 1))(frac, lat)
            frac = (frac - self.lr_coords * g_frac) % 1.0
            lat = lat - self.lr_cell * g_lat
            return (frac, lat), None

        (frac, lat), _ = jax.lax.scan(
            step, (batch.frac_coords, batch.lattice), None, length=self.steps
        )
        final = batch.replace(frac_coords=frac, lattice=lat)
        energies = _pair_energy(final, radii) * self.depth_scale
        return final, energies

    def __call__(
        self, structures: Sequence[Structure], xyz_path: str | None = None
    ) -> tuple[List[Structure], List[float]]:
        """``xyz_path``: when given, the relaxed structures are written back
        to it (the reference's mlip_opt overwrites the valid-samples extxyz,
        pipeline/mat_invent.py:89-93)."""
        if not structures:
            return [], []
        ok = [s.num_atoms <= self.max_atoms for s in structures]
        batchable = [s for s, m in zip(structures, ok) if m]
        out_strucs = list(structures)
        energies = [float("nan")] * len(structures)
        if batchable:
            batch = CrystalBatch.from_lists(
                [s.species for s in batchable],
                [s.frac_coords for s in batchable],
                [s.lattice for s in batchable],
                max_atoms=self.max_atoms,
            )
            relaxed, e = self._relax(batch)
            dicts = relaxed.to_lists()
            e = np.asarray(e, dtype=float)
            j = 0
            for i, m in enumerate(ok):
                if m:
                    d = dicts[j]
                    out_strucs[i] = Structure(
                        d["lattice"], d["atom_types"], d["frac_coords"]
                    )
                    energies[i] = float(e[j])
                    j += 1
        if xyz_path:
            from matinvent_tpu.chem.structure import save_extxyz

            save_extxyz(out_strucs, xyz_path)
        return out_strucs, energies
