"""Reverse-diffusion samplers: host-side drivers around the jitted scan.

Capability parity with /root/reference/models/diffcsp/sample.py (ATOM_DIST
num-atom distributions, DEFAULT_STEP_LR table, generate() -> (data_list,
structures)). TPU-first: all batches in one padded device call; the reference's
last-batch-only bug (sample.py:166-177 — only the final loader batch survives)
is consciously fixed here by concatenating all batches.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.models.batch import CrystalBatch
from matinvent_tpu.models.diffcsp import DiffCSPDiffusion

# Empirical num-atom distributions of the training datasets
# (models/diffcsp/sample.py:15-63 — dataset statistics, not code).
ATOM_DIST = {
    "perov_5": [0, 0, 0, 0, 0, 1],
    "carbon_24": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                  0.3250697750779839, 0.0, 0.27795107535708424, 0.0,
                  0.15383352487276308, 0.0, 0.11246100804465604, 0.0,
                  0.04958134953209654, 0.0, 0.038745690362830404, 0.0,
                  0.019044491873255624, 0.0, 0.010178952552946971, 0.0,
                  0.007059596125430964, 0.0, 0.006074536200952225],
    "mp_20": [0.0, 0.0021742334905660377, 0.021079009433962265,
              0.019826061320754717, 0.15271226415094338, 0.047132959905660375,
              0.08464770047169812, 0.021079009433962265, 0.07808814858490566,
              0.03434551886792453, 0.0972877358490566, 0.013303360849056603,
              0.09669811320754718, 0.02155807783018868, 0.06522700471698113,
              0.014372051886792452, 0.06703272405660378, 0.00972877358490566,
              0.053176591981132074, 0.010576356132075472, 0.08995430424528301],
    # Derived from the largest in-repo corpus (experiments/data/
    # reference.extxyz, 2000 motif-based ionic structures; re-derive with
    # tools/derive_num_atoms_hist.py). Distinct name so nothing mistakes it
    # for the external ALEX_MP_20 table. Shared by both model families
    # (the MatterGen registry snapshots this dict at import).
    "matinvent_corpus": [0.0, 0.0, 0.5205, 0.2115, 0.268],
}

DEFAULT_STEP_LR = {
    "csp": {"perov_5": 5e-7, "carbon_24": 5e-6, "mp_20": 1e-5, "mpts_52": 1e-5},
    "csp_multi": {"perov_5": 5e-7, "carbon_24": 5e-7, "mp_20": 1e-5, "mpts_52": 1e-5},
    "gen": {"perov_5": 1e-6, "carbon_24": 1e-5, "mp_20": 5e-6},
}


def sample_num_atoms(
    rng: np.random.Generator, total: int, dataset: str = "mp_20"
) -> np.ndarray:
    dist = np.asarray(ATOM_DIST[dataset], dtype=float)
    dist = dist / dist.sum()
    return rng.choice(len(dist), size=total, p=dist).astype(np.int32)


def register_atom_dist(name: str, hist) -> None:
    """Register a num-atoms histogram for both sampler families.

    ``hist``: probability sequence indexed by atom count. Sampling a model
    with the histogram of ITS OWN training corpus (see
    ``atom_dist_from_structures``) avoids asking it for cell sizes it never
    saw — a large validity lever for small pretrain corpora."""
    arr = np.asarray(hist, dtype=float)
    if arr.sum() <= 0:
        raise ValueError(f"histogram {name} has no mass")
    ATOM_DIST[name] = arr / arr.sum()
    # the MatterGen registry snapshots ATOM_DIST at import; keep it in sync
    # through its registration function (NOT a raw dict write) so a table
    # registered through either family's API resolves in both
    try:
        from matinvent_tpu.models.mattergen.sample import (
            register_num_atoms_distribution,
        )

        register_num_atoms_distribution(name, ATOM_DIST[name])
    except ImportError:  # circular import during module init
        pass


def atom_dist_from_structures(structures) -> np.ndarray:
    """Empirical num-atoms histogram of a structure list."""
    counts = np.array([s.num_atoms for s in structures], dtype=int)
    return np.bincount(counts, minlength=2).astype(float)


def batch_to_structures(batch: CrystalBatch) -> Tuple[List[dict], List[Structure]]:
    """Split a padded device batch into host per-crystal dicts + Structures."""
    data_list = batch.to_lists()
    strucs = [
        Structure(d["lattice"], d["atom_types"], d["frac_coords"]) for d in data_list
    ]
    return data_list, strucs


@dataclass
class DiffCSPSampler:
    """Batched generation driver (sample.py:141-201 parity)."""

    batch_size: int | None = None
    num_batches: int | None = None
    num_atoms_distribution: str = "mp_20"
    # optional JSON file of {name: hist} tables loaded before resolution
    # (same format as models/mattergen/sample.load_num_atoms_distributions)
    num_atoms_distribution_file: str | None = None
    max_atoms: int = 20
    step_lr: float | None = None
    record_trajectories: bool = False
    seed: int = 0
    # last recorded trajectory + its num_atoms (record_trajectories=True)
    last_trajectory: Any = None
    last_num_atoms: Any = None

    def __post_init__(self):
        if self.num_atoms_distribution_file:
            from matinvent_tpu.models.mattergen.sample import (
                load_num_atoms_distributions,
            )

            load_num_atoms_distributions(self.num_atoms_distribution_file)
        self._rng = np.random.default_rng(self.seed)
        self._key = jax.random.PRNGKey(self.seed)

    def launch(
        self,
        model: tuple[DiffCSPDiffusion, Any],
        batch_size: int | None = None,
        num_batches: int | None = None,
        sharding=None,
        **kwargs,
    ) -> CrystalBatch:
        """Dispatch a generation batch on device and return immediately.

        JAX dispatch is asynchronous: the returned ``CrystalBatch`` holds
        device futures, so host work (reward scoring) overlaps the sampling
        scan. Call :func:`batch_to_structures` to materialize.
        """
        diffusion, params = model
        batch_size = batch_size or self.batch_size
        num_batches = num_batches or self.num_batches
        assert batch_size is not None and num_batches is not None
        total = batch_size * num_batches

        step_lr = self.step_lr
        if step_lr is None:
            step_lr = DEFAULT_STEP_LR["gen"].get(self.num_atoms_distribution, 5e-6)

        num_atoms = sample_num_atoms(self._rng, total, self.num_atoms_distribution)
        # distributions may exceed max_atoms (e.g. carbon_24 reaches 24):
        # clip so mask/num_atoms metadata stay consistent
        num_atoms = np.clip(num_atoms, 1, self.max_atoms)
        num_atoms_dev = jnp.asarray(num_atoms)
        if sharding is not None:
            num_atoms_dev = jax.device_put(num_atoms_dev, sharding)

        self._key, sk = jax.random.split(self._key)
        final, traj = diffusion.sample(
            params, sk, num_atoms_dev, max_atoms=self.max_atoms, step_lr=step_lr,
            record_traj=self.record_trajectories,
        )
        if self.record_trajectories:
            self.last_trajectory = traj
            self.last_num_atoms = num_atoms_dev
        return final

    def generate(self, model, **kwargs) -> Tuple[List[dict], List[Structure]]:
        return batch_to_structures(self.launch(model, **kwargs))


def collate_data_list(data_list: List[dict], max_atoms: int) -> CrystalBatch:
    """Host per-crystal dicts -> padded batch (for finetune dataloading)."""
    return CrystalBatch.from_lists(
        [d["atom_types"] for d in data_list],
        [d["frac_coords"] for d in data_list],
        [d["lattice"] for d in data_list],
        max_atoms=max_atoms,
    )
