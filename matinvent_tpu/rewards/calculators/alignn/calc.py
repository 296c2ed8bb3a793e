"""ALIGNN reward calculator over published checkpoints (native JAX forward).

Parity with /root/reference/rewards/calculators/alignn/calc.py:51-207: the
same task surface and derived-task math (vickers via Tian/Teter, pugh,
young, figure-of-merit, magnetic-density /0.84 x n/V correction) — the
dispatch is inherited verbatim from ``PropertyPredictor`` (the two
calculators share it by subclassing); only the backbone differs. Where the
reference downloads checkpoints at call time (prediction.py:209-301), this
calculator ingests already-downloaded files from ``model_dir`` — this
environment has no network egress, and a reward plugin should not be
downloading mid-RL-run anyway.

Checkpoint resolution per task, first match wins (mirrors HF_MODEL_DICT /
ALIGNN_MODEL_LIST naming, prediction.py:30-197):

  <model_dir>/prop_pred/alignn/<prop>/       (HF snapshot layout)
  <model_dir>/<prop>/                        (flat folder)
  <model_dir>/<figshare_name>.zip            (figshare zip)

Use the sibling ``PropertyPredictor`` (trained-in-repo weights, TPU-dense
backbone) when no published checkpoints are on disk.

Residual risk (offline build): the native forward is verified against an
in-repo NumPy oracle + invariance tests, never against a DGL alignn forward
or published-checkpoint outputs — a shared misreading of alignn semantics
(edge-gate normalization order, RBF endpoints, line-graph tie-breaking)
would pass every in-repo test. ``tools/first_networked_run.py`` stage
``alignn_golden`` captures DGL-vs-native goldens on the first networked run.
"""
from __future__ import annotations

import logging
import os
from typing import List

import numpy as np

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.rewards.calculators.alignn.graphs import build_batch
from matinvent_tpu.rewards.calculators.alignn.load import load_alignn_checkpoint
from matinvent_tpu.rewards.calculators.alignn.model import run_batch
from matinvent_tpu.rewards.calculators.predictor import PropertyPredictor

# task -> (HF folder under prop_pred/alignn/, figshare zip basename)
# prediction.py:188-197 (HF) and :30-187 (figshare)
TASK_CKPT_NAMES = {
    "band_gap": ("band_gap", "mp_gappbe_alignn"),
    "formation_energy": ("formation_energy", "mp_e_form_alignn"),
    "bulk_modulus": ("bulk_modulus_voigt", "jv_bulk_modulus_kv_alignn"),
    "shear_modulus": ("shear_modulus_voigt", "jv_shear_modulus_gv_alignn"),
    "magnetic_density": ("total_magnetization_per_atom", "jv_magmom_oszicar_alignn"),
    "total_dielectric_constant": ("total_dielectric_constant", "mp_dielectric"),
}


class ALIGNNModel:
    """One loaded checkpoint with the ``predict(structures)`` interface
    ``PropertyPredictor``'s task dispatch consumes."""

    def __init__(
        self,
        ckpt_path: str,
        atom_init: str | None = None,
        cutoff: float = 8.0,
        max_neighbors: int = 12,
        chunk_size: int = 16,
        pad_multiple: int = 512,
    ):
        self.params, self.spec, self.atom_table = load_alignn_checkpoint(
            ckpt_path, atom_init=atom_init
        )
        self.cutoff = cutoff
        self.max_neighbors = max_neighbors
        self.chunk_size = chunk_size
        self.pad_multiple = pad_multiple
        self.loaded = True

    def predict(self, structures: List[Structure]) -> np.ndarray:
        out = np.full(len(structures), np.nan)
        for lo in range(0, len(structures), self.chunk_size):
            chunk = structures[lo : lo + self.chunk_size]
            usable_idx, usable = [], []
            for i, s in enumerate(chunk):
                if (
                    np.isfinite(s.lattice).all()
                    and np.isfinite(s.frac_coords).all()
                    and s.num_atoms >= 1
                    and s.volume > 1e-6
                    and (s.species >= 1).all()
                    and (s.species <= 100).all()
                ):
                    usable_idx.append(lo + i)
                    usable.append(s)
            if not usable:
                continue
            try:
                batch = build_batch(
                    usable, self.cutoff, self.max_neighbors, self.pad_multiple
                )
                vals = run_batch(self.params, self.spec, self.atom_table, batch)
            except Exception as exc:  # degrade to NaN like every calculator
                logging.warning(f"ALIGNN chunk failed ({exc}); NaN degradation")
                continue
            out[np.asarray(usable_idx)] = vals
        return out


class ALIGNN(PropertyPredictor):
    """Reference-parity ALIGNN calculator: published-checkpoint backbone,
    inherited task dispatch (calc.py:63-207 semantics)."""

    def __init__(
        self,
        root_dir: str,
        task: str = "band_gap",
        model_dir: str | None = None,
        atom_init: str | None = None,
        cutoff: float = 8.0,
        max_neighbors: int = 12,
        chunk_size: int = 16,
        **kwargs,
    ) -> None:
        # skip PropertyPredictor's default-weights resolution: this backend
        # is only meaningful with published checkpoints present
        super(PropertyPredictor, self).__init__(root_dir, task)
        from matinvent_tpu.rewards.calculators.predictor import TASK_MODEL_DICT

        if task not in TASK_MODEL_DICT:
            raise ValueError(f"{task} is an unknown task for ALIGNN calculator")
        # like the reference, checkpoint acquisition is deferred to calc time
        # (prediction.py resolves models inside get_multiple_predictions);
        # construction stays cheap so configs instantiate without weights
        self.model_dir = model_dir or os.environ.get("ALIGNN_MODEL_DIR")
        self.atom_init = atom_init
        self._alignn_kwargs = dict(
            atom_init=atom_init,
            cutoff=cutoff,
            max_neighbors=max_neighbors,
            chunk_size=chunk_size,
        )
        self._models: dict[str, ALIGNNModel] = {}

    def _resolve(self, task: str) -> str:
        if not self.model_dir:
            raise FileNotFoundError(
                "ALIGNN calculator has no model_dir: point it (or "
                "$ALIGNN_MODEL_DIR) at downloaded checkpoints — an HF "
                "jwchen25/MatInvent snapshot or figshare zips. For "
                "network-free operation use PropertyPredictor instead."
            )
        hf_prop, figshare = TASK_CKPT_NAMES[task]
        candidates = [
            os.path.join(self.model_dir, "prop_pred", "alignn", hf_prop),
            os.path.join(self.model_dir, hf_prop),
            os.path.join(self.model_dir, task),
            os.path.join(self.model_dir, f"{figshare}.zip"),
            os.path.join(self.model_dir, f"{hf_prop}.zip"),
        ]
        for c in candidates:
            if (os.path.isdir(c) and os.path.exists(os.path.join(c, "config.json"))) or (
                c.endswith(".zip") and os.path.exists(c)
            ):
                return c
        raise FileNotFoundError(
            f"no ALIGNN checkpoint for task '{task}' under {self.model_dir} "
            f"(tried {candidates})"
        )

    def _model(self, task: str) -> ALIGNNModel:
        if task not in self._models:
            self._models[task] = ALIGNNModel(
                self._resolve(task), **self._alignn_kwargs
            )
        return self._models[task]
