"""GNN property-predictor reward calculator (ALIGNN-equivalent, TPU-native).

Capability parity with /root/reference/rewards/calculators/alignn/calc.py:51-207:
the same task surface (band_gap, formation_energy, bulk_modulus, shear_modulus,
magnetic_density, total_dielectric_constant) plus the derived tasks —
vickers_hardness via Tian's model with Teter fallback (calc.py:79-110),
pugh_ratio (calc.py:111-134), young_modulus (calc.py:135-157),
figure_of_merit = gap x dielectric (calc.py:158-180) — and the
magnetic-density correction /0.84 * natoms/volume (calc.py:192-203).

The backbone is NOT a DGL line-graph ALIGNN translation: it is the
framework's dense masked message-passing network (CSPNet with a scalar head)
batched over padded crystals — one jitted device call for the whole batch
instead of per-structure DGL graph builds. Trained weights load from native
msgpack checkpoints (``<model_dir>/<model_name>.msgpack``); without weights
the calculator runs randomly initialized (pipeline smoke / distillation
target). Quantitative parity with published ALIGNN checkpoints requires
distilling them into this backbone (the architectures differ by design).
"""
from __future__ import annotations

import logging
import os
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.models.batch import CrystalBatch
from matinvent_tpu.models.cspnet import CSPNet
from matinvent_tpu.rewards.calculators.base import Calculator

TASK_MODEL_DICT = {
    "band_gap": "mp_bandgap",
    "formation_energy": "mp_e_form",
    "bulk_modulus": "mp_bulk_modulus",
    "shear_modulus": "mp_shear_modulus",
    "magnetic_density": "mp_total_mag_per_atom",
    "total_dielectric_constant": "mp_dielectric",
    "vickers_hardness": "",
    "figure_of_merit": "",
    "pugh_ratio": "",
    "young_modulus": "",
}


class PropertyGNN:
    """One scalar-property model: CSPNet backbone + scalar head."""

    def __init__(
        self,
        model_name: str,
        model_dir: str | None = None,
        hidden_dim: int = 128,
        num_layers: int = 4,
        max_atoms: int = 32,
        seed: int = 0,
    ):
        self.model_name = model_name
        self.max_atoms = max_atoms
        self.net = CSPNet(
            hidden_dim=hidden_dim,
            latent_dim=8,  # no time conditioning for property regression
            num_layers=num_layers,
            smooth=False,
            pred_type=False,
            pred_scalar=True,
            ln=True,
        )
        key = jax.random.PRNGKey(seed)
        dummy_types = jnp.ones((1, 4), jnp.int32)
        self.params = self.net.init(
            key,
            jnp.zeros((1, 8)),
            dummy_types,
            jnp.zeros((1, 4, 3)),
            jnp.eye(3)[None],
            jnp.full((1,), 4, jnp.int32),
            jnp.ones((1, 4), bool),
        )
        # output standardization (stored in the checkpoint when the model was
        # trained on standardized targets, tools/train_predictor.py)
        self.y_mean = 0.0
        self.y_std = 1.0
        self.loaded = False
        if model_dir:
            path = os.path.join(model_dir, f"{model_name}.msgpack")
            if os.path.exists(path):
                with open(path, "rb") as fh:
                    blob = fh.read()
                try:
                    ckpt = serialization.from_bytes(
                        {"params": self.params, "y_mean": 0.0, "y_std": 1.0}, blob
                    )
                    params, y_mean, y_std = (
                        ckpt["params"], float(ckpt["y_mean"]), float(ckpt["y_std"])
                    )
                except (ValueError, KeyError):  # legacy raw-params checkpoint
                    params = serialization.from_bytes(self.params, blob)
                    y_mean, y_std = 0.0, 1.0
                # from_bytes restores by tree structure only — verify leaf
                # shapes so a checkpoint trained at different hidden_dim /
                # num_layers cannot be silently mis-loaded
                tmpl_shapes = jax.tree.map(jnp.shape, self.params)
                ckpt_shapes = jax.tree.map(lambda a: tuple(a.shape), params)
                if tmpl_shapes == ckpt_shapes:
                    self.params = params
                    self.y_mean, self.y_std = y_mean, y_std
                    self.loaded = True
                else:
                    logging.warning(
                        f"predictor checkpoint {path} does not match this "
                        f"architecture (hidden_dim/num_layers differ) — "
                        f"keeping random init"
                    )

    @partial(jax.jit, static_argnames=("self",))
    def _forward(self, params, batch: CrystalBatch) -> jax.Array:
        B = batch.batch_size
        out = self.net.apply(
            params,
            jnp.zeros((B, 8)),
            batch.atom_types,
            batch.frac_coords,
            batch.lattice,
            batch.num_atoms,
            batch.mask,
        )
        return out[:, 0]

    def predict(self, structures: List[Structure]) -> np.ndarray:
        ok = [
            s.num_atoms <= self.max_atoms
            and np.isfinite(s.lattice).all()
            and (s.species >= 1).all()
            and (s.species <= 100).all()
            for s in structures
        ]
        usable = [s for s, m in zip(structures, ok) if m]
        out = np.full(len(structures), np.nan)
        if usable:
            batch = CrystalBatch.from_lists(
                [s.species for s in usable],
                [s.frac_coords for s in usable],
                [s.lattice for s in usable],
                max_atoms=self.max_atoms,
            )
            vals = np.asarray(self._forward(self.params, batch), dtype=float)
            out[np.where(ok)[0]] = vals * self.y_std + self.y_mean
        return out


class PropertyPredictor(Calculator):
    """Task-dispatching reward calculator over PropertyGNN models."""

    def __init__(
        self,
        root_dir: str,
        task: str = "band_gap",
        model_dir: str | None = None,
        hidden_dim: int = 128,
        num_layers: int = 4,
        max_atoms: int = 32,
        **kwargs,
    ) -> None:
        super().__init__(root_dir, task)
        if task not in TASK_MODEL_DICT:
            raise ValueError(f"{task} is an unknown task for PropertyPredictor")
        if model_dir is None:
            # in-repo default weights (trained by tools/train_predictor.py on
            # the proxy-label corpus; the reference downloads its ALIGNN
            # checkpoints instead, alignn/prediction.py:209-301)
            default = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "weights", "predictors"
            )
            if os.path.isdir(default):
                model_dir = default
        self.model_dir = model_dir
        self._gnn_kwargs = dict(
            model_dir=model_dir,
            hidden_dim=hidden_dim,
            num_layers=num_layers,
            max_atoms=max_atoms,
        )
        self._models: dict[str, PropertyGNN] = {}

    def _model(self, task: str) -> PropertyGNN:
        name = TASK_MODEL_DICT[task]
        if name not in self._models:
            self._models[name] = PropertyGNN(name, **self._gnn_kwargs)
        return self._models[name]

    def calc(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> np.ndarray:
        structures = samples[0]
        t = self.task

        if t == "vickers_hardness":
            bulk = self._model("bulk_modulus").predict(structures)
            bulk[bulk < 0.0] = 0.0
            shear = self._model("shear_modulus").predict(structures)
            shear[shear < 0.0] = 0.0
            with np.errstate(divide="ignore", invalid="ignore"):
                k = shear / bulk
                results = 0.92 * (k**1.137) * (shear**0.708)  # Tian's model
            results[bulk < 25.0] = 0.151 * shear[bulk < 25.0]  # Teter's model
            results[results < 0.0] = 0.0
            self.save_results(bulk, f"{label}_bulk")
            self.save_results(shear, f"{label}_shear")
        elif t == "pugh_ratio":
            bulk = self._model("bulk_modulus").predict(structures)
            bulk[bulk < 0.0] = 0.0
            shear = self._model("shear_modulus").predict(structures)
            shear[shear <= 0.0] = 0.01
            results = bulk / shear
            self.save_results(bulk, f"{label}_bulk")
            self.save_results(shear, f"{label}_shear")
        elif t == "young_modulus":
            bulk = self._model("bulk_modulus").predict(structures)
            bulk[bulk <= 0.0] = 0.01
            shear = self._model("shear_modulus").predict(structures)
            shear[shear <= 0.0] = 0.01
            results = 9 * bulk * shear / (3 * bulk + shear)
            self.save_results(bulk, f"{label}_bulk")
            self.save_results(shear, f"{label}_shear")
        elif t == "figure_of_merit":
            gap = self._model("band_gap").predict(structures)
            gap[gap < 0.0] = 0.0
            die = self._model("total_dielectric_constant").predict(structures)
            die[die < 0.0] = 0.0
            results = gap * die
            self.save_results(gap, f"{label}_gap")
            self.save_results(die, f"{label}_die")
        else:
            results = self._model(t).predict(structures)

        if t == "band_gap":
            results[results < 0.0] = 0.0

        if t == "magnetic_density":
            # correction: per-atom moment -> density (calc.py:192-203)
            results = results / 0.84
            natom = np.array([s.num_atoms for s in structures], dtype=float)
            volumes = np.array([s.volume for s in structures], dtype=float)
            with np.errstate(divide="ignore", invalid="ignore"):
                results = results * natom / volumes
            results[results < 0.0] = 0.0

        self.save_results(results, label)
        return results
