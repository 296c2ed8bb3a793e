"""DiffCSP model suite (parity with /root/reference/models/suite/diffcsp.py:25-145).

Loads parameters from (a) a native checkpoint dir (``params.msgpack`` +
``config.yaml``), (b) a reference-format torch ``last.ckpt`` (imported via
torch_import), or (c) fresh initialization when no path is given (this
environment has no HF hub access; the reference downloads from
``jwchen25/MatInvent`` in that case).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
import yaml
from flax import serialization

from matinvent_tpu.models.diffcsp import DiffCSPConfig, DiffCSPDiffusion
from matinvent_tpu.models.sample import DiffCSPSampler
from matinvent_tpu.models.suite.base import ModelSuite
from matinvent_tpu.models.suite.torch_import import (
    cspnet_params_from_state_dict,
    cspnet_state_dict_from_params,
    load_torch_checkpoint,
)
from matinvent_tpu.parallel.train import FinetuneStep


def _torch_load_scaler(path: str):
    """torch.load a pickled reference scaler, shimming its class module.

    Reference ``lattice_scaler.pt`` files pickle
    ``models.diffcsp.utils.StandardScalerTorch`` by module path; that module
    does not exist here, so a stub exposing a compatible class (plain
    attribute bag with ``means``/``stds``) is registered before unpickling.
    """
    import sys
    import types

    import torch

    mod_name = "models.diffcsp.utils"
    if mod_name not in sys.modules:
        class _ScalerStub:  # noqa: N801 - unpickle target
            def __setstate__(self, state):
                self.__dict__.update(state)

        pkg_models = types.ModuleType("models")
        pkg_diffcsp = types.ModuleType("models.diffcsp")
        mod_utils = types.ModuleType(mod_name)
        mod_utils.StandardScalerTorch = _ScalerStub
        for name, mod in (
            ("models", pkg_models),
            ("models.diffcsp", pkg_diffcsp),
            (mod_name, mod_utils),
        ):
            sys.modules.setdefault(name, mod)
    return torch.load(path, map_location="cpu", weights_only=False)


class DiffCSPSuite(ModelSuite):
    def __init__(
        self,
        model_name: str = "diffcsp",
        sample_cfg: dict | None = None,
        finetune_cfg: dict | None = None,
        model_path: str | None = None,
        model_cfg: dict | None = None,
        config_overrides: dict | None = None,
        seed: int = 0,
        **kwargs,
    ) -> None:
        super().__init__(
            model_name=model_name,
            sample_cfg=sample_cfg,
            finetune_cfg=finetune_cfg,
            model_path=model_path,
            config_overrides=config_overrides,
            seed=seed,
            **kwargs,
        )
        cfg_kwargs = self.resolve_model_config(model_cfg)
        valid = set(DiffCSPConfig.__dataclass_fields__)
        self.model_config = DiffCSPConfig(
            **{k: v for k, v in cfg_kwargs.items() if k in valid}
        )
        self.diffusion = DiffCSPDiffusion(self.model_config)
        self.lattice_scaler = None
        self.prop_scaler = None

    # ------------------------------------------------------------------ load
    def load_model(self) -> tuple[DiffCSPDiffusion, Any]:
        if self.model_path is None:
            params = self.diffusion.init_params(jax.random.PRNGKey(self.seed))
            return self.diffusion, params

        path = Path(self.model_path)
        msgpack = path / "params.msgpack"
        if msgpack.exists():
            template = self.diffusion.init_params(jax.random.PRNGKey(0))
            with open(msgpack, "rb") as fh:
                params = serialization.from_bytes(template, fh.read())
            self._load_scalers(path)
            return self.diffusion, params

        # reference-format torch checkpoints: prefer last.ckpt, else newest
        ckpts = sorted(path.glob("*.ckpt"))
        ckpt = None
        for ck in ckpts:
            if "last" in ck.name:
                ckpt = ck
        if ckpt is None and ckpts:
            ckpt = ckpts[-1]
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint found under {path}")
        sd = load_torch_checkpoint(str(ckpt))
        params = cspnet_params_from_state_dict(
            sd, num_layers=self.model_config.num_layers, ln=self.model_config.ln
        )
        params = jax.tree.map(jax.numpy.asarray, params)
        self._load_scalers(path)
        return self.diffusion, params

    def _load_scalers(self, path: Path) -> None:
        """Ingest lattice/prop scalers shipped with reference checkpoints
        (models/suite/diffcsp.py:97-103: ``lattice_scaler.pt`` /
        ``prop_scaler.pt``) or with native ones (``scalers.npz``).

        The scalers are attached to the suite and the diffusion module, same
        as the reference attaches them to its lightning module. Note the
        reference's RL sampling/finetune paths never call
        transform/inverse_transform on them (grep: models/suite/diffcsp.py is
        the sole touch point) — the diffusion operates on raw lattices; they
        are carried for property-prediction consumers and round-tripped on
        save so a converted checkpoint loses nothing.
        """
        from matinvent_tpu.utils.scaler import StandardScaler

        self.lattice_scaler = None
        self.prop_scaler = None
        npz = path / "scalers.npz"
        if npz.exists():
            data = np.load(npz)
            if "lattice_means" in data:
                self.lattice_scaler = StandardScaler(
                    data["lattice_means"], data["lattice_stds"]
                )
            if "prop_means" in data:
                self.prop_scaler = StandardScaler(
                    data["prop_means"], data["prop_stds"]
                )
        else:
            for attr, fname in (
                ("lattice_scaler", "lattice_scaler.pt"),
                ("prop_scaler", "prop_scaler.pt"),
            ):
                f = path / fname
                if not f.exists():
                    continue
                obj = _torch_load_scaler(str(f))
                if isinstance(obj, dict):
                    means, stds = obj["means"], obj["stds"]
                else:
                    means, stds = obj.means, obj.stds
                means = np.asarray(
                    means.numpy() if hasattr(means, "numpy") else means
                )
                stds = np.asarray(stds.numpy() if hasattr(stds, "numpy") else stds)
                setattr(self, attr, StandardScaler(means, stds))
        self.diffusion.lattice_scaler = self.lattice_scaler
        self.diffusion.prop_scaler = self.prop_scaler

    # --------------------------------------------------------------- drivers
    def get_sampler(self) -> DiffCSPSampler:
        return DiffCSPSampler(
            batch_size=self.sample_cfg.get("batch_size"),
            num_batches=self.sample_cfg.get("num_batches"),
            num_atoms_distribution=self.sample_cfg.get(
                "num_atoms_distribution", "mp_20"
            ),
            num_atoms_distribution_file=self.sample_cfg.get(
                "num_atoms_distribution_file"
            ),
            max_atoms=self.sample_cfg.get("max_atoms", 20),
            step_lr=self.sample_cfg.get("step_lr"),
            seed=self.seed,
        )

    def get_finetuner(self, **finetune_cfg) -> FinetuneStep:
        return FinetuneStep(
            self.diffusion,
            lr=float(finetune_cfg.get("lr", 1e-4)),
            timesteps=int(finetune_cfg.get("timesteps", self.model_config.timesteps)),
            accum_steps=int(finetune_cfg.get("accum_steps", 50)),
            sigma_kl=float(finetune_cfg.get("sigma", 0.025)),
            epochs=int(finetune_cfg.get("epochs", 3)),
        )

    # ------------------------------------------------------------------ save
    def save_model(self, params, save_dir: str) -> None:
        """Native msgpack + config.yaml, plus a reference-compatible torch
        state_dict (numpy npz) for interoperability."""
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "params.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(jax.device_get(params)))
        cfg = {
            k: getattr(self.model_config, k)
            for k in DiffCSPConfig.__dataclass_fields__
        }
        with open(os.path.join(save_dir, "config.yaml"), "w") as fh:
            yaml.safe_dump(cfg, fh)
        sd = cspnet_state_dict_from_params(jax.device_get(params))
        np.savez(os.path.join(save_dir, "state_dict.npz"), **sd)
        # round-trip the ingested scalers so converted checkpoints lose
        # nothing (reference ships lattice_scaler.pt/prop_scaler.pt)
        scaler_arrays = {}
        if self.lattice_scaler is not None:
            scaler_arrays["lattice_means"] = np.asarray(self.lattice_scaler.means)
            scaler_arrays["lattice_stds"] = np.asarray(self.lattice_scaler.stds)
        if self.prop_scaler is not None:
            scaler_arrays["prop_means"] = np.asarray(self.prop_scaler.means)
            scaler_arrays["prop_stds"] = np.asarray(self.prop_scaler.stds)
        if scaler_arrays:
            np.savez(os.path.join(save_dir, "scalers.npz"), **scaler_arrays)
