"""MatterGen model suite (parity with /root/reference/models/suite/mattergen.py:33-131).

Pretrained variants mirror the reference's AVA_MODEL_NAME list; conditional
variants declare their condition fields so the score net allocates conditioning
embeddings. Without a model_path, parameters are freshly initialized (no HF
hub in this environment — the reference downloads checkpoints there).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import yaml
from flax import serialization

from matinvent_tpu.models.mattergen.diffusion import (
    MatterGenConfig,
    MatterGenDiffusion,
)
from matinvent_tpu.models.mattergen.sample import MatterGenSampler
from matinvent_tpu.models.suite.base import ModelSuite
from matinvent_tpu.parallel.train import FinetuneStep

# condition fields per pretrained variant (models/suite/mattergen.py:21-30)
AVA_MODEL_NAMES = {
    "mattergen_base": (),
    "mattergen_chemical_system": ("chemical_system",),
    "mattergen_space_group": ("space_group",),
    "mattergen_dft_mag_density": ("dft_mag_density",),
    "mattergen_dft_band_gap": ("dft_band_gap",),
    "mattergen_ml_bulk_modulus": ("ml_bulk_modulus",),
    "mattergen_dft_mag_density_hhi_score": ("dft_mag_density", "hhi_score"),
    "mattergen_chemical_system_energy_above_hull": (
        "chemical_system",
        "energy_above_hull",
    ),
}


class MatterGenSuite(ModelSuite):
    def __init__(
        self,
        model_name: str = "mattergen_base",
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
        if model_name not in AVA_MODEL_NAMES:
            raise ValueError(
                f"unknown MatterGen variant {model_name}; available: "
                f"{sorted(AVA_MODEL_NAMES)}"
            )
        cfg_kwargs = dict(model_cfg or {})
        # checkpoint config is authoritative over config-file model defaults;
        # only explicit `config_overrides` apply on top
        if model_path is not None:
            cfg_file = Path(model_path) / "config.yaml"
            if cfg_file.exists():
                with open(cfg_file) as fh:
                    cfg_kwargs = yaml.safe_load(fh) or {}
        cfg_kwargs.update(self.config_overrides)
        cfg_kwargs.setdefault("condition_fields", AVA_MODEL_NAMES[model_name])
        if isinstance(cfg_kwargs.get("condition_fields"), list):
            cfg_kwargs["condition_fields"] = tuple(cfg_kwargs["condition_fields"])
        if isinstance(cfg_kwargs.get("condition_stats"), list):
            # yaml round-trip: [[field, mean, std], ...] -> ((field, mean, std), ...)
            cfg_kwargs["condition_stats"] = tuple(
                tuple(e) for e in cfg_kwargs["condition_stats"]
            )
        valid = set(MatterGenConfig.__dataclass_fields__)
        self.model_config = MatterGenConfig(
            **{k: v for k, v in cfg_kwargs.items() if k in valid}
        )
        self.diffusion = MatterGenDiffusion(self.model_config)

    def load_model(self) -> tuple[MatterGenDiffusion, Any]:
        if self.model_path is None:
            return self.diffusion, self.diffusion.init_params(
                jax.random.PRNGKey(self.seed)
            )
        msgpack = Path(self.model_path) / "params.msgpack"
        if msgpack.exists():
            template = self.diffusion.init_params(jax.random.PRNGKey(0))
            with open(msgpack, "rb") as fh:
                params = serialization.from_bytes(template, fh.read())
            return self.diffusion, params

        # torch container (reference save format, mattergen.py:120-131):
        # import in place. GemNet-package checkpoints are rejected with a
        # clear architectural-incompatibility error (mattergen_import).
        ckpts = sorted(Path(self.model_path).glob("*.ckpt"))
        if not ckpts:
            raise FileNotFoundError(
                f"no params.msgpack or *.ckpt under {self.model_path} — "
                "convert checkpoints with tools/convert_mattergen_ckpt.py"
            )
        ckpt = next((c for c in ckpts if "last" in c.name), ckpts[-1])
        import torch

        from matinvent_tpu.models.suite.mattergen_import import (
            mattergen_params_from_state_dict,
        )

        raw = torch.load(str(ckpt), map_location="cpu", weights_only=False)
        sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        sd = {
            k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()
        }
        template = self.diffusion.init_params(jax.random.PRNGKey(0))
        params = mattergen_params_from_state_dict(sd, template)
        params = jax.tree.map(jax.numpy.asarray, params)
        return self.diffusion, params

    def get_sampler(self) -> MatterGenSampler:
        return MatterGenSampler(
            batch_size=self.sample_cfg.get("batch_size"),
            num_batches=self.sample_cfg.get("num_batches"),
            num_atoms_distribution=self.sample_cfg.get(
                "num_atoms_distribution", "mp_20"
            ),
            num_atoms_distribution_file=self.sample_cfg.get(
                "num_atoms_distribution_file"
            ),
            max_atoms=self.sample_cfg.get("max_atoms", 20),
            diffusion_guidance_factor=self.sample_cfg.get(
                "diffusion_guidance_factor", 0.0
            ),
            properties_to_condition_on=self.sample_cfg.get(
                "properties_to_condition_on"
            ),
            target_compositions_dict=self.sample_cfg.get("target_compositions_dict"),
            record_trajectories=self.sample_cfg.get("record_trajectories", False),
            seed=self.seed,
        )

    def get_finetuner(self, **finetune_cfg) -> FinetuneStep:
        return FinetuneStep(
            self.diffusion,
            lr=float(finetune_cfg.get("lr", 1e-5)),
            timesteps=int(finetune_cfg.get("timesteps", self.model_config.timesteps)),
            accum_steps=int(finetune_cfg.get("accum_steps", 50)),
            sigma_kl=float(finetune_cfg.get("sigma", 0.025)),
            epochs=int(finetune_cfg.get("epochs", 3)),
        )

    def save_model(self, params, save_dir: str) -> None:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "params.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(jax.device_get(params)))
        # torch-style flat state_dict for interoperability (same bridge the
        # loader and tools/convert_mattergen_ckpt.py use)
        import numpy as np

        from matinvent_tpu.models.suite.mattergen_import import (
            mattergen_state_dict_from_params,
        )

        sd = mattergen_state_dict_from_params(jax.device_get(params))
        np.savez(os.path.join(save_dir, "state_dict.npz"), **sd)
        def _yamlable(v):
            # recursive tuple -> list (yaml.safe_dump rejects tuples;
            # condition_stats nests them)
            if isinstance(v, tuple):
                return [_yamlable(e) for e in v]
            return v

        cfg = {
            k: _yamlable(getattr(self.model_config, k))
            for k in MatterGenConfig.__dataclass_fields__
        }
        with open(os.path.join(save_dir, "config.yaml"), "w") as fh:
            yaml.safe_dump(cfg, fh)
