"""Uniform model facade (parity with /root/reference/models/suite/base.py:30-59).

A suite knows how to (a) build its diffusion module + load parameters
(pretrained checkpoint or fresh init), (b) hand out a sampler, (c) hand out a
compiled finetune driver, and (d) save checkpoints in a reloadable format.
Models are (diffusion_module, params_pytree) pairs — pure-functional JAX.
"""
from __future__ import annotations

from typing import Any


class ModelSuite:
    def __init__(
        self,
        model_name: str,
        sample_cfg: dict | None = None,
        finetune_cfg: dict | None = None,
        model_path: str | None = None,
        config_overrides: dict | None = None,
        seed: int = 0,
        **kwargs,
    ) -> None:
        self.model_name = model_name
        self.sample_cfg = dict(sample_cfg or {})
        self.finetune_cfg = dict(finetune_cfg or {})
        self.model_path = model_path
        self.config_overrides = dict(config_overrides or {})
        self.seed = seed
        self.cfg = dict(kwargs)

    def resolve_model_config(self, model_cfg: dict | None) -> dict:
        """Model-config precedence shared by all suites: a checkpoint dir's
        config.yaml is authoritative over config-file defaults; only the
        explicit ``config_overrides`` channel applies on top."""
        import yaml
        from pathlib import Path

        cfg = dict(model_cfg or {})
        if self.model_path is not None:
            cfg_file = Path(self.model_path) / "config.yaml"
            if cfg_file.exists():
                with open(cfg_file) as fh:
                    cfg = yaml.safe_load(fh) or {}
        cfg.update(self.config_overrides)
        return cfg

    def load_model(self) -> tuple[Any, Any]:
        raise NotImplementedError

    def get_sampler(self):
        raise NotImplementedError

    def get_finetuner(self, **finetune_cfg):
        raise NotImplementedError

    def save_model(self, params, save_dir: str):
        raise NotImplementedError
