"""Convert MatterGen-class checkpoints between torch and native formats.

Bridges the reference's checkpoint container
(``{"state_dict": ..., "config": ...} -> last.ckpt``,
/root/reference/models/suite/mattergen.py:120-131) and this framework's
native format (``params.msgpack`` + ``config.yaml``), in both directions:

    # torch container -> native (import an RL/finetuned checkpoint)
    python tools/convert_mattergen_ckpt.py to_native in=<last.ckpt> out=<dir> \
        [config=<config.yaml>] [hidden_dim=256 num_layers=6 ...]

    # native -> torch container (hand a checkpoint back to torch tooling)
    python tools/convert_mattergen_ckpt.py to_torch in=<native_dir> out=<dir>

Published GemNet-based MatterGen checkpoints (the external `mattergen`
package's pretrained weights) are a *different architecture* from this
framework's TPU-first score network and are detected and rejected with an
explanation: weights cannot be linearly mapped across architectures. The
supported path for those is distillation — tools/distill_mattergen.py
generates (noised batch, per-field score) pairs with the torch model across
the time grid and trains this network to match. What CAN be converted 1:1 is any
checkpoint whose state_dict matches this framework's score network layout
(i.e. checkpoints exported by this tool / MatterGenSuite.save_model, round
-tripped through torch land and back).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def _load_torch_ckpt(path: str) -> tuple[dict, dict | None]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd, cfg = ckpt["state_dict"], ckpt.get("config")
    else:
        sd, cfg = ckpt, None
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    return sd, cfg


def to_native(argv: list[str]) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax import serialization

    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
    )
    from matinvent_tpu.models.suite.mattergen_import import (
        mattergen_params_from_state_dict,
    )

    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    in_path, out_dir = kv.pop("in"), kv.pop("out")
    sd, embedded_cfg = _load_torch_ckpt(in_path)

    cfg_kwargs: dict = {}
    if isinstance(embedded_cfg, dict):
        cfg_kwargs.update(embedded_cfg)
    cfg_file = kv.pop("config", None)
    if cfg_file:
        with open(cfg_file) as fh:
            cfg_kwargs.update(yaml.safe_load(fh) or {})
    for k, v in kv.items():  # CLI overrides, e.g. hidden_dim=256
        try:
            cfg_kwargs[k] = yaml.safe_load(v)
        except yaml.YAMLError:
            cfg_kwargs[k] = v
    if isinstance(cfg_kwargs.get("condition_fields"), list):
        cfg_kwargs["condition_fields"] = tuple(cfg_kwargs["condition_fields"])
    valid = set(MatterGenConfig.__dataclass_fields__)
    config = MatterGenConfig(**{k: v for k, v in cfg_kwargs.items() if k in valid})

    diffusion = MatterGenDiffusion(config)
    template = diffusion.init_params(jax.random.PRNGKey(0))
    params = mattergen_params_from_state_dict(sd, template)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))
    out_cfg = {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in ((k, getattr(config, k)) for k in valid)
    }
    with open(os.path.join(out_dir, "config.yaml"), "w") as fh:
        yaml.safe_dump(out_cfg, fh)
    print(f"converted {in_path} -> {out_dir}/params.msgpack (+config.yaml)")


def to_torch(argv: list[str]) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch
    from flax import serialization

    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
    )
    from matinvent_tpu.models.suite.mattergen_import import (
        mattergen_state_dict_from_params,
    )

    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    in_dir, out_dir = kv["in"], kv["out"]
    with open(os.path.join(in_dir, "config.yaml")) as fh:
        cfg_kwargs = yaml.safe_load(fh)
    if isinstance(cfg_kwargs.get("condition_fields"), list):
        cfg_kwargs["condition_fields"] = tuple(cfg_kwargs["condition_fields"])
    valid = set(MatterGenConfig.__dataclass_fields__)
    config = MatterGenConfig(**{k: v for k, v in cfg_kwargs.items() if k in valid})
    diffusion = MatterGenDiffusion(config)
    template = diffusion.init_params(jax.random.PRNGKey(0))
    with open(os.path.join(in_dir, "params.msgpack"), "rb") as fh:
        params = serialization.from_bytes(template, fh.read())

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in mattergen_state_dict_from_params(params).items()
    }
    cfg_out = {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in ((k, getattr(config, k)) for k in valid)
    }
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "last.ckpt")
    torch.save({"state_dict": sd, "config": cfg_out}, out_path)
    with open(os.path.join(out_dir, "config.yaml"), "w") as fh:
        yaml.safe_dump(cfg_out, fh)
    print(f"converted {in_dir} -> {out_path} (+config.yaml)")


def main(argv: list[str]) -> None:
    if not argv or argv[0] not in ("to_native", "to_torch"):
        raise SystemExit(__doc__)
    (to_native if argv[0] == "to_native" else to_torch)(argv[1:])


if __name__ == "__main__":
    main(sys.argv[1:])
