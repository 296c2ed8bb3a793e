"""Pretrain a DiffCSP-class diffusion model on a structure dataset.

Usage:
    python tools/pretrain.py data=<dataset.extxyz> output_dir=<ckpt_dir> \
        [steps=20000] [batch_size=128] [lr=1e-3] [max_atoms=20] \
        [model.model_cfg.hidden_dim=128 ...]

Produces a checkpoint directory loadable by ``model.model_path=...`` in the
RL pipeline (params.msgpack + config.yaml).
"""
from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from matinvent_tpu.chem.structure import read_extxyz
from matinvent_tpu.models.suite.diffcsp import DiffCSPSuite
from matinvent_tpu.parallel.pretrain import PretrainTrainer, structures_to_batches
from matinvent_tpu.pipeline.logger import setup_logging
from matinvent_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
)


def main(argv: list[str]) -> None:
    setup_logging()
    kv = dict(a.split("=", 1) for a in argv if "=" in a and not a.startswith("model"))
    data_path = kv.pop("data")
    output_dir = kv.pop("output_dir", "pretrained")
    steps = int(kv.pop("steps", 20000))
    batch_size = int(kv.pop("batch_size", 128))
    lr = float(kv.pop("lr", 1e-3))
    max_atoms = int(kv.pop("max_atoms", 20))
    seed = int(kv.pop("seed", 0))
    if kv:
        raise ValueError(f"unknown arguments: {sorted(kv)}")

    model_overrides = [a for a in argv if a.startswith("model")]
    cfg = load_config(CONFIG_DIR, "base", overrides=["model=diffcsp"] + model_overrides)
    suite = DiffCSPSuite(
        model_name="diffcsp",
        model_cfg=cfg["model"].get("model_cfg"),
        sample_cfg={"max_atoms": max_atoms},
        seed=seed,
    )
    diffusion, params = suite.load_model()

    structures = read_extxyz(data_path)
    logging.info(f"loaded {len(structures)} structures from {data_path}")
    rng = np.random.default_rng(seed)
    batches = structures_to_batches(structures, batch_size, max_atoms, rng)

    trainer = PretrainTrainer(diffusion, lr=lr, total_steps=steps)
    params, history = trainer.train(
        params, batches, steps, jax.random.PRNGKey(seed), log_every=max(steps // 50, 1)
    )
    suite.save_model(params, output_dir)
    logging.info(f"saved pretrained checkpoint to {output_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
