"""Train a GNN property predictor for the reward calculators.

Enables native replacements for the reference's downloaded ALIGNN checkpoints
(SURVEY.md §2.2): train on (structure, property) data — e.g. labels distilled
from a reference predictor or a DFT dataset — and save weights the
PropertyPredictor calculator loads via ``model_dir``.

Usage:
    python tools/train_predictor.py data=<dataset.extxyz> labels=<labels.txt> \
        model_name=mp_bandgap output_dir=<model_dir> [steps=5000] ...
"""
from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
from flax import serialization

from matinvent_tpu.chem.structure import read_extxyz
from matinvent_tpu.pipeline.logger import setup_logging
from matinvent_tpu.rewards.calculators.predictor import PropertyGNN
from matinvent_tpu.parallel.train_predictor import PredictorTrainer, labeled_batches


def main(argv: list[str]) -> None:
    setup_logging()
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    data_path = kv["data"]
    labels_path = kv["labels"]
    model_name = kv.get("model_name", "mp_bandgap")
    output_dir = kv.get("output_dir", "predictors")
    steps = int(kv.get("steps", 5000))
    batch_size = int(kv.get("batch_size", 64))
    lr = float(kv.get("lr", 1e-3))
    max_atoms = int(kv.get("max_atoms", 32))
    seed = int(kv.get("seed", 0))

    structures = read_extxyz(data_path)
    labels = np.loadtxt(labels_path)
    assert len(structures) == len(labels), "data/labels length mismatch"

    gnn = PropertyGNN(
        model_name, hidden_dim=int(kv.get("hidden_dim", 128)),
        num_layers=int(kv.get("num_layers", 4)), max_atoms=max_atoms, seed=seed,
    )
    trainer = PredictorTrainer(gnn, lr=lr)
    rng = np.random.default_rng(seed)
    batches = labeled_batches(structures, labels, batch_size, max_atoms, rng)
    params, history = trainer.train(
        gnn.params, batches, steps, jax.random.PRNGKey(seed),
        log_every=max(steps // 50, 1),
    )

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{model_name}.msgpack")
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))
    logging.info(f"saved predictor to {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
