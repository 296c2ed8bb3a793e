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

    # standardize targets; the scaler ships inside the checkpoint and
    # PropertyGNN de-standardizes at predict time
    finite = labels[np.isfinite(labels)]
    y_mean = float(finite.mean())
    y_std = float(max(finite.std(), 1e-6))
    labels_std = (labels - y_mean) / y_std

    gnn = PropertyGNN(
        model_name, hidden_dim=int(kv.get("hidden_dim", 128)),
        num_layers=int(kv.get("num_layers", 4)), max_atoms=max_atoms, seed=seed,
    )
    trainer = PredictorTrainer(gnn, lr=lr)
    rng = np.random.default_rng(seed)
    # held-out split for an honest fit report
    n_val = max(len(structures) // 10, 1)
    perm = rng.permutation(len(structures))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    train_strucs = [structures[i] for i in train_idx]
    batches = labeled_batches(
        train_strucs, labels_std[train_idx], batch_size, max_atoms, rng
    )
    params, history = trainer.train(
        gnn.params, batches, steps, jax.random.PRNGKey(seed),
        log_every=max(steps // 50, 1),
    )

    # validation R^2 in original units
    gnn.params = params
    gnn.y_mean, gnn.y_std = y_mean, y_std
    val_strucs = [structures[i] for i in val_idx]
    usable = [i for i, s in enumerate(val_strucs) if s.num_atoms <= max_atoms]
    preds = gnn.predict([val_strucs[i] for i in usable])
    truth = labels[val_idx][usable]
    ok = np.isfinite(preds) & np.isfinite(truth)
    ss_res = float(np.sum((preds[ok] - truth[ok]) ** 2))
    ss_tot = float(np.sum((truth[ok] - truth[ok].mean()) ** 2))
    r2 = 1.0 - ss_res / max(ss_tot, 1e-12)
    mae = float(np.mean(np.abs(preds[ok] - truth[ok])))
    logging.info(f"validation: R2={r2:.4f} MAE={mae:.4f} (n={int(ok.sum())})")

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{model_name}.msgpack")
    ckpt = {"params": jax.device_get(params), "y_mean": y_mean, "y_std": y_std}
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(ckpt))
    # label provenance travels with the weights: val_r2 is measured against
    # whatever produced the labels file, which for the shipped weights is the
    # analytic proxy-label corpus — not DFT data
    label_source = kv.get("label_source", labels_path)
    with open(os.path.join(output_dir, f"{model_name}.meta.txt"), "w") as fh:
        fh.write(f"val_r2={r2:.5f}\nval_mae={mae:.5f}\nsteps={steps}\n"
                 f"y_mean={y_mean}\ny_std={y_std}\n"
                 f"labels={label_source}\n")
    logging.info(f"saved predictor to {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
