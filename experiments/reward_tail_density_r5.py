"""Reward-tail density of the r4 rich pretrain corpus, per BASELINE config
(VERDICT r4 next #4 — the recipe-fidelity table's quantified column).

For each benchmark reward (config 2 hhi, config 3 magnetic_density,
config 4 gap_bulk, config 5 heat_capacity) this scores the 12k rich corpus
(experiments/data/corpus_r4.extxyz — what pretrained_geneval_r4 was trained
on) with the SAME reward yaml the RL runs instantiate, and records the
reward distribution: percentiles, frac >= 0.8, frac >= the config's own
threshold. A policy initialized at the pretrain distribution sees exactly
this reward density in its early samples — a sparse tail (frac_ge_0.8 ~
1e-3) is what separates the configs where the reference-default recipe
(lr 1e-4, sigma 0.1, div on — /root/reference/configs/pipeline/
mat_invent.yaml:30-34) learns from those where it stays flat.

Expensive calculators are subsampled (deterministic seed); hhi (composition
table lookup) runs on the full corpus.

    JAX_PLATFORMS=cpu python experiments/reward_tail_density_r5.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from matinvent_tpu.chem.structure import read_extxyz
from matinvent_tpu.utils.config import instantiate, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")

# reward yaml -> subsample size (None = full corpus)
CONFIGS = {
    "hhi": None,
    "magnetic_density": 4000,
    "gap_bulk": 4000,
    "heat_capacity": 400,  # Gamma-phonon per structure: seconds each
}


def main():
    corpus = read_extxyz(
        os.path.join(REPO, "experiments", "data", "corpus_r4.extxyz")
    )
    out = {"corpus": "corpus_r4.extxyz", "corpus_n": len(corpus)}
    rng = np.random.default_rng(0)
    for name, sub in CONFIGS.items():
        strucs = corpus
        if sub is not None and len(corpus) > sub:
            idx = rng.choice(len(corpus), sub, replace=False)
            strucs = [corpus[i] for i in idx]
        cfg = load_config(CONFIG_DIR, "base", overrides=[f"reward={name}"])
        cwd = os.getcwd()
        t0 = time.time()
        with tempfile.TemporaryDirectory() as td:
            try:
                os.chdir(td)
                reward = instantiate(cfg["reward"])
                rewards, _, failed = reward.scoring((strucs, None), label=name)
            finally:
                os.chdir(cwd)
        r = np.asarray(rewards, float)[~np.asarray(failed, bool)]
        thr = float(reward.threshold)
        out[name] = dict(
            n_scored=int(r.size),
            n_failed=int(len(strucs) - r.size),
            threshold=thr,
            frac_ge_0p8=round(float(np.mean(r >= 0.8)), 5),
            frac_ge_threshold=round(float(np.mean(r >= thr)), 5),
            mean=round(float(r.mean()), 4),
            percentiles={
                f"p{p}": round(float(np.percentile(r, p)), 4)
                for p in (50, 90, 99, 99.9)
            },
            seconds=round(time.time() - t0, 1),
        )
        print(f"[tail] {name}: {json.dumps(out[name])}", flush=True)

    path = os.path.join(
        REPO, "experiments", "results", "reward_tail_density_r5.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
