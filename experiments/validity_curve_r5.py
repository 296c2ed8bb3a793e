"""Validity-vs-training-steps curve for the r5 long EMA pretrain.

Evaluates the validity legs of a LIST of checkpoints in one process, so the
bucketed sampling program compiles once and every checkpoint's params reuse
it (same shapes). Used on the snapshots written by
``validity_fix_r5.py tag=r5_long snap=30000`` (raw + EMA pairs) to answer:
does validity still grow at 150k steps, and what does EMA buy at each point?

    python experiments/validity_curve_r5.py \
        ckpts=pretrained_geneval_r5_r5_long_s30000,pretrained_geneval_r5_r5_long_s30000_ema \
        [sample_n=512] [corpus=experiments/data/corpus_r5.extxyz]

Appends entries to experiments/results/validity_curve_r5.json keyed by
checkpoint basename. Reference validity legs:
/root/reference/pipeline/filters/opt_filter.py:50-63.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "experiments", "results")
    corpus = os.path.abspath(
        kv.get("corpus", os.path.join(repo, "experiments", "data", "corpus_r5.extxyz"))
    )
    names = [c for c in kv.get("ckpts", "").split(",") if c]
    if not names:
        raise SystemExit("pass ckpts=name1,name2,... (relative to experiments/results)")
    sample_n = int(kv.get("sample_n", 512))
    seed = int(kv.get("seed", 1))

    from matinvent_tpu.chem.structure import read_extxyz
    from matinvent_tpu.models.mattergen.sample import MatterGenSampler
    from matinvent_tpu.models.sample import (
        atom_dist_from_structures,
        register_atom_dist,
    )
    from matinvent_tpu.models.suite.mattergen import MatterGenSuite

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "validity_fix_r5",
        os.path.join(repo, "experiments", "validity_fix_r5.py"),
    )
    vf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vf)

    register_atom_dist("corpus", atom_dist_from_structures(read_extxyz(corpus)))
    path = os.path.join(out_dir, "validity_curve_r5.json")
    data = json.load(open(path)) if os.path.exists(path) else {"runs": []}

    sampler = MatterGenSampler(
        batch_size=sample_n, num_batches=1, max_atoms=20,
        num_atoms_distribution="corpus", size_buckets=4, seed=seed,
    )
    for name in names:
        ckpt = name if os.path.isabs(name) else os.path.join(out_dir, name)
        suite = MatterGenSuite(model_path=ckpt, sample_cfg={"max_atoms": 20})
        diffusion, params = suite.load_model()
        t0 = time.time()
        _, strucs = sampler.generate(model=(diffusion, params))
        legs = vf.measure_validity(strucs)
        entry = dict(
            ckpt=os.path.basename(ckpt),
            **legs,
            sample_seconds=round(time.time() - t0, 1),
        )
        data["runs"] = [
            r for r in data["runs"] if r.get("ckpt") != entry["ckpt"]
        ] + [entry]
        with open(path, "w") as fh:
            json.dump(data, fh, indent=2)
            fh.write("\n")
        print("[validity_curve] " + json.dumps(entry), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
