"""Offline gen_eval at the reference workload with non-vacuous SUN metrics.

Reproduces /root/reference/scripts/gen_eval.sh (32 batches x 32 = 1024
structures, relax + stability/uniqueness/novelty evaluation) fully inside
this framework:

1. pretrain the MatterGen-family net on the validity-screened 2000-structure
   reference corpus (experiments/data/reference.extxyz — the same artifact
   the SUN evaluation matches against, built by
   tools/make_reference_dataset.py);
2. generate 1024 structures at the reference batch shape, num-atoms drawn
   from the corpus' own empirical histogram;
3. evaluate frac_validity / frac_unique / frac_novel / frac_stable /
   frac_sun with SoftSphere relaxation against the corpus hull energies.

    python experiments/gen_eval_run.py [steps=30000] [timesteps=1000] [out=...]
"""
from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_demo():
    import importlib.util

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "rl_demo", os.path.join(here, "rl_demo.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    steps = int(kv.get("steps", 30000))
    timesteps = int(kv.get("timesteps", 1000))
    out_dir = os.path.abspath(kv.get("out", "experiments/results"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "experiments", "data")
    corpus = os.path.join(data, "reference.extxyz")

    ckpt_dir = os.path.join(out_dir, "pretrained_geneval")
    if not os.path.exists(os.path.join(ckpt_dir, "params.msgpack")):
        _load_demo().pretrain_mattergen(
            corpus, ckpt_dir, steps=steps, timesteps=timesteps,
            batch_size=256, max_atoms=4,
        )
    print(f"[gen_eval_run] pretrained: {ckpt_dir}", flush=True)

    import gen_eval

    gen_dir = os.path.join(out_dir, "gen_eval_1024")
    gen_eval.main([
        "model=mattergen",
        f"model.model_path={ckpt_dir}",
        "model.model_cfg.hidden_dim=128", "model.model_cfg.num_layers=4",
        "model.model_cfg.time_dim=128", f"model.model_cfg.timesteps={timesteps}",
        "model.sample_cfg.max_atoms=4",
        f"output_dir={gen_dir}", "batch_size=32", "num_batches=32",
        f"reference_path={corpus}",
        f"reference_energies={os.path.join(data, 'reference_energies.json')}",
        "relax=true", f"num_atoms_from={corpus}",
        # headline = the reference-default disordered (anonymized) tier;
        # ordered recorded alongside for context — on this small-cell
        # synthetic corpus anonymized matching collapses most structures
        # onto a handful of prototypes
        "structure_matcher=disordered,ordered",
    ])

    src = os.path.join(gen_dir, "metrics.json")
    dst = os.path.join(out_dir, "gen_eval_1024_metrics.json")
    shutil.copyfile(src, dst)
    with open(src) as fh:
        print("[gen_eval_run] " + json.dumps(json.load(fh)))


if __name__ == "__main__":
    main(sys.argv[1:])
