"""RL runs driven by the trained ML property predictors (BASELINE.md
benchmark configs 3 and 4).

Config 3: MatterGen-family + magnetic-density reward — the PropertyPredictor
loads the shipped mp_total_mag_per_atom weights (R^2 ~ 1.0 on the proxy
corpus) and the policy must steer compositions toward magnetic elements.

Config 4: multi-property band gap + bulk modulus (reward=gap_bulk,
reduce=weight) with the OptFilter metrics screen and the LTM/AHC diversity
filter enabled — the full MatInvent loop of the reference
(configs/pipeline/mat_invent.yaml:24-27, reward yamls band_bulk).

Config 5: heat-capacity RL through the MLIP subprocess bridge (reference:
FairChem eSEN-30M-OAM phonon workflow, rewards/calculators/fairchem/
phonon.py) — here the bridge's native Γ-point phonon fallback
(chem/phonon.py) scores every sample, steering compositions toward light
elements (high C_v per gram).

Reuses the demo corpus + pretraining from experiments/rl_demo.py.

    python experiments/rl_predictor_runs.py run=mag|gapbulk|heatcap [iters=60] ...
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_demo():
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "rl_demo", os.path.join(here, "rl_demo.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def summarize(run_dir: str, out_path: str, extra: dict) -> dict:
    import pandas as pd

    df = pd.read_csv(os.path.join(run_dir, "metrics.csv"))
    rewards = df["reward mean"].dropna().to_numpy()
    first = float(np.mean(rewards[:5]))
    last = float(np.mean(rewards[-5:]))
    summary = dict(
        iterations=len(rewards),
        reward_first5_mean=round(first, 4),
        reward_last5_mean=round(last, 4),
        improvement=round(last - first, 4),
        **extra,
        reward_curve=[round(float(r), 4) for r in rewards],
    )
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=2)
        fh.write("\n")
    print("[rl_predictor] " + json.dumps(
        {k: v for k, v in summary.items() if k != "reward_curve"}
    ))
    return summary


def _ensure_diffcsp_pretrain(ckpt_dir: str, data_path: str, timesteps: int) -> None:
    if os.path.exists(os.path.join(ckpt_dir, "state_dict.npz")):
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "pretrain", os.path.join(repo, "tools", "pretrain.py")
    )
    pretrain = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pretrain)
    pretrain.main(
        [f"data={data_path}", f"output_dir={ckpt_dir}", "steps=20000",
         "batch_size=128", "max_atoms=8", "lr=1.5e-3",
         "model.model_cfg.hidden_dim=128", "model.model_cfg.num_layers=4",
         "model.model_cfg.time_dim=128",
         f"model.model_cfg.timesteps={timesteps}"]
    )


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    # any dotted (or +dotted) key is forwarded verbatim as a CLI override —
    # e.g. +sample_cfg.filter.reference.energies_path=... to point the
    # OptFilter's novelty/stability reference at another corpus
    passthrough = [
        f"{k}={v}" for k, v in kv.items() if "." in k
    ]
    kv = {k: v for k, v in kv.items() if "." not in k}
    run = kv.get("run", "mag")
    out_dir = os.path.abspath(kv.get("out", "experiments/results"))
    iters = int(kv.get("iters", 60))
    # MatterGen (continuous VP SDE) is stable at short chains; the DiffCSP
    # discrete cosine schedule needs T >= 200 (ops/schedules.py warning) —
    # run it at the reference operating point T=1000
    timesteps = int(kv.get("timesteps", 1000 if run == "gapbulk" else 100))
    accum = int(kv.get("accum", 50 if run == "gapbulk" else 25))
    batch = int(kv.get("batch", 128))
    os.makedirs(out_dir, exist_ok=True)

    demo = _load_demo()
    data_path = os.path.join(out_dir, "dataset.extxyz")
    if not os.path.exists(data_path):
        demo.make_dataset(data_path)

    if run in ("mag", "heatcap", "hhi"):
        family = "mattergen"
        reward = {"mag": "magnetic_density", "heatcap": "heat_capacity",
                  "hhi": "hhi"}[run]
        expname = {"mag": "rl_mag_density", "heatcap": "rl_heat_capacity",
                   "hhi": "rl_hhi_mattergen"}[run]
        # the time embedding is sinusoidal(t * timesteps): a ckpt pretrained
        # at one T cannot be reused at another — key the ckpt dir by T
        suffix = "" if timesteps == 100 else f"_t{timesteps}"
        ckpt_dir = os.path.join(out_dir, f"pretrained_mattergen{suffix}")
        if not os.path.exists(os.path.join(ckpt_dir, "params.msgpack")):
            demo.pretrain_mattergen(data_path, ckpt_dir, timesteps=timesteps)
        filter_args = ["sample_cfg.filter=null"]
    elif run == "gapbulk":
        # config 4 pins the workload (gap+bulk, filters + LTM), not the
        # model family; family=mattergen reuses the T-keyed pretrain
        family = kv.get("family", "diffcsp")
        reward, expname = "gap_bulk", "rl_gap_bulk"
        if family == "mattergen":
            suffix = "" if timesteps == 100 else f"_t{timesteps}"
            ckpt_dir = os.path.join(out_dir, f"pretrained_mattergen{suffix}")
            if not os.path.exists(os.path.join(ckpt_dir, "params.msgpack")):
                demo.pretrain_mattergen(data_path, ckpt_dir, timesteps=timesteps)
            filter_args = ["sample_cfg.filter.relax=false"]
        else:
            ckpt_dir = os.path.join(out_dir, "pretrained")
            _ensure_diffcsp_pretrain(ckpt_dir, data_path, timesteps)
            filter_args = ["sample_cfg.filter.relax=false"]
    else:
        raise SystemExit(f"unknown run={run}")

    import main as cli

    lr = kv.get("lr", "0.0001")
    sigma = kv.get("sigma", "0.1")
    epochs = kv.get("epochs", "3")
    topk = kv.get("topk", None)
    seed = kv.get("seed", "0")
    expname = kv.get("expname", expname)
    # ckpt=/max_atoms=/num_atoms_file= retarget any config at another
    # pretrain (e.g. the rich-corpus h256/L6 model pretrained_geneval_r4 —
    # the ckpt dir's config.yaml is authoritative for the model shape)
    ckpt_dir = os.path.abspath(kv.get("ckpt", ckpt_dir))
    max_atoms = kv.get("max_atoms", "8")
    # abspath: the pipeline chdirs into the run dir before SampleConfig
    # resolves this path
    num_atoms_file = kv.get("num_atoms_file")
    if num_atoms_file:
        num_atoms_file = os.path.abspath(num_atoms_file)

    cwd = os.getcwd()
    try:
        cli.main(
            [
                f"results_dir={out_dir}", f"expname={expname}", f"seed={seed}",
                f"rl_epoch={iters}", "eval_size=16",
                f"reward={reward}", "logger=csv", f"model={family}",
                f"model.model_path={ckpt_dir}",
                "+model.config_overrides.sample_clip=30.0",
                f"model.sample_cfg.batch_size={batch}",
                f"model.sample_cfg.max_atoms={max_atoms}",
                # draw num-atoms from the pretrain corpus' own histogram:
                # the mp_20 table asks for 5-8 atom cells the corpus-trained
                # model never saw (clamped draws), halving valid samples
                "model.sample_cfg.num_atoms_distribution="
                + kv.get("num_atoms_dist", "matinvent_corpus"),
                f"model.finetune_cfg.timesteps={timesteps}",
                f"pipeline.finetune_cfg.accum_steps={accum}",
                f"pipeline.finetune_cfg.epochs={epochs}",
                f"pipeline.finetune_cfg.sigma={sigma}",
                f"model.finetune_cfg.lr={lr}",
                f"pipeline.save_freq={iters}",
            ]
            + ([f"+model.sample_cfg.num_atoms_distribution_file={num_atoms_file}"]
               if num_atoms_file else [])
            + ([f"pipeline.topk_ratio={topk}"] if topk else [])
            + ([f"pipeline.replay_args.sample_size={kv['replay_sample']}"]
               if "replay_sample" in kv else [])
            + (["pipeline.div_filter=false"] if kv.get("div") == "off" else [])
            + (["+pipeline.finetune_mode=ddpo",
                f"+model.finetune_cfg.ddpo_epochs={kv.get('ddpo_epochs', '1')}"]
               if kv.get("mode") == "ddpo" else [])
            + filter_args
            + passthrough
        )
    finally:
        os.chdir(cwd)

    summarize(
        os.path.join(out_dir, expname),
        os.path.join(out_dir, f"{expname}_summary.json"),
        dict(run=run, family=family, reward=reward, timesteps=timesteps,
             batch=batch),
    )


if __name__ == "__main__":
    main(sys.argv[1:])
