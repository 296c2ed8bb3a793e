"""Post-RL gen_eval: generation quality + reward shift of an RL-finetuned ckpt.

Parity with the reference workflow where scripts/gen_eval.sh consumes
RL-finetuned checkpoints (/root/reference/scripts/gen_eval.sh:6 points
MODEL_PATH at an RL run's models dir and the README's pipeline diagram ends
with exactly this step). This harness:

1. generates 1024 structures (32 x 32, the reference workload) from the RL
   run's final checkpoint through gen_eval.py — same relax + disordered/
   ordered SUN evaluation as the pretrain artifact
   (`gen_eval_1024_r4_metrics.json`);
2. scores BOTH generations (pretrain + post-RL) with the run's reward node;
3. archives a side-by-side JSON showing what RL bought (reward distribution
   shift) and what it cost (uniqueness/novelty/SUN deltas — reward-seeking
   policies concentrate probability mass, so some diversity loss is the
   expected, now-quantified tradeoff).

    python experiments/post_rl_gen_eval.py \
        ckpt=experiments/results/rl_hhi_rich/models/final name=hhi_rich \
        reward=hhi [pretrain_gen=experiments/results/gen_eval_1024_r4]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def score_extxyz(xyz_path: str, reward_name: str, work_dir: str, label: str):
    """Reward stats of every structure in an extxyz file."""
    from matinvent_tpu.chem.structure import read_extxyz
    from matinvent_tpu.utils.config import instantiate, load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs"), "base", overrides=[f"reward={reward_name}"]
    )
    strucs = read_extxyz(xyz_path)
    # reward root_dirs are cwd-relative (the pipeline chdirs into its run
    # dir); score from inside work_dir so artifacts land there
    cwd = os.getcwd()
    os.makedirs(work_dir, exist_ok=True)
    os.chdir(work_dir)
    try:
        reward = instantiate(cfg["reward"])
        rewards, _, failed = reward.scoring((strucs, xyz_path), label)
    finally:
        os.chdir(cwd)
    ok = rewards[~failed] if failed.any() else rewards
    thr = float(cfg["reward"].get("reward_threshold", 0.8))
    # n = all generated structures; stats below are over the n_scored
    # non-failed subset (scoring failures are excluded, not zero-filled)
    return {
        "n": int(len(strucs)),
        "n_scored": int(len(ok)),
        "reward_mean": round(float(np.mean(ok)), 4),
        "reward_std": round(float(np.std(ok)), 4),
        "reward_p90": round(float(np.percentile(ok, 90)), 4),
        "frac_above_threshold": round(float(np.mean(ok >= thr)), 4),
        "threshold": thr,
    }


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.abspath(kv.get("out", "experiments/results"))
    ckpt = os.path.abspath(
        kv.get("ckpt", "experiments/results/rl_hhi_rich/models/final")
    )
    name = kv.get("name", "hhi_rich")
    reward_name = kv.get("reward", "hhi")
    corpus = os.path.abspath(
        kv.get("corpus", "experiments/data/corpus_r4.extxyz")
    )
    energies = os.path.splitext(corpus)[0] + "_energies.json"
    pretrain_gen = os.path.abspath(
        kv.get("pretrain_gen", "experiments/results/gen_eval_1024_r4")
    )
    hidden = kv.get("hidden", "256")
    layers = kv.get("layers", "6")
    timesteps = kv.get("timesteps", "1000")
    max_atoms = kv.get("max_atoms", "20")

    import gen_eval

    post_dir = os.path.join(out_dir, f"gen_eval_1024_post_{name}")
    if not os.path.exists(os.path.join(post_dir, "metrics.json")):
        gen_eval.main([
            "model=mattergen",
            f"model.model_path={ckpt}",
            f"model.model_cfg.hidden_dim={hidden}",
            f"model.model_cfg.num_layers={layers}",
            "model.model_cfg.time_dim=128",
            f"model.model_cfg.timesteps={timesteps}",
            f"model.sample_cfg.max_atoms={max_atoms}",
            f"output_dir={post_dir}", "batch_size=32", "num_batches=32",
            f"reference_path={corpus}", f"reference_energies={energies}",
            "relax=true", f"num_atoms_from={corpus}",
            "structure_matcher=disordered,ordered",
        ])

    with open(os.path.join(post_dir, "metrics.json")) as fh:
        post_metrics = json.load(fh)
    with open(os.path.join(pretrain_gen, "metrics.json")) as fh:
        pre_metrics = json.load(fh)

    pre_xyz = os.path.join(pretrain_gen, "generated_crystals.extxyz")
    post_xyz = os.path.join(post_dir, "generated_crystals.extxyz")
    summary = {
        "description": (
            "Reference gen_eval.sh workflow on an RL-FINETUNED checkpoint: "
            "1024 structures from the RL-final model vs the same pretrain "
            "the run started from, with SUN metrics and the run's reward "
            "scored on both generations."
        ),
        "ckpt": os.path.relpath(ckpt, repo),
        "reward": reward_name,
        "pretrain": {
            "reward_stats": score_extxyz(pre_xyz, reward_name, post_dir, "pre"),
            "gen_metrics": {
                k: v for k, v in pre_metrics.items() if k != "by_matcher"
            },
        },
        "post_rl": {
            "reward_stats": score_extxyz(post_xyz, reward_name, post_dir, "post"),
            "gen_metrics": {
                k: v for k, v in post_metrics.items() if k != "by_matcher"
            },
        },
    }
    out_json = os.path.join(out_dir, f"post_rl_gen_eval_{name}.json")
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=2)
        fh.write("\n")
    print("[post_rl_gen_eval] " + json.dumps({
        "pre_reward": summary["pretrain"]["reward_stats"]["reward_mean"],
        "post_reward": summary["post_rl"]["reward_stats"]["reward_mean"],
        "pre_sun": summary["pretrain"]["gen_metrics"].get("frac_sun"),
        "post_sun": summary["post_rl"]["gen_metrics"].get("frac_sun"),
        "out": out_json,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
