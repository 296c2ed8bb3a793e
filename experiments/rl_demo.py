"""End-to-end RL learning demonstration: HHI supply-risk minimization
(the reference's headline experiment, README.md:54-67 usage).

Pipeline: synthesize a plausible ionic-crystal dataset -> pretrain a small
DiffCSP-class model from scratch (tools/pretrain.py) -> RL-finetune toward
low HHI supply risk with replay + AHC diversity filter -> verify the reward
curve climbs.

Result on TPU v5e (archived in experiments/results/): reward mean
0.04 -> 0.69 over 40 RL iterations; mean HHI 3733 -> 500 while unique
compositions grew 10 -> 108 (composition steering without mode collapse).
Total wall-clock ~9 min incl. 20k pretraining steps.

    python experiments/rl_demo.py [out=experiments/results] [family=diffcsp|mattergen]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(path: str, n: int = 400, seed: int = 0) -> None:
    """Plausible ionic-crystal-like dataset: binary/ternary compositions on
    simple motifs with covalent-radius-derived cell sizes. Motif geometries
    come from the shared registry (chem/motifs.py)."""
    from matinvent_tpu.chem.motifs import (
        BASE_MOTIF_NAMES,
        MOTIFS,
        anion_pool,
        cation_pool,
    )
    from matinvent_tpu.chem.relax import _COVALENT_RADII
    from matinvent_tpu.chem.structure import Structure, save_extxyz

    rng = np.random.default_rng(seed)
    cations = cation_pool()
    anions = anion_pool()

    out = []
    names = list(BASE_MOTIF_NAMES)
    for _ in range(n):
        coords, (n_cat, n_an) = MOTIFS[names[rng.integers(len(names))]]
        cat = int(rng.choice(cations))
        an = int(rng.choice(anions))
        species = [cat] * n_cat + [an] * n_an
        r = _COVALENT_RADII[cat] + _COVALENT_RADII[an]
        a = float(r * rng.uniform(1.7, 2.3))
        jitter = rng.normal(0, 0.01, coords.shape)
        out.append(
            Structure.from_parameters([a] * 3, [90] * 3, species, (coords + jitter) % 1.0)
        )
    save_extxyz(out, path)


def pretrain_mattergen(data_path: str, ckpt_dir: str, steps: int = 20000,
                       timesteps: int = 100, batch_size: int = 128,
                       max_atoms: int = 8, hidden_dim: int = 128,
                       num_layers: int = 4, lr: float = 1.5e-3,
                       ema_decay: float | None = None,
                       snapshot_every: int | None = None,
                       **extra_cfg) -> None:
    """The one MatterGen-family pretrain recipe, shared by every experiment
    driver (rl_predictor_runs.py, gen_eval_run.py import it from here).
    ``extra_cfg`` forwards additional MatterGenConfig fields (e.g.
    d3pm_kind='absorbing' — the published MatterGen's masked type chain).
    With ``ema_decay`` the saved checkpoint holds the EMA weights (the
    published MatterGen samples from EMA) and ``snapshot_every`` archives
    intermediate raw+EMA checkpoints as ``{ckpt_dir}_s{step}[_ema]`` for
    validity-vs-steps curves."""
    import jax
    import numpy as np

    from matinvent_tpu.chem.structure import read_extxyz
    from matinvent_tpu.models.suite.mattergen import MatterGenSuite
    from matinvent_tpu.parallel.pretrain import PretrainTrainer, structures_to_batches

    suite = MatterGenSuite(
        model_cfg=dict(hidden_dim=hidden_dim, num_layers=num_layers,
                       time_dim=128, timesteps=timesteps, **extra_cfg),
        sample_cfg={"max_atoms": max_atoms},
    )
    diffusion, params = suite.load_model()
    structures = read_extxyz(data_path)
    rng = np.random.default_rng(0)
    batches = structures_to_batches(structures, batch_size, max_atoms, rng)
    trainer = PretrainTrainer(
        diffusion, lr=lr, total_steps=steps, ema_decay=ema_decay,
    )

    def snapshot(step, p, ema):
        suite.save_model(jax.device_get(p), f"{ckpt_dir}_s{step}")
        if ema is not None:
            suite.save_model(jax.device_get(ema), f"{ckpt_dir}_s{step}_ema")

    params, _ = trainer.train(
        params, batches, steps, jax.random.PRNGKey(0),
        log_every=max(steps // 20, 1),
        snapshot_every=snapshot_every,
        snapshot_cb=snapshot if snapshot_every else None,
    )
    suite.save_model(params, ckpt_dir)


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out_dir = os.path.abspath(kv.get("out", "experiments/results"))
    family = kv.get("family", "diffcsp")
    iters = int(kv.get("iters", 40))
    # DiffCSP's discrete cosine schedule is unstable below ~200 ancestral
    # steps (ops/schedules.py); MatterGen's continuous SDE handles short
    # chains fine
    timesteps = int(kv.get("timesteps", 100 if family == "mattergen" else 1000))
    epochs = int(kv.get("epochs", 3))
    # DiffCSP runs at the reference T=1000: accum 50 (20 updates/epoch) is
    # the validated-stable reference operating point — 25 doubles the
    # update count and the finetune walks off the valid manifold within
    # ~15 iterations (A/B'd on-chip). MatterGen's short-chain runs are
    # robust at 25.
    accum = int(kv.get("accum", 25 if family == "mattergen" else 50))
    sigma = float(kv.get("sigma", 0.1))
    batch = int(kv.get("batch", 128))
    mode = kv.get("mode", "reward_weighted")
    expname = kv.get("expname", "rl_hhi")
    # DDPO's measured working recipe is family-dependent: DiffCSP needs
    # lr 3e-6 + grad clipping (at 1e-5+ the policy collapses off the valid
    # manifold), while MatterGen's continuous-SDE log-probs produce much
    # smaller PPO gradients — flat at 3e-6/1e-5, climbs 0.44->0.92 at
    # lr 3e-4 x 2 epochs (rl_ddpo_mg_* sweep, experiments/results/).
    # MatterGen's lr must also be T-SCALED: the PPO log-prob sums T
    # per-step terms, so 3e-4 (tuned at T=100) over-updates 10x at T=1000
    # and collapses the policy after reaching reward 1.0; lr=3e-5 at
    # T=1000 climbs stably to a ~0.9 plateau
    # (rl_hhi_ddpo_mattergen_t1000{,_lr3e4}_summary.json)
    if mode == "ddpo":
        default_lr = (3e-4 * 100.0 / timesteps) if family == "mattergen" else 3e-6
        lr = float(kv.get("lr", default_lr))
        ddpo_epochs = int(kv.get("ddpo_epochs", 2 if family == "mattergen" else 1))
    else:
        lr = float(kv.get("lr", 1e-4))
        ddpo_epochs = int(kv.get("ddpo_epochs", 1))
    os.makedirs(out_dir, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    model_cfg = [
        "model.model_cfg.hidden_dim=128",
        "model.model_cfg.num_layers=4",
        "model.model_cfg.time_dim=128",
        f"model.model_cfg.timesteps={timesteps}",
    ]

    data_path = os.path.join(out_dir, "dataset.extxyz")
    make_dataset(data_path)
    print(f"[demo] dataset: {data_path}")

    # pretrain (ckpt= reuses an existing compatible checkpoint dir)
    ckpt_dir = os.path.abspath(kv.get("ckpt", os.path.join(out_dir, "pretrained")))
    if family == "mattergen":
        if not os.path.exists(os.path.join(ckpt_dir, "params.msgpack")):
            pretrain_mattergen(data_path, ckpt_dir, timesteps=timesteps)
    else:
        sys.path.insert(0, os.path.join(repo, "tools"))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "pretrain", os.path.join(repo, "tools", "pretrain.py")
        )
        pretrain = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pretrain)
        pretrain.main(
            [f"data={data_path}", f"output_dir={ckpt_dir}", "steps=20000",
             "batch_size=128", "max_atoms=8", "lr=1.5e-3"] + model_cfg
        )
    print(f"[demo] pretrained: {ckpt_dir}")

    # RL finetune toward maximum density
    import main as cli

    cwd = os.getcwd()
    try:
        cli.main(
            [
                f"results_dir={out_dir}", f"expname={expname}", "seed=0",
                f"rl_epoch={iters}", "eval_size=16",
                # HHI supply-risk minimization: the reference's headline
                # experiment — steers composition toward low-risk elements
                # while the KL anchor keeps geometry on the data manifold
                "reward=hhi", "logger=csv",
                f"model={family if family == 'mattergen' else 'diffcsp'}",
                f"model.model_path={ckpt_dir}",
                "+model.config_overrides.sample_clip=30.0",
                f"model.sample_cfg.batch_size={batch}",
                "model.sample_cfg.max_atoms=8",
                f"model.finetune_cfg.timesteps={timesteps}",
                f"pipeline.finetune_cfg.accum_steps={accum}",
                f"pipeline.finetune_cfg.epochs={epochs}",
                f"pipeline.finetune_cfg.sigma={sigma}",
                f"model.finetune_cfg.lr={lr}",
                f"+model.finetune_cfg.ddpo_epochs={ddpo_epochs}",
                f"+pipeline.finetune_mode={mode}",
                f"pipeline.save_freq={iters}",
                "sample_cfg.filter=null",
            ]
        )
    finally:
        os.chdir(cwd)

    # analyze
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, expname, "metrics.csv"))
    col = "reward mean"
    rewards = df[col].dropna().to_numpy()
    first = float(np.mean(rewards[:5]))
    last = float(np.mean(rewards[-5:]))
    summary = dict(
        iterations=len(rewards),
        reward_first5_mean=round(first, 4),
        reward_last5_mean=round(last, 4),
        improvement=round(last - first, 4),
        reward_curve=[round(float(r), 4) for r in rewards],
    )
    summary_name = (
        "summary.json" if expname == "rl_hhi" else f"{expname}_summary.json"
    )
    with open(os.path.join(out_dir, summary_name), "w") as fh:
        json.dump(summary, fh, indent=2)
        fh.write("\n")
    print("[demo] " + json.dumps({k: v for k, v in summary.items() if k != "reward_curve"}))


if __name__ == "__main__":
    main(sys.argv[1:])
