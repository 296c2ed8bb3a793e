"""Checkpoint/resume round-trip and the gen_eval CLI."""
import json
import os

import numpy as np
import pytest


COMMON = [
    "rl_epoch=2", "eval_size=2", "seed=0", "reward=density", "logger=csv",
    "model.model_cfg.hidden_dim=32", "model.model_cfg.num_layers=2",
    "model.model_cfg.time_dim=16", "model.model_cfg.timesteps=10",
    "model.model_cfg.sample_clip=15.0",
    "model.sample_cfg.batch_size=6", "model.finetune_cfg.timesteps=10",
    "pipeline.finetune_cfg.accum_steps=5", "pipeline.finetune_cfg.epochs=1",
    "sample_cfg.filter=null", "sample_cfg.invalid_filter=false",
]


@pytest.mark.slow
def test_resume_continues_from_saved_state(tmp_path):
    import main as cli

    cwd = os.getcwd()
    try:
        # run 1 iteration (rl_epoch=1), then resume to finish 2
        cli.main([f"results_dir={tmp_path}", "expname=r", "rl_epoch=1"] + COMMON[1:])
        os.chdir(cwd)
        state = tmp_path / "r" / "state" / "run_state.pkl"
        assert state.exists()
        cli.main(
            [f"results_dir={tmp_path}", "expname=r", "pipeline.resume=true"] + COMMON
        )
    finally:
        os.chdir(cwd)

    # both steps produced sample artifacts; step 0 was NOT re-run after resume
    samples = sorted(os.listdir(tmp_path / "r" / "samples"))
    assert "step_0000_valid.extxyz" in samples
    assert "step_0001_valid.extxyz" in samples
    import pickle

    with open(tmp_path / "r" / "state" / "run_state.pkl", "rb") as fh:
        host = pickle.load(fh)
    assert host["step"] == 1
    assert host["cost"] == 4  # 2 evals per iteration, never double-counted


@pytest.mark.slow
def test_gen_eval_cli(tmp_path):
    import gen_eval

    out = tmp_path / "gen"
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        gen_eval.main(
            [
                "model=diffcsp",
                "model.model_cfg.hidden_dim=32",
                "model.model_cfg.num_layers=2",
                "model.model_cfg.time_dim=16",
                "model.model_cfg.timesteps=10",
                "model.model_cfg.sample_clip=15.0",
                "model.sample_cfg.batch_size=4",
                f"output_dir={out}",
                "batch_size=4",
                "num_batches=2",
            ]
        )
    finally:
        os.chdir(cwd)
    assert (out / "generated_crystals.extxyz").exists()
    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["num_generated"] == 8
    assert "frac_unique" in metrics and "frac_validity" in metrics


@pytest.mark.slow
def test_gen_eval_multi_matcher(tmp_path):
    """Comma-separated tiers: one relax/generation pass, metrics per tier;
    the first tier is the headline and by_matcher holds all of them."""
    import gen_eval

    out = tmp_path / "gen"
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        gen_eval.main(
            [
                "model=diffcsp",
                "model.model_cfg.hidden_dim=32",
                "model.model_cfg.num_layers=2",
                "model.model_cfg.time_dim=16",
                "model.model_cfg.timesteps=10",
                "model.model_cfg.sample_clip=15.0",
                "model.sample_cfg.batch_size=4",
                f"output_dir={out}",
                "batch_size=4",
                "num_batches=1",
                "structure_matcher=disordered,fast",
            ]
        )
    finally:
        os.chdir(cwd)
    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["structure_matcher"] == "disordered"
    assert set(metrics["by_matcher"]) == {"disordered", "fast"}
    # headline numbers == the first tier's numbers
    assert (
        metrics["frac_unique"]
        == metrics["by_matcher"]["disordered"]["frac_unique"]
    )
    for tier_metrics in metrics["by_matcher"].values():
        assert "frac_unique" in tier_metrics and "frac_novel" in tier_metrics
