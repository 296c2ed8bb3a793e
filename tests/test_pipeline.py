"""End-to-end RL pipeline tests (SURVEY.md §4 strategy (e)): one-iteration
smoke with the HHI reward (no ML, no network), config engine, filters."""
import os

import numpy as np
import pytest

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.pipeline.filters import OptFilter, ReferenceDataset, invalid_filter
from matinvent_tpu.utils.config import instantiate, load_config, resolve_interpolations

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")


def make_struc(species, a=5.0):
    n = len(species)
    coords = np.linspace(0, 1, n, endpoint=False)[:, None] * np.array([[1, 1, 1]])
    return Structure.from_parameters([a] * 3, [90] * 3, species, coords)


class TestConfig:
    def test_load_defaults_and_interpolation(self):
        cfg = load_config(CONFIG_DIR, "base", overrides=["eval_size=4"])
        assert cfg["pipeline"]["_target_"].endswith("MatInvent")
        # ${calc:'${eval_size} * 12'}
        assert cfg["model"]["sample_cfg"]["batch_size"] == 48
        assert cfg["pipeline"]["finetune_cfg"]["batch_size"] == 4
        assert cfg["sample_cfg"]["max_num"] == 4

    def test_group_and_leaf_overrides(self):
        cfg = load_config(
            CONFIG_DIR, "base",
            overrides=["reward=density", "pipeline.topk_ratio=0.25", "expname=x1"],
        )
        assert cfg["reward"]["prop_cfg"][0]["name"] == "density"
        assert cfg["pipeline"]["topk_ratio"] == 0.25
        assert cfg["expname"] == "x1"

    def test_calc_resolver_is_safe(self):
        with pytest.raises(ValueError):
            resolve_interpolations({"x": "${calc:'__import__(\"os\")'}"})

    def test_instantiate_reward(self, tmp_path):
        cfg = load_config(CONFIG_DIR, "base", overrides=["reward=hhi"])
        os.makedirs(tmp_path / "run", exist_ok=True)
        cwd = os.getcwd()
        try:
            os.chdir(tmp_path / "run")
            reward = instantiate(cfg["reward"])
        finally:
            os.chdir(cwd)
        assert reward.threshold == 0.8
        assert reward.prop_cfg[0]["calculator"].task == "hhi"

    def test_locate_classmethod_target(self, tmp_path):
        # hydra.utils.get_method semantics: dotted attributes after the
        # module resolve too, so factory classmethods are valid _target_s
        ref = instantiate({
            "_target_": (
                "matinvent_tpu.pipeline.filters.ReferenceDataset.from_files"
            ),
        })
        assert ref.structures == [] and ref.hull is None
        from matinvent_tpu.utils.config import locate

        with pytest.raises(ImportError):
            locate("matinvent_tpu.pipeline.filters.NoSuchThing")
        with pytest.raises(ImportError):
            locate("no_such_pkg.no_such_mod.Thing")


class TestFilters:
    def test_invalid_filter(self):
        good = make_struc([11, 17])
        bad = Structure.from_parameters(
            [5, 5, 5], [90, 90, 90], [11, 17],
            np.array([[0, 0, 0], [0.01, 0, 0]]),
        )
        data, strucs = invalid_filter(["a", "b"], [good, bad])
        assert data == ["a"] and len(strucs) == 1

    def test_opt_filter_metrics(self):
        s1 = make_struc([11, 17])
        s2 = make_struc([11, 17])  # duplicate
        s3 = make_struc([26, 26, 8, 8, 8], a=6.0)
        flt = OptFilter(metrics=["validity", "unique"], relax=False)
        data, strucs, metrics = flt(["a", "b", "c"], [s1, s2, s3])
        assert len(strucs) == 2  # duplicate dropped
        assert metrics["frac_unique"] == pytest.approx(2 / 3)

    def test_opt_filter_novelty_vs_reference(self):
        s1 = make_struc([11, 17])
        s3 = make_struc([26, 26, 8, 8, 8], a=6.0)
        # reference must cover all elements or pre_filter_elements drops the
        # sample first (faithful to opt_filter.py:121-150)
        ref = ReferenceDataset(
            structures=[make_struc([11, 17]), make_struc([26, 8], a=7.5)]
        )
        flt = OptFilter(metrics=["novel"], relax=False, reference=ref)
        data, strucs, metrics = flt(["a", "b"], [s1, s3])
        assert len(strucs) == 1
        assert strucs[0].composition.reduced_formula != "NaCl"

    def test_pre_filter_elements(self):
        ref = ReferenceDataset(structures=[make_struc([11, 17])])
        flt = OptFilter(metrics=["validity"], relax=False, reference=ref)
        data, strucs, energies = flt.pre_filter_elements(
            ["a", "b"], [make_struc([11, 17]), make_struc([26, 8])],
            energies=[-1.0, -2.0],
        )
        assert len(strucs) == 1  # Fe/O unknown to the reference set
        assert energies == [-1.0]  # energies stay aligned with structures


@pytest.mark.slow
class TestEndToEnd:
    def test_one_rl_iteration(self, tmp_path):
        """Full MatInvent loop: sample -> filter -> score -> memory -> finetune."""
        import main as cli

        cwd = os.getcwd()
        try:
            cli.main(
                [
                    f"results_dir={tmp_path}",
                    "expname=smoke",
                    "rl_epoch=1",
                    "eval_size=2",
                    "seed=0",
                    "reward=density",
                    "logger=csv",
                    "model.model_cfg.hidden_dim=32",
                    "model.model_cfg.num_layers=2",
                    "model.model_cfg.time_dim=16",
                    "model.model_cfg.timesteps=10",
                    "model.model_cfg.sample_clip=15.0",
                    "model.sample_cfg.batch_size=6",
                    "model.finetune_cfg.timesteps=10",
                    "pipeline.finetune_cfg.accum_steps=5",
                    "pipeline.finetune_cfg.epochs=1",
                    "pipeline.save_freq=1",
                    # untrained model -> ~0 valid samples; exercise the full
                    # memory/finetune path by disabling the validity gates
                    "sample_cfg.filter=null",
                    "sample_cfg.invalid_filter=false",
                ]
            )
        finally:
            os.chdir(cwd)

        run = tmp_path / "smoke"
        assert (run / "hparams.yaml").exists()
        assert (run / "metrics.csv").exists()
        assert (run / "samples" / "step_0000_valid.extxyz").exists()
        assert (run / "samples" / "long_term_memory.csv").exists()
        assert (run / "models" / "final" / "params.msgpack").exists()
        import pandas as pd

        df = pd.read_csv(run / "metrics.csv")
        assert "reward mean" in df.columns or "crystal_num" in df.columns


@pytest.mark.slow
class TestAsyncSampling:
    def test_async_overlap_run(self, tmp_path):
        """async_sampling=true: 2 iterations complete with overlapped batches."""
        import main as cli

        cwd = os.getcwd()
        try:
            cli.main(
                [
                    f"results_dir={tmp_path}", "expname=as", "rl_epoch=2",
                    "eval_size=2", "seed=0", "reward=density", "logger=csv",
                    "model.model_cfg.hidden_dim=32", "model.model_cfg.num_layers=2",
                    "model.model_cfg.time_dim=16", "model.model_cfg.timesteps=10",
                    "model.model_cfg.sample_clip=15.0",
                    "model.sample_cfg.batch_size=6", "model.finetune_cfg.timesteps=10",
                    "pipeline.finetune_cfg.accum_steps=5",
                    "pipeline.finetune_cfg.epochs=1",
                    "sample_cfg.filter=null", "sample_cfg.invalid_filter=false",
                    "+pipeline.async_sampling=true",
                ]
            )
        finally:
            os.chdir(cwd)
        samples = sorted(os.listdir(tmp_path / "as" / "samples"))
        assert "step_0000_eval.extxyz" in samples
        assert "step_0001_eval.extxyz" in samples


def test_list_index_overrides():
    cfg = load_config(
        CONFIG_DIR, "base",
        overrides=["reward=density", "reward.prop_cfg.0.target=ascending",
                   "reward.prop_cfg.0.maxv=8.0"],
    )
    assert cfg["reward"]["prop_cfg"][0]["target"] == "ascending"
    assert cfg["reward"]["prop_cfg"][0]["maxv"] == 8.0


@pytest.mark.slow
def test_baseline_pipeline_e2e(tmp_path):
    """pipeline=baseline: sampling + scoring only, honors global rl_epoch."""
    import main as cli

    cwd = os.getcwd()
    try:
        cli.main(
            [
                f"results_dir={tmp_path}", "expname=bl", "pipeline=baseline",
                "rl_epoch=2", "eval_size=2", "seed=0", "reward=density",
                "logger=csv",
                "model.model_cfg.hidden_dim=32", "model.model_cfg.num_layers=2",
                "model.model_cfg.time_dim=16", "model.model_cfg.timesteps=10",
                "model.model_cfg.sample_clip=15.0",
                "model.sample_cfg.batch_size=4",
                "pipeline.sample_cfg.batch_size=4",
            ]
        )
    finally:
        os.chdir(cwd)
    import pandas as pd

    df = pd.read_csv(tmp_path / "bl" / "metrics.csv")
    assert len(df) == 2  # rl_epoch honored (was hardcoded 200 before the fix)
    assert not (tmp_path / "bl" / "models" / "final").exists()  # no finetune


def test_wandb_logger_clear_error_without_wandb():
    from matinvent_tpu.pipeline.logger import WandBLogger

    with pytest.raises(ImportError, match="wandb is not installed"):
        WandBLogger(name="x", project="y")


@pytest.mark.slow
def test_conditional_mattergen_e2e(tmp_path):
    """model=mattergen_mag_density: properties_to_condition_on + guidance flow
    through sample -> finetune (the conditions kwarg reaches FinetuneStep and
    the conditional rl_chunk_loss; VERDICT r1 weak #8)."""
    import main as cli

    cwd = os.getcwd()
    try:
        cli.main(
            [
                f"results_dir={tmp_path}", "expname=cond", "rl_epoch=1",
                "eval_size=2", "seed=0", "reward=density", "logger=csv",
                "model=mattergen_mag_density",
                "model.model_cfg.hidden_dim=32", "model.model_cfg.num_layers=2",
                "model.model_cfg.time_dim=16", "model.model_cfg.timesteps=10",
                "model.sample_cfg.batch_size=4",
                "model.sample_cfg.max_atoms=6",
                "model.finetune_cfg.timesteps=10",
                "pipeline.finetune_cfg.accum_steps=5",
                "pipeline.finetune_cfg.epochs=1",
                "sample_cfg.filter=null", "sample_cfg.invalid_filter=false",
            ]
        )
    finally:
        os.chdir(cwd)
    import pandas as pd

    run = tmp_path / "cond"
    df = pd.read_csv(run / "metrics.csv")
    assert len(df) == 1
    assert (run / "models" / "final" / "params.msgpack").exists()


def test_diffcsp_rejects_conditions():
    """DiffCSP is unconditional: a non-None conditions kwarg must fail loudly
    instead of being silently dropped (or crashing with a TypeError)."""
    import jax
    import jax.numpy as jnp

    from matinvent_tpu.models.diffcsp import DiffCSPConfig, DiffCSPDiffusion
    from matinvent_tpu.models.batch import CrystalBatch

    d = DiffCSPDiffusion(DiffCSPConfig(
        hidden_dim=16, num_layers=1, time_dim=16, timesteps=4))
    params = d.init_params(jax.random.PRNGKey(0), batch_size=1, max_atoms=4)
    batch = CrystalBatch(
        atom_types=jnp.ones((1, 4), jnp.int32),
        frac_coords=jnp.zeros((1, 4, 3)),
        lattice=jnp.eye(3)[None] * 4.0,
        num_atoms=jnp.array([4], jnp.int32),
    )
    with pytest.raises(ValueError, match="unconditional"):
        d.rl_chunk_loss(
            params, params, batch, jnp.ones((1,)), jax.random.PRNGKey(1),
            jnp.arange(2), 0.025, conditions={"dft_mag_density": jnp.ones((1,))},
        )


def test_opt_filter_syn_screen_trained_vs_untrained(caplog, tmp_path):
    """'synthesizable' gates on the shipped trained ensemble, but a weightless
    SynScore must warn and skip, not gate on random scores (VERDICT r1 weak #9)."""
    import logging as _logging

    from matinvent_tpu.rewards.calculators.syn_score import SynScore

    # default: the in-repo trained ensemble loads and the screen is active
    flt = OptFilter(metrics=["validity", "synthesizable"], relax=False)
    assert flt.syn_calculator is not None and flt.syn_calculator.trained
    s1, s2 = make_struc([11, 17]), make_struc([26, 26, 8, 8, 8], a=6.0)
    data, strucs, metrics = flt(["a", "b"], [s1, s2])
    assert "frac_synthesizable" in metrics

    # weightless (bad model_path => random init): warn and skip the screen
    untrained = SynScore(
        root_dir=str(tmp_path), model_path=str(tmp_path / "missing.npz")
    )
    assert not untrained.trained
    with caplog.at_level(_logging.WARNING):
        flt = OptFilter(
            metrics=["validity", "synthesizable"], relax=False,
            syn_calculator=untrained,
        )
    assert flt.syn_calculator is None
    assert any("no trained weights" in r.message for r in caplog.records)
    data, strucs, metrics = flt(["a", "b"], [s1, s2])
    assert "frac_synthesizable" not in metrics
    assert len(strucs) == 2  # nothing gated by the skipped screen


@pytest.mark.slow
def test_ddpo_finetune_mode_e2e(tmp_path):
    """finetune_mode=ddpo: policy gradients over recorded trajectories."""
    import main as cli

    cwd = os.getcwd()
    try:
        cli.main(
            [
                f"results_dir={tmp_path}", "expname=dd", "rl_epoch=2",
                "eval_size=2", "seed=0", "reward=density", "logger=csv",
                "model.model_cfg.hidden_dim=32", "model.model_cfg.num_layers=2",
                "model.model_cfg.time_dim=16", "model.model_cfg.timesteps=10",
                "model.model_cfg.sample_clip=15.0",
                "model.sample_cfg.batch_size=6",
                "pipeline.finetune_cfg.accum_steps=5",
                "sample_cfg.filter=null", "sample_cfg.invalid_filter=false",
                "+pipeline.finetune_mode=ddpo",
            ]
        )
    finally:
        os.chdir(cwd)
    import pandas as pd

    df = pd.read_csv(tmp_path / "dd" / "metrics.csv")
    assert len(df) == 2  # both iterations completed with DDPO updates
