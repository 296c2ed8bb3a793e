"""Pretraining and predictor-training: losses must decrease on overfit sets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.models.diffcsp import DiffCSPConfig, DiffCSPDiffusion
from matinvent_tpu.parallel.pretrain import PretrainTrainer, structures_to_batches
from matinvent_tpu.parallel.train_predictor import PredictorTrainer, labeled_batches
from matinvent_tpu.rewards.calculators.predictor import PropertyGNN


def make_dataset(n=16, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.integers(2, 7))
        species = rng.integers(1, 60, k)
        coords = rng.random((k, 3))
        a = float(rng.uniform(3.5, 6.5))
        out.append(Structure.from_parameters([a] * 3, [90] * 3, species, coords))
    return out


@pytest.mark.slow
@pytest.mark.parametrize(
    "family,threshold",
    [("diffcsp", 0.7), ("mattergen", 0.8)],
)
def test_pretrain_loss_decreases(family, threshold):
    if family == "diffcsp":
        diff = DiffCSPDiffusion(
            DiffCSPConfig(hidden_dim=32, num_layers=2, time_dim=16, timesteps=50)
        )
    else:
        from matinvent_tpu.models.mattergen.diffusion import (
            MatterGenConfig,
            MatterGenDiffusion,
        )

        diff = MatterGenDiffusion(
            MatterGenConfig(hidden_dim=32, num_layers=2, time_dim=16, timesteps=50)
        )
    params = diff.init_params(jax.random.PRNGKey(0))
    data = make_dataset(8)
    rng = np.random.default_rng(0)
    batches = structures_to_batches(data, batch_size=8, max_atoms=8, rng=rng)
    trainer = PretrainTrainer(diff, lr=3e-3)
    params, history = trainer.train(
        params, batches, num_steps=60, key=jax.random.PRNGKey(1), log_every=10
    )
    assert history[-1]["loss"] < threshold * history[0]["loss"]


def test_pretrain_ema_and_snapshots():
    """EMA returns Polyak-averaged params distinct from raw, tracks them
    toward the trained weights, and fires snapshot callbacks with both."""
    diff = DiffCSPDiffusion(
        DiffCSPConfig(hidden_dim=16, num_layers=1, time_dim=8, timesteps=20)
    )
    params = diff.init_params(jax.random.PRNGKey(0))
    data = make_dataset(8)

    def run(decay):
        rng = np.random.default_rng(0)
        batches = structures_to_batches(data, batch_size=4, max_atoms=8, rng=rng)
        trainer = PretrainTrainer(diff, lr=3e-3, ema_decay=decay)
        snaps = []
        out, _ = trainer.train(
            params, batches, num_steps=10, key=jax.random.PRNGKey(1),
            log_every=5, snapshot_every=5,
            snapshot_cb=lambda s, p, e: snaps.append((s, e)),
        )
        return out, snaps

    raw, snaps_off = run(None)
    ema, snaps_on = run(0.5)
    # ema=None: identical training trajectory, no EMA passed to snapshots
    assert [s for s, _ in snaps_off] == [5, 10]
    assert all(e is None for _, e in snaps_off)
    assert all(e is not None for _, e in snaps_on)
    l_raw = jax.tree_util.tree_leaves(raw)[0]
    l_ema = jax.tree_util.tree_leaves(ema)[0]
    l_init = jax.tree_util.tree_leaves(params)[0]
    assert not jnp.allclose(l_raw, l_ema)  # averaging actually happened
    # at decay 0.5 over 10 steps the EMA has all but converged to the raw
    # trajectory's tail: it must be far closer to the trained weights than
    # to the init it started from
    assert float(jnp.abs(l_ema - l_raw).mean()) < 0.5 * float(
        jnp.abs(l_init - l_raw).mean()
    )


@pytest.mark.slow
def test_conditional_pretraining_trains_condition_encoders():
    """Conditions threaded through the trainer must move the per-field
    condition-embedding params (the CFG branch is reachable)."""
    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
    )

    diff = MatterGenDiffusion(
        MatterGenConfig(hidden_dim=32, num_layers=2, time_dim=16, timesteps=50,
                        condition_fields=("dft_band_gap",))
    )
    params = diff.init_params(jax.random.PRNGKey(0))
    data = make_dataset(8)
    rng = np.random.default_rng(0)
    base = structures_to_batches(data, batch_size=8, max_atoms=8, rng=rng)

    def with_conditions():
        import jax.numpy as jnp

        while True:
            b = next(base)
            yield b, {"dft_band_gap": jnp.asarray(rng.random(b.batch_size), jnp.float32)}

    trainer = PretrainTrainer(diff, lr=3e-3)
    new_params, _ = trainer.train(
        params, with_conditions(), num_steps=10, key=jax.random.PRNGKey(1),
        log_every=5,
    )
    before = params["params"]["cond_emb"]["embed_dft_band_gap_0"]["kernel"]
    after = new_params["params"]["cond_emb"]["embed_dft_band_gap_0"]["kernel"]
    assert float(abs(after - before).max()) > 0


@pytest.mark.slow
def test_predictor_learns_synthetic_target():
    data = make_dataset(32, seed=1)
    labels = np.array([s.density for s in data])  # learn density from structure
    gnn = PropertyGNN("toy", hidden_dim=32, num_layers=2, max_atoms=8, seed=0)
    trainer = PredictorTrainer(gnn, lr=3e-3)
    rng = np.random.default_rng(0)
    batches = labeled_batches(data, labels, batch_size=16, max_atoms=8, rng=rng)
    params, history = trainer.train(
        gnn.params, batches, num_steps=80, key=None, log_every=10
    )
    assert history[-1] < 0.5 * history[0]


def test_suite_ckpt_config_authoritative(tmp_path):
    """Loading a checkpoint dir must use the checkpoint's model config, with
    only config_overrides applied on top (not config-file defaults)."""
    import jax
    from matinvent_tpu.models.suite.diffcsp import DiffCSPSuite

    small = DiffCSPSuite(
        model_cfg=dict(hidden_dim=32, num_layers=2, time_dim=16, timesteps=20)
    )
    _, params = small.load_model()
    small.save_model(params, str(tmp_path / "ckpt"))

    # defaults say 4 layers / hidden 128; ckpt must win
    loaded = DiffCSPSuite(
        model_cfg=dict(hidden_dim=128, num_layers=4),
        model_path=str(tmp_path / "ckpt"),
        config_overrides=dict(sample_clip=15.0),
    )
    assert loaded.model_config.num_layers == 2
    assert loaded.model_config.hidden_dim == 32
    assert loaded.model_config.sample_clip == 15.0
    diffusion, params2 = loaded.load_model()
    import numpy as np

    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(params2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


