"""MatterGen-family tests: corruption processes, D3PM, score net, sampler,
conditional guidance, RL losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.models.batch import CrystalBatch
from matinvent_tpu.models.mattergen.corruption import (
    LatticeVPSDE,
    TypeD3PM,
    WrappedCoordVE,
)
from matinvent_tpu.models.mattergen.diffusion import (
    MatterGenConfig,
    MatterGenDiffusion,
)
from matinvent_tpu.models.mattergen.sample import MatterGenSampler


@pytest.fixture(scope="module")
def tiny_mg():
    cfg = MatterGenConfig(
        hidden_dim=32, num_layers=2, time_dim=16, timesteps=12,
        condition_fields=("dft_mag_density",), sample_clip=100.0,
    )
    return MatterGenDiffusion(cfg)


@pytest.fixture(scope="module")
def mg_params(tiny_mg):
    return tiny_mg.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=6)


def make_batch(key, B=3, A=6):
    kx, kl, kt = jax.random.split(key, 3)
    num_atoms = jnp.array([A, A - 2, A - 1][:B], jnp.int32)
    at = jax.random.randint(kt, (B, A), 1, 90)
    at = jnp.where(jnp.arange(A)[None] < num_atoms[:, None], at, 0)
    return CrystalBatch(
        atom_types=at,
        frac_coords=jax.random.uniform(kx, (B, A, 3)),
        lattice=jnp.eye(3)[None].repeat(B, 0) * 4.0
        + 0.1 * jax.random.normal(kl, (B, 3, 3)),
        num_atoms=num_atoms,
    )


class TestCorruptions:
    def test_vp_marginal_limits(self):
        sde = LatticeVPSDE()
        x0 = jnp.eye(3)[None] * 4.0
        n = jnp.array([8])
        mean0, std0 = sde.marginal(x0, jnp.array([1e-4]), n)
        np.testing.assert_allclose(mean0, x0, rtol=1e-3)
        assert float(std0.max()) < 0.1
        mean1, std1 = sde.marginal(x0, jnp.array([1.0]), n)
        # at t=1 mean nearly gone, std near the limit
        assert float(jnp.abs(mean1).max()) < 0.1
        np.testing.assert_allclose(
            float(std1.max()), float(sde.limit_std(n)[0]), rtol=0.01
        )

    def test_vp_limit_scales_with_atoms(self):
        sde = LatticeVPSDE()
        assert float(sde.limit_std(jnp.array([20]))[0]) > float(
            sde.limit_std(jnp.array([2]))[0]
        )

    def test_ve_sigma_endpoints(self):
        ve = WrappedCoordVE(sigma_min=0.005, sigma_max=0.5)
        np.testing.assert_allclose(
            np.asarray(ve.sigma(jnp.array([0.0]))), [0.005], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ve.sigma(jnp.array([1.0]))), [0.5], rtol=1e-5
        )

    def test_d3pm_marginal_identity_at_t0(self):
        d = TypeD3PM.create(num_classes=10, num_steps=20)
        x0 = jnp.array([[3, 7, 1]])
        oh = jax.nn.one_hot(x0, d.vocab)
        probs = d.q_t_given_0(oh, jnp.array([1.0 / 20]))
        # at the first step most mass stays on x0
        assert float(jnp.take_along_axis(probs, x0[..., None], -1).min()) > 0.9

    def test_d3pm_marginal_uniform_at_t1(self):
        d = TypeD3PM.create(num_classes=10, num_steps=20)
        x0 = jnp.array([[3, 7, 1]])
        oh = jax.nn.one_hot(x0, d.vocab)
        probs = d.q_t_given_0(oh, jnp.array([1.0]))
        np.testing.assert_allclose(np.asarray(probs), 1.0 / 10, atol=0.05)

    def test_d3pm_posterior_collapses_at_t1(self):
        d = TypeD3PM.create(num_classes=10, num_steps=20)
        x_t = jnp.array([[2, 5]])
        x0_logits = jnp.log(jax.nn.one_hot(jnp.array([[3, 7]]), d.vocab) + 1e-20)
        post = d.posterior_logits(x_t, x0_logits, jnp.array([1.0 / 20]))
        assert (jnp.argmax(post, -1) == jnp.array([[3, 7]])).all()

    def test_d3pm_absorbing_prior(self):
        d = TypeD3PM.create(num_classes=10, num_steps=20, kind="absorbing")
        assert d.vocab == 11
        prior = d.prior_sample(jax.random.PRNGKey(0), (2, 3))
        assert (prior == 10).all()


class TestMatterGenDiffusion:
    def test_add_noise_grid_mapping(self, tiny_mg):
        b = make_batch(jax.random.PRNGKey(1))
        _, _, t0 = tiny_mg.add_noise(jax.random.PRNGKey(0), b, 0)
        _, _, tN = tiny_mg.add_noise(jax.random.PRNGKey(0), b, tiny_mg.config.timesteps - 1)
        np.testing.assert_allclose(float(t0[0]), 1.0, rtol=1e-5)
        np.testing.assert_allclose(
            float(tN[0]), 1.0 / tiny_mg.config.timesteps, rtol=1e-4
        )

    def test_losses_finite_and_per_sample(self, tiny_mg, mg_params):
        b = make_batch(jax.random.PRNGKey(2))
        noised, targets, _ = tiny_mg.add_noise(jax.random.PRNGKey(1), b, 4)
        loss, preds = tiny_mg.sample_losses(
            mg_params, noised, targets, b.num_atoms, b.mask
        )
        assert loss.shape == (3,)
        assert bool(jnp.all(jnp.isfinite(loss)))
        kl = tiny_mg.kl_reg(preds, preds, b.mask)
        np.testing.assert_allclose(kl, 0.0, atol=1e-12)

    def test_rl_chunk_grads(self, tiny_mg, mg_params):
        b = make_batch(jax.random.PRNGKey(3))
        rewards = jnp.array([0.9, 0.5, 0.1])

        def loss_fn(p):
            l, _ = tiny_mg.rl_chunk_loss(
                p, mg_params, b, rewards, jax.random.PRNGKey(2), jnp.arange(3), 0.025
            )
            return l

        val, grads = jax.value_and_grad(loss_fn)(mg_params)
        assert bool(jnp.isfinite(val))
        assert all(
            bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads)
        )

    def test_sample_shapes(self, tiny_mg, mg_params):
        params = jax.tree.map(lambda x: x * 0.02, mg_params)
        num_atoms = jnp.array([4, 6], jnp.int32)
        final, traj = tiny_mg.sample(
            params, jax.random.PRNGKey(4), num_atoms, max_atoms=6
        )
        assert traj is None
        at = np.asarray(final.atom_types)
        mask = np.asarray(final.mask)
        assert (at[mask] >= 1).all() and (at[mask] <= 100).all()
        fc = np.asarray(final.frac_coords)
        assert (fc >= 0).all() and (fc < 1).all()
        assert np.isfinite(np.asarray(final.lattice)).all()

    def test_sample_guidance_changes_output(self, tiny_mg, mg_params):
        params = jax.tree.map(lambda x: x * 0.02, mg_params)
        num_atoms = jnp.array([4, 6], jnp.int32)
        cond = {"dft_mag_density": jnp.array([0.2, 0.2])}
        f0, _ = tiny_mg.sample(
            params, jax.random.PRNGKey(5), num_atoms, max_atoms=6,
            conditions=cond, guidance=0.0,
        )
        f2, _ = tiny_mg.sample(
            params, jax.random.PRNGKey(5), num_atoms, max_atoms=6,
            conditions=cond, guidance=2.0,
        )
        assert not np.allclose(np.asarray(f0.lattice), np.asarray(f2.lattice))


class TestMatterGenSampler:
    def test_generate_and_csp_mode(self, tiny_mg, mg_params):
        params = jax.tree.map(lambda x: x * 0.02, mg_params)
        sampler = MatterGenSampler(batch_size=4, num_batches=1, max_atoms=8, seed=0)
        data, strucs = sampler.generate((tiny_mg, params))
        assert len(strucs) == 4

        csp = MatterGenSampler(
            batch_size=4, num_batches=1, max_atoms=8, seed=0,
            target_compositions_dict=[{"Na": 1, "Cl": 1}, {"Mg": 1, "O": 1}],
        )
        data, strucs = csp.generate((tiny_mg, params))
        formulas = {s.composition.reduced_formula for s in strucs}
        assert formulas == {"NaCl", "MgO"}


class TestConditionalFinetune:
    def test_finetune_with_conditions(self, tiny_mg, mg_params):
        from matinvent_tpu.parallel.train import FinetuneStep

        b = make_batch(jax.random.PRNGKey(11))
        rewards = jnp.array([0.9, 0.5, 0.2])
        conditions = {"dft_mag_density": jnp.full((3,), 0.15)}
        ft = FinetuneStep(tiny_mg, lr=1e-4, timesteps=12, accum_steps=4, epochs=1)
        new_params, metrics = ft.run(
            mg_params, mg_params, b, rewards, jax.random.PRNGKey(0),
            conditions=conditions,
        )
        assert np.isfinite(metrics[0]["loss"])
        delta = sum(
            float(jnp.abs(a - c).sum())
            for a, c in zip(
                jax.tree_util.tree_leaves(new_params),
                jax.tree_util.tree_leaves(mg_params),
            )
        )
        assert delta > 0


class TestD3PMAbsorbingPosterior:
    def test_unmasking_posterior(self):
        """With x_t=MASK the posterior must put mass on both x0 and MASK
        (review-confirmed bug: the old fact1 pinned everything on MASK)."""
        d = TypeD3PM.create(num_classes=4, num_steps=10, kind="absorbing")
        MASK = d.vocab - 1
        x_t = jnp.full((1, 1), MASK)
        x0_logits = jnp.log(jax.nn.one_hot(jnp.array([[2]]), d.vocab) + 1e-20)
        t = jnp.array([0.5])
        probs = jax.nn.softmax(d.posterior_logits(x_t, x0_logits, t), axis=-1)[0, 0]
        # analytic: p(j=2) ∝ beta*abar_prev ; p(MASK) ∝ 1*(1-abar_prev)
        ti = int(d._t_index(t)[0])
        beta = float(d.betas[ti])
        abar_prev = float(d.abar[ti - 1])
        expect_2 = beta * abar_prev
        expect_mask = 1.0 - abar_prev
        z = expect_2 + expect_mask
        np.testing.assert_allclose(float(probs[2]), expect_2 / z, rtol=1e-5)
        np.testing.assert_allclose(float(probs[MASK]), expect_mask / z, rtol=1e-5)
        assert float(probs[0]) < 1e-6  # other classes excluded

    def test_absorbing_sampling_unmasks(self):
        """Absorbing-chain sampling must produce real atom types, not MASK."""
        import dataclasses

        cfg = MatterGenConfig(
            hidden_dim=32, num_layers=2, time_dim=16, timesteps=12,
            d3pm_kind="absorbing", sample_clip=100.0,
        )
        diff = MatterGenDiffusion(cfg)
        params = jax.tree.map(
            lambda x: x * 0.02,
            diff.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=6),
        )
        final, _ = diff.sample(params, jax.random.PRNGKey(1), jnp.array([4, 6]), max_atoms=6)
        at = np.asarray(final.atom_types)
        mask = np.asarray(final.mask)
        # real atoms end with valid atomic numbers (0 would mean stuck at MASK)
        assert (at[mask] >= 1).all()


class TestCSPModeConditioning:
    def test_types_fixed_through_chain(self, tiny_mg, mg_params):
        """fixed_types holds composition constant for the whole trajectory."""
        params = jax.tree.map(lambda x: x * 0.02, mg_params)
        fixed = jnp.array([[11, 17, 0, 0, 0, 0], [12, 8, 8, 0, 0, 0]])
        final, traj = tiny_mg.sample(
            params, jax.random.PRNGKey(2), jnp.array([2, 3]), max_atoms=6,
            fixed_types=fixed, record_traj=True,
        )
        np.testing.assert_array_equal(
            np.asarray(final.atom_types) * np.asarray(final.mask),
            np.asarray(fixed) * np.asarray(final.mask),
        )
        # types never changed during the scan
        types_traj = np.asarray(traj["types"])
        assert (types_traj == types_traj[0]).all()


def test_sampler_niggli_reduction(tiny_mg, mg_params):
    params = jax.tree.map(lambda x: x * 0.02, mg_params)
    sampler = MatterGenSampler(
        batch_size=2, num_batches=1, max_atoms=6, seed=0, niggli_reduction=True
    )
    data, strucs = sampler.generate((tiny_mg, params))
    for s in strucs:
        assert np.isfinite(s.lattice).all()


class TestBucketedSampling:
    """sample_bucketed: the fused size-bucketed scan must be bit-identical
    per bucket to sample() and reassemble losslessly in the driver."""

    def test_bucket_matches_dense_per_bucket(self, tiny_mg, mg_params):
        key = jax.random.PRNGKey(7)
        na_s = jnp.asarray([2, 3, 4], jnp.int32)
        na_l = jnp.asarray([5, 6], jnp.int32)
        outs = tiny_mg.sample_bucketed(mg_params, key, (na_s, na_l), (4, 6))
        ref0, _ = tiny_mg.sample(
            mg_params, jax.random.fold_in(key, 0), na_s, max_atoms=4
        )
        ref1, _ = tiny_mg.sample(
            mg_params, jax.random.fold_in(key, 1), na_l, max_atoms=6
        )
        for got, ref in zip(outs, (ref0, ref1)):
            np.testing.assert_allclose(
                np.asarray(got.lattice), np.asarray(ref.lattice), rtol=0, atol=0
            )
            np.testing.assert_allclose(
                np.asarray(got.frac_coords), np.asarray(ref.frac_coords),
                rtol=0, atol=0,
            )
            np.testing.assert_array_equal(
                np.asarray(got.atom_types), np.asarray(ref.atom_types)
            )

    def test_driver_reassembles_in_draw_order(self, tiny_mg, mg_params):
        s = MatterGenSampler(
            batch_size=12, num_batches=1, max_atoms=6, size_buckets=2, seed=3
        )
        final = s.launch((tiny_mg, mg_params))
        s_dense = MatterGenSampler(
            batch_size=12, num_batches=1, max_atoms=6, size_buckets=1, seed=3
        )
        dense = s_dense.launch((tiny_mg, mg_params))
        # same host-side draws, same order after reassembly
        np.testing.assert_array_equal(
            np.asarray(final.num_atoms), np.asarray(dense.num_atoms)
        )
        # padding stays clean beyond each crystal's true size
        at = np.asarray(final.atom_types)
        mask = np.arange(at.shape[1])[None, :] < np.asarray(final.num_atoms)[:, None]
        assert (at[~mask] == 0).all()

    def test_conditions_follow_the_permutation(self, tiny_mg, mg_params):
        s = MatterGenSampler(
            batch_size=8, num_batches=1, max_atoms=6, size_buckets=2, seed=5,
            properties_to_condition_on={"dft_mag_density": 0.7},
            diffusion_guidance_factor=1.5,
        )
        final = s.launch((tiny_mg, mg_params))
        assert np.isfinite(np.asarray(final.frac_coords)).all()


class TestNumAtomsDistributionHooks:
    def test_register_dict_format(self):
        from matinvent_tpu.models.mattergen.sample import (
            NUM_ATOMS_DISTRIBUTIONS,
            register_num_atoms_distribution,
        )

        register_num_atoms_distribution("t_dict", {4: 1.0, 8: 3.0})
        arr = NUM_ATOMS_DISTRIBUTIONS["t_dict"]
        assert abs(arr.sum() - 1.0) < 1e-9 and arr[8] == 0.75

    def test_json_file_override(self, tmp_path):
        import json

        p = tmp_path / "dists.json"
        p.write_text(json.dumps({"ALEX_MP_20": {2: 0.25, 6: 0.75}}))
        s = MatterGenSampler(
            batch_size=8, num_batches=1,
            num_atoms_distribution="ALEX_MP_20",
            num_atoms_distribution_file=str(p),
        )
        draws = s._draw_num_atoms(500)
        assert set(np.unique(draws)) <= {2, 6}

    def test_alex_mp20_is_strictly_user_supplied(self):
        """Final ALEX_MP_20 disposition (VERDICT r3 #7): the name resolves
        only after the user registers the real table; until then construction
        raises with the drop-in hooks named, and the default is the honestly
        named mp_20 (published MP-20 statistics) with no warning emitted."""
        import importlib

        from matinvent_tpu.models import sample as DS
        from matinvent_tpu.models.mattergen import sample as S

        # drop tables registered by other tests (the reload re-snapshots the
        # DiffCSP-side registry, so purge it there too)
        DS.ATOM_DIST.pop("ALEX_MP_20", None)
        importlib.reload(S)
        with pytest.raises(ValueError, match="user-supplied"):
            S.MatterGenSampler(
                batch_size=4, num_batches=1,
                num_atoms_distribution="ALEX_MP_20",
            )
        assert S.MatterGenSampler.num_atoms_distribution == "mp_20"
        S.register_num_atoms_distribution("ALEX_MP_20", {2: 1.0})
        s = S.MatterGenSampler(
            batch_size=4, num_batches=1, num_atoms_distribution="ALEX_MP_20"
        )
        assert set(np.unique(s._draw_num_atoms(64))) == {2}
        importlib.reload(S)

    def test_default_run_emits_no_alias_warning(self, caplog):
        """A default-config sampler must not warn (VERDICT r3 #7 done
        criterion: no alias warning anywhere in a default run)."""
        import importlib
        import logging

        from matinvent_tpu.models.mattergen import sample as S

        importlib.reload(S)
        with caplog.at_level(logging.WARNING, logger=S.__name__):
            S.MatterGenSampler(batch_size=4, num_batches=1)
        assert not caplog.records
        importlib.reload(S)

    def test_user_table_via_diffcsp_registry_too(self):
        """register_atom_dist (the DiffCSP-side API, documented as covering
        both families) must also make ALEX_MP_20 resolvable."""
        import importlib

        from matinvent_tpu.models import sample as DS
        from matinvent_tpu.models.mattergen import sample as S

        importlib.reload(S)
        DS.register_atom_dist("ALEX_MP_20", [0.0, 0.0, 1.0])
        s = S.MatterGenSampler(
            batch_size=4, num_batches=1, num_atoms_distribution="ALEX_MP_20"
        )
        assert set(np.unique(s._draw_num_atoms(64))) == {2}
        importlib.reload(S)

    def test_corpus_derived_histogram_registered(self):
        """The in-repo corpus-derived table ships under a distinct name and
        matches tools/derive_num_atoms_hist.py on the source corpus."""
        from matinvent_tpu.models.mattergen.sample import (
            NUM_ATOMS_DISTRIBUTIONS,
        )

        arr = NUM_ATOMS_DISTRIBUTIONS["matinvent_corpus"]
        assert abs(arr.sum() - 1.0) < 1e-6
        assert arr[2] == 0.5205 and arr[3] == 0.2115 and arr[4] == 0.268


def test_condition_stats_standardize_before_embedding(tmp_path):
    """condition_stats standardizes condition values at apply time (CFG
    calibration fix, VERDICT r2 weak #2) and round-trips through the suite's
    config.yaml."""
    from matinvent_tpu.models.diffcsp import sinusoidal_time_embedding
    from matinvent_tpu.models.mattergen.diffusion import MGNoised
    from matinvent_tpu.models.suite.mattergen import MatterGenSuite

    stats = (("density", 2.5, 1.2),)
    s = MatterGenSuite(model_cfg=dict(
        hidden_dim=16, num_layers=1, time_dim=16, timesteps=8,
        condition_fields=("density",), condition_stats=stats,
    ))
    d, p = s.load_model()
    s.save_model(p, str(tmp_path))
    d2, p2 = MatterGenSuite(model_path=str(tmp_path)).load_model()
    assert d2.config.condition_stats == stats

    plain = MatterGenDiffusion(d.config.replace(condition_stats=()))
    t = jnp.array([0.5, 0.5])
    noised = MGNoised(
        t, sinusoidal_time_embedding(t * 8, 16),
        jnp.zeros((2, 4), jnp.int32), jnp.zeros((2, 4, 3)),
        jnp.eye(3)[None].repeat(2, 0),
    )
    na, mask = jnp.array([4, 4]), jnp.ones((2, 4), bool)
    v = jnp.array([2.5, 5.0])
    with_stats = d.apply_net(p, noised, na, mask, conditions={"density": v})
    manual = plain.apply_net(
        p, noised, na, mask, conditions={"density": (v - 2.5) / 1.2}
    )
    for k in with_stats:
        np.testing.assert_allclose(
            np.asarray(with_stats[k]), np.asarray(manual[k]), atol=1e-6
        )


class TestMatterGenDDPO:
    """Multi-field DDPO machinery (VERDICT r2 weak #5): recorded-trajectory
    log-probs must be reproducible by forward_logprob at identical params,
    and the PPO step must move parameters."""

    @pytest.fixture(scope="class")
    def traj_setup(self):
        cfg = MatterGenConfig(
            hidden_dim=32, num_layers=2, time_dim=16, timesteps=12,
            sample_clip=100.0,
        )
        d = MatterGenDiffusion(cfg)
        params = d.init_params(jax.random.PRNGKey(0), max_atoms=6)
        num_atoms = jnp.array([6, 4, 5], jnp.int32)
        final, traj = d.sample(
            params, jax.random.PRNGKey(1), num_atoms, max_atoms=6,
            record_traj=True,
        )
        return d, params, num_atoms, final, traj

    def test_replay_matches_recorded_logprobs(self, traj_setup):
        d, params, num_atoms, final, traj = traj_setup
        N = d.config.timesteps
        tables = d._step_tables()
        mask = jnp.arange(6)[None, :] < num_atoms[:, None]
        for i in (0, 3, N - 2):  # skip the deterministic final step
            state = {
                k: traj[k][i]
                for k in ("step", "cell_in", "pos_in", "types_in",
                          "pos_mid", "cell", "pos", "types")
            }
            lp_cell, lp_types, lp_pos, _ = d.forward_logprob(
                params, state, num_atoms, mask, tables
            )
            np.testing.assert_allclose(
                np.asarray(lp_cell), np.asarray(traj["log_prob_cell"][i]),
                rtol=1e-4, atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(lp_types), np.asarray(traj["log_prob_types"][i]),
                rtol=1e-4, atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(lp_pos), np.asarray(traj["log_prob_pos"][i]),
                rtol=1e-4, atol=1e-4,
            )

    def test_ddpo_step_moves_params(self, traj_setup):
        from matinvent_tpu.parallel.train import MatterGenDDPOStep

        d, params, num_atoms, final, traj = traj_setup
        ddpo = MatterGenDDPOStep(d, lr=1e-4, chunk=4)
        rewards = jnp.array([0.9, 0.1, 0.5])
        mask = jnp.arange(6)[None, :] < num_atoms[:, None]
        new_params, loss = ddpo.run(params, traj, num_atoms, mask, rewards)
        assert np.isfinite(loss)
        delta = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(new_params),
                jax.tree_util.tree_leaves(params),
            )
        )
        assert delta > 0

    def test_importance_ratio_is_one_at_same_params(self, traj_setup):
        """PPO ratios at the behavior params must start at ~1 (the dtype-
        consistency property the DiffCSP path documents)."""
        d, params, num_atoms, final, traj = traj_setup
        tables = d._step_tables()
        mask = jnp.arange(6)[None, :] < num_atoms[:, None]
        i = 5
        state = {
            k: traj[k][i]
            for k in ("step", "cell_in", "pos_in", "types_in",
                      "pos_mid", "cell", "pos", "types")
        }
        lp_cell, lp_types, lp_pos, _ = d.forward_logprob(
            params, state, num_atoms, mask, tables
        )
        new_lp = np.asarray(lp_cell + lp_types + lp_pos)
        old_lp = np.asarray(
            traj["log_prob_cell"][i] + traj["log_prob_types"][i]
            + traj["log_prob_pos"][i]
        )
        # f32 summation-order differences between the scan-time and
        # replay-time net evals leave ~2e-3 ratio jitter; PPO clips at 0.2
        np.testing.assert_allclose(np.exp(new_lp - old_lp), 1.0, atol=5e-3)

    def test_record_traj_rejects_multi_corrector(self):
        """Regression: with n_corrector>1 the recorder's log_prob_pos would
        be the wrapped normal of the FINAL position against the FIRST kick's
        mean — refuse at record time, not just at DDPO replay."""
        cfg = MatterGenConfig(
            hidden_dim=16, num_layers=1, time_dim=16, timesteps=4,
            n_corrector=2,
        )
        d = MatterGenDiffusion(cfg)
        params = d.init_params(jax.random.PRNGKey(0), max_atoms=4)
        with pytest.raises(NotImplementedError, match="n_corrector"):
            d.sample(
                params, jax.random.PRNGKey(1), jnp.array([4], jnp.int32),
                max_atoms=4, record_traj=True,
            )


class TestMatterGenDDPOConditional:
    """Regression (r3 review): the DDPO replay must recompute log-probs under
    the SAME conditioning/guidance/CSP mix the behavior policy sampled with —
    replaying a conditional trajectory through the unconditional policy puts
    importance ratios away from 1 at identical params."""

    # Operating point chosen for numerical cleanliness (measured):
    # * sample_clip=None — an untrained net's cells explode past any clip,
    #   and a clipped draw sits thousands of sigma from mu, where the
    #   sampling-dtype net's f32 rounding is amplified by |x-mu|/sigma^2
    #   into O(1e-2) log-prob noise that swamps the semantic signal.
    # * replay at step 1 (high-noise end of the descending grid) — the VP
    #   posterior std shrinks toward the data end, amplifying the same f32
    #   rounding by 1/post_std^2 (measured: correct-replay cell dev 5e-5 at
    #   step 1 grows to 5e-3 by step 4 at identical semantics).
    # * conditions +-10 with guidance 2.0 — large enough that dropping them
    #   moves the total log-prob by >20 (vs 5e-5 correct-replay noise).
    @pytest.fixture(scope="class")
    def cond_traj(self):
        cfg = MatterGenConfig(
            hidden_dim=32, num_layers=2, time_dim=16, timesteps=8,
            condition_fields=("dft_mag_density",), sample_clip=None,
        )
        d = MatterGenDiffusion(cfg)
        params = d.init_params(jax.random.PRNGKey(0), max_atoms=6)
        num_atoms = jnp.array([6, 4], jnp.int32)
        conditions = {"dft_mag_density": jnp.array([10.0, -10.0])}
        _, traj = d.sample(
            params, jax.random.PRNGKey(1), num_atoms, max_atoms=6,
            conditions=conditions, guidance=2.0, record_traj=True,
        )
        return d, params, num_atoms, conditions, traj

    @staticmethod
    def _replay(d, params, num_atoms, traj, i, **kw):
        mask = jnp.arange(6)[None, :] < num_atoms[:, None]
        state = {
            k: traj[k][i]
            for k in ("step", "cell_in", "pos_in", "types_in",
                      "pos_mid", "cell", "pos", "types")
        }
        lp_c, lp_t, lp_p, _ = d.forward_logprob(
            params, state, num_atoms, mask, d._step_tables(), **kw
        )
        new_lp = np.asarray(lp_c + lp_t + lp_p)
        old_lp = np.asarray(
            traj["log_prob_cell"][i] + traj["log_prob_types"][i]
            + traj["log_prob_pos"][i]
        )
        return np.exp(new_lp - old_lp)

    def test_conditional_replay_ratio_is_one(self, cond_traj):
        d, params, num_atoms, conditions, traj = cond_traj
        ratio = self._replay(
            d, params, num_atoms, traj, 1,
            conditions=conditions, guidance=2.0,
        )
        np.testing.assert_allclose(ratio, 1.0, atol=5e-3)

    def test_unconditional_replay_ratio_is_wrong(self, cond_traj):
        """The pre-fix behavior: dropping conditions/guidance at replay gives
        ratios far from 1 at the behavior params (measured |dlp| > 20 at this
        operating point vs 5e-5 replay noise)."""
        d, params, num_atoms, conditions, traj = cond_traj
        ratio = self._replay(d, params, num_atoms, traj, 1)
        assert np.max(np.abs(ratio - 1.0)) > 0.1

    def test_last_step_logprobs_gated_to_zero(self, cond_traj):
        """The final grid step is deterministic (noise off, post_std/p_std
        exactly 0, types via argmax): recorder and replay must both write 0
        there, or every DDPO update carries one garbage ratio built from a
        1e-12-std logpdf of a rounding-level difference."""
        d, params, num_atoms, conditions, traj = cond_traj
        last = d.config.timesteps - 1
        for k in ("log_prob_cell", "log_prob_types", "log_prob_pos"):
            np.testing.assert_array_equal(np.asarray(traj[k][last]), 0.0)
        mask = jnp.arange(6)[None, :] < num_atoms[:, None]
        state = {
            k: traj[k][last]
            for k in ("step", "cell_in", "pos_in", "types_in",
                      "pos_mid", "cell", "pos", "types")
        }
        lp_c, lp_t, lp_p, _ = d.forward_logprob(
            params, state, num_atoms, mask, d._step_tables(),
            conditions=conditions, guidance=2.0,
        )
        np.testing.assert_array_equal(np.asarray(lp_c + lp_t + lp_p), 0.0)

    def test_sampler_records_behavior_policy(self, cond_traj):
        """The sampler must expose the knobs the pipeline needs for replay."""
        d, params, *_ = cond_traj
        s = MatterGenSampler(
            batch_size=2, num_batches=1, max_atoms=6,
            num_atoms_distribution="mp_20", record_trajectories=True,
            diffusion_guidance_factor=1.5,
            properties_to_condition_on={"dft_mag_density": 0.4},
        )
        s.launch((d, params))
        assert s.last_guidance == 1.5
        assert set(s.last_conditions) == {"dft_mag_density"}
        np.testing.assert_allclose(
            np.asarray(s.last_conditions["dft_mag_density"]), 0.4
        )
        assert s.last_fixed_types is None

    def test_csp_replay_types_logprob_zero(self):
        """CSP mode holds types fixed and records log_prob_types=0; the
        replay must mirror it."""
        cfg = MatterGenConfig(
            hidden_dim=16, num_layers=1, time_dim=16, timesteps=4,
            sample_clip=100.0,
        )
        d = MatterGenDiffusion(cfg)
        params = d.init_params(jax.random.PRNGKey(0), max_atoms=4)
        num_atoms = jnp.array([3], jnp.int32)
        fixed = jnp.array([[8, 8, 12, 0]], jnp.int32)
        _, traj = d.sample(
            params, jax.random.PRNGKey(1), num_atoms, max_atoms=4,
            fixed_types=fixed, record_traj=True,
        )
        mask = jnp.arange(4)[None, :] < num_atoms[:, None]
        state = {
            k: traj[k][1]
            for k in ("step", "cell_in", "pos_in", "types_in",
                      "pos_mid", "cell", "pos", "types")
        }
        _, lp_types, _, _ = d.forward_logprob(
            params, state, num_atoms, mask, fixed_types=fixed
        )
        np.testing.assert_allclose(np.asarray(lp_types), 0.0)
        np.testing.assert_allclose(np.asarray(traj["log_prob_types"][1]), 0.0)


def test_d3pm_t_index_exact_on_sampler_grid():
    """Regression: every point of the sampler's grid linspace(1, 1/N, N)
    must map to its exact integer step — ceil(t*N) was off by +1 on ~37% of
    steps (float32 places grid points exactly on ceil's discontinuity)."""
    from matinvent_tpu.models.mattergen.corruption import TypeD3PM

    for N in (100, 250, 500, 1000):
        d3pm = TypeD3PM.create(num_classes=10, num_steps=N)
        grid = jnp.linspace(1.0, 1.0 / N, N)
        idx = np.asarray(d3pm._t_index(grid))
        expected = np.arange(N, 0, -1)
        np.testing.assert_array_equal(idx, expected)


class TestTypeTemperature:
    """Generation-quality knob: tau < 1 sharpens D3PM ancestral type draws.
    Must (a) concentrate the sampled-type distribution and (b) keep the DDPO
    replay exact — the recorder and forward_logprob score under the SAME
    tempered posterior the sampler drew from."""

    def test_low_tau_concentrates_types_and_replay_stays_exact(self):
        base = dict(hidden_dim=32, num_layers=2, time_dim=16, timesteps=12,
                    sample_clip=100.0)
        d = MatterGenDiffusion(MatterGenConfig(**base, type_temperature=0.5))
        params = d.init_params(jax.random.PRNGKey(0), max_atoms=6)
        num_atoms = jnp.array([6, 4, 5], jnp.int32)
        final, traj = d.sample(
            params, jax.random.PRNGKey(1), num_atoms, max_atoms=6,
            record_traj=True,
        )
        mask = jnp.arange(6)[None, :] < num_atoms[:, None]
        tables = d._step_tables()
        for i in (0, 3, d.config.timesteps - 2):
            state = {
                k: traj[k][i]
                for k in ("step", "cell_in", "pos_in", "types_in",
                          "pos_mid", "cell", "pos", "types")
            }
            lp_cell, lp_types, lp_pos, _ = d.forward_logprob(
                params, state, num_atoms, mask, tables
            )
            np.testing.assert_allclose(
                np.asarray(lp_types), np.asarray(traj["log_prob_types"][i]),
                rtol=1e-4, atol=1e-4,
            )
        # tempered draws must be valid classes on real atoms
        types = np.asarray(final.atom_types)
        m = np.asarray(mask)
        assert ((types[m] >= 1) & (types[m] <= 100)).all()

    def test_tau_one_is_reference_semantics(self):
        """Same seed, tau=1 config == default config, bit-identical draws."""
        base = dict(hidden_dim=32, num_layers=1, time_dim=16, timesteps=8)
        d1 = MatterGenDiffusion(MatterGenConfig(**base))
        d2 = MatterGenDiffusion(MatterGenConfig(**base, type_temperature=1.0))
        params = d1.init_params(jax.random.PRNGKey(0), max_atoms=5)
        na = jnp.array([5, 3], jnp.int32)
        f1, _ = d1.sample(params, jax.random.PRNGKey(2), na, max_atoms=5)
        f2, _ = d2.sample(params, jax.random.PRNGKey(2), na, max_atoms=5)
        np.testing.assert_array_equal(
            np.asarray(f1.atom_types), np.asarray(f2.atom_types)
        )


class TestEdgeStyleKNN:
    """The reference's other edge style (knn: PBC min-image radius + rank,
    /root/reference/models/diffcsp/cspnet.py:238-257) wired through
    MatterGenConfig. In the dense-masked formulation it changes the mask
    and aggregation denominator only (PARITY.md r5 A/B)."""

    def test_knn_runs_and_differs_from_fc(self):
        base = dict(hidden_dim=32, num_layers=2, time_dim=16, timesteps=12)
        d_fc = MatterGenDiffusion(MatterGenConfig(**base))
        d_knn = MatterGenDiffusion(
            MatterGenConfig(**base, edge_style="knn", max_neighbors=3)
        )
        params = d_fc.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=6)
        b = make_batch(jax.random.PRNGKey(5))
        noised, _, _ = d_fc.add_noise(jax.random.PRNGKey(1), b, 4)

        o_fc = jax.jit(
            lambda p: d_fc.apply_net(p, noised, b.num_atoms, b.mask)
        )(params)
        o_knn = jax.jit(
            lambda p: d_knn.apply_net(p, noised, b.num_atoms, b.mask)
        )(params)
        for k in o_fc:
            assert bool(jnp.all(jnp.isfinite(o_knn[k]))), k
        # k=3 < num_atoms-1: the restricted neighborhood must change scores
        assert not np.allclose(
            np.asarray(o_fc["pos"]), np.asarray(o_knn["pos"]), atol=1e-6
        )

    def test_fused_edge_requires_fc(self):
        cfg = MatterGenConfig(
            hidden_dim=32, num_layers=1, time_dim=16, timesteps=12,
            edge_style="knn", fused_edge_sampling=True,
        )
        with pytest.raises(ValueError, match="fc edge style"):
            MatterGenDiffusion(cfg)
