"""Model-layer tests: CSPNet masking/invariance, diffusion corruption, PC
sampler, and the RL finetune losses (SURVEY.md §4 strategy (b))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.models import CrystalBatch, CSPNet, DiffCSPDiffusion
from matinvent_tpu.models.diffcsp import (
    DiffCSPConfig,
    sinusoidal_time_embedding,
)


@pytest.fixture(scope="module")
def tiny_diffusion():
    cfg = DiffCSPConfig(hidden_dim=32, num_layers=2, time_dim=16, timesteps=12)
    return DiffCSPDiffusion(cfg)


@pytest.fixture(scope="module")
def tiny_params(tiny_diffusion):
    return tiny_diffusion.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=6)


def make_batch(key, B=3, A=6, seed_atoms=None):
    kx, kl, kt, kn = jax.random.split(key, 4)
    num_atoms = jnp.array([A, A - 2, A - 1][:B], jnp.int32)
    at = jax.random.randint(kt, (B, A), 1, 90)
    ar = jnp.arange(A)[None, :]
    at = jnp.where(ar < num_atoms[:, None], at, 0)
    return CrystalBatch(
        atom_types=at,
        frac_coords=jax.random.uniform(kx, (B, A, 3)),
        lattice=jnp.eye(3)[None].repeat(B, 0) * 4.0
        + 0.1 * jax.random.normal(kl, (B, 3, 3)),
        num_atoms=num_atoms,
    )


class TestBatch:
    def test_mask_and_onehot(self):
        b = make_batch(jax.random.PRNGKey(0))
        mask = np.asarray(b.mask)
        assert mask.sum() == int(np.asarray(b.num_atoms).sum())
        oh = np.asarray(b.atom_onehot())
        # padded rows are all-zero
        assert oh[1, -2:].sum() == 0.0
        assert np.allclose(oh.sum(-1)[mask], 1.0)

    def test_from_to_lists_roundtrip(self):
        ats = [np.array([1, 8]), np.array([3, 3, 3])]
        fcs = [np.random.rand(2, 3), np.random.rand(3, 3)]
        lats = [np.eye(3) * 4, np.eye(3) * 5]
        b = CrystalBatch.from_lists(ats, fcs, lats, max_atoms=4)
        out = b.to_lists()
        assert out[0]["num_atoms"] == 2 and out[1]["num_atoms"] == 3
        np.testing.assert_allclose(out[1]["frac_coords"], fcs[1], atol=1e-6)
        np.testing.assert_array_equal(out[0]["atom_types"], ats[0])


class TestCSPNet:
    def test_padding_invariance(self, tiny_diffusion):
        """Outputs on real atoms must not depend on padding width."""
        diff = tiny_diffusion
        key = jax.random.PRNGKey(1)
        B, A1, A2 = 2, 5, 9
        params = diff.init_params(key, batch_size=B, max_atoms=A1)
        num_atoms = jnp.array([4, 5], jnp.int32)

        kx, kt = jax.random.split(key)
        frac1 = jax.random.uniform(kx, (B, A1, 3))
        probs1 = jax.random.normal(kt, (B, A1, diff.config.max_atomic_num))
        lat = jnp.eye(3)[None].repeat(B, 0) * 4.0
        t_emb = sinusoidal_time_embedding(jnp.array([3, 7]), diff.config.time_dim)

        # widen with garbage padding
        pad = A2 - A1
        frac2 = jnp.concatenate([frac1, 99.0 * jnp.ones((B, pad, 3))], axis=1)
        probs2 = jnp.concatenate(
            [probs1, 7.0 * jnp.ones((B, pad, diff.config.max_atomic_num))], axis=1
        )
        mask1 = jnp.arange(A1)[None, :] < num_atoms[:, None]
        mask2 = jnp.arange(A2)[None, :] < num_atoms[:, None]

        l1, x1, t1 = diff.net.apply(params, t_emb, probs1, frac1, lat, num_atoms, mask1)
        l2, x2, t2 = diff.net.apply(params, t_emb, probs2, frac2, lat, num_atoms, mask2)
        np.testing.assert_allclose(l1, l2, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(x1)[np.asarray(mask1)], np.asarray(x2[:, :A1])[np.asarray(mask1)], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(t1)[np.asarray(mask1)], np.asarray(t2[:, :A1])[np.asarray(mask1)], atol=1e-5
        )

    def test_permutation_equivariance(self, tiny_diffusion):
        """Permuting atoms permutes per-atom outputs, lattice head invariant."""
        diff = tiny_diffusion
        key = jax.random.PRNGKey(2)
        B, A = 1, 6
        params = diff.init_params(key, batch_size=B, max_atoms=A)
        num_atoms = jnp.array([A], jnp.int32)
        mask = jnp.ones((B, A), bool)
        frac = jax.random.uniform(key, (B, A, 3))
        probs = jax.random.normal(key, (B, A, diff.config.max_atomic_num))
        lat = jnp.eye(3)[None] * 4.0
        t_emb = sinusoidal_time_embedding(jnp.array([5]), diff.config.time_dim)

        perm = jnp.array([3, 1, 4, 0, 5, 2])
        l1, x1, t1 = diff.net.apply(params, t_emb, probs, frac, lat, num_atoms, mask)
        l2, x2, t2 = diff.net.apply(
            params, t_emb, probs[:, perm], frac[:, perm], lat, num_atoms, mask
        )
        np.testing.assert_allclose(l1, l2, atol=1e-5)
        np.testing.assert_allclose(x1[:, perm], x2, atol=1e-5)
        np.testing.assert_allclose(t1[:, perm], t2, atol=1e-5)


class TestDiffusion:
    def test_add_noise_t_mapping(self, tiny_diffusion):
        diff = tiny_diffusion
        b = make_batch(jax.random.PRNGKey(3))
        # t_index=0 -> t = T (noisiest); t_index=T-1 -> t = 1
        _, _, times0 = diff.add_noise(jax.random.PRNGKey(0), b, 0)
        _, _, timesT = diff.add_noise(jax.random.PRNGKey(0), b, diff.config.timesteps - 1)
        assert int(times0[0]) == diff.config.timesteps
        assert int(timesT[0]) == 1

    def test_add_noise_small_t_near_clean(self, tiny_diffusion):
        """At t=1 the corruption is nearly identity on lattice/coords."""
        diff = tiny_diffusion
        b = make_batch(jax.random.PRNGKey(4))
        noised1, _, times = diff.add_noise(
            jax.random.PRNGKey(1), b, diff.config.timesteps - 1
        )
        noisedT, _, _ = diff.add_noise(jax.random.PRNGKey(1), b, 0)
        assert int(times[0]) == 1

        def lat_err(n):
            return float(jnp.abs(n.lattice - b.lattice).mean())

        def coord_err(n):
            d = np.abs(np.asarray(n.frac_coords - b.frac_coords))
            return np.minimum(d, 1 - d).mean()

        # corruption at t=1 must be far milder than at t=T
        assert lat_err(noised1) < 0.25 * lat_err(noisedT)
        assert coord_err(noised1) < 0.1  # sigma_begin=0.01
        assert coord_err(noisedT) > 0.1  # sigma_end=1.0 ~ uniform

    def test_sample_losses_and_kl(self, tiny_diffusion, tiny_params):
        diff = tiny_diffusion
        b = make_batch(jax.random.PRNGKey(5))
        noised, targets, _ = diff.add_noise(jax.random.PRNGKey(2), b, 3)
        loss, preds = diff.sample_losses(tiny_params, noised, targets, b.num_atoms, b.mask)
        assert loss.shape == (b.batch_size,)
        assert bool(jnp.all(jnp.isfinite(loss)))
        # identical params -> KL identically zero
        kl = diff.kl_reg(preds, preds, b.mask)
        np.testing.assert_allclose(kl, 0.0, atol=1e-10)

    def test_rl_chunk_loss_grads(self, tiny_diffusion, tiny_params):
        diff = tiny_diffusion
        b = make_batch(jax.random.PRNGKey(6))
        rewards = jnp.array([0.9, 0.5, 0.1])

        def loss_fn(p):
            l, _ = diff.rl_chunk_loss(
                p, tiny_params, b, rewards, jax.random.PRNGKey(3),
                jnp.arange(4), 0.025,
            )
            return l

        val, grads = jax.value_and_grad(loss_fn)(tiny_params)
        assert bool(jnp.isfinite(val))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
        # some gradient must be nonzero
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)

    def test_sample_shapes_and_ranges(self, tiny_diffusion, tiny_params):
        diff = tiny_diffusion
        num_atoms = jnp.array([4, 6], jnp.int32)
        # Untrained nets make the ip-coupled lattice recursion explode (the
        # torch reference has the same property); shrink weights to keep the
        # dynamics bounded for a shape/range test.
        params = jax.tree.map(lambda x: x * 0.02, tiny_params)
        final, traj = diff.sample(
            params, jax.random.PRNGKey(7), num_atoms, max_atoms=6, step_lr=1e-5
        )
        assert traj is None
        assert final.frac_coords.shape == (2, 6, 3)
        fc = np.asarray(final.frac_coords)
        assert (fc >= 0).all() and (fc < 1).all()
        at = np.asarray(final.atom_types)
        mask = np.asarray(final.mask)
        assert (at[mask] >= 1).all() and (at[mask] <= 100).all()
        assert (at[~mask] == 0).all()
        assert bool(jnp.all(jnp.isfinite(final.lattice)))

    def test_sample_record_traj(self, tiny_diffusion, tiny_params):
        diff = tiny_diffusion
        num_atoms = jnp.array([4, 6], jnp.int32)
        params = jax.tree.map(lambda x: x * 0.02, tiny_params)
        final, traj = diff.sample(
            params, jax.random.PRNGKey(8), num_atoms, max_atoms=6,
            record_traj=True,
        )
        T = diff.config.timesteps
        assert traj["log_prob_x"].shape == (T, 2)
        assert traj["frac_coords"].shape == (T, 2, 6, 3)
        assert bool(jnp.all(jnp.isfinite(traj["log_prob_l"])))


class TestSampleDtype:
    def test_bf16_sampling_close_to_f32(self, tiny_params):
        """bf16 score-net evals must track the f32 trajectory closely."""
        import dataclasses

        cfg32 = DiffCSPConfig(hidden_dim=32, num_layers=2, time_dim=16, timesteps=12)
        cfg16 = dataclasses.replace(cfg32, sample_dtype="bfloat16")
        d32, d16 = DiffCSPDiffusion(cfg32), DiffCSPDiffusion(cfg16)
        params = jax.tree.map(lambda x: x * 0.02, tiny_params)
        num_atoms = jnp.array([4, 6], jnp.int32)
        f32, _ = d32.sample(params, jax.random.PRNGKey(0), num_atoms, max_atoms=6)
        f16, _ = d16.sample(params, jax.random.PRNGKey(0), num_atoms, max_atoms=6)
        # identical RNG; trajectories differ only through net rounding
        d = np.abs(np.asarray(f32.frac_coords - f16.frac_coords))
        d = np.minimum(d, 1 - d)
        assert d.mean() < 0.1
        assert np.isfinite(np.asarray(f16.lattice)).all()


class TestDDPO:
    def test_forward_logprob_matches_recorded(self, tiny_diffusion, tiny_params):
        """Recomputed log-probs equal those recorded during sampling."""
        diff = tiny_diffusion
        params = jax.tree.map(lambda x: x * 0.02, tiny_params)
        num_atoms = jnp.array([4, 6], jnp.int32)
        final, traj = diff.sample(
            params, jax.random.PRNGKey(9), num_atoms, max_atoms=6,
            step_lr=1e-5, record_traj=True,
        )
        mask = final.mask
        i = 2  # some mid-trajectory step (t > 1)
        state = dict(
            timesteps=jnp.full((2,), traj["timestep"][i], jnp.int32),
            atom_types=traj["atom_types"][i],
            frac_coords=traj["frac_coords"][i],
            frac_coords_mid=traj["frac_coords_mid"][i],
            next_frac_coords=traj["next_frac_coords"][i],
            lattices=traj["lattices"][i],
            next_lattices=traj["next_lattices"][i],
            next_atom_types=traj["next_atom_types"][i],
            num_atoms=num_atoms,
        )
        lp_l, lp_t, lp_x, _ = diff.forward_logprob(params, state, mask, 1e-5)
        np.testing.assert_allclose(lp_l, traj["log_prob_l"][i], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(lp_t, traj["log_prob_t"][i], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(lp_x, traj["log_prob_x"][i], rtol=1e-3, atol=1e-3)

    def test_ddpo_update_changes_params(self, tiny_diffusion, tiny_params):
        from matinvent_tpu.parallel.train import DDPOFinetuneStep

        diff = tiny_diffusion
        params = jax.tree.map(lambda x: x * 0.02, tiny_params)
        num_atoms = jnp.array([4, 6], jnp.int32)
        final, traj = diff.sample(
            params, jax.random.PRNGKey(10), num_atoms, max_atoms=6,
            step_lr=1e-5, record_traj=True,
        )
        ddpo = DDPOFinetuneStep(diff, lr=1e-4, chunk=4, step_lr=1e-5)
        rewards = jnp.array([0.9, 0.1])
        new_params, loss = ddpo.run(params, traj, num_atoms, final.mask, rewards)
        assert np.isfinite(loss)
        delta = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(new_params),
                jax.tree_util.tree_leaves(params),
            )
        )
        assert delta > 0


class TestFixedFieldModes:
    """keep_lattice/keep_coords (reference diffusion.py:99-104, 283-349):
    cost < 1e-5 freezes a field through add_noise AND the sampling chain."""

    def test_keep_lattice_add_noise_and_sample(self):
        cfg = DiffCSPConfig(
            hidden_dim=16, num_layers=1, time_dim=8, timesteps=6,
            cost_lattice=0.0,
        )
        d = DiffCSPDiffusion(cfg)
        assert d.keep_lattice and not d.keep_coords
        params = d.init_params(jax.random.PRNGKey(0), max_atoms=4)
        batch = make_batch(jax.random.PRNGKey(1), B=3, A=4)
        noised, _, _ = d.add_noise(jax.random.PRNGKey(2), batch, t_index=0)
        np.testing.assert_allclose(
            np.asarray(noised.lattice), np.asarray(batch.lattice)
        )
        fixed_l = jnp.eye(3)[None].repeat(3, 0) * 5.0
        final, _ = d.sample(
            params, jax.random.PRNGKey(3), batch.num_atoms, max_atoms=4,
            fixed_lattice=fixed_l,
        )
        np.testing.assert_allclose(np.asarray(final.lattice), np.asarray(fixed_l))

    def test_keep_coords_sample_holds_positions(self):
        cfg = DiffCSPConfig(
            hidden_dim=16, num_layers=1, time_dim=8, timesteps=6,
            cost_coord=0.0,
        )
        d = DiffCSPDiffusion(cfg)
        assert d.keep_coords
        params = d.init_params(jax.random.PRNGKey(0), max_atoms=4)
        batch = make_batch(jax.random.PRNGKey(1), B=3, A=4)
        final, _ = d.sample(
            params, jax.random.PRNGKey(3), batch.num_atoms, max_atoms=4,
            fixed_coords=batch.frac_coords,
        )
        np.testing.assert_allclose(
            np.asarray(final.frac_coords), np.asarray(batch.frac_coords % 1.0),
            atol=1e-6,
        )

    def test_misconfigured_fixed_fields_raise(self):
        """A fixed field without the keep_* flag (or keep_* without a fixed
        value) must raise, not silently no-op / diffuse from noise."""
        import pytest

        batch = make_batch(jax.random.PRNGKey(1), B=2, A=4)
        fixed_l = jnp.eye(3)[None].repeat(2, 0) * 5.0

        plain = DiffCSPDiffusion(DiffCSPConfig(
            hidden_dim=16, num_layers=1, time_dim=8, timesteps=6))
        params = plain.init_params(jax.random.PRNGKey(0), max_atoms=4)
        with pytest.raises(ValueError, match="keep_lattice is off"):
            plain.sample(params, jax.random.PRNGKey(3), batch.num_atoms,
                         max_atoms=4, fixed_lattice=fixed_l)
        with pytest.raises(ValueError, match="keep_coords is off"):
            plain.sample(params, jax.random.PRNGKey(3), batch.num_atoms,
                         max_atoms=4, fixed_coords=batch.frac_coords)

        keep_l = DiffCSPDiffusion(DiffCSPConfig(
            hidden_dim=16, num_layers=1, time_dim=8, timesteps=6,
            cost_lattice=0.0))
        params_l = keep_l.init_params(jax.random.PRNGKey(0), max_atoms=4)
        with pytest.raises(ValueError, match="no fixed_lattice"):
            keep_l.sample(params_l, jax.random.PRNGKey(3), batch.num_atoms,
                          max_atoms=4)


def test_training_loss_per_atom_normalization(tiny_diffusion, tiny_params):
    """Pretraining fields are normalized per ATOM (a deliberate 1:3:K
    composition-heavy weighting relative to per-element means — see the
    training_loss docstring; per-element 1:1:1 was A/B'd and collapses the
    demo). Pin the formulas against a hand recomputation at the same key."""
    batch = make_batch(jax.random.PRNGKey(5))
    d = tiny_diffusion
    key = jax.random.PRNGKey(6)
    _, aux = d.training_loss(tiny_params, batch, key)
    # training_loss corrupts with the same key directly: recompute by hand
    noised, targets, _ = d.add_noise(key, batch, t_index=None)
    pred_l, pred_x, pred_t = d.apply_net(
        tiny_params, noised, batch.num_atoms, batch.mask
    )
    mask = np.asarray(batch.mask)
    n = mask.sum()
    lc = np.sum(np.asarray((pred_x - targets.tar_x) ** 2) * mask[..., None]) / n
    lt = np.sum(np.asarray((pred_t - targets.rand_t) ** 2) * mask[..., None]) / n
    ll = np.mean(np.asarray((pred_l - targets.rand_l) ** 2))
    np.testing.assert_allclose(float(aux["loss_coord"]), lc, rtol=1e-5)
    np.testing.assert_allclose(float(aux["loss_type"]), lt, rtol=1e-5)
    np.testing.assert_allclose(float(aux["loss_lattice"]), ll, rtol=1e-5)
