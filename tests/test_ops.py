"""Unit tests for the crystal-math ops core (SURVEY.md §4 test strategy (a))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.ops import (
    lattice_params_to_matrix,
    lattice_matrix_to_params,
    frac_to_cart,
    cart_to_frac,
    p_wrapped_normal,
    d_log_p_wrapped_normal,
    log_prob_wrapped_normal,
    BetaSchedule,
    SigmaSchedule,
    masked_mean,
    graph_mean,
)
from matinvent_tpu.ops.lattice import lattice_volume


class TestLattice:
    def test_cubic_lattice(self):
        lengths = jnp.array([[4.0, 4.0, 4.0]])
        angles = jnp.array([[90.0, 90.0, 90.0]])
        lat = lattice_params_to_matrix(lengths, angles)
        # Cubic cell: volume 64, all rows orthogonal with norm 4.
        np.testing.assert_allclose(lattice_volume(lat), 64.0, rtol=1e-5)
        np.testing.assert_allclose(
            jnp.linalg.norm(lat, axis=-1), jnp.full((1, 3), 4.0), rtol=1e-6
        )

    def test_params_roundtrip(self):
        rng = np.random.default_rng(0)
        lengths = jnp.asarray(rng.uniform(2.0, 10.0, (16, 3)))
        angles = jnp.asarray(rng.uniform(60.0, 120.0, (16, 3)))
        lat = lattice_params_to_matrix(lengths, angles)
        lengths2, angles2 = lattice_matrix_to_params(lat)
        np.testing.assert_allclose(lengths2, lengths, rtol=1e-4)
        np.testing.assert_allclose(angles2, angles, rtol=1e-4)

    def test_frac_cart_roundtrip(self):
        rng = np.random.default_rng(1)
        lengths = jnp.asarray(rng.uniform(3.0, 8.0, (4, 3)))
        angles = jnp.asarray(rng.uniform(80.0, 100.0, (4, 3)))
        lat = lattice_params_to_matrix(lengths, angles)
        frac = jnp.asarray(rng.uniform(0, 1, (4, 10, 3)))
        cart = frac_to_cart(frac, lat)
        frac2 = cart_to_frac(cart, lat)
        # circular distance: a coord at 0.9999 may legitimately wrap to 0.0;
        # tolerance reflects float32 pinv conditioning on skewed cells.
        d = np.abs(np.asarray(frac2 - frac))
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 2e-3

    def test_known_monoclinic(self):
        # Monoclinic: alpha=gamma=90, beta=100 -> volume = abc*sin(beta)
        lengths = jnp.array([[3.0, 4.0, 5.0]])
        angles = jnp.array([[90.0, 100.0, 90.0]])
        lat = lattice_params_to_matrix(lengths, angles)
        vol = 3.0 * 4.0 * 5.0 * np.sin(np.deg2rad(100.0))
        np.testing.assert_allclose(lattice_volume(lat), vol, rtol=1e-5)


class TestWrappedNormal:
    def test_score_matches_numerical_derivative(self):
        # Reference convention: d_log_p returns +d/dx of the sum with (x+Ti)
        # inside, i.e. the negative log-derivative. Validate against numeric.
        x = jnp.linspace(0.05, 0.95, 19)
        sigma = jnp.full_like(x, 0.3)
        eps = 5e-3  # large enough to beat f32 cancellation in the difference
        log_p = lambda z: jnp.log(p_wrapped_normal(z, sigma))
        num = (log_p(x + eps) - log_p(x - eps)) / (2 * eps)
        ana = d_log_p_wrapped_normal(x, sigma)
        np.testing.assert_allclose(ana, -num, atol=5e-3)

    def test_periodicity(self):
        x = jnp.array([0.3])
        sigma = jnp.array([0.5])
        np.testing.assert_allclose(
            p_wrapped_normal(x, sigma), p_wrapped_normal(x + 1.0, sigma), rtol=1e-5
        )

    def test_small_sigma_matches_gaussian(self):
        # With tiny sigma the wrap is irrelevant: score ~ x/sigma^2 (ref sign).
        x = jnp.array([0.01])
        sigma = jnp.array([0.05])
        ana = d_log_p_wrapped_normal(x, sigma)
        np.testing.assert_allclose(ana, x / sigma**2, rtol=1e-4)

    def test_log_prob_stable_and_symmetric(self):
        x = jnp.array([0.2, 0.8])
        mu = jnp.array([0.5, 0.5])
        sigma = jnp.array(1e-3)
        lp = log_prob_wrapped_normal(x, mu, sigma)
        assert bool(jnp.all(jnp.isfinite(lp)))
        # symmetric around mu
        np.testing.assert_allclose(lp[0], lp[1], rtol=1e-5)


class TestSchedules:
    def test_beta_schedule_tables(self):
        sched = BetaSchedule.create(100, "cosine")
        assert sched.betas.shape == (101,)
        assert float(sched.betas[0]) == 0.0
        assert float(sched.alphas_cumprod[0]) == 1.0
        # alphas_cumprod monotonically decreasing after index 0
        diffs = np.diff(np.asarray(sched.alphas_cumprod[1:]))
        assert (diffs <= 0).all()
        # posterior sigma at t=1 is 0 since abar_0 = 1
        np.testing.assert_allclose(float(sched.sigmas[1]), 0.0, atol=1e-8)

    def test_cosine_beta_values(self):
        betas = np.asarray(BetaSchedule.create(1000, "cosine").betas[1:])
        assert betas.min() >= 0.0001 - 1e-9 and betas.max() <= 0.9999 + 1e-9

    def test_sigma_schedule(self):
        sched = SigmaSchedule.create(50, 0.01, 1.0, num_mc_samples=2000)
        assert sched.sigmas.shape == (51,)
        np.testing.assert_allclose(float(sched.sigmas[1]), 0.01, rtol=1e-5)
        np.testing.assert_allclose(float(sched.sigmas[-1]), 1.0, rtol=1e-5)
        # for small sigma, E[score^2] ~ 1/sigma^2
        np.testing.assert_allclose(
            float(sched.sigmas_norm[1]), 1.0 / 0.01**2, rtol=0.1
        )

    def test_uniform_sample_t_range(self):
        sched = BetaSchedule.create(10, "cosine")
        ts = sched.uniform_sample_t(jax.random.PRNGKey(0), 1000)
        assert int(ts.min()) >= 1 and int(ts.max()) <= 10


class TestSegment:
    def test_masked_mean(self):
        x = jnp.array([[1.0, 2.0, 100.0], [3.0, 5.0, 7.0]])
        mask = jnp.array([[True, True, False], [True, True, True]])
        out = masked_mean(x, mask, axis=1)
        np.testing.assert_allclose(out, jnp.array([1.5, 5.0]))

    def test_graph_mean_features(self):
        x = jnp.ones((2, 4, 8))
        x = x.at[0, 2:].set(99.0)  # padded atoms carry garbage
        mask = jnp.array([[True, True, False, False], [True] * 4])
        out = graph_mean(x, mask)
        np.testing.assert_allclose(out, jnp.ones((2, 8)))


class TestNeighbors:
    def test_min_image_distances_simple_cubic(self):
        from matinvent_tpu.ops.neighbors import min_image_distances

        lat = jnp.eye(3)[None] * 4.0
        frac = jnp.array([[[0.0, 0, 0], [0.9, 0, 0]]])
        d = min_image_distances(frac, lat)
        # min image: 0.1 * 4 = 0.4 (not 0.9 * 4)
        np.testing.assert_allclose(float(d[0, 0, 1]), 0.4, atol=1e-5)
        # self term = shortest lattice translation = 4.0
        np.testing.assert_allclose(float(d[0, 0, 0]), 4.0, atol=1e-5)

    def test_radius_knn_mask(self):
        from matinvent_tpu.ops.neighbors import radius_knn_mask

        lat = jnp.eye(3)[None] * 10.0
        frac = jnp.array([[[0.0, 0, 0], [0.05, 0, 0], [0.5, 0.5, 0.5], [0.0, 0, 0]]])
        mask = jnp.array([[True, True, True, False]])
        em = radius_knn_mask(frac, lat, mask, cutoff=2.0, max_neighbors=2)
        em = np.asarray(em[0])
        assert em[0, 1] and em[1, 0]       # 0.5 A apart
        assert not em[0, 2]                # ~8 A, beyond cutoff
        assert not em[:, 3].any() and not em[3].any()  # padded atom isolated

    def test_knn_cspnet_forward(self):
        from matinvent_tpu.models.cspnet import CSPNet

        net = CSPNet(hidden_dim=16, latent_dim=8, num_layers=1, edge_style="knn",
                     cutoff=5.0, max_neighbors=4)
        B, A = 2, 5
        key = jax.random.PRNGKey(0)
        params = net.init(
            key, jnp.zeros((B, 8)), jnp.zeros((B, A, 100)),
            jax.random.uniform(key, (B, A, 3)), jnp.eye(3)[None].repeat(B, 0) * 4,
            jnp.full((B,), A, jnp.int32), jnp.ones((B, A), bool),
        )
        l, x, t = net.apply(
            params, jnp.zeros((B, 8)), jnp.zeros((B, A, 100)),
            jax.random.uniform(key, (B, A, 3)), jnp.eye(3)[None].repeat(B, 0) * 4,
            jnp.full((B,), A, jnp.int32), jnp.ones((B, A), bool),
        )
        assert np.isfinite(np.asarray(x)).all()


class TestScaler:
    def test_fit_transform_roundtrip(self):
        from matinvent_tpu.utils.scaler import StandardScaler

        rng = np.random.default_rng(0)
        x = rng.standard_normal((50, 3)) * 5 + 2
        sc = StandardScaler().fit(x)
        y = sc.transform(x)
        np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-5)
        back = sc.inverse_transform(y)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)
        sc2 = StandardScaler.from_state_dict(sc.state_dict())
        np.testing.assert_allclose(np.asarray(sc2.means), np.asarray(sc.means))


class TestXlaOpts:
    def test_parse_and_default(self, monkeypatch):
        from matinvent_tpu.utils import xla_opts

        monkeypatch.delenv("MATINVENT_XLA_OPTS", raising=False)
        assert xla_opts.compiler_options() is None
        monkeypatch.setenv(
            "MATINVENT_XLA_OPTS",
            "xla_tpu_enable_latency_hiding_scheduler=true, a = b ,",
        )
        assert xla_opts.compiler_options() == {
            "xla_tpu_enable_latency_hiding_scheduler": "true",
            "a": "b",
        }
        monkeypatch.setenv("MATINVENT_XLA_OPTS", "notakv")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            xla_opts.compiler_options()
