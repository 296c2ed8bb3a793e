"""Denoising-trajectory parity: the jitted lax.scan PC sampler vs an
independent NumPy re-implementation of the reference update equations
(/root/reference/models/diffcsp/diffusion.py:295-390), using identical noise
(regenerated from the same fold_in key schedule) and the same network outputs.
This pins the predictor-corrector math itself, not just the score network
(BASELINE.json: 'numerical parity ... on denoising trajectories')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.models.diffcsp import (
    DiffCSPConfig,
    DiffCSPDiffusion,
    NoisedInput,
    sinusoidal_time_embedding,
)

T = 6  # short chain: every step checked


@pytest.fixture(scope="module")
def setup():
    cfg = DiffCSPConfig(hidden_dim=32, num_layers=2, time_dim=16, timesteps=T)
    diff = DiffCSPDiffusion(cfg)
    params = jax.tree.map(
        lambda x: x * 0.02,
        diff.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=5),
    )
    return diff, params


def numpy_reference_sampler(diff, params, key, num_atoms, A, step_lr):
    """Reference equations in NumPy; noise regenerated from the same keys."""
    c = diff.config
    B = int(num_atoms.shape[0])
    k_x, k_l, k_t, k_scan = jax.random.split(key, 4)
    x = np.asarray(jax.random.uniform(k_x, (B, A, 3)))
    l = np.asarray(jax.random.normal(k_l, (B, 3, 3)))
    tt = np.asarray(jax.random.normal(k_t, (B, A, c.max_atomic_num)))
    mask = np.arange(A)[None, :] < np.asarray(num_atoms)[:, None]

    beta = jax.device_get(diff.beta)
    sigma = jax.device_get(diff.sigma)

    def net(t, t_t, x_t, l_t):
        time_emb = sinusoidal_time_embedding(jnp.full((B,), t, jnp.int32), c.time_dim)
        out = diff.apply_net(
            params,
            NoisedInput(time_emb, jnp.asarray(t_t), jnp.asarray(x_t), jnp.asarray(l_t)),
            jnp.asarray(num_atoms),
            jnp.asarray(mask),
        )
        return [np.asarray(o) for o in out]

    traj = {}
    for t in range(T, 0, -1):
        alphas = beta.alphas[t]
        abar = beta.alphas_cumprod[t]
        c0 = 1.0 / np.sqrt(alphas)
        c1 = (1 - alphas) / np.sqrt(1 - abar)
        sigmas = beta.sigmas[t]
        sigma_x = sigma.sigmas[t]
        sigma_norm_t = sigma.sigmas_norm[t]

        kt = jax.random.fold_in(k_scan, t)
        kc_x, kp_l, kp_t, kp_x = jax.random.split(kt, 4)
        nz = 1.0 if t > 1 else 0.0
        rand_x_c = nz * np.asarray(jax.random.normal(kc_x, x.shape))
        rand_l = nz * np.asarray(jax.random.normal(kp_l, l.shape))
        rand_t_ = nz * np.asarray(jax.random.normal(kp_t, tt.shape))
        rand_x_p = nz * np.asarray(jax.random.normal(kp_x, x.shape))

        # corrector
        step_size = step_lr * (sigma_x / c.sigma_begin) ** 2
        std_x = np.sqrt(2 * step_size)
        _, pred_x, _ = net(t, tt, x, l)
        pred_x = pred_x * np.sqrt(sigma_norm_t)
        x_half = x - step_size * pred_x + std_x * rand_x_c

        # predictor
        adj = sigma.sigmas[t - 1]
        p_step = sigma_x**2 - adj**2
        p_std = np.sqrt((adj**2 * p_step) / (sigma_x**2))
        pred_l, pred_x, pred_t = net(t, tt, x_half, l)
        pred_x = pred_x * np.sqrt(sigma_norm_t)

        x = (x_half - p_step * pred_x + p_std * rand_x_p) % 1.0
        l = c0 * (l - c1 * pred_l) + sigmas * rand_l
        tt = c0 * (tt - c1 * pred_t) + sigmas * rand_t_
        traj[t] = (x.copy(), l.copy(), tt.copy())
    return x, l, tt, mask


def test_scan_matches_numpy_equations(setup):
    diff, params = setup
    num_atoms = jnp.array([3, 5], jnp.int32)
    A = 5
    key = jax.random.PRNGKey(42)
    step_lr = 1e-5

    final, _ = diff.sample(params, key, num_atoms, max_atoms=A, step_lr=step_lr)
    x_np, l_np, tt_np, mask = numpy_reference_sampler(
        diff, params, key, num_atoms, A, step_lr
    )

    np.testing.assert_allclose(np.asarray(final.frac_coords), x_np % 1.0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(final.lattice), l_np, atol=2e-4)
    expected_types = np.where(mask, tt_np.argmax(-1) + 1, 0)
    np.testing.assert_array_equal(np.asarray(final.atom_types), expected_types)
