"""Pallas fused CSPLayer: parity with the linen/XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.models.cspnet import CSPNet
from matinvent_tpu.models.cspnet_pallas import cspnet_forward_pallas
from matinvent_tpu.models.diffcsp import sinusoidal_time_embedding

HID, LAT, K, NFREQ, LAYERS = 32, 16, 100, 10, 2


@pytest.fixture(scope="module")
def net_and_params():
    net = CSPNet(
        hidden_dim=HID, latent_dim=LAT, num_layers=LAYERS, max_atoms=K,
        num_freqs=NFREQ, smooth=True, pred_type=True,
    )
    B, A = 8, 8
    key = jax.random.PRNGKey(0)
    params = net.init(
        key,
        jnp.zeros((B, LAT)),
        jnp.zeros((B, A, K)),
        jnp.zeros((B, A, 3)),
        jnp.eye(3)[None].repeat(B, 0),
        jnp.full((B,), A, jnp.int32),
        jnp.ones((B, A), bool),
    )
    return net, params


def make_inputs(B=8, A=8, seed=1):
    rng = np.random.default_rng(seed)
    num_atoms = jnp.asarray(rng.integers(3, A + 1, (B,)), jnp.int32)
    mask = jnp.arange(A)[None] < num_atoms[:, None]
    t_emb = sinusoidal_time_embedding(jnp.asarray(rng.integers(1, 10, (B,))), LAT)
    probs = jnp.asarray(rng.standard_normal((B, A, K)), jnp.float32)
    frac = jnp.asarray(rng.random((B, A, 3)), jnp.float32)
    lat = jnp.asarray(
        np.eye(3)[None] * 4.0 + 0.2 * rng.standard_normal((B, 3, 3)), jnp.float32
    )
    return t_emb, probs, frac, lat, num_atoms, mask


def test_pallas_forward_matches_xla_f32(net_and_params):
    net, params = net_and_params
    t_emb, probs, frac, lat, num_atoms, mask = make_inputs()
    l_ref, x_ref, t_ref = net.apply(params, t_emb, probs, frac, lat, num_atoms, mask)
    l_p, x_p, t_p = cspnet_forward_pallas(
        params, t_emb, probs, frac, lat, num_atoms, mask,
        num_layers=LAYERS, num_freqs=NFREQ, dtype=jnp.float32,
        block_b=4, interpret=True,
    )
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(x_p)[m], np.asarray(x_ref)[m], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(t_p)[m], np.asarray(t_ref)[m], atol=2e-4
    )


def test_pallas_forward_bf16_close(net_and_params):
    net, params = net_and_params
    t_emb, probs, frac, lat, num_atoms, mask = make_inputs(seed=2)
    l_ref, x_ref, t_ref = net.apply(params, t_emb, probs, frac, lat, num_atoms, mask)
    l_p, x_p, t_p = cspnet_forward_pallas(
        params, t_emb, probs, frac, lat, num_atoms, mask,
        num_layers=LAYERS, num_freqs=NFREQ, dtype=jnp.bfloat16,
        block_b=4, interpret=True,
    )
    # compare only real atoms (padded rows differ by design: the kernel
    # masks j-contributions only; padding is masked downstream) with a
    # bf16-rounding tolerance relative to activation scale
    m = np.asarray(mask)
    scale = float(np.abs(np.asarray(x_ref)[m]).max()) + 1e-6
    assert float(np.abs(np.asarray(x_p)[m] - np.asarray(x_ref)[m]).max()) < 0.1 * scale
    np.testing.assert_allclose(
        np.asarray(l_p), np.asarray(l_ref), atol=0.1 * scale
    )


def test_sharded_sampling_matches_unsharded():
    """dp-sharded batch sampling must be numerically identical to unsharded
    (same keys; sharding only changes layout)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from matinvent_tpu.models.diffcsp import DiffCSPConfig, DiffCSPDiffusion

    diff = DiffCSPDiffusion(
        DiffCSPConfig(hidden_dim=16, num_layers=1, time_dim=8, timesteps=6)
    )
    params = jax.tree.map(
        lambda x: x * 0.02, diff.init_params(jax.random.PRNGKey(0), max_atoms=4)
    )
    B = 16
    num_atoms = jnp.asarray(np.random.default_rng(0).integers(1, 5, (B,)), jnp.int32)

    f_plain, _ = diff.sample(params, jax.random.PRNGKey(1), num_atoms, max_atoms=4)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    dp = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    f_shard, _ = diff.sample(
        jax.device_put(params, repl),
        jax.random.PRNGKey(1),
        jax.device_put(num_atoms, dp),
        max_atoms=4,
    )
    np.testing.assert_allclose(
        np.asarray(f_plain.frac_coords), np.asarray(f_shard.frac_coords), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(f_plain.lattice), np.asarray(f_shard.lattice), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(f_plain.atom_types), np.asarray(f_shard.atom_types)
    )
