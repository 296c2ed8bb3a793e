"""dp-sharded sampling equivalence (SURVEY.md §2.3 data-parallel design)."""
import jax
import jax.numpy as jnp
import numpy as np


def test_sharded_sampling_matches_unsharded():
    """dp-sharded batch sampling must be numerically identical to unsharded
    (same keys; sharding only changes layout)."""
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
