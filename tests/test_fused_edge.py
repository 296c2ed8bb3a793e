"""Fused edge-chain Pallas kernel (ops/fused_edge.py) — CPU interpret-mode
parity against the XLA layer it replaces.

The kernel computes the whole fc edge branch of a CSPLayer (Fourier emb ->
edge_mlp_0 -> silu -> edge_mlp_1 -> silu -> masked mean) in VMEM; these
tests pin (a) the raw kernel against the reference einsum math, including
the B-padding path and padded-atom masking, (b) the MatterGenScoreNet fused
vs plain variants on shared params, and (c) that DDPO's record_traj sampling
and forward_logprob replay stay on the plain net (importance ratio exactly 1
at identical params) even when fused sampling is enabled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.models.cspnet import sinusoids_embedding
from matinvent_tpu.ops.fused_edge import fused_edge_chain


def _reference_edge_chain(ti, tj, fr, mask, denom, wd, w1, b1, nf):
    fd = (fr[:, None, :, :] - fr[:, :, None, :]) % 1.0
    dist = sinusoids_embedding(fd, nf)
    edge = (
        jnp.einsum("bijd,dh->bijh", dist, wd)
        + ti[:, :, None, :]
        + tj[:, None, :, :]
    )
    edge = jax.nn.silu(edge)
    edge = jax.nn.silu(edge @ w1 + b1)
    em = mask[:, :, None] & mask[:, None, :]
    edge = edge * em[..., None].astype(edge.dtype)
    agg = jnp.sum(edge, axis=2) / denom[:, None, None]
    return agg * mask[..., None]


@pytest.mark.parametrize("B,A,H,nf", [(5, 4, 32, 3), (7, 8, 64, 10)])
def test_kernel_matches_reference_math(B, A, H, nf):
    rng = np.random.default_rng(B + A)
    D = 6 * nf
    ti = jnp.asarray(rng.normal(size=(B, A, H)), jnp.float32)
    tj = jnp.asarray(rng.normal(size=(B, A, H)), jnp.float32)
    fr = jnp.asarray(rng.uniform(size=(B, A, 3)), jnp.float32)
    na = jnp.asarray(rng.integers(1, A + 1, (B,)), jnp.int32)
    mask = jnp.arange(A)[None, :] < na[:, None]
    denom = jnp.maximum(na.astype(jnp.float32), 1.0)
    wd = jnp.asarray(rng.normal(size=(D, H)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H, H)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)

    ui = (mask.astype(jnp.float32) / denom[:, None])[..., None]
    uj = mask.astype(jnp.float32)[..., None]
    # block_rows=3*A*A forces G=3, which does not divide either B: exercises
    # the zero-padding path
    out = fused_edge_chain(
        ti, tj, fr, ui, uj, wd, w1, b1, num_freqs=nf, block_rows=3 * A * A
    )
    ref = _reference_edge_chain(ti, tj, fr, mask, denom, wd, w1, b1, nf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # padded-atom rows must be exactly zero (u_i folds the row mask)
    pad = np.asarray(out)[~np.asarray(mask)]
    assert np.all(pad == 0.0)


def test_score_net_fused_matches_plain():
    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
        MGNoised,
    )

    B, A = 6, 8
    base = dict(hidden_dim=32, num_layers=2, time_dim=16, timesteps=16)
    d_plain = MatterGenDiffusion(MatterGenConfig(**base))
    d_fused = MatterGenDiffusion(
        MatterGenConfig(**base, fused_edge_sampling=True)
    )
    params = d_plain.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=A)

    rng = np.random.default_rng(0)
    na = jnp.asarray(rng.integers(1, A + 1, (B,)), jnp.int32)
    mask = jnp.arange(A)[None, :] < na[:, None]
    noised = MGNoised(
        jnp.full((B,), 0.5),
        jnp.asarray(rng.normal(size=(B, 16)), jnp.float32),
        jnp.asarray(rng.integers(0, 100, (B, A)), jnp.int32),
        jnp.asarray(rng.uniform(size=(B, A, 3)), jnp.float32),
        jnp.asarray(np.eye(3)[None] * 3 + rng.normal(size=(B, 3, 3)) * 0.1,
                    jnp.float32),
    )

    o_plain = jax.jit(
        lambda p: d_plain.apply_net(p, noised, na, mask, net=d_plain.sample_net)
    )(params)
    o_fused = jax.jit(
        lambda p: d_fused.apply_net(p, noised, na, mask, net=d_fused.sample_net)
    )(params)
    for k in o_plain:
        np.testing.assert_allclose(
            np.asarray(o_plain[k]), np.asarray(o_fused[k]), atol=2e-4,
            err_msg=k,
        )


def test_record_traj_stays_plain_importance_ratio_one():
    """With fused sampling ON, trajectory recording + forward_logprob replay
    must both run the plain net: the replayed log-probs at identical params
    reproduce the recorded behavior-policy values exactly."""
    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
    )

    cfg = MatterGenConfig(
        hidden_dim=16, num_layers=1, time_dim=8, timesteps=6,
        sample_clip=100.0, fused_edge_sampling=True,
    )
    d = MatterGenDiffusion(cfg)
    A = 4
    params = d.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=A)
    na = jnp.asarray([2, 4, 3], jnp.int32)

    final, traj = d.sample(
        params, jax.random.PRNGKey(1), na, max_atoms=A, record_traj=True
    )
    assert np.isfinite(np.asarray(final.frac_coords)).all()

    mask = jnp.arange(A)[None, :] < na[:, None]
    tables = d._step_tables()
    for i in (0, 2):
        state = {
            k: traj[k][i]
            for k in ("step", "cell_in", "pos_in", "types_in",
                      "pos_mid", "cell", "pos", "types")
        }
        lp_cell, lp_types, lp_pos, _ = d.forward_logprob(
            params, state, na, mask, tables
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
