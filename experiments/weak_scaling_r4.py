"""Weak-scaling measurement of the dp paths on the virtual CPU mesh.

The multichip dryrun proves the sharded programs compile + execute; this
measures the only multi-chip *performance* signal obtainable without real
multi-chip hardware (VERDICT r3 #9): with a FIXED per-device batch, total
work grows linearly with mesh size, so on this 1-core host (all virtual
devices share one core) ideal weak scaling is

    wall(n) == n * wall(1)

Any superlinear growth — overhead(n) = wall(n) / (n * wall(1)) > 1 — exposes
hidden per-step host syncs, resharding, or collective blowup in the scan.
Measured for the dp-sharded reverse-sampling scan (DiffCSP family) and the
dp-sharded MatterGen DDPO update.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        MATINVENT_PLATFORM=cpu python experiments/weak_scaling_r4.py

Writes experiments/results/weak_scaling_r4.json; tests/test_weak_scaling.py
asserts overhead(8) < 1.3 on reduced shapes.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This is by definition a virtual-CPU-mesh experiment: force the platform
# regardless of the axon sitecustomize (the env var alone is NOT enough —
# jax.config must be updated after import, see CLAUDE.md), and make sure
# the host exposes 8 virtual devices before the backend initializes.
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def _timed(fn, repeats: int = 3) -> float:
    fn()  # compile + warmup
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(min(ts))


def measure(
    device_counts=(1, 2, 4, 8),
    per_dev_batch: int = 32,
    max_atoms: int = 8,
    timesteps: int = 100,
    hidden: int = 64,
    layers: int = 2,
    ddpo_timesteps: int = 16,
    repeats: int = 3,
) -> dict:
    """Per-mesh-size wall times for the dp sample scan + MatterGen DDPO
    update at a fixed per-device batch. Returns the artifact dict."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from matinvent_tpu.models.diffcsp import DiffCSPConfig, DiffCSPDiffusion
    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
    )
    from matinvent_tpu.parallel.train import MatterGenDDPOStep

    devices = jax.devices()
    assert len(devices) >= max(device_counts), (
        f"need {max(device_counts)} devices, have {len(devices)} — set "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    A, T = max_atoms, timesteps

    diff = DiffCSPDiffusion(DiffCSPConfig(
        hidden_dim=hidden, num_layers=layers, time_dim=32, timesteps=T,
    ))
    d_params = diff.init_params(jax.random.PRNGKey(0), max_atoms=A)

    mg = MatterGenDiffusion(MatterGenConfig(
        hidden_dim=hidden, num_layers=layers, time_dim=32,
        timesteps=ddpo_timesteps,
    ))
    mg_params = mg.init_params(jax.random.PRNGKey(1), batch_size=2, max_atoms=A)

    out: dict = {
        "config": dict(
            per_dev_batch=per_dev_batch, max_atoms=A, timesteps=T,
            hidden=hidden, layers=layers, ddpo_timesteps=ddpo_timesteps,
        ),
        "sample_s": {},
        "ddpo_s": {},
    }
    rng = np.random.default_rng(0)

    for n in device_counts:
        mesh = Mesh(np.array(devices[:n]), ("dp",))
        dp = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        B = per_dev_batch * n

        num_atoms = jax.device_put(
            jnp.asarray(rng.integers(2, A + 1, (B,)), jnp.int32), dp
        )
        p_repl = jax.device_put(d_params, repl)

        def run_sample():
            final, _ = diff.sample(
                p_repl, jax.random.PRNGKey(2), num_atoms, max_atoms=A,
                step_lr=1e-5,
            )
            jax.block_until_ready(final.frac_coords)

        out["sample_s"][n] = round(_timed(run_sample, repeats), 4)

        # MatterGen DDPO: record a dp-sharded trajectory, time the PPO update
        mgp = jax.device_put(mg_params, repl)
        na = jax.device_put(jnp.full((B,), A, jnp.int32), dp)
        _, traj = mg.sample(
            mgp, jax.random.PRNGKey(3), na, max_atoms=A, record_traj=True
        )
        traj = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "dp")))
            if x.ndim >= 2 and x.shape[1] == B else jax.device_put(x, repl),
            traj,
        )
        mask = jax.device_put(jnp.ones((B, A), bool), dp)
        advantages = jax.device_put(
            jnp.asarray(rng.random(B), jnp.float32), dp
        )
        ddpo = MatterGenDDPOStep(mg, lr=1e-4, chunk=ddpo_timesteps, epochs=1)

        def run_ddpo():
            new_p, loss = ddpo.run(mgp, traj, na, mask, advantages)
            jax.block_until_ready(new_p)

        out["ddpo_s"][n] = round(_timed(run_ddpo, repeats), 4)

    base = device_counts[0]
    for kind in ("sample", "ddpo"):
        out[f"{kind}_overhead"] = {
            n: round(
                out[f"{kind}_s"][n] / (n / base * out[f"{kind}_s"][base]), 3
            )
            for n in device_counts
        }
    return out


def main() -> None:
    res = measure()
    res["note"] = (
        "1-core host: all virtual devices share one core, so ideal weak "
        "scaling is wall(n) = n*wall(1); overhead(n) = wall(n)/(n*wall(1)). "
        "overhead ~1 => no hidden host syncs / resharding in the scans. "
        "Sub-1.0 overheads are expected and benign: wall(1) includes a "
        "per-dispatch fixed cost (host->relay dispatch + scan bookkeeping) "
        "that does NOT grow with mesh size, so the n*wall(1) denominator "
        "over-counts it n times; larger meshes amortize it over n* the "
        "work. The signal this harness guards against is overhead >> 1 "
        "(hidden per-step resharding/sync), bounded max-over-n in "
        "tests/test_weak_scaling.py."
    )
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "weak_scaling_r4.json",
    )
    with open(path, "w") as fh:
        json.dump(res, fh, indent=2)
        fh.write("\n")
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
