"""On-chip A/B of per-compile XLA scheduler options on the sampling scan.

jax.jit(compiler_options=...) forwards proto-backed DebugOptions per
compile (works through the axon relay, unlike XLA_FLAGS which the CPU
client rejects). For the production paths the same options flow through
the MATINVENT_XLA_OPTS env knob (matinvent_tpu/utils/xla_opts.py) — the
headline-path A/B is archived in results/xla_flags_ab_r3.json: the
latency-hiding scheduler is neutral on one chip (no collectives to hide).

    python experiments/compiler_flags_ab.py [B=64] [A=20] [T=1000]
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    B, A, T = int(kv.get("B", 64)), int(kv.get("A", 20)), int(kv.get("T", 1000))

    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
    )

    cfg = MatterGenConfig(
        hidden_dim=256, num_layers=6, time_dim=256, timesteps=T,
        n_corrector=1, sample_dtype="bfloat16",
    )
    d = MatterGenDiffusion(cfg)
    params = d.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=A)
    rng = np.random.default_rng(0)
    num_atoms = jnp.asarray(np.maximum(rng.integers(1, A + 1, (B,)), 1), jnp.int32)

    variants = {
        "baseline": None,
        "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
        "lhs+aggressive": {
            "xla_tpu_enable_latency_hiding_scheduler": "true",
            "xla_tpu_aggressive_opt_barrier_removal": "true",
        },
    }
    results = {}
    for name, opts in variants.items():
        fn = jax.jit(
            lambda p, k: d.sample(p, k, num_atoms, max_atoms=A)[0].frac_coords,
            compiler_options=opts,
        )
        try:
            jax.block_until_ready(fn(params, jax.random.PRNGKey(0)))
        except Exception as e:  # unknown flag on this libtpu etc.
            print(f"[{name}] failed: {str(e)[:120]}", flush=True)
            continue
        t0 = time.perf_counter()
        for i in range(1, 3):
            jax.block_until_ready(fn(params, jax.random.PRNGKey(i)))
        dt = (time.perf_counter() - t0) / 2
        results[name] = round(B / dt, 2)
        print(f"[{name}] {B / dt:.2f} structs/sec", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:])
