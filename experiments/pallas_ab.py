"""On-chip A/B: fused Pallas CSPLayer vs XLA at the mpts-52 operating point.

VERDICT round-1 flagged that the Pallas kernel loses 5x at the mp-20 point
(A=20, H=128) where XLA keeps the small edge tensors fused. The kernel's
design target is the regime where the [B, A, A, H] edge tensors are too
large to stay fused and XLA must round-trip them through HBM — the
reference's mpts_52 dataset class (crystals up to 52 atoms,
models/sample.py step_lr table). This script times full reverse sampling
(B=64, A=52, T=1000, bf16) both ways and prints one JSON line for
PARITY.md.

    python experiments/pallas_ab.py [A=52] [B=64] [T=1000] [hidden=128]
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
import numpy as np


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    A = int(kv.get("A", 52))
    B = int(kv.get("B", 64))
    T = int(kv.get("T", 1000))
    H = int(kv.get("hidden", 128))
    n_iters = int(kv.get("iters", 3))

    import jax.numpy as jnp

    from matinvent_tpu.models.diffcsp import DiffCSPConfig, DiffCSPDiffusion

    rng = np.random.default_rng(0)
    num_atoms = jnp.asarray(
        np.maximum(rng.integers(A // 2, A + 1, (B,)), 1), jnp.int32
    )

    results = {}
    for name, use_pallas in (("xla", False), ("pallas", True)):
        cfg = DiffCSPConfig(
            hidden_dim=H, num_layers=4, time_dim=256, timesteps=T,
            sample_clip=1e4, sample_dtype="bfloat16", ln=False,
            use_pallas_sampling=use_pallas,
        )
        d = DiffCSPDiffusion(cfg)
        params = d.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=A)

        def run(seed):
            f, _ = d.sample(
                params, jax.random.PRNGKey(seed), num_atoms, max_atoms=A,
                step_lr=1e-5,
            )
            jax.block_until_ready(f.frac_coords)

        run(0)
        t0 = time.perf_counter()
        for i in range(1, n_iters + 1):
            run(i)
        dt = (time.perf_counter() - t0) / n_iters
        results[name] = round(B / dt, 2)
        print(f"[{name}] {B / dt:.2f} structs/sec ({dt:.3f}s / batch)", flush=True)

    results.update(
        A=A, B=B, T=T, hidden=H,
        speedup_pallas_vs_xla=round(results["pallas"] / results["xla"], 3),
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:])
