"""Round-4 step-time attribution for the bucketed sampling scan (VERDICT #2).

The headline operating point (MatterGen-class h256/L6, batch 1024, 4 size
buckets, 1000 PC steps, bf16) leaves the chip ~55% idle by the analytic
matmul-FLOPs MFU model. This harness decomposes one scan step into measured
components so the gap is attributed, not guessed:

  full      the bench workload (sampler.launch -> sample_bucketed)
  nc0       n_corrector=0 (1 net eval/step instead of 2): the difference
            isolates the corrector eval + its coord update math
  netonly   a scan doing ONLY 2 chained score-net evals per step at the
            same bucket shapes (no sampler math, no RNG, no D3PM draw):
            full - netonly = the sampler's per-step overhead
  gemm      best-case XLA chain for the dominant edge path per layer
            (term_d GEMM [rows,60]@[60,256] + edge_mlp_1 [rows,256]@[256,256]
            + silu, rows = sum_b B_b*A_b^2): the achievable ceiling for the
            edge work if everything else were free
  hbm       achieved HBM copy bandwidth (roofline denominator)

plus XLA's own cost_analysis (flops / bytes accessed) of the compiled
bucketed executable, giving the arithmetic-intensity side of the roofline.

Writes experiments/results/profile_step_r4.json. Run on the chip:
    python experiments/profile_step_r4.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", "1024"))
A, T, H, L = 20, 1000, 256, 6
N_BUCKETS = int(os.environ.get("BENCH_BUCKETS", "4"))
V5E_BF16_PEAK = 197e12
V5E_HBM_BYTES = 819e9  # spec sheet


def timed(fn, n=3):
    fn()  # compile + warmup
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    from matinvent_tpu.models.mattergen.diffusion import (
        MatterGenConfig,
        MatterGenDiffusion,
        MGNoised,
    )
    from matinvent_tpu.models.mattergen.sample import MatterGenSampler

    out: dict = {"operating_point": dict(B=B, A=A, T=T, H=H, L=L, buckets=N_BUCKETS)}

    def make(nc: int) -> tuple:
        cfg = MatterGenConfig(
            hidden_dim=H, num_layers=L, time_dim=256, timesteps=T,
            n_corrector=nc, sample_dtype="bfloat16",
        )
        d = MatterGenDiffusion(cfg)
        p = d.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=A)
        return d, p

    diffusion, params = make(1)
    sampler = MatterGenSampler(
        batch_size=B, num_batches=1, max_atoms=A,
        num_atoms_distribution="mp_20", size_buckets=N_BUCKETS, seed=0,
    )
    draws = sampler._draw_num_atoms(B)
    cuts, caps = sampler.bucket_plan(draws)
    rows_list = [len(c) for c in cuts]
    out["bucket_plan"] = {"rows": rows_list, "caps": caps}

    def run_full(d, p):
        s = MatterGenSampler(
            batch_size=B, num_batches=1, max_atoms=A,
            num_atoms_distribution="mp_20", size_buckets=N_BUCKETS, seed=0,
        )
        final = s.launch((d, p))
        jax.block_until_ready(final.frac_coords)

    out["full_s"] = timed(lambda: run_full(diffusion, params))

    d0, p0 = make(0)
    out["nc0_s"] = timed(lambda: run_full(d0, p0))

    # ---- netonly: 2 chained net evals per step at the same bucket shapes
    tables = jax.device_put(
        {k: v for k, v in diffusion._step_tables().items() if k in ("t", "time_emb")}
    )

    na_buckets = [jnp.asarray(np.minimum(draws[c], cap)) for c, cap in zip(cuts, caps)]
    inits = []
    for bi, (na, cap) in enumerate(zip(na_buckets, caps)):
        st, mask, _, _ = diffusion._sample_init(
            jax.random.fold_in(jax.random.PRNGKey(0), bi), na, int(cap), None
        )
        inits.append((st, mask, na))

    @jax.jit
    def netonly(params, inits):
        def step(carry, i):
            new = []
            for (st, mask, na) in carry:
                cell, pos, types = st
                bsz = na.shape[0]
                t = jnp.full((bsz,), tables["t"][i])
                emb = jnp.broadcast_to(tables["time_emb"][i][None, :], (bsz, 256))
                for _ in range(2):
                    preds = diffusion.apply_net(
                        params, MGNoised(t, emb, types, pos, cell), na, mask,
                        net=diffusion.sample_net,
                    )
                    pos = (pos + 1e-6 * preds["pos"].astype(jnp.float32)) % 1.0
                    cell = cell + 1e-6 * preds["cell"].astype(jnp.float32)
                new.append(((cell, pos, types), mask, na))
            return new, None

        carry, _ = jax.lax.scan(step, inits, jnp.arange(T))
        return [c[0][1] for c in carry]

    def run_netonly():
        r = netonly(params, inits)
        jax.block_until_ready(r[0])

    out["netonly_s"] = timed(run_netonly)

    # ---- gemm: dominant edge path only, best-case layout
    rows = int(sum(r * c * c for r, c in zip(rows_list, caps)))
    wd = jnp.asarray(np.random.randn(60, H) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(np.random.randn(H, H) * 0.05, jnp.bfloat16)
    x0 = jnp.asarray(np.random.randn(rows, 60) * 0.1, jnp.bfloat16)

    @jax.jit
    def gemm_chain(x0, wd, w1):
        def step(x, _):
            # per net eval: L layers of term_d + edge_mlp_1 (+ silus)
            h = x
            for _ in range(L):
                e = jax.nn.silu(h @ wd)
                e = jax.nn.silu(e @ w1)
                # keep a 60-wide carry so the chain doesn't collapse
                h = e[:, :60] * 1e-3 + x
            return h, None

        x, _ = jax.lax.scan(step, x0, jnp.arange(2 * T))
        return x

    def run_gemm():
        jax.block_until_ready(gemm_chain(x0, wd, w1))

    out["gemm_s"] = timed(run_gemm)
    gemm_flops = 2 * T * L * (2 * rows * 60 * H + 2 * rows * H * H)
    out["gemm_mfu"] = round(gemm_flops / out["gemm_s"] / V5E_BF16_PEAK, 4)
    out["edge_rows"] = rows

    # ---- hbm: achieved copy bandwidth
    big = jnp.zeros((256, 1024, 1024), jnp.float32)  # 1 GiB

    @jax.jit
    def bump(x):
        return x + 1.0

    def run_hbm():
        jax.block_until_ready(bump(big))

    hbm_s = timed(run_hbm)
    out["hbm_copy_gbps"] = round(2 * big.nbytes / hbm_s / 1e9, 1)

    # ---- XLA cost analysis of the compiled bucketed program
    try:
        ca = (
            jax.jit(
                lambda p, k: diffusion.sample_bucketed(
                    p, k, tuple(na_buckets), tuple(int(c) for c in caps)
                )
            )
            .lower(params, jax.random.PRNGKey(0))
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["xla_cost_analysis"] = {
            "flops": ca.get("flops"),
            "bytes_accessed": ca.get("bytes accessed"),
            "transcendentals": ca.get("transcendentals"),
        }
    except Exception as e:  # relay backends may not expose it
        out["xla_cost_analysis"] = {"error": repr(e)}

    # ---- derived attribution
    evals = 2 * T
    flops = 0.0
    from bench import _mattergen_flops_per_eval

    for r, c in zip(rows_list, caps):
        flops += _mattergen_flops_per_eval(r, c, H, L) * evals
    out["analytic_flops"] = flops
    out["mfu_full"] = round(flops / out["full_s"] / V5E_BF16_PEAK, 4)
    out["mfu_netonly"] = round(flops / out["netonly_s"] / V5E_BF16_PEAK, 4)
    out["sampler_overhead_s"] = round(out["full_s"] - out["netonly_s"], 4)
    out["corrector_share_s"] = round(out["full_s"] - out["nc0_s"], 4)
    if isinstance(out["xla_cost_analysis"], dict) and out[
        "xla_cost_analysis"
    ].get("bytes_accessed"):
        ba = out["xla_cost_analysis"]["bytes_accessed"]
        out["hbm_bound_floor_s"] = round(ba / (out["hbm_copy_gbps"] * 1e9), 3)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "profile_step_r4.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
