"""On-chip ablation microbench of the fused edge-chain kernel (VERDICT #1
lever ii).

First full-bench A/B: fused 53.8 structs/s vs XLA 194.5 — the kernel loses
3.6x. This harness attributes the in-kernel cost: it times the kernel
standalone at the dominant bucket shape (Bb=203, Ab=20: 81k of the 189k
edge rows) via output->input dependency chains (the relay's
block_until_ready does not await execution — chains + one final fetch
measure true device time, see profile_step_r5.py), across block sizes and
with parts of the kernel ablated:

  full       the shipped kernel
  nosin      sin/cos replaced by the raw phases (isolates transcendentals)
  nobcast    ti/tj broadcast-add skipped (isolates 4-D broadcast/relayout)
  noagg      masked j-sum replaced by a j-slice (isolates the reduction)
  gemmonly   all three removed: reshape -> GEMM -> silu -> GEMM -> silu

plus the XLA chain at identical shapes as the baseline the kernel must
beat. Writes experiments/results/fused_edge_ab_r5.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matinvent_tpu.ops.fused_edge import _phase_consts, _round_up

H, NF = 256, 10
DP = 64
CDT = jnp.bfloat16
LINKS = int(os.environ.get("AB_LINKS", "32"))
QUEUE = int(os.environ.get("AB_QUEUE", "4"))


def _kernel_variant(ti_ref, tj_ref, fr_ref, ui_ref, uj_ref, fmat_ref, wd_ref,
                    w1_ref, b1_ref, out_ref, *, mode: str):
    G, Ab, H_ = ti_ref.shape
    Dp = wd_ref.shape[0]
    R = G * Ab * Ab

    fr = fr_ref[...]
    fd = fr[:, None, :, :] - fr[:, :, None, :]
    fd = fd - jnp.floor(fd)
    ph = (
        fd[..., 0:1] * fmat_ref[0:1, :]
        + fd[..., 1:2] * fmat_ref[1:2, :]
        + fd[..., 2:3] * fmat_ref[2:3, :]
    )
    if mode in ("full", "nobcast", "noagg"):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Dp), 3)
        emb = jnp.where(lane < 3 * NF, jnp.sin(ph), jnp.cos(ph))
    else:  # nosin / gemmonly
        emb = ph

    e = jnp.dot(
        emb.astype(CDT).reshape(R, Dp), wd_ref[...],
        preferred_element_type=jnp.float32,
    ).reshape(G, Ab, Ab, H_)
    if mode in ("full", "nosin", "noagg"):
        ti = ti_ref[...].astype(jnp.float32).reshape(G, Ab, 1, H_)
        tj = tj_ref[...].astype(jnp.float32).reshape(G, 1, Ab, H_)
        e = e + ti + tj
    e = jax.nn.silu(e)
    s = jnp.dot(
        e.astype(CDT).reshape(R, H_), w1_ref[...],
        preferred_element_type=jnp.float32,
    )
    s = jax.nn.silu(s + b1_ref[...].astype(jnp.float32))
    s = s.reshape(G, Ab, Ab, H_)
    if mode in ("full", "nosin"):
        uj = uj_ref[...].reshape(G, 1, Ab, 1)
        agg = jnp.sum(s * uj, axis=2)
    else:  # nobcast / gemmonly / noagg: j-slice instead of reduce
        agg = s[:, :, 0, :]
    out_ref[...] = (agg * ui_ref[...]).astype(out_ref.dtype)


def make_call(Bb, Ab, block_rows, mode):
    G = max(1, min(block_rows // (Ab * Ab), Bb))
    Bp = _round_up(Bb, G)

    def pad3(t):
        return jnp.pad(t, ((0, Bp - Bb),) + ((0, 0),) * (t.ndim - 1))

    def call(ti, tj, fr, ui, uj, fmat, wd, w1, b1):
        out = pl.pallas_call(
            functools.partial(_kernel_variant, mode=mode),
            grid=(Bp // G,),
            in_specs=[
                pl.BlockSpec((G, Ab, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, 3), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, DP), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((DP, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (G, Ab, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Bp, Ab, H), CDT),
        )(pad3(ti), pad3(tj), pad3(fr), pad3(ui), pad3(uj), fmat, wd, w1, b1)
        return out[:Bb]

    return call, G


def xla_chain(ti, tj, fr, ui, uj, fmat, wd, w1, b1):
    """The XLA edge chain at identical shapes (mirrors CSPLayer's fc path
    with the hoisted dist embedding recomputed per link, matching what the
    kernel recomputes per layer)."""
    from matinvent_tpu.models.cspnet import sinusoids_embedding

    fd = (fr[:, None, :, :] - fr[:, :, None, :]) % 1.0
    dist = sinusoids_embedding(fd, NF).astype(CDT)
    dist = jnp.pad(dist, ((0, 0),) * 3 + ((0, DP - 6 * NF),))
    e = jnp.einsum("bijd,dh->bijh", dist, wd) + (
        ti[:, :, None, :] + tj[:, None, :, :]
    ).astype(CDT)
    e = jax.nn.silu(e)
    s = jax.nn.silu(jnp.einsum("bijh,hk->bijk", e, w1) + b1.astype(CDT))
    agg = jnp.sum(s * uj[:, None, :, :].astype(CDT), axis=2)
    return (agg * ui).astype(CDT)


def measure_rtt():
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def f(x):
        return x + 1.0

    np.asarray(f(x)[0, :1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x)[0, :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain_time(fn, ti0, rest, rtt):
    @jax.jit
    def chained(ti):
        y = ti
        for _ in range(LINKS):
            y = fn(y, *rest)
        return y

    y = chained(ti0)
    np.asarray(y[0, 0, :1])  # compile + warmup, forced
    t0 = time.perf_counter()
    y = ti0
    for _ in range(QUEUE):
        y = chained(y)
    np.asarray(y[0, 0, :1])
    dt = time.perf_counter() - t0
    return max(dt - rtt, 1e-9) / (LINKS * QUEUE)


def main():
    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"H": H, "links": LINKS, "queue": QUEUE, "rtt_ms": round(rtt * 1e3, 2)}
    results = {}
    for Bb, Ab in [(203, 20)]:
        ti = jnp.asarray(rng.normal(size=(Bb, Ab, H)) * 0.1, CDT)
        tj = jnp.asarray(rng.normal(size=(Bb, Ab, H)) * 0.1, CDT)
        fr = jnp.asarray(rng.uniform(size=(Bb, Ab, 3)), jnp.float32)
        na = rng.integers(1, Ab + 1, (Bb,))
        mask = (np.arange(Ab)[None, :] < na[:, None]).astype(np.float32)
        ui = jnp.asarray((mask / np.maximum(na[:, None], 1))[..., None], jnp.float32)
        uj = jnp.asarray(mask[..., None], jnp.float32)
        fmat = jnp.asarray(_phase_consts(NF, DP))
        wd = jnp.asarray(rng.normal(size=(DP, H)) * 0.05, CDT)
        w1 = jnp.asarray(rng.normal(size=(H, H)) * 0.05, CDT)
        b1 = jnp.asarray(rng.normal(size=(1, H)) * 0.05, CDT)
        rest = (tj, fr, ui, uj, fmat, wd, w1, b1)

        key = f"B{Bb}_A{Ab}"
        results[key] = {}
        t_x = chain_time(xla_chain, ti, rest, rtt)
        results[key]["xla_chain_ms"] = round(t_x * 1e3, 4)
        print(key, "xla", results[key]["xla_chain_ms"], flush=True)

        for mode in ("full", "nosin", "nobcast", "noagg", "gemmonly"):
            for br in (2048, 8192):
                call, G = make_call(Bb, Ab, br, mode)
                try:
                    t_k = chain_time(call, ti, rest, rtt)
                except Exception as e:
                    results[key][f"{mode}_r{br}_ms"] = f"ERR {type(e).__name__}"
                    print(key, mode, br, "ERR", repr(e)[:150], flush=True)
                    continue
                results[key][f"{mode}_r{br}_ms"] = round(t_k * 1e3, 4)
                print(key, mode, br, f"G={G}",
                      results[key][f"{mode}_r{br}_ms"], flush=True)

    out["results"] = results
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "fused_edge_ab_r5.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
