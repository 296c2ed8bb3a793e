"""Part 2 of the fused-edge A/B (VERDICT #1 lever ii, literal form).

The r4 verdict asked for the *flattened-form* kernel: GEMM -> silu -> GEMM
over the already-flattened [rows, .] operands with standard matmul tiling,
no edge-form layout change, aggregation left to XLA. This measures exactly
that (mode "flat": inputs emb [R, 64] + tsum [R, 256], output s2 [R, 256])
against the identical XLA sub-chain, plus the 4-D kernel with the Fourier
embedding passed in precomputed (mode "demb": kills the in-kernel sin/cos
that part 1 attributed at 45% of kernel time).

Chain-timing methodology as in fused_edge_ab_r5.py (the relay's
block_until_ready does not await execution). Writes
experiments/results/fused_edge_flat_r5.json.
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

from matinvent_tpu.ops.fused_edge import _round_up

H, DP = 256, 64
CDT = jnp.bfloat16
LINKS = int(os.environ.get("AB_LINKS", "32"))
QUEUE = int(os.environ.get("AB_QUEUE", "4"))
R_TOTAL = 203 * 20 * 20  # the dominant bucket's edge rows (81,200)


def _flat_kernel(emb_ref, ts_ref, wd_ref, w1_ref, b1_ref, out_ref):
    e = jnp.dot(emb_ref[...], wd_ref[...], preferred_element_type=jnp.float32)
    e = jax.nn.silu(e + ts_ref[...].astype(jnp.float32))
    s = jnp.dot(
        e.astype(CDT), w1_ref[...], preferred_element_type=jnp.float32
    )
    out_ref[...] = jax.nn.silu(
        s + b1_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


def make_flat(R, rows_blk):
    Rp = _round_up(R, rows_blk)

    def call(ts, emb, wd, w1, b1):
        ts = jnp.pad(ts, ((0, Rp - R), (0, 0)))
        emb = jnp.pad(emb, ((0, Rp - R), (0, 0)))
        out = pl.pallas_call(
            _flat_kernel,
            grid=(Rp // rows_blk,),
            in_specs=[
                pl.BlockSpec((rows_blk, DP), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_blk, H), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((DP, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (rows_blk, H), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Rp, H), CDT),
        )(emb, ts, wd, w1, b1)
        return out[:R]

    return call


def flat_xla(ts, emb, wd, w1, b1):
    e = jax.nn.silu(jnp.dot(emb, wd) + ts)
    return jax.nn.silu(jnp.dot(e, w1) + b1).astype(CDT)


def _demb_kernel(ti_ref, tj_ref, de_ref, ui_ref, uj_ref, wd_ref, w1_ref,
                 b1_ref, out_ref):
    G, Ab, H_ = ti_ref.shape
    R = G * Ab * Ab
    e = jnp.dot(
        de_ref[...].reshape(R, DP), wd_ref[...],
        preferred_element_type=jnp.float32,
    ).reshape(G, Ab, Ab, H_)
    ti = ti_ref[...].astype(jnp.float32).reshape(G, Ab, 1, H_)
    tj = tj_ref[...].astype(jnp.float32).reshape(G, 1, Ab, H_)
    e = jax.nn.silu(e + ti + tj)
    s = jnp.dot(
        e.astype(CDT).reshape(R, H_), w1_ref[...],
        preferred_element_type=jnp.float32,
    )
    s = jax.nn.silu(s + b1_ref[...].astype(jnp.float32))
    uj = uj_ref[...].reshape(G, 1, Ab, 1)
    agg = jnp.sum(s.reshape(G, Ab, Ab, H_) * uj, axis=2)
    out_ref[...] = (agg * ui_ref[...]).astype(out_ref.dtype)


def make_demb(Bb, Ab, block_rows):
    G = max(1, min(block_rows // (Ab * Ab), Bb))
    Bp = _round_up(Bb, G)

    def pad3(t):
        return jnp.pad(t, ((0, Bp - Bb),) + ((0, 0),) * (t.ndim - 1))

    def call(ti, tj, de, ui, uj, wd, w1, b1):
        out = pl.pallas_call(
            _demb_kernel,
            grid=(Bp // G,),
            in_specs=[
                pl.BlockSpec((G, Ab, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, Ab, DP), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Ab, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((DP, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (G, Ab, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Bp, Ab, H), CDT),
        )(pad3(ti), pad3(tj), pad3(de), pad3(ui), pad3(uj), wd, w1, b1)
        return out[:Bb]

    return call


def measure_rtt():
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(x)[0, :1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x)[0, :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain_time(fn, y0, rest, rtt, feed):
    @jax.jit
    def chained(y):
        for _ in range(LINKS):
            y = feed(fn, y, rest)
        return y

    y = chained(y0)
    np.asarray(jax.device_get(y[(0,) * (y.ndim - 1) + (slice(0, 1),)]))
    t0 = time.perf_counter()
    y = y0
    for _ in range(QUEUE):
        y = chained(y)
    np.asarray(jax.device_get(y[(0,) * (y.ndim - 1) + (slice(0, 1),)]))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / (LINKS * QUEUE)


def main():
    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"links": LINKS, "queue": QUEUE, "rtt_ms": round(rtt * 1e3, 2),
           "R": R_TOTAL}

    # ---- flat form: ts [R, 256] chained (output feeds ts) ----
    ts0 = jnp.asarray(rng.normal(size=(R_TOTAL, H)) * 0.1, CDT)
    emb = jnp.asarray(rng.normal(size=(R_TOTAL, DP)) * 0.5, CDT)
    wd = jnp.asarray(rng.normal(size=(DP, H)) * 0.05, CDT)
    w1 = jnp.asarray(rng.normal(size=(H, H)) * 0.05, CDT)
    b1 = jnp.asarray(rng.normal(size=(1, H)) * 0.05, CDT)
    rest = (emb, wd, w1, b1)
    feed = lambda fn, y, rest: fn(y, *rest)

    t = chain_time(flat_xla, ts0, rest, rtt, feed)
    out["flat_xla_ms"] = round(t * 1e3, 4)
    print("flat xla", out["flat_xla_ms"], flush=True)
    for rows_blk in (512, 2048, 8192):
        call = make_flat(R_TOTAL, rows_blk)
        t = chain_time(call, ts0, rest, rtt, feed)
        out[f"flat_kernel_r{rows_blk}_ms"] = round(t * 1e3, 4)
        print("flat kernel", rows_blk, out[f"flat_kernel_r{rows_blk}_ms"],
              flush=True)

    # ---- demb form: 4-D kernel, Fourier embedding precomputed ----
    Bb, Ab = 203, 20
    ti0 = jnp.asarray(rng.normal(size=(Bb, Ab, H)) * 0.1, CDT)
    tj = jnp.asarray(rng.normal(size=(Bb, Ab, H)) * 0.1, CDT)
    de = jnp.asarray(rng.normal(size=(Bb, Ab, Ab, DP)) * 0.5, CDT)
    na = rng.integers(1, Ab + 1, (Bb,))
    mask = (np.arange(Ab)[None, :] < na[:, None]).astype(np.float32)
    ui = jnp.asarray((mask / np.maximum(na[:, None], 1))[..., None], jnp.float32)
    uj = jnp.asarray(mask[..., None], jnp.float32)
    rest = (tj, de, ui, uj, wd, w1, b1)
    for br in (2048, 8192):
        call = make_demb(Bb, Ab, br)
        t = chain_time(call, ti0, rest, rtt, feed)
        out[f"demb_kernel_r{br}_ms"] = round(t * 1e3, 4)
        print("demb kernel", br, out[f"demb_kernel_r{br}_ms"], flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "fused_edge_flat_r5.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
