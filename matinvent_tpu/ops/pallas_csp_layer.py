"""Fused CSPLayer forward as a Pallas TPU kernel.

The sampling hot loop evaluates the CSPNet message-passing layer 8000x per
batch (4 layers x 2 PC evals x 1000 steps). The XLA path materializes the
``[B, A, A, H]`` edge tensors in HBM between matmuls; this kernel keeps the
entire layer — Fourier edge features, the decomposed first edge MLP, the
second edge MLP, masked mean aggregation, and the node MLP with residual —
resident in VMEM, gridded over crystal blocks. Inference-only (the training
path stays on XLA for autodiff).

Numerics: matmuls run on the MXU in the input dtype (use bf16 activations for
peak throughput) with f32 accumulation; Fourier features are computed in f32.

Measured on v5e (batch 64, A=20, H=128, bf16, via the axon remote-compile
toolchain): the fused kernel is numerically consistent with XLA (mean coord
drift 0.021 over 1000 PC steps) but ~5x slower at this operating point
(31 vs 163 structures/sec) — XLA's own fusion already keeps these small
edge tensors cache-resident and its GEMM tiling beats Mosaic's at A=20.
The kernel therefore ships as an opt-in (``use_pallas_sampling``) for larger
atom counts / hidden sizes where the [B,A,A,H] HBM traffic dominates.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    h_ref,        # [Bb, A, H]
    frac_ref,     # [Bb, A, 3] f32
    lat9_ref,     # [Bb, 9]
    mask_ref,     # [Bb, A] f32 (1.0 real / 0.0 pad)
    invn_ref,     # [Bb, 1] f32 (1 / num_atoms)
    w_i_ref, w_j_ref, w_l_ref, w_d_ref, b0_ref,   # first edge MLP (decomposed)
    w1_ref, b1_ref,                                # second edge MLP
    wn0_ref, bn0_ref, wn1_ref, bn1_ref,            # node MLP
    out_ref,      # [Bb, A, H]
    *,
    num_freqs: int,
):
    Bb, A, H = h_ref.shape
    dt = h_ref.dtype

    h = h_ref[:]                              # [Bb, A, H]
    frac = frac_ref[:].astype(jnp.float32)    # [Bb, A, 3]
    mask = mask_ref[:]                        # [Bb, A]

    # Fourier edge features in f32: diff[b, i, j] = (x_j - x_i) mod 1.
    # Built as a static per-axis concat (Mosaic cannot shape-cast the 5-D
    # [Bb,A,A,3,F] intermediate); layout stays space-major like the reference.
    diff = (frac[:, None, :, :] - frac[:, :, None, :]) % 1.0  # [Bb, A, A, 3]
    freqs = (2.0 * math.pi) * jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, num_freqs), 3
    ).astype(jnp.float32)
    ang = jnp.concatenate(
        [diff[..., s : s + 1] * freqs for s in range(3)], axis=-1
    )  # [Bb, A, A, 3F]
    dist = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).astype(dt)

    # decomposed first edge MLP
    term_i = jax.lax.dot_general(
        h.reshape(Bb * A, H), w_i_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(Bb, A, H)
    term_j = jax.lax.dot_general(
        h.reshape(Bb * A, H), w_j_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(Bb, A, H)
    term_l = jax.lax.dot_general(
        lat9_ref[:].astype(dt), w_l_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [Bb, H]
    E = dist.shape[-1]
    term_d = jax.lax.dot_general(
        dist.reshape(Bb * A * A, E), w_d_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(Bb, A, A, H)

    edge = (
        term_i[:, :, None, :]
        + term_j[:, None, :, :]
        + term_l[:, None, None, :]
        + term_d
        + b0_ref[:].astype(jnp.float32)
    )
    edge = jax.nn.silu(edge).astype(dt)

    edge = jax.lax.dot_general(
        edge.reshape(Bb * A * A, H), w1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(Bb, A, A, H) + b1_ref[:].astype(jnp.float32)
    edge = jax.nn.silu(edge).astype(dt)

    # masked mean over j with denominator num_atoms
    edge = edge * mask[:, None, :, None].astype(dt)
    agg = jnp.sum(edge.astype(jnp.float32), axis=2) * invn_ref[:][:, :, None]

    node_in = jnp.concatenate([h.astype(jnp.float32), agg], axis=-1).astype(dt)
    out = jax.lax.dot_general(
        node_in.reshape(Bb * A, 2 * H), wn0_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bn0_ref[:].astype(jnp.float32)
    out = jax.nn.silu(out).astype(dt)
    out = jax.lax.dot_general(
        out, wn1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bn1_ref[:].astype(jnp.float32)
    out = jax.nn.silu(out)

    out_ref[:] = (h.astype(jnp.float32) + out.reshape(Bb, A, H)).astype(dt)


@partial(
    jax.jit,
    static_argnames=("num_freqs", "block_b", "interpret"),
)
def fused_csp_layer(
    h: jax.Array,        # [B, A, H]
    frac: jax.Array,     # [B, A, 3] f32
    lat9: jax.Array,     # [B, 9] lattice inner products, flattened
    mask: jax.Array,     # [B, A] bool
    num_atoms: jax.Array,  # [B]
    w: jax.Array,        # [2H + 9 + E, H] fused first edge-MLP kernel
    b0: jax.Array,
    w1: jax.Array, b1: jax.Array,
    wn0: jax.Array, bn0: jax.Array,
    wn1: jax.Array, bn1: jax.Array,
    num_freqs: int = 10,
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    B, A, H = h.shape
    if B % block_b:
        raise ValueError(f"batch {B} must be divisible by block_b={block_b}")
    dt = h.dtype

    w_i, w_j, w_l, w_d = jnp.split(w, [H, 2 * H, 2 * H + 9], axis=0)
    maskf = mask.astype(jnp.float32)
    invn = (1.0 / jnp.maximum(num_atoms, 1).astype(jnp.float32))[:, None]

    def blk(i, *_):
        return (i, 0, 0)

    def blk2(i, *_):
        return (i, 0)

    def rep(i, *_):
        return (0, 0)

    def rep1(i, *_):
        return (0,)

    grid = (B // block_b,)
    cast = lambda x: x.astype(dt)
    out = pl.pallas_call(
        partial(_kernel, num_freqs=num_freqs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, A, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, A, 3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 9), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, A), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_i.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_j.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_l.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_d.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(b0.shape, rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec(wn0.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(bn0.shape, rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec(wn1.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(bn1.shape, rep1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, A, H), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, A, H), dt),
        interpret=interpret,
    )(
        h, frac.astype(jnp.float32), lat9, maskf, invn,
        cast(w_i), cast(w_j), cast(w_l), cast(w_d), b0,
        cast(w1), b1, cast(wn0), bn0, cast(wn1), bn1,
    )
    return out
