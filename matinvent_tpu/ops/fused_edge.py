"""Fused edge-chain Pallas kernel for the dense fc message-passing layer.

Motivation (r4 roofline, experiments/results/profile_step_r5.json): the
sampling step is HBM-bound on the edge tensors — every CSPLayer materializes
``[E, H]`` intermediates (E = sum_b B_b * A_b^2 ~ 1.9e5 rows at the bench
operating point) between the Fourier GEMM, the silu, the second edge GEMM
and the masked aggregation, and XLA cannot fuse across two matmuls. This
kernel computes the ENTIRE edge branch of one layer per grid step —

    fd    = (x_j - x_i) mod 1                       (from [B,A,3] coords)
    emb   = concat(sin(fd x 2*pi*m), cos(fd x 2*pi*m))   (in-register)
    e     = silu(emb @ w_d + term_i + term_j)        (term_l/bias folded
                                                      into term_i upstream)
    s     = silu(e @ w_1 + b_1)
    agg_i = u_i * sum_j s_ij * u_j                   (separable fc mask:
                                                      u_i = mask_i / denom_i,
                                                      u_j = mask_j)

— so the only HBM traffic per layer is the [B,A,H] node terms in and the
[B,A,H] aggregate out (~21 MB/layer-eval vs ~260 MB for the XLA chain at
the bench point). Everything between lives in VMEM/registers.

This is the *flattened-form* kernel the r4 verdict asked for: both GEMMs run
over the row-flattened [G*A*A, .] operands with standard matmul tiling; the
broadcast adds and the j-reduction act on the [G, A, A, H] view whose minor
two dims (A_j, H) stay fixed, so no Mosaic relayouts are needed (the r2
whole-layer kernel died on exactly those — see PARITY.md, Pallas section).

Only the fc edge style is supported (its mask is separable); knn masks are
not. Gradients are not defined — the kernel is for the sampling path, which
never differentiates (training/DDPO paths keep the XLA layer).

Reference behavior provided: the edge message chain of
/root/reference/models/diffcsp/cspnet.py:59-82 (edge_model: cat -> MLP ->
scatter-mean aggregation) at the fc default (:238-242).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _phase_consts(num_freqs: int, dp: int) -> np.ndarray:
    """Per-axis phase-frequency rows F[s, l], s in {x,y,z}, l in [0, dp).

    Lane l < 3*nf encodes (s = l // nf, m = l % nf) for the sin half; lanes
    [3*nf, 6*nf) repeat the layout for the cos half (matching
    ``sinusoids_embedding``'s space-major concat(sin, cos) layout,
    models/cspnet.py:30-43); lanes >= 6*nf are dead (their ``w_d`` rows are
    zero-padded, so their cos(0)=1 contributes nothing). Passed to the
    kernel as an input — Pallas kernels cannot capture traced constants.
    """
    fx = np.zeros((3, dp), np.float32)
    for half in (0, 3 * num_freqs):
        for s in range(3):
            for m in range(num_freqs):
                fx[s, half + s * num_freqs + m] = 2.0 * math.pi * m
    return fx


def _kernel(ti_ref, tj_ref, fr_ref, ui_ref, uj_ref, fmat_ref, wd_ref, w1_ref,
            b1_ref, out_ref, *, num_freqs: int, compute_dtype):
    G, Ab, H = ti_ref.shape
    Dp = wd_ref.shape[0]
    cdt = compute_dtype

    fr = fr_ref[...]  # [G, Ab, 3] f32
    # fd[g, i, j] = frac[g, j] - frac[g, i] (x_j - x_i), wrapped to [0, 1) —
    # same order as the XLA path (models/cspnet.py:190)
    fd = fr[:, None, :, :] - fr[:, :, None, :]
    fd = fd - jnp.floor(fd)  # [G, Ab, Ab, 3]

    ph = (
        fd[..., 0:1] * fmat_ref[0:1, :]
        + fd[..., 1:2] * fmat_ref[1:2, :]
        + fd[..., 2:3] * fmat_ref[2:3, :]
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Dp), 3)
    # phases in f32 (bf16 coords are too coarse for high-frequency phases —
    # same rule as the XLA path), cast afterwards for the MXU
    emb = jnp.where(lane < 3 * num_freqs, jnp.sin(ph), jnp.cos(ph))

    e = jnp.dot(
        emb.astype(cdt).reshape(G * Ab * Ab, Dp),
        wd_ref[...],
        preferred_element_type=jnp.float32,
    ).reshape(G, Ab, Ab, H)
    ti = ti_ref[...].astype(jnp.float32).reshape(G, Ab, 1, H)
    tj = tj_ref[...].astype(jnp.float32).reshape(G, 1, Ab, H)
    # elementwise chain stays f32: Mosaic mis-verifies bf16 silu constants
    # on 4-D vectors (f32 scalar broadcast into a bf16 vector), and f32 VPU
    # math costs the same here — only the MXU dots run in the compute dtype
    e = jax.nn.silu(e + ti + tj)

    s = jnp.dot(
        e.astype(cdt).reshape(G * Ab * Ab, H),
        w1_ref[...],
        preferred_element_type=jnp.float32,
    )
    s = jax.nn.silu(s + b1_ref[...].astype(jnp.float32))

    uj = uj_ref[...].reshape(G, 1, Ab, 1)
    agg = jnp.sum(s.reshape(G, Ab, Ab, H) * uj, axis=2)  # [G, Ab, H]
    out_ref[...] = (agg * ui_ref[...]).astype(out_ref.dtype)


def fused_edge_chain(
    term_i: jax.Array,  # [B, A, H] node term for the i side, incl. lattice
    #                     term and edge_mlp_0 bias
    term_j: jax.Array,  # [B, A, H] node term for the j side
    frac_coords: jax.Array,  # [B, A, 3] fractional coords
    ui: jax.Array,  # [B, A, 1] f32: mask_i / denom_i
    uj: jax.Array,  # [B, A, 1] f32: mask_j indicator
    wd: jax.Array,  # [6*num_freqs, H] Fourier-embedding slice of edge_mlp_0
    w1: jax.Array,  # [H, H] edge_mlp_1 kernel
    b1: jax.Array,  # [H] edge_mlp_1 bias
    *,
    num_freqs: int = 10,
    block_rows: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Aggregated edge messages ``agg [B, A, H]`` of one fc CSPLayer."""
    B, A, H = term_i.shape
    assert wd.shape[0] == 6 * num_freqs, (wd.shape, num_freqs)
    cdt = term_i.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if block_rows is None:
        block_rows = int(os.environ.get("MATINVENT_FUSED_EDGE_ROWS", "2048"))
    G = max(1, min(block_rows // (A * A), B))
    Bp = _round_up(B, G)
    Dp = _round_up(6 * num_freqs, 8)

    def padB(x):
        return jnp.pad(x, ((0, Bp - B),) + ((0, 0),) * (x.ndim - 1))

    wd_p = jnp.pad(wd.astype(cdt), ((0, Dp - wd.shape[0]), (0, 0)))
    kernel = functools.partial(_kernel, num_freqs=num_freqs, compute_dtype=cdt)
    flops_blk = 2 * G * A * A * (Dp * H + H * H)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, A, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, A, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, A, 3), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, A, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, A, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Dp), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G, A, H), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, A, H), cdt),
        cost_estimate=pl.CostEstimate(
            flops=flops_blk * (Bp // G),
            bytes_accessed=(Bp * A * H * 2 * 3) + (Dp + H + 1) * H * 2,
            transcendentals=Bp * A * A * (Dp + 2 * H),
        ),
        interpret=interpret,
    )(
        padB(term_i),
        padB(term_j),
        padB(frac_coords.astype(jnp.float32)),
        padB(ui.astype(jnp.float32)),
        padB(uj.astype(jnp.float32)),
        jnp.asarray(_phase_consts(num_freqs, Dp)),
        wd_p,
        w1.astype(cdt),
        b1.astype(cdt).reshape(1, H),
    )
    return out[:B]
