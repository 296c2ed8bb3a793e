"""Sharded RL finetune step.

TPU-native re-design of the reference inner finetune loop
(/root/reference/pipeline/mat_invent.py:125-189): instead of 3 epochs x 1000
sequential per-timestep backward passes with grad-accum 50, each epoch is ONE
jitted program — a ``lax.scan`` over 20 accumulation chunks, each chunk
vmapping the 50 per-timestep losses into a single batched forward/backward.
Update semantics match the reference exactly (fresh Adam per RL iteration,
one optimizer step per 50-timestep chunk, chunk-mean loss).

Under a ``dp`` mesh the batch is sharded and parameters replicated; XLA
derives the psum gradient all-reduce over ICI from the sharding annotations.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from matinvent_tpu.models.batch import CrystalBatch
from matinvent_tpu.models.diffcsp import DiffCSPDiffusion


class FinetuneStep:
    """Compiled reward-weighted finetune driver for one model family."""

    def __init__(
        self,
        diffusion: DiffCSPDiffusion,
        lr: float = 1e-4,
        timesteps: int | None = None,
        accum_steps: int = 50,
        sigma_kl: float = 0.025,
        epochs: int = 3,
    ):
        self.diffusion = diffusion
        self.lr = lr
        self.timesteps = timesteps or diffusion.config.timesteps
        self.accum_steps = accum_steps
        self.sigma_kl = sigma_kl
        self.epochs = epochs
        self.optimizer = optax.adam(lr)
        if self.timesteps % self.accum_steps:
            raise ValueError("timesteps must be divisible by accum_steps")
        self.n_chunks = self.timesteps // self.accum_steps

    # NOTE: no buffer donation here — donating params/opt_state triggers an
    # INVALID_ARGUMENT backend error on the axon TPU relay (verified by
    # bisection; the identical program without donation runs fine), and the
    # score networks are small enough that donation saves nothing meaningful.
    @partial(jax.jit, static_argnames=("self",))
    def epoch(
        self,
        params: Any,
        opt_state: Any,
        prior_params: Any,
        batch: CrystalBatch,
        rewards: jax.Array,
        key: jax.Array,
        conditions: Any = None,
    ):
        """One epoch = scan over accumulation chunks with optimizer updates."""

        def loss_fn(p, ck, t_idx):
            if conditions is None:
                return self.diffusion.rl_chunk_loss(
                    p, prior_params, batch, rewards, ck, t_idx, self.sigma_kl
                )
            return self.diffusion.rl_chunk_loss(
                p, prior_params, batch, rewards, ck, t_idx, self.sigma_kl,
                conditions=conditions,
            )

        def chunk_step(carry, c):
            p, o = carry
            t_idx = c * self.accum_steps + jnp.arange(self.accum_steps)
            ck = jax.random.fold_in(key, c)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, ck, t_idx
            )
            updates, o = self.optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), (loss, aux)

        (params, opt_state), (losses, auxes) = jax.lax.scan(
            chunk_step, (params, opt_state), jnp.arange(self.n_chunks)
        )
        loss_diff_sum, loss_kl_sum = auxes
        metrics = dict(
            loss=jnp.mean(losses),
            loss_diff=jnp.sum(loss_diff_sum) / self.timesteps,
            loss_kl=jnp.sum(loss_kl_sum) / self.timesteps,
        )
        return params, opt_state, metrics

    def run(
        self,
        params: Any,
        prior_params: Any,
        batch: CrystalBatch,
        rewards: jax.Array,
        key: jax.Array,
        conditions: Any = None,
    ):
        """Full finetune for one RL iteration: fresh Adam, ``epochs`` epochs.

        Matches pipeline/mat_invent.py:136-189 (optimizer re-created each RL
        step; same data every epoch, new noise draws).
        """
        opt_state = self.optimizer.init(params)
        all_metrics = []
        for e in range(self.epochs):
            ek = jax.random.fold_in(key, e)
            params, opt_state, metrics = self.epoch(
                params, opt_state, prior_params, batch, rewards, ek, conditions
            )
            all_metrics.append({k: float(v) for k, v in metrics.items()})
        return params, all_metrics
