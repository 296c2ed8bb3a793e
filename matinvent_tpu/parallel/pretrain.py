"""Diffusion-model pretraining (from-scratch training of the score network).

The reference only *fine-tunes* models pretrained elsewhere (its
``training_step`` at /root/reference/models/diffcsp/diffusion.py:457-486 is
the upstream objective). A complete framework must be able to produce its own
pretrained weights — this trainer runs the standard denoising objective over a
dataset of crystals as one jitted update per step, batch sharded over the
``dp`` mesh when available.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Any, Iterator, Sequence

import jax
import numpy as np
import optax

from matinvent_tpu.utils.xla_opts import COMPILER_OPTIONS

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.models.batch import CrystalBatch
from matinvent_tpu.models.diffcsp import DiffCSPDiffusion


def structures_to_batches(
    structures: Sequence[Structure],
    batch_size: int,
    max_atoms: int,
    rng: np.random.Generator,
    drop_oversize: bool = True,
) -> Iterator[CrystalBatch]:
    """Shuffle + pad a structure dataset into fixed-shape batches (epochs
    repeat forever)."""
    usable = [
        s for s in structures
        if (not drop_oversize or s.num_atoms <= max_atoms) and s.num_atoms >= 1
    ]
    if not usable:
        raise ValueError("no structures fit max_atoms")
    n = len(usable)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            chunk = [usable[j] for j in order[i : i + batch_size]]
            yield CrystalBatch.from_lists(
                [s.species for s in chunk],
                [s.frac_coords for s in chunk],
                [s.lattice for s in chunk],
                max_atoms=max_atoms,
            )


class PretrainTrainer:
    def __init__(
        self,
        diffusion: DiffCSPDiffusion,
        lr: float = 1e-3,
        grad_clip: float = 0.5,
        weight_decay: float = 0.0,
        total_steps: int | None = None,
        warmup_steps: int = 200,
        cond_dropout: float = 0.1,
        ema_decay: float | None = None,
    ):
        self.diffusion = diffusion
        # Polyak/EMA averaging of the params for sampling (standard practice
        # for score-based models; the published MatterGen samples from EMA
        # weights). None (default) disables it — training is then
        # bit-identical to the pre-EMA trainer.
        self.ema_decay = ema_decay
        # classifier-free condition dropout for conditional training: the
        # fraction of samples whose condition embedding is replaced by the
        # learned null token (the CFG 'unconditional' signal). Raising it
        # weakens the conditional pathway — experiments/cfg_ablation_r4.py
        # uses that to expose the regime where guidance>0 helps.
        self.cond_dropout = cond_dropout
        if total_steps:
            schedule = optax.warmup_cosine_decay_schedule(
                0.0, lr, min(warmup_steps, total_steps // 10 + 1),
                total_steps, lr * 0.02,
            )
        else:
            schedule = lr
        tx = [optax.clip_by_global_norm(grad_clip)]
        if weight_decay > 0:
            tx.append(optax.adamw(schedule, weight_decay=weight_decay))
        else:
            tx.append(optax.adam(schedule))
        self.optimizer = optax.chain(*tx)

    @partial(jax.jit, static_argnames=("self",), compiler_options=COMPILER_OPTIONS)
    def step(self, params, opt_state, batch: CrystalBatch, key: jax.Array,
             conditions: Any = None):
        def loss_fn(p):
            if conditions is None:
                return self.diffusion.training_loss(p, batch, key)
            return self.diffusion.training_loss(
                p, batch, key, conditions=conditions,
                cond_dropout=self.cond_dropout,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    @partial(jax.jit, static_argnames=("self",), compiler_options=COMPILER_OPTIONS)
    def ema_update(self, ema, params):
        d = self.ema_decay
        return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema, params)

    def train(
        self,
        params: Any,
        batches: Iterator,
        num_steps: int,
        key: jax.Array,
        log_every: int = 100,
        snapshot_every: int | None = None,
        snapshot_cb=None,
    ):
        """Batches may yield ``CrystalBatch`` or ``(CrystalBatch, conditions)``
        tuples — the latter trains conditional models (CFG null tokens learn
        through the dropout in training_loss).

        ``snapshot_cb(step, params, ema_params_or_None)`` fires every
        ``snapshot_every`` steps and at the end (for validity-vs-steps curves
        and intermediate checkpointing on long runs)."""
        opt_state = self.optimizer.init(params)
        ema = params if self.ema_decay is not None else None
        history = []
        for i in range(num_steps):
            item = next(batches)
            batch, conditions = item if isinstance(item, tuple) else (item, None)
            key, sk = jax.random.split(key)
            params, opt_state, metrics = self.step(
                params, opt_state, batch, sk, conditions
            )
            if ema is not None:
                ema = self.ema_update(ema, params)
            if (i + 1) % log_every == 0 or i == 0:
                m = {k: float(v) for k, v in metrics.items()}
                history.append(m)
                logging.info(
                    f"pretrain step {i + 1}/{num_steps}: "
                    + ", ".join(f"{k}={v:.4f}" for k, v in m.items())
                )
            if (
                snapshot_cb is not None
                and snapshot_every
                and ((i + 1) % snapshot_every == 0 or i + 1 == num_steps)
            ):
                snapshot_cb(i + 1, params, ema)
        if ema is not None:
            return ema, history
        return params, history
