"""Supervised trainer for GNN property predictors (MSE regression)."""
from __future__ import annotations

import logging
from functools import partial
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.models.batch import CrystalBatch


def labeled_batches(
    structures: Sequence[Structure],
    labels: np.ndarray,
    batch_size: int,
    max_atoms: int,
    rng: np.random.Generator,
) -> Iterator[tuple[CrystalBatch, jax.Array]]:
    pairs = [
        (s, y)
        for s, y in zip(structures, labels)
        if s.num_atoms <= max_atoms and np.isfinite(y)
    ]
    if not pairs:
        raise ValueError("no usable (structure, label) pairs")
    n = len(pairs)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            chunk = [pairs[j] for j in order[i : i + batch_size]]
            batch = CrystalBatch.from_lists(
                [s.species for s, _ in chunk],
                [s.frac_coords for s, _ in chunk],
                [s.lattice for s, _ in chunk],
                max_atoms=max_atoms,
            )
            y = jnp.asarray([v for _, v in chunk], jnp.float32)
            yield batch, y


class PredictorTrainer:
    def __init__(self, gnn, lr: float = 1e-3, grad_clip: float = 1.0):
        self.gnn = gnn
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip), optax.adam(lr)
        )

    @partial(jax.jit, static_argnames=("self",))
    def step(self, params, opt_state, batch: CrystalBatch, y: jax.Array):
        def loss_fn(p):
            pred = self.gnn._forward(p, batch)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train(self, params, batches, num_steps: int, key, log_every: int = 100):
        opt_state = self.optimizer.init(params)
        history = []
        for i in range(num_steps):
            batch, y = next(batches)
            params, opt_state, loss = self.step(params, opt_state, batch, y)
            if (i + 1) % log_every == 0 or i == 0:
                history.append(float(loss))
                logging.info(f"predictor step {i + 1}/{num_steps}: mse={float(loss):.5f}")
        return params, history
