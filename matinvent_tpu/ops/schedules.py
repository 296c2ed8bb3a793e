"""Diffusion noise schedules as precomputed device-constant tables.

Capability parity with /root/reference/models/diffcsp/scheduler.py:7-116
(BetaScheduler / SigmaScheduler), re-designed TPU-first: schedules are frozen
pytrees of ``[T+1]`` tables built once on the host, then closed over by jitted
functions (no nn.Module buffers, no host lookups inside the sampling scan).

Index convention (matches the reference): tables are zero-prefixed so index
``t`` in 1..T addresses timestep t directly; index 0 is a pad (betas[0]=0,
sigmas[0]=0, sigmas_norm[0]=1).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from matinvent_tpu.ops.wrapped_normal import sigma_norm


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal, arXiv:2102.09672)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def linear_beta_schedule(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    return np.linspace(beta_start, beta_end, timesteps)


def quadratic_beta_schedule(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    return np.linspace(beta_start**0.5, beta_end**0.5, timesteps) ** 2


def sigmoid_beta_schedule(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    betas = np.linspace(-6, 6, timesteps)
    return 1.0 / (1.0 + np.exp(-betas)) * (beta_end - beta_start) + beta_start


@struct.dataclass
class BetaSchedule:
    """DDPM/VP schedule tables, zero-prefixed to length T+1."""

    timesteps: int = struct.field(pytree_node=False)
    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    sigmas: jax.Array  # posterior std sqrt(beta_t (1-abar_{t-1})/(1-abar_t))

    @classmethod
    def create(
        cls,
        timesteps: int,
        scheduler_mode: str = "cosine",
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        dtype=jnp.float32,
    ) -> "BetaSchedule":
        if scheduler_mode == "cosine":
            betas = cosine_beta_schedule(timesteps)
        elif scheduler_mode == "linear":
            betas = linear_beta_schedule(timesteps, beta_start, beta_end)
        elif scheduler_mode == "quadratic":
            betas = quadratic_beta_schedule(timesteps, beta_start, beta_end)
        elif scheduler_mode == "sigmoid":
            betas = sigmoid_beta_schedule(timesteps, beta_start, beta_end)
        else:
            raise ValueError(f"unknown scheduler_mode: {scheduler_mode}")

        betas = np.concatenate([np.zeros(1), betas])
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)

        sigmas = np.zeros_like(betas)
        sigmas[1:] = betas[1:] * (1.0 - alphas_cumprod[:-1]) / (1.0 - alphas_cumprod[1:])
        sigmas = np.sqrt(sigmas)

        if betas[-1] > 0.9 and timesteps < 200:
            # the clip-saturated cosine tail (beta_T ~ 0.9999, reference
            # scheduler.py:16 clips identically) makes the first reverse
            # step a ~100x error amplifier; the ancestral chain only
            # re-contracts that amplification when enough steps remain.
            # Measured on a trained h128/L4 model: T=100 explodes to the
            # sample clip, T>=200 samples fine. The reference sidesteps the
            # regime by always running T=1000 — warn instead of silently
            # sampling garbage at reference-unsupported step counts.
            import logging

            logging.warning(
                f"beta schedule ({scheduler_mode}, T={timesteps}) saturates "
                f"at beta_T={float(betas[-1]):.4f}; ancestral sampling is "
                f"numerically unstable below ~200 steps — use T >= 200 "
                f"(reference operating point: 1000) or a linear schedule"
            )

        return cls(
            timesteps=timesteps,
            betas=jnp.asarray(betas, dtype),
            alphas=jnp.asarray(alphas, dtype),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype),
            sigmas=jnp.asarray(sigmas, dtype),
        )

    def uniform_sample_t(self, key: jax.Array, batch_size: int) -> jax.Array:
        """Sample integer timesteps uniformly from 1..T."""
        return jax.random.randint(key, (batch_size,), 1, self.timesteps + 1)


@struct.dataclass
class SigmaSchedule:
    """VE / score-matching schedule for wrapped-normal fractional coords.

    ``sigmas`` is zero-prefixed; ``sigmas_norm`` is one-prefixed E[score^2]
    normalizers (Monte-Carlo, deterministic given ``seed``).
    """

    timesteps: int = struct.field(pytree_node=False)
    sigma_begin: float = struct.field(pytree_node=False)
    sigma_end: float = struct.field(pytree_node=False)
    sigmas: jax.Array
    sigmas_norm: jax.Array

    @classmethod
    def create(
        cls,
        timesteps: int,
        sigma_begin: float = 0.01,
        sigma_end: float = 1.0,
        seed: int = 0,
        num_mc_samples: int = 10000,
        dtype=jnp.float32,
    ) -> "SigmaSchedule":
        sigmas = np.exp(np.linspace(np.log(sigma_begin), np.log(sigma_end), timesteps))
        sigmas_j = jnp.asarray(sigmas, jnp.float32)
        norm = sigma_norm(sigmas_j, jax.random.PRNGKey(seed), num_samples=num_mc_samples)
        return cls(
            timesteps=timesteps,
            sigma_begin=sigma_begin,
            sigma_end=sigma_end,
            sigmas=jnp.concatenate([jnp.zeros(1, dtype), sigmas_j.astype(dtype)]),
            sigmas_norm=jnp.concatenate([jnp.ones(1, dtype), norm.astype(dtype)]),
        )

    def uniform_sample_t(self, key: jax.Array, batch_size: int) -> jax.Array:
        return jax.random.randint(key, (batch_size,), 1, self.timesteps + 1)
