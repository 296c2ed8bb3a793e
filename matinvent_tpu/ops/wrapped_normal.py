"""Wrapped-normal distribution utilities for periodic fractional coordinates.

Capability parity with the reference score-matching math
(/root/reference/models/diffcsp/scheduler.py:32-51 and
/root/reference/models/diffcsp/diffusion.py:18-29). All functions are pure JAX,
unrolled over the small, static image window so XLA fuses the whole series into
one VPU loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def p_wrapped_normal(x: jax.Array, sigma: jax.Array, N: int = 10, T: float = 1.0) -> jax.Array:
    """Unnormalized wrapped-normal density: sum_i exp(-(x + T*i)^2 / 2 sigma^2)."""
    p = jnp.zeros_like(x)
    for i in range(-N, N + 1):
        p = p + jnp.exp(-((x + T * i) ** 2) / 2.0 / sigma**2)
    return p


def d_log_p_wrapped_normal(x: jax.Array, sigma: jax.Array, N: int = 10, T: float = 1.0) -> jax.Array:
    """Score (d/dx log p) of the wrapped normal.

    Note: matches the reference's sign convention
    (/root/reference/models/diffcsp/scheduler.py:39-43), i.e. it returns
    ``sum_i (x + T i)/sigma^2 exp(...) / p`` which is the *negative* of the true
    score; the diffusion losses are self-consistent with this convention.
    """
    p = jnp.zeros_like(x)
    for i in range(-N, N + 1):
        shifted = x + T * i
        p = p + shifted / sigma**2 * jnp.exp(-(shifted**2) / 2.0 / sigma**2)
    return p / p_wrapped_normal(x, sigma, N, T)


def log_prob_wrapped_normal(
    x: jax.Array, mu: jax.Array, sigma: jax.Array, N: int = 10, T: float = 1.0
) -> jax.Array:
    """Unnormalized wrapped-normal log-density of ``x`` around mean ``mu``.

    Matches /root/reference/models/diffcsp/diffusion.py:25-29 (no normalization
    constant — used only for log-prob *differences* in policy-gradient modes).
    Computed with a log-sum-exp for numerical stability at small sigma.
    """
    terms = jnp.stack(
        [-((x - mu + T * i) ** 2) / 2.0 / sigma**2 for i in range(-N, N + 1)],
        axis=0,
    )
    return jax.scipy.special.logsumexp(terms, axis=0)


from functools import partial


@partial(jax.jit, static_argnames=("T", "num_samples"))
def sigma_norm(
    sigma: jax.Array,
    key: jax.Array,
    T: float = 1.0,
    num_samples: int = 10000,
) -> jax.Array:
    """Monte-Carlo estimate of E[score^2] used to normalize the coord loss.

    Parity with /root/reference/models/diffcsp/scheduler.py:46-51 but with an
    explicit PRNG key (JAX RNG discipline) so schedule construction is
    deterministic and reproducible across hosts.

    Args:
        sigma: ``[T]`` noise levels.
        key: PRNG key.
        T: period of the wrapped dimension.
        num_samples: Monte-Carlo sample count.

    Returns:
        ``[T]`` estimates of E[(d log p)^2] under x ~ WN(0, sigma).
    """
    sigmas = jnp.broadcast_to(sigma[None, :], (num_samples, sigma.shape[0]))
    x_sample = sigma * jax.random.normal(key, sigmas.shape, dtype=sigma.dtype)
    x_sample = x_sample % T
    normal_ = d_log_p_wrapped_normal(x_sample, sigmas, T=T)
    return jnp.mean(normal_**2, axis=0)
