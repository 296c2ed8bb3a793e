"""Multi-field corruption processes for MatterGen-class joint diffusion.

Capability parity with the external mattergen package's corruption stack the
reference relies on (SURVEY.md §2.2: ``MultiCorruption`` / ``sample_marginal``
invoked at /root/reference/models/mattergen/pl_module.py:42,68):

* ``LatticeVPSDE`` — variance-preserving SDE on the 3x3 cell, with the
  limiting std scaled per-crystal by atom count (larger crystals -> larger
  cells), continuous time t in (0, 1];
* ``WrappedCoordVE`` — variance-exploding wrapped-normal corruption of
  fractional coordinates;
* ``TypeD3PM`` — discrete D3PM chain over atom types (uniform or absorbing
  transitions) on the same continuous-time grid discretized to N steps.

All processes expose ``marginal(x0, t)`` parameters and ``sample_marginal``;
everything is table-driven and jit-friendly (no data-dependent shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from matinvent_tpu.ops.segment import graph_mean
from matinvent_tpu.ops.wrapped_normal import d_log_p_wrapped_normal


@struct.dataclass
class LatticeVPSDE:
    """VP SDE: dx = -0.5 beta(t) x dt + sqrt(beta(t)) dW on cell matrices.

    beta(t) = beta_min + t (beta_max - beta_min);
    marginal: N(x0 exp(-0.5 B(t)), sigma_lim^2 (1 - exp(-B(t))) I) with
    B(t) = t beta_min + t^2/2 (beta_max - beta_min).
    ``sigma_lim`` scales with atom count: crystals with more atoms diffuse
    toward proportionally larger cells (limit density heuristic).
    """

    beta_min: float = struct.field(pytree_node=False, default=0.1)
    beta_max: float = struct.field(pytree_node=False, default=20.0)
    limit_density: float = struct.field(pytree_node=False, default=0.05)

    def _B(self, t: jax.Array) -> jax.Array:
        return t * self.beta_min + 0.5 * t**2 * (self.beta_max - self.beta_min)

    def beta(self, t: jax.Array) -> jax.Array:
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def limit_std(self, num_atoms: jax.Array) -> jax.Array:
        """[B] per-crystal limiting std ~ (n / limit_density)^(1/3) / sqrt(3)."""
        n = jnp.maximum(num_atoms.astype(jnp.float32), 1.0)
        return (n / self.limit_density) ** (1.0 / 3.0) / jnp.sqrt(3.0)

    def marginal(self, x0: jax.Array, t: jax.Array, num_atoms: jax.Array):
        """Returns (mean [B,3,3], std [B,1,1])."""
        B_t = self._B(t)[:, None, None]
        mean = x0 * jnp.exp(-0.5 * B_t)
        sigma_lim = self.limit_std(num_atoms)[:, None, None]
        std = sigma_lim * jnp.sqrt(1.0 - jnp.exp(-B_t))
        return mean, std

    def sample_marginal(self, key, x0, t, num_atoms):
        mean, std = self.marginal(x0, t, num_atoms)
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        return mean + std * eps, eps, std

    def prior_sample(self, key, shape, num_atoms):
        sigma_lim = self.limit_std(num_atoms)[:, None, None]
        return sigma_lim * jax.random.normal(key, shape)


@struct.dataclass
class WrappedCoordVE:
    """VE wrapped-normal corruption of fractional coords (period 1)."""

    sigma_min: float = struct.field(pytree_node=False, default=0.005)
    sigma_max: float = struct.field(pytree_node=False, default=0.5)

    def sigma(self, t: jax.Array) -> jax.Array:
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def sample_marginal(self, key, x0, t):
        """Returns (x_t wrapped, eps, sigma [B,1,1])."""
        sigma = self.sigma(t)[:, None, None]
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        return (x0 + sigma * eps) % 1.0, eps, sigma

    def score_target(self, eps, sigma):
        """Wrapped-normal score at the sampled offset (reference convention)."""
        return d_log_p_wrapped_normal(sigma * eps, sigma)

    def prior_sample(self, key, shape):
        return jax.random.uniform(key, shape)


def _d3pm_tables(
    num_steps: int,
    beta_min: float = 1e-3,
    beta_max: float = 0.999,
) -> tuple[np.ndarray, np.ndarray]:
    """Cumulative transition mixing coefficients for uniform/absorbing D3PM.

    The linear beta schedule is shared by both kinds (the kind only changes
    which distribution the chain mixes toward); q(x_t | x_0) has closed form:
      uniform:   abar_t * onehot(x0) + (1 - abar_t) / K
      absorbing: abar_t * onehot(x0) + (1 - abar_t) * onehot(MASK)
    Returns (betas [N+1], abar [N+1]) with index 0 = identity.
    """
    betas = np.concatenate(
        [np.zeros(1), np.linspace(beta_min, beta_max, num_steps)]
    )
    abar = np.cumprod(1.0 - betas)
    return betas, abar


@struct.dataclass
class TypeD3PM:
    """Discrete D3PM chain over atom types.

    ``kind='uniform'``: transition toward the uniform distribution over K
    classes. ``kind='absorbing'``: transition toward a dedicated MASK class
    (index K, so logits/one-hots have K+1 classes).
    """

    num_classes: int = struct.field(pytree_node=False, default=100)
    num_steps: int = struct.field(pytree_node=False, default=1000)
    kind: str = struct.field(pytree_node=False, default="uniform")
    betas: jax.Array = struct.field(default=None)
    abar: jax.Array = struct.field(default=None)

    @classmethod
    def create(cls, num_classes=100, num_steps=1000, kind="uniform"):
        betas, abar = _d3pm_tables(num_steps)
        return cls(
            num_classes=num_classes,
            num_steps=num_steps,
            kind=kind,
            betas=jnp.asarray(betas, jnp.float32),
            abar=jnp.asarray(abar, jnp.float32),
        )

    @property
    def vocab(self) -> int:
        return self.num_classes + (1 if self.kind == "absorbing" else 0)

    def _t_index(self, t: jax.Array) -> jax.Array:
        """Continuous t in (0,1] -> integer step index in 1..N.

        Round-to-nearest, NOT ceil: the sampler's grid linspace(1, 1/N, N)
        places every point exactly on ceil's discontinuity, and float32
        roundoff then lands ~37% of steps one index high (measured 368/1000
        at N=1000) — the chain would double-visit some beta/abar entries
        and skip others."""
        return jnp.clip(
            jnp.floor(t * self.num_steps + 0.5).astype(jnp.int32),
            1,
            self.num_steps,
        )

    def q_t_given_0(self, x0_onehot: jax.Array, t: jax.Array) -> jax.Array:
        """Marginal q(x_t | x_0) probabilities. x0_onehot: [B, A, V]."""
        a = self.abar[self._t_index(t)][:, None, None]
        if self.kind == "uniform":
            return a * x0_onehot + (1.0 - a) / self.vocab
        mask_oh = jax.nn.one_hot(self.vocab - 1, self.vocab, dtype=x0_onehot.dtype)
        return a * x0_onehot + (1.0 - a) * mask_oh

    def sample_marginal(self, key, x0: jax.Array, t: jax.Array) -> jax.Array:
        """Sample x_t (integer classes, 0-based) given x0 [B, A] ints."""
        oh = jax.nn.one_hot(x0, self.vocab)
        probs = self.q_t_given_0(oh, t)
        return jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-20)))

    def posterior_logits(
        self, x_t: jax.Array, x0_logits: jax.Array, t: jax.Array
    ) -> jax.Array:
        """log q(x_{t-1} | x_t, p(x0)) for the reverse ancestral step.

        Standard D3PM posterior with the model's x0 distribution mixed in.
        """
        ti = self._t_index(t)
        beta_t = self.betas[ti][:, None, None]
        abar_t = self.abar[ti][:, None, None]
        abar_prev = self.abar[jnp.maximum(ti - 1, 0)][:, None, None]

        x0_probs = jax.nn.softmax(x0_logits, axis=-1)
        xt_oh = jax.nn.one_hot(x_t, self.vocab, dtype=x0_logits.dtype)

        if self.kind == "uniform":
            uniform = 1.0 / self.vocab
            # fact1 = q(x_t | x_{t-1}) as a function of x_{t-1}
            fact1 = (1.0 - beta_t) * xt_oh + beta_t * uniform
            # fact2 = q(x_{t-1} | x0) with model x0 distribution
            fact2 = abar_prev * x0_probs + (1.0 - abar_prev) * uniform
        else:
            # absorbing: q(x_t=m | x_{t-1}=j) = (1-beta) d(j=m) + beta d(m=MASK)
            # as a function of j: the beta term is CONSTANT in j when x_t is
            # MASK (any state can absorb), zero otherwise.
            mask_oh = jax.nn.one_hot(self.vocab - 1, self.vocab, dtype=x0_logits.dtype)
            xt_is_mask = jnp.sum(xt_oh * mask_oh, -1, keepdims=True)  # [B,A,1]
            fact1 = (1.0 - beta_t) * xt_oh + beta_t * xt_is_mask
            fact2 = abar_prev * x0_probs + (1.0 - abar_prev) * mask_oh

        out = jnp.log(jnp.maximum(fact1, 1e-20)) + jnp.log(jnp.maximum(fact2, 1e-20))
        # at t index 1 the posterior collapses to the model's x0 prediction
        t_is_one = (ti == 1)[:, None, None]
        return jnp.where(t_is_one, jnp.log(jnp.maximum(x0_probs, 1e-20)), out)

    def prior_sample(self, key, shape) -> jax.Array:
        if self.kind == "uniform":
            return jax.random.randint(key, shape, 0, self.vocab)
        return jnp.full(shape, self.vocab - 1, jnp.int32)

    def hybrid_loss(
        self,
        x0: jax.Array,  # [B, A] int
        x_t: jax.Array,  # [B, A] int
        x0_logits: jax.Array,  # [B, A, V]
        t: jax.Array,  # [B]
        mask: jax.Array,  # [B, A]
        hybrid_lambda: float = 0.01,
    ) -> jax.Array:
        """Per-crystal D3PM hybrid loss: L_vb + lambda * CE(x0 | logits).

        L_vb is the KL between the true and model posteriors at t
        (mattergen's d3pm hybrid objective, models/mattergen/loss.py:14).
        Returns [B].
        """
        true_post = self.posterior_logits(
            x_t, jnp.log(jax.nn.one_hot(x0, self.vocab) + 1e-20), t
        )
        model_post = self.posterior_logits(x_t, x0_logits, t)
        p = jax.nn.softmax(true_post, axis=-1)
        kl = jnp.sum(
            p * (jax.nn.log_softmax(true_post, -1) - jax.nn.log_softmax(model_post, -1)),
            axis=-1,
        )
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(x0_logits, -1), x0[..., None], axis=-1
        )[..., 0]
        per_atom = kl + hybrid_lambda * ce
        return graph_mean(per_atom, mask)
