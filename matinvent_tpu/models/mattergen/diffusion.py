"""MatterGen-class multi-field joint diffusion (TPU-native).

Capability parity with the reference's MatterGen path:
* ``add_noise`` maps an integer RL timestep onto the continuous-time grid
  ``linspace(T, 1/N, N)`` and corrupts each field via its process
  (/root/reference/models/mattergen/pl_module.py:55-69);
* ``sample_losses`` = per-sample field losses with weights
  {atomic_numbers: 1.0, cell: 1.0, pos: 0.1}, reduce='sum' and the D3PM
  hybrid objective (models/mattergen/loss.py:11-78);
* ``calc_kl_reg`` MSE between agent and frozen-prior predictions per field
  (pl_module.py:83-102);
* ``sample`` is the PredictorCorrector ancestral sampler
  (mattergen's ``PredictorCorrector``, models/mattergen/sample.py:293-294)
  as one ``lax.scan`` with optional classifier-free guidance
  (``diffusion_guidance_factor``) and trajectory recording.

Fields: VP SDE on the cell (per-crystal atom-count-scaled limit), VE
wrapped-normal on fractional coords, D3PM chain on atom types.
"""
from __future__ import annotations

from functools import partial
from typing import Mapping, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from matinvent_tpu.models.batch import CrystalBatch
from matinvent_tpu.models.diffcsp import sinusoidal_time_embedding
from matinvent_tpu.models.mattergen.corruption import (
    LatticeVPSDE,
    TypeD3PM,
    WrappedCoordVE,
)
from matinvent_tpu.models.mattergen.score_net import MatterGenScoreNet
from matinvent_tpu.ops.segment import graph_mean
from matinvent_tpu.ops.wrapped_normal import log_prob_wrapped_normal
from matinvent_tpu.utils.xla_opts import COMPILER_OPTIONS


class MGNoised(NamedTuple):
    t: jax.Array  # [B] continuous time in (0, 1]
    time_emb: jax.Array  # [B, time_dim]
    atom_types_t: jax.Array  # [B, A] int (D3PM state)
    frac_coords_t: jax.Array  # [B, A, 3]
    lattice_t: jax.Array  # [B, 3, 3]


class MGTargets(NamedTuple):
    eps_cell: jax.Array  # [B, 3, 3]
    score_pos: jax.Array  # [B, A, 3] (sigma-scaled wrapped-normal score)
    x0_types: jax.Array  # [B, A] int ground-truth classes (0-based)


@struct.dataclass
class MatterGenConfig:
    hidden_dim: int = struct.field(pytree_node=False, default=256)
    num_layers: int = struct.field(pytree_node=False, default=6)
    time_dim: int = struct.field(pytree_node=False, default=256)
    num_freqs: int = struct.field(pytree_node=False, default=10)
    timesteps: int = struct.field(pytree_node=False, default=1000)
    max_atomic_num: int = struct.field(pytree_node=False, default=100)
    d3pm_kind: str = struct.field(pytree_node=False, default="uniform")
    d3pm_hybrid_lambda: float = struct.field(pytree_node=False, default=0.01)
    beta_min: float = struct.field(pytree_node=False, default=0.1)
    beta_max: float = struct.field(pytree_node=False, default=20.0)
    sigma_min: float = struct.field(pytree_node=False, default=0.005)
    sigma_max: float = struct.field(pytree_node=False, default=0.5)
    weight_cell: float = struct.field(pytree_node=False, default=1.0)
    weight_pos: float = struct.field(pytree_node=False, default=0.1)
    weight_types: float = struct.field(pytree_node=False, default=1.0)
    n_corrector: int = struct.field(pytree_node=False, default=1)
    corrector_snr: float = struct.field(pytree_node=False, default=0.2)
    condition_fields: tuple = struct.field(pytree_node=False, default=())
    # per-field corpus statistics ((field, mean, std), ...): condition values
    # are standardized before embedding, at train AND sample time (the
    # reference's mattergen standardizes properties with per-field scalers;
    # unnormalized raw scalars miscalibrate the conditional signal —
    # measured r2: 86% density overshoot that guidance amplified)
    condition_stats: tuple = struct.field(pytree_node=False, default=())
    sample_clip: float | None = struct.field(pytree_node=False, default=None)
    # compute dtype for score-net evals inside the sampling scan (bfloat16
    # roughly doubles MXU throughput; scan state and update math stay f32)
    sample_dtype: str = struct.field(pytree_node=False, default="float32")
    # D3PM type-sampling temperature for the reverse chain (generation-
    # quality knob; 1.0 = exact posterior = reference semantics). tau < 1
    # sharpens each ancestral type draw toward the posterior mode — measured
    # to raise smact charge-balance validity at a quantified uniqueness cost
    # (experiments/results/type_temperature_ab_r5.json). Applied identically
    # in the sampler, the trajectory recorder, and forward_logprob so DDPO
    # importance ratios stay exact.
    type_temperature: float = struct.field(pytree_node=False, default=1.0)
    # 'fc' (reference default) or 'knn' — see MatterGenScoreNet.edge_style
    edge_style: str = struct.field(pytree_node=False, default="fc")
    cutoff: float = struct.field(pytree_node=False, default=6.0)
    max_neighbors: int = struct.field(pytree_node=False, default=20)
    # route the sampling net's edge branch through the fused Pallas kernel
    # (ops/fused_edge.py): the [E, H] edge intermediates stay in VMEM
    # instead of round-tripping HBM. Sampling scan only — the training nets
    # (grad paths) always use the XLA layer.
    fused_edge_sampling: bool = struct.field(pytree_node=False, default=False)


class MatterGenDiffusion:
    def __init__(self, config: MatterGenConfig | None = None):
        self.config = config or MatterGenConfig()
        c = self.config
        self.cell_sde = LatticeVPSDE(beta_min=c.beta_min, beta_max=c.beta_max)
        self.coord_ve = WrappedCoordVE(sigma_min=c.sigma_min, sigma_max=c.sigma_max)
        self.d3pm = TypeD3PM.create(
            num_classes=c.max_atomic_num, num_steps=c.timesteps, kind=c.d3pm_kind
        )
        self.net = MatterGenScoreNet(
            hidden_dim=c.hidden_dim,
            time_dim=c.time_dim,
            num_layers=c.num_layers,
            type_vocab=self.d3pm.vocab,
            num_freqs=c.num_freqs,
            condition_fields=tuple(c.condition_fields),
            edge_style=c.edge_style,
            cutoff=c.cutoff,
            max_neighbors=c.max_neighbors,
        )
        # dtype-variant for the sampling scan (same params; activations cast)
        self.sample_net_plain = (
            self.net.clone(dtype=jnp.dtype(c.sample_dtype))
            if c.sample_dtype != "float32"
            else self.net
        )
        # The fused-edge variant is used ONLY by the plain sampling scan:
        # DDPO needs (a) grads through forward_logprob and (b) bit-identical
        # behavior-policy replay, so record_traj sampling and forward_logprob
        # stay on the plain (XLA) variant — the Pallas kernel defines no VJP
        # and is not bit-identical to the XLA chain.
        if c.fused_edge_sampling and c.edge_style != "fc":
            raise ValueError(
                "fused_edge_sampling requires the fc edge style "
                "(the kernel assumes a separable atom mask)"
            )
        self.sample_net = (
            self.net.clone(
                dtype=jnp.dtype(c.sample_dtype), fused_edge=True
            )
            if c.fused_edge_sampling
            else self.sample_net_plain
        )

    # ------------------------------------------------------------------ init
    def init_params(self, key, batch_size: int = 2, max_atoms: int = 8):
        c = self.config
        return self.net.init(
            key,
            jnp.zeros((batch_size, c.time_dim)),
            jnp.zeros((batch_size, max_atoms), jnp.int32),
            jnp.zeros((batch_size, max_atoms, 3)),
            jnp.eye(3)[None].repeat(batch_size, 0),
            jnp.full((batch_size,), max_atoms, jnp.int32),
            jnp.ones((batch_size, max_atoms), bool),
            conditions={f: jnp.zeros((batch_size,)) for f in c.condition_fields},
        )

    def apply_net(self, params, noised: MGNoised, num_atoms, mask,
                  conditions=None, cond_mask=None, net=None):
        if conditions and self.config.condition_stats:
            stats = {f: (m, s) for f, m, s in self.config.condition_stats}
            conditions = {
                f: (v - stats[f][0]) / max(stats[f][1], 1e-8)
                if f in stats else v
                for f, v in conditions.items()
            }
        return (net or self.net).apply(
            params,
            noised.time_emb,
            noised.atom_types_t,
            noised.frac_coords_t,
            noised.lattice_t,
            num_atoms,
            mask,
            conditions=conditions,
            cond_mask=cond_mask,
        )

    # ------------------------------------------------------------- corruption
    def time_grid(self) -> jax.Array:
        """Descending grid linspace(T=1, 1/N, N) (pl_module.py:59-62)."""
        N = self.config.timesteps
        return jnp.linspace(1.0, 1.0 / N, N)

    def add_noise(
        self,
        key: jax.Array,
        batch: CrystalBatch,
        t_index: jax.Array | int | None = None,
    ) -> tuple[MGNoised, MGTargets, jax.Array]:
        c = self.config
        B = batch.batch_size
        k_t, k_cell, k_pos, k_type = jax.random.split(key, 4)

        grid = self.time_grid()
        if t_index is None:
            t = jax.random.uniform(k_t, (B,), minval=1.0 / c.timesteps, maxval=1.0)
        else:
            t = jnp.full((B,), grid[jnp.asarray(t_index)])

        lattice_t, eps_cell, _ = self.cell_sde.sample_marginal(
            k_cell, batch.lattice, t, batch.num_atoms
        )
        frac_t, eps_pos, sigma = self.coord_ve.sample_marginal(
            k_pos, batch.frac_coords, t
        )
        # sigma-scaled score target: sigma * d/dx log p_wn — O(1) magnitudes
        score_pos = self.coord_ve.score_target(eps_pos, sigma) * sigma

        x0_types = jnp.clip(batch.atom_types - 1, 0, self.d3pm.num_classes - 1)
        types_t = self.d3pm.sample_marginal(k_type, x0_types, t)

        time_emb = sinusoidal_time_embedding(t * c.timesteps, c.time_dim)
        noised = MGNoised(t, time_emb, types_t, frac_t, lattice_t)
        targets = MGTargets(eps_cell, score_pos, x0_types)
        return noised, targets, t

    # ----------------------------------------------------------------- losses
    def sample_losses(
        self,
        params,
        noised: MGNoised,
        targets: MGTargets,
        num_atoms: jax.Array,
        mask: jax.Array,
        conditions=None,
        cond_mask=None,
    ) -> tuple[jax.Array, dict]:
        c = self.config
        preds = self.apply_net(params, noised, num_atoms, mask, conditions, cond_mask)
        loss_cell, loss_pos, loss_types = self._field_losses(
            preds, targets, noised, mask
        )
        loss = (
            c.weight_cell * loss_cell
            + c.weight_pos * loss_pos
            + c.weight_types * loss_types
        )
        return loss, preds

    def _field_losses(self, preds, targets, noised, mask):
        """Per-crystal per-field losses — the ONE implementation shared by
        the RL sample loss and the pretraining objective (they must never
        diverge)."""
        c = self.config
        loss_cell = jnp.mean((preds["cell"] - targets.eps_cell) ** 2, axis=(1, 2))
        loss_pos = graph_mean(
            jnp.mean((preds["pos"] - targets.score_pos) ** 2, axis=-1), mask
        )
        loss_types = self.d3pm.hybrid_loss(
            targets.x0_types,
            noised.atom_types_t,
            preds["atomic_numbers"],
            noised.t,
            mask,
            hybrid_lambda=c.d3pm_hybrid_lambda,
        )
        return loss_cell, loss_pos, loss_types

    def kl_reg(self, agent_pred: dict, prior_pred: dict, mask: jax.Array) -> jax.Array:
        prior_pred = jax.tree.map(jax.lax.stop_gradient, prior_pred)
        kl0 = jnp.mean((agent_pred["cell"] - prior_pred["cell"]) ** 2, axis=(1, 2))
        kl1 = graph_mean(
            jnp.mean((agent_pred["pos"] - prior_pred["pos"]) ** 2, axis=-1), mask
        )
        kl2 = graph_mean(
            jnp.mean(
                (agent_pred["atomic_numbers"] - prior_pred["atomic_numbers"]) ** 2,
                axis=-1,
            ),
            mask,
        )
        return kl0 + kl1 + kl2

    def rl_timestep_loss(
        self,
        params,
        prior_params,
        batch: CrystalBatch,
        rewards: jax.Array,
        key: jax.Array,
        t_index: jax.Array,
        sigma_kl: float,
        conditions=None,
    ):
        """Reward-weighted loss + KL at one grid timestep (mat_invent.py:150-163)."""
        mask = batch.mask
        noised, targets, _ = self.add_noise(key, batch, t_index)
        loss, agent_pred = self.sample_losses(
            params, noised, targets, batch.num_atoms, mask, conditions
        )
        _, prior_pred = self.sample_losses(
            prior_params, noised, targets, batch.num_atoms, mask, conditions
        )
        kl = self.kl_reg(agent_pred, prior_pred, mask)
        loss_diff = rewards * loss
        loss_kl = kl * (1.1 - rewards)
        total = jnp.mean(loss_diff + loss_kl * sigma_kl)
        return total, (jnp.sum(loss_diff), jnp.sum(loss_kl))

    def rl_chunk_loss(
        self, params, prior_params, batch, rewards, key, t_indices, sigma_kl,
        conditions=None,
    ):
        keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(t_indices)
        losses, aux = jax.vmap(
            lambda k, t: self.rl_timestep_loss(
                params, prior_params, batch, rewards, k, t, sigma_kl, conditions
            )
        )(keys, t_indices)
        return jnp.mean(losses), jax.tree.map(jnp.sum, aux)

    # ------------------------------------------------------------ pretraining
    def training_loss(
        self,
        params,
        batch: CrystalBatch,
        key: jax.Array,
        conditions=None,
        cond_dropout: float = 0.1,
    ) -> tuple[jax.Array, dict]:
        """Pretraining objective at uniform random t with classifier-free
        condition dropout (the CFG null-token training signal)."""
        k_noise, k_drop = jax.random.split(key)
        noised, targets, _ = self.add_noise(k_noise, batch, t_index=None)
        cond_mask = None
        if conditions:
            B = batch.batch_size
            cond_mask = {
                f: jax.random.uniform(jax.random.fold_in(k_drop, i), (B,))
                >= cond_dropout
                for i, f in enumerate(sorted(conditions))
            }
        c = self.config
        preds = self.apply_net(
            params, noised, batch.num_atoms, batch.mask, conditions, cond_mask
        )
        loss_cell, loss_pos, loss_types = self._field_losses(
            preds, targets, noised, batch.mask
        )
        loss = jnp.mean(
            c.weight_cell * loss_cell
            + c.weight_pos * loss_pos
            + c.weight_types * loss_types
        )
        return loss, dict(
            loss=loss,
            loss_cell=jnp.mean(loss_cell),
            loss_pos=jnp.mean(loss_pos),
            loss_types=jnp.mean(loss_types),
        )

    # --------------------------------------------------------------- sampling
    def _guided_preds(
        self, params, noised, num_atoms, mask, conditions, guidance, plain=False
    ):
        """Classifier-free guidance: (1+g)*cond - g*uncond per field.

        Runs on the sampling-dtype net variant (bf16 when configured).
        ``plain=True`` forces the non-fused variant (no Pallas kernel):
        required under grad (forward_logprob) and for record_traj sampling
        so DDPO's behavior policy and its replay are bit-identical."""
        net = self.sample_net_plain if plain else self.sample_net
        if not conditions or guidance == 0.0:
            # empty dict guards too: (1+g)x - gx = x but would cost a
            # second identical net eval per step
            return self.apply_net(params, noised, num_atoms, mask, conditions, net=net)
        cond_preds = self.apply_net(
            params, noised, num_atoms, mask, conditions, net=net
        )
        B = num_atoms.shape[0]
        null_mask = {f: jnp.zeros((B,), bool) for f in conditions}
        uncond_preds = self.apply_net(
            params, noised, num_atoms, mask, conditions, cond_mask=null_mask, net=net
        )
        return jax.tree.map(
            lambda c_, u: (1.0 + guidance) * c_ - guidance * u, cond_preds, uncond_preds
        )

    def _sample_init(self, key, num_atoms, A: int, fixed_types):
        """Prior draw for one (sub-)batch: state, mask, sigma_lim, scan key."""
        B = num_atoms.shape[0]
        mask = jnp.arange(A)[None, :] < num_atoms[:, None]
        k_cell, k_pos, k_type, k_scan = jax.random.split(key, 4)
        sigma_lim = self.cell_sde.limit_std(num_atoms)[:, None, None]
        cell = self.cell_sde.prior_sample(k_cell, (B, 3, 3), num_atoms)
        pos = self.coord_ve.prior_sample(k_pos, (B, A, 3))
        if fixed_types is not None:
            types = jnp.clip(fixed_types - 1, 0, self.d3pm.num_classes - 1)
        else:
            types = self.d3pm.prior_sample(k_type, (B, A))
        return (cell, pos, types), mask, sigma_lim, k_scan

    def _step_tables(self) -> dict:
        """Per-step scalar/embedding tables, precomputed OUTSIDE the scan.

        Every quantity here depends only on the (static) time grid: hoisting
        them replaces per-step transcendental chains and dozens of tiny
        fusion regions inside the scan body with single gathers — this is
        what keeps the fixed per-step cost low enough for the multi-bucket
        fused scan (sample_bucketed) to pay off."""
        c = self.config
        N = c.timesteps
        grid = self.time_grid()  # [N] descending
        t_prev = jnp.maximum(grid - 1.0 / N, 0.0)
        last = jnp.arange(N) == (N - 1)
        nz = jnp.where(last, 0.0, 1.0)
        time_emb = sinusoidal_time_embedding(grid * N, c.time_dim)  # [N, D]
        sigma_now = self.coord_ve.sigma(grid)
        sigma_prev = jnp.where(last, 0.0, self.coord_ve.sigma(t_prev))
        abar_now = jnp.exp(-self.cell_sde._B(grid))
        abar_prev = jnp.exp(-self.cell_sde._B(t_prev))
        alpha_i = abar_now / abar_prev
        beta_i = 1.0 - alpha_i
        post_std = jnp.sqrt(
            jnp.maximum(
                beta_i * (1.0 - abar_prev) / jnp.maximum(1.0 - abar_now, 1e-12),
                0.0,
            )
        )
        p_step = sigma_now**2 - sigma_prev**2
        p_std = jnp.sqrt(
            jnp.maximum(sigma_prev**2 * p_step, 0.0)
            / jnp.maximum(sigma_now**2, 1e-12)
        )
        corr_step = (c.corrector_snr * sigma_now) ** 2 * 2.0
        return dict(
            t=grid, nz=nz, time_emb=time_emb,
            inv_sigma=1.0 / jnp.maximum(sigma_now, 1e-8),
            eps_coef=beta_i / jnp.sqrt(1.0 - abar_now),
            inv_sqrt_alpha=1.0 / jnp.sqrt(alpha_i),
            post_std=post_std, p_step=p_step, p_std=p_std,
            corr_step=corr_step, corr_noise=jnp.sqrt(2.0 * corr_step),
        )

    def _sample_step(
        self, params, carry, i, *, num_atoms, mask, sigma_lim, k_scan,
        conditions, guidance, fixed_types, record_traj, tables,
    ):
        """One predictor-corrector update of one (sub-)batch at grid step i."""
        c = self.config
        N = c.timesteps
        B = num_atoms.shape[0]
        tb = {k: v[i] for k, v in tables.items()}

        def net_preds(cell_t, pos_t, types_t):
            t = jnp.full((B,), tb["t"])
            time_emb = jnp.broadcast_to(tb["time_emb"][None, :], (B, c.time_dim))
            noised = MGNoised(t, time_emb, types_t, pos_t, cell_t)
            return (
                self._guided_preds(
                    params, noised, num_atoms, mask, conditions, guidance,
                    # record_traj feeds DDPO: stay on the plain net so the
                    # behavior policy is bit-identical to forward_logprob's
                    # replay (which must differentiate => no Pallas kernel)
                    plain=record_traj,
                ),
                t,
            )

        cell_t, pos_t, types_t = carry
        cell_in, pos_in, types_in = cell_t, pos_t, types_t
        last = i == (N - 1)

        ki = jax.random.fold_in(k_scan, i)
        kc, kp, kt_, kcorr = jax.random.split(ki, 4)
        nz = tb["nz"]

        # ---- corrector: Langevin on coords (snr-scaled)
        corr_mu = pos_t  # mu of the FIRST corrector kick (DDPO bookkeeping)

        def corrector(state, kc_i):
            pos_c = state
            preds, _ = net_preds(cell_t, pos_c, types_t)
            score = preds["pos"] * tb["inv_sigma"]
            noise = nz * jax.random.normal(kc_i, pos_c.shape)
            # reference sign convention: pred approximates +dlogp-sum form
            mu = pos_c - tb["corr_step"] * score
            pos_c = mu + tb["corr_noise"] * noise
            return pos_c, mu

        for ci in range(c.n_corrector):
            pos_t, mu_ci = corrector(pos_t, jax.random.fold_in(kcorr, ci))
            if ci == 0:
                corr_mu = mu_ci

        # ---- predictor
        preds, t_vec = net_preds(cell_t, pos_t, types_t)

        # cell: VP ancestral step in sigma_lim-normalized space
        cell_n = cell_t / sigma_lim
        mean_n = (cell_n - tb["eps_coef"] * preds["cell"]) * tb["inv_sqrt_alpha"]
        cell_next = sigma_lim * (
            mean_n + nz * tb["post_std"] * jax.random.normal(kc, cell_n.shape)
        )
        if c.sample_clip is not None:
            cell_next = jnp.clip(cell_next, -c.sample_clip, c.sample_clip)

        # coords: VE ancestral (sigma^2 difference) with sigma-scaled score
        score = preds["pos"] * tb["inv_sigma"]
        pos_next = (
            pos_t - tb["p_step"] * score
            + nz * tb["p_std"] * jax.random.normal(kp, pos_t.shape)
        ) % 1.0

        # types: D3PM ancestral from the posterior (held fixed in CSP mode)
        if fixed_types is None:
            post_logits = self.d3pm.posterior_logits(
                types_t, preds["atomic_numbers"], t_vec
            )
            # generation-quality temperature (config docs); argmax at the
            # final grid step is invariant to it
            post_logits = post_logits / c.type_temperature
            types_next = jax.random.categorical(kt_, post_logits)
            types_next = jnp.where(
                last, jnp.argmax(post_logits, axis=-1), types_next
            )
        else:
            types_next = types_t

        ys = None
        if record_traj:
            # DDPO bookkeeping (mirrors the DiffCSP recorder,
            # models/diffcsp.py record_traj): full transition state + the
            # behavior policy's log-probs of the realized draws.
            # Every lp is gated by nz: the LAST grid step is deterministic
            # (noise off, post_std/p_std exactly 0, types via argmax), so its
            # transition has no stochastic log-prob — recording the clamped
            # 1e-12-std logpdf instead puts one catastrophically
            # rounding-amplified garbage ratio into every DDPO update
            # (forward_logprob gates identically, keeping the ratio at 1)
            mu_cell = sigma_lim * mean_n
            lp_cell = nz * jax.scipy.stats.norm.logpdf(
                cell_next, mu_cell,
                jnp.maximum(sigma_lim * tb["post_std"], 1e-12),
            ).mean(axis=(1, 2))
            lp_pos_corr = nz * graph_mean(
                log_prob_wrapped_normal(
                    pos_t % 1.0, corr_mu % 1.0,
                    jnp.maximum(tb["corr_noise"], 1e-12),
                ).mean(axis=-1),
                mask,
            )
            mu_pred = (pos_t - tb["p_step"] * score) % 1.0
            lp_pos_pred = nz * graph_mean(
                log_prob_wrapped_normal(
                    pos_next, mu_pred, jnp.maximum(tb["p_std"], 1e-12)
                ).mean(axis=-1),
                mask,
            )
            if fixed_types is None:
                lp_types = nz * graph_mean(
                    jnp.take_along_axis(
                        jax.nn.log_softmax(post_logits),
                        types_next[..., None],
                        axis=-1,
                    )[..., 0],
                    mask,
                )
            else:
                lp_types = jnp.zeros(cell_next.shape[0])
            ys = dict(
                # inputs of this transition (state at grid step i) ...
                cell_in=cell_in, pos_in=pos_in, types_in=types_in,
                pos_mid=pos_t % 1.0,
                # ... outputs (state at i+1); key names kept from the
                # original recorder for downstream compatibility
                cell=cell_next, pos=pos_next, types=types_next,
                log_prob_cell=lp_cell,
                log_prob_pos=lp_pos_corr + lp_pos_pred,
                log_prob_types=lp_types,
                step=i,
            )
        return (cell_next, pos_next, types_next), ys

    # -------------------------------------------------- DDPO policy gradients
    def forward_logprob(
        self,
        params,
        state: dict,
        num_atoms: jax.Array,
        mask: jax.Array,
        tables: dict | None = None,
        conditions: Mapping[str, jax.Array] | None = None,
        guidance: float = 0.0,
        fixed_types: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array, dict]:
        """Differentiable log-probs of one stored sampling transition.

        Multi-field counterpart of the DiffCSP ``forward_logprob``
        (models/diffcsp.py:360; reference vestige
        /root/reference/models/diffcsp/diffusion.py:158-227): cell ancestral
        Gaussian + wrapped-coord corrector/predictor log-probs + D3PM
        categorical transition log-prob, recomputed with the CURRENT params
        for PPO importance ratios against the recorded behavior-policy
        values.

        ``state`` holds one step of a ``record_traj=True`` trajectory:
        ``step`` (scalar grid index), ``cell_in/pos_in/types_in`` (state
        entering the step), ``pos_mid`` (post-corrector coords) and
        ``cell/pos/types`` (realized next state). Supports the default
        ``n_corrector == 1`` operating point.

        ``conditions``/``guidance``/``fixed_types`` must match what the
        behavior policy sampled with (the sampler records them alongside the
        trajectory): replaying a conditional/guided/CSP trajectory through
        the unconditional policy would put every importance ratio at
        exp(lp_uncond - lp_cond) != 1 even at identical params, silently
        miscalibrating the PPO update.
        Returns per-crystal (lp_cell, lp_types, lp_pos, preds).
        """
        c = self.config
        if c.n_corrector != 1:
            raise NotImplementedError(
                "MatterGen DDPO replay supports n_corrector=1 (the default); "
                "intermediate corrector states are not recorded"
            )
        tables = tables if tables is not None else self._step_tables()
        i = state["step"]
        tb = {k: v[i] for k, v in tables.items()}
        B = num_atoms.shape[0]
        sigma_lim = self.cell_sde.limit_std(num_atoms)[:, None, None]
        # the last grid step is deterministic (recorder gates its lp to 0 by
        # nz); gate identically so the importance ratio there is exactly 1
        nz = tb["nz"]

        def net_eval(cell_t, pos_t, types_t):
            t = jnp.full((B,), tb["t"])
            time_emb = jnp.broadcast_to(
                tb["time_emb"][None, :], (B, c.time_dim)
            )
            noised = MGNoised(t, time_emb, types_t, pos_t, cell_t)
            # _guided_preds runs the sampling-dtype net variant with the same
            # conditioning/guidance mix the behavior policy used: replay the
            # exact policy or importance ratios start away from 1 at
            # identical params (dtype rounding, missing condition embeddings).
            # plain=True: this path differentiates (no Pallas kernel), and
            # record_traj sampling used the plain net for the same reason.
            preds = self._guided_preds(
                params, noised, num_atoms, mask, conditions, guidance,
                plain=True,
            )
            return jax.tree.map(lambda o: o.astype(jnp.float32), preds), t

        # corrector log-prob (Langevin kick on coords)
        preds_c, _ = net_eval(
            state["cell_in"], state["pos_in"], state["types_in"]
        )
        mu_corr = state["pos_in"] - tb["corr_step"] * (
            preds_c["pos"] * tb["inv_sigma"]
        )
        lp_pos_corr = nz * graph_mean(
            log_prob_wrapped_normal(
                state["pos_mid"], mu_corr % 1.0,
                jnp.maximum(tb["corr_noise"], 1e-12),
            ).mean(axis=-1),
            mask,
        )

        # predictor log-probs
        preds, t_vec = net_eval(
            state["cell_in"], state["pos_mid"], state["types_in"]
        )
        cell_n = state["cell_in"] / sigma_lim
        mean_n = (cell_n - tb["eps_coef"] * preds["cell"]) * tb["inv_sqrt_alpha"]
        lp_cell = nz * jax.scipy.stats.norm.logpdf(
            state["cell"], sigma_lim * mean_n,
            jnp.maximum(sigma_lim * tb["post_std"], 1e-12),
        ).mean(axis=(1, 2))
        mu_pred = (
            state["pos_mid"] - tb["p_step"] * (preds["pos"] * tb["inv_sigma"])
        ) % 1.0
        lp_pos_pred = nz * graph_mean(
            log_prob_wrapped_normal(
                state["pos"], mu_pred, jnp.maximum(tb["p_std"], 1e-12)
            ).mean(axis=-1),
            mask,
        )
        if fixed_types is None:
            post_logits = self.d3pm.posterior_logits(
                state["types_in"], preds["atomic_numbers"], t_vec
            )
            # same temperature as the sampler/recorder: the behavior policy
            # sampled from the tempered posterior, so the replay must score
            # under it or importance ratios start away from 1
            post_logits = post_logits / self.config.type_temperature
            lp_types = nz * graph_mean(
                jnp.take_along_axis(
                    jax.nn.log_softmax(post_logits),
                    state["types"][..., None],
                    axis=-1,
                )[..., 0],
                mask,
            )
        else:
            # CSP mode held types fixed during sampling and the recorder
            # wrote log_prob_types=0; mirror it so the ratio stays exact
            lp_types = jnp.zeros(state["cell"].shape[0])
        return lp_cell, lp_types, lp_pos_corr + lp_pos_pred, preds

    def _finalize(self, state, mask, num_atoms) -> CrystalBatch:
        cell, pos, types = state
        # D3PM classes are 0-based; MASK (absorbing) falls outside 1..K and is
        # clamped to class 0 = padding-invalid, filtered downstream.
        atom_types = jnp.where(types < self.d3pm.num_classes, types + 1, 0)
        atom_types = jnp.where(mask, atom_types, 0).astype(jnp.int32)
        return CrystalBatch(
            atom_types=atom_types,
            frac_coords=pos % 1.0,
            lattice=cell,
            num_atoms=num_atoms,
        )

    @partial(
        jax.jit,
        static_argnames=("self", "max_atoms", "guidance", "record_traj"),
        compiler_options=COMPILER_OPTIONS,
    )
    def sample(
        self,
        params,
        key: jax.Array,
        num_atoms: jax.Array,
        max_atoms: int | None = None,
        conditions: Mapping[str, jax.Array] | None = None,
        guidance: float = 0.0,
        record_traj: bool = False,
        fixed_types: jax.Array | None = None,
    ):
        """Predictor-corrector ancestral sampling over the N-step grid.

        ``fixed_types``: optional [B, A] 1-based atomic numbers for crystal
        structure prediction — atom types are held fixed through the whole
        chain (reference CSP mode, models/mattergen/sample.py:160-177) and
        only cell/coords diffuse."""
        if record_traj and self.config.n_corrector != 1:
            # the recorder stores one (corr_mu, pos_mid) pair per grid step;
            # with multiple Langevin kicks the recorded log_prob_pos would be
            # the wrapped-normal of the FINAL position against the FIRST
            # kick's mean — silently wrong for any consumer, not just DDPO
            raise NotImplementedError(
                "record_traj=True supports n_corrector=1 (the default); "
                "intermediate corrector states are not recorded"
            )
        A = int(max_atoms) if max_atoms is not None else 20
        # clamp to the padded atom axis: num_atoms is traced (no host-side
        # assert possible under jit), and a draw above the cap would return
        # CrystalBatch metadata claiming more atoms than the batch holds
        num_atoms = jnp.minimum(num_atoms, A)
        state, mask, sigma_lim, k_scan = self._sample_init(
            key, num_atoms, A, fixed_types
        )
        tables = self._step_tables()

        def step(carry, i):
            return self._sample_step(
                params, carry, i, num_atoms=num_atoms, mask=mask,
                sigma_lim=sigma_lim, k_scan=k_scan, conditions=conditions,
                guidance=guidance, fixed_types=fixed_types,
                record_traj=record_traj, tables=tables,
            )

        state, traj = jax.lax.scan(step, state, jnp.arange(self.config.timesteps))
        return self._finalize(state, mask, num_atoms), traj

    @partial(
        jax.jit,
        static_argnames=("self", "bucket_max_atoms", "guidance"),
        compiler_options=COMPILER_OPTIONS,
    )
    def sample_bucketed(
        self,
        params,
        key: jax.Array,
        num_atoms_buckets: tuple,
        bucket_max_atoms: tuple,
        conditions_buckets: tuple | None = None,
        guidance: float = 0.0,
    ):
        """Size-bucketed sampling: all buckets advance inside ONE scan.

        TPU-first optimization with no reference counterpart: dense-padded
        edges cost O(A^2) per crystal, but most draws from the num-atoms
        histograms are far below the 20-atom cap (mp_20: E[n^2] ~ 138 vs
        400). Splitting the batch into per-size sub-batches, each padded to
        its own bucket cap, removes most of that padding work while paying
        the scan's fixed per-step cost once. Semantically identical
        per-crystal to ``sample`` (same SDE steps; RNG streams differ).

        Args:
            num_atoms_buckets: tuple of [B_i] int arrays (B_i static).
            bucket_max_atoms: matching tuple of per-bucket atom caps.
            conditions_buckets: optional tuple of per-bucket condition dicts.
        Returns: list of CrystalBatch, one per bucket.
        """
        n_b = len(num_atoms_buckets)
        # same self-consistency clamp as sample(): metadata never exceeds
        # the bucket's padded atom axis
        num_atoms_buckets = tuple(
            jnp.minimum(na, int(cap))
            for na, cap in zip(num_atoms_buckets, bucket_max_atoms)
        )
        conds = conditions_buckets or (None,) * n_b
        inits = []
        for bi in range(n_b):
            inits.append(
                self._sample_init(
                    jax.random.fold_in(key, bi),
                    num_atoms_buckets[bi],
                    int(bucket_max_atoms[bi]),
                    None,
                )
            )
        states = tuple(it[0] for it in inits)
        tables = self._step_tables()

        def step(carry, i):
            new = []
            for bi in range(n_b):
                st, _ = self._sample_step(
                    params, carry[bi], i,
                    num_atoms=num_atoms_buckets[bi], mask=inits[bi][1],
                    sigma_lim=inits[bi][2], k_scan=inits[bi][3],
                    conditions=conds[bi], guidance=guidance,
                    fixed_types=None, record_traj=False, tables=tables,
                )
                new.append(st)
            return tuple(new), None

        states, _ = jax.lax.scan(step, states, jnp.arange(self.config.timesteps))
        return [
            self._finalize(states[bi], inits[bi][1], num_atoms_buckets[bi])
            for bi in range(n_b)
        ]
