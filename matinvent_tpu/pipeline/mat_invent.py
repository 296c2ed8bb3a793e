"""MatInvent: the full RL loop (parity with /root/reference/pipeline/mat_invent.py:17-291).

Per RL iteration: sample -> invalid-filter -> (optional MLIP relax) ->
OptFilter -> cap at max_num -> save extxyz -> reward -> LTM metrics ->
diversity filter -> top-k -> experience replay -> reward-weighted finetune ->
periodic checkpoint. Device work (sampling scan, finetune epochs) is fully
jitted; everything else is host-side.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from matinvent_tpu.models.sample import batch_to_structures, collate_data_list
from matinvent_tpu.pipeline.base import ReinL
from matinvent_tpu.pipeline.filters import invalid_filter
from matinvent_tpu.pipeline.logger import Logger
from matinvent_tpu.pipeline.save import save_structures
from matinvent_tpu.rewards.reward import Reward


class MatInvent(ReinL):
    def __init__(
        self,
        rl_epoch: int,
        model_suite,
        reward: Reward,
        sample_cfg: dict,
        finetune_cfg: dict,
        topk_ratio: float,
        save_dir: str,
        save_freq: int = 50,
        logger: Logger | None = None,
        replay: bool = False,
        replay_args: Dict | None = None,
        div_filter: bool = False,
        df_args: Dict | None = None,
        seed: int = 0,
        resume: bool = False,
        profile_dir: str | None = None,
        profile_steps: int = 1,
        async_sampling: bool = False,
        state_save_freq: int = 1,
        finetune_mode: str = "reward_weighted",
        **kwargs,
    ) -> None:
        super().__init__(
            rl_epoch=rl_epoch,
            model_suite=model_suite,
            reward=reward,
            sample_cfg=sample_cfg,
            finetune_cfg=finetune_cfg,
            save_dir=save_dir,
            save_freq=save_freq,
            logger=logger,
            replay=replay,
            replay_args=replay_args,
            seed=seed,
            **kwargs,
        )
        assert 0.0 < topk_ratio <= 1.0
        self.topk_ratio = topk_ratio
        self.div_filter = div_filter
        self.df_args = df_args or {}
        self._key = jax.random.PRNGKey(seed)

        self.load_model()
        self.finetuner = self.model_suite.get_finetuner(**self.finetune_cfg)

        # finetune mode: 'reward_weighted' (the reference objective) or
        # 'ddpo' — PPO-clipped policy gradients over recorded sampling
        # trajectories (the reference ships this machinery unwired;
        # SURVEY.md §7). DDPO trains on the CURRENT iteration's trajectories
        # only (replay entries have no stored trajectory).
        assert finetune_mode in ("reward_weighted", "ddpo")
        self.finetune_mode = finetune_mode
        if finetune_mode == "ddpo":
            if async_sampling:
                raise ValueError("ddpo finetuning is incompatible with async_sampling")
            from matinvent_tpu.models.diffcsp import DiffCSPDiffusion
            from matinvent_tpu.models.sample import DEFAULT_STEP_LR
            from matinvent_tpu.parallel.train import (
                DDPOFinetuneStep,
                MatterGenDDPOStep,
            )

            self.sampler.record_trajectories = True
            # the recorded trajectory always has the model's full T steps
            t_traj = int(self.diffusion.config.timesteps)
            accum = int(self.finetune_cfg.get("accum_steps", 50))
            common = dict(
                lr=float(self.finetune_cfg.get("lr", 1e-5)),
                clip_eps=float(self.finetune_cfg.get("clip_eps", 0.2)),
                chunk=accum if t_traj % accum == 0 else t_traj,
                adv_norm=bool(self.finetune_cfg.get("adv_norm", True)),
                epochs=int(self.finetune_cfg.get("ddpo_epochs", 1)),
                max_grad_norm=float(self.finetune_cfg.get("max_grad_norm", 1.0)),
            )
            if isinstance(self.diffusion, DiffCSPDiffusion):
                step_lr = getattr(self.sampler, "step_lr", None) or DEFAULT_STEP_LR[
                    "gen"
                ].get(getattr(self.sampler, "num_atoms_distribution", "mp_20"), 5e-6)
                self.ddpo = DDPOFinetuneStep(
                    self.diffusion, step_lr=float(step_lr), **common
                )
            else:
                # MatterGen family: multi-field forward_logprob replay
                self.ddpo = MatterGenDDPOStep(self.diffusion, **common)

        # async host/device overlap (SURVEY.md §7 'Host-device overlap'): when
        # enabled, the device starts sampling iteration t+1 (with the
        # pre-finetune-t policy, one step stale) while the host filters and
        # scores iteration t. The reference is fully serial
        # (pipeline/mat_invent.py:191-271).
        self.async_sampling = async_sampling
        self._pending_batch = None

        # jax.profiler tracing of the first `profile_steps` RL iterations
        # (SURVEY.md §5: the reference has no tracing at all)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self._profiling = False

        # full-state resume (beyond the reference, which restarts manually
        # from weight snapshots only — SURVEY.md §5 checkpoint/resume gap)
        self.resume = resume
        self.state_save_freq = max(int(state_save_freq), 1)
        self.state_dir = os.path.join(save_dir, "state")
        self._start_step = 0
        if resume:
            self._try_resume()

    def _try_resume(self):
        from matinvent_tpu.utils.checkpoint import load_run_state

        loaded = load_run_state(self.state_dir, self.agent_params)
        if loaded is None:
            logging.info("resume requested but no run state found; starting fresh")
            return
        self.agent_params, host = loaded
        self._start_step = host["step"] + 1
        self.cost = host["cost"]
        self._key = jnp.asarray(host["key"])
        if host.get("sampler"):
            self.sampler._rng.bit_generator.state = host["sampler"]["rng"]
            self.sampler._key = jnp.asarray(host["sampler"]["key"])
        if host.get("replay_buffer") is not None and self.replay is not None:
            self.replay.buffer = host["replay_buffer"]
        if host.get("ltm_memory") is not None:
            self.ltm.memory = host["ltm_memory"]
            if len(self.ltm.memory):
                self.ltm.unique_comps = self.ltm.memory["comp"].unique()
        logging.info(f"resumed run state at step {self._start_step}")

    def _save_state(self):
        from matinvent_tpu.utils.checkpoint import save_run_state

        save_run_state(
            self.state_dir,
            self.agent_params,
            self.step,
            self.cost,
            self._key,
            replay_buffer=self.replay,
            ltm=self.ltm,
            sampler=self.sampler,
        )

    def load_model(self):
        """Agent = trainable copy, prior = frozen copy of the pretrained model
        (mat_invent.py:62-72). In JAX 'frozen' simply means we never update
        prior_params; the KL term stop-gradients them."""
        self.diffusion, self.agent_params = self.model_suite.load_model()
        _, self.prior_params = self.model_suite.load_model()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _launch_sampling(self):
        return self.sampler.launch(
            model=(self.diffusion, self.agent_params),
            batch_size=self.sample_cfg.get("batch_size"),
            num_batches=self.sample_cfg.get("num_batches"),
        )

    def sample_step(self):
        if self.async_sampling:
            device_batch = (
                self._pending_batch
                if self._pending_batch is not None
                else self._launch_sampling()
            )
            # queue the next iteration's sampling before any host-side work
            # (unless this is the last iteration — that batch would be wasted)
            self._pending_batch = (
                self._launch_sampling()
                if self.step + 1 < self.rl_epoch
                else None
            )
            sample_data, sample_struc = batch_to_structures(device_batch)
        else:
            sample_data, sample_struc = self.sampler.generate(
                model=(self.diffusion, self.agent_params),
                batch_size=self.sample_cfg.get("batch_size"),
                num_batches=self.sample_cfg.get("num_batches"),
            )
        # tag each sample with its position in the generated batch so DDPO
        # can slice the recorded trajectory after filtering/scoring
        for i, d in enumerate(sample_data):
            d["batch_index"] = i
        if self.sample_cfg.get("invalid_filter", True):
            sample_data, sample_struc = invalid_filter(sample_data, sample_struc)
        logging.info(f"Number of valid samples: {len(sample_struc)}")

        valid_xyz_path = save_structures(
            sample_struc, self.sample_dir, f"step_{self.step:0>4d}_valid.extxyz"
        )

        if self.sample_cfg.get("mlip_opt"):
            sample_struc, energies = self.sample_cfg["mlip_opt"](
                sample_struc, valid_xyz_path
            )
        else:
            energies = None

        if self.sample_cfg.get("filter"):
            flt = self.sample_cfg["filter"]
            sample_data, sample_struc, metrics = flt(sample_data, sample_struc, energies)
            logging.info(f"Number of filtered samples: {len(sample_struc)}")
        else:
            metrics = {}

        if metrics:
            logging.info(", ".join(f"{k}: {v:.6f}" for k, v in metrics.items()))

        max_num = self.sample_cfg.get("max_num")
        if max_num and len(sample_struc) > max_num:
            sample_data = sample_data[:max_num]
            sample_struc = sample_struc[:max_num]

        eval_xyz_path = save_structures(
            sample_struc, self.sample_dir, f"step_{self.step:0>4d}_eval.extxyz"
        )
        return sample_data, sample_struc, eval_xyz_path, metrics

    def ft_step(self, data_list: List[dict], rewards: np.ndarray, baseline: float):
        if len(data_list) == 0:
            logging.warning("ft_step skipped: no finetune data this iteration")
            return
        max_atoms = getattr(self.sampler, "max_atoms", 20)
        batch = collate_data_list(data_list, max_atoms=max_atoms)
        # conditional models finetune under the same conditioning values used
        # at sampling time (properties_to_condition_on broadcast per crystal)
        props = getattr(self.sampler, "properties_to_condition_on", None)
        conditions = (
            {k: jnp.full((len(data_list),), float(v)) for k, v in props.items()}
            if props
            else None
        )
        # NOTE: like the reference (mat_invent.py:155-157), raw reward is the
        # advantage; the computed `baseline` is intentionally unused.
        self.agent_params, epoch_metrics = self.finetuner.run(
            self.agent_params,
            self.prior_params,
            batch,
            jnp.asarray(rewards, jnp.float32),
            self._next_key(),
            conditions=conditions,
        )
        for e, m in enumerate(epoch_metrics):
            logging.info(
                f"Epoch {e}: " + ", ".join(f"{k}: {v:.4f}" for k, v in m.items())
            )

    def ft_step_ddpo(self, sample_list: List[dict], rewards: np.ndarray):
        traj = self.sampler.last_trajectory
        num_atoms_all = self.sampler.last_num_atoms
        if traj is None or len(sample_list) == 0:
            logging.warning("ddpo ft skipped: no trajectory or no scored samples")
            return
        idx = jnp.asarray([d["batch_index"] for d in sample_list], jnp.int32)
        traj_sel = jax.tree.map(
            lambda x: x[:, idx] if x.ndim >= 2 and x.shape[1] == num_atoms_all.shape[0]
            else x,
            traj,
        )
        num_atoms = num_atoms_all[idx]
        A = self.sampler.max_atoms
        mask = jnp.arange(A)[None, :] < num_atoms[:, None]
        from matinvent_tpu.parallel.train import MatterGenDDPOStep

        replay_kwargs = {}
        if isinstance(self.ddpo, MatterGenDDPOStep):
            # replay under the behavior policy the sampler recorded:
            # conditioning / CFG factor / CSP fixed types, row-selected like
            # the trajectory itself
            cond = self.sampler.last_conditions
            if cond is not None:
                cond = {k: v[idx] for k, v in cond.items()}
            ft = self.sampler.last_fixed_types
            replay_kwargs = dict(
                conditions=cond,
                guidance=float(self.sampler.last_guidance),
                fixed_types=None if ft is None else ft[idx],
            )
        self.agent_params, loss = self.ddpo.run(
            self.agent_params, traj_sel, num_atoms, mask,
            jnp.asarray(rewards, jnp.float32), **replay_kwargs,
        )
        stats = getattr(self.ddpo, "last_stats", None) or {}
        logging.info(
            f"DDPO loss: {loss:.5f}"
            + "".join(f" {k}={v:.4f}" for k, v in stats.items())
        )
        # importance-ratio sanity stats (last PPO epoch) into metrics.csv
        return {f"ddpo_{k}": v for k, v in stats.items()}

    def rl_step(self):
        logging.info(f"*****   LOOP {self.step} START   *****")
        start_time = time.time()

        logging.info("SAMPLE:")
        with self.timer.phase("sample"):
            sample_list, sample_struc, xyz_path, sample_metrics = self.sample_step()

        logging.info("SCORE:")
        with self.timer.phase("score"):
            sample_list, sample_struc, rewards, prop_dict = self.reward_step(
                sample_list, sample_struc, xyz_path, f"step_{self.step:0>4d}"
            )

        log_dict = {f"{k} mean": v.mean() for k, v in prop_dict.items() if len(v)}
        log_dict.update({f"{k} std": v.std() for k, v in prop_dict.items() if len(v)})
        if len(rewards):
            log_dict.update({"reward mean": rewards.mean(), "reward std": rewards.std()})
        log_dict.update(sample_metrics)

        if len(sample_struc) == 0:
            # robustness beyond the reference: an early (or broken) agent can
            # yield zero valid+scored samples; skip memory/finetune this step.
            logging.warning("no valid scored samples this iteration; skipping finetune")
            log_dict.update(crystal_num=len(self.ltm), cost=self.cost)
            if self.logger is not None:
                self.logger.log(log_dict, step=self.step)
            return

        self.ltm.extend(sample_struc, rewards, self.step)
        metrics = self.ltm.calc_metrics(self.reward.threshold)
        self.ltm.save(os.path.join(self.sample_dir, "long_term_memory.csv"))
        logging.info(
            f"{len(self.ltm)} crystals generated so far, "
            f"{len(self.ltm.unique_comps)} unique components."
            f"  Burden: {metrics[0]}, Div. Ratio: {metrics[1]}."
        )
        log_dict.update(
            crystal_num=len(self.ltm),
            unique_comps=len(self.ltm.unique_comps),
            burden=metrics[0],
            div_ratio=metrics[1],
            cost=self.cost,
        )

        penalty_strucs: list = []
        if self.div_filter:
            rewards, penalty_idx, tol_n, buff_n = self.ltm.div_filter(
                sample_struc, rewards, **self.df_args
            )
            penalty_strucs = [sample_struc[p] for p in penalty_idx]
            logging.info(f"Diversity filter: tol_n={tol_n}, buff_n={buff_n}")

        # top-k selection
        sort_idx = np.argsort(rewards)[::-1]
        topk_idx = sort_idx[: int(self.finetune_cfg["batch_size"] * self.topk_ratio)]
        sample_topk = [sample_list[i] for i in topk_idx]
        strucs_topk = [sample_struc[i] for i in topk_idx]
        reward_topk = rewards[topk_idx]

        # experience replay
        if self.replay is not None:
            if self.div_filter and len(penalty_strucs) > 0:
                self.replay.memory_purge(penalty_strucs)
            data_replay, reward_replay = self.replay.sample()
            ft_data = sample_topk + data_replay
            ft_reward = np.concatenate((reward_topk, reward_replay))
            self.replay.extend(sample_topk, strucs_topk, reward_topk)
            logging.info(f"replay buffer size={len(self.replay)}")
            if len(self.replay):
                logging.info(
                    f"buffer reward mean={self.replay.buffer['reward'].values.mean()}"
                )
        else:
            ft_data = sample_topk
            ft_reward = reward_topk

        logging.info("FINETUNE:")
        baseline = self.ltm.get_baseline(self.step)
        if len(ft_reward):
            baseline = min(baseline, ft_reward.min())
        with self.timer.phase("finetune"):
            if self.finetune_mode == "ddpo":
                # policy gradients over this iteration's recorded trajectories
                ddpo_stats = self.ft_step_ddpo(sample_list, rewards)
                log_dict.update(ddpo_stats or {})
            else:
                self.ft_step(ft_data, ft_reward, baseline)

        log_dict.update(self.timer.pop())
        if self.logger is not None:
            self.logger.log(log_dict, step=self.step)

        total_time = (time.time() - start_time) / 60
        logging.info(f"*****   LOOP {self.step} FINISH   *****")
        logging.info(f"Total time taken: {total_time:.2f} min.\n\n")

    def run_rl(self):
        logging.info("*****   RL START   *****")
        start_time = time.time()
        for step in range(self._start_step, self.rl_epoch):
            self.step = step
            if self.profile_dir and step == self._start_step:
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
            self.rl_step()
            if self._profiling and step + 1 >= self._start_step + self.profile_steps:
                jax.profiler.stop_trace()
                self._profiling = False
                logging.info(f"profiler trace written to {self.profile_dir}")
            # full-state snapshot every state_save_freq steps (LTM/replay
            # pickling grows with run length) and always on the final step
            if (step + 1) % self.state_save_freq == 0 or step + 1 == self.rl_epoch:
                self._save_state()
            if (step + 1) % self.save_freq == 0:
                ckpt_dir = os.path.join(self.models_dir, f"loop_{step:0>4d}")
                self.model_suite.save_model(self.agent_params, ckpt_dir)
        self.model_suite.save_model(self.agent_params, os.path.join(self.models_dir, "final"))
        logging.info("*****   RL END   *****")
        logging.info(f"Total time taken: {int(time.time() - start_time)} s.")
