"""RL pipeline base class (parity with /root/reference/pipeline/base.py:26-143).

Holds the model suite, reward, long-term memory, replay buffer, save dirs and
eval-cost counter; merges suite-level sample/finetune configs with pipeline
overrides; ``reward_step`` scores, drops failed samples and logs stats.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.memory.ltm import LongTimeMem
from matinvent_tpu.memory.replay_buffer import ReplayBuffer
from matinvent_tpu.pipeline.logger import Logger, PhaseTimer
from matinvent_tpu.rewards.reward import Reward


def _merge_cfg(base: dict | None, override: dict | None) -> dict:
    out = dict(base or {})
    for k, v in (override or {}).items():
        out[k] = v
    return out


class ReinL:
    def __init__(
        self,
        rl_epoch: int,
        model_suite,
        reward: Reward,
        sample_cfg: dict,
        finetune_cfg: dict,
        save_dir: str,
        save_freq: int,
        logger: Logger | None = None,
        replay: bool = False,
        replay_args: Dict | None = None,
        seed: int = 0,
        **kwargs,
    ) -> None:
        self.rl_epoch = rl_epoch
        self.model_suite = model_suite
        self.reward = reward
        self.save_dir = save_dir
        self.save_freq = save_freq
        self.logger = logger
        self.seed = seed
        self.cfg = dict(kwargs)
        self.step = 0
        self.cost = 0
        self.timer = PhaseTimer()

        self.sample_cfg = _merge_cfg(model_suite.sample_cfg, sample_cfg)
        self.finetune_cfg = _merge_cfg(model_suite.finetune_cfg, finetune_cfg)

        self.sampler = model_suite.get_sampler()

        self.ltm = LongTimeMem()

        self.models_dir = os.path.join(save_dir, "models")
        self.sample_dir = os.path.join(save_dir, "samples")
        os.makedirs(self.models_dir, exist_ok=True)
        os.makedirs(self.sample_dir, exist_ok=True)

        self.replay = ReplayBuffer(**(replay_args or {})) if replay else None

    def reward_step(
        self,
        sample_data: list,
        sample_struc: List[Structure],
        xyz_path: str,
        label: str = "tmp",
    ):
        rewards, prop_dict, failed_mask = self.reward.scoring(
            (sample_struc, xyz_path), label
        )
        self.cost += len(sample_struc)

        success_rewards = rewards[~failed_mask].astype(float)
        success_prop_dict = {k: v[~failed_mask] for k, v in prop_dict.items()}
        success_data = [d for d, f in zip(sample_data, failed_mask) if not f]
        success_struc = [s for s, f in zip(sample_struc, failed_mask) if not f]

        logging.info(f"Evaluation costs to date: {self.cost}")
        logging.info(
            f"Number of samples that successfully obtained rewards: {len(success_struc)}"
        )
        if len(success_rewards):
            logging.info(
                f"reward mean={success_rewards.mean():.4f} std={success_rewards.std():.4f}"
            )
            logging.info(
                " | ".join(
                    f"{k} mean={v.mean():.4f} std={v.std():.4f}"
                    for k, v in success_prop_dict.items()
                )
            )
        return success_data, success_struc, success_rewards, success_prop_dict

    def load_model(self):
        raise NotImplementedError

    def sample_step(self):
        raise NotImplementedError

    def ft_step(self, data_list, rewards, baseline):
        raise NotImplementedError

    def rl_step(self):
        raise NotImplementedError

    def run_rl(self):
        raise NotImplementedError
