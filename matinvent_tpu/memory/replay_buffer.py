"""Experience replay buffer (parity with /root/reference/memory/replay_buffer.py:11-104).

Keeps the top-K highest-reward crystals so far, deduplicated by reduced
formula, with random sampling per RL step, a reward cutoff, and purge of
diversity-penalized compositions. ``data`` entries are the model-side
per-crystal payloads (padded-batch dicts), ``struc`` the chem-layer Structures.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import numpy as np
import pandas as pd

from matinvent_tpu.chem.structure import Structure


def _comp_keys(strucs: List[Structure]) -> tuple[list[str], list[tuple]]:
    comps = [s.composition.reduced_formula for s in strucs]
    ele_comb = [tuple(sorted(set(s.composition.elements))) for s in strucs]
    return comps, ele_comb


class ReplayBuffer:
    def __init__(
        self,
        buffer_size: int = 100,
        sample_size: int = 8,
        reward_cutoff: float = 0.0,
        seed: int | None = None,
    ) -> None:
        self.buffer_size = buffer_size
        self.sample_size = sample_size
        self.reward_cutoff = reward_cutoff
        self._rng = np.random.default_rng(seed)
        self.buffer = pd.DataFrame(
            columns=["data", "struc", "comp", "ele_comb", "reward"]
        )

    def extend(
        self,
        data: List[Any],
        strucs: List[Structure],
        rewards: np.ndarray,
    ) -> None:
        if len(data) == 0:
            return
        comps, ele_comb = _comp_keys(strucs)
        df_new = pd.DataFrame(
            {
                "data": data,
                "struc": strucs,
                "comp": comps,
                "ele_comb": ele_comb,
                "reward": np.asarray(rewards, dtype=float),
            }
        )
        df_all = pd.concat([self.buffer, df_new]) if len(self.buffer) else df_new
        unique = self.deduplicate(df_all)
        self.buffer = unique.sort_values("reward", ascending=False).head(self.buffer_size)
        self.buffer = self.buffer.loc[self.buffer["reward"] > self.reward_cutoff]

    @staticmethod
    def deduplicate(df: pd.DataFrame, method: str = "composition") -> pd.DataFrame:
        _df = df.sort_values("reward", ascending=False)
        key = "comp" if method == "composition" else "ele_comb"
        return _df.drop_duplicates(subset=[key])

    def sample(self) -> Tuple[List[Any], np.ndarray]:
        n = min(len(self.buffer), self.sample_size)
        if n == 0:
            return [], np.array([])
        sampled = self.buffer.sample(n, random_state=int(self._rng.integers(2**31)))
        return sampled["data"].values.tolist(), sampled["reward"].values.astype(float)

    def memory_purge(self, strucs: List[Structure]) -> None:
        comps = [s.composition.reduced_formula for s in strucs]
        self.buffer = self.buffer[~self.buffer["comp"].isin(comps)]

    def __len__(self) -> int:
        return len(self.buffer)
