"""Long-term memory (parity with /root/reference/memory/ltm.py:8-169).

Append-only record of every scored crystal; Augmented-Hill-Climb diversity
filter (occurrence-count reward decay); Burden + Diversity-Ratio metrics;
moving-average reward baseline; CSV dump with CIFs as the audit trail.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd

from matinvent_tpu.chem.structure import Structure


class LongTimeMem:
    def __init__(self) -> None:
        self.memory = pd.DataFrame(
            columns=["struc", "comp", "ele_comb", "reward", "RL_step"]
        )
        self.unique_comps: np.ndarray | list = []

    def extend(self, strucs: List[Structure], rewards: np.ndarray, step: int) -> None:
        comps = [s.composition.reduced_formula for s in strucs]
        ele_comb = [tuple(sorted(set(s.composition.elements))) for s in strucs]
        df_sample = pd.DataFrame(
            {
                "struc": strucs,
                "comp": comps,
                "ele_comb": ele_comb,
                "reward": np.asarray(rewards, dtype=float),
                "RL_step": [step] * len(strucs),
            }
        )
        self.memory = (
            pd.concat([self.memory, df_sample]) if len(self.memory) else df_sample
        )
        self.unique_comps = self.memory["comp"].unique()

    def div_filter(
        self,
        strucs: List[Structure],
        rewards: np.ndarray,
        tol: int = 10,
        buff: int = 20,
        method: str = "composition",
        **kwargs,
    ) -> Tuple[np.ndarray, list, int, int]:
        """Augmented-Hill-Climb reward decay (ltm.py:65-109; AHC paper
        doi:10.1186/s13321-022-00646-z). Occurrence <= tol keeps the reward,
        tol < occ < buff decays linearly, occ >= buff zeroes it (penalty)."""
        assert tol < buff
        if method == "composition":
            key = "comp"
            values = [s.composition.reduced_formula for s in strucs]
        elif method == "element_comb":
            key = "ele_comb"
            values = [tuple(sorted(set(s.composition.elements))) for s in strucs]
        else:
            raise ValueError(f"unknown div_filter method {method}")

        occ_counts = self.memory[key].value_counts()
        new_rewards, penalty_idx = [], []
        tol_n = buff_n = 0
        for i, v in enumerate(values):
            occ = int(occ_counts.get(v, 0))
            if occ <= tol:
                new_rewards.append(float(rewards[i]))
            elif occ < buff:
                new_rewards.append(float(rewards[i]) * (buff - occ) / (buff - tol))
                tol_n += 1
            else:
                new_rewards.append(0.0)
                penalty_idx.append(i)
                buff_n += 1
        return np.array(new_rewards), penalty_idx, tol_n, buff_n

    def calc_metrics(
        self,
        thred: float,
        budget: int = 3000,
        num_candidate: int = 100,
    ) -> Tuple[float | None, float | None]:
        """Burden (evals per above-threshold unique candidate once
        >= num_candidate found) and Diversity Ratio (unique comps per eval
        within budget) — ltm.py:111-134 parity."""
        _df = self.memory.sort_values("reward", ascending=False)
        unique_df = _df.drop_duplicates(subset=["comp"])
        candidates = int((unique_df["reward"] > thred).sum())
        calc_cost = len(self.memory)
        burden = calc_cost / candidates if candidates >= num_candidate else None
        div_ratio = (
            len(self.unique_comps) / calc_cost if calc_cost <= budget and calc_cost > 0 else None
        )
        return burden, div_ratio

    def get_baseline(self, step: int, prev: int = 3) -> float:
        sel = self.memory[self.memory["RL_step"] > step - prev]["reward"]
        return float(sel.mean()) if len(sel) else float("nan")

    def deduplicate(self, df: pd.DataFrame, method: str = "composition") -> pd.DataFrame:
        if method == "composition":
            return df.sort_values("reward", ascending=False).drop_duplicates(subset=["comp"])
        raise ValueError(f"unknown dedup method {method}")

    def save(self, save_path: str) -> None:
        df = self.memory.copy()
        df["cif"] = [s.to_cif() for s in df["struc"].values]
        df.to_csv(save_path, index=False, quoting=1)

    def __len__(self) -> int:
        return len(self.memory)
