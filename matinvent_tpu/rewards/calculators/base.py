"""Calculator ABC (parity with /root/reference/rewards/calculators/base.py:4-16).

Calculators are host-side, gradient-free property estimators. They receive
``samples = (structures, xyz_path)`` — the in-memory Structure list plus the
extxyz interchange file path — and return one float per structure with NaN
marking failures (the pipeline's failed-mask contract, rewards/reward.py:60-66).
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from matinvent_tpu.chem.structure import Structure


class Calculator:
    def __init__(self, root_dir: str, task: str) -> None:
        self.root_dir = root_dir
        self.task = task
        os.makedirs(self.root_dir, exist_ok=True)

    def calc(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> np.ndarray:
        raise NotImplementedError

    def save_results(self, results: np.ndarray, label: str) -> str:
        out_path = os.path.abspath(os.path.join(self.root_dir, f"{label}.txt"))
        np.savetxt(out_path, results, fmt="%.8f")
        return out_path
