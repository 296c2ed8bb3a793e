"""Reward aggregator (parity with /root/reference/rewards/reward.py:8-115).

Per-property calculators -> NaN-to-zero props + failed mask -> linear scaling
to [0, 1] (ascending / descending / float-target modes) -> mean / min /
weighted-sum reduce -> zero reward on failed samples.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from matinvent_tpu.chem.structure import Structure


def linear_scaling(values: np.ndarray, minv: float = 0.0, maxv: float = 6.0) -> np.ndarray:
    ss = (values - minv) / (maxv - minv)
    return np.clip(ss, 0.0, 1.0)


class Reward:
    """Scores a batch of structures against one or more property targets.

    ``prop_cfg`` is a list of dicts/config-nodes with keys:
    ``name``, ``calculator`` (a Calculator instance), ``target``
    ('ascending' | 'descending' | float), ``minv``, ``maxv`` and optional
    ``weight`` (for reduce='weight').
    """

    def __init__(
        self,
        root_dir: str,
        prop_cfg: Sequence[Any],
        reward_threshold: float,
        reduce: str = "mean",
        **kwargs,
    ) -> None:
        assert reduce in ["mean", "min", "weight"]
        self.root_dir = root_dir
        self.prop_cfg = list(prop_cfg)
        self.threshold = reward_threshold
        self.reduce = reduce
        self.cfg = dict(kwargs)
        os.makedirs(self.root_dir, exist_ok=True)

    @staticmethod
    def _get(cfg, key, default=None):
        if isinstance(cfg, dict):
            return cfg.get(key, default)
        return getattr(cfg, key, default)

    def calc_props(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> tuple[Dict[str, np.ndarray], np.ndarray]:
        prop_dict, prop_list = {}, []
        for cfg in self.prop_cfg:
            calculator = self._get(cfg, "calculator")
            raw = np.asarray(calculator.calc(samples, label), dtype=float)
            prop_list.append(raw)
            prop_dict[self._get(cfg, "name")] = np.nan_to_num(raw, nan=0.0)
        prop_arr = np.array(prop_list)
        failed_mask = np.isnan(prop_arr).any(axis=0)
        return prop_dict, failed_mask

    def scoring(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> tuple[np.ndarray, Dict[str, np.ndarray], np.ndarray]:
        prop_dict, failed_mask = self.calc_props(samples, label)

        scaled: Dict[str, np.ndarray] = {}
        for cfg in self.prop_cfg:
            name = self._get(cfg, "name")
            target = self._get(cfg, "target")
            minv = float(self._get(cfg, "minv"))
            maxv = float(self._get(cfg, "maxv"))
            if target == "ascending":
                s = linear_scaling(prop_dict[name], minv=minv, maxv=maxv)
            elif target == "descending":
                s = linear_scaling(-prop_dict[name], minv=-maxv, maxv=-minv)
            elif isinstance(target, (int, float)):
                diff = np.abs(prop_dict[name] - float(target))
                s = linear_scaling(-diff, minv=-maxv, maxv=-minv)
            else:
                raise TypeError(
                    "prop cfg target must be a float or 'descending' or 'ascending'"
                )
            scaled[name] = s

        if self.reduce == "mean":
            rewards = np.mean(np.array(list(scaled.values())), axis=0)
        elif self.reduce == "min":
            rewards = np.min(np.array(list(scaled.values())), axis=0)
        else:  # weight
            arr = np.array(
                [
                    scaled[self._get(cfg, "name")] * float(self._get(cfg, "weight", 1.0))
                    for cfg in self.prop_cfg
                ]
            )
            rewards = arr.sum(axis=0)

        rewards = np.asarray(rewards, dtype=float)
        rewards[failed_mask] = 0.0
        return rewards, prop_dict, failed_mask
