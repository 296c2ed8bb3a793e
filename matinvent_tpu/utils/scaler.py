"""Standard scaler for property/lattice normalization.

Parity with the reference's ``StandardScalerTorch``
(/root/reference/models/diffcsp/utils.py:882) used by the DiffCSP suite's
lattice/property scalers (models/suite/diffcsp.py:98-105).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class StandardScaler:
    def __init__(self, means=None, stds=None):
        self.means = None if means is None else jnp.asarray(means)
        self.stds = None if stds is None else jnp.asarray(stds)

    def fit(self, x) -> "StandardScaler":
        x = jnp.asarray(x)
        self.means = jnp.mean(x, axis=0)
        # reference fit uses unbiased=False (utils.py:892) + EPSILON
        self.stds = jnp.std(x, axis=0, ddof=0) + 1e-5
        return self

    def transform(self, x):
        return (jnp.asarray(x) - self.means) / self.stds

    def inverse_transform(self, x):
        return jnp.asarray(x) * self.stds + self.means

    def state_dict(self) -> dict:
        return {"means": np.asarray(self.means), "stds": np.asarray(self.stds)}

    @classmethod
    def from_state_dict(cls, state: dict) -> "StandardScaler":
        return cls(means=state["means"], stds=state["stds"])

    def copy(self) -> "StandardScaler":
        return StandardScaler(self.means, self.stds)
