"""Shared prototype-structure motifs + element pools for synthetic corpora.

Parity context: the reference fine-tunes models pretrained on MP-20/
Alex-MP-20 and ships no corpus generator (its data arrives through
pretrained checkpoints, /root/reference/models/suite/mattergen.py:54-92);
this module is the in-framework substitute that synthesizes plausible
ionic-crystal training corpora so every demo/predictor/eval workflow runs
without external downloads.

Single source of truth for the ionic-crystal motif geometries used by the
demo pretraining corpus (experiments/rl_demo.py), the predictor-training
corpus (tools/make_predictor_dataset.py), and the gen_eval reference
dataset (tools/make_reference_dataset.py) — previously three drifting
copies. Fractional coordinates per motif plus the (n_cations, n_anions)
split of the species list.
"""
from __future__ import annotations

import numpy as np

from matinvent_tpu.chem.data import OXIDATION_STATES, Z_BY_SYMBOL

MOTIFS: dict[str, tuple[np.ndarray, tuple[int, int]]] = {
    "rocksalt": (np.array([[0, 0, 0], [0.5, 0.5, 0.5]]), (1, 1)),
    "cscl": (np.array([[0, 0, 0], [0.5, 0.5, 0.5]]), (1, 1)),
    "fluorite": (
        np.array([[0, 0, 0], [0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]), (1, 2)
    ),
    "antifluorite": (
        np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.75], [0, 0, 0]]), (2, 1)
    ),
    "layered": (
        np.array([[0, 0, 0], [0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]]),
        (2, 2),
    ),
    "perovskite": (
        np.array(
            [[0, 0, 0], [0.5, 0.5, 0.5],
             [0.5, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]]
        ),
        (2, 3),
    ),
    "wurtzite-ish": (
        np.array(
            [[1 / 3, 2 / 3, 0.0], [2 / 3, 1 / 3, 0.5],
             [1 / 3, 2 / 3, 0.38], [2 / 3, 1 / 3, 0.88]]
        ),
        (2, 2),
    ),
}

# the 4-motif subset the clean demo corpus draws from
BASE_MOTIF_NAMES = ("rocksalt", "cscl", "fluorite", "layered")


def cation_pool(max_z: int = 83) -> list[int]:
    """Elements with a positive oxidation state (ionic-crystal cations)."""
    return [
        Z_BY_SYMBOL[s] for s, ox in OXIDATION_STATES.items()
        if s in Z_BY_SYMBOL and Z_BY_SYMBOL[s] <= max_z and any(o > 0 for o in ox)
    ]


def anion_pool(symbols=("O", "S", "Se", "F", "Cl", "Br", "N", "P")) -> list[int]:
    return [Z_BY_SYMBOL[s] for s in symbols]
