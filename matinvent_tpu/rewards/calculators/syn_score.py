"""Synthesizability score: bagged MLP ensemble over composition embeddings.

Capability parity with /root/reference/rewards/calculators/syn_score/
(CGNF SynScore): per-element 90-dim embeddings, composition = count-weighted
mean embedding over the reduced formula (predict.py:15-35), a 2-layer
softplus MLP head Linear(90->180)+softplus+Linear(180->2)+log_softmax
(model.py:6-35), score = mean over a 100-model bagged ensemble of
P(synthesizable) (predict.py:38-87).

TPU-native: the whole ensemble is a single vmapped forward (one device call
instead of the reference's 100 sequential model loads/evals). Element
embeddings load from an ``element_emb.json`` (same format as the reference's)
when provided; otherwise a deterministic fallback featurizer (normalized
element descriptors tiled to 90 dims) keeps the pipeline runnable. Ensemble
weights load from a stacked ``.npz``, a directory of torch ``.pth.tar`` bags,
or random initialization (testing).
"""
from __future__ import annotations

import json
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matinvent_tpu.chem.data import (
    ATOMIC_WEIGHTS,
    ELECTRONEGATIVITY,
    OXIDATION_STATES,
    SYMBOLS,
)
from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.rewards.calculators.base import Calculator

EMB_DIM = 90
HID_DIM = 180


def _fallback_element_embedding(symbol: str) -> np.ndarray:
    """Deterministic 90-dim element descriptor used when no learned
    ``element_emb.json`` is supplied: simple normalized properties expanded
    with fixed random projections (seeded by atomic number)."""
    z = SYMBOLS.index(symbol) if symbol in SYMBOLS else 0
    base = np.array(
        [
            z / 100.0,
            ATOMIC_WEIGHTS.get(symbol, 0.0) / 250.0 if np.isfinite(
                ATOMIC_WEIGHTS.get(symbol, np.nan)
            ) else 0.0,
            ELECTRONEGATIVITY.get(symbol, 0.0) / 4.0,
            len(OXIDATION_STATES.get(symbol, [])) / 8.0,
        ]
    )
    rng = np.random.default_rng(z)
    proj = rng.standard_normal((EMB_DIM, len(base))) / np.sqrt(len(base))
    return proj @ base


class SynScore(Calculator):
    def __init__(
        self,
        root_dir: str,
        task: str = "syn_score",
        emb_path: str | None = None,
        model_path: str | None = None,
        n_models: int = 100,
        seed: int = 0,
    ) -> None:
        super().__init__(root_dir, task)
        self.n_models = n_models
        self._emb = self._load_embeddings(emb_path)
        # ``trained`` is flipped by _load_ensemble when real weights load;
        # consumers (e.g. OptFilter's synthesizability screen) use it to
        # refuse to gate on random-init scores silently.
        self.trained = False
        self._params = self._load_ensemble(model_path, seed)

    # ------------------------------------------------------------- embeddings
    def _load_embeddings(self, emb_path: str | None) -> dict[str, np.ndarray]:
        if emb_path and os.path.exists(emb_path):
            with open(emb_path) as fh:
                raw = json.load(fh)
            return {k: np.asarray(v, dtype=np.float64) for k, v in raw.items()}
        return {s: _fallback_element_embedding(s) for s in SYMBOLS[1:]}

    def comp_embedding(self, struc: Structure) -> np.ndarray:
        """Count-weighted mean element embedding over the reduced formula."""
        red = struc.composition.reduced_counts
        emb = np.zeros(EMB_DIM)
        num = 0.0
        for el, n in red.items():
            if el not in self._emb:
                return np.full(EMB_DIM, np.nan)
            emb += self._emb[el] * n
            num += n
        return emb / max(num, 1.0)

    # --------------------------------------------------------------- ensemble
    def _load_ensemble(self, model_path: str | None, seed: int) -> dict:
        """Stacked params: w1 [E,90,180] b1 [E,180] w2 [E,180,2] b2 [E,2]."""
        if model_path is None:
            # in-repo default ensemble (tools/train_syn_score.py output) —
            # mirrors the reference shipping trained bags under
            # rewards/calculators/syn_score/
            default = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "weights",
                "syn_score.npz",
            )
            if os.path.isfile(default):
                model_path = default
        if model_path and os.path.isdir(model_path):
            pths = sorted(
                f for f in os.listdir(model_path) if f.endswith(".pth.tar")
            )
            if pths:
                import torch

                w1, b1, w2, b2 = [], [], [], []
                for f in pths[: self.n_models]:
                    sd = torch.load(
                        os.path.join(model_path, f), map_location="cpu",
                        weights_only=False,
                    )["state_dict"]
                    w1.append(np.asarray(sd["cgnf_to_fc.weight"]).T)
                    b1.append(np.asarray(sd["cgnf_to_fc.bias"]))
                    w2.append(np.asarray(sd["fc_out.weight"]).T)
                    b2.append(np.asarray(sd["fc_out.bias"]))
                self.trained = True
                return {
                    "w1": jnp.asarray(np.stack(w1)),
                    "b1": jnp.asarray(np.stack(b1)),
                    "w2": jnp.asarray(np.stack(w2)),
                    "b2": jnp.asarray(np.stack(b2)),
                }
        if model_path and os.path.isfile(model_path):
            data = np.load(model_path)
            self.trained = True
            return {k: jnp.asarray(data[k]) for k in ("w1", "b1", "w2", "b2")}
        rng = np.random.default_rng(seed)
        E = self.n_models
        return {
            "w1": jnp.asarray(rng.standard_normal((E, EMB_DIM, HID_DIM)) * 0.05),
            "b1": jnp.zeros((E, HID_DIM)),
            "w2": jnp.asarray(rng.standard_normal((E, HID_DIM, 2)) * 0.05),
            "b2": jnp.zeros((E, 2)),
        }

    @staticmethod
    @jax.jit
    def _ensemble_forward(params: dict, x: jax.Array) -> jax.Array:
        """x [B,90] -> mean over ensemble of P(class 1) [B]."""

        def one_model(w1, b1, w2, b2):
            h = jax.nn.softplus(x @ w1 + b1)
            logits = h @ w2 + b2
            return jax.nn.softmax(logits, axis=-1)[:, 1]

        probs = jax.vmap(one_model)(
            params["w1"], params["b1"], params["w2"], params["b2"]
        )  # [E, B]
        return jnp.mean(probs, axis=0)

    # ------------------------------------------------------------------- calc
    def calc(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> np.ndarray:
        structures = samples[0]
        if not structures:
            return np.array([])
        embs = np.stack([self.comp_embedding(s) for s in structures])
        nan_mask = np.isnan(embs).any(axis=1)
        embs_safe = np.nan_to_num(embs, nan=0.0)
        scores = np.asarray(
            self._ensemble_forward(self._params, jnp.asarray(embs_safe, jnp.float32))
        ).astype(float)
        scores[nan_mask] = np.nan
        self.save_results(scores, label)
        return scores
