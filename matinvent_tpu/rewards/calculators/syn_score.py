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


# period boundaries: max Z of each period (H..Og)
_PERIOD_EDGES = (2, 10, 18, 36, 54, 86, 118)


def _fallback_element_embedding(symbol: str) -> np.ndarray:
    """Deterministic 90-dim element descriptor used when no learned
    ``element_emb.json`` is supplied.

    Structured, not random-projected: charge balance — the dominant
    synthesizability signal at composition level — is a function of counts x
    allowed oxidation states, so the descriptor devotes explicit dims to an
    oxidation-state multi-hot (-5..+8), a period one-hot, and normalized
    scalar properties. A count-weighted mean of these stays informative for
    the balanced/unbalanced decision the SynScore ensemble learns."""
    z = SYMBOLS.index(symbol) if symbol in SYMBOLS else 0
    w = ATOMIC_WEIGHTS.get(symbol, np.nan)
    scalars = np.array(
        [
            z / 100.0,
            w / 250.0 if np.isfinite(w) else 0.0,
            ELECTRONEGATIVITY.get(symbol, 0.0) / 4.0,
            len(OXIDATION_STATES.get(symbol, [])) / 8.0,
        ]
    )
    ox = np.zeros(14)  # oxidation states -5..+8
    states = OXIDATION_STATES.get(symbol, ())
    for o in states:
        if -5 <= o <= 8:
            ox[o + 5] = 1.0
    ox_stats = np.array(
        [
            min(states) / 5.0 if states else 0.0,
            max(states) / 8.0 if states else 0.0,
            1.0 if any(o > 0 for o in states) else 0.0,
            1.0 if any(o < 0 for o in states) else 0.0,
        ]
    )
    period = np.zeros(7)
    for p, edge in enumerate(_PERIOD_EDGES):
        if z <= edge:
            period[p] = 1.0
            break
    out = np.zeros(EMB_DIM)
    feats = np.concatenate([scalars, ox, ox_stats, period])  # 29 dims
    out[: len(feats)] = feats
    # remaining dims: fixed projection of the structured features (seeded by
    # atomic number) — gives bags independent views without losing signal
    rng = np.random.default_rng(z)
    proj = rng.standard_normal((EMB_DIM - len(feats), len(feats)))
    out[len(feats):] = (proj @ feats) / np.sqrt(len(feats))
    return out


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
