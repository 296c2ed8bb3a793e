"""Ingestion of published ALIGNN checkpoints into the JAX forward.

Covers both distribution formats the reference consumes:

* **HF folder layout** (``jwchen25/MatInvent`` ``prop_pred/alignn/<task>/``,
  /root/reference/rewards/calculators/alignn/prediction.py:277-301):
  ``best_model.pt`` = a raw ``state_dict`` + ``config.json`` with a
  ``"model"`` sub-dict (ALIGNNAtomWise config).
* **figshare zip layout** (prediction.py:209-274): a ``.zip`` containing
  ``config.json`` and ``best_model.pt``/``checkpoint_*.pt`` whose torch
  payload nests the state dict under the ``"model"`` key.

No downloading happens here (this environment has no egress): paths point
at files the user has already fetched. ``torch`` (CPU) deserializes;
parameters convert leaf-by-leaf to jnp arrays with their torch names
intact — the names ARE the architecture binding (see .model).

Atom input features: published checkpoints use the 92-dim CGCNN
``atom_init.json`` embedding table. That table is a distributed artifact
(ships with cgcnn/alignn), not a formula — it is looked up next to the
checkpoint, at ``$ALIGNN_ATOM_INIT``, or under this package; a missing
table is a clear error, not a silent fallback.
"""
from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from matinvent_tpu.rewards.calculators.alignn.model import (
    ALIGNNSpec,
    detect_norm_kind,
)


def _torch_load_cpu(data: bytes):
    import torch

    buf = io.BytesIO(data)
    try:
        return torch.load(buf, map_location="cpu", weights_only=True)
    except Exception:
        buf.seek(0)
        return torch.load(buf, map_location="cpu", weights_only=False)


def _to_state_dict(payload) -> dict:
    """Unwrap {'model': sd} / Lightning-style containers to a flat sd."""
    sd = payload
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        inner = sd["model"]
        # distinguish a state_dict under 'model' from a config blob
        if any(hasattr(v, "numpy") or isinstance(v, np.ndarray) for v in inner.values()):
            sd = inner
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        if hasattr(v, "numpy"):
            v = v.detach().cpu().numpy()
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = v
    return out


def find_atom_init(near: str | None = None) -> str | None:
    """Locate the CGCNN ``atom_init.json`` feature table."""
    candidates = []
    if near:
        base = near if os.path.isdir(near) else os.path.dirname(near)
        candidates.append(os.path.join(base, "atom_init.json"))
        candidates.append(os.path.join(os.path.dirname(base), "atom_init.json"))
    if os.environ.get("ALIGNN_ATOM_INIT"):
        candidates.append(os.environ["ALIGNN_ATOM_INIT"])
    candidates.append(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "atom_init.json")
    )
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_atom_table(path: str | None, n_features: int) -> np.ndarray:
    """[101, n_features] table indexed by atomic number.

    ``n_features == 1`` is the ``atom_features="atomic_number"`` mode (the
    raw Z); anything else requires the distributed embedding json
    ({"<Z>": [features...]})."""
    if n_features == 1:
        return np.arange(101, dtype=np.float32)[:, None]
    if path is None:
        raise FileNotFoundError(
            "ALIGNN checkpoints use the CGCNN atom_init.json embedding "
            "table (92-dim); place it next to the checkpoint, set "
            "$ALIGNN_ATOM_INIT, or pass atom_init= explicitly. The file "
            "ships with the cgcnn/alignn distributions the checkpoints "
            "come from."
        )
    with open(path) as fh:
        raw = json.load(fh)
    table = np.zeros((101, n_features), dtype=np.float32)
    for key, feats in raw.items():
        z = int(key)
        if 0 <= z <= 100:
            feats = np.asarray(feats, dtype=np.float32)
            if feats.shape[0] != n_features:
                raise ValueError(
                    f"atom_init.json provides {feats.shape[0]}-dim features; "
                    f"checkpoint expects {n_features}"
                )
            table[z] = feats
    return table


def load_alignn_checkpoint(
    path: str, atom_init: str | None = None
) -> Tuple[dict, ALIGNNSpec, np.ndarray]:
    """Load (params, spec, atom_table) from an HF folder, a figshare zip,
    or a bare ``.pt`` with a sibling ``config.json``."""
    if os.path.isdir(path):
        ckpt_file = None
        for name in ("best_model.pt", "last.pt", "model.pt"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                ckpt_file = cand
                break
        if ckpt_file is None:
            pts = sorted(f for f in os.listdir(path) if f.endswith(".pt"))
            if not pts:
                raise FileNotFoundError(f"no .pt checkpoint under {path}")
            ckpt_file = os.path.join(path, pts[0])
        with open(os.path.join(path, "config.json")) as fh:
            config = json.load(fh)
        with open(ckpt_file, "rb") as fh:
            payload = _torch_load_cpu(fh.read())
    elif path.endswith(".zip"):
        zp = zipfile.ZipFile(path)
        names = zp.namelist()
        cfg_name = next(n for n in names if n.endswith("config.json"))
        ckpt_name = None
        for n in names:
            if n.endswith("best_model.pt"):
                ckpt_name = n
        if ckpt_name is None:
            for n in names:
                if "checkpoint_" in n and n.endswith(("pt", "pth")):
                    ckpt_name = n  # last one wins, like the reference loop
        if ckpt_name is None:
            raise FileNotFoundError(f"no checkpoint member inside {path}")
        config = json.loads(zp.read(cfg_name))
        payload = _torch_load_cpu(zp.read(ckpt_name))
    else:  # bare .pt + sibling config.json
        with open(os.path.join(os.path.dirname(path), "config.json")) as fh:
            config = json.load(fh)
        with open(path, "rb") as fh:
            payload = _torch_load_cpu(fh.read())

    sd = _to_state_dict(payload)
    if "fc.weight" not in sd or "atom_embedding.layer.0.weight" not in sd:
        raise ValueError(
            f"{path} does not look like an ALIGNN/ALIGNNAtomWise state dict "
            f"(missing fc/atom_embedding keys); got e.g. "
            f"{sorted(sd)[:5]}"
        )
    model_cfg = config.get("model", config)
    # options whose semantics this forward does NOT implement: refuse loudly
    # instead of silently mispredicting (the whole point of this backend is
    # numerical fidelity to the checkpoint)
    unsupported = {
        "use_cutoff_function": False,
        "zero_inflated": False,
        "extra_features": 0,
        "lg_on_fly": None,  # graph-build choice, no numeric effect
    }
    for key, ok_value in unsupported.items():
        if ok_value is None:
            continue
        if key in model_cfg and model_cfg[key] not in (ok_value, None):
            raise ValueError(
                f"checkpoint config sets {key}={model_cfg[key]}, which this "
                f"native ALIGNN forward does not implement — refusing to "
                f"load rather than mispredict"
            )
    spec = ALIGNNSpec.from_model_config(model_cfg, detect_norm_kind(sd))

    # shape validation against the spec before anything silently broadcasts
    got_hidden = sd["fc.weight"].shape[1]
    if got_hidden != spec.hidden_features:
        raise ValueError(
            f"checkpoint hidden width {got_hidden} != config "
            f"hidden_features {spec.hidden_features}"
        )
    got_atom_in = sd["atom_embedding.layer.0.weight"].shape[1]
    if got_atom_in != spec.atom_input_features:
        raise ValueError(
            f"checkpoint atom_input_features {got_atom_in} != config "
            f"{spec.atom_input_features}"
        )

    params = {k: jnp.asarray(v) for k, v in sd.items()}
    table = load_atom_table(
        atom_init or find_atom_init(near=path), spec.atom_input_features
    )
    return params, spec, table
