"""MatterGen-class checkpoint conversion: linen params <-> torch state_dict.

The reference saves RL checkpoints as ``{"state_dict": ..., "config": ...} ->
last.ckpt`` (/root/reference/models/suite/mattergen.py:120-131) and loads
pretrained ones through ``MatterGenCheckpointInfo`` (:54-92). This module
provides the equivalent container bridge for the TPU build: a deterministic
name mapping between our flax parameter tree and a torch-style flat
state_dict, so checkpoints round-trip between the native msgpack format and
the reference's torch container.

Scope note (by design, PARITY.md): the mapping covers *this framework's*
MatterGen-class score network (dense masked message passing). The published
MatterGen checkpoints wrap a GemNet-style torch network whose architecture
this framework intentionally does not replicate — those weights cannot be
linearly mapped onto a different architecture; ``detect_gemnet`` recognizes
them and the converter raises a clear error pointing at the distillation
tool (tools/distill_mattergen.py).

Naming rules (torch conventions):
  {...}.kernel      -> {...}.weight   (transposed: linen [in,out] vs torch [out,in])
  {...}.scale       -> {...}.weight   (LayerNorm)
  {...}.bias        -> {...}.bias
  {...}.embedding   -> {...}.weight   (nn.Embedding layout matches; no transpose)
  {...}X_kernel     -> {...}X.weight  (fused-kernel leaves, transposed)
  {...}X_bias       -> {...}X.bias
  anything else     -> verbatim path  (e.g. learned null-condition embeddings)
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

GEMNET_MARKERS = ("gemnet", "int_blocks", "out_blocks", "mlp_rbf", "atom_emb")


def detect_gemnet(state_dict: Dict[str, Any]) -> bool:
    """True when a state_dict belongs to the external GemNet-style MatterGen."""
    return any(any(m in k for m in GEMNET_MARKERS) for k in state_dict)


def _leaf_name_and_transpose(path: tuple[str, ...]) -> tuple[str, bool]:
    *parents, last = path
    if last == "kernel":
        return ".".join([*parents, "weight"]), True
    if last == "scale":
        return ".".join([*parents, "weight"]), False
    if last == "bias":
        return ".".join([*parents, "bias"]), False
    if last == "embedding":
        return ".".join([*parents, "weight"]), False
    if last.endswith("_kernel"):
        return ".".join([*parents, last[: -len("_kernel")], "weight"]), True
    if last.endswith("_bias"):
        return ".".join([*parents, last[: -len("_bias")], "bias"]), False
    return ".".join([*parents, last]), False


def _iter_leaves(params: Any):
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        # drop the top-level linen 'params' collection key
        if keys and keys[0] == "params":
            keys = keys[1:]
        yield keys, leaf


def mattergen_state_dict_from_params(
    params: Any, prefix: str = "decoder."
) -> Dict[str, np.ndarray]:
    """Export our linen param tree as a torch-style flat state_dict."""
    sd: Dict[str, np.ndarray] = {}
    for keys, leaf in _iter_leaves(params):
        name, transpose = _leaf_name_and_transpose(keys)
        arr = np.asarray(leaf, dtype=np.float32)
        sd[prefix + name] = arr.T if transpose else arr
    return sd


def mattergen_params_from_state_dict(
    state_dict: Dict[str, Any], template: Any, prefix: str = "decoder."
) -> Any:
    """Rebuild a linen param tree from a torch-style state_dict.

    ``template`` (a freshly initialized param tree) defines the structure;
    every leaf is fetched by its deterministic torch name. Raises KeyError
    listing missing names, and ValueError on shape mismatches or GemNet
    checkpoints.
    """
    if detect_gemnet(state_dict):
        raise ValueError(
            "this checkpoint contains a GemNet-style MatterGen network "
            "(external `mattergen` package weights). The TPU framework's "
            "score network is a different architecture by design; weights "
            "cannot be mapped 1:1. Distill instead: "
            "`python tools/distill_mattergen.py teacher=<last.ckpt> "
            "corpus=<data.extxyz> out=<dir>` trains this network to match "
            "the torch model's per-field scores across the time grid and "
            "verifies the match on held-out noised batches (see that tool's "
            "docstring; published GemNet checkpoints need the `mattergen` "
            "wheel or a custom builder= teacher constructor)."
        )
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    missing = []
    for path, leaf in flat:
        keys = tuple(p.key if hasattr(p, "key") else str(p.idx) for p in path)
        if keys and keys[0] == "params":
            keys = keys[1:]
        name, transpose = _leaf_name_and_transpose(keys)
        full = prefix + name
        if full not in state_dict:
            missing.append(full)
            leaves.append(leaf)
            continue
        arr = np.asarray(state_dict[full], dtype=np.float32)
        if transpose:
            arr = arr.T
        if arr.shape != leaf.shape:
            raise ValueError(
                f"{full}: checkpoint shape {arr.shape} != model shape "
                f"{leaf.shape} — model_cfg (hidden_dim/num_layers/"
                f"condition_fields) must match the checkpoint's config"
            )
        leaves.append(arr)
    if missing:
        raise KeyError(
            f"{len(missing)} parameters missing from checkpoint, e.g. "
            f"{missing[:5]}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)
