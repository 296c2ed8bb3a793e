"""Full RL-run state checkpointing for true resume.

The reference checkpoints only agent weights (SURVEY.md §5: optimizer/replay/
LTM state are not saved; restart is manual). Here the complete run state —
agent params, RNG key, step counter, eval-cost, replay buffer and long-term
memory — round-trips, so a preempted RL run continues exactly where it
stopped.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np
from flax import serialization

STATE_FILE = "run_state.pkl"
PARAMS_FILE = "agent_params.msgpack"


def save_run_state(
    state_dir: str,
    params: Any,
    step: int,
    cost: int,
    key: jax.Array,
    replay_buffer=None,
    ltm=None,
    sampler=None,
) -> None:
    os.makedirs(state_dir, exist_ok=True)
    params_tmp = os.path.join(state_dir, PARAMS_FILE + ".tmp")
    with open(params_tmp, "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))
    os.replace(params_tmp, os.path.join(state_dir, PARAMS_FILE))
    sampler_state = None
    if sampler is not None:
        sampler_state = {
            "rng": sampler._rng.bit_generator.state,
            "key": np.asarray(jax.device_get(sampler._key)),
        }
    host_state = {
        "step": int(step),
        "cost": int(cost),
        "key": np.asarray(jax.device_get(key)),
        "replay_buffer": replay_buffer.buffer if replay_buffer is not None else None,
        "ltm_memory": ltm.memory if ltm is not None else None,
        "sampler": sampler_state,
    }
    tmp = os.path.join(state_dir, STATE_FILE + ".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(host_state, fh)
    os.replace(tmp, os.path.join(state_dir, STATE_FILE))


def load_run_state(state_dir: str, params_template: Any):
    """Returns (params, host_state dict) or None when no state exists."""
    state_path = os.path.join(state_dir, STATE_FILE)
    params_path = os.path.join(state_dir, PARAMS_FILE)
    if not (os.path.exists(state_path) and os.path.exists(params_path)):
        return None
    with open(params_path, "rb") as fh:
        params = serialization.from_bytes(params_template, fh.read())
    with open(state_path, "rb") as fh:
        host_state = pickle.load(fh)
    return params, host_state
