"""Per-compile XLA DebugOptions for the hot jitted entry points.

The reference tunes nothing at this layer (its CUDA kernels come
pre-scheduled from torch wheels); on TPU the XLA scheduler IS the knob.
``MATINVENT_XLA_OPTS`` carries a comma-separated ``key=value`` list that
is forwarded verbatim to ``jax.jit(compiler_options=...)`` on the hot
jitted entry points — the sampling scans (MatterGenDiffusion.sample /
sample_bucketed, DiffCSPDiffusion.sample) and the finetune/pretrain
updates (parallel/train.py, parallel/pretrain.py) — e.g.::

    MATINVENT_XLA_OPTS=xla_tpu_enable_latency_hiding_scheduler=true \
        python bench.py

Passing options per-compile works through the axon relay, unlike
``XLA_FLAGS`` which the CPU-side client rejects for TPU-only flags
(experiments/compiler_flags_ab.py is the on-chip A/B harness).

Read once at import: the value participates in jit decorators evaluated
at class-definition time, and a mid-process change would silently split
the compile cache anyway.
"""
from __future__ import annotations

import os


def compiler_options() -> dict[str, str] | None:
    """Parse MATINVENT_XLA_OPTS into a jit ``compiler_options`` dict."""
    spec = os.environ.get("MATINVENT_XLA_OPTS", "").strip()
    if not spec:
        return None
    out: dict[str, str] = {}
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"MATINVENT_XLA_OPTS entries must be key=value, got {item!r}"
            )
        k, v = item.split("=", 1)
        out[k.strip()] = v.strip()
    return out or None


try:
    COMPILER_OPTIONS = compiler_options()
except ValueError as e:
    # parsed at import time (see module docs), so a malformed value would
    # otherwise surface as a bare traceback from whatever entry point first
    # imports the models — name the knob and the expected format instead
    raise ValueError(
        "invalid MATINVENT_XLA_OPTS environment variable; expected a "
        f"comma-separated key=value list ({e})"
    ) from None
