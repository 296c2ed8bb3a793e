"""ALIGNN forward pass in JAX over a torch-named parameter dict.

Implements the published ALIGNN / ALIGNNAtomWise architecture (usnistgov
alignn — the model class the reference instantiates at
/root/reference/rewards/calculators/alignn/prediction.py:265,300) so that
published checkpoints load verbatim: the parameter container IS the torch
``state_dict`` (keys like ``alignn_layers.0.node_update.src_gate.weight``),
converted leaf-by-leaf to jnp arrays with no renaming. Equations follow the
ALIGNN paper (npj Comput. Mater. 7, 185 (2021)) and its reference code:

* ``MLPLayer`` = Linear -> norm -> SiLU  (norm = BatchNorm1d in published
  checkpoints — eval-mode running stats — or LayerNorm in newer variants;
  detected from the state dict, see ``detect_norm_kind``).
* ``EdgeGatedGraphConv`` (Dwivedi et al. benchmarking-GNNs gated graph
  conv, residual):
      m_e   = src_gate(x_u) + dst_gate(x_v) + edge_gate(y_e)
      sigma = logistic(m_e)
      h_v   = sum_{e=(u->v)} sigma_e * dst_update(x_u) / (sum sigma_e + 1e-6)
      x'    = x + SiLU(norm(src_update(x) + h))
      y'    = y + SiLU(norm(m))
* ``ALIGNNConv`` = EdgeGatedGraphConv on the atom graph (updates x, y)
  followed by EdgeGatedGraphConv on the line graph (updates y, z).
* ``RBFExpansion`` with the reference code's gamma = 1/mean(diff(centers))
  quirk (NOT 1/lengthscale^2 — the published default path).
* average-pool readout -> ``fc`` -> optional inverse link (exp for the
  "log" link, logistic for "logit").

All matmuls pin ``Precision.HIGHEST`` — this is a reward-side predictor
whose claim is numerical fidelity to the torch checkpoint, not throughput.

Offline-verification note: the alignn/dgl packages are not installable in
this environment, so parity is established by construction (state-dict
naming + published equations) and by an independent NumPy oracle test
(tests/test_alignn_native.py), not by executing the upstream model.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from matinvent_tpu.rewards.calculators.alignn.graphs import ALIGNNBatch

_PREC = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class ALIGNNSpec:
    """The ``config["model"]`` fields that shape the forward pass."""

    alignn_layers: int = 4
    gcn_layers: int = 4
    atom_input_features: int = 92
    edge_input_features: int = 80
    triplet_input_features: int = 40
    embedding_features: int = 64
    hidden_features: int = 256
    output_features: int = 1
    link: str = "identity"
    classification: bool = False
    norm_kind: str = "batchnorm"  # "batchnorm" | "layernorm" (from state dict)

    @classmethod
    def from_model_config(cls, cfg: dict, norm_kind: str) -> "ALIGNNSpec":
        known = {
            k: cfg[k]
            for k in (
                "alignn_layers", "gcn_layers", "atom_input_features",
                "edge_input_features", "triplet_input_features",
                "embedding_features", "hidden_features", "output_features",
                "link", "classification",
            )
            if k in cfg
        }
        return cls(norm_kind=norm_kind, **known)


def detect_norm_kind(state_dict) -> str:
    return (
        "batchnorm"
        if any(k.endswith("running_mean") for k in state_dict)
        else "layernorm"
    )


def _linear(p, name, x):
    return (
        jnp.matmul(x, p[f"{name}.weight"].T, precision=_PREC) + p[f"{name}.bias"]
    )


def _norm(p, name, x, kind):
    if kind == "batchnorm":  # eval mode: running statistics
        mean = p[f"{name}.running_mean"]
        var = p[f"{name}.running_var"]
        inv = jax.lax.rsqrt(var + 1e-5)
        return (x - mean) * inv * p[f"{name}.weight"] + p[f"{name}.bias"]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    sig = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(sig + 1e-5)
    return xn * p[f"{name}.weight"] + p[f"{name}.bias"]


def _mlp_layer(p, name, x, kind):
    """MLPLayer: Linear -> norm -> SiLU (keys ``<name>.layer.{0,1}``)."""
    return jax.nn.silu(_norm(p, f"{name}.layer.1", _linear(p, f"{name}.layer.0", x), kind))


def _rbf(p, name, x, vmin, vmax, bins):
    centers = p.get(f"{name}.centers")
    if centers is None:  # older checkpoints without the registered buffer
        centers = jnp.linspace(vmin, vmax, bins)
    gamma = 1.0 / ((vmax - vmin) / (bins - 1))  # reference-code quirk
    return jnp.exp(-gamma * (x[:, None] - centers[None, :]) ** 2)


def _edge_gated_conv(p, name, x, y, src, dst, edge_mask, num_nodes, kind):
    """One EdgeGatedGraphConv step on a flat padded edge list."""
    m = (
        _linear(p, f"{name}.src_gate", x)[src]
        + _linear(p, f"{name}.dst_gate", x)[dst]
        + _linear(p, f"{name}.edge_gate", y)
    )
    sigma = jax.nn.sigmoid(m) * edge_mask[:, None]
    bh = _linear(p, f"{name}.dst_update", x)[src]
    sum_sigma_h = jax.ops.segment_sum(sigma * bh, dst, num_segments=num_nodes)
    sum_sigma = jax.ops.segment_sum(sigma, dst, num_segments=num_nodes)
    h = sum_sigma_h / (sum_sigma + 1e-6)
    x_new = x + jax.nn.silu(
        _norm(p, f"{name}.bn_nodes", _linear(p, f"{name}.src_update", x) + h, kind)
    )
    y_new = y + jax.nn.silu(_norm(p, f"{name}.bn_edges", m, kind))
    return x_new, y_new


@partial(jax.jit, static_argnames=("spec", "num_graphs"))
def alignn_forward(
    params: dict,
    spec: ALIGNNSpec,
    species: jax.Array,      # [N] int
    atom_table: jax.Array,   # [101, atom_input_features]
    node_graph: jax.Array,   # [N] int
    node_mask: jax.Array,    # [N] bool
    edge_src: jax.Array,     # [E] int
    edge_dst: jax.Array,     # [E] int
    edge_len: jax.Array,     # [E] float
    edge_mask: jax.Array,    # [E] bool
    trip_a: jax.Array,       # [T] int
    trip_b: jax.Array,       # [T] int
    trip_cos: jax.Array,     # [T] float
    trip_mask: jax.Array,    # [T] bool
    num_graphs: int,
) -> jax.Array:
    kind = spec.norm_kind
    N = species.shape[0]
    E = edge_src.shape[0]

    x = _mlp_layer(params, "atom_embedding", atom_table[species], kind)
    y = _rbf(params, "edge_embedding.0", edge_len, 0.0, 8.0, spec.edge_input_features)
    y = _mlp_layer(params, "edge_embedding.1", y, kind)
    y = _mlp_layer(params, "edge_embedding.2", y, kind)
    if spec.alignn_layers > 0:
        z = _rbf(
            params, "angle_embedding.0", trip_cos, -1.0, 1.0,
            spec.triplet_input_features,
        )
        z = _mlp_layer(params, "angle_embedding.1", z, kind)
        z = _mlp_layer(params, "angle_embedding.2", z, kind)

    for i in range(spec.alignn_layers):
        x, y = _edge_gated_conv(
            params, f"alignn_layers.{i}.node_update", x, y,
            edge_src, edge_dst, edge_mask, N, kind,
        )
        # line graph: nodes = directed bonds (features y), edges = triplets
        y, z = _edge_gated_conv(
            params, f"alignn_layers.{i}.edge_update", y, z,
            trip_a, trip_b, trip_mask, E, kind,
        )
    for i in range(spec.gcn_layers):
        x, y = _edge_gated_conv(
            params, f"gcn_layers.{i}", x, y,
            edge_src, edge_dst, edge_mask, N, kind,
        )

    # AvgPooling readout over real atoms per graph
    w = node_mask[:, None].astype(x.dtype)
    num = jax.ops.segment_sum(x * w, node_graph, num_segments=num_graphs)
    den = jax.ops.segment_sum(w, node_graph, num_segments=num_graphs)
    h = num / jnp.maximum(den, 1.0)

    out = _linear(params, "fc", h)
    if spec.classification:
        out = jax.nn.log_softmax(out, axis=-1)
    elif spec.link == "log":
        out = jnp.exp(out)
    elif spec.link == "logit":
        out = jax.nn.sigmoid(out)
    return jnp.squeeze(out, axis=-1) if out.shape[-1] == 1 else out


def run_batch(
    params: dict,
    spec: ALIGNNSpec,
    atom_table: np.ndarray,
    batch: ALIGNNBatch,
) -> np.ndarray:
    """Forward a host-built ALIGNNBatch; returns [num_graphs] predictions."""
    out = alignn_forward(
        params,
        spec,
        jnp.asarray(batch.species, jnp.int32),
        jnp.asarray(atom_table, jnp.float32),
        jnp.asarray(batch.node_graph, jnp.int32),
        jnp.asarray(batch.node_mask),
        jnp.asarray(batch.edge_src, jnp.int32),
        jnp.asarray(batch.edge_dst, jnp.int32),
        jnp.asarray(batch.edge_len, jnp.float32),
        jnp.asarray(batch.edge_mask),
        jnp.asarray(batch.trip_a, jnp.int32),
        jnp.asarray(batch.trip_b, jnp.int32),
        jnp.asarray(batch.trip_cos, jnp.float32),
        jnp.asarray(batch.trip_mask),
        num_graphs=batch.num_graphs,
    )
    return np.asarray(out, dtype=float)
