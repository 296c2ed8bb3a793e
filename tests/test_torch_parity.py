"""Golden numerical parity: dense-masked JAX CSPNet vs a ragged torch
implementation of the reference semantics (cspnet.py:27-294), through the
torch-checkpoint import mapping (SURVEY.md §4 strategy (b) + §7 'checkpoint
format bridging').

The torch side is an independent re-statement of the reference math (fc edges
incl. self-loops, scatter-mean aggregation, ip lattice products) used as the
oracle; weights are random, exported in the reference state_dict naming, and
imported through cspnet_params_from_state_dict.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from matinvent_tpu.models.cspnet import CSPNet
from matinvent_tpu.models.suite.torch_import import (
    cspnet_params_from_state_dict,
    cspnet_state_dict_from_params,
)

HID, LAT, K, NFREQ = 16, 12, 100, 10
LAYERS = 2


def build_torch_net(seed=0):
    """Reference-shaped torch modules with reference state_dict naming."""
    torch.manual_seed(seed)
    mods = {}
    mods["node_embedding"] = nn.Linear(K, HID)
    mods["atom_latent_emb"] = nn.Linear(HID + LAT, HID)
    for i in range(LAYERS):
        mods[f"csp_layer_{i}.edge_mlp.0"] = nn.Linear(2 * HID + 9 + NFREQ * 6, HID)
        mods[f"csp_layer_{i}.edge_mlp.2"] = nn.Linear(HID, HID)
        mods[f"csp_layer_{i}.node_mlp.0"] = nn.Linear(2 * HID, HID)
        mods[f"csp_layer_{i}.node_mlp.2"] = nn.Linear(HID, HID)
    mods["coord_out"] = nn.Linear(HID, 3, bias=False)
    mods["lattice_out"] = nn.Linear(HID, 9, bias=False)
    mods["type_out"] = nn.Linear(HID, K)
    return mods


def torch_state_dict(mods):
    sd = {}
    for name, m in mods.items():
        sd[f"decoder.{name}.weight"] = m.weight.detach()
        if m.bias is not None:
            sd[f"decoder.{name}.bias"] = m.bias.detach()
    return sd


def sin_emb_torch(x):
    freqs = 2 * math.pi * torch.arange(NFREQ, dtype=x.dtype)
    emb = (x.unsqueeze(-1) * freqs).reshape(*x.shape[:-1], x.shape[-1] * NFREQ)
    return torch.cat([emb.sin(), emb.cos()], dim=-1)


def torch_forward(mods, t_emb, probs, frac, lattice, num_atoms):
    """Ragged reference semantics: per-crystal fc edges incl self-loops,
    scatter-mean aggregation, residual layers, graph-mean lattice head."""
    silu = torch.nn.functional.silu
    outs_l, outs_x, outs_t = [], [], []
    for g in range(len(num_atoms)):
        n = int(num_atoms[g])
        h = mods["node_embedding"](probs[g, :n])
        h = mods["atom_latent_emb"](
            torch.cat([h, t_emb[g].unsqueeze(0).expand(n, -1)], dim=-1)
        )
        x = frac[g, :n]
        L = lattice[g]
        lat_ip = (L @ L.T).reshape(9)
        # fc edges (i, j) for all i, j in graph (incl. self)
        ii, jj = torch.meshgrid(torch.arange(n), torch.arange(n), indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        for i in range(LAYERS):
            frac_diff = (x[jj] - x[ii]) % 1.0
            dis = sin_emb_torch(frac_diff)
            edge_in = torch.cat(
                [h[ii], h[jj], lat_ip.unsqueeze(0).expand(len(ii), -1), dis], dim=-1
            )
            e = silu(mods[f"csp_layer_{i}.edge_mlp.0"](edge_in))
            e = silu(mods[f"csp_layer_{i}.edge_mlp.2"](e))
            # scatter mean over source index ii
            agg = torch.zeros(n, HID)
            agg.index_add_(0, ii, e)
            agg = agg / n
            out = silu(mods[f"csp_layer_{i}.node_mlp.0"](torch.cat([h, agg], -1)))
            out = silu(mods[f"csp_layer_{i}.node_mlp.1" if False else f"csp_layer_{i}.node_mlp.2"](out))
            h = h + out
        coord = mods["coord_out"](h)
        graph = h.mean(dim=0)
        lat_out = mods["lattice_out"](graph).reshape(3, 3) @ L
        typ = mods["type_out"](h)
        outs_l.append(lat_out)
        outs_x.append(coord)
        outs_t.append(typ)
    return outs_l, outs_x, outs_t


@pytest.fixture(scope="module")
def setup():
    mods = build_torch_net()
    sd = {k: v.numpy() for k, v in torch_state_dict(mods).items()}
    params = cspnet_params_from_state_dict(sd, num_layers=LAYERS)
    params = jax.tree.map(jnp.asarray, params)
    net = CSPNet(
        hidden_dim=HID, latent_dim=LAT, num_layers=LAYERS, max_atoms=K,
        num_freqs=NFREQ, smooth=True, pred_type=True,
    )
    return mods, net, params


def test_forward_parity(setup):
    mods, net, params = setup
    rng = np.random.default_rng(0)
    B, A = 3, 7
    num_atoms = np.array([7, 4, 6], np.int32)
    t_emb = rng.standard_normal((B, LAT)).astype(np.float32)
    probs = rng.standard_normal((B, A, K)).astype(np.float32)
    frac = rng.random((B, A, 3)).astype(np.float32)
    lattice = (np.eye(3)[None] * 4.0 + 0.2 * rng.standard_normal((B, 3, 3))).astype(
        np.float32
    )
    mask = np.arange(A)[None] < num_atoms[:, None]

    # torch oracle (ragged)
    with torch.no_grad():
        tl, tx, tt = torch_forward(
            mods,
            torch.tensor(t_emb),
            torch.tensor(probs),
            torch.tensor(frac),
            torch.tensor(lattice),
            num_atoms,
        )

    # jax dense-masked
    jl, jx, jt = net.apply(
        params, jnp.asarray(t_emb), jnp.asarray(probs), jnp.asarray(frac),
        jnp.asarray(lattice), jnp.asarray(num_atoms), jnp.asarray(mask),
    )

    for g in range(B):
        n = int(num_atoms[g])
        np.testing.assert_allclose(np.asarray(jl[g]), tl[g].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(jx[g, :n]), tx[g].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(jt[g, :n]), tt[g].numpy(), atol=2e-4)


def test_state_dict_roundtrip(setup):
    mods, net, params = setup
    sd2 = cspnet_state_dict_from_params(jax.device_get(params))
    sd1 = {k: v.numpy() for k, v in torch_state_dict(mods).items()}
    assert set(sd1) == set(sd2)
    for k in sd1:
        np.testing.assert_allclose(sd2[k], sd1[k], atol=1e-6)
