"""Measure the reference-stack per-eval cost: eager PyTorch, ragged batching.

Provides the *measured* basis for bench.py's ``vs_baseline`` anchor. The
reference samples by running 1000 predictor-corrector steps x 2 score-network
evals through an eager torch denoiser over pyg-style ragged batches
(/root/reference/models/diffcsp/diffusion.py:295-345,
models/mattergen/pl_module.py:43,73). This script re-creates that per-eval
workload faithfully but *favorably* to the reference:

* one flat edge_index over the whole batch (pyg batching), NOT a per-graph
  Python loop;
* fully-connected edges incl. self-loops, scatter-mean aggregation via
  index_add_ (the reference aggregation);
* the same layer structure/widths as the MatterGen-class operating point
  (hidden 256, 6 layers, batch 64, ~<=20 atoms/crystal);
* torch.inference_mode, warmed up, threads pinned to what the host has.

Output: per-eval milliseconds and the implied structures/sec for the full
1000-step x 2-eval chain, printed as one JSON line and archived by the
caller. bench.py converts this measured host-CPU figure into an A100
estimate with an explicitly stated scale factor.
"""
from __future__ import annotations

import json
import math
import time

import torch
import torch.nn as nn

H, LAYERS, NFREQ, K, LAT = 256, 6, 10, 100, 256
B, A, T, EVALS_PER_STEP = 64, 20, 1000, 2


class EdgeLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.edge0 = nn.Linear(2 * H + 9 + NFREQ * 6, H)
        self.edge1 = nn.Linear(H, H)
        self.node0 = nn.Linear(2 * H, H)
        self.node1 = nn.Linear(H, H)

    def forward(self, h, x, lat_ip, ei, ej, seg, n_nodes, inv_deg):
        frac_diff = (x[ej] - x[ei]) % 1.0
        emb = frac_diff.unsqueeze(-1) * self._freqs
        emb = emb.reshape(len(ei), -1)
        dis = torch.cat([emb.sin(), emb.cos()], dim=-1)
        edge_in = torch.cat([h[ei], h[ej], lat_ip[seg], dis], dim=-1)
        e = torch.nn.functional.silu(self.edge0(edge_in))
        e = torch.nn.functional.silu(self.edge1(e))
        agg = torch.zeros(n_nodes, H)
        agg.index_add_(0, ei, e)
        agg = agg * inv_deg
        out = torch.nn.functional.silu(self.node0(torch.cat([h, agg], -1)))
        out = torch.nn.functional.silu(self.node1(out))
        return h + out

    _freqs = 2 * math.pi * torch.arange(NFREQ, dtype=torch.float32)


class RefNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.node_embedding = nn.Linear(K, H)
        self.atom_latent_emb = nn.Linear(H + LAT, H)
        self.layers = nn.ModuleList([EdgeLayer() for _ in range(LAYERS)])
        self.coord_out = nn.Linear(H, 3, bias=False)
        self.lattice_out = nn.Linear(H, 9, bias=False)
        self.type_out = nn.Linear(H, K)

    def forward(self, t_emb, probs, x, lattices, ei, ej, seg, node_graph, inv_deg):
        h = self.node_embedding(probs)
        h = self.atom_latent_emb(torch.cat([h, t_emb[node_graph]], dim=-1))
        lat_ip = torch.bmm(lattices, lattices.transpose(1, 2)).reshape(-1, 9)
        for layer in self.layers:
            h = layer(h, x, lat_ip, ei, ej, seg, len(x), inv_deg)
        coord = self.coord_out(h)
        graph = torch.zeros(len(lattices), H)
        graph.index_add_(0, node_graph, h)
        graph = graph / torch.bincount(node_graph).unsqueeze(-1)
        lat = torch.bmm(self.lattice_out(graph).reshape(-1, 3, 3), lattices)
        typ = self.type_out(h)
        return coord, lat, typ


def main() -> None:
    torch.manual_seed(0)
    g = torch.Generator().manual_seed(0)
    num_atoms = torch.randint(1, A + 1, (B,), generator=g)
    n_nodes = int(num_atoms.sum())

    # pyg-style flat fc edge_index over the batch
    ei_l, ej_l, seg_l, ng_l = [], [], [], []
    off = 0
    for gidx in range(B):
        n = int(num_atoms[gidx])
        ii, jj = torch.meshgrid(torch.arange(n), torch.arange(n), indexing="ij")
        ei_l.append(ii.reshape(-1) + off)
        ej_l.append(jj.reshape(-1) + off)
        seg_l.append(torch.full((n * n,), gidx))
        ng_l.append(torch.full((n,), gidx))
        off += n
    ei, ej = torch.cat(ei_l), torch.cat(ej_l)
    seg, node_graph = torch.cat(seg_l), torch.cat(ng_l)
    deg = num_atoms[node_graph].to(torch.float32)
    inv_deg = (1.0 / deg).unsqueeze(-1)

    net = RefNet().eval()
    t_emb = torch.randn(B, LAT, generator=g)
    probs = torch.randn(n_nodes, K, generator=g)
    x = torch.rand(n_nodes, 3, generator=g)
    lattices = torch.randn(B, 3, 3, generator=g)

    with torch.inference_mode():
        for _ in range(3):  # warmup
            net(t_emb, probs, x, lattices, ei, ej, seg, node_graph, inv_deg)
        n_evals = 20
        t0 = time.perf_counter()
        for _ in range(n_evals):
            net(t_emb, probs, x, lattices, ei, ej, seg, node_graph, inv_deg)
        dt = (time.perf_counter() - t0) / n_evals

    per_eval_ms = dt * 1e3
    structs_per_sec = B / (T * EVALS_PER_STEP * dt)
    print(
        json.dumps(
            {
                "workload": "eager torch ragged fc-edge denoiser, "
                f"h{H}/L{LAYERS}, batch {B}, {T} steps x {EVALS_PER_STEP} evals",
                "host_threads": torch.get_num_threads(),
                "per_eval_ms": round(per_eval_ms, 3),
                "structs_per_sec_host_cpu": round(structs_per_sec, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
