"""Pure-torch replica of the reference ``GNN_Model``
(share/palace/scripts/phage_scoring.py:57-120) used as an independent
oracle for checkpoint-parity tests.

torch_geometric is not installable here, so the two SAGEConv stacks are
implemented with explicit edge-index scatter-mean aggregation — the
semantics of PyG's ``SAGEConv`` with default options (mean aggregation,
root weight via ``lin_r`` without bias, neighbour branch ``lin_l`` with
bias).  Parameter names/shapes match the reference state_dict exactly
(``pnode_d``, ``fnode_d``, ``convs_1.{0,1}.lin_{l,r}``, ``lns.0``,
``conv1..3``, ``d1``, ``d2``) so a checkpoint saved from this model is
indistinguishable from a reference ``GCN_model_retrained.pt``.

Unlike palace_tpu.models.gcn (which collapses the fixed bipartite graph
into dense reshapes), this oracle walks the explicit 8192-edge list
from ``make_edge`` (phage_scoring.py:130-134) — an architecturally
independent computation of the same function.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

HIDDEN_DIM = 3
PNODE_NUM = 4096
FNODE_NUM = 64
GCN_HIDDEN_DIM = 128
DROP_RATE = 0.2


def make_edge() -> np.ndarray:
    """phage_scoring.py:130-134 — interleaved [i//64, i], [i%64, i]."""
    edge = []
    for i in range(PNODE_NUM):
        edge.append([i // 64, i])
        edge.append([i % 64, i])
    return np.array(edge).T


def _scatter_mean(src: torch.Tensor, index: torch.Tensor, dim_size: int) -> torch.Tensor:
    out = torch.zeros(dim_size, src.shape[1], dtype=src.dtype)
    out.index_add_(0, index, src)
    cnt = torch.zeros(dim_size, dtype=src.dtype)
    cnt.index_add_(0, index, torch.ones(index.shape[0], dtype=src.dtype))
    return out / cnt.clamp(min=1.0).unsqueeze(1)


class SAGEConvRef(nn.Module):
    """PyG SAGEConv((in_src, in_dst), out) with default flags."""

    def __init__(self, in_src: int, in_dst: int, out: int):
        super().__init__()
        self.lin_l = nn.Linear(in_src, out, bias=True)   # aggregated neighbours
        self.lin_r = nn.Linear(in_dst, out, bias=False)  # root

    def forward(self, x_src: torch.Tensor, x_dst: torch.Tensor,
                edge_index: torch.Tensor) -> torch.Tensor:
        agg = _scatter_mean(x_src[edge_index[0]], edge_index[1], x_dst.shape[0])
        return self.lin_l(agg) + self.lin_r(x_dst)


class GNNModelRef(nn.Module):
    """state_dict-compatible replica of the reference GNN_Model."""

    def __init__(self):
        super().__init__()
        self.gcn_dim = GCN_HIDDEN_DIM
        self.num_layers = 2
        self.pnode_d = nn.Linear(PNODE_NUM * HIDDEN_DIM, PNODE_NUM * HIDDEN_DIM)
        self.fnode_d = nn.Linear(FNODE_NUM, FNODE_NUM * HIDDEN_DIM)
        self.convs_1 = nn.ModuleList([
            SAGEConvRef(HIDDEN_DIM, HIDDEN_DIM, self.gcn_dim),
            SAGEConvRef(self.gcn_dim, self.gcn_dim, self.gcn_dim),
        ])
        self.convs_2 = nn.ModuleList([
            SAGEConvRef(self.gcn_dim, HIDDEN_DIM, self.gcn_dim),
            SAGEConvRef(self.gcn_dim, self.gcn_dim, self.gcn_dim),
        ])
        self.lns = nn.ModuleList([nn.LayerNorm(self.gcn_dim)])
        self.conv1 = nn.Conv1d(self.gcn_dim, 64, kernel_size=8)
        self.conv2 = nn.Conv1d(64, 64, kernel_size=8)
        self.conv3 = nn.Conv1d(64, 64, kernel_size=8)
        self.d1 = nn.Linear(4075 * 64, 100)
        self.d2 = nn.Linear(100, 2)

    @torch.no_grad()
    def forward_single(self, x_f: torch.Tensor, x_p: torch.Tensor,
                       edge_index: torch.Tensor) -> torch.Tensor:
        """One contig graph, eval mode (dropout off) — mirrors
        phage_scoring.py:88-120 with B=1."""
        ei_fwd = edge_index[:, ::2]
        ei_bwd = edge_index[[1, 0], :][:, 1::2]

        x_p = self.pnode_d(x_p.reshape(1, -1)).reshape(-1, HIDDEN_DIM)
        x_f = self.fnode_d(x_f.reshape(1, -1)).reshape(-1, HIDDEN_DIM)

        for i in range(self.num_layers):
            x_p = F.relu(self.convs_1[i](x_f, x_p, ei_fwd))
            x_f = F.relu(self.convs_2[i](x_p, x_f, ei_bwd))
            if i < self.num_layers - 1:
                x_p = self.lns[i](x_p)
                x_f = self.lns[i](x_f)

        x = torch.reshape(x_p, (-1, self.gcn_dim, PNODE_NUM))
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        x = x.flatten(start_dim=1)
        x = F.relu(self.d1(x))
        return F.softmax(self.d2(x), dim=1)


@torch.no_grad()
def score_features(model: GNNModelRef, features: np.ndarray) -> np.ndarray:
    """Encoder features (B, 3·4096) → P(phage) per row; input prep
    mirrors phage_scoring.py:191-203."""
    model.eval()
    edge_index = torch.tensor(make_edge(), dtype=torch.long)
    pnode = np.moveaxis(features.reshape(-1, 3, PNODE_NUM), 1, 2)
    zero_layer = features.reshape(-1, 3, FNODE_NUM, FNODE_NUM)[:, 0, :, :]
    fnode = np.sum(zero_layer, axis=2).reshape(-1, FNODE_NUM, 1)
    probs = []
    for i in range(pnode.shape[0]):
        out = model.forward_single(
            torch.tensor(fnode[i], dtype=torch.float),
            torch.tensor(pnode[i], dtype=torch.float),
            edge_index,
        )
        probs.append(float(out[0, 1]))
    return np.asarray(probs)
