"""Reference-stack baseline: the PALACE GCN scoring stage in torch on CPU.

The reference repo publishes no benchmark numbers (SURVEY.md §6) and its
exact stack (torch-geometric 1.7 + compiled Cython encoder + pretrained
weights) is not installable here, so the baseline is measured as the
*best-case* torch-CPU implementation of the same computation:

* encoder: vectorised numpy transition counting (≈ the Cython loop's
  compiled speed, usually faster),
* model: the reference architecture (phage_scoring.py:57-120) with the
  fixed bipartite graph collapsed to dense ops — mathematically
  identical to PyG SAGEConv on the edge template, minus PyG's sparse
  scatter overhead (i.e. generous to the baseline).

Writes benchmarks/baseline_cpu.json with contigs/s, which bench.py uses
as the ``vs_baseline`` denominator.

Run: python benchmarks/torch_baseline.py [n_contigs] [contig_len]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch
import torch.nn as nn
import torch.nn.functional as F

HIDDEN_DIM = 3
PNODE_NUM = 4096
FNODE_NUM = 64
GCN_DIM = 128


class TorchGNN(nn.Module):
    """Reference GNN_Model with the fixed-edge SAGE convs densified."""

    def __init__(self):
        super().__init__()
        self.pnode_d = nn.Linear(PNODE_NUM * HIDDEN_DIM, PNODE_NUM * HIDDEN_DIM)
        self.fnode_d = nn.Linear(FNODE_NUM, FNODE_NUM * HIDDEN_DIM)
        self.c1_l = nn.ModuleList([nn.Linear(HIDDEN_DIM, GCN_DIM), nn.Linear(GCN_DIM, GCN_DIM)])
        self.c1_r = nn.ModuleList(
            [nn.Linear(HIDDEN_DIM, GCN_DIM, bias=False), nn.Linear(GCN_DIM, GCN_DIM, bias=False)]
        )
        self.c2_l = nn.ModuleList([nn.Linear(GCN_DIM, GCN_DIM), nn.Linear(GCN_DIM, GCN_DIM)])
        self.c2_r = nn.ModuleList(
            [nn.Linear(HIDDEN_DIM, GCN_DIM, bias=False), nn.Linear(GCN_DIM, GCN_DIM, bias=False)]
        )
        self.ln = nn.LayerNorm(GCN_DIM)
        self.conv1 = nn.Conv1d(GCN_DIM, 64, 8)
        self.conv2 = nn.Conv1d(64, 64, 8)
        self.conv3 = nn.Conv1d(64, 64, 8)
        self.d1 = nn.Linear(4075 * 64, 100)
        self.d2 = nn.Linear(100, 2)

    def forward(self, x_p, x_f):
        B = x_p.shape[0]
        x_p = self.pnode_d(x_p.reshape(B, -1)).reshape(B, PNODE_NUM, HIDDEN_DIM)
        x_f = self.fnode_d(x_f.reshape(B, FNODE_NUM)).reshape(B, FNODE_NUM, HIDDEN_DIM)
        for i in range(2):
            agg_p = x_f.repeat_interleave(FNODE_NUM, dim=1)
            x_p = F.relu(self.c1_l[i](agg_p) + self.c1_r[i](x_p))
            agg_f = x_p.reshape(B, FNODE_NUM, FNODE_NUM, -1).mean(dim=1)
            x_f = F.relu(self.c2_l[i](agg_f) + self.c2_r[i](x_f))
            if i == 0:
                x_p = self.ln(x_p)
                x_f = self.ln(x_f)
        x = x_p.reshape(B, GCN_DIM, PNODE_NUM)
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        x = x.flatten(start_dim=1)
        x = F.relu(self.d1(x))
        return F.softmax(self.d2(x), dim=1)


_LUT = np.full(256, 255, dtype=np.uint8)
for ch, code in zip(b"ACGT", range(4)):
    _LUT[ch] = code
    _LUT[ch + 32] = code


def numpy_encode(seq: str) -> np.ndarray:
    """Vectorised equivalent of encode.pyx matrix_encoding (K=3)."""
    codes = _LUT[np.frombuffer(seq.encode(), dtype=np.uint8)]
    codes = codes[codes != 255].astype(np.int64)
    n = len(seq)
    feats = []
    if codes.size >= 3:
        locs = codes[:-2] * 16 + codes[1:-1] * 4 + codes[2:]
    else:
        locs = np.zeros(0, dtype=np.int64)
    for d in (0, 1, 2):
        m = np.zeros(4096, dtype=np.float64)
        span = locs.size - 3 - d
        if span > 0:
            idx = locs[:span] * 64 + locs[3 + d : 3 + d + span]
            np.add.at(m, idx, 1.0)
        feats.append(m)
    return np.concatenate(feats) / n * 100


def main():
    n_contigs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    contig_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    torch.set_num_threads(os.cpu_count() or 2)
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), size=contig_len)) for _ in range(n_contigs)]

    model = TorchGNN().eval()

    # warmup
    feats = np.stack([numpy_encode(s) for s in seqs[:8]]).astype(np.float32)
    pn = torch.tensor(np.moveaxis(feats.reshape(-1, 3, 4096), 1, 2))
    fn = torch.tensor(feats.reshape(-1, 3, 64, 64)[:, 0].sum(2).reshape(-1, 64, 1))
    with torch.no_grad():
        model(pn, fn)

    t0 = time.perf_counter()
    done = 0
    for i in range(0, n_contigs, 64):
        chunk = seqs[i : i + 64]
        feats = np.stack([numpy_encode(s) for s in chunk]).astype(np.float32)
        pn = torch.tensor(np.moveaxis(feats.reshape(-1, 3, 4096), 1, 2))
        fn = torch.tensor(feats.reshape(-1, 3, 64, 64)[:, 0].sum(2).reshape(-1, 64, 1))
        with torch.no_grad():
            probs = model(pn, fn)[:, 1].numpy()
        done += len(chunk)
    dt = time.perf_counter() - t0
    result = {
        "metric": "contigs_scored_per_sec",
        "value": done / dt,
        "unit": "contigs/s",
        "n_contigs": done,
        "contig_len": contig_len,
        "seconds": dt,
        "hardware": f"cpu x{os.cpu_count()}",
        "stack": "torch-cpu dense-equivalent of reference GNN_Model + numpy encoder",
    }
    out = Path(__file__).parent / "baseline_cpu.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
