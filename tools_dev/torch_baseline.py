"""Measured PyTorch baseline for the 5x-per-chip north star (VERDICT r2 #6).

Runs the SAME packed TP -> radial-scale -> Linear pipeline (identical
PackedTPPlan: same instructions, same weights layout, same FLOPs) in
PyTorch with autograd on this host's CPU, at the bench node/edge pipeline
shapes, and prints a defensible derivation of the implied PyTorch-GPU
edges/s:

    implied_gpu = torch_cpu_edges_per_s * (GPU_peak_fp32 / CPU_peak_fp32)

The flops-proportional uplift is GENEROUS to the GPU: it assumes a CUDA
e3nn-style implementation reaches the same fraction of peak on an A100 as
torch-CPU reaches here (in practice e3nn GPU utilization on many small
CG contractions is lower).  The bench's ``vs_baseline`` is measured
against 5x this implied number (BASELINE.md north star).

CPU peak here: 2 cores x 2.2 GHz x 2 FMA ports x 16 fp32 AVX-512 lanes
= ~141 GFLOP/s.  A100 peak fp32: 19.5 TFLOP/s -> uplift ~138x.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.packed_tp import get_plan

FEAT = "64x0e+32x0o+24x1o+12x1e+12x2e+6x2o+4x3o+4x3e+2x4e"
SH = "0e + 1o + 2e + 3o + 4e"


def torch_apply(plan, x, sh, weight, flat_w):
    """PackedTPPlan._apply transcribed to torch (same math, same params)."""
    E = x.shape[0]
    mids = []
    for g, (sl, mul, d1, C, groups) in enumerate(plan.per_chunk):
        K = C.shape[-1]
        if K == 0:
            mids.append(None)
            continue
        xc = x[:, sl].reshape(E, mul, d1)
        Cj = torch.as_tensor(C.reshape(C.shape[0], d1 * K), dtype=x.dtype)
        W = (sh @ Cj).reshape(E, d1, K)
        mid = None
        for i in range(d1):
            term = W[:, i, :, None] * xc[:, None, :, i]
            mid = term if mid is None else mid + term
        mids.append(mid.reshape(E, K * mul))

    out_chunks = []
    for k_out, mio in enumerate(plan.irreps_out):
        fan_in, ofs = plan.out_plans[k_out]
        if fan_in == 0:
            out_chunks.append(torch.zeros(E, mio.dim, dtype=x.dtype))
            continue
        wblk = flat_w[ofs : ofs + fan_in * mio.mul].reshape(fan_in, mio.mul)
        scale = 1.0 / np.sqrt(fan_in)
        d3 = mio.ir.dim
        acc = None
        for g, gi, row_perm in plan.out_sources[k_out]:
            mid = mids[g]
            _, mul, _, _, groups = plan.per_chunk[g]
            ir3, n_cols, k0, k1 = groups[gi]
            ncm = n_cols * mul
            blk = mid[:, k0 * mul : k1 * mul].reshape(E, d3, ncm)
            cb = plan._grp_w_base[(g, gi)]
            blk = blk * weight[:, None, cb : cb + ncm]
            blk = blk.reshape(E * d3, ncm)
            wsub = scale * wblk[torch.as_tensor(np.asarray(row_perm),
                                               dtype=torch.long)]
            y = blk @ wsub
            acc = y if acc is None else acc + y
        y = acc.reshape(E, d3, mio.mul).transpose(-1, -2).reshape(
            E, mio.mul * d3)
        out_chunks.append(y)
    return torch.cat(out_chunks, dim=-1)


def bench_pipeline(label, irreps_in, E=2048, iters=3):
    feat = Irreps(FEAT)
    plan = get_plan(irreps_in, SH, repr(feat), repr(feat))
    g = torch.Generator().manual_seed(0)
    x = torch.randn(E, Irreps(irreps_in).dim, generator=g, requires_grad=True)
    sh = torch.randn(E, Irreps(SH).dim, generator=g)
    w = torch.randn(E, plan.weight_numel, generator=g, requires_grad=True)
    fw = torch.randn(plan.linear_numel, generator=g, requires_grad=True)

    # warmup
    out = torch_apply(plan, x, sh, w, fw)
    out.pow(2).sum().backward()

    t0 = time.perf_counter()
    for _ in range(iters):
        x.grad = w.grad = fw.grad = None
        out = torch_apply(plan, x, sh, w, fw)
        out.pow(2).sum().backward()
    dt = (time.perf_counter() - t0) / iters
    eps = E / dt
    print(f"{label}: fwd+bwd {dt * 1e3:8.1f} ms @ E={E} -> {eps:9.0f} edges/s")
    return eps


def main():
    torch.set_num_threads(os.cpu_count() or 2)
    feat = Irreps(FEAT)
    combined = Irreps([(2 * m, ir) for m, ir in feat])
    node = bench_pipeline("torch-CPU node pipeline", repr(combined))
    edge = bench_pipeline("torch-CPU edge pipeline", repr(feat))
    # the full train step runs 2 node + 2 edge pipelines per layer x 3 layers
    # (fwd+bwd) plus ~40% non-TP overhead (same structure as our trace)
    per_edge_s = (6 / node + 6 / edge) * 1.4
    step_eps = 1.0 / per_edge_s
    print(f"torch-CPU implied full-train-step throughput: {step_eps:9.0f} edges/s")
    cpu_peak = 141e9    # 2 cores x 2.2GHz x 2 FMA x 16 fp32 lanes
    gpu_peak = 19.5e12  # A100 fp32
    uplift = gpu_peak / cpu_peak
    implied_gpu = step_eps * uplift
    print(f"flops-proportional A100 uplift x{uplift:.0f} -> implied "
          f"PyTorch-GPU {implied_gpu:9.0f} edges/s")
    print(f"5x north-star target: {5 * implied_gpu:9.0f} edges/s")


if __name__ == "__main__":
    main()
