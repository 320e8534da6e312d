#!/usr/bin/env python
"""Reference-equivalent CPU baseline: the torch path bench.py compares against.

The reference framework's inference path is a plain-torch
``UNetPointNetLarge`` denoiser driven by a 1000-iteration *Python* DDIM loop
with one full forward per iteration (reference diffusion.py:261-289, model at
networks.py:724-838, instantiated dim=256/time_dim=256 at diffusion.py:15,28).
This module re-creates that path independently at full production size so the
benchmark's denominator is the reference implementation style — torch ops,
eval mode, sequential host-driven steps — not this framework's own CPU build.

Run standalone to (re)measure:

    python benchmarks/torch_reference.py [--measure-steps 3]

Prints ONE JSON line with the measured samples/sec and full provenance.
The loop body's cost is step-invariant (same shapes every iteration), so a
few timed steps extrapolate linearly to the full 1000; the extrapolation
method is recorded in the output.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import platform
import time

import torch

NUM_SAMPLES = 16
NUM_POINTS = 2048
NUM_STEPS = 1000
DIM = 256
TIME_DIM = 256


class SharedMLP(torch.nn.Module):
    """3x (Conv1d-k1 -> BatchNorm1d -> ReLU), the reference's PointNetLayer."""

    def __init__(self, cin: int, cmid: int, cout: int):
        super().__init__()
        dims = [(cin, cmid), (cmid, cmid), (cmid, cout)]
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv1d(a, b, 1) for a, b in dims
        )
        self.bns = torch.nn.ModuleList(torch.nn.BatchNorm1d(b) for _, b in dims)

    def forward(self, x):
        for conv, bn in zip(self.convs, self.bns):
            x = torch.relu(bn(conv(x)))
        return x


class TorchUNetPointNetLarge(torch.nn.Module):
    """The production point-DDPM denoiser (reference networks.py:724-838):
    time-MLP -> concat to xyz -> enc 128/256/512/1024 -> global 2048/4096
    max-pool broadcast -> dec with 1x1-conv refine skips -> 3-channel head."""

    def __init__(self, dim: int = DIM, time_dim: int = TIME_DIM):
        super().__init__()
        self.time_dim = time_dim
        self.time_fc1 = torch.nn.Linear(time_dim, dim)
        self.time_fc2 = torch.nn.Linear(dim, dim)
        self.enc1 = SharedMLP(3 + dim, 64, 128)
        self.enc2 = SharedMLP(128, 128, 256)
        self.enc3 = SharedMLP(256, 256, 512)
        self.enc4 = SharedMLP(512, 512, 1024)
        self.g1 = torch.nn.Conv1d(1024, 2048, 1)
        self.gbn1 = torch.nn.BatchNorm1d(2048)
        self.g2 = torch.nn.Conv1d(2048, 4096, 1)
        self.gbn2 = torch.nn.BatchNorm1d(4096)
        self.refine4 = torch.nn.Conv1d(1024, 1024, 1)
        self.refine3 = torch.nn.Conv1d(512, 512, 1)
        self.refine2 = torch.nn.Conv1d(256, 256, 1)
        self.refine1 = torch.nn.Conv1d(128, 128, 1)
        self.dec4 = SharedMLP(4096 + 1024, 1024, 512)
        self.dec3 = SharedMLP(512 + 512, 512, 256)
        self.dec2 = SharedMLP(256 + 256, 256, 128)
        self.dec1 = SharedMLP(128 + 128, 128, 64)
        self.out1 = torch.nn.Conv1d(64, 64, 1)
        self.outbn = torch.nn.BatchNorm1d(64)
        self.out2 = torch.nn.Conv1d(64, 3, 1)

    def _t_embed(self, t):
        half = self.time_dim // 2
        freqs = torch.exp(
            torch.arange(half, dtype=torch.float32)
            * -(math.log(10000.0) / (half - 1))
        )
        args = t[:, None] * freqs[None]
        emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
        return self.time_fc2(torch.nn.functional.silu(self.time_fc1(emb)))

    def forward(self, x, t):
        # x: (B, N, 3); channel-first internally like the reference.
        N = x.shape[1]
        emb = self._t_embed(t)[:, :, None].expand(-1, -1, N)
        h = torch.cat([x.transpose(1, 2), emb], dim=1)
        x1 = self.enc1(h)
        x2 = self.enc2(x1)
        x3 = self.enc3(x2)
        x4 = self.enc4(x3)
        g = torch.relu(self.gbn2(self.g2(torch.relu(self.gbn1(self.g1(x4))))))
        g = g.max(dim=2, keepdim=True)[0].expand(-1, -1, N)
        d = self.dec4(torch.cat([g, self.refine4(x4)], dim=1))
        d = self.dec3(torch.cat([d, self.refine3(x3)], dim=1))
        d = self.dec2(torch.cat([d, self.refine2(x2)], dim=1))
        d = self.dec1(torch.cat([d, self.refine1(x1)], dim=1))
        return self.out2(torch.relu(self.outbn(self.out1(d)))).transpose(1, 2)


def offset_cosine_schedule(t: torch.Tensor):
    """Offset-cosine schedule, signal rate in [0.02, 0.95]
    (reference diffusion.py:207-223). Returns (noise_rates, signal_rates)."""
    start_angle = math.acos(0.95)
    end_angle = math.acos(0.02)
    angles = start_angle + t * (end_angle - start_angle)
    return torch.sin(angles), torch.cos(angles)


@torch.no_grad()
def ddim_sample_steps(model, x_t, num_steps: int, total_steps: int = NUM_STEPS):
    """Run the first ``num_steps`` iterations of the reference's DDIM loop
    (diffusion.py:261-289): t from 1.0 down by 1/total_steps, one model
    forward per step, x0 = (x_t - noise*eps)/signal, DDIM re-noise."""
    batch = x_t.shape[0]
    step_size = 1.0 / total_steps
    x_0 = x_t
    for step in range(num_steps):
        t = torch.full((batch,), 1.0 - step * step_size)
        noise_rates, signal_rates = offset_cosine_schedule(t)
        eps = model(x_t, t)
        x_0 = (x_t - noise_rates.view(-1, 1, 1) * eps) / signal_rates.view(
            -1, 1, 1
        )
        next_nr, next_sr = offset_cosine_schedule(t - step_size)
        x_t = next_sr.view(-1, 1, 1) * x_0 + next_nr.view(-1, 1, 1) * eps
    return x_0


def measure(measure_steps: int = 3) -> dict:
    """Measure the reference-equivalent torch CPU sampling path and return
    the result with full provenance."""
    torch.manual_seed(24)
    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchUNetPointNetLarge().eval()
    x_t = torch.randn(NUM_SAMPLES, NUM_POINTS, 3)

    ddim_sample_steps(model, x_t, 1)  # warm up allocator/kernels
    t0 = time.perf_counter()
    ddim_sample_steps(model, x_t, measure_steps)
    elapsed = time.perf_counter() - t0

    full = elapsed * NUM_STEPS / measure_steps
    return {
        "torch_cpu_samples_per_sec": NUM_SAMPLES / full,
        "provenance": {
            "path": "plain-torch UNetPointNetLarge (dim=256) + Python DDIM "
                    "loop, reference diffusion.py:261-289 semantics",
            "batch": NUM_SAMPLES,
            "num_points": NUM_POINTS,
            "total_steps": NUM_STEPS,
            "measured_steps": measure_steps,
            "sec_per_step": elapsed / measure_steps,
            "extrapolation": "linear in steps (loop body is step-invariant)",
            "torch_version": torch.__version__,
            "torch_threads": torch.get_num_threads(),
            "cpu_count": os.cpu_count(),
            "platform": platform.platform(),
        },
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--measure-steps", type=int, default=3)
    args = parser.parse_args()
    print(json.dumps(measure(args.measure_steps)))
