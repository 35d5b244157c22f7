"""Empirically measure the reference's scoring+selection phase rate on
THIS host's CPU — the provenance for bench.py's baseline constant.

The reference's offline experiment scores/selections one phase via
``select_programs`` (vae_extent_search.py:1210-1309): encode the full
candidate pool, predict cost, MC-dropout x T for epistemic variance
(:670-702), z-gradient norms (:950-987), k-center-greedy latent
diversity on L2-normalized z with chunked cdist (:1024-1109), eps-greedy
random (:869-877).  This probe re-implements that exact phase in torch
on CPU (the library + numerics the reference uses; the reference box was
a CUDA GPU, our BASELINE.json north-star is "candidates scored/sec"
vs the CPU reference) with the reference experiment defaults:
4,000-candidate pool, extent dim ~24, hidden 128/256 encoder, latent 64,
predictor_layers 2, dropout 0.1, T=10 (bench parity; the reference uses
T in {10,20}), num_select=64, topk_factor=5.

Run:  python tools/baseline_probe.py
Prints per-phase wall and candidates/s. bench.py's
BASELINE_CANDS_PER_SEC records the measured value with this file as
provenance.
"""

import sys
import time

import numpy as np
import torch
import torch.nn as nn


class Encoder(nn.Module):
    """Reference VAE_feature_head encoder shape: 3x(Linear+ReLU)
    hidden 128/256 -> fc_mu/fc_logvar (vae_extent_search.py:258-339)."""

    def __init__(self, in_dim, latent):
        super().__init__()
        self.body = nn.Sequential(
            nn.Linear(in_dim, 128), nn.ReLU(),
            nn.Linear(128, 256), nn.ReLU(),
            nn.Linear(256, 256), nn.ReLU(),
        )
        self.fc_mu = nn.Linear(256, latent)
        self.fc_logvar = nn.Linear(256, latent)

    def forward(self, x):
        h = self.body(x)
        return self.fc_mu(h), self.fc_logvar(h)


class CostPredictor(nn.Module):
    """VAECostPredictor: encoder + 2-layer MLP cost head w/ dropout 0.1
    (vae_extent_search.py:515-663)."""

    def __init__(self, in_dim, latent):
        super().__init__()
        self.enc = Encoder(in_dim, latent)
        self.head = nn.Sequential(
            nn.Linear(latent, 128), nn.ReLU(), nn.Dropout(0.1),
            nn.Linear(128, 128), nn.ReLU(), nn.Dropout(0.1),
            nn.Linear(128, 1),
        )

    def forward(self, x):
        mu, logvar = self.enc(x)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
        return self.head(z).squeeze(-1), mu, z


def k_center_greedy(z, centers, k, chunk=1024):
    """Latent diversity selection on L2-normalized z, chunked cdist
    (vae_extent_search.py:1024-1109)."""
    z = z / (z.norm(dim=1, keepdim=True) + 1e-12)
    c = centers / (centers.norm(dim=1, keepdim=True) + 1e-12)
    mind = torch.full((len(z),), float("inf"))
    for s in range(0, len(c), chunk):
        d = torch.cdist(z, c[s:s + chunk])
        mind = torch.minimum(mind, d.min(dim=1).values)
    picked = []
    for _ in range(k):
        i = int(torch.argmax(mind))
        picked.append(i)
        d = torch.cdist(z, z[i:i + 1]).squeeze(1)
        mind = torch.minimum(mind, d)
    return picked


def one_phase(model, X, measured_idx, num_select=64, topk_factor=5,
              T=10):
    """One select_programs phase, mirroring the reference's flow
    (vae_extent_search.py:1210-1309): encode full N once, cost head on
    detached-z (grad path), full-N MC-dropout x T (mc_predict :670-702
    re-runs the FULL encoder+head per sample), z-grad over full N
    (:950-987), k-center greedy on the candidate pool vs used centers
    (:1024-1109). Budget split w_cost=.5/w_unc=.3/w_div=.2 + grad 2."""
    budget = num_select - 2
    n_cost = int(budget * 0.5)
    n_unc = int(budget * 0.3)
    n_div = int(budget * 0.2)
    n_cost += budget - (n_cost + n_unc + n_div)

    model.eval()
    with torch.no_grad():
        mu, _ = model.enc(X)
    z = mu.detach().requires_grad_(True)
    cost = model.head(z).squeeze(-1)
    cost_np = cost.detach()
    # candidate pool = top num_select*topk_factor by predicted cost
    pool = torch.topk(cost_np, num_select * topk_factor).indices
    sel = pool[:n_cost].tolist()
    # z-gradient norms: autograd over full N through the head
    g = torch.autograd.grad(cost.sum(), z)[0]
    sel += pool[torch.topk(g[pool].norm(dim=1), 2).indices].tolist()
    # MC-dropout x T over the FULL candidate set (full model fwd per T)
    model.train()
    with torch.no_grad():
        mc = torch.stack([model(X)[0] for _ in range(T)])
    model.eval()
    var = mc.var(dim=0)
    sel += pool[torch.topk(var[pool], n_unc).indices].tolist()
    # k-center greedy: pool candidates vs measured + current selection
    centers = torch.cat([mu[measured_idx], mu[torch.tensor(sel)]])
    picked = k_center_greedy(mu[pool], centers, n_div)
    sel += pool[picked].tolist()
    return sel


def main():
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    N, D, LATENT = 4096, 24, 64
    X = torch.randn(N, D)
    measured = torch.arange(64)
    model = CostPredictor(D, LATENT).eval()

    one_phase(model, X, measured)  # warm
    walls = []
    for _ in range(7):
        t0 = time.perf_counter()
        one_phase(model, X, measured)
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    med = sorted(walls)[len(walls) // 2]
    print(f"threads={torch.get_num_threads()} pool={N} T=10 "
          f"phase_wall best={best * 1e3:.1f}ms median={med * 1e3:.1f}ms",
          file=sys.stderr)
    print(f"cands_per_sec best={N / best:.0f} median={N / med:.0f}")


if __name__ == "__main__":
    main()
