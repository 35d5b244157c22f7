"""Forensic for the final-model top-1 recall gap (round-2 VERDICT weak #1).

The reference reports top-1 (= final model's Recall@1 over the full
candidate pool, vae_extent_search.py:1480,1874) of 0.15-0.25 on its
real-hardware k80 corpus; our 20-seed replication on the generated
analytic corpus measures 0.0.  This tool decides whether that is a
model deficiency or a property of the pool, three ways:

1. **Tie structure**: the analytic cost is a coarse function
   (flops / (peak*par*vec) * locality * unroll_pen with quantized
   factors, search/measure.py:114-158) — count how many schedules share
   the top noiseless cost and how many recorded labels lie within the
   +-noise/2 band of the recorded optimum.
2. **Remeasurement ceiling**: re-noise the noiseless costs with fresh
   seeds (the exact crc32 jitter the runner applies) and count how
   often the new argmin equals the recorded argmin.  This is the
   recall@1 of *measuring the same pool again on the same machine* —
   no cost model can beat it in expectation.
3. **Noiseless oracle**: recall@1 of the exact noiseless analytic cost
   (a model with zero generalization error).

If (2) and (3) are ~0.0 on this pool, the reference's 0.15-0.25 is
unreachable here by ANY predictor and the measured 0.0 is
pool-dependent, not a model gap.

Optionally (--torch-arm N) runs the reference's own arm — the faithful
torch VAECostPredictor with the reference's losses/hyperparameters
(reg .01/pair 3.0 margin .1/smooth .01/KL .01, AdamW enc 1e-5 head
1e-4 wd 1e-5, clip 1.0, 1000 epochs; VAE pretrain 500 epochs lr 1e-3
beta .01; log1p+StandardScaler inputs, vae_extent_search.py:394-401,
1389-1410,1741-1757) — over N sampling seeds on the same pool and
reports its mean top-1.

Usage:
  python tools/recall_forensic.py result/conv2d_4k_chip/pool_conv2d_4k.json.gz \
      --noise 0.3 [--torch-arm 10]
"""

import argparse
import gzip
import os
import shutil
import sys
import tempfile
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_pool(path):
    from vae_extent_search_tpu.records import load_records

    if path.endswith(".gz"):
        tmp = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
        with gzip.open(path, "rb") as f:
            shutil.copyfileobj(f, tmp)
        tmp.close()
        path = tmp.name
    return load_records(path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pool", type=str)
    p.add_argument("--noise", type=float, default=0.3,
                   help="the runner noise the pool was measured with")
    p.add_argument("--reseeds", type=int, default=100,
                   help="fresh noise seeds for the remeasurement ceiling")
    p.add_argument("--torch-arm", type=int, default=0,
                   help="run the reference torch arm over N seeds")
    p.add_argument("--measure-size", type=int, default=32)
    p.add_argument("--max-phases", type=int, default=60)
    args = p.parse_args()

    from vae_extent_search_tpu.search.measure import AnalyticRunner

    records = load_pool(args.pool)
    task = records[0].inp.task
    costs = np.asarray([r.res.mean_cost for r in records])
    labels = -np.log(costs + 1e-8)
    best = int(np.argmax(labels))

    print(f"pool: {len(records)} records, recorded optimum idx {best} "
          f"cost {costs[best]:.3e}")

    # --- noiseless costs + state strings (for the exact jitter) ---
    runner0 = AnalyticRunner(noise=0.0)
    base = np.empty(len(records))
    strs = []
    for i, r in enumerate(records):
        st = r.inp.recover_state(infer_bound=True)
        base[i] = runner0._cost(task, st)
        strs.append(st.to_str())

    # 1. tie structure
    b_min = base.min()
    n_plateau = int(np.sum(base <= b_min * (1 + 1e-9)))
    uniq = len(np.unique(np.round(base / b_min, 12)))
    half = args.noise / 2
    # a plateau state's noisy cost lies in [b*(1-half), b*(1+half)];
    # any state whose noiseless cost is within (1+half)/(1-half) of the
    # min could have produced the recorded argmin under some draw
    contenders = int(np.sum(base <= b_min * (1 + half) / (1 - half)))
    n_band = int(np.sum(costs <= costs[best] * (1 + half) / (1 - half)))
    print(f"[1] tie structure: {uniq} distinct noiseless costs over "
          f"{len(base)} states; exact-min plateau {n_plateau}; "
          f"noise-band contenders {contenders} "
          f"(recorded-label band {n_band})")

    # 2. remeasurement ceiling
    hits = 0
    for s in range(1, args.reseeds + 1):
        h = np.asarray([
            zlib.crc32(f"{ss}|{s}".encode()) % 10000 / 10000.0
            for ss in strs])
        renoised = base * (1.0 + args.noise * (h - 0.5))
        hits += int(np.argmin(renoised) == best)
    ceiling = hits / args.reseeds
    print(f"[2] remeasurement ceiling: argmin agreement over "
          f"{args.reseeds} fresh noise seeds = {ceiling:.3f} "
          f"(expected ~1/{contenders} = {1 / max(contenders, 1):.3f})")

    # 3. noiseless oracle
    oracle = int(np.argmin(base) == best)
    rank_of_best = int(np.sum(base < base[best]))
    print(f"[3] noiseless-oracle recall@1 = {oracle} (recorded optimum "
          f"ranks #{rank_of_best + 1} by noiseless cost, tied with "
          f"{n_plateau - 1 if base[best] <= b_min * (1 + 1e-9) else 0} others)")

    if args.torch_arm:
        run_torch_arm(records, labels, args)


def run_torch_arm(records, labels, args):
    """The reference's own arm on this pool: extent features ->
    log1p+StandardScaler -> VAE pretrain -> per-phase VAECostPredictor
    training + select_programs, stop on optimum measured; report the
    final model's full-pool Recall@1 per seed."""
    import torch
    import torch.nn.functional as F

    from tools.baseline_probe import CostPredictor, one_phase
    from vae_extent_search_tpu.features import extent_features_from_records

    feats, labs, _ = extent_features_from_records(records)
    keep = [i for i, f in enumerate(feats) if f is not None]
    from collections import Counter

    modal = Counter(len(feats[i]) for i in keep).most_common(1)[0][0]
    keep = [i for i in keep if len(feats[i]) == modal]
    X = np.stack([feats[i] for i in keep]).astype(np.float32)
    y = np.asarray([labels[i] for i in keep], np.float32)
    X = np.log1p(np.abs(X)) * np.sign(X)
    X = (X - X.mean(0)) / (X.std(0) + 1e-8)
    best = int(np.argmax(y))
    N = len(X)
    print(f"[torch arm] pool {N} x {X.shape[1]}, optimum idx {best}")

    torch.manual_seed(2023)
    Xt = torch.from_numpy(X)
    yt = torch.from_numpy(y)

    # VAE pretrain (500 epochs, lr 1e-3, beta .01, recon MSE)
    model0 = CostPredictor(X.shape[1], 64)
    dec = torch.nn.Sequential(
        torch.nn.Linear(64, 256), torch.nn.ReLU(),
        torch.nn.Linear(256, 256), torch.nn.ReLU(),
        torch.nn.Linear(256, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, X.shape[1]))
    opt = torch.optim.Adam(
        list(model0.enc.parameters()) + list(dec.parameters()), lr=1e-3)
    for ep in range(500):
        opt.zero_grad()
        mu, logvar = model0.enc(Xt)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
        recon = dec(z)
        kl = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
        loss = F.mse_loss(recon, Xt) + 0.01 * kl
        loss.backward()
        opt.step()
    enc_state = {k: v.clone() for k, v in model0.enc.state_dict().items()}
    print(f"[torch arm] VAE pretrained (recon {loss.item():.4f})")

    results = []
    for seed in range(2000, 2000 + args.torch_arm):
        rng = np.random.default_rng(seed)
        used = set(rng.choice(N, args.measure_size,
                              replace=False).tolist())
        found_phase = None
        model = CostPredictor(X.shape[1], 64)
        if best in used:
            results.append((0, 1.0 if False else None))
            print(f"seed {seed}: init hit")
            continue
        recall = 0
        for phase in range(1, args.max_phases + 1):
            model = CostPredictor(X.shape[1], 64)
            model.enc.load_state_dict(enc_state)
            opt = torch.optim.AdamW([
                {"params": model.enc.parameters(), "lr": 1e-5},
                {"params": model.head.parameters(), "lr": 1e-4},
            ], weight_decay=1e-5)
            tr = torch.tensor(sorted(used))
            Xtr, ytr = Xt[tr], yt[tr]
            ym, ys = ytr.mean(), ytr.std() + 1e-8
            for ep in range(1000):
                model.train()
                opt.zero_grad()
                mu, logvar = model.enc(Xtr)
                z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
                pred = model.head(z).squeeze(-1)
                yn = (ytr - ym) / ys
                reg = F.mse_loss(pred, yn)
                i_idx, j_idx = torch.triu_indices(len(tr), len(tr), 1)
                lab = torch.sign(yn[j_idx] - yn[i_idx])
                pair = F.margin_ranking_loss(
                    pred[j_idx], pred[i_idx], lab, margin=0.1)
                zn = z + 0.001 * torch.randn_like(z)
                smooth = F.mse_loss(model.head(zn).squeeze(-1), pred)
                kl = -0.5 * torch.mean(
                    1 + logvar - mu.pow(2) - logvar.exp())
                loss = 0.01 * reg + 3.0 * pair + 0.01 * smooth + 0.01 * kl
                loss.backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
                opt.step()
            # full-pool recall@1 with the freshly trained model
            model.eval()
            with torch.no_grad():
                mu, _ = model.enc(Xt)
                preds = model.head(mu).squeeze(-1)
            recall = int(int(torch.argmax(preds)) == best)
            sel = one_phase(model, Xt, torch.tensor(sorted(used)),
                            num_select=args.measure_size)
            used.update(int(s) for s in sel)
            if best in used:
                found_phase = phase
                break
        results.append((found_phase, recall))
        print(f"seed {seed}: found at phase {found_phase}, "
              f"final recall@1 {recall}, train {len(used)}")

    recs = [r for _, r in results if r is not None]
    print(f"[torch arm] seeds {args.torch_arm}: mean top-1 = "
          f"{np.mean(recs) if recs else float('nan'):.3f} "
          f"(reference reports 0.15-0.25 on its real-hardware pool)")


if __name__ == "__main__":
    main()
