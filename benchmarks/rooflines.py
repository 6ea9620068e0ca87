#!/usr/bin/env python
"""Analytic speed-of-light for every production step (v5e, COCO shapes).

BENCHMARKS.md carries hand-derived rooflines for the greedy decode and
the A2C step; this script derives them for ALL hot paths from the shape
constants so the "%-of-SOL" claims are reproducible arithmetic, not
prose. Counts follow the kernels as written:

  * chain kernels (ops/pallas_lstm.py, pallas_gru.py, pallas_rollout.py)
    re-read the bf16 weight set from HBM every (tile, step) grid cell
    and stream f32 h/c/gate tapes;
  * batched XLA pieces (vocab head, VSE loss, value MLP, Adam) run once
    per step over N*T rows;
  * backward matmul FLOPs = 2x forward for each taped matmul (dW + dx),
    plus the one-hot embed recompute the backward kernels perform.

Only MXU matmul FLOPs are counted (VPU gate math/transcendentals hide
behind the MXU at these shapes — measured in BENCHMARKS.md round 2);
HBM bytes count weight re-reads, tapes, and optimizer state traffic.
SOL = max(MXU, HBM) assuming perfect overlap, which is generous — the
measured gap on every serial-chain path is the 16-step dependency, not
counting error.

Usage:
  python benchmarks/rooflines.py
  python benchmarks/rooflines.py --measured policy_xe=1.41 a2c=2.97 ...
"""

from __future__ import annotations

import argparse

MXU_BF16 = 197e12  # v5e peak, bf16
HBM = 819e9        # B/s

V, VP, F, H, E, T = 1004, 1024, 512, 512, 512, 17
S = T - 1          # chain steps
G_LSTM, G_GRU = 4, 3


def mm(m, k, n):
    return 2.0 * m * k * n


def lstm_chain(n, gates=G_LSTM, bwd=True):
    """Fused chain kernel: per step one-hot embed + concat gate matmul.
    Returns (flops, hbm_bytes)."""
    embed = mm(n, VP, E)
    gate = mm(n, E + H, gates * H)
    fwd = S * (embed + gate)
    # weights re-read per step (bf16): emb + fused [wi;wh]
    wbytes = 2 * (VP * E + (E + H) * gates * H)
    hbm = S * wbytes
    # tapes: h, c|_, gates f32 streams (write fwd)
    tape = S * n * (H + (H if gates == G_LSTM else 0) + gates * H) * 4
    hbm += tape
    flops = fwd
    if bwd:
        # dxh + dW per step, embed recompute; tape read back
        flops += S * (2 * gate + embed)
        hbm += S * wbytes + tape
    return flops, hbm


def head(nrows, bwd=True):
    f = mm(nrows, H, V)
    b = nrows * H * 4 * 2  # activations in/out f32 (weights amortized)
    if bwd:
        f *= 3
        b *= 2
    return f, b


def adam(nparams):
    # read p, m, v, g; write p, m, v  (f32)
    return 0.0, 7 * nparams * 4


def path_policy_xe(n=512):
    f, b = lstm_chain(n)
    fh, bh = head(n * S)
    fa, ba = adam(V * E + (E + H) * 4 * H + H * V + F * H)
    return f + fh + fa, b + bh + ba


def path_reward_vse(n=512):
    f, b = lstm_chain(n, gates=G_GRU)
    # visual/semantic embeds + VSE similarity matrix (fwd+bwd)
    fe = 3 * (mm(n, H, H) * 2 + mm(n, n, H) * 2)
    fa, ba = adam(V * E + (E + H) * 3 * H + 2 * H * H)
    return f + fe + fa, b + n * H * 4 * 6 + ba


def path_value_mse(n=512):
    # frozen greedy rollout (policy chain + head, fwd only)
    fg, bg = lstm_chain(n, bwd=False)
    fgh, bgh = head(n * S, bwd=False)
    # frozen reward GRU fwd
    fr, br = lstm_chain(n, gates=G_GRU, bwd=False)
    # value LSTM chain fwd+bwd + value MLP fwd+bwd
    fv, bv = lstm_chain(n)
    fmlp = 3 * (mm(n, 2 * H, H) + mm(n, H, 128))  # concat MLP (1-col padded to 128)
    fa, ba = adam(V * E + (E + H) * 4 * H + 2 * H * H + F * H)
    return fg + fgh + fr + fv + fmlp + fa, bg + bgh + br + bv + ba


def path_a2c(n=512):
    # rollout kernel: policy cell + head + sample + value cell + value MLP
    # per step, fwd+bwd for policy/value, frozen reward GRU fwd.
    fp, bp = lstm_chain(n)                     # policy cells
    fh, bh = head(n * S)                       # policy head (in-kernel)
    fv, bv = lstm_chain(n)                     # value cells
    fmlp = 3 * S * (mm(n, 2 * H, H) + mm(n, H, 128))
    fr, br = lstm_chain(n, gates=G_GRU, bwd=False)
    fa, ba = adam(2 * (V * E + (E + H) * 4 * H) + H * V + 2 * H * H + 2 * F * H)
    return fp + fh + fv + fmlp + fr + fa, bp + bh + bv + br + ba


def path_greedy(n=32768):
    f, b = lstm_chain(n, bwd=False)
    fh, bh = head(n * S, bwd=False)
    return f + fh, b + bh


def path_beam(n=127, B=5):
    # per step: policy cell+head on n*B rows, value cell on n*B*B rows
    # (each expansion's candidate), value MLP on n*B*B rows; fwd only.
    fp, bp = lstm_chain(n * B, bwd=False)
    fh, bh = head(n * B * S, bwd=False)
    fv, bv = lstm_chain(n * B * B, bwd=False)
    fmlp = S * (mm(n * B * B, 2 * H, H) + mm(n * B * B, H, 128))
    return fp + fh + fv + fmlp, bp + bh + bv


VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]


def path_vgg(n=64, dtype_bytes=4):
    """VGG16 fc7 extraction (models/vgg.py). FLOPs from the conv config
    at 224x224; HBM counts the weight set once per batch plus every
    conv/pool activation written+read at the compute dtype (the bf16
    path halves exactly this term — see FeatureExtractor compute_dtype)."""
    flops, act_elems, s, in_ch = 0.0, 0, 224, 3
    wparams = 0
    for c in VGG_CFG:
        if c == "M":
            s //= 2
            act_elems += s * s * in_ch  # pooled output write+read pair below
            continue
        flops += mm(n * s * s, 9 * in_ch, c)
        wparams += 9 * in_ch * c + c
        act_elems += s * s * c
        in_ch = c
    flops += mm(n, 7 * 7 * 512, 4096) + mm(n, 4096, 4096)
    wparams += 7 * 7 * 512 * 4096 + 4096 * 4096 + 2 * 4096
    hbm = wparams * dtype_bytes                    # weights once per batch
    hbm += n * 224 * 224 * 3 * 4                   # f32 input read
    hbm += 2 * n * act_elems * dtype_bytes         # write + next-layer read
    hbm += n * (2 * 4096) * dtype_bytes + n * 4096 * 4  # fc acts + f32 out
    return flops, hbm


PATHS = {
    "policy_xe": (path_policy_xe, 512),
    "reward_vse": (path_reward_vse, 512),
    "value_mse": (path_value_mse, 512),
    "a2c": (path_a2c, 512),
    "greedy@32768": (path_greedy, 32768),
    "beam5@127": (path_beam, 127),
    "vgg_f32@64": (path_vgg, 64),
    "vgg_bf16@64": (lambda n: path_vgg(n, dtype_bytes=2), 64),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", nargs="*", default=[],
                    help="name=ms pairs to annotate with %%SOL / MFU")
    args = ap.parse_args()
    measured = dict(kv.split("=") for kv in args.measured)

    print(f"{'path':<14} {'GF':>7} {'MB':>7} {'MXU ms':>7} {'HBM ms':>7} "
          f"{'SOL ms':>7}   measured  %SOL   MFU")
    for name, (fn, n) in PATHS.items():
        flops, hbm = fn(n)
        t_mxu = flops / MXU_BF16 * 1e3
        t_hbm = hbm / HBM * 1e3
        sol = max(t_mxu, t_hbm)
        line = (f"{name:<14} {flops/1e9:7.1f} {hbm/1e6:7.1f} {t_mxu:7.2f} "
                f"{t_hbm:7.2f} {sol:7.2f}")
        key = name.split("@")[0]
        ms = measured.get(name) or measured.get(key)
        if ms:
            ms = float(ms)
            line += (f"   {ms:6.2f} ms {100*sol/ms:5.0f}%  "
                     f"{flops/ (ms*1e-3) / MXU_BF16 * 100:4.0f}%")
        print(line)


if __name__ == "__main__":
    main()
