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
  python benchmarks/rooflines.py --chips 8 --measured a2c=2.97 ...

``--chips N`` adds the analytic MULTI-CHIP data-parallel model (this
environment exposes one physical chip, so scaling is modeled, not
measured — the virtual-mesh equivalence tests prove the sharded
programs compute the same numbers; this models what they would cost):
each chip keeps the single-chip per-chip batch (weak scaling), the
gradient psum rides a 1-D ICI ring, and the standard ring-all-reduce
cost is 2·V·(N-1)/N bytes over the axis's bidirectional bandwidth
(jax-ml.github.io/scaling-book arithmetic). Decode paths carry no
collectives at all — batch shards are independent, scaling is linear
by construction (tested token-equal 1-vs-8 in tests/test_parallel.py).
"""

from __future__ import annotations

import argparse

MXU_BF16 = 197e12  # v5e peak, bf16
HBM = 819e9        # B/s
ICI_AXIS = 9.0e10  # B/s per v5e torus axis (45 GB/s per direction, x2)

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


# Trainable-parameter counts per path (what a data-parallel step must
# all-reduce). Frozen nets (the reward stream inside the value/A2C
# steps, the policy inside the value step) contribute no gradient.
def params_policy():
    return V * E + (E + H) * 4 * H + H * V + F * H


def params_reward():
    return V * E + (E + H) * 3 * H + 2 * H * H


def params_value():
    return V * E + (E + H) * 4 * H + 2 * H * H + F * H


def params_a2c():
    return 2 * (V * E + (E + H) * 4 * H) + H * V + 2 * H * H + 2 * F * H


def path_policy_xe(n=512):
    f, b = lstm_chain(n)
    fh, bh = head(n * S)
    fa, ba = adam(params_policy())
    return f + fh + fa, b + bh + ba


def path_reward_vse(n=512):
    f, b = lstm_chain(n, gates=G_GRU)
    # visual/semantic embeds + VSE similarity matrix (fwd+bwd)
    fe = 3 * (mm(n, H, H) * 2 + mm(n, n, H) * 2)
    fa, ba = adam(params_reward())
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
    fa, ba = adam(params_value())
    return fg + fgh + fr + fv + fmlp + fa, bg + bgh + br + bv + ba


def path_a2c(n=512):
    # rollout kernel: policy cell + head + sample + value cell + value MLP
    # per step, fwd+bwd for policy/value, frozen reward GRU fwd.
    fp, bp = lstm_chain(n)                     # policy cells
    fh, bh = head(n * S)                       # policy head (in-kernel)
    fv, bv = lstm_chain(n)                     # value cells
    fmlp = 3 * S * (mm(n, 2 * H, H) + mm(n, H, 128))
    fr, br = lstm_chain(n, gates=G_GRU, bwd=False)
    fa, ba = adam(params_a2c())
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

# psum payload per dp step (None = no collectives: decode/extraction
# shard the batch and never exchange a byte after dispatch)
GRAD_PARAMS = {
    "policy_xe": params_policy,
    "reward_vse": params_reward,
    "value_mse": params_value,
    "a2c": params_a2c,
    "greedy@32768": None,
    "beam5@127": None,
    "vgg_f32@64": None,
    "vgg_bf16@64": None,
}


def allreduce_ms(nbytes: float, chips: int, axes: int = 1) -> float:
    """Ring all-reduce cost of ``nbytes`` over ``axes`` ICI torus axes:
    2·V·(N-1)/N bytes cross the bidirectional axis bandwidth (the
    scaling-book identity; reduce-scatter + all-gather each move
    V·(N-1)/N)."""
    if chips <= 1:
        return 0.0
    return 2.0 * nbytes * (chips - 1) / chips / (ICI_AXIS * axes) * 1e3


def dp_model(step_ms: float, nparams: int, chips: int, axes: int = 1,
             grad_bytes_per_param: int = 4):
    """Weak-scaling prediction at fixed per-chip batch: the psum either
    serializes after the backward (no overlap — the floor) or hides
    behind it (XLA's latency-hiding scheduler overlaps the layer-k psum
    with the layer-(k-1) backward — the ceiling). Returns
    (psum_ms, eff_no_overlap, eff_overlapped)."""
    comms = allreduce_ms(nparams * grad_bytes_per_param, chips, axes)
    return (comms,
            step_ms / (step_ms + comms),
            step_ms / max(step_ms, comms))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", nargs="*", default=[],
                    help="name=ms pairs to annotate with %%SOL / MFU")
    ap.add_argument("--chips", type=int, default=0,
                    help="model N-chip data parallelism (weak scaling, "
                         "1-D ICI ring; 0 = off)")
    ap.add_argument("--dp_axes", type=int, default=1, choices=(1, 2),
                    help="torus axes the gradient psum rides (a 2-D dp "
                         "mesh halves the ring cost)")
    ap.add_argument("--grad_dtype", default="f32", choices=("f32", "bf16"),
                    help="psum payload dtype (bf16 grads halve the bytes; "
                         "Adam still updates in f32)")
    args = ap.parse_args()
    measured = dict(kv.split("=") for kv in args.measured)
    gbytes = 4 if args.grad_dtype == "f32" else 2

    print(f"{'path':<14} {'GF':>7} {'MB':>7} {'MXU ms':>7} {'HBM ms':>7} "
          f"{'SOL ms':>7}   measured  %SOL   MFU")
    rows = []
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
        rows.append((name, float(ms) if ms else sol, bool(ms)))
        print(line)

    if args.chips > 1:
        print(f"\nDP weak-scaling model @ {args.chips} chips "
              f"({args.dp_axes}-D ICI, {args.grad_dtype} grads; per-chip "
              f"batch fixed, step time = measured where given else SOL):")
        print(f"{'path':<14} {'grad MB':>8} {'psum ms':>8} "
              f"{'eff (serial)':>13} {'eff (overlap)':>14}")
        for name, step_ms, _ in rows:
            pfn = GRAD_PARAMS.get(name)
            if pfn is None:
                print(f"{name:<14} {'—':>8} {'—':>8} {'linear':>13} "
                      f"{'linear':>14}   (no collectives)")
                continue
            comms, e_ser, e_ovl = dp_model(step_ms, pfn(), args.chips,
                                           args.dp_axes, gbytes)
            print(f"{name:<14} {pfn()*gbytes/1e6:8.2f} {comms:8.3f} "
                  f"{100*e_ser:12.0f}% {100*e_ovl:13.0f}%")


if __name__ == "__main__":
    main()
