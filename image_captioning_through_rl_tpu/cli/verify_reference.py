"""One-command reference-checkpoint parity readiness (icrl-verify-reference).

The reference repo ships its trained ``.pt`` weights as large blobs
that are stripped from this mount (``.MISSING_LARGE_BLOBS``), so
BASELINE.json's "reproduce the reference captions token-for-token"
clause can only be proven the day real weights exist. This command
makes that proof turnkey: point it at a directory of the reference's
``.pt`` files (``models_pretrained/...``, the exact layout
``load_a2c_models`` consumes, reference utilities.py:299-323) plus the
COCO bundle, and it runs the full evidence chain:

  1. **convert** — load every ``.pt`` through the converter
     (models/convert.py) and round-trip it back to a torch state dict,
     requiring BITWISE tensor equality (the conversion is lossless, so
     any later divergence is compute, not plumbing).
  2. **greedy parity** — decode val features with this framework
     (O(T) scan, token-equivalent to the reference's O(T^2) re-encode,
     quirk Q6) and with an eager-torch oracle executing the ORIGINAL
     state dict under the reference's exact semantics
     (trainers.py:57-70), token-for-token.
  3. **faithful-beam dump** — run the reference eval
     (``test_a2c_network`` in faithful Q2 + Q13 compat-dump mode,
     trainers.py:619-665) and byte-diff the generated-captions file
     against the reference's shipped dump (``--dump_dir``).
  4. **score diff** — score the dump with the native metric stack and
     diff against the reference's published ``results*.txt`` dict.

``--self_test`` proves the script itself: it fabricates reference-style
``.pt`` checkpoints (via the tested exporter) + a synthetic bundle in a
temp dir, generates a "reference" dump from the same weights, then runs
all four stages against them and requires every one to PASS.

Exit code 0 iff every runnable stage passes; stages whose inputs are
absent (no dump dir, no results file) report SKIP.
"""

from __future__ import annotations

import argparse
import ast
import os
import sys
import tempfile

import numpy as np


def _stage(name: str, ok, detail: str = "") -> bool:
    tag = {True: "PASS", False: "FAIL", None: "SKIP"}[ok]
    print(f"[{tag}] {name}" + (f" — {detail}" if detail else ""), flush=True)
    return ok is not False


# ---------------------------------------------------------------------------
# stage 1: lossless conversion round trip
# ---------------------------------------------------------------------------

_KINDS = {  # file stem -> converter kind (reference file layout)
    "policyNetwork": "policy",
    "valueNetwork": "value",
    "rewardNetwork": "reward",
    "a2cNetwork": "a2c",
}


def _find_pt(models_dir: str, bidirectional: bool):
    sfx = "_bidirectional" if bidirectional else ""
    found = {}
    for stem, kind in _KINDS.items():
        for cand in (f"{stem}{sfx}.pt", f"{stem}.pt"):
            p = os.path.join(models_dir, cand)
            if os.path.exists(p):
                found[kind] = p
                break
    return found


def verify_convert(models_dir: str, bidirectional: bool) -> bool:
    from ..models.convert import load_torch_state_dict, to_torch_state_dict
    from ..train import checkpoint as ckpt

    found = _find_pt(models_dir, bidirectional)
    if not found:
        return _stage("convert", False, f"no reference .pt files in {models_dir}")
    ok_all = True
    for kind, path in sorted(found.items()):
        sd = load_torch_state_dict(path)
        params = ckpt.load_network(kind, path, bidirectional=bidirectional)
        back = to_torch_state_dict(kind, params, bidirectional)
        missing = set(sd) ^ set(back)
        bad = sorted(k for k in set(sd) & set(back)
                     if not np.array_equal(np.asarray(sd[k], np.float32),
                                           np.asarray(back[k], np.float32)))
        ok = not missing and not bad
        ok_all &= _stage(
            f"convert {kind} ({os.path.basename(path)})", ok,
            f"{len(sd)} tensors round-trip bitwise" if ok
            else f"key diff {sorted(missing)[:4]}, value diff {bad[:4]}")
    return ok_all


# ---------------------------------------------------------------------------
# stage 2: greedy token parity vs an eager-torch oracle of the .pt weights
# ---------------------------------------------------------------------------

def _torch_greedy(sd, features: np.ndarray, start: np.ndarray,
                  max_len: int) -> np.ndarray:
    """Greedy decode under the reference's exact eager semantics
    (models.py:33-84 forward; trainers.py:57-70 loop: re-encode the
    whole prefix each step, append argmax of the last position)."""
    import torch

    t = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    emb, c2l_w = t["caption_embedding.weight"], t["cnn2linear.weight"]
    c2l_b = t["cnn2linear.bias"]
    wi, wh = t["lstm.weight_ih_l0"], t["lstm.weight_hh_l0"]
    bi, bh = t["lstm.bias_ih_l0"], t["lstm.bias_hh_l0"]
    head_w, head_b = t["linear2vocab.weight"], t["linear2vocab.bias"]

    feats = torch.as_tensor(features)
    caps = torch.as_tensor(start.astype(np.int64))[:, None]
    lstm = torch.nn.LSTM(emb.shape[1], wh.shape[1], batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(wi)
        lstm.weight_hh_l0.copy_(wh)
        lstm.bias_ih_l0.copy_(bi)
        lstm.bias_hh_l0.copy_(bh)
        h0 = (feats @ c2l_w.T + c2l_b)[None]
        for _ in range(max_len - 1):
            x = emb[caps]
            out, _ = lstm(x, (h0, torch.zeros_like(h0)))
            logits = out[:, -1] @ head_w.T + head_b
            caps = torch.cat([caps, logits.argmax(-1, keepdim=True)], dim=1)
    return caps.numpy()


def verify_greedy(models_dir: str, data, bidirectional: bool, n: int) -> bool:
    import jax

    from .. import START_ID
    from ..decode import greedy_decode, greedy_decode_full_prefix
    from ..models.convert import load_torch_state_dict
    from ..train import checkpoint as ckpt

    found = _find_pt(models_dir, bidirectional)
    if "policy" not in found:
        return _stage("greedy parity", False, "policyNetwork.pt not found")
    if bidirectional:
        # the torch oracle here is unidirectional; the bidirectional
        # forward is covered by tests/test_realshape_parity.py
        return _stage("greedy parity", None,
                      "bidirectional oracle not wired (tests cover it)") or True
    path = found["policy"]
    params = ckpt.load_network("policy", path, bidirectional=False)
    cfg = _cfg_from_params(params, data)

    feats = np.asarray(data.val_features[:n], np.float32)
    start = np.full((feats.shape[0],), START_ID, np.int32)
    decode = greedy_decode_full_prefix if cfg.bidirectional else greedy_decode
    ours = np.asarray(jax.jit(
        lambda p, f, s: decode(p, cfg, f, s)
    )(params, feats, start))
    oracle = _torch_greedy(load_torch_state_dict(path), feats, start,
                           cfg.max_seq_len)
    agree = float((ours == oracle).mean())
    rows = int((ours == oracle).all(axis=1).sum())
    return _stage("greedy parity", agree == 1.0,
                  f"{rows}/{len(feats)} captions token-exact "
                  f"(token agreement {agree:.6f})")


def _cfg_from_params(policy_params, data):
    from ..config import NetConfig

    emb = policy_params["embedding"]
    return NetConfig.for_vocab(
        data.word_to_idx, None,
        input_dim=policy_params["cnn2linear"]["w"].shape[0],
        wordvec_dim=emb.shape[1],
        hidden_dim=policy_params["lstm"]["wh"].shape[0],
    )


# ---------------------------------------------------------------------------
# stages 3+4: faithful-beam eval dump byte-diff + metric-score diff
# ---------------------------------------------------------------------------

def run_eval_dump(models_dir: str, data, bidirectional: bool, out_dir: str,
                  test_size: int, seed: int = 0) -> dict | None:
    from ..config import DecodeConfig
    from ..models.convert import load_torch_state_dict
    from ..train.loops import load_a2c_models, test_a2c_network

    found = _find_pt(models_dir, bidirectional)
    missing = sorted(k for k in ("policy", "a2c") if k not in found)
    if missing:
        _stage("eval dump", False,
               f"missing {', '.join(m + 'Network.pt' for m in missing)} "
               f"in {models_dir}")
        return None
    paths = {f"{k}_network": v for k, v in found.items()}
    # architecture dims come from the CHECKPOINT, not the reference's
    # hard-coded 512s (models.py:17-18) — the self-test runs tiny nets
    sd = load_torch_state_dict(found["policy"])
    net_dims = {
        "input_dim": sd["cnn2linear.weight"].shape[1],
        "wordvec_dim": sd["caption_embedding.weight"].shape[1],
        # torch lstm.weight_hh_l0 is [4H, H] (reverse weights live under
        # their own _reverse keys), so shape[1] = H either way
        "hidden_dim": sd["lstm.weight_hh_l0"].shape[1],
    }
    a2c_params, cfg = load_a2c_models(
        found["a2c"], data, paths, bidirectional, net_dims=net_dims)
    image_caption_data = {
        "real_captions_path": os.path.join(out_dir, "real_captions.txt"),
        "generated_captions_path": os.path.join(out_dir, "generated_captions.txt"),
        "image_urls_path": os.path.join(out_dir, "image_url.txt"),
    }
    test_a2c_network(
        a2c_params, cfg, data, image_caption_data, data_size=test_size,
        dcfg=DecodeConfig(max_seq_len=cfg.max_seq_len, per_sample_beams=False),
        seed=seed, compat_dump=True,
    )
    return image_caption_data


def verify_dump_diff(generated: str, dump_dir: str) -> bool:
    import glob

    cands = sorted(glob.glob(os.path.join(dump_dir, "generated_captions*.txt")))
    if not cands:
        return _stage("beam-dump byte-diff", None,
                      f"no generated_captions*.txt under {dump_dir}") or True
    ref_file = cands[0]
    with open(generated, "rb") as f:
        got = f.read()
    with open(ref_file, "rb") as f:
        want = f.read()
    if got == want:
        return _stage("beam-dump byte-diff", True,
                      f"byte-identical to {os.path.basename(ref_file)}")
    gl, wl = got.decode().splitlines(), want.decode().splitlines()
    first = next((i for i, (a, b) in enumerate(zip(gl, wl)) if a != b),
                 min(len(gl), len(wl)))
    return _stage("beam-dump byte-diff", False,
                  f"{len(gl)} vs {len(wl)} lines; first diff at line "
                  f"{first + 1}")


def verify_score_diff(image_caption_data: dict, dump_dir: str,
                      tol: float = 1e-9) -> bool:
    from ..metrics import load_textfiles, score

    results = None
    for name in ("results_non-curr.txt", "results_curriculum.txt",
                 "results.txt"):
        p = os.path.join(dump_dir, name)
        if os.path.exists(p):
            results = p
            break
    if results is None:
        return _stage("score diff", None,
                      f"no results*.txt under {dump_dir}") or True
    with open(results) as f:
        published = next((ast.literal_eval(line.strip())
                          for line in f if line.strip().startswith("{")),
                         None)
    if published is None:
        return _stage("score diff", False,
                      f"no '{{...}}' results dict line in {results}")
    refs, hypo = load_textfiles(image_caption_data["real_captions_path"],
                                image_caption_data["generated_captions_path"])
    ours = score(refs, hypo)
    diffs = {k: abs(ours[k] - v) for k, v in published.items() if k in ours}
    worst = max(diffs.values()) if diffs else float("inf")
    return _stage("score diff", worst <= tol,
                  "; ".join(f"{k}: d={d:.2e}" for k, d in sorted(diffs.items())))


# ---------------------------------------------------------------------------
# self test: fabricate reference-style inputs, require every stage to pass
# ---------------------------------------------------------------------------

def self_test() -> bool:
    import jax

    from ..data import load_data, make_synthetic_coco
    from ..models import a2c, policy, reward, value
    from ..train.checkpoint import save_network_pt

    print("— self test: fabricating reference-style .pt files + bundle —")
    work = tempfile.mkdtemp(prefix="verify_reference_selftest_")
    fixture = make_synthetic_coco(
        os.path.join(work, "coco"), num_train_images=16, num_val_images=64,
        vocab_size=37, feature_dim=16, seed=11)
    data = load_data(fixture)
    from ..config import NetConfig

    cfg = NetConfig.for_vocab(data.word_to_idx, None, input_dim=16,
                              wordvec_dim=12, hidden_dim=16)
    models_dir = os.path.join(work, "models_pretrained")
    os.makedirs(models_dir)
    pp = policy.init(jax.random.PRNGKey(0), cfg)
    vp = value.init(jax.random.PRNGKey(1), cfg)
    rp = reward.init(jax.random.PRNGKey(2), cfg)
    ap = {"policy": pp, "value": vp}
    save_network_pt("policy", pp, os.path.join(models_dir, "policyNetwork.pt"))
    save_network_pt("value", vp, os.path.join(models_dir, "valueNetwork.pt"))
    save_network_pt("reward", rp, os.path.join(models_dir, "rewardNetwork.pt"))
    save_network_pt("a2c", ap, os.path.join(models_dir, "a2cNetwork.pt"))

    # fabricate the "reference dump": run the same eval once and stamp
    # its outputs as the golden files the real stages diff against —
    # proves the byte-diff + score-diff machinery end to end
    dump_dir = os.path.join(work, "reference_dump")
    os.makedirs(dump_dir)
    golden = run_eval_dump(models_dir, data, False, dump_dir, test_size=40,
                           seed=3)
    os.rename(golden["generated_captions_path"],
              os.path.join(dump_dir, "generated_captions_non-curr.txt"))
    from ..metrics import load_textfiles, score

    refs, hypo = load_textfiles(
        golden["real_captions_path"],
        os.path.join(dump_dir, "generated_captions_non-curr.txt"))
    with open(os.path.join(dump_dir, "results_non-curr.txt"), "w") as f:
        f.write("\n---------- results ----------\n")
        f.write(repr({k: v for k, v in score(refs, hypo).items()
                      if k != "METEOR"}) + "\n")

    out_dir = os.path.join(work, "out")
    os.makedirs(out_dir)
    ok = verify_convert(models_dir, False)
    ok &= verify_greedy(models_dir, data, False, n=48)
    icd = run_eval_dump(models_dir, data, False, out_dir, test_size=40, seed=3)
    ok &= verify_dump_diff(icd["generated_captions_path"], dump_dir)
    ok &= verify_score_diff(icd, dump_dir)
    _stage("SELF TEST", bool(ok), work)
    return bool(ok)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Prove token/byte/score parity against the reference's "
                    "real .pt checkpoints the day they are available.")
    ap.add_argument("--models_dir", help="directory with the reference .pt "
                    "files (models_pretrained layout)")
    ap.add_argument("--data_dir", help="COCO bundle directory (load_data)")
    ap.add_argument("--dump_dir", default="", help="directory with the "
                    "reference's shipped generated_captions*/results*.txt "
                    "to diff against (e.g. models_pretrained/no_wemb)")
    ap.add_argument("--out_dir", default="", help="where to write our eval "
                    "dump (default: temp dir)")
    ap.add_argument("--test_size", type=int, default=40504,
                    help="eval draws (reference image_captioner.py default)")
    ap.add_argument("--greedy_n", type=int, default=256,
                    help="val features for the greedy token-parity stage")
    ap.add_argument("--bidirectional", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--self_test", action="store_true",
                    help="fabricate synthetic reference inputs and require "
                    "every stage to pass")
    args = ap.parse_args(argv)

    if args.self_test:
        return 0 if self_test() else 1
    if not args.models_dir or not args.data_dir:
        ap.error("--models_dir and --data_dir are required "
                 "(or use --self_test)")

    from ..data import load_data

    data = load_data(args.data_dir)
    ok = verify_convert(args.models_dir, args.bidirectional)
    ok &= verify_greedy(args.models_dir, data, args.bidirectional,
                        n=args.greedy_n)
    out_dir = args.out_dir or tempfile.mkdtemp(prefix="verify_reference_")
    os.makedirs(out_dir, exist_ok=True)
    icd = run_eval_dump(args.models_dir, data, args.bidirectional, out_dir,
                        test_size=args.test_size, seed=args.seed)
    if icd is None:
        ok = False
        _stage("beam-dump byte-diff", None, "eval dump unavailable")
        _stage("score diff", None, "eval dump unavailable")
    elif args.dump_dir:
        ok &= verify_dump_diff(icd["generated_captions_path"], args.dump_dir)
        ok &= verify_score_diff(icd, args.dump_dir)
    else:
        _stage("beam-dump byte-diff", None, "--dump_dir not given")
        _stage("score diff", None, "--dump_dir not given")
    if icd is not None:
        print(f"\neval dump written to {out_dir}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
