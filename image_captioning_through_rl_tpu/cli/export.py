"""Export a trained network as a reference-layout torch ``.pt`` file.

The inverse of the framework's ``.pt`` loading: TPU-trained weights
written by this command load straight back into the eager-torch
reference stack (``load_a2c_models`` / ``strict=True``
``load_state_dict``, reference utilities.py:299-323), so a reference
user can train here and keep their existing torch tooling:

    python -m image_captioning_through_rl_tpu.cli.export \
        logs/<ts>/a2cNetwork.ckpt a2cNetwork.pt \
        --kind a2c --vocab datasets/coco_captioning

The input may be a native ``.ckpt`` (needs ``--vocab`` for the params
template) or an existing ``.pt`` (re-exported through the same
canonical mapping).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Export a checkpoint as a reference-layout torch .pt")
    ap.add_argument("src", help="input checkpoint (.ckpt native or .pt)")
    ap.add_argument("dst", help="output .pt path")
    ap.add_argument("--kind", required=True,
                    choices=("policy", "value", "reward", "a2c"))
    ap.add_argument("--vocab", default="",
                    help="coco2014_vocab.json (or bundle dir); required "
                         "for native .ckpt inputs to size the template")
    ap.add_argument("--bidirectional", action="store_true")
    ap.add_argument("--input_dim", type=int, default=512)
    ap.add_argument("--wordvec_dim", type=int, default=512)
    ap.add_argument("--hidden_dim", type=int, default=512)
    args = ap.parse_args(argv)

    if not os.path.exists(args.src):
        ap.error(f"input checkpoint not found: {args.src}")

    from ..train import checkpoint as ckpt
    from ..utils.logging import print_green

    template = None
    if not args.src.endswith(".pt"):
        if not args.vocab:
            ap.error("--vocab is required for native .ckpt inputs "
                     "(sizes the params template)")
        import jax

        from ..config import NetConfig
        from ..data.coco import load_vocab
        from ..models import a2c, policy, reward, value

        vocab_path = (os.path.join(args.vocab, "coco2014_vocab.json")
                      if os.path.isdir(args.vocab) else args.vocab)
        word_to_idx, _ = load_vocab(vocab_path)
        cfg = NetConfig.for_vocab(
            word_to_idx, bidirectional=args.bidirectional,
            input_dim=args.input_dim, wordvec_dim=args.wordvec_dim,
            hidden_dim=args.hidden_dim)
        mod = {"policy": policy, "value": value,
               "reward": reward, "a2c": a2c}[args.kind]
        template = mod.init(jax.random.PRNGKey(0), cfg)

    params = ckpt.load_network(args.kind, args.src, template=template,
                               bidirectional=args.bidirectional)
    ckpt.save_network_pt(args.kind, params, args.dst,
                         bidirectional=args.bidirectional)
    print_green(f"[Export] {args.src} -> {args.dst} ({args.kind}"
                f"{', bidirectional' if args.bidirectional else ''})")


if __name__ == "__main__":
    main()
