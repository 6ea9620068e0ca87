"""Caption image files end-to-end from the command line.

Closes the loop the reference never does (it consumes pre-extracted h5
feature tables, utilities.py:61-73): raw JPEG/PNG -> VGG16 fc7
(-> PCA) -> trained policy (+ optional value-guided beam) -> caption
text, in one command:

    python -m image_captioning_through_rl_tpu.cli.caption \
        photo1.jpg photo2.jpg \
        --model logs/<ts>/a2cNetwork.ckpt \
        --vocab datasets/coco_captioning/coco2014_vocab.json \
        --vgg_weights vgg16.pt --pca datasets/coco_captioning/vgg16_fc7_pca.npz \
        --beam_size 5

``--model`` accepts native ``.ckpt`` or reference ``.pt`` checkpoints;
the sibling ``policyNetwork``/``valueNetwork`` files resolve from the
model's directory by the reference naming scheme (utilities.py:299-323,
326-338) unless overridden. Greedy decoding (the default) needs only
the policy checkpoint; ``--beam_size`` needs the value net too.
"""

from __future__ import annotations

import argparse
import os
import sys


def _resolve_sibling(model_path: str, fname: str) -> str:
    """A network file next to the model (the shared .ckpt-preferred /
    reference-.pt-fallback rule, utils.io.resolve_checkpoint)."""
    from ..utils.io import resolve_checkpoint

    return resolve_checkpoint(os.path.dirname(model_path), fname)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Caption image files (pixels -> features -> text)")
    ap.add_argument("images", nargs="*", help="image files to caption")
    ap.add_argument("--images_dir", default="",
                    help="caption every image in this directory")
    ap.add_argument("--model", required=True,
                    help="a2cNetwork checkpoint (.ckpt or reference .pt)")
    ap.add_argument("--vocab", required=True,
                    help="coco2014_vocab.json (or a directory holding it)")
    ap.add_argument("--policy_model", default="",
                    help="policy checkpoint (default: sibling of --model)")
    ap.add_argument("--value_model", default="",
                    help="value checkpoint (default: sibling of --model)")
    ap.add_argument("--vgg_weights", default="",
                    help="VGG16 weights (.pt torchvision layout or .ckpt); "
                         "empty = random (pipeline testing only)")
    ap.add_argument("--pca", default="",
                    help="fitted PCA projection .npz (cli/extract.py); "
                         "required for models trained on _pca features")
    ap.add_argument("--vgg_bf16", action="store_true",
                    help="run the VGG16 stack in bfloat16 (half the HBM "
                         "traffic; features drift at bf16 rounding level)")
    ap.add_argument("--beam_size", type=int, default=0,
                    help="0 = greedy; >0 = value-guided beam search")
    ap.add_argument("--faithful_beam", action="store_true",
                    help="reference-exact shared-beam decoding (quirk Q2/Q1)")
    ap.add_argument("--sample", action="store_true",
                    help="stochastic decode (softmax sampling) instead of "
                         "greedy/beam; seeded, so runs reproduce")
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="sampling temperature (0 = exact greedy)")
    ap.add_argument("--top_k", type=int, default=0,
                    help="sample only among the k highest-probability "
                         "tokens per step (0 = whole vocabulary)")
    ap.add_argument("--top_p", type=float, default=1.0,
                    help="nucleus sampling: smallest token set holding "
                         "this probability mass (1.0 = off)")
    ap.add_argument("--num_samples", type=int, default=1,
                    help="captions drawn per image (n-best list; output "
                         "has this many lines per image)")
    ap.add_argument("--sample_seed", type=int, default=0)
    ap.add_argument("--bidirectional", action="store_true")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--out", default="", help="write captions here "
                    "(one '<file>\\t<caption>' line each; default stdout)")
    args = ap.parse_args(argv)

    paths = list(args.images)
    if args.images_dir:
        from .extract import list_images

        paths += list_images(args.images_dir, None)
    if not paths:
        ap.error("no images given (positional files or --images_dir)")
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        ap.error(f"image files not found: {missing[:5]}")

    from ..api import Captioner, load_feature_extractor
    from ..config import NetConfig
    from ..data.coco import load_vocab
    from ..train import checkpoint as ckpt
    from ..train.loops import _load_or_fail
    from ..utils.io import enable_persistent_compile_cache, get_filename
    from ..utils.logging import print_green

    enable_persistent_compile_cache()

    vocab_path = (os.path.join(args.vocab, "coco2014_vocab.json")
                  if os.path.isdir(args.vocab) else args.vocab)
    word_to_idx, idx_to_word = load_vocab(vocab_path)

    extractor = load_feature_extractor(args.vgg_weights, args.pca,
                                       bf16=args.vgg_bf16)
    cfg = NetConfig.for_vocab(word_to_idx, bidirectional=args.bidirectional,
                              input_dim=extractor.dim)

    # vocab-only stand-in for the CocoData the trainer-side loaders
    # take; only word_to_idx/embeddings are consulted on the load path
    import types

    data_ns = types.SimpleNamespace(
        word_to_idx=word_to_idx, idx_to_word=idx_to_word, embeddings=None)

    # sibling policy/value checkpoints layer first, like the reference
    # (utilities.py:308-316); when absent, an init template suffices —
    # the a2c checkpoint carries both subnets and overwrites it
    import jax

    from ..models import policy as policy_mod
    from ..models import value as value_mod

    def load_subnet(kind, override, mod, seed):
        path = override or _resolve_sibling(
            args.model,
            get_filename(f"{kind}Network.ckpt", args.bidirectional, None))
        try:
            return _load_or_fail(kind, path, cfg, data_ns, args.bidirectional)
        except FileNotFoundError:
            if override:
                raise
            return mod.init(jax.random.PRNGKey(seed), cfg, None)

    params = {
        "policy": load_subnet("policy", args.policy_model, policy_mod, 0),
        "value": load_subnet("value", args.value_model, value_mod, 1),
    }
    params = ckpt.load_network("a2c", args.model, template=params,
                               bidirectional=args.bidirectional)
    print_green(f"[Caption] model {args.model} | vocab {len(word_to_idx)} "
                f"| features {extractor.dim}-d | {len(paths)} images")

    cap = Captioner(params, cfg, idx_to_word)
    if args.sample:
        if args.beam_size:
            ap.error("--sample and --beam_size are mutually exclusive")
        captions = cap.sample_images(
            paths, extractor, batch_size=args.batch_size,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, num_samples=args.num_samples,
            seed=args.sample_seed)
        if args.num_samples > 1:  # n-best: one line per draw, in order
            lines = [f"{p}\t{c}" for p, row in zip(paths, captions)
                     for c in row]
        else:
            lines = [f"{p}\t{c}" for p, c in zip(paths, captions)]
    else:
        captions = cap.caption_images(
            paths, extractor, batch_size=args.batch_size,
            beam_size=args.beam_size, faithful_beam=args.faithful_beam)
        lines = [f"{p}\t{c}" for p, c in zip(paths, captions)]
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print_green(f"[Caption] wrote {args.out}")
    else:
        sys.stdout.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
