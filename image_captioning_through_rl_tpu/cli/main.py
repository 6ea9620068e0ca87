"""CLI driver preserving the reference's flags and pipeline.

The reference entry point (image_captioner.py) runs:
  setup paths -> load data -> [optional word-embedding training] ->
  train-or-load the A2C network -> test (beam decode + caption dump) ->
  score (BLEU/METEOR/ROUGE-L/CIDEr) -> [optional postprocess].

All reference flags are preserved (image_captioner.py:154-185),
including ``--pretrained_word2vec`` (which here actually works — the
reference parses but never consumes it, quirk Q11; we honor it, and the
reference behavior of ignoring it remains the default "none").
TPU-specific additions: ``--data_dir``, ``--seed``, ``--faithful_beam``
(the reference's batch-mean shared-beam decoding, quirk Q2) and
``--compat_batch_as_time`` (reference-exact stateful encoders, quirk Q1).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

from ..config import DecodeConfig
from ..data.coco import load_data
from ..train.loops import (
    load_a2c_models,
    test_a2c_network,
    train_a2c_network,
)
from ..utils.io import get_filename, resolve_checkpoint
from ..utils.logging import print_green

BASE_DIR = os.path.join("datasets", "coco_captioning")
REAL_CAPTIONS_FILE = "real_captions.txt"
GENERATED_CAPTIONS_FILE = "generated_captions.txt"
IMAGE_URL_FILENAME = "image_url.txt"

# Native checkpoints use .ckpt; reference .pt files load transparently.
A2C_NETWORK_WEIGHTS_FILE = "a2cNetwork.ckpt"
REWARD_NETWORK_WEIGHTS_FILE = "rewardNetwork.ckpt"
POLICY_NETWORK_WEIGHTS_FILE = "policyNetwork.ckpt"
VALUE_NETWORK_WEIGHTS_FILE = "valueNetwork.ckpt"

RESULTS_FILE = "results.txt"
BEST_SCORE_FILENAME = "best_scores.txt"
BEST_SCORE_IMAGES_PATH = "best_scores_images"
CURRICULUM_LEVELS = [3, 6, 9, 12, 15]  # image_captioner.py:35


def setup(args):
    """Derive the log dir and the three path dicts
    (reference image_captioner.py:38-90)."""
    import jax

    from ..utils.io import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    # multi-host SPMD: join the job when launch env vars announce one
    # (single-host runs, like this environment, are a no-op)
    from ..parallel import maybe_init_distributed

    if maybe_init_distributed():
        print_green(f"[Info] Multi-host run: process {jax.process_index()} "
                    f"of {jax.process_count()}")
    print_green(f"[Info] Working on: {jax.devices()}")

    if os.path.isdir(os.path.split(args.test_model)[0]):
        log_dir = os.path.split(args.test_model)[0]
    else:
        stamp = datetime.now().strftime("%d-%b-%Y_%H_%M_%S")
        log_dir = os.path.join("logs", stamp)
        os.makedirs(log_dir, exist_ok=True)

    reward_file = get_filename(REWARD_NETWORK_WEIGHTS_FILE, args.bidirectional, None)
    policy_file = get_filename(POLICY_NETWORK_WEIGHTS_FILE, args.bidirectional, None)
    value_file = get_filename(VALUE_NETWORK_WEIGHTS_FILE, args.bidirectional, None)
    a2c_file = get_filename(A2C_NETWORK_WEIGHTS_FILE, args.bidirectional, args.curriculum)
    results_file = get_filename(RESULTS_FILE, args.bidirectional, args.curriculum)
    generated_file = get_filename(GENERATED_CAPTIONS_FILE, args.bidirectional, args.curriculum)

    save_paths = {
        "model_path": os.path.join(log_dir, a2c_file),
        "results_path": os.path.join(log_dir, results_file),
    }
    image_caption_data = {
        "real_captions_path": os.path.join(log_dir, REAL_CAPTIONS_FILE),
        "generated_captions_path": os.path.join(log_dir, generated_file),
        "image_urls_path": os.path.join(log_dir, IMAGE_URL_FILENAME),
        "best_score_file_path": os.path.join(log_dir, BEST_SCORE_FILENAME),
        "best_score_images_path": os.path.join(log_dir, BEST_SCORE_IMAGES_PATH),
    }
    def resolve(fname: str) -> str:
        return resolve_checkpoint(args.pretrained_path, fname)

    network_paths = {
        "a2c_network": resolve(a2c_file),
        "reward_network": resolve(reward_file),
        "policy_network": resolve(policy_file),
        "value_network": resolve(value_file),
    }
    return log_dir, save_paths, image_caption_data, network_paths


def _record_run_config(args, log_dir: str) -> None:
    """Write the RESOLVED flag set to ``<log_dir>/run_config.json`` so
    every run carries replayable provenance: pass the file back via
    ``--config`` to reproduce the run (explicit flags still win). The
    reference records nothing about a run's configuration beyond what
    the log-dir name encodes (SURVEY §5 config: argparse + buried
    constants).

    ``--test_model`` eval runs reuse the ORIGINAL run's log dir
    (setup's reference-inherited rule above), so they record to
    ``eval_config.json`` instead — the training run's provenance must
    survive later evaluations of its checkpoint."""
    import json

    from ..parallel import is_main_process
    from ..utils.io import atomic_write

    if not is_main_process():
        return
    reused_dir = os.path.isdir(os.path.split(args.test_model)[0])
    name = "eval_config.json" if reused_dir else "run_config.json"
    resolved = {k: v for k, v in sorted(vars(args).items()) if k != "config"}
    with atomic_write(os.path.join(log_dir, name)) as f:
        f.write(json.dumps(resolved, indent=2).encode() + b"\n")


def main(args):
    log_dir, save_paths, image_caption_data, network_paths = setup(args)
    print_green(f"[Info] Saving Logs in dir: {log_dir}")
    _record_run_config(args, log_dir)

    max_train = None if args.training_size == 0 else args.training_size
    print_green(f"[Info] Loading COCO dataset {max_train or ''}")
    data = load_data(base_dir=args.data_dir, max_train=max_train, print_keys=True)
    print_green("[Info] COCO dataset loaded")

    if args.train_word2vec != "none":
        from ..embeddings import get_preprocessed_corpus, train_word_embeddings

        print_green(f"[Info] Training Word Embeddings {args.train_word2vec}")
        corpus = get_preprocessed_corpus(data)
        data.embeddings = train_word_embeddings(
            args.train_word2vec, data, corpus, save_path=args.save_word2vec)
        print_green("[Info] Done Training Word Embeddings")
    elif args.pretrained_word2vec != "none":
        from ..embeddings import get_embeddings, get_vectors_by_vocab

        print_green(f"[Info] Loading Pretrained Word Embeddings {args.pretrained_word2vec}")
        model = get_embeddings(args.pretrained_word2vec)
        data.embeddings = get_vectors_by_vocab(model, data.word_to_idx)

    mesh = None
    if args.spmd:
        import jax

        from ..parallel import make_mesh

        mesh = make_mesh((jax.device_count(),), ("data",))
        print_green(f"[Info] SPMD: data-sharded mesh over "
                    f"{jax.device_count()} devices / {jax.process_count()} processes")

    use_test_model = bool(
        os.path.isfile(args.test_model)
        and "a2cNetwork" in os.path.split(args.test_model)[1]
    )
    if mesh is not None and jax.process_count() > 1:
        # the load-vs-train DECISION must be rank-0's too: without a
        # shared filesystem ranks disagree on isfile and would enter
        # mismatched collectives (load's broadcast vs training) and hang
        import numpy as _np
        from jax.experimental import multihost_utils

        use_test_model = bool(int(multihost_utils.broadcast_one_to_all(
            _np.int32(use_test_model))))
    net_dims = {k: v for k, v in (("input_dim", args.input_dim),
                                  ("wordvec_dim", args.wordvec_dim),
                                  ("hidden_dim", args.hidden_dim))
                if v is not None} or None

    if use_test_model:
        print_green("[Info] Loading A2C Network")
        a2c_params, cfg = load_a2c_models(
            args.test_model, data, network_paths, args.bidirectional,
            mesh=mesh, net_dims=net_dims)  # multi-host: rank-0 load + broadcast, no local branching
        print_green("[Info] A2C Network loaded")
    else:
        import contextlib

        curriculum = CURRICULUM_LEVELS if args.curriculum else None
        prof = contextlib.nullcontext()
        if args.profile_dir:
            # device trace of the whole training phase, viewable in
            # TensorBoard's profile plugin / Perfetto (utils.profiling;
            # note: hangs on tunneled axon backends — CLAUDE.md)
            from ..utils.profiling import trace

            prof = trace(args.profile_dir)
            print_green(f"[Info] Profiling to: {args.profile_dir}")
        print_green("[Info] Training A2C Network")
        with prof:
            a2c_params, _, cfg = train_a2c_network(
                train_data=data,
                save_paths=save_paths,
                network_paths=network_paths,
                plot_dir=log_dir,
                epochs=args.epochs,
                batch_size=args.batch_size,
                bidirectional=args.bidirectional,
                retrain_all=args.retrain,
                curriculum=curriculum,
                seed=args.seed,
                compat_batch_as_time=args.compat_batch_as_time,
                resume=args.resume,
                # flag forces the kernels on; default = auto-probe (fused
                # on TPU after loss agreement with the XLA rollout, else
                # XLA)
                fused_rollout=True if args.fused_rollout else None,
                chunk_steps=args.chunk_steps,
                mesh=mesh,
                net_dims=net_dims,
            )
        print_green("[Info] A2C Network trained")

    print_green("[Info] Testing A2C Network")
    dcfg = DecodeConfig(max_seq_len=cfg.max_seq_len, per_sample_beams=not args.faithful_beam)
    test_a2c_network(
        a2c_params, cfg, test_data=data,
        image_caption_data=image_caption_data, data_size=args.test_size,
        dcfg=dcfg, seed=args.seed, compat_dump=args.compat_dump,
        mesh=mesh,  # per-sample mode shards decode groups; faithful ignores it
    )
    print_green("[Info] A2C Network Tested")

    from ..parallel import is_main_process

    if not is_main_process():
        # non-main hosts hold no caption dumps (decode participation
        # only); scoring/postprocess read the dumps on process 0
        return

    print_green("[Info] A2C Network score - start")
    from ..metrics import calculate_a2c_network_score

    calculate_a2c_network_score(image_caption_data, save_paths)
    print_green("[Info] A2C Network score - end")

    if args.postprocess:
        from ..metrics.postprocess import post_process_data

        print_green("[Info] Post-processing - start")
        post_process_data(image_caption_data)
        print_green("[Info] Post-processing - end")

    print_green(f"[Info] Logs saved in dir: {log_dir}")


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Generate Image Captions through Deep Reinforcement Learning (TPU-native)"
    )
    p.add_argument("--training_size", type=int, default=0,
                   help="Cap on how many training captions to load; 0 keeps everything")
    p.add_argument("--test_size", type=int, default=40504,
                   help="How many validation samples to draw for the eval pass")
    p.add_argument("--epochs", type=int, default=100,
                   help="A2C training epochs")
    p.add_argument("--batch_size", type=int, default=512,
                   help="Episodes per A2C update (also the pretraining minibatch size)")
    p.add_argument("--retrain", action=argparse.BooleanOptionalAction, default=False,
                   help="Train the reward, policy and value sub-networks from "
                        "scratch instead of loading their checkpoints")
    p.add_argument("--postprocess", action=argparse.BooleanOptionalAction, default=False,
                   help="After scoring, rank caption pairs, save the top five and "
                        "fetch their source images")
    p.add_argument("--curriculum", action=argparse.BooleanOptionalAction, default=False,
                   help="Run the staged-rollout (curriculum) variant of A2C training")
    p.add_argument("--bidirectional", action=argparse.BooleanOptionalAction, default=False,
                   help="Build every recurrent encoder bidirectionally")
    p.add_argument("--test_model", type=str, default="",
                   help="Path to a finished A2C checkpoint to evaluate instead of "
                        "training (.ckpt or reference .pt)")
    p.add_argument("--pretrained_path", type=str, default="models_pretrained",
                   help="Directory holding the sub-network checkpoints")
    p.add_argument("--pretrained_word2vec", type=str, default="none",
                   help="Pretrained word-vector source: none, conceptnet, word2vec, "
                        "fasttext, glove, or a file path")
    p.add_argument("--train_word2vec", type=str, default="none",
                   choices=["none", "word2vec", "fasttext"],
                   help="Fit word embeddings on the caption corpus before training")
    p.add_argument("--save_word2vec", type=str, default="",
                   help="Also write the trained word vectors to this path in the "
                        "word2vec interchange format (.bin for binary, .gz ok)")
    # TPU-framework additions
    p.add_argument("--data_dir", type=str, default=BASE_DIR, help="Dataset directory")
    p.add_argument("--seed", type=int, default=0, help="Global RNG seed")
    p.add_argument("--faithful_beam", action=argparse.BooleanOptionalAction, default=False,
                   help="Reference-exact decoding: batch-mean shared beam (Q2) "
                        "with stateful value encoding threaded through eval (Q1)")
    p.add_argument("--compat_dump", action=argparse.BooleanOptionalAction, default=False,
                   help="Write caption dumps with the reference's merged slice "
                        "boundaries (no trailing newline per slice, quirk Q13)")
    p.add_argument("--compat_batch_as_time", action=argparse.BooleanOptionalAction, default=False,
                   help="Reference-exact batch-as-time value/reward encoders (quirk Q1)")
    p.add_argument("--resume", action=argparse.BooleanOptionalAction, default=False,
                   help="Continue an interrupted run from its per-epoch "
                        "full-state snapshot (weights + Adam moments + RNG "
                        "streams + epoch/level position) bit-identically — "
                        "covers in-flight sub-network pretraining and the "
                        "A2C loop; falls back to weights-only for "
                        "pre-snapshot checkpoints")
    p.add_argument("--chunk_steps", type=int, default=16,
                   help="Minibatch updates per device dispatch (jitted "
                        "scan with on-device best-loss bookkeeping); 1 "
                        "restores per-step dispatch")
    p.add_argument("--fused_rollout", action=argparse.BooleanOptionalAction, default=False,
                   help="Force the fused Pallas rollout kernels for A2C training "
                        "(TPU, unidirectional; ~1.5x the XLA step). Default is "
                        "auto: probe once, use them when they verify")
    p.add_argument("--input_dim", type=int, default=None,
                   help="Image feature dimension (default: inferred from "
                        "the dataset's feature width; the reference "
                        "hard-codes 512 in models.py)")
    p.add_argument("--wordvec_dim", type=int, default=None,
                   help="Word embedding dimension (default 512; "
                        "pretrained vectors override it)")
    p.add_argument("--hidden_dim", type=int, default=None,
                   help="RNN hidden dimension (default 512)")
    p.add_argument("--spmd", action=argparse.BooleanOptionalAction, default=False,
                   help="Train and evaluate over a data-sharded mesh spanning "
                        "every device of the job — all local chips, and all "
                        "hosts when the multi-host launch env is set (see "
                        "parallel.mesh.maybe_init_distributed). Each process "
                        "uploads only its shard of every batch; process 0 "
                        "writes the logs/checkpoints")
    p.add_argument("--profile_dir", type=str, default="",
                   help="Capture a jax.profiler device trace of the training "
                        "phase into this directory (TensorBoard profile "
                        "plugin / Perfetto)")
    p.add_argument("--config", type=str, default="",
                   help="JSON file of flag values used as DEFAULTS (explicit "
                        "command-line flags still win). Every run writes its "
                        "resolved flags to <log_dir>/run_config.json, which "
                        "replays through this option")
    return p


def parse_args_with_config(parser: argparse.ArgumentParser, argv=None):
    """Parse ``argv`` honoring ``--config``: the JSON file's values are
    installed as parser defaults before the real parse, so precedence is
    command line > config file > built-in defaults. Unknown keys and
    mistyped values fail fast with the offending key named."""
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default="")
    ns, _ = pre.parse_known_args(argv)
    if ns.config:
        import json

        with open(ns.config) as f:
            try:
                cfg = json.load(f)
            except json.JSONDecodeError as e:
                parser.error(f"--config {ns.config}: not valid JSON ({e})")
        if not isinstance(cfg, dict):
            parser.error(f"--config {ns.config}: expected a JSON object of "
                         f"flag values, got {type(cfg).__name__}")
        by_dest = {a.dest: a for a in parser._actions}
        for key, val in cfg.items():
            act = by_dest.get(key)
            if act is None or key in ("help", "config"):
                parser.error(f"--config {ns.config}: unknown key {key!r} "
                             f"(run --help for the flag list)")
            if isinstance(act, (argparse.BooleanOptionalAction,
                                argparse._StoreTrueAction,
                                argparse._StoreFalseAction)):
                if not isinstance(val, bool):
                    parser.error(f"--config {ns.config}: key {key!r} must be "
                                 f"a JSON boolean, got {val!r}")
            elif act.type is not None and val is not None:
                try:
                    cfg[key] = act.type(val)
                except (TypeError, ValueError):
                    parser.error(f"--config {ns.config}: key {key!r}: "
                                 f"{val!r} is not a valid "
                                 f"{getattr(act.type, '__name__', act.type)}")
            if act.choices is not None and cfg[key] not in act.choices:
                parser.error(f"--config {ns.config}: key {key!r}: "
                             f"{cfg[key]!r} not in {sorted(act.choices)}")
        parser.set_defaults(**cfg)
    return parser.parse_args(argv)


def run() -> None:
    main(parse_args_with_config(build_arg_parser()))
