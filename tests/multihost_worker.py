"""Subprocess worker for tests/test_multihost.py — one process of a
2-process ``jax.distributed`` CPU job (4 virtual devices each, gloo
collectives).

Run as: ``python multihost_worker.py <pid> <nproc> <port> <workdir>``.
Prints one JSON line on success. Not a pytest file (no ``test_``
prefix); the driving test asserts on the JSON from both ranks.
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # share the suite's compile cache so repeat runs stay fast
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    # the launch-hook env contract (parallel.mesh.maybe_init_distributed)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from image_captioning_through_rl_tpu.parallel import (
        is_main_process,
        make_mesh,
        maybe_init_distributed,
    )

    assert maybe_init_distributed() is True, "distributed init did not come up"
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp

    from image_captioning_through_rl_tpu.config import NetConfig
    from image_captioning_through_rl_tpu.models import policy
    from image_captioning_through_rl_tpu.parallel.hostbatch import GlobalBatcher
    from image_captioning_through_rl_tpu.train import optim, steps

    mesh = make_mesh((4 * nproc,), ("data",))
    batcher = GlobalBatcher(mesh)

    # --- Part 1: bare make_policy_step on per-process-sharded batches ---
    cfg = NetConfig(vocab_size=32, input_dim=8, wordvec_dim=8, hidden_dim=8,
                    max_seq_len=9)
    rng = np.random.default_rng(1234)
    n = 16
    feats = rng.standard_normal((n, cfg.input_dim)).astype(np.float32)
    caps = rng.integers(3, cfg.vocab_size, size=(n, cfg.max_seq_len)).astype(np.int32)
    caps[:, 0] = 1
    caps[:, -1] = 2

    params = policy.init(jax.random.PRNGKey(0), cfg)
    tx = optim.adam(1e-3)
    opt = tx.init(params)
    params, opt = batcher.replicate((params, opt))
    step = steps.make_policy_step(cfg, tx)
    losses = []
    for _ in range(3):
        params, opt, loss = step(params, opt, *batcher.shard(feats, caps))
        losses.append(float(loss))

    # --- Part 2: the real trainer loop over the global mesh ---
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.config import NetConfig as NC
    from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco

    loops._cfg_for = lambda d, b, nd=None: NC.for_vocab(
        d.word_to_idx, d.embeddings, bidirectional=b,
        input_dim=16, wordvec_dim=8, hidden_dim=8,
    )

    # every process materializes the identical fixture (deterministic seed)
    fixture = os.path.join(workdir, f"coco_rank{pid}")
    make_synthetic_coco(fixture, num_train_images=8, num_val_images=4,
                        vocab_size=30, feature_dim=16, seed=5)
    data = load_data(fixture)

    rank_dir = os.path.join(workdir, f"rank{pid}")
    os.makedirs(rank_dir, exist_ok=True)
    paths = {"policy_network": os.path.join(rank_dir, "policyNetwork.ckpt")}
    tparams = loops.train_policy_network(
        data, paths, None, False, epochs=1, batch_size=8, seed=3,
        chunk_steps=2, mesh=mesh,
    )
    leafsums = [float(np.asarray(x, np.float64).sum())
                for x in jax.tree.leaves(jax.device_get(tparams))]

    # --- Part 3: sharded EVAL over the 2-process mesh (decode on all
    # ranks, caption dumps gated to process 0) ---
    from image_captioning_through_rl_tpu.config import DecodeConfig
    from image_captioning_through_rl_tpu.models import a2c

    eval_cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8,
                  max_seq_len=6)
    eval_params = a2c.init(jax.random.PRNGKey(4), eval_cfg)
    eval_paths = {
        "real_captions_path": os.path.join(rank_dir, "real.txt"),
        "generated_captions_path": os.path.join(rank_dir, "gen.txt"),
        "image_urls_path": os.path.join(rank_dir, "urls.txt"),
    }
    loops.test_a2c_network(
        eval_params, eval_cfg, data, eval_paths, data_size=20,
        validation_batch_size=8, dcfg=DecodeConfig(beam_size=2, max_seq_len=6),
        seed=0, mesh=mesh, use_fused_kernel=False,
    )
    gen_path = eval_paths["generated_captions_path"]
    gen_text = open(gen_path).read() if (
        os.path.exists(gen_path) and os.path.getsize(gen_path)
    ) else ""

    # --- Part 4: cross-host-consistent checkpoint load (_sync_load) ---
    # Only rank 0 wrote policyNetwork.ckpt (Part 2's rank gating); each
    # rank passes its OWN rank-dir path, so rank 1's does not exist —
    # the sync load must still give every rank rank-0's weights instead
    # of deadlocking on divergent load-or-train branches.
    synced = loops._load_or_fail_sync(
        "policy", paths["policy_network"], loops._cfg_for(data, False), data,
        False, mesh,
    )
    sync_sum = float(sum(np.asarray(x, np.float64).sum()
                         for x in jax.tree.leaves(jax.device_get(synced))))

    # --- Part 5: the flagship A2C training loop over the 2-process mesh
    # (chunked fused/XLA rollout dispatch, GlobalBatcher shard uploads,
    # rank-gated per-epoch checkpoint saves) ---
    from image_captioning_through_rl_tpu.models import reward
    from image_captioning_through_rl_tpu.train.optim import adam

    a2c_cfg = NC(vocab_size=30, input_dim=16, wordvec_dim=8, hidden_dim=8)
    a2c_params = a2c.init(jax.random.PRNGKey(0), a2c_cfg)
    a2c_rparams = reward.init(jax.random.PRNGKey(1), a2c_cfg)
    a2c_tx = adam(1e-4, a2c_params, a2c_cfg.freeze_embeddings)
    a2c_paths = [os.path.join(rank_dir, "model.ckpt"),
                 os.path.join(rank_dir, "a2cNetwork.ckpt")]
    a2c_out = loops.a2c_training(
        data, a2c_params, a2c_rparams, a2c_tx, a2c_tx.init(a2c_params),
        a2c_cfg, None, a2c_paths, batch_size=8, epochs=1, seed=0,
        chunk_steps=2, mesh=mesh,
    )
    a2c_leafsums = [float(np.asarray(x, np.float64).sum())
                    for x in jax.tree.leaves(jax.device_get(a2c_out))]

    # --- Part 6: the --test_model path (load_a2c_models) under rank
    # disagreement: all THREE checkpoints exist on rank 0 only, every
    # rank must come back with rank-0's weights (no local branching) ---
    from image_captioning_through_rl_tpu.models import policy as policy_m
    from image_captioning_through_rl_tpu.models import value as value_m
    from image_captioning_through_rl_tpu.train import checkpoint as ckpt_m

    l_cfg = loops._cfg_for(data, False)
    p6_paths = {
        "policy_network": os.path.join(rank_dir, "p6_policyNetwork.ckpt"),
        "value_network": os.path.join(rank_dir, "p6_valueNetwork.ckpt"),
    }
    p6_model = os.path.join(rank_dir, "p6_a2cNetwork.ckpt")
    if is_main_process():
        pp6 = policy_m.init(jax.random.PRNGKey(11), l_cfg, data.embeddings)
        vv6 = value_m.init(jax.random.PRNGKey(12), l_cfg, data.embeddings)
        ckpt_m.save_pytree(pp6, p6_paths["policy_network"])
        ckpt_m.save_pytree(vv6, p6_paths["value_network"])
        ckpt_m.save_pytree({"value": vv6, "policy": pp6}, p6_model)
    a2c_loaded, _ = loops.load_a2c_models(p6_model, data, p6_paths, False,
                                          mesh=mesh)
    test_model_sum = float(sum(np.asarray(x, np.float64).sum()
                               for x in jax.tree.leaves(jax.device_get(a2c_loaded))))

    # --- Part 7: 2-D (data x model) mesh spanning both processes — the
    # GlobalBatcher row-span DEDUPE case (devices along the model axis
    # hold identical row slices; each process addresses half of BOTH
    # axes). The bare policy step on the 2-D-sharded batch must
    # reproduce Part 1's 1-D losses exactly (model axis unused). ---
    # --- Part 8: exact resume over the 2-process mesh. Rank gating means
    # only rank 0 holds the trainstate file (each rank passes its OWN
    # rank_dir path), so the resume load must broadcast rank-0's
    # snapshot bytes; the resumed run's weights must equal the
    # uninterrupted 2-epoch run bitwise on every rank. ---
    def a2c_run(tag, epochs, resume=False):
        ts = os.path.join(rank_dir, f"{tag}.trainstate")
        p0 = a2c.init(jax.random.PRNGKey(0), a2c_cfg)
        o0 = a2c_tx.init(p0)
        rs = (loops._load_train_state_sync(ts, p0, o0, True)
              if resume else None)
        return loops.a2c_training(
            data, p0, a2c_rparams, a2c_tx, o0, a2c_cfg, None,
            [os.path.join(rank_dir, f"{tag}.ckpt")], batch_size=8,
            epochs=epochs, seed=7, chunk_steps=2, mesh=mesh,
            train_state_path=ts, resume_state=rs)

    def leafsums_of(tree):
        return [float(np.asarray(x, np.float64).sum())
                for x in jax.tree.leaves(jax.device_get(tree))]

    resume_full = leafsums_of(a2c_run("p8_full", 2))
    a2c_run("p8_split", 1)
    assert not (pid != 0 and os.path.exists(
        os.path.join(rank_dir, "p8_split.trainstate"))), \
        "rank gating broken: non-main rank wrote a trainstate"
    resume_resumed = leafsums_of(a2c_run("p8_split", 2, resume=True))

    mesh2 = make_mesh((2 * nproc, 2), ("data", "model"))
    batcher2 = GlobalBatcher(mesh2)
    params2 = policy.init(jax.random.PRNGKey(0), cfg)
    opt2 = tx.init(params2)
    params2, opt2 = batcher2.replicate((params2, opt2))
    losses_2d = []
    for _ in range(3):
        params2, opt2, loss2 = step(params2, opt2, *batcher2.shard(feats, caps))
        losses_2d.append(float(loss2))

    print(json.dumps({
        "pid": pid,
        "is_main": bool(is_main_process()),
        "losses": losses,
        "leafsums": leafsums,
        "ckpt_written": os.path.exists(paths["policy_network"]),
        "gen_captions": gen_text,
        "sync_load_sum": sync_sum,
        "a2c_leafsums": a2c_leafsums,
        "a2c_ckpt_written": os.path.exists(a2c_paths[1]),
        "test_model_sum": test_model_sum,
        "losses_2d": losses_2d,
        "resume_full": resume_full,
        "resume_resumed": resume_resumed,
    }))


if __name__ == "__main__":
    main()
