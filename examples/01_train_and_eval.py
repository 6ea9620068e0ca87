"""Full pipeline on a synthetic mini-COCO: pretrain reward / policy /
value, A2C-train the joint network, run the value-guided-beam eval, and
score the dumps — the library-level equivalent of

    python image_captioner.py --data_dir <bundle> --epochs 1 ...

(reference image_captioner.py:93-151). Runs in tens of seconds on CPU.
"""
import os
import tempfile

if os.environ.get("ICRL_EXAMPLE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

from image_captioning_through_rl_tpu.api import evaluate_captions
from image_captioning_through_rl_tpu.config import DecodeConfig
from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
from image_captioning_through_rl_tpu.train.loops import (
    test_a2c_network,
    train_a2c_network,
)

work = tempfile.mkdtemp(prefix="icrl_example_")
log_dir = os.path.join(work, "logs")
os.makedirs(log_dir)

# 1. A dataset in the reference's CS231n COCO-bundle schema. For real
#    data, point load_data at a real bundle (or build one from raw COCO
#    annotation JSON with `icrl-build-data`).
bundle = make_synthetic_coco(os.path.join(work, "coco"), num_train_images=24,
                             num_val_images=12, vocab_size=60, feature_dim=32)
data = load_data(bundle)

# 2. Train. Missing pretrained checkpoints fall back to training each
#    sub-network (reference trainers.py:338-370); everything lands in
#    log_dir. net_dims shrinks the nets so the example is quick — drop
#    it for the reference's 512-wide architecture.
save_paths = {"model_path": os.path.join(log_dir, "a2cNetwork.ckpt"),
              "results_path": os.path.join(log_dir, "results.txt")}
network_paths = {k: os.path.join(log_dir, f"{k.split('_')[0]}Network.ckpt")
                 for k in ("a2c_network", "reward_network", "policy_network",
                           "value_network")}
a2c_params, _, cfg = train_a2c_network(
    train_data=data, save_paths=save_paths, network_paths=network_paths,
    plot_dir=log_dir, bidirectional=False, epochs=1, batch_size=8,
    net_dims={"wordvec_dim": 16, "hidden_dim": 16},
)

# 3. Evaluate: beam-decode random val draws, dumping real/generated
#    caption files exactly like the reference eval (trainers.py:619-665).
image_caption_data = {
    "real_captions_path": os.path.join(log_dir, "real_captions.txt"),
    "generated_captions_path": os.path.join(log_dir, "generated_captions.txt"),
    "image_urls_path": os.path.join(log_dir, "image_urls.txt"),
}
test_a2c_network(a2c_params, cfg, test_data=data,
                 image_caption_data=image_caption_data, data_size=16,
                 validation_batch_size=8,
                 dcfg=DecodeConfig(max_seq_len=cfg.max_seq_len))

# 4. Score the dumps (BLEU-1..4 / METEOR / ROUGE-L / CIDEr, native
#    scorers — no pycocoevalcap needed).
real = open(image_caption_data["real_captions_path"]).read().splitlines()
gen = open(image_caption_data["generated_captions_path"]).read().splitlines()
scores = evaluate_captions(real, gen)
print({k: round(v, 4) for k, v in scores.items()})
print("artifacts in:", log_dir)
