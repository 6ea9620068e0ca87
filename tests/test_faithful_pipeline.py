"""END-TO-END faithful-dump golden test (round-2 review, Missing #2).

Composes the pieces that were previously proven only in isolation:
converted torch weights -> ``test_a2c_network(faithful, compat_dump)``
-> byte-compare ALL THREE dump files against an eager-torch oracle of
the reference's ENTIRE eval pipeline (reference trainers.py:619-665):
the Q8 random draw with replacement, Q9 127-wide slices per 128 stride,
the Q1-STATEFUL value-guided beam (persistent ``hidden_cell`` threading
through every value call of a slice, reset between slices,
trainers.py:661), Q2a batch-mean ranking / Q2b log-of-raw-logits, our
shared ``decode_captions``, and the Q13 no-trailing-newline writer
whose slice boundaries merge lines.

Real shapes: hidden 512 / vocab 1004 / feature 512 / 127-wide slices /
T=17, float32 ``precision="highest"`` vs the torch f32 oracle. With the
real ``.pt`` checkpoints absent from this environment, this composed
test is the strongest checkpoint-parity statement available: a user
loading converted reference weights gets byte-identical eval artifacts.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from image_captioning_through_rl_tpu.config import DecodeConfig, NetConfig
from image_captioning_through_rl_tpu.data import load_data, make_synthetic_coco
from image_captioning_through_rl_tpu.data.coco import decode_captions, get_coco_batch
from image_captioning_through_rl_tpu.models import policy_from_torch, value_from_torch
from image_captioning_through_rl_tpu.train.loops import (
    test_a2c_network as run_eval_a2c,  # alias: bare name would be pytest-collected
)

from torch_oracles import (
    TorchPolicyOracle,
    TorchValueOracle,
    policy_state_dict,
    value_state_dict,
)

pytestmark = pytest.mark.slow

VOCAB = 1004
DATA_SIZE = 140  # -> slices of 127 and 12 (Q9 stride 128, width 127)
VAL_BATCH = 128
BEAM = 3
CFG = NetConfig(vocab_size=VOCAB, precision="highest")  # 512/512/512, T=17


def _oracle_pipeline(pol, val, data, paths, data_size, seed):
    """Eager-torch restatement of the reference's eval loop
    (trainers.py:619-665), byte-for-byte: same Q8 draw (our
    ``get_coco_batch`` with the same seeded rng — the draw itself has
    golden-parity coverage in tests/test_eval_quirks.py), reference
    slice walk, reference stateful beam, reference writer."""
    rng = np.random.default_rng(seed + 5)  # the eval's rng discipline
    caps_all, feats_all, urls_all = get_coco_batch(
        data, batch_size=data_size, split="val", rng=rng
    )
    real_f = open(paths["real_captions_path"], "a")
    gen_f = open(paths["generated_captions_path"], "a")
    url_f = open(paths["image_urls_path"], "a")
    with torch.no_grad():
        for i in range(0, len(caps_all), VAL_BATCH):
            feats = feats_all[i : i + VAL_BATCH - 1]
            caps = caps_all[i : i + VAL_BATCH - 1]
            urls = urls_all[i : i + VAL_BATCH - 1]

            # reference beam loop (trainers.py:73-105) with the stateful
            # value net: forward_compat threads the persistent hidden
            f = torch.from_numpy(np.ascontiguousarray(feats))
            gen = torch.from_numpy(caps[:, 0:1].astype(np.int64))
            candidates = [(gen, 0)]
            for _ in range(CFG.max_seq_len - 1):
                nxt = []
                for cap, sc in candidates:
                    out = pol(f[None], cap)
                    probs, words = torch.topk(out[:, -1:, :], BEAM)
                    for b in range(BEAM):
                        cap2 = torch.cat((cap, words[:, :, b]), axis=1)
                        v = val.forward_compat(f, cap2)
                        delta = 0.6 * v + 0.4 * torch.log(probs[:, :, b])
                        nxt.append((cap2, sc - delta))
                nxt.sort(key=lambda tup: float(tup[1].mean()))
                candidates = nxt[:BEAM]
            gen_cap = candidates[0][0].numpy()  # most_likely=True

            gen_str = decode_captions(gen_cap, data.idx_to_word)
            real_str = decode_captions(caps, data.idx_to_word)
            real_f.write("\n".join(real_str))  # Q13: no trailing newline
            gen_f.write("\n".join(gen_str))
            url_f.write("\n".join(urls.tolist()))
            real_f.flush(); gen_f.flush(); url_f.flush()
            val.reset_hidden()  # trainers.py:661
    real_f.close(); gen_f.close(); url_f.close()


def test_composed_faithful_eval_dumps_are_byte_identical(tmp_path):
    torch.manual_seed(11)
    pol = TorchPolicyOracle(VOCAB)
    # shift the head bias positive so Q2b's log(raw logit) stays finite:
    # with NaN scores the reference's Python sorted() is order-dependent
    # (ill-defined; see decode/beam_compat.py NaN scope)
    with torch.no_grad():
        pol.linear2vocab.bias += 10.0
    val = TorchValueOracle(VOCAB)

    pp = policy_from_torch(policy_state_dict(pol), False)
    vp = value_from_torch(value_state_dict(val), False)

    coco = make_synthetic_coco(
        str(tmp_path / "coco"), num_train_images=8, num_val_images=40,
        captions_per_image=2, vocab_size=VOCAB, feature_dim=512, seed=9,
    )
    data = load_data(coco)

    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir(); ref.mkdir()

    def paths_in(d):
        return {
            "real_captions_path": str(d / "real.txt"),
            "generated_captions_path": str(d / "gen.txt"),
            "image_urls_path": str(d / "urls.txt"),
        }

    run_eval_a2c(
        {"policy": pp, "value": vp}, CFG, data, paths_in(ours),
        data_size=DATA_SIZE, validation_batch_size=VAL_BATCH,
        dcfg=DecodeConfig(beam_size=BEAM, max_seq_len=CFG.max_seq_len,
                          per_sample_beams=False),
        seed=0, compat_dump=True,
    )
    val.reset_hidden()  # a fresh reference model enters the oracle run
    _oracle_pipeline(pol, val, data, paths_in(ref), DATA_SIZE, seed=0)

    for name in ("gen.txt", "real.txt", "urls.txt"):
        a = (ours / name).read_bytes()
        b = (ref / name).read_bytes()
        assert a == b, f"{name}: {len(a)} vs {len(b)} bytes differ"
    # Q13 really engaged: two slices, one merged line at the boundary.
    # Q9 drops 1 row per full 128-stride (the 128th draw), so 140 draws
    # -> 127 + 12 = 139 rows; the merge removes one more line break.
    n_lines = (ours / "gen.txt").read_text().count("\n") + 1
    assert n_lines == 139 - 1
