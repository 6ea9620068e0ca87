"""Dataset builder: raw COCO annotation JSON -> training bundle.

Covers the pure pieces (tokenizer, vocab, encoder), the written bundle's
loadability through the real ``load_data``, and — the flagship — a full
raw-data e2e: annotations + jpeg files -> build_data CLI -> extract CLI
(train fit + val reuse of one PCA basis via the emitted file lists) ->
the complete train/test/score pipeline. The reference can only consume
a prebuilt bundle (utilities.py:45-113); this closes the loop from raw
COCO.
"""

import json
import os
import types

import h5py
import numpy as np
import pytest

from image_captioning_through_rl_tpu import (END_ID, MAX_SEQ_LEN, NULL_ID,
                                             START_ID, UNK_ID)
from image_captioning_through_rl_tpu.data import coco
from image_captioning_through_rl_tpu.data.build import (build_bundle,
                                                        build_vocab,
                                                        encode_caption,
                                                        tokenize)


def test_tokenize_lowercases_and_splits_punctuation():
    assert tokenize("A man, riding a horse-drawn cart!") == [
        "a", "man", "riding", "a", "horse", "drawn", "cart"]
    assert tokenize("  ") == []


def test_build_vocab_threshold_and_order():
    toks = [["cat", "sat", "cat"], ["dog", "cat", "sat"]]
    vocab = build_vocab(toks, min_count=2)
    # specials pinned at 0-3
    assert [vocab[w] for w in ("<NULL>", "<START>", "<END>", "<UNK>")] == [0, 1, 2, 3]
    # cat(3) before sat(2); dog(1) cut by the threshold
    assert vocab["cat"] == 4 and vocab["sat"] == 5
    assert "dog" not in vocab
    # ties break by first occurrence: a and b both count 1
    v2 = build_vocab([["zz", "aa"]], min_count=1)
    assert v2["zz"] == 4 and v2["aa"] == 5
    # max_words caps the non-special tail
    v3 = build_vocab(toks, min_count=1, max_words=1)
    assert set(v3) == {"<NULL>", "<START>", "<END>", "<UNK>", "cat"}


def test_encode_caption_row_layout():
    vocab = build_vocab([["cat", "sat"]], min_count=1)
    row = encode_caption(["cat", "unseen", "sat"], vocab, max_len=8)
    assert row.tolist() == [START_ID, vocab["cat"], UNK_ID, vocab["sat"],
                            END_ID, NULL_ID, NULL_ID, NULL_ID]
    # over-length body -> None (caller drops or truncates)
    assert encode_caption(["a"] * 7, vocab, max_len=8) is None
    assert encode_caption(["a"] * 6, vocab, max_len=8) is not None


def _fake_annotations(split: str, n_images: int, caps):
    """caps: list of (image_ordinal, caption)."""
    return {
        "images": [
            # ids deliberately descending so sorted-by-id differs from
            # listing order — alignment must come from the sort
            {"id": 100 - i, "file_name": f"{split}_{i:03d}.jpg",
             "coco_url": f"http://img/{split}/{i}.jpg"}
            for i in range(n_images)
        ],
        "annotations": [
            {"id": j, "image_id": 100 - ordinal, "caption": text}
            for j, (ordinal, text) in enumerate(caps)
        ],
    }


@pytest.fixture
def bundle_dir(tmp_path):
    train = _fake_annotations("train", 3, [
        (0, "A cat sits on the mat."),
        (0, "The cat naps on a mat."),
        (1, "A dog runs in the park."),
        (2, "The dog and the cat play."),
        (2, " ".join(["word"] * 40)),  # over-length: dropped by default
    ])
    val = _fake_annotations("val", 2, [
        (0, "A cat on a mat."),
        (1, "A dog in the park."),
    ])
    tr = tmp_path / "captions_train2014.json"
    va = tmp_path / "captions_val2014.json"
    tr.write_text(json.dumps(train))
    va.write_text(json.dumps(val))
    out = tmp_path / "bundle"
    stats = build_bundle(str(tr), str(va), str(out), min_count=2)
    return str(out), stats


def test_build_bundle_artifacts_and_alignment(bundle_dir):
    out, stats = bundle_dir
    assert stats["train_captions"] == 4 and stats["train_dropped"] == 1
    assert stats["val_captions"] == 2
    assert stats["train_images"] == 3 and stats["val_images"] == 2

    with h5py.File(os.path.join(out, "coco2014_captions.h5")) as f:
        caps = np.asarray(f["train_captions"])
        idxs = np.asarray(f["train_image_idxs"])
    assert caps.shape == (4, MAX_SEQ_LEN) and caps.dtype == np.int32
    # every row starts with <START> and contains <END> (the loader's
    # caption_lengths validates this too)
    assert (caps[:, 0] == START_ID).all()
    assert (caps == END_ID).any(axis=1).all()

    # images sorted by ascending id => listing order REVERSED
    with open(os.path.join(out, "train2014_images.txt")) as f:
        files = f.read().split()
    assert files == ["train_002.jpg", "train_001.jpg", "train_000.jpg"]
    with open(os.path.join(out, "train2014_urls.txt")) as f:
        urls = f.read().split()
    assert urls == ["http://img/train/2.jpg", "http://img/train/1.jpg",
                    "http://img/train/0.jpg"]
    # the two cat captions reference image ordinal 0 = id 100 = row 2
    assert idxs.tolist() == [2, 2, 1, 0]

    # vocab: min_count=2 keeps {a,the,cat,on,mat,dog} + specials;
    # thresholded words encode as <UNK>
    vocab = json.load(open(os.path.join(out, "coco2014_vocab.json")))
    w2i = vocab["word_to_idx"]
    for w in ("cat", "dog", "the", "a", "on", "mat"):
        assert w in w2i
    # thresholded: "park"/"sits" appear once in TRAIN (vocab counts the
    # train split only) -> cut, encoded as <UNK>
    assert "park" not in w2i and "sits" not in w2i
    assert (caps == UNK_ID).any()


def test_built_bundle_loads_through_load_data(bundle_dir):
    out, stats = bundle_dir
    # fabricate aligned PCA feature tables (the image half is cli.extract)
    rng = np.random.default_rng(0)
    for split, n in (("train", 3), ("val", 2)):
        with h5py.File(os.path.join(out, f"{split}2014_vgg16_fc7_pca.h5"),
                       "w") as f:
            f["features"] = rng.standard_normal((n, 8)).astype(np.float32)
    data = coco.load_data(out, pca_features=True)
    assert data.train_captions.shape == (4, MAX_SEQ_LEN)
    assert data.train_features.shape == (3, 8)
    assert data.vocab_size == stats["vocab_size"]
    # decode round-trips through the built vocab
    text = coco.decode_captions(data.train_captions[0], data.idx_to_word)
    assert text.startswith("<START>") and text.endswith("<END>")
    # batch iterators index consistently
    caps, feats, urls = next(coco.get_coco_minibatches(data, batch_size=4))
    assert feats.shape == (4, 8) and len(urls) == 4


def test_truncate_mode_keeps_overlength(tmp_path):
    ann = _fake_annotations("train", 1, [(0, " ".join(["word"] * 40))])
    va = _fake_annotations("val", 1, [(0, "a cat")])
    tr_p, va_p = tmp_path / "tr.json", tmp_path / "va.json"
    tr_p.write_text(json.dumps(ann))
    va_p.write_text(json.dumps(va))
    stats = build_bundle(str(tr_p), str(va_p), str(tmp_path / "b"),
                         min_count=1, truncate=True)
    assert stats["train_captions"] == 1 and stats["train_dropped"] == 0
    with h5py.File(str(tmp_path / "b" / "coco2014_captions.h5")) as f:
        row = np.asarray(f["train_captions"])[0]
    assert row[0] == START_ID and row[MAX_SEQ_LEN - 1] == END_ID


def test_negative_max_words_rejected():
    """kept[:negative] would keep everything BUT the rarest N words —
    the opposite of the documented cap; reject it loudly."""
    with pytest.raises(ValueError, match="max_words"):
        build_vocab([["a", "b", "c"]], max_words=-2)


def test_empty_caption_dropped_and_counted(tmp_path):
    """Punctuation/whitespace-only captions (real COCO has them) must
    not become contentless <START><END> rows."""
    ann = _fake_annotations("train", 1, [
        (0, "a cat sits"), (0, "..."), (0, "  !! ")])
    va = _fake_annotations("val", 1, [(0, "a cat")])
    tr_p, va_p = tmp_path / "tr.json", tmp_path / "va.json"
    tr_p.write_text(json.dumps(ann))
    va_p.write_text(json.dumps(va))
    stats = build_bundle(str(tr_p), str(va_p), str(tmp_path / "b"),
                         min_count=1)
    assert stats["train_captions"] == 1
    assert stats["train_empty"] == 2 and stats["val_empty"] == 0
    with h5py.File(str(tmp_path / "b" / "coco2014_captions.h5")) as f:
        rows = np.asarray(f["train_captions"])
    assert rows.shape[0] == 1 and rows[0][1] != END_ID  # real body


def test_unknown_image_id_raises(tmp_path):
    ann = _fake_annotations("train", 1, [(0, "a cat")])
    ann["annotations"][0]["image_id"] = 999
    va = _fake_annotations("val", 1, [(0, "a cat")])
    tr_p, va_p = tmp_path / "tr.json", tmp_path / "va.json"
    tr_p.write_text(json.dumps(ann))
    va_p.write_text(json.dumps(va))
    with pytest.raises(ValueError, match="image_id"):
        build_bundle(str(tr_p), str(va_p), str(tmp_path / "b"))


@pytest.mark.slow
def test_raw_coco_to_trained_captioner_e2e(tmp_path, monkeypatch):
    """The whole loop the reference never closes: annotation JSON + jpeg
    files -> build_data CLI -> extract CLI on BOTH splits (train fits
    the PCA basis, val reuses it, file lists pin row order) -> full
    train/test/score pipeline on the resulting bundle."""
    from PIL import Image

    from image_captioning_through_rl_tpu.cli.build_data import main as build_main
    from image_captioning_through_rl_tpu.cli.extract import main as extract_main

    rng = np.random.default_rng(7)
    img_dirs = {}
    for split, n in (("train", 6), ("val", 4)):
        d = tmp_path / f"{split}2014"
        d.mkdir()
        img_dirs[split] = str(d)
        for i in range(n):
            arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"{split}_{i:03d}.jpg"))

    texts = ["a cat on a mat", "a dog in a park", "a bird on a tree",
             "the cat and the dog", "a man on a horse", "the bird flies"]
    tr = _fake_annotations("train", 6, [(i, texts[i]) for i in range(6)]
                           + [(i, texts[(i + 1) % 6]) for i in range(6)])
    va = _fake_annotations("val", 4, [(i, texts[i]) for i in range(4)]
                           + [(i, texts[(i + 2) % 6]) for i in range(4)])
    tr_p, va_p = tmp_path / "tr.json", tmp_path / "va.json"
    tr_p.write_text(json.dumps(tr))
    va_p.write_text(json.dumps(va))

    out = str(tmp_path / "bundle")
    build_main(["--train_annotations", str(tr_p), "--val_annotations",
                str(va_p), "--out_dir", out, "--min_count", "1"])

    extract_main(["--images_dir", img_dirs["train"], "--split", "train",
                  "--out_dir", out, "--batch_size", "3",
                  "--file_list", os.path.join(out, "train2014_images.txt"),
                  "--pca_components", "4"])
    extract_main(["--images_dir", img_dirs["val"], "--split", "val",
                  "--out_dir", out, "--batch_size", "3",
                  "--file_list", os.path.join(out, "val2014_images.txt"),
                  "--pca_from", os.path.join(out, "vgg16_fc7_pca.npz")])

    # feature rows align with the caption table's image_idxs by
    # construction (both sides order by ascending image id)
    with h5py.File(os.path.join(out, "train2014_vgg16_fc7_pca.h5")) as f:
        assert f["features"].shape == (6, 4)

    # tiny nets sized to the 4-dim PCA features
    import image_captioning_through_rl_tpu.train.loops as loops
    from image_captioning_through_rl_tpu.cli.main import build_arg_parser, main
    from image_captioning_through_rl_tpu.config import NetConfig

    def tiny_cfg(data, bidirectional, net_dims=None):
        return NetConfig.for_vocab(
            data.word_to_idx, data.embeddings, bidirectional=bidirectional,
            input_dim=4, wordvec_dim=8, hidden_dim=8,
        )

    monkeypatch.setattr(loops, "_cfg_for", tiny_cfg)
    monkeypatch.chdir(tmp_path)

    args = vars(build_arg_parser().parse_args([]))
    args.update(training_size=0, test_size=4, epochs=1, batch_size=4,
                retrain=True, test_model="", data_dir=out, seed=0,
                pretrained_path=str(tmp_path / "models_pretrained"))
    main(types.SimpleNamespace(**args))

    log_dir = os.path.join("logs", os.listdir("logs")[0])
    files = set(os.listdir(log_dir))
    assert {"real_captions.txt", "generated_captions.txt",
            "results.txt"} <= files
    with open(os.path.join(log_dir, "results.txt")) as f:
        assert "Bleu_1" in f.read()
