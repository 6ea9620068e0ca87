"""Synthetic mini-COCO fixture generator.

Writes a dataset directory in exactly the schema the reference's loader
consumes (utilities.py:45-113): ``coco2014_captions.h5`` with
``{train,val}_captions`` / ``{train,val}_image_idxs``,
``{train,val}2014_vgg16_fc7_pca.h5`` feature tables,
``coco2014_vocab.json`` and ``{train,val}2014_urls.txt``.

Used by the test-suite and CLI smoke paths so the full pipeline can run
hermetically without the 2.5 GB real bundle.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .. import END_ID, MAX_SEQ_LEN, NULL_ID, START_ID

_SPECIALS = ["<NULL>", "<START>", "<END>", "<UNK>"]


def make_vocab(vocab_size: int):
    if vocab_size <= len(_SPECIALS):
        raise ValueError(
            f"vocab_size must exceed the {len(_SPECIALS)} special tokens; "
            f"got {vocab_size}"
        )
    words = list(_SPECIALS) + [f"word{i}" for i in range(vocab_size - len(_SPECIALS))]
    word_to_idx = {w: i for i, w in enumerate(words)}
    return word_to_idx, words


def random_captions(
    rng: np.random.Generator, n: int, vocab_size: int, max_len: int = MAX_SEQ_LEN
) -> np.ndarray:
    """<START> body <END> <NULL>* rows, like the real bundle."""
    if max_len < 3:
        raise ValueError(f"max_len must be >= 3 (<START> body <END>); got {max_len}")
    if vocab_size <= len(_SPECIALS):
        raise ValueError(
            f"vocab_size must exceed the {len(_SPECIALS)} special tokens; "
            f"got {vocab_size}"
        )
    caps = rng.integers(len(_SPECIALS), vocab_size, size=(n, max_len)).astype(np.int32)
    caps[:, 0] = START_ID
    end_pos = rng.integers(2, max_len, size=n)
    for i in range(n):
        caps[i, end_pos[i]] = END_ID
        caps[i, end_pos[i] + 1 :] = NULL_ID
    return caps


def make_synthetic_coco(
    out_dir: str,
    num_train_images: int = 20,
    num_val_images: int = 10,
    captions_per_image: int = 2,
    vocab_size: int = 50,
    feature_dim: int = 512,
    max_len: int = MAX_SEQ_LEN,
    seed: int = 0,
) -> str:
    """Write the fixture into ``out_dir`` and return it."""
    import h5py

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    word_to_idx, words = make_vocab(vocab_size)

    n_train = num_train_images * captions_per_image
    n_val = num_val_images * captions_per_image
    with h5py.File(os.path.join(out_dir, "coco2014_captions.h5"), "w") as f:
        f["train_captions"] = random_captions(rng, n_train, vocab_size, max_len)
        f["train_image_idxs"] = np.repeat(np.arange(num_train_images), captions_per_image)
        f["val_captions"] = random_captions(rng, n_val, vocab_size, max_len)
        f["val_image_idxs"] = np.repeat(np.arange(num_val_images), captions_per_image)

    for split, n_img in (("train", num_train_images), ("val", num_val_images)):
        with h5py.File(os.path.join(out_dir, f"{split}2014_vgg16_fc7_pca.h5"), "w") as f:
            f["features"] = rng.standard_normal((n_img, feature_dim)).astype(np.float32)
        with open(os.path.join(out_dir, f"{split}2014_urls.txt"), "w") as f:
            for i in range(n_img):
                f.write(f"http://example.com/{split}/{i}.jpg\n")

    with open(os.path.join(out_dir, "coco2014_vocab.json"), "w") as f:
        json.dump({"word_to_idx": word_to_idx, "idx_to_word": words}, f)

    return out_dir
