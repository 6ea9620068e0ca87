"""COCO-2014 captioning bundle loader and batch iterators.

Reads the CS231n-style dataset layout the reference uses
(utilities.py:45-113): ``coco2014_captions.h5`` (captions + image-index
indirection), ``{train,val}2014_vgg16_fc7[_pca].h5`` feature tables,
``coco2014_vocab.json`` and ``{train,val}2014_urls.txt``.

Host-side the loader materializes numpy arrays; training code moves the
full feature/caption tables to device HBM once (they are ~200 MB for
the PCA bundle) and gathers minibatches on-chip, so the per-step
host->device traffic is just the index vector.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from .. import END_ID


@dataclasses.dataclass
class CocoData:
    """In-memory dataset bundle. Field names match the reference's data
    dict keys (utilities.py:45-113) so downstream code reads naturally."""

    train_captions: np.ndarray  # [Nc_train, 17] int
    train_image_idxs: np.ndarray  # [Nc_train] int
    val_captions: np.ndarray
    val_image_idxs: np.ndarray
    train_features: np.ndarray  # [Ni_train, F] float32
    val_features: np.ndarray
    word_to_idx: Dict[str, int]
    idx_to_word: Dict[int, str]
    train_urls: np.ndarray  # [Ni_train] str
    val_urls: np.ndarray
    train_captions_lens: np.ndarray  # [Nc_train] int (END pos + 1)
    val_captions_lens: np.ndarray
    embeddings: Optional[np.ndarray] = None  # aligned word vectors or None

    def split(self, name: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        caps = getattr(self, f"{name}_captions")
        idxs = getattr(self, f"{name}_image_idxs")
        feats = getattr(self, f"{name}_features")
        urls = getattr(self, f"{name}_urls")
        return caps, idxs, feats, urls

    @property
    def vocab_size(self) -> int:
        return len(self.word_to_idx)


def caption_lengths(captions: np.ndarray) -> np.ndarray:
    """Length = first index of the END token + 1 (utilities.py:98-103).

    Rows without an END token are a malformed bundle: ``argmax`` of
    all-False would silently report length 1, making the XE loss mask
    out the whole caption with no diagnostic — validate instead.
    """
    is_end = captions == END_ID
    missing = ~is_end.any(axis=1)
    if missing.any():
        bad = np.flatnonzero(missing)
        raise ValueError(
            f"{bad.size} caption row(s) contain no <END> token "
            f"(first bad rows: {bad[:5].tolist()}); the COCO bundle is "
            "malformed or truncated"
        )
    return np.argmax(is_end, axis=1) + 1


def load_vocab(path: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Parse ``coco2014_vocab.json`` -> ``(word_to_idx, idx_to_word)``
    (the vocab half of reference utilities.py:75-80; ``idx_to_word``
    ships as a list or a str-keyed dict depending on the bundle)."""
    with open(path) as f:
        vocab = json.load(f)
    word_to_idx = vocab["word_to_idx"]
    # JSON keys are strings; normalize to int -> word
    idx_to_word = {int(k): v for k, v in enumerate(vocab["idx_to_word"])} if isinstance(
        vocab["idx_to_word"], list
    ) else {int(k): v for k, v in vocab["idx_to_word"].items()}
    return word_to_idx, idx_to_word


def load_data(
    base_dir: str,
    max_train: Optional[int] = None,
    pca_features: bool = True,
    print_keys: bool = False,
    seed: Optional[int] = None,
) -> CocoData:
    """Load the bundle from ``base_dir``.

    ``max_train`` subsamples the training captions *with replacement*
    exactly like the reference (np.random.randint, utilities.py:92-96).
    """
    import h5py  # local import: keep the core importable without h5py

    raw: Dict[str, np.ndarray] = {}
    with h5py.File(os.path.join(base_dir, "coco2014_captions.h5"), "r") as f:
        for k, v in f.items():
            raw[k] = np.asarray(v)

    variant = "_pca" if pca_features else ""
    for split in ("train", "val"):
        with h5py.File(os.path.join(base_dir, f"{split}2014_vgg16_fc7{variant}.h5"), "r") as f:
            raw[f"{split}_features"] = np.asarray(f["features"])

    word_to_idx, idx_to_word = load_vocab(
        os.path.join(base_dir, "coco2014_vocab.json"))

    urls = {}
    for split in ("train", "val"):
        with open(os.path.join(base_dir, f"{split}2014_urls.txt")) as f:
            urls[split] = np.asarray([line.strip() for line in f])

    if max_train is not None:
        rng = np.random.default_rng(seed) if seed is not None else np.random
        num_train = raw["train_captions"].shape[0]
        mask = rng.randint(num_train, size=max_train) if seed is None else rng.integers(
            num_train, size=max_train
        )
        raw["train_captions"] = raw["train_captions"][mask]
        raw["train_image_idxs"] = raw["train_image_idxs"][mask]

    data = CocoData(
        train_captions=raw["train_captions"].astype(np.int32),
        train_image_idxs=raw["train_image_idxs"].astype(np.int32),
        val_captions=raw["val_captions"].astype(np.int32),
        val_image_idxs=raw["val_image_idxs"].astype(np.int32),
        train_features=raw["train_features"].astype(np.float32),
        val_features=raw["val_features"].astype(np.float32),
        word_to_idx=word_to_idx,
        idx_to_word=idx_to_word,
        train_urls=urls["train"],
        val_urls=urls["val"],
        train_captions_lens=caption_lengths(raw["train_captions"]),
        val_captions_lens=caption_lengths(raw["val_captions"]),
    )
    if print_keys:
        for f in dataclasses.fields(data):
            v = getattr(data, f.name)
            if isinstance(v, np.ndarray):
                print(f.name, type(v), v.shape, v.dtype)
            elif v is not None:
                print(f.name, type(v), len(v))
    return data


def decode_captions(captions: np.ndarray, idx_to_word: Dict[int, str]):
    """Token ids -> text. Skips <NULL>, keeps words up to and including
    <END>, then stops (reference utilities.py:116-140)."""
    captions = np.asarray(captions)
    singleton = captions.ndim == 1
    if singleton:
        captions = captions[None]
    decoded = []
    for row in captions:
        words = []
        for tok in row:
            word = idx_to_word[int(tok)]
            if word != "<NULL>":
                words.append(word)
            if word == "<END>":
                break
        decoded.append(" ".join(words))
    return decoded[0] if singleton else decoded


def get_coco_batch(
    data: CocoData,
    batch_size: int = 100,
    split: str = "train",
    rng: Optional[np.random.Generator] = None,
):
    """One random batch sampled *with replacement* (reference
    utilities.py:143-157, quirk Q8)."""
    rng = rng or np.random.default_rng()
    caps, idxs, feats, urls = data.split(split)
    mask = rng.integers(caps.shape[0], size=batch_size)
    image_idxs = idxs[mask]
    return caps[mask], feats[image_idxs], urls[image_idxs]


def epoch_minibatch_indices(
    n: int,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    drop_remainder: bool = False,
) -> Iterator[np.ndarray]:
    """THE epoch index stream: one permutation, sliced in order.

    The single definition shared by :func:`get_coco_minibatches` and
    :class:`..data.device._MinibatchMixin` — host-table, device-table
    and multi-host loops must consume IDENTICAL index streams (the
    mesh-vs-plain equivalence tests depend on it)."""
    rng = rng or np.random.default_rng()
    perm = rng.permutation(n)
    for i in range(0, n, batch_size):
        mask = perm[i : i + batch_size]
        if drop_remainder and mask.shape[0] < batch_size:
            return
        yield mask


def get_coco_minibatches(
    data: CocoData,
    batch_size: int = 100,
    split: str = "train",
    rng: Optional[np.random.Generator] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Epoch iterator: one random permutation, sliced into minibatches
    (reference utilities.py:160-178). Multiple captions share an image,
    hence the per-caption feature gather through ``image_idxs``."""
    caps, idxs, feats, urls = data.split(split)
    for mask in epoch_minibatch_indices(caps.shape[0], batch_size, rng):
        image_idxs = idxs[mask]
        yield caps[mask], feats[image_idxs], urls[image_idxs]


def get_coco_validation_data(data: CocoData):
    """Full val split accessor (reference utilities.py:181-190)."""
    return data.val_captions, data.val_features, data.val_urls
