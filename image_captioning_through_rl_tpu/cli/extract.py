"""Feature-extraction CLI: raw images -> VGG16 fc7 (.h5) feature tables.

Produces the exact artifacts the data loader consumes
(``{split}2014_vgg16_fc7[_pca].h5`` with a ``features`` dataset —
reference utilities.py:61-73), closing the loop the reference leaves to
an external extraction script:

    python -m image_captioning_through_rl_tpu.cli.extract \
        --images_dir /path/to/val2014 --split val --out_dir datasets/coco_captioning \
        --weights vgg16.pt --pca_components 512

``--weights`` accepts a torchvision-layout VGG16 ``.pt`` state dict (or
a native ``.ckpt``); omit it for randomly initialized weights (useful
only for pipeline testing). Images are read with PIL in filename order;
an explicit ``--file_list`` pins the order to match a ``*_urls.txt``.
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np


def list_images(images_dir: str, file_list: str | None) -> List[str]:
    if file_list:
        with open(file_list) as f:
            names = [line.strip() for line in f if line.strip()]
        return [os.path.join(images_dir, n) for n in names]
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    return sorted(
        os.path.join(images_dir, n)
        for n in os.listdir(images_dir)
        if n.lower().endswith(exts)
    )


def load_image_batch(paths: List[str], resize: int = 256, crop: int = 224) -> np.ndarray:
    """Decode on host with the canonical VGG evaluation geometry:
    shorter side -> ``resize`` (aspect preserved), then a center
    ``crop x crop``. Squash-resizing distorts the (mostly non-square)
    COCO images and shifts fc7 features away from what pretrained
    weights saw in training. Normalization fuses on-device
    (models/vgg.preprocess; its resize is the identity at 224)."""
    from PIL import Image

    out = np.zeros((len(paths), crop, crop, 3), np.uint8)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            im = im.convert("RGB")
            w, h = im.size
            scale = resize / min(w, h)
            nw, nh = max(crop, round(w * scale)), max(crop, round(h * scale))
            # pin the filter: torchvision's pretrained-VGG eval pipeline
            # resizes BILINEAR; Pillow's default is BICUBIC and varies
            # across versions, which would drift the fc7 features
            im = im.resize((nw, nh), resample=Image.BILINEAR)
            left, top = (nw - crop) // 2, (nh - crop) // 2
            out[i] = np.asarray(
                im.crop((left, top, left + crop, top + crop)), np.uint8
            )
    return out


def main(argv=None) -> None:
    import jax

    from ..data.pca import PCAProjection, fit_pca
    from ..models import vgg
    from ..utils.io import atomic_path, enable_persistent_compile_cache
    from ..utils.logging import print_green

    enable_persistent_compile_cache()

    ap = argparse.ArgumentParser(description="Extract VGG16 fc7 features")
    ap.add_argument("--images_dir", required=True)
    ap.add_argument("--split", default="val", choices=["train", "val"])
    ap.add_argument("--out_dir", default=os.path.join("datasets", "coco_captioning"))
    ap.add_argument("--weights", default="", help="VGG16 weights (.pt torchvision layout or .ckpt)")
    ap.add_argument("--file_list", default="", help="newline list of filenames fixing image order")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--pca_components", type=int, default=0,
                    help="also write the _pca variant with this many components")
    ap.add_argument("--pca_from", default="", help="reuse a fitted projection (.npz)")
    ap.add_argument("--bf16", action="store_true",
                    help="run the VGG16 stack in bfloat16 (half the HBM "
                         "traffic; fc7 values drift at bf16 rounding level "
                         "— fit/apply PCA from the same dtype's features)")
    ap.add_argument("--spmd", action="store_true",
                    help="shard each extraction batch over all local "
                         "chips (batch_size must divide evenly)")
    ap.add_argument("--pca_refit", action="store_true",
                    help="overwrite an existing vgg16_fc7_pca.npz with a fresh "
                         "fit (e.g. after changing --pca_components); any other "
                         "split's _pca features must then be re-extracted with "
                         "--pca_from against the new basis")
    args = ap.parse_args(argv)

    # one weight-resolution rule for every CLI: api.load_feature_extractor
    # owns the .pt / .ckpt / random-with-warning branches
    from ..api import load_feature_extractor

    params = load_feature_extractor(weights=args.weights).vgg_params
    if args.weights:
        print_green(f"[Extract] loaded VGG16 weights from {args.weights}")

    paths = list_images(args.images_dir, args.file_list or None)
    print_green(f"[Extract] {len(paths)} images from {args.images_dir}")

    import h5py
    from functools import partial

    from tqdm import tqdm

    import jax.numpy as jnp

    mesh = None
    if args.spmd:
        from ..parallel import make_mesh

        mesh = make_mesh()

    extract_kwargs = dict(
        batch_size=args.batch_size, loader=load_image_batch,
        progress=partial(tqdm, desc="Extracting"),
        compute_dtype=jnp.bfloat16 if args.bf16 else None, mesh=mesh,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    raw_path = os.path.join(args.out_dir, f"{args.split}2014_vgg16_fc7.h5")
    pca_path = os.path.join(args.out_dir, f"{args.split}2014_vgg16_fc7_pca.h5")
    npz_path = os.path.join(args.out_dir, "vgg16_fc7_pca.npz")

    fitting = bool(args.pca_components) and not args.pca_from
    if fitting and os.path.exists(npz_path) and not args.pca_refit:
        # fail BEFORE the extraction pass: refitting would put this
        # split in a DIFFERENT (rotated) coordinate system than the
        # split that wrote the npz — train/val must share one basis
        raise SystemExit(
            f"[Extract] {npz_path} already exists; pass "
            f"--pca_from {npz_path} so this split reuses the same "
            "projection (refitting would produce an incompatible "
            "basis), or --pca_refit to deliberately refit and "
            "overwrite it (or delete the npz by hand)"
        )

    if fitting:
        # a fresh PCA fit needs the whole fc7 table at once — the one
        # mode that materializes features in RAM
        feats = vgg.extract_features(params, paths, **extract_kwargs
                                     ).astype(np.float32)
        with atomic_path(raw_path) as tmp:
            with h5py.File(tmp, "w") as f:
                f["features"] = feats
        print_green(f"[Extract] wrote {raw_path}")
        proj = fit_pca(feats, k=args.pca_components)
        proj.save(npz_path)
        with atomic_path(pca_path) as tmp:
            with h5py.File(tmp, "w") as f:
                f["features"] = np.asarray(proj.apply(feats), np.float32)
        print_green(f"[Extract] wrote {pca_path}")
    else:
        # stream blocks straight into the h5 tables: RAM stays bounded
        # by the pipeline window however large the collection is
        proj = PCAProjection.load(args.pca_from) if args.pca_from else None
        import contextlib

        with contextlib.ExitStack() as stack:
            # atomic_path enters FIRST so the h5 handle closes before
            # the publish rename (ExitStack unwinds in reverse); a
            # crash mid-stream publishes nothing
            raw_tmp = stack.enter_context(atomic_path(raw_path))
            fraw = stack.enter_context(h5py.File(raw_tmp, "w"))
            raw_d = fraw.create_dataset(
                "features", (len(paths), 4096), dtype="f4")
            pca_d = None
            if proj is not None:
                pca_tmp = stack.enter_context(atomic_path(pca_path))
                fpca = stack.enter_context(h5py.File(pca_tmp, "w"))
                pca_d = fpca.create_dataset(
                    "features",
                    (len(paths), int(proj.components.shape[1])), dtype="f4")
            row = 0
            for block in vgg.iter_features(params, paths, **extract_kwargs):
                raw_d[row : row + len(block)] = np.asarray(block, np.float32)
                if pca_d is not None:
                    pca_d[row : row + len(block)] = np.asarray(
                        proj.apply(block), np.float32)
                row += len(block)
        print_green(f"[Extract] wrote {raw_path}")
        if proj is not None:
            print_green(f"[Extract] wrote {pca_path}")


if __name__ == "__main__":
    main()
