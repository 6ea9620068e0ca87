"""File naming and result-file IO matching the reference conventions."""

from __future__ import annotations

import contextlib as _contextlib
import os
from typing import Optional

# process umask, captured once at import: os.umask can only be READ by
# setting it, and doing that per write would race concurrent writer
# threads (briefly zeroing the process umask). Shared by every atomic
# mkstemp+replace writer in the package (checkpoints, embedding
# exports) to restore the umask-governed mode mkstemp suppresses.
UMASK = os.umask(0)
os.umask(UMASK)


@_contextlib.contextmanager
def atomic_write(path: str):
    """Yield a binary file handle that publishes to ``path`` atomically.

    Writes go to a uniquely-named temp file in the target directory
    (concurrent savers each publish a complete file instead of
    interleaving), the umask-governed mode replaces mkstemp's 0600 (so
    shared log dirs keep readable artifacts, as a plain ``open()``
    would), and ``os.replace`` makes the publish atomic — no torn
    checkpoints/exports on interruption. On error the temp file is
    removed and nothing is published.
    """
    import tempfile

    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".tmp.")
    try:
        with os.fdopen(fd, "wb") as f:
            yield f
        os.chmod(tmp, 0o666 & ~UMASK)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


@_contextlib.contextmanager
def atomic_path(path: str):
    """Like :func:`atomic_write`, but yields a temp *path* instead of an
    open handle, for writers that need a filename (h5py, np.savez).
    Same contract: unique temp in the target dir, umask-governed mode,
    ``os.replace`` publish, nothing published on error."""
    import tempfile

    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".tmp.")
    os.close(fd)
    try:
        yield tmp
        os.chmod(tmp, 0o666 & ~UMASK)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def enable_persistent_compile_cache() -> None:
    """Point JAX at a persistent compilation cache so repeated CLI runs
    skip recompiles (a VGG16 conv compile costs minutes on a
    remote-compile TPU backend). Honors an explicit
    ``JAX_COMPILATION_CACHE_DIR``; otherwise uses
    ``$XDG_CACHE_HOME/icrl_tpu_jax_cache``."""
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "icrl_tpu_jax_cache",
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)


def resolve_checkpoint(directory: str, fname: str) -> str:
    """Resolve a network file in ``directory``: the native ``.ckpt``
    name is preferred; when absent, fall back to the reference's ``.pt``
    file of the same stem (the torch converter loads it), so a path can
    point straight at a reference ``models_pretrained/`` dir. Shared by
    the training and captioning CLIs — the two must resolve the same
    file for the same layout."""
    path = os.path.join(directory or ".", fname)
    if not os.path.exists(path):
        pt = os.path.splitext(path)[0] + ".pt"
        if os.path.exists(pt):
            return pt
    return path


def get_filename(base_name: str, bidirectional: bool, curriculum: Optional[bool] = None) -> str:
    """Checkpoint/result naming scheme: ``_bidirectional`` and/or
    ``_curriculum`` suffixes before the extension (reference
    utilities.py:326-338), e.g. ``a2cNetwork.pt`` ->
    ``a2cNetwork_bidirectional_curriculum.pt``."""
    name, ext = os.path.splitext(base_name)
    if bidirectional:
        name += "_bidirectional"
    if curriculum:
        name += "_curriculum"
    return name + ext


def append_results(results_path: str, text: str, header: str = "results") -> None:
    """Append a banner-delimited block to the results file
    (reference trainers.py:394-397, utilities.py:354-358)."""
    os.makedirs(os.path.dirname(results_path) or ".", exist_ok=True)
    with open(results_path, "a") as f:
        f.write("\n" + "-" * 10 + f" {header} " + "-" * 10 + "\n")
        f.write(text)
        f.write("\n" + "-" * 10 + f" {header} " + "-" * 10 + "\n")


def global_minibatch_number(epoch: int, batch_id: int, batch_size: int) -> int:
    """TensorBoard x-axis counter, reproducing the reference formula
    ``epoch * batch_size + batch_id`` (utilities.py:204-212, quirk Q10 —
    note it scales by batch_size, not batches-per-epoch)."""
    return epoch * batch_size + batch_id
