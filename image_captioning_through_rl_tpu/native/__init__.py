"""Native (C++) runtime components.

Currently: ``fastmetrics`` — n-gram scoring kernels for the eval path
(corpus BLEU accumulators and CIDEr), built on demand with the system
C++ toolchain and loaded through ctypes. Everything here is optional:
callers fall back to the pure-Python implementations when the toolchain
is unavailable.
"""

from .build import load_fastmetrics, native_available

__all__ = ["load_fastmetrics", "native_available"]
