"""Loader for the native host data-path extension (native/).

Builds on first use (make) and falls back to pure numpy when the
toolchain is unavailable — every native entry point has a numpy
equivalent in :mod:`mccnn_tpu.train.augment`.
"""

from __future__ import annotations

import os
import subprocess
import sys

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_mod = None
_tried = False


def get() -> object | None:
    """The mccnn_native module, or None if unavailable."""
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    if _NATIVE_DIR not in sys.path:
        sys.path.insert(0, _NATIVE_DIR)
    try:
        import mccnn_native  # type: ignore
        _mod = mccnn_native
        return _mod
    except ImportError:
        pass
    try:
        subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                       capture_output=True, timeout=120)
        import mccnn_native  # type: ignore
        _mod = mccnn_native
    except Exception:
        _mod = None
    return _mod
