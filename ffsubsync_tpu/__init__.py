# -*- coding: utf-8 -*-
"""ffsubsync-tpu: language-agnostic subtitle synchronization, TPU-native.

Public API parity with the reference (ffsubsync/__init__.py:20-22 plus
``make_parser`` per its README): ``main``, ``run``, ``ProgressInfo``,
``make_parser``, ``__version__``. Heavy modules load lazily so that
``import ffsubsync_tpu`` stays cheap for embedders that only want one piece.
"""
import logging
import sys

from ffsubsync_tpu.version import __version__  # noqa: F401

try:
    from rich.console import Console
    from rich.logging import RichHandler

    handler = RichHandler(console=Console(file=sys.stderr))
except ImportError:  # pragma: no cover
    handler = logging.StreamHandler(sys.stderr)  # type: ignore[assignment]
logging.basicConfig(format="%(message)s", handlers=[handler], level=logging.INFO)

_LAZY = {
    "main": ("ffsubsync_tpu.sync", "main"),
    "run": ("ffsubsync_tpu.sync", "run"),
    "make_parser": ("ffsubsync_tpu.cli", "make_parser"),
    "ProgressInfo": ("ffsubsync_tpu.utils.progress", "ProgressInfo"),
}

__all__ = ["main", "run", "make_parser", "ProgressInfo", "__version__"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module_name, attr = _LAZY[name]
        return getattr(importlib.import_module(module_name), attr)
    raise AttributeError("module %r has no attribute %r" % (__name__, name))
