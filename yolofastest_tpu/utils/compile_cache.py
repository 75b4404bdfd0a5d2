"""Persistent XLA compilation cache for every CLI entry point.

The reference's torch models pay no compile step, so it has no analogue;
here every fresh process re-lowers and re-compiles its jitted programs
(20-60 s per program against a remote-TPU backend — the dominant cold-start
cost of a CLI invocation).  jax ships a persistent on-disk compilation
cache keyed on (HLO, compile options, backend version) that turns the
second process's compile into a deserialize; this module is the one switch
that turns it on with sane defaults, wired into ``cli.main`` so every
subcommand benefits.

Cache correctness is jax's contract (the key includes the backend + its
version, so driver upgrades miss cleanly instead of reusing stale
executables); worst case a backend that cannot serialize executables simply
never populates the cache and runs exactly as before, which is why it is
safe to default-on.
"""

from __future__ import annotations

import os
from typing import Optional

_OFF_VALUES = ("", "off", "none", "0")

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "yolofastest_tpu", "xla"
)


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable jax's persistent compilation cache; returns the directory used.

    ``path=None`` resolves the ``YF_COMPILE_CACHE`` env var, then the
    default ``~/.cache/yolofastest_tpu/xla``.  Passing (or setting the env
    var to) ``"off"``/``""``/``"none"``/``"0"`` disables the cache and
    returns ``None``.  The min-compile-time and min-entry-size gates are
    lowered to zero so even the small detect/decode programs qualify —
    jax's defaults only cache second-scale compiles, which would skip most
    of this model's programs on CPU.

    Call before the first compile (config updates after a compile only
    affect later compiles, which is still safe, just less useful).
    """
    if path is None:
        path = os.environ.get("YF_COMPILE_CACHE", DEFAULT_DIR)
    if path.strip().lower() in _OFF_VALUES:
        return None
    import jax

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
