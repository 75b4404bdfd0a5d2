"""Persistent XLA compilation cache (``utils/compile_cache.py``).

The reference's torch stack has no compile step; here every fresh process
pays a full jit compile, so the cache is the cold-start story.  Locked
contracts: (a) the first process POPULATES the cache directory and a fresh
process compiling the same program REUSES it (same entry set, same result
— jax's key covers HLO + backend, so an unchanged program must hit);
(b) the documented off-switch values disable it; (c) the env-var default
resolves; (d) the CLI ``--compile-cache`` flag reaches jax config in a real
subcommand run.  Everything runs in fresh subprocesses: the cache is
process-global jax config, which must not leak into this test session.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Argv: cache_dir_or_sentinel.  "ENV" exercises the path=None resolution.
_SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from yolofastest_tpu.utils.compile_cache import enable_compile_cache
arg = sys.argv[1]
used = enable_compile_cache(None if arg == "ENV" else arg)
import jax.numpy as jnp
out = jax.jit(lambda x: (x * 2.0 + 1.0).sum())(jnp.arange(8.0))
print(json.dumps({"used": used, "result": float(out)}))
"""


def _run(arg, env_cache=None):
    env = dict(os.environ)
    env.pop("YF_COMPILE_CACHE", None)
    if env_cache is not None:
        env["YF_COMPILE_CACHE"] = env_cache
    r = subprocess.run([sys.executable, "-c", _SCRIPT, str(arg)],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr
    return json.loads(r.stdout.strip().splitlines()[-1])


def _entries(cache_dir):
    out = set()
    for root, _, files in os.walk(cache_dir):
        for f in files:
            out.add(os.path.relpath(os.path.join(root, f), cache_dir))
    return out


def test_populates_then_fresh_process_reuses(tmp_path):
    cache = str(tmp_path / "xla")
    first = _run(cache)
    assert first["used"] == cache
    assert first["result"] == 64.0  # sum(2*(0..7)+1)
    entries = _entries(cache)
    assert entries, "first compile wrote no cache entries"

    second = _run(cache)
    assert second["result"] == 64.0
    # Same program, same backend -> same keys: a hit adds nothing.
    assert _entries(cache) == entries


def test_off_values_disable(tmp_path):
    for off in ("off", "", "none", "0"):
        assert _run(off)["used"] is None
    # and nothing was created under an off run's would-be default
    assert not os.path.exists(str(tmp_path / "never"))


def test_env_var_resolution(tmp_path):
    cache = str(tmp_path / "from_env")
    used = _run("ENV", env_cache=cache)["used"]
    assert used == cache and _entries(cache)

    assert _run("ENV", env_cache="off")["used"] is None


def test_cli_flag_wiring(monkeypatch, capsys):
    """main() hands --compile-cache to enable_compile_cache before dispatch
    (in-process with the helper stubbed: a real enable would mutate this
    test session's global jax config; the real behavior is covered by the
    subprocess tests above)."""
    import yolofastest_tpu.utils.compile_cache as cc
    from yolofastest_tpu.cli import _NO_JAX_COMMANDS, main

    calls = []
    monkeypatch.setattr(cc, "enable_compile_cache",
                        lambda path: calls.append(path))
    assert main(["--compile-cache", "/tmp/never-used",
                 "info", "--arch", "fastest"]) == 0
    assert calls == ["/tmp/never-used"]
    assert "params" in capsys.readouterr().out.lower()

    # the import-light converters stay jax-free
    assert {"txt2xml", "voc2coco"} == _NO_JAX_COMMANDS
