"""Pippenger-only kernel bench (unbuffered)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from xelis_he_tpu.ops.curve import jax_curve
from xelis_he_tpu.ops.msm import MsmEngine, decompose_digits
from xelis_he_tpu.pyref.ristretto import mul_base, multiscalar_mul

curve = jax_curve()
n = 4096
pts = [mul_base(i + 1) for i in range(256)] * (n // 256)
scs = [(0x123457 * (i + 1)) % (2**253) for i in range(n)]
batch = tuple(jnp.asarray(c) for c in curve.from_points(pts))

for c_win in [int(x) for x in (sys.argv[1:] or ["8", "13"])]:
    eng = MsmEngine(curve, window=c_win, use_jax=True)
    pip = jax.jit(eng.msm)
    digs = jnp.asarray(decompose_digits(scs, c_win))
    t0 = time.perf_counter()
    res = jax.block_until_ready(pip(batch, digs))
    print(f"msm_pip c={c_win} n={n}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(pip(batch, digs))
        best = min(best, time.perf_counter() - t0)
    print(f"msm_pip c={c_win} n={n}: {best*1000:.1f} ms", flush=True)
    # correctness spot-check
    got = curve.to_points(tuple(c[None] for c in res))[0]
    want = multiscalar_mul(scs[:64], pts[:64])
    want = multiscalar_mul(scs, pts)
    print("  matches pyref:", got == want, flush=True)
