"""Tile-width and kernel-structure experiments for the quad MSM kernel.

1. isolated field mul at T=256 vs 512 (tile-width penalty)
2. quad kernel at QTILE 256 vs 512 (both tiers)

Usage: python scripts/bench_qtile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pull_time(fn, iters=4):
    np.asarray(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import xelis_he_tpu.ops.pallas_msm as PM
    from xelis_he_tpu.ops.pallas_msm import NLIMBS, _mul_t

    REPS = 8192
    REPL = 4

    for tile in (128, 256, 512):
        grid = 16384 // tile

        def kernel(x_ref, y_ref, out_ref):
            y = y_ref[:]
            xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

            def body(_, xs):
                return tuple(_mul_t(v, y, jnp) for v in xs)

            xs = jax.lax.fori_loop(0, REPS, body, xs)
            out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

        call = pl.pallas_call(
            kernel,
            grid=(REPL, grid),
            in_specs=[
                pl.BlockSpec((NLIMBS, tile), lambda r, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((NLIMBS, tile), lambda r, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NLIMBS, tile), lambda r, i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NLIMBS, 16384), jnp.uint32),
        )
        x = jnp.asarray(np.random.randint(0, 1 << 15, (NLIMBS, 16384), dtype=np.uint32))
        y = jnp.asarray(np.random.randint(1, 1 << 15, (NLIMBS, 16384), dtype=np.uint32))
        j = jax.jit(lambda a, b: call(a, b))
        t = pull_time(lambda: j(x, y))
        rate = REPL * REPS * 4 * 16384 / t
        print(json.dumps({"metric": f"fe15_mul_T{tile}", "Mmul_s": round(rate / 1e6, 1)}))

    # quad kernel tile sweep
    from xelis_he_tpu.ops.curve import jax_curve
    from xelis_he_tpu.ops.pallas_msm import (
        msm_windowed_lanes_pallas_k4, recode_signed4, K_PACK,
    )
    from xelis_he_tpu.pyref.ristretto import mul_base

    curve = jax_curve()
    S = 16384
    base_pts = [mul_base(i + 1) for i in range(256)]
    pts = base_pts * (K_PACK * S // 256)
    scs = [(0x123457 * (i + 1)) % (2 ** 253 - 1) for i in range(K_PACK * S)]
    b = curve.from_points(pts)
    batch4 = tuple(jnp.asarray(np.asarray(c).reshape(K_PACK, S, NLIMBS)) for c in b)
    dig = np.asarray(recode_signed4(scs))  # (64, n)
    digits = jnp.asarray(np.stack([dig[:, k * S:(k + 1) * S] for k in range(K_PACK)], axis=0))

    for tile in (256, 512):
        for fe13 in ("0", "1"):
            os.environ["XELIS_FE13"] = fe13
            PM.QTILE = tile
            PM._windowed_call_k4.cache_clear()
            PM._windowed_call_k4_fe13.cache_clear()
            j = jax.jit(lambda b, d: msm_windowed_lanes_pallas_k4(b, d)[0])
            try:
                t = pull_time(lambda: j(batch4, digits))
                print(json.dumps({
                    "metric": f"quad_T{tile}_fe13={fe13}",
                    "kpts_s": round(K_PACK * S / t / 1e3, 1),
                }))
            except Exception as e:
                print(json.dumps({
                    "metric": f"quad_T{tile}_fe13={fe13}",
                    "error": str(e)[:120],
                }))


if __name__ == "__main__":
    main()
