"""Device timings of the Pallas kernels on the real-TPU block-verify path.

Usage: python scripts/bench_pallas.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(label, fn, iters=8):
    t0 = time.perf_counter()
    fn()  # warmup/compile
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1000:.2f} ms  (compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from xelis_he_tpu.ops.curve import jax_curve
    from xelis_he_tpu.ops.pallas_msm import (
        TILE,
        compress_pallas,
        decompress_pallas,
        msm_windowed_lanes_pallas,
        recode_signed4,
        tile_sums_pallas,
    )
    from xelis_he_tpu.pyref.ristretto import mul_base

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    curve = jax_curve()

    n_max = 4608
    pts = [mul_base(i + 1) for i in range(256)] * (n_max // 256)
    scs = [(0x123457 * (i + 1)) % (2**253) for i in range(n_max)]
    batch_all = tuple(jnp.asarray(c) for c in curve.from_points(pts))

    # --- decompress at block size ---
    enc = np.frombuffer(
        b"".join(p.compress() for p in pts[:3072]), dtype=np.uint8
    ).reshape(3072, 32)
    dec = jax.jit(decompress_pallas)
    for n in (1024, 3072):
        e = jnp.asarray(enc[:n])
        timeit(f"decompress_pallas {n}", lambda e=e: jax.block_until_ready(dec(e)))

    # --- compress ---
    comp = jax.jit(compress_pallas)
    for n in (256, 3072):
        b = tuple(c[:n] for c in batch_all)
        timeit(f"compress_pallas {n}", lambda b=b: jax.block_until_ready(comp(b)))

    # --- windowed MSM lanes ---
    msmj = jax.jit(msm_windowed_lanes_pallas)
    for n in (1536, 4608):
        b = tuple(c[:n] for c in batch_all)
        digs = jnp.asarray(recode_signed4(scs[:n]))
        timeit(
            f"msm_windowed_lanes {n}",
            lambda b=b, d=digs: jax.block_until_ready(msmj(b, d)),
        )

    # --- tile sums ---
    ts = jax.jit(tile_sums_pallas)
    b = tuple(c[:4608] for c in batch_all)
    timeit("tile_sums 4608", lambda: jax.block_until_ready(ts(b)))

    # --- upload / sync costs ---
    x = np.zeros((4608, 4, 18), dtype=np.uint32)
    timeit("upload 4608x4x18 u32", lambda: jax.block_until_ready(jnp.asarray(x)))
    y = jnp.zeros((4608, 4, 18), dtype=jnp.uint32).block_until_ready()
    timeit("pull 4608x4x18 u32", lambda: np.asarray(y))
    z = jnp.zeros((8,), dtype=jnp.uint8).block_until_ready()
    timeit("pull tiny", lambda: np.asarray(z))
    f = jax.jit(lambda a: a + 1)
    f(z).block_until_ready()
    timeit("noop dispatch+sync", lambda: np.asarray(f(z)))


if __name__ == "__main__":
    main()
