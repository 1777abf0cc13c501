"""True round-trip timings: every measurement pulls a data-dependent result.

Separates fixed dispatch+transfer latency from kernel compute by comparing
k chained kernel applications (k = 1, 2, 4): slope = per-kernel compute.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rt(label, fn, iters=6):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label}: med {ts[len(ts)//2]*1000:.2f} ms  min {ts[0]*1000:.2f} ms", flush=True)
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xelis_he_tpu/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from xelis_he_tpu.ops.curve import jax_curve
    from xelis_he_tpu.ops.pallas_msm import (
        compress_pallas,
        decompress_pallas,
        msm_windowed_lanes_pallas,
        recode_signed4,
        tile_sums_pallas,
    )
    from xelis_he_tpu.pyref.ristretto import mul_base

    print("backend:", jax.default_backend(), flush=True)
    curve = jax_curve()

    n = 4608
    pts = [mul_base(i + 1) for i in range(256)] * (n // 256)
    scs = [(0x123457 * (i + 1)) % (2**253) for i in range(n)]
    batch = tuple(jnp.asarray(c) for c in curve.from_points(pts))
    digs = jnp.asarray(recode_signed4(scs))

    # pure RT floor
    f1 = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,), dtype=jnp.uint8)
    np.asarray(f1(z))
    rt("noop dispatch+pull", lambda: np.asarray(f1(z)))

    # chained MSM kernels: slope = true kernel time
    def chain(k):
        def f(b, d):
            out = b
            for _ in range(k):
                out = msm_windowed_lanes_pallas(out, d)
            return out[0][:1, :1]

        return jax.jit(f)

    for k in (1, 2):
        fk = chain(k)
        np.asarray(fk(batch, digs))
        rt(f"msm_windowed x{k} (n={n}) +pull", lambda fk=fk: np.asarray(fk(batch, digs)))

    # decompress
    enc = np.frombuffer(b"".join(p.compress() for p in pts[:3072]), dtype=np.uint8).reshape(3072, 32)
    enc_j = jnp.asarray(enc)
    fd = jax.jit(lambda e: decompress_pallas(e)[0][0][:1, :1])
    np.asarray(fd(enc_j))
    rt("decompress (n=3072) +pull", lambda: np.asarray(fd(enc_j)))

    # tile_sums
    f = jax.jit(lambda b: tile_sums_pallas(b)[0][:1, :1])
    np.asarray(f(batch))
    rt("tile_sums (n=4608) +pull", lambda: np.asarray(f(batch)))

    # compress
    f = jax.jit(lambda b: compress_pallas(b)[:1, :1])
    np.asarray(f(batch))
    rt("compress (n=4608) +pull", lambda: np.asarray(f(batch)))

    # upload cost: fresh numpy each time forces a real transfer
    xs = [np.random.randint(0, 2**15, (4608, 4, 18)).astype(np.uint32) for _ in range(8)]
    g = jax.jit(lambda a: a.sum(dtype=jnp.uint32))
    np.asarray(g(jnp.asarray(xs[0])))
    i = [0]

    def up():
        i[0] = (i[0] + 1) % 8
        return np.asarray(g(jnp.asarray(xs[i[0]])))

    rt("upload 1.3MB + tiny-reduce + pull", up)


if __name__ == "__main__":
    main()
