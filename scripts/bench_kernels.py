"""Standalone device-kernel timings: decompress, msm_daa, dual_mul.

Usage: python scripts/bench_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(label, fn, iters=5):
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1000:.1f} ms")
    return best


def main():
    import jax
    import jax.numpy as jnp

    from xelis_he_tpu.ops.curve import jax_curve
    from xelis_he_tpu.ops.msm import MsmEngine, decompose_bits
    from xelis_he_tpu.pyref.ristretto import mul_base

    curve = jax_curve()
    engine = MsmEngine(curve, use_jax=True)

    # fixture points
    n_max = 4096
    pts = [mul_base(i + 1) for i in range(256)] * (n_max // 256)
    scs = [(0x123457 * (i + 1)) % (2**253) for i in range(n_max)]
    batch_all = tuple(jnp.asarray(c) for c in curve.from_points(pts))
    t_pull = time.perf_counter()

    enc = np.frombuffer(b"".join(p.compress() for p in pts[:2600]), dtype=np.uint8).reshape(2600, 32)
    enc_j = jnp.asarray(enc)

    dec = jax.jit(curve.decompress)
    timeit("decompress 2600", lambda: jax.block_until_ready(dec(enc_j)))

    daa = jax.jit(engine.msm_daa)
    for n in (2048, 4096):
        b = tuple(c[:n] for c in batch_all)
        bits = jnp.asarray(decompose_bits(scs[:n]))
        timeit(f"msm_daa {n}", lambda b=b, bits=bits: jax.block_until_ready(daa(b, bits)))

    # Pippenger windows
    from xelis_he_tpu.ops.msm import MsmEngine as _E, decompose_digits

    for c_win in (8, 10, 13):
        eng = _E(curve, window=c_win, use_jax=True)
        pip = jax.jit(eng.msm)
        for n in (2048, 4096):
            b = tuple(x[:n] for x in batch_all)
            digs = jnp.asarray(decompose_digits(scs[:n], c_win))
            t0 = time.perf_counter()
            jax.block_until_ready(pip(b, digs))
            compile_s = time.perf_counter() - t0
            timeit(
                f"msm_pip c={c_win} n={n} (compile {compile_s:.0f}s)",
                lambda b=b, digs=digs, pip=pip: jax.block_until_ready(pip(b, digs)),
            )

    # dual mul (batched schnorr): 128 lanes
    dual = jax.jit(engine.batch_dual_mul)
    n = 128
    b = tuple(c[:n] for c in batch_all)
    bits_a = jnp.asarray(decompose_bits(scs[:n]))
    bits_b = jnp.asarray(decompose_bits(scs[n : 2 * n]))
    doubles = [mul_base(7)]
    from xelis_he_tpu.elgamal import H

    pt = H
    tbl = [pt]
    for _ in range(252):
        pt = pt.double()
        tbl.append(pt)
    q_table = tuple(jnp.asarray(c) for c in curve.from_points(tbl))
    timeit("dual_mul 128", lambda: jax.block_until_ready(dual(b, bits_a, bits_b, q_table)))

    # raw field op throughput: mul on (8192, 18)
    fe = curve.fe
    a = batch_all[0][:256]
    big = jnp.tile(a, (32, 1))
    mulj = jax.jit(lambda x: fe.mul(x, x))
    timeit("fe.mul 8192 lanes", lambda: jax.block_until_ready(mulj(big)))

    addj = jax.jit(lambda p: curve.add(p, p))
    bb = tuple(jnp.tile(c[:256], (32, 1)) for c in batch_all)
    timeit("curve.add 8192 lanes", lambda: jax.block_until_ready(addj(bb)))


if __name__ == "__main__":
    main()
