"""13-bit field-tier carry-discipline experiments (VERDICT r4 item 4).

Measures, on the real chip:
  1. _mul13 with full 3-pass normalization (round-4 landed form)
  2. _mul13 with a 2-pass (wide+simple) output, row 0 left <= ~2^18.6
     and an extra _carry13 charged at the consumer (the deferred form)
  3. the 15-bit production _mul_t for reference
  4. quad kernel k4 (15-bit) vs k4_fe13 end-kernel pts/s

Usage: python scripts/bench_fe13.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TILE = 512
GRID = 32
REPL = 4


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

    from xelis_he_tpu.ops.pallas_msm import (
        NL13, _carry13, _carry13_wide, _carry13_mul_out, _mul13, _mul_t,
        NLIMBS, _cat,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    def lane_call(kernel, rows):
        return pl.pallas_call(
            kernel,
            grid=(REPL, GRID),
            in_specs=[
                pl.BlockSpec((rows, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (rows, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((rows, GRID * TILE), jnp.uint32),
        )

    def rate(kernel, rows, reps, muls_per_rep, bits):
        x = jnp.asarray(
            np.random.randint(0, 1 << bits, (rows, GRID * TILE), dtype=np.uint32)
        )
        y = jnp.asarray(
            np.random.randint(1, 1 << bits, (rows, GRID * TILE), dtype=np.uint32)
        )
        call = lane_call(kernel, rows)
        j = jax.jit(lambda a, b: call(a, b))
        t = pull_time(lambda: j(x, y))
        return REPL * reps * muls_per_rep * GRID * TILE / t

    REPS = 8192

    # deferred mul: fold + wide pass + simple pass, NO row-0 fixup
    def _mul13_2pass(a, b, jnp):
        T = a.shape[1]
        z = lambda r: jnp.zeros((r, T), jnp.uint32)
        acc = jnp.zeros((2 * NL13 - 1, T), dtype=jnp.uint32)
        for j in range(NL13):
            p = a * b[j : j + 1]
            acc = acc + _cat([z(j), p, z(NL13 - 1 - j)], jnp)
        hi = acc[NL13:]
        M13 = jnp.uint32((1 << 13) - 1)
        FOLD = jnp.uint32(608)
        hi_lo = (hi & M13) * FOLD
        hi_hi = (hi >> 13) * FOLD
        low = acc[:NL13]
        low = low + _cat([hi_lo, z(1)], jnp)
        low = low + _cat([z(1), hi_hi], jnp)
        return _carry13(_carry13_wide(low, jnp), jnp)

    # 1. landed 3-pass form
    def k_full(x_ref, y_ref, out_ref):
        y = y_ref[:]
        xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

        def body(_, xs):
            return tuple(_mul13(v, y, jnp) for v in xs)

        xs = jax.lax.fori_loop(0, REPS, body, xs)
        out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

    r = rate(k_full, NL13, REPS, 4, 13)
    print(json.dumps({"metric": "fe13_mul_3pass", "Mmul_s": round(r / 1e6, 1)}))

    # 2. deferred 2-pass form + consumer carry (the add between muls is
    # charged here: carry13(x + 1) models the point-op add that follows)
    def k_def(x_ref, y_ref, out_ref):
        y = y_ref[:]
        xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

        def body(_, xs):
            return tuple(
                _carry13(_mul13_2pass(v, y, jnp), jnp) for v in xs
            )

        xs = jax.lax.fori_loop(0, REPS, body, xs)
        out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

    r = rate(k_def, NL13, REPS, 4, 13)
    print(json.dumps({"metric": "fe13_mul_2pass_plus_consumer", "Mmul_s": round(r / 1e6, 1)}))

    # 2b. pure 2-pass (the mul cost alone when the consumer carry is
    # absorbed by an add/sub that carries anyway)
    def k_def2(x_ref, y_ref, out_ref):
        y = y_ref[:]
        xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

        def body(_, xs):
            return tuple(_mul13_2pass(v, y, jnp) for v in xs)

        xs = jax.lax.fori_loop(0, REPS, body, xs)
        out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

    r = rate(k_def2, NL13, REPS, 4, 13)
    print(json.dumps({"metric": "fe13_mul_2pass_only", "Mmul_s": round(r / 1e6, 1)}))

    # 3. production 15-bit for reference
    def k15(x_ref, y_ref, out_ref):
        y = y_ref[:]
        xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

        def body(_, xs):
            return tuple(_mul_t(v, y, jnp) for v in xs)

        xs = jax.lax.fori_loop(0, REPS, body, xs)
        out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

    r15 = rate(k15, NLIMBS, REPS, 4, 15)
    print(json.dumps({"metric": "fe15_mul_prod", "Mmul_s": round(r15 / 1e6, 1)}))

    # 4. end-kernel: quad windowed, 15-bit vs fe13
    from xelis_he_tpu.ops.curve import jax_curve
    from xelis_he_tpu.ops.pallas_msm import (
        msm_windowed_lanes_pallas_k4, recode_signed4, K_PACK,
    )
    from xelis_he_tpu.pyref.ristretto import mul_base

    curve = jax_curve()
    S = 16384  # slots; 4 muls per slot
    base_pts = [mul_base(i + 1) for i in range(256)]
    pts = base_pts * (K_PACK * S // 256)
    scs = [(0x123457 * (i + 1)) % (2 ** 253 - 1) for i in range(K_PACK * S)]
    b = curve.from_points(pts)
    batch4 = tuple(np.asarray(c).reshape(K_PACK, S, NLIMBS) for c in b)
    digits = np.asarray(recode_signed4(scs)).reshape(K_PACK, S, 64).transpose(0, 2, 1)
    batch4 = tuple(jnp.asarray(c) for c in batch4)
    digits = jnp.asarray(digits)

    for tag in ("0", "1"):
        os.environ["XELIS_FE13"] = tag
        j = jax.jit(lambda b, d: msm_windowed_lanes_pallas_k4(b, d)[0])
        t = pull_time(lambda: j(batch4, digits))
        print(json.dumps({
            "metric": f"quad_kernel_fe13={tag}",
            "kpts_s": round(K_PACK * S / t / 1e3, 1),
        }))


if __name__ == "__main__":
    main()
