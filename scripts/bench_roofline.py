"""Kernel roofline: field-muls/sec/chip vs the raw VPU u32-multiply bound.

Three measurements on one chip (BASELINE.md secondary metric):
  1. raw u32 multiply-add throughput (the measured VPU integer bound) —
     a Pallas kernel looping x = x*y + 1 over 4 independent chains on
     VMEM-resident (18, T) tiles;
  2. field-muls/sec — the same harness around the production `_mul_t`
     (18x15-bit relaxed-limb schoolbook, 324 u32 lane-muls each);
  3. the windowed MSM kernel's points/sec, compared against the rate its
     own field-mul count predicts from (2), separating kernel overhead
     (selects, carries, loop) from field-arithmetic cost.

Each kernel repeats its full grid R times (a leading replication grid
dimension with identical index maps), so one pull amortizes the tunneled
axon platform's ~50-100 ms fixed pull cost (RTT + transfer) over R x the
compute.  block_until_ready does not force execution here; the harness
forces a host transfer instead.

Usage: python scripts/bench_roofline.py  (prints one JSON line per metric)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TILE = 512
GRID = 32
REPL = 4   # work replication per pull (amortizes tunnel fixed cost)


def pull_time(fn, iters=4):
    np.asarray(fn())  # warmup/compile
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

    from xelis_he_tpu.ops.pallas_msm import NLIMBS, _mul_t

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)

    def lane_call(kernel):
        return pl.pallas_call(
            kernel,
            grid=(REPL, GRID),
            in_specs=[
                pl.BlockSpec((NLIMBS, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((NLIMBS, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (NLIMBS, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((NLIMBS, GRID * TILE), jnp.uint32),
        )

    x = jnp.asarray(
        np.random.randint(0, 1 << 15, (NLIMBS, GRID * TILE), dtype=np.uint32)
    )
    y = jnp.asarray(
        np.random.randint(1, 1 << 15, (NLIMBS, GRID * TILE), dtype=np.uint32)
    )

    def rate(make_call, reps, work_per_rep):
        j = jax.jit(make_call(reps))
        t = pull_time(lambda: j(x, y))
        return REPL * reps * work_per_rep / t

    # ---- 1. raw u32 mul bound: 324 mul+adds per rep (4 ILP chains) ------
    def make_raw(reps):
        def kernel(x_ref, y_ref, out_ref):
            y = y_ref[:]
            xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

            def body(_, xs):
                for _k in range(81):
                    xs = tuple(v * y + jnp.uint32(1) for v in xs)
                return xs

            xs = jax.lax.fori_loop(0, reps, body, xs)
            out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

        call = lane_call(kernel)
        return lambda a, b: call(a, b)

    lanes = GRID * TILE * NLIMBS  # every limb row is an independent lane
    raw_muls = rate(make_raw, 960, 324 * lanes)
    print(json.dumps({
        "metric": "vpu_u32_mul_per_sec", "value": round(raw_muls / 1e9, 1),
        "unit": "Gmul/s",
        "note": "grid-replicated x=x*y+1 on 4 ILP chains, (18,512) tiles",
    }))

    # ---- 2. field-muls/sec (production _mul_t) --------------------------
    def make_fm(reps):
        def kernel(x_ref, y_ref, out_ref):
            y = y_ref[:]
            xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

            def body(_, xs):
                return tuple(_mul_t(v, y, jnp) for v in xs)

            xs = jax.lax.fori_loop(0, reps, body, xs)
            out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

        call = lane_call(kernel)
        return lambda a, b: call(a, b)

    field_muls = rate(make_fm, 8192, 4 * GRID * TILE)
    pct = 100.0 * field_muls * 324 / raw_muls
    print(json.dumps({
        "metric": "field_muls_per_sec_chip", "value": round(field_muls / 1e6, 1),
        "unit": "Mmul/s",
        "pct_of_u32_bound": round(pct, 1),
        "note": "18x15-bit relaxed-limb _mul_t = 324 u32 muls + carries",
    }))

    # ---- 2b. PRODUCTION field tier: 20x13-bit no-split _mul13 ------------
    from xelis_he_tpu.ops.pallas_msm import NL13, _mul13

    def lane_call13(kernel):
        return pl.pallas_call(
            kernel,
            grid=(REPL, GRID),
            in_specs=[
                pl.BlockSpec((NL13, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((NL13, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (NL13, TILE), lambda r, i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((NL13, GRID * TILE), jnp.uint32),
        )

    def make_fm13(reps):
        def kernel(x_ref, y_ref, out_ref):
            y = y_ref[:]
            xs = tuple(x_ref[:] + jnp.uint32(k) for k in range(4))

            def body(_, xs):
                return tuple(_mul13(v, y, jnp) for v in xs)

            xs = jax.lax.fori_loop(0, reps, body, xs)
            out_ref[:] = xs[0] ^ xs[1] ^ xs[2] ^ xs[3]

        call = lane_call13(kernel)
        return lambda a, b: call(a, b)

    x13 = jnp.asarray(
        np.random.randint(0, 1 << 13, (NL13, GRID * TILE), dtype=np.uint32)
    )
    y13 = jnp.asarray(
        np.random.randint(1, 1 << 13, (NL13, GRID * TILE), dtype=np.uint32)
    )
    j13 = jax.jit(make_fm13(8192))
    t13 = pull_time(lambda: j13(x13, y13))
    fm13 = REPL * 8192 * 4 * GRID * TILE / t13
    print(json.dumps({
        "metric": "field_muls_per_sec_chip_fe13", "value": round(fm13 / 1e6, 1),
        "unit": "Mmul/s",
        "vs_fe15": round(fm13 / field_muls, 2),
        "note": "20x13-bit no-split _mul13 (production tier since r5)",
    }))

    # ---- 3. windowed MSM kernel vs its own field-mul prediction ---------
    from xelis_he_tpu.ops.curve import jax_curve
    from xelis_he_tpu.ops.pallas_msm import (
        msm_windowed_lanes_pallas, recode_signed4,
    )
    from xelis_he_tpu.pyref.ristretto import mul_base

    curve = jax_curve()
    n = 262144  # large enough that the ~0.1 s tunnel pull cost is <15%
    pts = [mul_base(i + 1) for i in range(256)] * (n // 256)
    scs = [(0x123457 * (i + 1)) % (2 ** 253 - 1) for i in range(n)]
    batch = tuple(jnp.asarray(c) for c in curve.from_points(pts))
    digits = jnp.asarray(recode_signed4(scs))
    msm_j = jax.jit(lambda b, d: msm_windowed_lanes_pallas(b, d)[0])
    t = pull_time(lambda: msm_j(batch, digits))
    pts_per_s = n / t
    # per lane: table build (4 dbl + 3 add) + 64 windows x (3 dbl-no-T +
    # 1 dbl + 1 add); dbl = 4 sqr + 4 mul (3 when T skipped), add = 9 mul,
    # sqr ~ 0.6 mul in _sqr_t's dedicated form
    mul_eq = int((4 * (4 * 0.6 + 4) + 3 * 9) + 64 * (4 * (4 * 0.6) + 3 * 3 + 4 + 9))
    predicted = field_muls / mul_eq
    print(json.dumps({
        "metric": "msm_windowed_pts_per_sec", "value": round(pts_per_s / 1e6, 3),
        "unit": "Mpts/s", "n": n,
        "field_mul_equiv_per_pt": mul_eq,
        "pct_of_field_mul_prediction": round(100.0 * pts_per_s / predicted, 1),
        "pct_of_u32_bound": round(
            100.0 * pts_per_s * mul_eq * 324 / raw_muls, 1
        ),
        "note": "per-lane kernel; production verify uses the quad kernel",
    }))

    # ---- 3b. PRODUCTION MSM engine: quad-packed kernel (fe13 + niels) ----
    from xelis_he_tpu.ops.pallas_msm import (
        K_PACK, msm_windowed_lanes_pallas_k4,
    )

    S = 16384
    pts4 = [mul_base(i + 1) for i in range(256)] * (K_PACK * S // 256)
    scs4 = [(0x123457 * (i + 1)) % (2 ** 253 - 1) for i in range(K_PACK * S)]
    b4 = curve.from_points(pts4)
    batch4 = tuple(
        jnp.asarray(np.asarray(c).reshape(K_PACK, S, NLIMBS)) for c in b4
    )
    dig = np.asarray(recode_signed4(scs4))  # (64, n)
    digits4 = jnp.asarray(
        np.stack([dig[:, k * S : (k + 1) * S] for k in range(K_PACK)], axis=0)
    )
    j4 = jax.jit(lambda b, d: msm_windowed_lanes_pallas_k4(b, d)[0])
    t4 = pull_time(lambda: j4(batch4, digits4))
    quad_pts = K_PACK * S / t4
    print(json.dumps({
        "metric": "msm_quad_pts_per_sec", "value": round(quad_pts / 1e6, 3),
        "unit": "Mpts/s", "n": K_PACK * S,
        "note": "quad-packed windowed kernel, fe13 + niels tables — the "
                "engine verify_batch dispatches",
    }))


if __name__ == "__main__":
    main()
