"""MSM engine micro-benchmark on the current jax backend.

Times the three device MSM formulations at several sizes:
  - pallas-windowed: per-lane 4-bit signed-window kernel + tile reduce
  - jnp-daa:        per-lane binary double-and-add scan + tree reduce
  - pippenger:      sort + segmented-scan bucket accumulation (ops.msm)

Prints points/sec for each (the BASELINE.md secondary metric).
Usage: python scripts/bench_msm.py [sizes...] [--window c]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4096, 16384, 65536]
    window = 13
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xelis_he_tpu.ops.accel import _enable_jax_compile_cache
    from xelis_he_tpu.ops.curve import jax_curve
    from xelis_he_tpu.ops.msm import MsmEngine, _tree_reduce, decompose_bits, decompose_digits
    from xelis_he_tpu.pyref.ristretto import mul_base

    _enable_jax_compile_cache()
    curve = jax_curve()
    engine = MsmEngine(curve, window=window, use_jax=True)
    on_tpu = jax.default_backend() == "tpu"

    def timeit(fn, *args, iters=3):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    base_pts = [mul_base(i + 1) for i in range(256)]
    base_scs = [(0x9E3779B97F4A7C15 * (i + 1)) % (2**253) for i in range(256)]

    for n in sizes:
        reps = (n + 255) // 256
        pts = (base_pts * reps)[:n]
        scs = [(s * (k + 1)) % (2**253) for k in range(reps) for s in base_scs][:n]
        batch = tuple(jnp.asarray(c) for c in curve.from_points(pts))
        bits = jnp.asarray(decompose_bits(scs))
        digits = jnp.asarray(decompose_digits(scs, window))

        results = {}
        skip = os.environ.get("XELIS_MSM_SKIP", "").split(",")

        if on_tpu and "pallas" not in skip:
            from xelis_he_tpu.ops.pallas_msm import (
                msm_windowed_lanes_pallas,
                recode_signed4,
                tile_sums_pallas,
            )

            sd = jnp.asarray(recode_signed4(scs))

            @jax.jit
            def pallas_msm(batch, sd):
                acc = msm_windowed_lanes_pallas(batch, sd)
                sums = tile_sums_pallas(acc)
                return _tree_reduce(curve, sums, sums[0].shape[0], True)

            print(f"n={n}: compiling pallas-windowed...", file=sys.stderr, flush=True)
            t, out_p = timeit(pallas_msm, batch, sd)
            results["pallas-windowed"] = t

        outs = {}
        if "daa" not in skip:

            @jax.jit
            def daa(batch, bits):
                return engine.msm_daa(batch, bits)

            print(f"n={n}: compiling jnp-daa...", file=sys.stderr, flush=True)
            t, outs["daa"] = timeit(daa, batch, bits)
            results["jnp-daa"] = t

        if "pippenger" not in skip:

            @jax.jit
            def pip(batch, digits):
                return engine.msm(batch, digits)

            print(f"n={n}: compiling pippenger...", file=sys.stderr, flush=True)
            t, outs["pip"] = timeit(pip, batch, digits)
            results[f"pippenger-c{window}"] = t

        # cross-check every computed result against the host reference
        from xelis_he_tpu.pyref.ristretto import multiscalar_mul

        ref = multiscalar_mul(scs, pts)
        for name, out in outs.items():
            got = curve.to_points(tuple(np.asarray(c)[None] for c in out))[0]
            assert ref == got, f"{name} mismatch at n={n}"
        if on_tpu and "pallas" not in skip:
            gp = curve.to_points(tuple(np.asarray(c)[None] for c in out_p))[0]
            assert ref == gp, f"pallas mismatch at n={n}"

        line = " | ".join(
            f"{k}: {v * 1000:8.2f} ms ({n / v / 1e6:6.2f} Mpts/s)" for k, v in results.items()
        )
        print(f"n={n:7d}  {line}", flush=True)


if __name__ == "__main__":
    main()
