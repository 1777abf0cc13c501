"""ECDLP table build + decode benchmark (SURVEY.md D5 at reference scale).

Builds (or loads) an l1-bit baby-step table with device chunks, saves it in
the mmap-able flat format, then times decode/par_decode of amounts across a
[0, 2^range_bits) search range.

Usage: python scripts/bench_ecdlp.py [l1=20] [range_bits=32]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    l1 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    range_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from xelis_he_tpu.ecdlp import ECDLPArguments, ECDLPTables, decode, par_decode
    from xelis_he_tpu.ops.accel import default_accelerator
    from xelis_he_tpu.pyref.ristretto import mul_base

    accel = default_accelerator()
    cache = pathlib.Path(
        os.environ.get("XELIS_HE_TPU_CACHE", os.path.expanduser("~/.cache/xelis_he_tpu"))
    )
    cache.mkdir(parents=True, exist_ok=True)
    path = cache / f"ecdlp_l1_{l1}.bin"

    if path.exists():
        t0 = time.time()
        tables = ECDLPTables.load(path)  # mmap, zero-copy
        print(f"loaded l1={l1} table via mmap in {time.time() - t0:.3f}s "
              f"({path.stat().st_size / 1e6:.1f} MB)", flush=True)
    else:
        t0 = time.time()
        tables = ECDLPTables.build(l1, accel=accel)
        build_s = time.time() - t0
        t0 = time.time()
        tables.save_flat(path)
        print(f"built 2^{l1} baby steps in {build_s:.1f}s on "
              f"{accel.backend}, saved flat in {time.time() - t0:.1f}s "
              f"({path.stat().st_size / 1e6:.1f} MB)", flush=True)

    args = ECDLPArguments(range_min=0, range_max=1 << range_bits)
    span_giant = (1 << range_bits) >> l1
    # worst-ish case: amount near the end of the range; average: middle
    for label, m in [("mid", (1 << (range_bits - 1)) + 12345),
                     ("high", (1 << range_bits) - 999)]:
        pt = mul_base(m)
        t0 = time.time()
        got = par_decode(tables, pt, args, accel=accel)
        dt = time.time() - t0
        assert got == m, f"par_decode wrong: {got} != {m}"
        print(f"par_decode[{label}] m=2^~{m.bit_length()}: {dt * 1000:.1f} ms "
              f"({span_giant} giant steps max)", flush=True)

    m = 77777
    pt = mul_base(m)
    t0 = time.time()
    got = decode(tables, pt, ECDLPArguments(range_max=1 << (l1 + 4)))
    dt = time.time() - t0
    assert got == m
    print(f"decode(host, small range) m={m}: {dt * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
