"""Generates csrc/keccak_unrolled.inc: a fully-unrolled Keccak-f[1600]
permutation derived from the FIPS-202 spec (rho offsets from the
(t+1)(t+2)/2 walk, pi as B[y, 2x+3y] = A[x, y], RC = the published
table).  The build-time check in tests/test_hashes.py (FIPS-202 + merlin
vectors) plus the generator's own 2000-random-state equivalence harness
(vs the readable loop implementation) validate the output.

Usage: python scripts/gen_keccak_unrolled.py > xelis_he_tpu/hashcore/csrc/keccak_unrolled.inc
"""

RC = [0x0000000000000001, 0x0000000000008082, 0x800000000000808a,
      0x8000000080008000, 0x000000000000808b, 0x0000000080000001,
      0x8000000080008081, 0x8000000000008009, 0x000000000000008a,
      0x0000000000000088, 0x0000000080008009, 0x000000008000000a,
      0x000000008000808b, 0x800000000000008b, 0x8000000000008089,
      0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
      0x000000000000800a, 0x800000008000000a, 0x8000000080008081,
      0x8000000000008080, 0x0000000080000001, 0x8000000080008008]


def main():
    rho = [[0] * 5 for _ in range(5)]
    x, y = 1, 0
    for t in range(24):
        rho[x][y] = ((t + 1) * (t + 2) // 2) % 64
        x, y = y, (2 * x + 3 * y) % 5

    print("// Fully-unrolled Keccak-f[1600], generated from the FIPS-202 spec")
    print("// by scripts/gen_keccak_unrolled.py — do not edit by hand.")
    print("static inline void keccak_f1600_unrolled(uint64_t *st) {")
    for x in range(5):
        for y in range(5):
            print(f"  uint64_t a{x}{y} = st[{x + 5 * y}];")
    print("  uint64_t c0, c1, c2, c3, c4, d0, d1, d2, d3, d4;")
    for x in range(5):
        for y in range(5):
            print(f"  uint64_t b{x}{y};")
    for rnd in range(24):
        for xx in range(5):
            print(f"  c{xx} = a{xx}0 ^ a{xx}1 ^ a{xx}2 ^ a{xx}3 ^ a{xx}4;")
        for xx in range(5):
            print(f"  d{xx} = c{(xx+4)%5} ^ rotl64(c{(xx+1)%5}, 1);")
        for xx in range(5):
            for yy in range(5):
                px, py = yy, (2 * xx + 3 * yy) % 5
                r = rho[xx][yy]
                src = f"(a{xx}{yy} ^ d{xx})"
                expr = f"rotl64({src}, {r})" if r else src
                print(f"  b{px}{py} = {expr};")
        for xx in range(5):
            for yy in range(5):
                print(f"  a{xx}{yy} = b{xx}{yy} ^ ((~b{(xx+1)%5}{yy}) & b{(xx+2)%5}{yy});")
        print(f"  a00 ^= 0x{RC[rnd]:016x}ULL;")
    for x in range(5):
        for y in range(5):
            print(f"  st[{x + 5 * y}] = a{x}{y};")
    print("}")


if __name__ == "__main__":
    main()
