"""C++ batched scalar engine vs pure-Python ground truth."""

import random

import numpy as np
import pytest

from xelis_he_tpu import scalarops as so
from xelis_he_tpu.scalars import L

rng = random.Random(1234)


def rand_scalars(n):
    return [rng.randrange(L) for _ in range(n)]


def test_native_available():
    assert so.HAVE_NATIVE, "C++ scalar engine failed to build"


def test_roundtrip():
    vals = rand_scalars(17)
    assert so.array_to_ints(so.ints_to_array(vals)) == vals


def test_mul_add_sub():
    a, b = rand_scalars(33), rand_scalars(33)
    assert so.array_to_ints(so.mul(a, b)) == [x * y % L for x, y in zip(a, b)]
    assert so.array_to_ints(so.add(a, b)) == [(x + y) % L for x, y in zip(a, b)]
    assert so.array_to_ints(so.sub(a, b)) == [(x - y) % L for x, y in zip(a, b)]


def test_mul_edge_cases():
    edge = [0, 1, L - 1, L - 2, 2**252, 1 << 251]
    a = edge + rand_scalars(2)
    b = list(reversed(a))
    assert so.array_to_ints(so.mul(a, b)) == [x * y % L for x, y in zip(a, b)]


def test_muls_affine():
    a = rand_scalars(20)
    s, c = rng.randrange(L), rng.randrange(L)
    assert so.array_to_ints(so.muls(a, s)) == [x * s % L for x in a]
    assert so.array_to_ints(so.affine(a, s, c)) == [(x * s + c) % L for x in a]


def test_axpy():
    acc_vals = rand_scalars(20)
    a = rand_scalars(20)
    s = rng.randrange(L)
    acc = so.ints_to_array(acc_vals)
    so.axpy_(acc, a, s)
    assert so.array_to_ints(acc) == [(x + y * s) % L for x, y in zip(acc_vals, a)]


def test_powers():
    x = rng.randrange(L)
    got = so.array_to_ints(so.powers(x, 40))
    want = [pow(x, i, L) for i in range(40)]
    assert got == want


def test_inner():
    a, b = rand_scalars(31), rand_scalars(31)
    assert so.inner(a, b) == sum(x * y for x, y in zip(a, b)) % L


def test_invert():
    vals = rand_scalars(10) + [0, 1, L - 1]
    got = so.array_to_ints(so.batch_invert(vals))
    want = [pow(v, L - 2, L) if v else 0 for v in vals]
    assert got == want
    x = rng.randrange(1, L)
    assert so.invert(x) == pow(x, L - 2, L)


def test_ipp_s_vector():
    lg_n = 4
    n = 1 << lg_n
    u = rand_scalars(lg_n)
    u_sq = [x * x % L for x in u]
    u_inv = [pow(x, L - 2, L) for x in u]
    got = so.array_to_ints(so.ipp_s_vector(u_sq, u_inv, n))
    # ground truth: s[i] = prod_j u_j^{+1 if bit, else -1}, bit j of i
    # corresponds to round j (most significant round first)
    want = []
    for i in range(n):
        acc = 1
        for j in range(lg_n):
            bit = (i >> (lg_n - 1 - j)) & 1
            acc = acc * (u[j] if bit else pow(u[j], L - 2, L)) % L
        want.append(acc * 1 % L)
    # express want via squares like the recurrence does: s[0]=prod u_inv,
    # s[i] = s[i-2^k] * u_sq[...]  — equivalent algebra
    assert got == want


def test_bp_h_vector():
    n_bits, m = 8, 4
    nm = n_bits * m
    y, z, b = rng.randrange(L), rng.randrange(L), rng.randrange(L)
    y_inv = pow(y, L - 2, L)
    y_inv_pow = [pow(y_inv, i, L) for i in range(nm)]
    z_pow = [pow(z, i, L) for i in range(m)]
    s = rand_scalars(nm)
    zz = z * z % L
    got = so.array_to_ints(
        so.bp_h_vector(so.ints_to_array(y_inv_pow), so.ints_to_array(z_pow), so.ints_to_array(s), z, zz, b, n_bits, m)
    )
    want = [
        (z + y_inv_pow[i] * ((zz * z_pow[i // n_bits] * (1 << (i % n_bits)) - b * s[nm - 1 - i]) % L)) % L
        for i in range(nm)
    ]
    assert got == want
