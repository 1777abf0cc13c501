"""ECDLP decoder tests (capability parity with ecdlp::decode/par_decode)."""

import pathlib

import pytest

from xelis_he_tpu.ecdlp import ECDLPArguments, ECDLPTables, decode, par_decode
from xelis_he_tpu.elgamal import ElGamalKeypair
from xelis_he_tpu.pyref.ristretto import mul_base

TABLES = ECDLPTables.build(8)  # 256 baby steps — tiny test table


def test_decode_small_values():
    args = ECDLPArguments(range_min=0, range_max=1 << 16)
    for m in (0, 1, 255, 256, 257, 10_000, (1 << 16) - 1):
        assert decode(TABLES, mul_base(m), args) == m


def test_decode_out_of_range_returns_none():
    args = ECDLPArguments(range_min=0, range_max=1 << 10)
    assert decode(TABLES, mul_base(5000), args) is None


def test_decode_negative_range():
    args = ECDLPArguments(range_min=-500, range_max=500)
    # -42 * G == (L - 42) * G
    from xelis_he_tpu import scalars

    assert decode(TABLES, mul_base(scalars.L - 42), args) == -42


def test_decode_progress_callback():
    seen = []
    args = ECDLPArguments(range_min=0, range_max=1 << 12, progress_fn=seen.append)
    decode(TABLES, mul_base((1 << 12) - 1), args)
    assert seen and seen[-1] <= 1.0


def test_par_decode_numpy_backend():
    from xelis_he_tpu.ops.accel import Accelerator

    accel = Accelerator("numpy", min_size=4)
    args = ECDLPArguments(range_min=0, range_max=1 << 14)
    for m in (7, 300, 12_345):
        assert par_decode(TABLES, mul_base(m), args, accel=accel, batch=16) == m
    assert par_decode(TABLES, mul_base(1 << 15), args, accel=accel, batch=16) is None


def test_table_roundtrip(tmp_path: pathlib.Path):
    path = tmp_path / "tables.npz"
    TABLES.save(path)
    loaded = ECDLPTables.load(path)
    assert decode(loaded, mul_base(777), ECDLPArguments(0, 1 << 12)) == 777


def test_decrypt_then_decode():
    """Full flow: ElGamal decrypt -> ECDLPInstance -> decode (elgamal.rs:67-92)."""
    keypair = ElGamalKeypair.keygen()
    ct = keypair.pubkey().encrypt(4242)
    instance = keypair.secret().decrypt(ct)
    assert instance.decode(TABLES, ECDLPArguments(0, 1 << 14)) == 4242
