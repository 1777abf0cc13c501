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


def test_flat_table_mmap_roundtrip(tmp_path: pathlib.Path):
    """The mmap-able flat format (ECDLPTablesFileView parity) must
    round-trip bit-exactly and decode through a zero-copy memmap view."""
    import numpy as np

    path = tmp_path / "tables.bin"
    TABLES.save_flat(path)
    assert path.stat().st_size == 16 + 12 * (1 << TABLES.l1)

    mapped = ECDLPTables.load(path)  # memmap
    assert isinstance(mapped.keys, np.memmap)
    assert mapped.l1 == TABLES.l1
    assert np.array_equal(np.asarray(mapped.keys), TABLES.keys)
    assert np.array_equal(np.asarray(mapped.idx), TABLES.idx)
    assert decode(mapped, mul_base(777), ECDLPArguments(0, 1 << 12)) == 777

    ram = ECDLPTables.load_flat(path, mmap=False)
    assert decode(ram, mul_base(901), ECDLPArguments(0, 1 << 12)) == 901

    # corrupted magic is rejected
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"NOTATBL!" + path.read_bytes()[8:])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ECDLPTables.load_flat(bad)
