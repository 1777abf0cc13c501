"""xelis_he_tpu: TPU-native confidential-transaction crypto framework.

Capability parity with xelis-project/xelis-he (reference mounted at
/root/reference): Twisted ElGamal homomorphic balances on ristretto255,
Schnorr signatures, sigma proofs, aggregated Bulletproofs range proofs with
cross-transaction batch verification, multisig, multi-asset, encrypted
transfer payloads, and an ECDLP balance decoder — redesigned TPU-first:

- all hot group arithmetic is batched structure-of-arrays limb math
  (``xelis_he_tpu.ops``) running under jit on TPU (numpy on host);
- whole-block verification compiles to TWO fused multiscalar
  multiplications (one for all sigma proofs, one folding every range proof);
- the serial byte machinery (STROBE/merlin transcripts, SHA3, BLAKE3,
  ChaCha20) runs on host with C++ kernels (``hashcore/csrc``);
- multi-chip scaling shards MSMs over a ``jax.sharding.Mesh``
  (``xelis_he_tpu.parallel``).
"""

from . import scalars
from .elgamal import (
    DecryptHandle,
    ECDLPInstance,
    ElGamalCiphertext,
    ElGamalKeypair,
    ElGamalPubkey,
    ElGamalSecretKey,
    H,
    PedersenCommitment,
    PedersenOpening,
    Signature,
)
from .errors import (
    CipherFormatError,
    DecompressionError,
    InsufficientFundsError,
    InvalidNonceError,
    ProofGenerationError,
    ProofVerificationError,
    TranscriptError,
)
from .extra_data import ExtraData, PlaintextData
from .pyref.ristretto import BASEPOINT as G, IDENTITY, RistrettoPoint, mul_base
from .sigma import BatchCollector, CiphertextValidityProof, CommitmentEqProof
from .transcript import ProtocolTranscript
from .types import (
    CompressedCiphertext,
    CompressedCommitment,
    CompressedHandle,
    CompressedPubkey,
    Hash,
    NATIVE_ASSET,
    Role,
)
from .tx.model import (
    BurnPayload,
    DeployContractPayload,
    MultiSigPayload,
    NewSourceCommitment,
    SmartContractCall,
    Transaction,
    Transfer,
)
from .tx.builder import (
    BurnBuilder,
    DeployContractBuilder,
    GetBlockchainAccountBalance,
    MultiSigBuilder,
    SmartContractCallBuilder,
    TransactionBuilder,
    TransactionUnsigned,
    TransferBuilder,
    TransfersBuilder,
    build_batch,
)
from .tx.verify import (
    BlockchainVerificationState,
    apply_without_verify,
    pre_verify,
    verify,
    verify_batch,
)

__version__ = "0.1.0"
