import os
import sys

# Multi-device CPU mesh emulation for sharding tests (SURVEY.md §7 pod-scale):
# must be set before jax import.
#
# NOTE: do NOT force JAX_PLATFORMS or clear PALLAS_AXON_POOL_IPS here.  The
# axon sitecustomize registers its backend at INTERPRETER boot (before
# conftest runs); mutating the platform env afterwards leaves the runtime
# half-configured and even plain CPU array pulls deadlock.  Tests that need
# a guaranteed-clean CPU process (tests/test_dcn.py) set the env on their
# SUBPROCESS instead, which takes effect at boot.  In-process tests request
# CPU devices explicitly (jax.devices("cpu")).
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# Accel tests use small blocks; keep them on the device path (the
# small-batch host crossover would silently reroute them otherwise).
# tests/test_tx.py::test_host_crossover exercises the crossover itself.
os.environ.setdefault("XELIS_HOST_VERIFY_MAX", "0")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Tests run CPU-mesh programs; keep their XLA:CPU AOT cache entries in the
# gitignored cpu/ subdir so the committed TPU cache stays host-portable
# (CPU AOT entries bake in host CPU features).
os.environ.setdefault(
    "XELIS_HE_TPU_JAXCACHE", os.path.join(_REPO, ".cache", "jaxcache", "cpu")
)


def pytest_configure(config):
    # Persistent XLA compile cache: kernel compiles dominate test wall-time
    # otherwise (the Accelerator enables this too, but many tests call the
    # kernels directly).
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "XELIS_HE_TPU_JAXCACHE",
                os.path.expanduser("~/.cache/xelis_he_tpu/jaxcache"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
