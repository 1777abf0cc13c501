import os
import sys

# Multi-device CPU mesh emulation for sharding tests (SURVEY.md §7 pod-scale):
# must be set before jax import.  FORCE cpu (not setdefault): the axon
# environment pre-sets JAX_PLATFORMS=axon and its sitecustomize registers
# the tunneled-TPU backend whenever PALLAS_AXON_POOL_IPS is set — the test
# suite is CPU-deterministic by design (TPU coverage comes from bench.py
# and the driver's compile checks).
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
