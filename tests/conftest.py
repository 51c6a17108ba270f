"""Test configuration: force an 8-virtual-device CPU platform (multi-chip
sharding tests run on a virtual mesh) and enable f64 for the oracle
comparisons, before jax initializes."""

import os

# The machine's sitecustomize registers the axon TPU backend at
# interpreter start and pins the platform (env JAX_PLATFORMS is
# overridden), but the test suite is the CPU-oracle +
# virtual-8-device-mesh suite; f64 on TPU is emulated (float32x2) and
# would fail the exact-equality checks.  jax.config.update wins over
# the sitecustomize as long as it runs before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "test suite must run on the CPU backend; got "
    f"{jax.devices()[0].platform}"
)
assert len(jax.devices()) == 8, "expected the virtual 8-device CPU mesh"
# 1-core host: compiles dominate test time — persist them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
