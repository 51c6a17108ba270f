"""Test configuration.

Default mode: force an 8-virtual-device CPU platform (multi-chip
sharding tests run on a virtual mesh) and enable f64 for the oracle
comparisons, before jax initializes.

Opt-in TPU mode (``RF_TPU_TESTS=1 pytest -m tpu``): leave the real TPU
backend (axon) in place and run only the ``@pytest.mark.tpu`` suite —
Pallas kernels compiled by Mosaic on the chip, cross-checked against
numpy/scipy oracles on the host.  This closes the interpret-vs-Mosaic
semantic gap that CPU-only testing leaves open.
"""

import os

import pytest

RUN_TPU = bool(os.environ.get("RF_TPU_TESTS"))

if not RUN_TPU:
    # The machine's sitecustomize registers the axon TPU backend at
    # interpreter start and pins the platform (env JAX_PLATFORMS is
    # overridden), but the default suite is the CPU-oracle +
    # virtual-8-device-mesh suite; f64 on TPU is emulated (float32x2)
    # and would fail the exact-equality checks.  jax.config.update wins
    # over the sitecustomize as long as it runs before backend init.
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
else:
    import jax  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if RUN_TPU:
    # persistent cache for the slow remote-compile tunnel
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    # 1-core host: compiles dominate test time — persist across runs.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop live compiled executables between test modules.

    The full suite in ONE process accumulates hundreds of XLA:CPU
    executables; on this host the process then segfaults inside
    executable deserialization/compilation around the ~150th program
    (reproducible at the same spot, every file green in isolation —
    an XLA:CPU resource bug, not a test failure).  Clearing per module
    keeps the live-executable count bounded; the persistent on-disk
    compilation cache makes the re-loads cheap."""
    yield
    import jax

    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    for item in items:
        is_tpu = bool(list(item.iter_markers(name="tpu")))
        if is_tpu and not RUN_TPU:
            item.add_marker(
                pytest.mark.skip(
                    reason="real-TPU test; run RF_TPU_TESTS=1 pytest -m tpu"
                )
            )
        elif not is_tpu and RUN_TPU:
            item.add_marker(
                pytest.mark.skip(
                    reason="CPU-oracle test skipped in RF_TPU_TESTS mode"
                )
            )
