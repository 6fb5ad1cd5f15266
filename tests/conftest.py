"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices (the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``).
This must run before the first ``import jax`` anywhere in the test session.

Set ``MHT_TEST_ON_TPU=1`` to instead run the suite on whatever real device
``JAX_PLATFORMS`` points at (single-chip; sharding tests will be skipped).
"""

import os

if not os.environ.get("MHT_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Some environments register an accelerator plugin from sitecustomize and
    # force jax_platforms programmatically; the config update wins over env.
    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("MHT_TEST_ON_TPU"):
        import jax
        import pytest

        if len(jax.devices()) < 8:
            skip = pytest.mark.skip(reason="needs 8 devices (CPU mesh mode)")
            multi_device_files = (
                "test_parallel.py", "test_pallas_sharded.py",
                "test_multihost.py", "test_frame_stream.py",
            )
            for item in items:
                if any(f in item.nodeid for f in multi_device_files):
                    item.add_marker(skip)
