"""
Test configuration: all tests run on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4 implication).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a hardware plugin; tests always run
# on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_mesh():
    from heybuddy_tpu.parallel.mesh import get_mesh

    return get_mesh(data=8, model=1)


@pytest.fixture()
def tmp_dataset_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    return str(tmp_path)
