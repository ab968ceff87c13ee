"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

# Hard override: the session environment pins JAX_PLATFORMS=axon (a single
# tunneled TPU chip) and the axon plugin wins over the env var. Setting the
# platform through jax.config before first use does stick; tests then run on
# the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Build the native helper library if missing so the native tests run as
# asserts rather than skips (VERDICT r1 item 6). A no-op when up to date.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_REPO, "native", "libmultike_native.so")):
    import subprocess

    subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                   capture_output=True, check=False)


@pytest.fixture(scope="session")
def tiny_dataset(tmp_path_factory):
    """A small synthetic two-KG dataset in the reference folder layout."""
    from multike_tpu.data import synthetic

    folder = str(tmp_path_factory.mktemp("ds")) + "/"
    return synthetic.generate(folder)


@pytest.fixture(scope="session")
def tiny_kgs(tiny_dataset):
    from multike_tpu.data.kg import read_kgs_from_folder

    return read_kgs_from_folder(tiny_dataset, "631/", "swapping", False)
