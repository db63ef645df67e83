"""Test configuration: force an 8-device virtual CPU mesh before jax import.

The driver's real-TPU runs use bench.py / __graft_entry__.py; the test suite
always runs on a fake 8-device CPU platform so multi-chip sharding paths are
exercised everywhere (see SURVEY.md section 4 'implication for the TPU
build').
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The sandbox exports JAX_PLATFORMS=axon (real TPU) and the plugin wins over
# the env var; the config knob is authoritative. Must run before any backend
# initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
