"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh (the TPU-world analogue of a fake
distributed backend) so multi-chip sharding paths are exercised without TPU
hardware. This must happen before the first `import jax` anywhere.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's collective rendezvous hard-SIGABRTs after 40 s if not all
# device threads arrive — on this 1-core host, background load (another
# pytest shard, a TPU drive) can starve threads past that and kill the
# run spuriously (observed r3: collective-permute, 4 of 8 arrived).
# Raise the termination timeouts; a loaded host resolves in minutes.
for _f in (
    "--xla_cpu_collective_timeout_seconds=600",
    "--xla_cpu_collective_call_terminate_timeout_seconds=600",
):
    if _f.split("=")[0] not in _flags:
        _flags += " " + _f
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment may inject an extra TPU platform plugin that prepends
# itself to jax_platforms regardless of the env var; pin CPU explicitly
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Repo root on sys.path so `gpt2_vision_language_tpu` imports without install.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "source"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference repo not mounted at /root/reference",
)
