"""Test configuration: force an 8-virtual-device CPU mesh.

Mirrors the reference's multi-node-without-a-cluster strategy
(SURVEY.md §4: in-process fakes + local multi-process): we test
multi-chip sharding logic on 8 virtual CPU devices so CI never needs
TPU hardware. Pallas kernels run in interpret mode on CPU (handled by
longbow_tpu.ops dispatch).
"""
import os

# Must run before the first `import jax` anywhere in the test session.
# NOTE: this environment pre-sets JAX_PLATFORMS=axon via sitecustomize, so
# the env var alone is not enough — jax.config.update below is what sticks.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Skip the post-migration warmup search: it pre-compiles the B=1/k=10
# serving shape, which test searches rarely reuse — pure compile cost.
os.environ.setdefault("LONGBOW_WARMUP_AFTER_BUILD", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
