"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host devices (the XLA SPMD partitioner is identical).

NB: some environments pin JAX_PLATFORMS to a TPU plugin via sitecustomize;
`jax.config.update` is the override that always wins, so we use it here
(plus XLA_FLAGS, which must be set before backend init).
"""

import os

if os.environ.get("UMGEN_TEST_TPU") == "1":
    # run the suite on the real chip (TPU-only kernel tests included)
    import jax  # noqa: F401
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: jit compiles dominate the suite's wall
    # time (tiny-scale models, full 2207-token frame programs), and most
    # tests recompile byte-identical HLO every run.  Cold run is
    # unchanged; warm runs skip every previously-seen compile (measured
    # ~4x on a representative program).  Repo-local and gitignored.
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
