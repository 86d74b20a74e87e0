"""Test configuration: force CPU with 8 virtual devices.

Mirrors the multi-device test strategy described in SURVEY.md §4: the
reference has no distributed tests; ours run sharding on a simulated
8-device CPU mesh via --xla_force_host_platform_device_count.

The session environment pins JAX to the axon TPU tunnel
(JAX_PLATFORMS=axon via sitecustomize); tests must be hermetic, so we
clear the pool IPs before the sitecustomize hook can register the plugin
and force the platform to CPU after import.  Set
INSTANT_TPU_TEST_PLATFORM to run the suite on another platform.
"""

import os

_platform = os.environ.get("INSTANT_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: READ-only for tests by default.  Cache
# writes call executable.serialize(), which has segfaulted on this box's
# CPU backend (faulthandler trace into put_executable_and_time killed a
# full suite run); the huge write threshold keeps reads enabled while
# never serializing.  To (re)populate the cache, run the suite with
# INSTANT_TPU_TEST_CACHE_WRITES=1 — a crash kills only that run, and
# already-written entries are *read* next time (no write attempt), so
# repeated populate runs converge on a warm cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    2.0 if os.environ.get("INSTANT_TPU_TEST_CACHE_WRITES") else 1e9)
