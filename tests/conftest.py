"""Test env: 8 fake CPU devices so multi-chip sharding paths are exercised
without TPU hardware (SURVEY.md §4).

Note: this environment's TPU plugin (sitecustomize) force-sets
jax_platforms="axon,cpu" at interpreter start, overriding JAX_PLATFORMS; we
must override the *config* after importing jax, before any backend is used.
The env vars are still set first for vanilla environments (e.g. the driver's
dryrun harness) where they are honored.
"""

import os

os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if jax.config.jax_num_cpu_devices < 8:
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the 1-core CI host pays ~seconds per XLA compile;
# cache them across pytest runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", \
    f"test env must have 8 CPU devices, got {jax.devices()}"

# --- smoke tier -------------------------------------------------------------
# One fast module per subsystem so the whole framework's health is cheaply
# demonstrable (`pytest -m smoke`, <3 min on this 1-core host). The heavy
# compile-bound modules (test_train, test_quant, test_winograd, ...) stay in
# the full tier only. Curated by measured wall time, not guesswork — see
# README "Running the tests".
import pytest  # noqa: E402

_SMOKE_MODULES = {
    "test_config",       # config/flag system
    "test_metrics",      # confusion matrix / mIoU
    "test_labelpack",    # label packing
    "test_utils",        # profiling/logging utils
    "test_data",         # KITTI loader + augment determinism
    "test_ops",          # pool/unpool/atrous core ops
    "test_serve",        # serving surface
}

# Individually-marked fast tests from otherwise compile-heavy modules:
# full-res forward goldens cover every model family in ~25 s total.
_SMOKE_TESTS = {
    ("test_models", "test_full_resolution_logits"),
    ("test_models", "test_vgg16_endpoint_strides"),
    ("test_models", "test_conv_transpose_matches_tf_same_shape_semantics"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        if mod in _SMOKE_MODULES or (mod, item.originalname) in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
