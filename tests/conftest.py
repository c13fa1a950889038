"""Test environment: CPU backend with 8 virtual devices, so sharding tests
run anywhere (the multi-device strategy the reference lacks — SURVEY.md §4
"lesson for the TPU build"). XLA_FLAGS must be set before jax initializes;
the axon TPU plugin ignores the JAX_PLATFORMS env var, so the config update
is applied explicitly too."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for fast test iteration: the interpret
# megakernel suites are dominated by XLA:CPU compile time (~20 s/case cold,
# ~13 s warm). DEFAULT ON (VERDICT r2 hygiene); opt out with
# DI_TEST_COMPILE_CACHE=0, or point it at a custom directory. The cache
# loader logs harmless prefer-no-scatter/gather machine-feature warnings on
# reload — filtered below.
_cc = os.environ.get("DI_TEST_COMPILE_CACHE",
                     os.path.expanduser("~/.cache/di_test_xla_cache"))
if _cc not in ("0", ""):
    import logging

    class _DropCacheFeatureNoise(logging.Filter):
        def filter(self, record):
            return "machine feature" not in record.getMessage()

    for _name in ("jax._src.compiler", "jax._src.cache_key",
                  "jax._src.compilation_cache"):
        logging.getLogger(_name).addFilter(_DropCacheFeatureNoise())
    jax.config.update("jax_compilation_cache_dir", _cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Isolate the megakernel pack cache from the USER's ~/.cache: tests that
# build ModelRuntime(use_kernel=True) would otherwise drop their tiny pack
# dirs next to multi-GB production packs (and a test could in principle hit
# a stale user entry). Tests that test the cache itself monkeypatch their
# own directory.
os.environ.setdefault(
    "DI_PACK_CACHE",
    os.path.expanduser("~/.cache/di_test_packs"))
