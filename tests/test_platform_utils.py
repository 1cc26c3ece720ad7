"""utils/platform.py: backend forcing + compile-cache helpers.

These manipulate process env/config, so tests snapshot and restore both.
The test process already runs on the CPU backend (conftest), so
force_cpu() here exercises the already-on-cpu fast path; the
clear_backends branch is covered by the scripts that run under axon.
"""

import os

import jax

from keisei_tpu.utils import platform as plat


class TestForceCpu:
    def test_sets_env_and_flags(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
        monkeypatch.setenv("XLA_FLAGS", "--xla_foo=1")
        plat.force_cpu(virtual_devices=4)
        assert os.environ["JAX_PLATFORMS"] == "cpu"
        assert "--xla_force_host_platform_device_count=4" in os.environ["XLA_FLAGS"]
        assert "--xla_foo=1" in os.environ["XLA_FLAGS"]
        # already on cpu (conftest) -> no backend reset happened
        assert jax.config.jax_platforms == "cpu"

    def test_existing_device_count_flag_preserved(self, monkeypatch):
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        plat.force_cpu(virtual_devices=2)
        # must not double-append a conflicting count
        assert os.environ["XLA_FLAGS"].count(
            "host_platform_device_count") == 1
        assert "=8" in os.environ["XLA_FLAGS"]

    def test_no_virtual_devices_leaves_flags_untouched(self, monkeypatch):
        monkeypatch.setenv("XLA_FLAGS", "--xla_bar=2")
        plat.force_cpu()
        assert os.environ["XLA_FLAGS"] == "--xla_bar=2"
        assert os.environ["JAX_PLATFORMS"] == "cpu"


class TestEnableCompileCache:
    def test_env_var_wins(self, monkeypatch):
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/pinned-cache")
        before = jax.config.jax_compilation_cache_dir
        plat.enable_compile_cache()
        # helper defers to the explicit env var: config untouched
        assert jax.config.jax_compilation_cache_dir == before

    def test_defaults_to_shared_cache_dir(self, monkeypatch, tmp_path):
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        prev_dir = jax.config.jax_compilation_cache_dir
        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
        try:
            plat.enable_compile_cache()
            want = str(tmp_path / ".cache" / "keisei-tpu-jax")
            assert jax.config.jax_compilation_cache_dir == want
            assert os.path.isdir(want)
            assert jax.config.jax_persistent_cache_min_compile_time_secs == 5.0
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", prev_min)
