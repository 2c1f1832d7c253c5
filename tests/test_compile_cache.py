"""Persistent compilation cache wiring: env toggles and config effect."""

import os


def test_compile_cache_enable_and_disable(tmp_path, monkeypatch):
    import jax

    from licv_vqa_tpu.utils import enable_compilation_cache

    # enable_compilation_cache mutates process-global jax.config; restore so
    # later compiles in this pytest process don't write cache entries into
    # this test's dead tmp dir
    saved = {
        k: getattr(jax.config, k)
        for k in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }

    def _restore():
        for k, v in saved.items():
            jax.config.update(k, v)

    try:
        _run_cache_assertions(tmp_path, monkeypatch, jax, enable_compilation_cache)
    finally:
        _restore()


def _run_cache_assertions(tmp_path, monkeypatch, jax, enable_compilation_cache):
    target = str(tmp_path / "xla")
    monkeypatch.setenv("LICV_COMPILE_CACHE_DIR", target)
    monkeypatch.delenv("LICV_COMPILE_CACHE", raising=False)
    # CPU backend is default-OFF (machine-feature-specific AOT entries are
    # not portable across container hosts) ...
    monkeypatch.delenv("LICV_COMPILE_CACHE_CPU", raising=False)
    assert enable_compilation_cache() is None
    # ... and the opt-in reenables it for the rest of the test
    monkeypatch.setenv("LICV_COMPILE_CACHE_CPU", "1")
    assert enable_compilation_cache() == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target

    monkeypatch.setenv("LICV_COMPILE_CACHE", "0")
    assert enable_compilation_cache() is None

    # explicit dir argument wins over the env var
    explicit = str(tmp_path / "explicit")
    monkeypatch.setenv("LICV_COMPILE_CACHE", "1")
    assert enable_compilation_cache(explicit) == explicit
    assert jax.config.jax_compilation_cache_dir == explicit
