"""Persistent compilation cache wiring: env toggles and config effect."""

import os


def test_compile_cache_enable_and_disable(tmp_path, monkeypatch):
    import jax

    from licv_vqa_tpu.utils import enable_compilation_cache

    target = str(tmp_path / "xla")
    monkeypatch.setenv("LICV_COMPILE_CACHE_DIR", target)
    monkeypatch.delenv("LICV_COMPILE_CACHE", raising=False)
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
