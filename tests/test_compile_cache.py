"""Persistent XLA compilation cache (utils/device.enable_compilation_cache)."""

import os

import jax
import jax.numpy as jnp

from joint_vae_tpu.utils.device import enable_compilation_cache


def _restore(old_dir, old_secs):
    jax.config.update('jax_compilation_cache_dir', old_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', old_secs)


def test_enable_and_write_entry(tmp_path):
    old_dir = jax.config.jax_compilation_cache_dir
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        p = enable_compilation_cache(str(tmp_path))
        assert p == str(tmp_path)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        # drop the time/size floors so a toy program writes an entry
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        f = jax.jit(lambda x: jnp.tanh(x) @ x.T)
        f(jnp.ones((32, 32))).block_until_ready()
        assert any('-cache' in n for n in os.listdir(str(tmp_path)))
    finally:
        _restore(old_dir, old_secs)


def test_disable_via_env(tmp_path, monkeypatch):
    old_dir = jax.config.jax_compilation_cache_dir
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.setenv('JVT_COMPILE_CACHE', '0')
        assert enable_compilation_cache() is None
        monkeypatch.setenv('JVT_COMPILE_CACHE', str(tmp_path / 'sub'))
        assert enable_compilation_cache() == str(tmp_path / 'sub')
        assert os.path.isdir(str(tmp_path / 'sub'))
    finally:
        _restore(old_dir, old_secs)
