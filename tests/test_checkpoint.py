"""Checkpoint loading + converted-cache tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.fixtures import write_tiny_checkpoint
from qwen3_asr_tpu.runtime.checkpoint import load_asr_checkpoint


def test_load_and_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("ASR_CONVERTED_CACHE", str(tmp_path / "cache"))
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)

    cfg1, params1 = load_asr_checkpoint(ckpt, dtype=jnp.float32)
    cfg2, params2 = load_asr_checkpoint(ckpt, dtype=jnp.float32)  # cache hit

    assert cfg1.decoder.hidden_size == cfg2.decoder.hidden_size
    import jax
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_key_varies_by_dtype(tmp_path, monkeypatch):
    monkeypatch.setenv("ASR_CONVERTED_CACHE", str(tmp_path / "cache"))
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    _, p32 = load_asr_checkpoint(ckpt, dtype=jnp.float32)
    _, p16 = load_asr_checkpoint(ckpt, dtype=jnp.bfloat16)
    assert p32["decoder"]["embed"].dtype == jnp.float32
    assert p16["decoder"]["embed"].dtype == jnp.bfloat16


def test_no_cache_mode(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    cfg, params = load_asr_checkpoint(ckpt, dtype=jnp.float32, cache=False)
    assert "decoder" in params and "encoder" in params
    assert cfg.audio_token_id > 0
