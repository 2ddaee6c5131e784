"""Pallas flash attention vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.ops.attention import attend_xla, make_block_diagonal_mask, make_causal_mask
from qwen3_asr_tpu.ops.flash_attention import flash_attention


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _run(q, k, v, dense_mask=None, **kw):
    ours = flash_attention(q, k, v, interpret=True, **kw)
    ref = attend_xla(q, k, v, mask=dense_mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_full_attention_matches():
    b, nq, nkv, t, s, d = 2, 4, 2, 128, 128, 32
    q, k, v = _rand(0, (b, nq, t, d)), _rand(1, (b, nkv, s, d)), _rand(2, (b, nkv, s, d))
    _run(q, k, v)


def test_causal_matches():
    b, nq, nkv, t, d = 1, 4, 2, 128, 32
    q, k, v = _rand(3, (b, nq, t, d)), _rand(4, (b, nkv, t, d)), _rand(5, (b, nkv, t, d))
    mask = jnp.broadcast_to(make_causal_mask(t, t), (b, t, t))[:, None]
    _run(q, k, v, dense_mask=mask, causal=True)


def test_causal_unaligned_lengths():
    """T=70, S=150: padding + masking paths."""
    b, nq, nkv, t, s, d = 1, 2, 1, 70, 150, 64
    q, k, v = _rand(6, (b, nq, t, d)), _rand(7, (b, nkv, s, d)), _rand(8, (b, nkv, s, d))
    # causal with q starting at position 80 (cache decode semantics)
    rows = jnp.arange(t)[:, None] + 80
    cols = jnp.arange(s)[None, :]
    mask = (cols <= rows)[None, None]
    _run(q, k, v, dense_mask=mask, causal=True, q_offset=80)


def test_valid_from_left_padding():
    b, nq, nkv, t, s, d = 2, 2, 2, 16, 256, 32
    q, k, v = _rand(9, (b, nq, t, d)), _rand(10, (b, nkv, s, d)), _rand(11, (b, nkv, s, d))
    vf = jnp.asarray([5, 190], jnp.int32)
    mask = (jnp.arange(s)[None, :] >= vf[:, None])[:, None, None, :]
    mask = jnp.broadcast_to(mask, (b, 1, t, s))
    _run(q, k, v, dense_mask=mask, kv_valid_from=vf)


def test_valid_to_right_padding():
    b, nq, nkv, t, s, d = 2, 2, 1, 32, 256, 32
    q, k, v = _rand(12, (b, nq, t, d)), _rand(13, (b, nkv, s, d)), _rand(14, (b, nkv, s, d))
    vt = jnp.asarray([100, 256], jnp.int32)
    mask = (jnp.arange(s)[None, :] < vt[:, None])[:, None, None, :]
    mask = jnp.broadcast_to(mask, (b, 1, t, s))
    _run(q, k, v, dense_mask=mask, kv_valid_to=vt)


def test_window_block_diagonal():
    """Encoder windowed attention: 50-token blocks."""
    b, nq, nkv, t, d = 1, 4, 4, 150, 64
    q, k, v = _rand(15, (b, nq, t, d)), _rand(16, (b, nkv, t, d)), _rand(17, (b, nkv, t, d))
    mask = make_block_diagonal_mask(t, 50)[None, None]
    _run(q, k, v, dense_mask=mask, window_block=50)


def test_single_query_decode_step():
    """T=1 decode against a 384-entry cache with valid range."""
    b, nq, nkv, s, d = 2, 16, 8, 384, 64
    q = _rand(18, (b, nq, 1, d))
    k, v = _rand(19, (b, nkv, s, d)), _rand(20, (b, nkv, s, d))
    pos = 200
    mask = (jnp.arange(s)[None, :] <= pos)[:, None, None, :]
    mask = jnp.broadcast_to(mask, (b, 1, 1, s))
    _run(q, k, v, dense_mask=mask, causal=True, q_offset=pos)


def test_bf16_inputs():
    b, nq, nkv, t, d = 1, 4, 2, 128, 64
    q = _rand(21, (b, nq, t, d)).astype(jnp.bfloat16)
    k = _rand(22, (b, nkv, t, d)).astype(jnp.bfloat16)
    v = _rand(23, (b, nkv, t, d)).astype(jnp.bfloat16)
    ours = flash_attention(q, k, v, causal=True, interpret=True)
    mask = make_causal_mask(t, t)[None, None]
    ref = attend_xla(q, k, v, mask=jnp.broadcast_to(mask, (b, 1, t, t)))
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)
