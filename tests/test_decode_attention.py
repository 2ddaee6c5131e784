"""Decode-attention kernel vs XLA reference (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.ops.attention import attend_xla
from qwen3_asr_tpu.ops.decode_attention import decode_attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _ref(q, k, v, valid_from, valid_to):
    b, _, _, _ = q.shape
    s = k.shape[2]
    cols = jnp.arange(s)[None, :]
    mask = (cols >= valid_from[:, None]) & (cols < valid_to[:, None])
    return attend_xla(q, k, v, mask=mask[:, None, None, :])


def test_decode_matches_reference():
    b, nq, nkv, s, d = 2, 16, 8, 512, 64
    q = _rand(0, (b, nq, 1, d))
    k, v = _rand(1, (b, nkv, s, d)), _rand(2, (b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.asarray([200, 512], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_left_padding():
    b, nq, nkv, s, d = 2, 4, 2, 256, 32
    q = _rand(3, (b, nq, 1, d))
    k, v = _rand(4, (b, nkv, s, d)), _rand(5, (b, nkv, s, d))
    vf = jnp.asarray([10, 100], jnp.int32)
    vt = jnp.asarray([150, 256], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_unaligned_cache():
    """S not a multiple of block_k exercises padding."""
    b, nq, nkv, s, d = 1, 8, 4, 300, 64
    q = _rand(6, (b, nq, 1, d))
    k, v = _rand(7, (b, nkv, s, d)), _rand(8, (b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.asarray([300], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_bf16():
    b, nq, nkv, s, d = 1, 16, 8, 384, 128
    q = _rand(9, (b, nq, 1, d), jnp.bfloat16)
    k = _rand(10, (b, nkv, s, d), jnp.bfloat16)
    v = _rand(11, (b, nkv, s, d), jnp.bfloat16)
    vt = jnp.asarray([256], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_to=vt, interpret=True)
    ref = _ref(q, k, v, jnp.zeros((b,), jnp.int32), vt)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)
