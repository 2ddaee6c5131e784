"""Context parallelism: KV-sharded attention must equal single-device
attention exactly (8 virtual CPU devices, flash kernel in interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from qwen3_asr_tpu.ops.attention import AttnSpec, attend_xla
from qwen3_asr_tpu.ops.context_parallel import context_parallel_attention
from qwen3_asr_tpu.ops.flash_attention import flash_attention


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(np.asarray(devs[:4]), axis_names=("sp",))


def _rand(seed, shape):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def _ref(q, k, v, spec):
    b, _, t, _ = q.shape
    s = k.shape[-2]
    return attend_xla(q, k, v, mask=spec.dense_mask(b, t, s)[:, None])


def test_cp_full_attention_matches(mesh):
    b, nq, nkv, t, s, d = 2, 8, 4, 16, 256, 64
    q = _rand(0, (b, nq, t, d))
    k, v = _rand(1, (b, nkv, s, d)), _rand(2, (b, nkv, s, d))
    got = context_parallel_attention(q, k, v, mesh, interpret=True)
    ref = _ref(q, k, v, AttnSpec())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cp_causal_with_offset_matches(mesh):
    """Causal decode-window shape: queries at global offset, keys sharded."""
    b, nq, nkv, t, s, d = 2, 4, 2, 8, 256, 64
    q = _rand(3, (b, nq, t, d))
    k, v = _rand(4, (b, nkv, s, d)), _rand(5, (b, nkv, s, d))
    off = 100
    got = context_parallel_attention(q, k, v, mesh, causal=True,
                                     q_offset=off, interpret=True)
    ref = _ref(q, k, v, AttnSpec(causal=True, q_offset=off))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cp_padded_rows_match(mesh):
    """Per-row valid_from/valid_to windows crossing shard boundaries."""
    b, nq, nkv, t, s, d = 4, 4, 4, 8, 256, 64
    q = _rand(6, (b, nq, t, d))
    k, v = _rand(7, (b, nkv, s, d)), _rand(8, (b, nkv, s, d))
    vf = jnp.asarray([0, 63, 130, 200], jnp.int32)
    vt = jnp.asarray([256, 140, 131, 256], jnp.int32)
    got = context_parallel_attention(q, k, v, mesh, kv_valid_from=vf,
                                     kv_valid_to=vt, interpret=True)
    ref = _ref(q, k, v, AttnSpec(valid_from=vf, valid_to=vt))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cp_matches_flash_single_device(mesh):
    """CP over 4 shards == the same flash kernel on unsharded K/V."""
    b, nq, nkv, t, s, d = 2, 8, 4, 16, 512, 64
    q = _rand(9, (b, nq, t, d))
    k, v = _rand(10, (b, nkv, s, d)), _rand(11, (b, nkv, s, d))
    got = context_parallel_attention(q, k, v, mesh, causal=True,
                                     q_offset=200, interpret=True)
    ref = flash_attention(q, k, v, causal=True, q_offset=200,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_residuals_reconstruct_softmax():
    """return_residuals exposes (m, l) that reconstruct the exact softmax
    normalizer: combining two half-sequence calls equals the full call."""
    b, nq, nkv, t, s, d = 2, 4, 2, 8, 256, 64
    q = _rand(12, (b, nq, t, d))
    k, v = _rand(13, (b, nkv, s, d)), _rand(14, (b, nkv, s, d))
    full = flash_attention(q, k, v, interpret=True)
    half = s // 2
    o1, m1, l1 = flash_attention(q, k[:, :, :half], v[:, :, :half],
                                 return_residuals=True, interpret=True)
    o2, m2, l2 = flash_attention(q, k[:, :, half:], v[:, :, half:],
                                 return_residuals=True, interpret=True)
    m = np.maximum(np.asarray(m1), np.asarray(m2))
    w1 = np.asarray(l1) * np.exp(np.asarray(m1) - m)
    w2 = np.asarray(l2) * np.exp(np.asarray(m2) - m)
    num = (np.asarray(o1) * w1[..., None] + np.asarray(o2) * w2[..., None])
    out = num / (w1 + w2)[..., None]
    np.testing.assert_allclose(out, np.asarray(full), atol=2e-5, rtol=2e-5)
