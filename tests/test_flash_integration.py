"""End-to-end: full model forward with the flash backend (interpret mode)
must produce the same tokens as the XLA backend."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.models.config import preset
from qwen3_asr_tpu.models.decoder import init_decoder_params
from qwen3_asr_tpu.models.encoder import encoder_forward, init_encoder_params
from qwen3_asr_tpu.runtime.generate import greedy_generate


@pytest.fixture
def setup():
    cfg = preset("tiny")
    key = jax.random.PRNGKey(0)
    dec = init_decoder_params(cfg.decoder, key)
    enc = init_encoder_params(cfg.encoder, jax.random.PRNGKey(1))
    return cfg, enc, dec


def _with_backend(backend, fn):
    old = os.environ.get("ASR_ATTN_BACKEND")
    os.environ["ASR_ATTN_BACKEND"] = backend
    try:
        return fn()
    finally:
        if old is None:
            os.environ.pop("ASR_ATTN_BACKEND", None)
        else:
            os.environ["ASR_ATTN_BACKEND"] = old


def test_generate_flash_equals_xla(setup):
    cfg, _, dec = setup
    key = jax.random.PRNGKey(2)
    embeds = jax.random.normal(key, (2, 24, cfg.decoder.hidden_size),
                               jnp.float32)
    valid_from = jnp.asarray([0, 5], jnp.int32)

    def run():
        return greedy_generate(dec, cfg.decoder, embeds, valid_from,
                               max_new=6, eos_id=cfg.eos_token_id,
                               pad_id=cfg.pad_token_id,
                               cache_dtype=jnp.float32)

    res_xla = _with_backend("xla", run)
    res_flash = _with_backend("flash_interpret", run)
    assert res_xla.tokens.tolist() == res_flash.tokens.tolist()


def test_encoder_flash_equals_xla(setup):
    cfg, enc, _ = setup
    mel = jax.random.normal(jax.random.PRNGKey(3),
                            (2, cfg.encoder.num_mel_bins, 200), jnp.float32)
    lens = jnp.asarray([200, 150], jnp.int32)

    def run():
        out, tl = encoder_forward(enc, cfg.encoder, mel, lens)
        return np.asarray(out), np.asarray(tl)

    out_x, tl_x = _with_backend("xla", run)
    out_f, tl_f = _with_backend("flash_interpret", run)
    assert tl_x.tolist() == tl_f.tolist()
    for i, t in enumerate(tl_x):
        np.testing.assert_allclose(out_x[i, :t], out_f[i, :t],
                                   atol=2e-4, rtol=1e-3)


def test_generate_decode_kernel_equals_xla(setup):
    """Decode steps through the paged decode kernel (interpret) must match."""
    cfg, _, dec = setup
    key = jax.random.PRNGKey(7)
    embeds = jax.random.normal(key, (1, 260, cfg.decoder.hidden_size),
                               jnp.float32)
    valid_from = jnp.zeros((1,), jnp.int32)

    def run():
        return greedy_generate(dec, cfg.decoder, embeds, valid_from,
                               max_new=5, eos_id=cfg.eos_token_id,
                               pad_id=cfg.pad_token_id,
                               cache_dtype=jnp.float32)

    res_xla = _with_backend("xla", run)
    res_dec = _with_backend("decode_interpret", run)
    assert res_xla.tokens.tolist() == res_dec.tokens.tolist()
