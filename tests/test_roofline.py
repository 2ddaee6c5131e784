"""Analytic roofline model (runtime/roofline.py) sanity.

The scoreboard bench derives MFU/HBM-utilization from this model because
XLA's HloCostAnalysis under-reports the fused TPU program ~10x
(roofline.py docstring). These tests pin the properties the bench relies
on: linear batch scaling, monotonicity in clip length, a decode-dominated
HBM mix (weights re-read per step), and agreement with hand 2*m*n*k math
for the decoder matmul term.
"""
import numpy as np
import pytest

from qwen3_asr_tpu.runtime.engine import TranscriptionEngine, max_new_tokens_for
from qwen3_asr_tpu.runtime.roofline import analytic_cost, _tree_bytes

from tests.fixtures import load_tiny_model, write_tiny_checkpoint


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("roofline_ckpt"))
    write_tiny_checkpoint(path)
    return TranscriptionEngine(load_tiny_model(path))


def test_linear_in_batch(engine):
    bf, bs = engine.bucket_frames(16000)
    c1 = analytic_cost(engine, 1, bf, bs)
    c4 = analytic_cost(engine, 4, bf, bs)
    assert c4.flops == pytest.approx(4 * c1.flops, rel=1e-9)
    # HBM is NOT linear: weights are re-read once per dispatch regardless
    # of batch, so batch-4 traffic is under 4x (the whole point of batching).
    assert c4.hbm_bytes < 4 * c1.hbm_bytes
    assert c4.hbm_bytes > c1.hbm_bytes


def test_monotone_in_clip_length(engine):
    bf1, bs1 = engine.bucket_frames(16000)
    bf6, bs6 = engine.bucket_frames(6 * 16000)
    c1 = analytic_cost(engine, 1, bf1, bs1)
    c6 = analytic_cost(engine, 1, bf6, bs6)
    assert c6.flops > c1.flops
    assert c6.hbm_bytes > c1.hbm_bytes


def test_weights_reread_per_decode_step(engine):
    bf, bs = engine.bucket_frames(16000)
    c = analytic_cost(engine, 1, bf, bs)
    steps = max_new_tokens_for(bs) - 1
    enc_b = _tree_bytes(engine.model.params["encoder"])
    dec_b = _tree_bytes(engine.model.params["decoder"])
    assert c.detail["weights_gb_per_dispatch"] == enc_b + dec_b * (1 + steps)
    assert c.hbm_bytes > c.detail["weights_gb_per_dispatch"]


def test_decode_matmul_flops_hand_math(engine):
    """The per-step decoder matmul term must match 2*m*n*k by hand."""
    bf, bs = engine.bucket_frames(16000)
    c = analytic_cost(engine, 1, bf, bs)
    dec = engine.model.cfg.decoder
    steps = max_new_tokens_for(bs) - 1
    layer_mm = (2 * dec.hidden_size * dec.num_attention_heads * dec.head_dim
                + 2 * dec.hidden_size * dec.num_key_value_heads * dec.head_dim
                + 3 * dec.hidden_size * dec.intermediate_size)
    mm_only = steps * 2.0 * (dec.num_hidden_layers * layer_mm
                             + dec.hidden_size * dec.vocab_size)
    # decode_flops = matmuls + cache attention; attention is additive.
    assert c.detail["decode_flops"] > mm_only
    assert c.detail["decode_flops"] < mm_only * 10  # tiny cfg: attn small-ish


def test_as_dict_units(engine):
    bf, bs = engine.bucket_frames(16000)
    d = analytic_cost(engine, 8, bf, bs).as_dict()
    assert set(d) >= {"tflops", "hbm_gb", "encoder_flops", "prefill_flops",
                      "decode_flops"}
    assert all(isinstance(v, float) for v in d.values())
