"""Parity tests: JAX AuT audio encoder vs transformers Qwen3OmniMoeAudioEncoder.

Uses a tiny random HF audio tower on CPU (eager attention) and the
production weight converter. Configs follow the self-consistent family
(n_window=50 → 100-frame conv chunks → 13 tokens/chunk) used by the real
checkpoints.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from qwen3_asr_tpu.models.config import AudioEncoderConfig
from qwen3_asr_tpu.models.encoder import (
    conv_tokens_per_chunk,
    encoder_forward,
    encoder_output_length,
    init_encoder_params,
)
from qwen3_asr_tpu.runtime.checkpoint import convert_encoder_state_dict

CFG = AudioEncoderConfig(
    num_mel_bins=32, d_model=32, encoder_layers=2, encoder_attention_heads=4,
    encoder_ffn_dim=64, output_dim=48, downsample_hidden_size=16,
    n_window=50, n_window_infer=200, max_source_positions=1500,
)


@pytest.fixture(scope="module")
def hf_encoder():
    import torch
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoder,
    )
    torch.manual_seed(0)
    cfg = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=CFG.num_mel_bins, d_model=CFG.d_model,
        encoder_layers=CFG.encoder_layers,
        encoder_attention_heads=CFG.encoder_attention_heads,
        encoder_ffn_dim=CFG.encoder_ffn_dim, output_dim=CFG.output_dim,
        downsample_hidden_size=CFG.downsample_hidden_size,
        n_window=CFG.n_window, n_window_infer=CFG.n_window_infer,
        attn_implementation="eager",
    )
    return Qwen3OmniMoeAudioEncoder(cfg).eval()


@pytest.fixture(scope="module")
def jax_params(hf_encoder):
    sd = {k: v.detach().numpy() for k, v in hf_encoder.state_dict().items()}
    return convert_encoder_state_dict(sd, CFG, dtype=jnp.float32)


def _hf_forward(hf_encoder, mel: np.ndarray) -> np.ndarray:
    """mel: [n_mels, T] → [n_tokens, output_dim]."""
    import torch
    with torch.no_grad():
        out = hf_encoder(
            torch.from_numpy(mel).float(),
            feature_lens=torch.tensor([mel.shape[1]]),
        )
    return out.last_hidden_state.numpy()


def _jax_forward(params, mel: np.ndarray, pad_to: int = None) -> np.ndarray:
    t = mel.shape[1]
    chunk = CFG.n_window * 2
    if pad_to is None:
        pad_to = ((t + chunk - 1) // chunk) * chunk
    padded = np.pad(mel, ((0, 0), (0, pad_to - t)))
    out, tok_lens = encoder_forward(params, CFG, jnp.asarray(padded)[None],
                                    jnp.asarray([t]))
    return np.asarray(out)[0, :int(tok_lens[0])]


@pytest.mark.parametrize("t_mel", [100, 230, 400])
def test_encoder_matches_hf(hf_encoder, jax_params, t_mel):
    rng = np.random.default_rng(t_mel)
    mel = rng.standard_normal((CFG.num_mel_bins, t_mel)).astype(np.float32)
    theirs = _hf_forward(hf_encoder, mel)
    ours = _jax_forward(jax_params, mel)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_encoder_bucket_padding_invariant(hf_encoder, jax_params):
    """Padding mel to a larger bucket must not change valid tokens."""
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((CFG.num_mel_bins, 230)).astype(np.float32)
    exact = _jax_forward(jax_params, mel)            # padded to 300
    bucketed = _jax_forward(jax_params, mel, pad_to=600)
    np.testing.assert_allclose(exact, bucketed, atol=1e-5)


def test_output_length_formula():
    assert conv_tokens_per_chunk(100) == 13
    assert int(encoder_output_length(100, 100)) == 13
    assert int(encoder_output_length(230, 100)) == 26 + 4
    assert int(encoder_output_length(30, 100)) == 4
    # and matches the HF module-level formula
    for t in (1, 8, 99, 100, 101, 230, 300, 457):
        leave = t % 100
        feat = (leave - 1) // 2 + 1
        hf = ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (t // 100) * 13
        assert int(encoder_output_length(t, 100)) == hf, t


def test_random_init_forward_shape():
    import jax
    params = init_encoder_params(CFG, jax.random.PRNGKey(0))
    mel = jnp.zeros((2, CFG.num_mel_bins, 200))
    out, lens = encoder_forward(params, CFG, mel, jnp.asarray([200, 150]))
    assert out.shape == (2, 26, CFG.output_dim)
    assert lens.tolist() == [26, 20]
