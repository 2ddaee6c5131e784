"""AuT audio encoder in functional JAX (Qwen3-Omni audio tower design).

Architecture (parity-tested against transformers' Qwen3OmniMoeAudioEncoder
in tests/test_encoder_parity.py): log-mel [n_mels, T] is split into chunks
of ``n_window*2`` frames; each chunk runs three stride-2 conv2d+GELU stages
(8× time / 8× mel downsample), a linear ``conv_out`` to d_model, and a
sinusoidal positional embedding that RESTARTS per chunk; the token sequence
then passes ``encoder_layers`` pre-LN transformer blocks whose self-attention
is BLOCK-DIAGONAL over windows of ``n_window_infer`` mel frames; finally
ln_post → proj1 → GELU → proj2 projects into the decoder's hidden space.

TPU-first redesign vs the reference implementation:

* **No ragged tensors.** HF concatenates variable-length chunk lists and
  drives FlashAttention-2 with cu_seqlens. Here audio is bucket-padded to a
  multiple of the chunk size; chunks become a batch axis for the convs
  ([B*n_chunks, 1, n_mels, chunk]) and the windowed attention is a static
  block-diagonal boolean mask. Because only the LAST chunk can be partial,
  valid tokens always form a PREFIX of the flattened sequence — validity is
  a single length scalar, no gather/compaction needed.
* **Stacked layers + lax.scan** (same rationale as the decoder).
* All matmuls MXU-shaped with f32 accumulation.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import AttnSpec, attend_spec
from ..ops.quant import qdot
from .config import AudioEncoderConfig


def sinusoid_position_embedding(length: int, channels: int,
                                max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper-style sinusoidal PE [length, channels] (HF SinusoidsPositionEmbedding)."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def conv_tokens_per_chunk(chunk_frames: int) -> int:
    t = chunk_frames
    for _ in range(3):
        t = (t - 1) // 2 + 1
    return t


def encoder_output_length(feature_len, chunk_frames: int):
    """Valid token count for a mel length (works on ints or jnp scalars)."""
    per_chunk = conv_tokens_per_chunk(chunk_frames)
    n_full = feature_len // chunk_frames
    r = feature_len % chunk_frames
    # ceil(ceil(ceil(r/2)/2)/2) == ceil(r/8), and 0 for r == 0
    tail = (r + 7) // 8
    return n_full * per_chunk + tail


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def init_encoder_params(cfg: AudioEncoderConfig, key: jax.Array,
                        dtype=jnp.float32) -> dict:
    l, d, ffn = cfg.encoder_layers, cfg.d_model, cfg.encoder_ffn_dim
    ch = cfg.downsample_hidden_size
    keys = jax.random.split(key, 16)
    s = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    return {
        "conv1_w": rnd(keys[0], (ch, 1, 3, 3)), "conv1_b": jnp.zeros((ch,), dtype),
        "conv2_w": rnd(keys[1], (ch, ch, 3, 3)), "conv2_b": jnp.zeros((ch,), dtype),
        "conv3_w": rnd(keys[2], (ch, ch, 3, 3)), "conv3_b": jnp.zeros((ch,), dtype),
        "conv_out_w": rnd(keys[3], (cfg.conv_out_dim, d)),
        "layers": {
            "ln1_w": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
            "wq": rnd(keys[4], (l, d, d)), "bq": jnp.zeros((l, d), dtype),
            "wk": rnd(keys[5], (l, d, d)), "bk": jnp.zeros((l, d), dtype),
            "wv": rnd(keys[6], (l, d, d)), "bv": jnp.zeros((l, d), dtype),
            "wo": rnd(keys[7], (l, d, d)), "bo": jnp.zeros((l, d), dtype),
            "ln2_w": jnp.ones((l, d), dtype), "ln2_b": jnp.zeros((l, d), dtype),
            "fc1_w": rnd(keys[8], (l, d, ffn)), "fc1_b": jnp.zeros((l, ffn), dtype),
            "fc2_w": rnd(keys[9], (l, ffn, d)), "fc2_b": jnp.zeros((l, d), dtype),
        },
        "ln_post_w": jnp.ones((d,), dtype), "ln_post_b": jnp.zeros((d,), dtype),
        "proj1_w": rnd(keys[10], (d, d)), "proj1_b": jnp.zeros((d,), dtype),
        "proj2_w": rnd(keys[11], (d, cfg.output_dim)),
        "proj2_b": jnp.zeros((cfg.output_dim,), dtype),
    }


def _conv_frontend(params: dict, cfg: AudioEncoderConfig,
                   mel: jax.Array) -> jax.Array:
    """mel: [B, n_mels, T] with T % chunk == 0 → tokens [B, T//8-ish, d_model]."""
    b, n_mels, t = mel.shape
    chunk = cfg.n_window * 2
    n_chunks = t // chunk
    x = mel.reshape(b, n_mels, n_chunks, chunk)
    x = x.transpose(0, 2, 1, 3).reshape(b * n_chunks, 1, n_mels, chunk)

    dn = jax.lax.conv_dimension_numbers(x.shape, params["conv1_w"].shape,
                                        ("NCHW", "OIHW", "NCHW"))
    for w, bias in (("conv1_w", "conv1_b"), ("conv2_w", "conv2_b"),
                    ("conv3_w", "conv3_b")):
        x = jax.lax.conv_general_dilated(
            x, params[w].astype(x.dtype), window_strides=(2, 2),
            padding=((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + params[bias].astype(x.dtype)[None, :, None, None]
        x = jax.nn.gelu(x, approximate=False)

    bc, c, f, tt = x.shape                     # [B*n_chunks, ch, f, tok]
    x = x.transpose(0, 3, 1, 2).reshape(bc, tt, c * f)
    x = jnp.dot(x, params["conv_out_w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)

    pe = jnp.asarray(sinusoid_position_embedding(tt, cfg.d_model),
                     dtype=x.dtype)
    x = x + pe[None, :, :]
    return x.reshape(b, n_chunks * tt, cfg.d_model)


def _encoder_layer(cfg: AudioEncoderConfig, hidden: jax.Array, lp: dict,
                   attn_spec: AttnSpec) -> jax.Array:
    b, t, d = hidden.shape
    nh, hd = cfg.encoder_attention_heads, cfg.head_dim

    x = layer_norm(hidden, lp["ln1_w"], lp["ln1_b"])
    q = (qdot(x, lp["wq"]) + lp["bq"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = (qdot(x, lp["wk"]) + lp["bk"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = (qdot(x, lp["wv"]) + lp["bv"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    attn = attend_spec(q, k, v, attn_spec, scale=hd ** -0.5)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    hidden = hidden + qdot(attn, lp["wo"]) + lp["bo"]

    x = layer_norm(hidden, lp["ln2_w"], lp["ln2_b"])
    x = jax.nn.gelu(qdot(x, lp["fc1_w"]) + lp["fc1_b"], approximate=False)
    hidden = hidden + (qdot(x, lp["fc2_w"]) + lp["fc2_b"])
    return hidden


def encoder_forward(params: dict, cfg: AudioEncoderConfig, mel: jax.Array,
                    feature_lens: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """mel: [B, n_mels, T] bucket-padded to a multiple of n_window*2;
    feature_lens: [B] true mel frame counts.

    Returns (audio_embeds [B, n_tokens, output_dim], token_lens [B]).
    Tokens beyond token_lens are garbage and must be masked by the caller.
    """
    chunk = cfg.n_window * 2
    tokens = _conv_frontend(params, cfg, mel)          # [B, T_tok, d]
    b, t_tok, _ = tokens.shape

    token_lens = encoder_output_length(feature_lens, chunk)  # [B]

    # Block-diagonal window attention over valid tokens (static shapes;
    # evaluated from iota inside the flash kernel — never materialized).
    tokens_per_chunk = conv_tokens_per_chunk(chunk)
    window = tokens_per_chunk * max(1, cfg.n_window_infer // chunk)
    spec = AttnSpec(window_block=window, valid_to=token_lens)

    def body(hidden, lp):
        return _encoder_layer(cfg, hidden, lp, spec), None

    hidden, _ = jax.lax.scan(body, tokens, params["layers"])

    hidden = layer_norm(hidden, params["ln_post_w"], params["ln_post_b"])
    hidden = jax.nn.gelu(hidden @ params["proj1_w"] + params["proj1_b"],
                         approximate=False)
    hidden = hidden @ params["proj2_w"] + params["proj2_b"]
    return hidden, token_lens
