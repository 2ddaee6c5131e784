"""Native weight quantization: int8 / fp8 weight-only with per-channel scales.

TPU-native replacement for the reference's bitsandbytes INT8
(src/server.py:311-318) and torchao FP8 (src/server.py:358-390) paths,
selected by the same ``QUANTIZE`` env var ("", "int8", "fp8").

Storage is a ``{"q": low-precision values, "s": per-output-channel scales}``
leaf (a dict, so it traverses as a pytree and stacks per-layer for the scan
layout). Matmuls dequantize in-register: XLA fuses the scale multiply into
the dot epilogue, so HBM traffic per weight is the low-precision payload —
the actual bottleneck decode is bound by. ~50% (int8/fp8 vs bf16) weight
memory, matching the reference's ~50% VRAM reduction claim.
"""
from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp

# Weights worth quantizing (large matmul operands). Norms/biases stay put.
_DECODER_QUANT_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}
_ENCODER_QUANT_KEYS = {"wq", "wk", "wv", "wo", "fc1_w", "fc2_w"}


def quantize_array(w: jax.Array, mode: str) -> dict:
    """Per-output-channel symmetric quantization of a [..., in, out] weight."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    if mode == "int8":
        scale = jnp.maximum(absmax / 127.0, 1e-10)
        q = jnp.clip(jnp.round(wf / scale), -128, 127).astype(jnp.int8)
    elif mode == "fp8":
        # e4m3 max normal = 448
        scale = jnp.maximum(absmax / 448.0, 1e-10)
        q = (wf / scale).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unknown quantization mode: {mode}")
    # Scales keep the SOURCE dtype: it marks the compute precision the rest
    # of the model runs in (f32 on CPU engines, bf16 in production) — a
    # hardcoded bf16 here would silently downgrade f32 pipelines.
    return {"q": q, "s": scale.astype(w.dtype)}


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and set(w.keys()) == {"q", "s"}


def dequantize(w: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (w["q"].astype(jnp.float32) * w["s"].astype(jnp.float32)).astype(dtype)


def qdot(x: jax.Array, w: Union[jax.Array, dict]) -> jax.Array:
    """x @ w for plain or quantized weights.

    Dequant-then-dot: the scale is per OUTPUT channel, so it commutes out of
    the contraction — (x @ q) * s — keeping the MXU operand low-precision
    and applying scales on the small output tile.
    """
    if not is_quantized(w):
        return x @ w
    out = jnp.dot(x, w["q"].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    return (out * w["s"].astype(jnp.float32)).astype(x.dtype)


def quantize_embed(w: jax.Array, mode: str) -> dict:
    """Per-vocab-row symmetric quantization of the [V, H] embedding.

    The row is the output channel of the tied lm_head matmul (hidden @ E.T),
    so the scale commutes out of that contraction too; the embedding lookup
    multiplies each gathered row by its scale. Halves the single largest
    tensor (151k x H) — the per-decode-step logits read drops with it."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)  # [V, 1]
    if mode == "int8":
        scale = jnp.maximum(absmax / 127.0, 1e-10)
        q = jnp.clip(jnp.round(wf / scale), -128, 127).astype(jnp.int8)
    elif mode == "fp8":
        scale = jnp.maximum(absmax / 448.0, 1e-10)
        q = (wf / scale).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unknown quantization mode: {mode}")
    return {"q": q, "s": scale.astype(w.dtype)}  # source compute dtype


def quantize_decoder_params(params: dict, mode: str,
                            include_embed: bool = True) -> dict:
    """Quantize the large decoder matmul weights; everything else unchanged."""
    out = dict(params)
    out["layers"] = {
        k: (quantize_array(v, mode) if k in _DECODER_QUANT_KEYS else v)
        for k, v in params["layers"].items()
    }
    if include_embed and not is_quantized(params["embed"]):
        out["embed"] = quantize_embed(params["embed"], mode)
        if "lm_head" in params and not is_quantized(params["lm_head"]):
            out["lm_head"] = quantize_array(params["lm_head"], mode)
    return out


def quantize_encoder_params(params: dict, mode: str) -> dict:
    out = dict(params)
    out["layers"] = {
        k: (quantize_array(v, mode) if k in _ENCODER_QUANT_KEYS else v)
        for k, v in params["layers"].items()
    }
    return out


def quantize_params(params: dict, mode: str) -> dict:
    """Quantize an {"encoder", "decoder"} bundle (QUANTIZE=int8|fp8).

    ASR_QUANTIZE_EMBED=false keeps the embedding/lm_head in full precision
    (slower per-step logits, slightly safer numerics)."""
    import os
    include_embed = os.getenv("ASR_QUANTIZE_EMBED", "true").lower() != "false"
    out = dict(params)
    if "decoder" in params:
        out["decoder"] = quantize_decoder_params(params["decoder"], mode,
                                                 include_embed=include_embed)
    if "encoder" in params:
        out["encoder"] = quantize_encoder_params(params["encoder"], mode)
    return out


def param_bytes(tree) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(tree))
