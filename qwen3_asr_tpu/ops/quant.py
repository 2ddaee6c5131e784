"""Native weight quantization: int8 / fp8 / int4 weight-only.

TPU-native replacement for the reference's bitsandbytes INT8
(src/server.py:311-318) and torchao FP8 (src/server.py:358-390) paths,
selected by the same ``QUANTIZE`` env var ("", "int8", "fp8", "int4").

Storage is a ``{"q": low-precision values, "s": scales}`` leaf (a dict, so
it traverses as a pytree and stacks per-layer for the scan layout).
Matmuls dequantize in-register: XLA fuses the scale multiply into the dot
epilogue, so HBM traffic per weight is the low-precision payload — the
actual bottleneck decode is bound by. int8/fp8 use per-output-channel
scales (~50% weight memory, matching the reference's claim).

``QUANTIZE=int4`` stores two signed nibbles per uint8 byte with GROUP-wise
scales along the contraction axis (``ASR_INT4_GROUP``, default 128 — the
per-channel scale of int8 is too coarse at 4 bits). uint8 — not the int4
dtype — because int4 arrays cannot cross jit boundaries on this jax build
(the bug family runtime/pool.py documents), and weights are jit arguments.
Packing pairs row i with row i + K/2, so the in-kernel unpack is a pure
row-concat (no interleave relayout — measured: an interleaving unpack is
3x SLOWER than int8; the concat layout fuses) and the grouped-scale einsum
sees rows in original order. Quarter-size weight payload on the dominant
decode-phase HBM read.
"""
from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp

# Weights worth quantizing (large matmul operands). Norms/biases stay put.
_DECODER_QUANT_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}
_ENCODER_QUANT_KEYS = {"wq", "wk", "wv", "wo", "fc1_w", "fc2_w"}


def _int4_group() -> int:
    import os
    return int(os.getenv("ASR_INT4_GROUP", "128"))


def quantize_array(w: jax.Array, mode: str) -> dict:
    """Symmetric quantization of a [..., in, out] weight: per-output-channel
    scales for int8/fp8, group-wise (along `in`) for int4."""
    wf = w.astype(jnp.float32)
    if mode == "int4":
        k = w.shape[-2]
        g = max(1, min(_int4_group(), k))
        while k % g:
            g -= 1                       # group must divide the row count
        gn = k // g
        grouped = wf.reshape(*w.shape[:-2], gn, g, w.shape[-1])
        absmax = jnp.max(jnp.abs(grouped), axis=-2)          # [..., G, out]
        scale = jnp.maximum(absmax / 7.0, 1e-10)
        q = jnp.clip(jnp.round(grouped / scale[..., :, None, :]), -8, 7)
        q = q.reshape(*w.shape[:-2], k, w.shape[-1]).astype(jnp.int32) + 8
        # byte row j packs rows j (lo nibble) and j + k/2 (hi nibble)
        assert k % 2 == 0, "int4 packing needs an even contraction dim"
        lo, hi = q[..., : k // 2, :], q[..., k // 2:, :]
        packed = (lo | (hi << 4)).astype(jnp.uint8)
        return {"q": packed, "s": scale.astype(w.dtype)}
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


def is_packed_int4(w: Any) -> bool:
    """Packed-nibble storage is marked by the uint8 payload dtype."""
    return is_quantized(w) and w["q"].dtype == jnp.uint8


def unpack_int4(q: jax.Array, axis: int = -2) -> jax.Array:
    """uint8 nibbles → int8 rows in ORIGINAL order (byte j holds rows j
    and j + K/2 along `axis`); a concat, never an interleave — Mosaic
    relayouts on an interleaving unpack cost 3× the matmul it feeds."""
    lo = (q & 15).astype(jnp.int8) - 8
    hi = (q >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=axis)


def dequantize(w: dict, dtype=jnp.bfloat16) -> jax.Array:
    if is_packed_int4(w):
        s = w["s"]
        if s.shape[-1] == 1:   # per-row scales: embedding, packed along H
            wq = unpack_int4(w["q"], axis=-1).astype(jnp.float32)
            return (wq * s.astype(jnp.float32)).astype(dtype)
        wq = unpack_int4(w["q"], axis=-2).astype(jnp.float32)
        k, n = wq.shape[-2], wq.shape[-1]
        gn = s.shape[-2]
        wq = wq.reshape(*wq.shape[:-2], gn, k // gn, n)
        wq = wq * s.astype(jnp.float32)[..., :, None, :]
        return wq.reshape(*wq.shape[:-3], k, n).astype(dtype)
    return (w["q"].astype(jnp.float32) * w["s"].astype(jnp.float32)).astype(dtype)


def _int8_act_min_tokens() -> int:
    """Row threshold for dynamic int8 activation quantization (W8A8).

    0 (default) disables. When ``ASR_INT8_ACT=true``, matmuls whose
    STATIC token count (product of x's leading dims) is at least this
    many rows quantize activations per-row and run the MXU in
    int8×int8→int32 — measured 1.9× over the dequant-in-matmul form on a
    scanned layer stack (v5e, 2026-08-18; /tmp probe recorded in
    CHANGELOG). Decode steps (rows == batch ≤ ~128) stay on the dequant
    path: they are HBM-bound, and the per-row quantize is pure VPU
    overhead there. The threshold is a trace-time Python branch — no
    device-side dynamism. Note the numerics become (static) shape-
    dependent under this flag: paths that batch the same request
    differently (fused batch vs decode-pool admission) may round
    differently, exactly as the reference's bitsandbytes int8 differs
    from its bf16 — the accuracy gates, not bitwise path-identity, are
    the contract when it is on."""
    import os
    if os.getenv("ASR_INT8_ACT", "").lower() != "true":
        return 0
    return int(os.getenv("ASR_INT8_ACT_MIN_TOKENS", "1024"))


def qdot(x: jax.Array, w: Union[jax.Array, dict]) -> jax.Array:
    """x @ w for plain or quantized weights.

    int8/fp8: the per-output-channel scale commutes out of the contraction
    — (x @ q) * s — keeping the MXU operand low-precision and applying
    scales on the small output tile. int4: group-wise scales along the
    contraction don't commute; the dot decomposes into G partial dots
    (one reshape, XLA batches them on the MXU) summed with scales.
    With ASR_INT8_ACT=true, large (prefill/encoder-sized) int8 matmuls
    additionally quantize the ACTIVATIONS per-row — W8A8, the reference's
    bitsandbytes int8 compute mode (src/server.py:311-318) — so the MXU
    runs at its int8 rate; see _int8_act_min_tokens.
    """
    if not is_quantized(w):
        return x @ w
    min_rows = _int8_act_min_tokens()
    if (min_rows and w["q"].dtype == jnp.int8 and w["q"].ndim == 2
            and jnp.issubdtype(x.dtype, jnp.floating)):
        rows = 1
        for d in x.shape[:-1]:
            rows *= int(d)
        if rows >= min_rows:
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.maximum(amax / 127.0, 1e-10)
            xi = jnp.clip(jnp.round(xf / xs), -128, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xi, w["q"], (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * xs * w["s"].astype(jnp.float32)
            return out.astype(x.dtype)
    if is_packed_int4(w):
        wq = unpack_int4(w["q"], axis=-2)                   # [K, N] int8
        s = w["s"]                                          # [G, N]
        gn = s.shape[-2]
        if gn == 1:
            out = jnp.dot(x, wq.astype(x.dtype),
                          preferred_element_type=jnp.float32)
            return (out * s.astype(jnp.float32)).astype(x.dtype)
        k, n = wq.shape[-2], wq.shape[-1]
        xg = x.reshape(*x.shape[:-1], gn, k // gn)
        wg = wq.reshape(gn, k // gn, n)
        out = jnp.einsum("...gk,gkn->...gn", xg, wg.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        out = jnp.sum(out * s.astype(jnp.float32), axis=-2)
        return out.astype(x.dtype)
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
    elif mode == "int4":
        # per-row scale; nibbles packed along H (col i pairs with i+H/2,
        # so the lookup/logits unpack is a concat in original order)
        scale = jnp.maximum(absmax / 7.0, 1e-10)
        q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int32) + 8
        h = w.shape[-1]
        q = (q[..., : h // 2] | (q[..., h // 2:] << 4)).astype(jnp.uint8)
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
