"""Attention ops with a pluggable backend.

``attend`` is the single attention entry point used by both the audio
encoder (bidirectional, block-diagonal window mask) and the text decoder
(causal + KV cache). The default backend is pure-XLA einsum (compiles and
fuses well everywhere, used on CPU in tests); on TPU the Pallas
flash-attention backend (ops/flash_attention.py) is selected for long
sequences where the O(T·S) scores materialization matters.

GQA is computed without materializing repeated K/V: queries are reshaped to
[B, n_kv, group, T, D] so each KV head serves its query group in one einsum
— the "commute sum and matmul" trick for MXU efficiency.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

# Masked-score sentinel shared by every attention backend. This is a
# cross-kernel numeric contract: ops/context_parallel.py combines online-
# softmax (m, l) residuals produced by DIFFERENT backends, so all kernels
# must mask with the same finite value (not -inf, which breaks exp/alpha
# arithmetic for fully-masked rows).
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_MASK_VALUE = MASK_VALUE


class AttnSpec(NamedTuple):
    """Structured attention-mask descriptor.

    Describes every mask pattern this framework uses without materializing a
    dense [B, T, S] boolean: the flash backend evaluates it from iota inside
    the kernel; the XLA backend expands it to a dense mask once per forward.

      causal       — col ≤ row + q_offset
      q_offset     — global position of q row 0 (int, scalar, or [B])
      valid_from   — [B] first attendable key (left-padded prompt)
      valid_to     — [B] one-past-last attendable key (right padding)
      window_block — block-diagonal width (encoder windows), 0 = off
    """
    causal: bool = False
    q_offset: Union[int, jax.Array] = 0
    valid_from: Optional[jax.Array] = None
    valid_to: Optional[jax.Array] = None
    window_block: int = 0

    def dense_mask(self, b: int, t: int, s: int) -> jax.Array:
        """Expand to a [B, T, S] boolean mask (True = attend)."""
        rows = (jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)[None]
                + jnp.broadcast_to(jnp.asarray(self.q_offset, jnp.int32),
                                   (b,))[:, None, None])
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)[None]
        mask = jnp.ones((b, t, s), bool)
        if self.causal:
            mask &= cols <= rows
        if self.window_block > 0:
            w = self.window_block
            mask &= (rows // w) == (cols // w)
        if self.valid_from is not None:
            mask &= cols >= self.valid_from[:, None, None]
        if self.valid_to is not None:
            mask &= cols < self.valid_to[:, None, None]
        return mask


def _resolve_backend(backend: str, *, is_decode_step: bool, on_tpu: bool,
                     has_scales: bool, s_len: int, head_dim: int,
                     t: int) -> str:
    """Backend decision, pure so the dispatch invariants are unit-testable
    (tests/test_decode_attention.py::test_backend_resolution)."""
    if backend in ("decode", "decode_interpret") and not is_decode_step:
        # The decode-kernel opt-in only covers decode STEPS; prefill and
        # encoder attention keep the auto (flash/XLA) dispatch — otherwise
        # setting it would silently downgrade every other attention to a
        # dense-mask XLA path.
        backend = "auto"
    if backend in ("decode", "flash") and not on_tpu:
        # Non-interpret Pallas kernels only lower on TPU — an explicit
        # opt-in on a CPU host falls back rather than crashing pallas_call
        # (mirrors models/decoder._decode_kernel_choice).
        backend = "auto"
    if backend != "auto":
        return backend
    # A/B on v5e: for short caches (≤~512) XLA's fused einsum beats the
    # manual-DMA decode kernel (82× vs 61× RT at S=508); the kernel's
    # block skipping pays off once the padded cache is long. Sub-byte
    # caches (scales present) must stay on XLA for decode STEPS: only the
    # scores-side scale path avoids materializing the widened K/V in HBM —
    # folding the scales for a Pallas decode kernel recreates the exact
    # 3× HBM-traffic pathology the int4 design exists to avoid
    # (attend_spec docstring). Prefill (t > 1) folds deliberately: once
    # per request and MXU-bound.
    if on_tpu and is_decode_step and s_len >= 2048 and not has_scales:
        return "decode"
    if on_tpu and head_dim >= 64 and t > 1:
        # head_dim < 64 (tiny test models) hits Mosaic layout limits and
        # is XLA-friendly anyway.
        return "flash"
    return "xla"


def attend_spec(q: jax.Array, k: jax.Array, v: jax.Array, spec: AttnSpec,
                *, scale: Optional[float] = None,
                backend: Optional[str] = None,
                k_scale: Optional[jax.Array] = None,
                v_scale: Optional[jax.Array] = None) -> jax.Array:
    """Spec-driven attention with backend dispatch (xla | flash | auto).

    k_scale/v_scale ([B, n_kv, S, 1]): per-(token, head) dequant scales for
    sub-byte KV caches. They are applied on the SCORES/WEIGHTS side
    (q·(k·ks) = (q·k)·ks and Σ p·(v·vs) = Σ (p·vs)·v), so the [B,n_kv,S,D]
    operands stay pure dtype converts that XLA fuses into the einsum reads
    — multiplying the widened K/V directly forces a full-size bf16
    materialization in HBM (measured on v5e: the int4 cache LOST to fp8
    end-to-end until the scales moved off the operands)."""
    backend = backend or os.getenv("ASR_ATTN_BACKEND", "auto")
    is_decode_step = (q.shape[-2] == 1 and not spec.causal
                      and spec.window_block == 0)
    backend = _resolve_backend(
        backend, is_decode_step=is_decode_step,
        on_tpu=jax.default_backend() == "tpu",
        has_scales=k_scale is not None or v_scale is not None,
        s_len=k.shape[-2], head_dim=q.shape[-1], t=q.shape[-2])
    if backend != "xla" and (k_scale is not None or v_scale is not None):
        # Pallas backends take plain K/V: fold the scales in. Only prefill
        # (MXU-bound, once per request) and the opt-in decode kernels land
        # here — the decode hot path resolves to "xla" above.
        if k_scale is not None:
            k = k * k_scale.astype(k.dtype)
        if v_scale is not None:
            v = v * v_scale.astype(v.dtype)
        k_scale = v_scale = None
    if backend in ("decode", "decode_interpret") and is_decode_step:
        from .decode_attention import decode_attention
        return decode_attention(
            q, k, v, kv_valid_from=spec.valid_from,
            kv_valid_to=spec.valid_to, sm_scale=scale,
            interpret=(backend == "decode_interpret"))
    if backend in ("flash", "flash_interpret"):
        from .flash_attention import flash_attention
        return flash_attention(
            q, k, v, causal=spec.causal, q_offset=spec.q_offset,
            kv_valid_from=spec.valid_from, kv_valid_to=spec.valid_to,
            window_block=spec.window_block, sm_scale=scale,
            interpret=(backend == "flash_interpret"))
    b, _, t, _ = q.shape
    s = k.shape[-2]
    mask = spec.dense_mask(b, t, s)
    return attend_xla(q, k, v, mask=mask[:, None], scale=scale,
                      k_scale=k_scale, v_scale=v_scale)


def attend_xla(q: jax.Array, k: jax.Array, v: jax.Array, *,
               mask: Optional[jax.Array] = None,
               scale: Optional[float] = None,
               k_scale: Optional[jax.Array] = None,
               v_scale: Optional[jax.Array] = None) -> jax.Array:
    """Reference XLA attention.

    q: [B, Nq, T, D]; k, v: [B, Nkv, S, D]; mask: broadcastable to
    [B, 1, T, S] (True = attend). k_scale/v_scale: optional [B, Nkv, S, 1]
    per-key dequant scales applied to scores/weights (see attend_spec).
    Returns [B, Nq, T, D] in q.dtype.
    """
    b, nq, t, d = q.shape
    nkv = k.shape[1]
    assert nq % nkv == 0, f"query heads {nq} not divisible by kv heads {nkv}"
    g = nq // nkv
    if scale is None:
        scale = d ** -0.5

    qg = q.reshape(b, nkv, g, t, d)
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        scores = scores * k_scale.astype(jnp.float32).reshape(
            b, nkv, 1, 1, -1)
    if mask is not None:
        scores = jnp.where(mask[:, :, None, :, :] if mask.ndim == 4
                           else mask[:, None, None, :, :], scores, _MASK_VALUE)
    weights = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        weights = weights * v_scale.astype(jnp.float32).reshape(
            b, nkv, 1, 1, -1)
    out = jnp.einsum("bhgts,bhsd->bhgtd", weights.astype(v.dtype), v)
    return out.reshape(b, nq, t, d)


def make_causal_mask(t: int, s: int, offset: int = 0) -> jax.Array:
    """[t, s] boolean causal mask; query i attends key j iff j <= i + offset."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    return cols <= rows + offset


def make_block_diagonal_mask(t: int, block: int) -> jax.Array:
    """[t, t] boolean mask: bidirectional attention within fixed-size blocks.

    The TPU-native equivalent of the reference encoder's varlen cu_seqlens
    windowing (transformers qwen3_omni_moe modeling: windowed FA2 attention):
    static shape, no ragged tensors, fuses into the attention kernel.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0) // block
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) // block
    return rows == cols
