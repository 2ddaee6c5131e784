"""Pallas TPU flash attention — the in-framework replacement for the
reference's flash-attn CUDA kernels (Dockerfile:45, selected at
src/server.py:294-298).

Differentiable: a custom VJP recomputes exact gradients in the backward
pass from a dense-mask XLA restatement of the same function (the standard
flash trade — recompute the [T,S] scores instead of saving them), so
training (runtime/train.py, parallel/pipeline.py, context parallelism)
works on TPU where the auto-dispatch selects this kernel.

Inference-oriented design (this framework trains rarely, serves constantly):

* online-softmax tiling over the KV axis — the [T, S] scores matrix never
  materializes in HBM (guide: boom_attention_tricks.md §2-4);
* GQA without K/V repetition: grid iterates KV heads; each kernel instance
  computes the whole query GROUP [G·block_q rows] against its KV head —
  "commute sum and matmul" for MXU efficiency;
* STRUCTURED masks instead of dense [B,T,S] bools: the three patterns this
  framework needs (decoder causal + left-pad valid_from; encoder
  block-diagonal windows; right-pad valid_to) are computed from iota inside
  the kernel — no mask bandwidth;
* fp32 softmax statistics, mask value -0.7·f32max (not -inf), safe divide
  for fully-masked rows.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import MASK_VALUE  # shared masked-score sentinel


def _kernel(valid_from_ref, valid_to_ref, q_offset_ref, q_ref, k_ref, v_ref,
            o_ref, m_ref, l_ref, m_scratch, l_scratch, acc_scratch, *,
            block_q: int, block_k: int, sm_scale: float, causal: bool,
            window_block: int, s_len: int):
    """Grid: (B, n_kv, T_pad//block_q, S_pad//block_k).

    q_ref: [1, 1, G, block_q, D] — G query heads of this KV head's group.
    k_ref/v_ref: [1, 1, block_k, D]. Accumulators persist over the last
    grid axis.
    """
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    g = q_ref.shape[2]
    d = q_ref.shape[-1]

    q = q_ref[0, 0].reshape(g * block_q, d)                   # [G·bq, D]
    k = k_ref[0, 0]                                            # [bk, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s *= sm_scale                                              # [G·bq, bk]

    # ---- structured mask ------------------------------------------------------
    rows_local = jax.lax.broadcasted_iota(jnp.int32, (g * block_q, block_k), 0)
    rows = rows_local % block_q + qi * block_q + q_offset_ref[b]  # global q pos
    cols = (jax.lax.broadcasted_iota(jnp.int32, (g * block_q, block_k), 1)
            + ki * block_k)                                    # global k pos
    mask = cols < s_len
    if causal:
        mask &= cols <= rows
    if window_block > 0:
        mask &= (rows // window_block) == (cols // window_block)
    vf = valid_from_ref[b]
    vt = valid_to_ref[b]
    mask &= (cols >= vf) & (cols < vt)
    s = jnp.where(mask, s, MASK_VALUE)

    # ---- online softmax update -------------------------------------------------
    m_prev = m_scratch[...]                                    # [G·bq, 128]
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=-1, keepdims=True)                # [G·bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    p = jnp.where(mask, p, 0.0)  # kill exp(MASK-MASK)=1 rows fully masked
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    m_scratch[...] = m_next
    l_scratch[...] = l_next

    v = v_ref[0, 0]                                            # [bk, D]
    o_curr = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    @pl.when(ki == n_k - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
        out = (acc_scratch[...] / l_safe).astype(o_ref.dtype)
        o_ref[0, 0] = out.reshape(g, block_q, d)
        # Softmax residuals for cross-shard combines (context parallelism,
        # ops/context_parallel.py): row max m and normalizer l.
        m_ref[0, 0] = m_scratch[...][:, :1].reshape(g, block_q)
        l_ref[0, 0] = l_final.reshape(g, block_q)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False,
                    q_offset=0,
                    kv_valid_from: Optional[jax.Array] = None,
                    kv_valid_to: Optional[jax.Array] = None,
                    window_block: int = 0,
                    sm_scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    return_residuals: bool = False,
                    interpret: bool = False):
    """q: [B, Nq, T, D]; k/v: [B, Nkv, S, D] → [B, Nq, T, D].

    Masking (all optional, composable):
      causal         — global col ≤ global row (row = local + q_offset)
      q_offset       — global position of q row 0: int, scalar, or [B]
                       (traced values fine — decode steps inside while_loop)
      kv_valid_from  — [B] first attendable key (left-padded prompts)
      kv_valid_to    — [B] one-past-last attendable key (right padding)
      window_block   — block-diagonal attention of this width (encoder)

    return_residuals=True additionally returns the per-row softmax stats
    (m, l) as [B, Nq, T] f32 — the ingredients of the cross-shard
    online-softmax combine used by context parallelism
    (ops/context_parallel.py).
    """
    b, nq, t, d = q.shape
    _, nkv, s_len, _ = k.shape
    assert nq % nkv == 0
    if sm_scale is None:
        sm_scale = d ** -0.5

    if kv_valid_from is None:
        kv_valid_from = jnp.zeros((b,), jnp.int32)
    if kv_valid_to is None:
        kv_valid_to = jnp.full((b,), s_len, jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))

    out, m_res, l_res = _flash_diff(
        causal, int(window_block), float(sm_scale), block_q, block_k,
        interpret, q, k, v, kv_valid_from.astype(jnp.int32),
        kv_valid_to.astype(jnp.int32), q_offset)
    if not return_residuals:
        return out
    return out, m_res, l_res


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _flash_diff(causal, window_block, sm_scale, block_q, block_k, interpret,
                q, k, v, kv_valid_from, kv_valid_to, q_offset):
    """Differentiable core: Pallas forward, XLA-recompute backward.

    The backward pass re-derives exact gradients of the SAME function
    (dense-mask XLA formulation, `_xla_forward`) via jax.vjp — the
    standard flash-attention trade (recompute scores in bwd instead of
    saving the [T,S] matrix). All three outputs (out, m, l) carry
    cotangents, so the context-parallel combine (which consumes m/l) is
    differentiable end-to-end."""
    return _flash_pallas(q, k, v, kv_valid_from, kv_valid_to, q_offset,
                         causal=causal, window_block=window_block,
                         sm_scale=sm_scale, block_q=block_q,
                         block_k=block_k, interpret=interpret)


def _flash_diff_fwd(causal, window_block, sm_scale, block_q, block_k,
                    interpret, q, k, v, kv_valid_from, kv_valid_to, q_offset):
    out = _flash_pallas(q, k, v, kv_valid_from, kv_valid_to, q_offset,
                        causal=causal, window_block=window_block,
                        sm_scale=sm_scale, block_q=block_q,
                        block_k=block_k, interpret=interpret)
    return out, (q, k, v, kv_valid_from, kv_valid_to, q_offset)


def _flash_diff_bwd(causal, window_block, sm_scale, block_q, block_k,
                    interpret, saved, cts):
    q, k, v, kv_valid_from, kv_valid_to, q_offset = saved
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_forward(
            q_, k_, v_, kv_valid_from, kv_valid_to, q_offset,
            causal=causal, window_block=window_block, sm_scale=sm_scale),
        q, k, v)
    dq, dk, dv = vjp(cts)
    int_zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (dq, dk, dv, int_zero(kv_valid_from), int_zero(kv_valid_to),
            int_zero(q_offset))


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _xla_forward(q, k, v, kv_valid_from, kv_valid_to, q_offset, *,
                 causal, window_block, sm_scale):
    """Dense-mask XLA restatement of the kernel's exact function
    (including MASK_VALUE semantics, safe divide for fully-masked rows,
    and the f32 softmax stats (m, l) the kernel emits as residuals).
    Used only inside the custom-VJP backward — XLA differentiates it."""
    b, nq, t, d = q.shape
    _, nkv, s_len, _ = k.shape
    g = nq // nkv
    qg = q.reshape(b, nkv, g, t, d)
    s = jnp.einsum("bhgtd,bhsd->bhgts", qg.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    rows = (jax.lax.broadcasted_iota(jnp.int32, (b, t, s_len), 1)
            + q_offset[:, None, None])
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, t, s_len), 2)
    mask = ((cols >= kv_valid_from[:, None, None])
            & (cols < kv_valid_to[:, None, None]))
    if causal:
        mask &= cols <= rows
    if window_block > 0:
        mask &= (rows // window_block) == (cols // window_block)
    mask = mask[:, None, None]                      # [B, 1, 1, T, S]
    s = jnp.where(mask, s, MASK_VALUE)
    m = jnp.max(s, axis=-1)                          # [B, nkv, G, T]
    p = jnp.where(mask, jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (jnp.einsum("bhgts,bhsd->bhgtd", p, v.astype(jnp.float32))
           / l_safe[..., None])
    return (out.reshape(b, nq, t, d).astype(q.dtype),
            m.reshape(b, nq, t), l.reshape(b, nq, t))


def _flash_pallas(q, k, v, kv_valid_from, kv_valid_to, q_offset, *,
                  causal, window_block, sm_scale, block_q, block_k,
                  interpret):
    b, nq, t, d = q.shape
    _, nkv, s_len, _ = k.shape
    g = nq // nkv

    block_q = min(block_q, max(t, 16))
    block_k = min(block_k, max(s_len, 128))

    t_pad = -(-t // block_q) * block_q
    s_pad = -(-s_len // block_k) * block_k
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s_len:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s_len), (0, 0)))

    # Group query heads with their KV head: [B, n_kv, G, T, D]
    qg = q.reshape(b, nkv, g, t_pad, d)

    grid = (b, nkv, t_pad // block_q, s_pad // block_k)

    kernel = functools.partial(
        _kernel, block_q=block_q, block_k=block_k, sm_scale=float(sm_scale),
        causal=causal, window_block=int(window_block), s_len=s_len)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, g, block_q, d),
                             lambda b_, h, qi, ki, *_refs: (b_, h, 0, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b_, h, qi, ki, *_refs: (b_, h, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b_, h, qi, ki, *_refs: (b_, h, ki, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, g, block_q, d),
                             lambda b_, h, qi, ki, *_refs: (b_, h, 0, qi, 0)),
                pl.BlockSpec((1, 1, g, block_q),
                             lambda b_, h, qi, ki, *_refs: (b_, h, 0, qi)),
                pl.BlockSpec((1, 1, g, block_q),
                             lambda b_, h, qi, ki, *_refs: (b_, h, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((g * block_q, 128), jnp.float32),  # m
                pltpu.VMEM((g * block_q, 128), jnp.float32),  # l
                pltpu.VMEM((g * block_q, d), jnp.float32),    # acc
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, nkv, g, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, nkv, g, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, g, t_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kv_valid_from, kv_valid_to, q_offset, qg, k, v)

    out, m_res, l_res = out
    out = out.reshape(b, nq, t_pad, d)[:, :, :t]
    m_res = m_res.reshape(b, nq, t_pad)[:, :, :t]
    l_res = l_res.reshape(b, nq, t_pad)[:, :, :t]
    return out, m_res, l_res

