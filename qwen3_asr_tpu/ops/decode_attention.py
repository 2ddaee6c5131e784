"""Pallas decode-phase attention: single-token query vs a dense KV cache.

The inference-specific sibling of ops/flash_attention.py, following the
paged-attention playbook (boom_attention_tricks.md §8-13) on this
framework's dense per-request caches:

* KV stays in HBM (`pltpu.ANY`); the kernel DMAs one block at a time into a
  double-buffered VMEM scratch, overlapping the next block's fetch with the
  current block's compute;
* blocks entirely outside ``[valid_from, valid_to)`` are SKIPPED before the
  DMA is issued — HBM traffic scales with the true context length, not the
  bucket's padded maximum (the decode loop's cache is sized for
  prompt+max_new but early steps only need the prefix);
* the cache may be passed STACKED ``[L, B, n_kv, S, D]`` with a traced
  ``layer_idx`` (scalar-prefetched): the kernel DMAs the layer's blocks
  straight out of the stacked array. Inside the decoder's layer scan this
  removes the per-layer ``dynamic_slice`` materialization XLA otherwise
  pays (copy-out read+write of the whole layer cache ≈ 3× the attention
  HBM traffic — measured 8.4→5.6 ms/step at B32/S512 on v5e);
* GQA: grid iterates (batch, kv_head); each instance computes the whole
  query group [G, D] against its KV head — one MXU matmul per block;
* fp32 online-softmax statistics, safe divide.

Used for while_loop decode steps (q_len == 1).
"""
from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import MASK_VALUE  # shared masked-score sentinel


def _kernel(valid_from_ref, valid_to_ref, layer_ref, q_ref, k_hbm, v_hbm,
            o_ref, k_buf, v_buf, sem_k, sem_v, m_scr, l_scr, acc_scr,
            *, block_k: int, s_len: int, sm_scale: float):
    """Grid: (B, n_kv). q_ref: [1, 1, G, D] VMEM; k/v_hbm: [L, B, n_kv, S, D]
    in ANY/HBM (layer_ref[0] selects the layer); k/v_buf: [2, block_k, D]
    VMEM double buffers."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    lyr = layer_ref[0]
    n_blocks = s_len // block_k

    vf = valid_from_ref[b]
    vt = valid_to_ref[b]

    def block_live(i):
        start = i * block_k
        return (start < vt) & (start + block_k > vf)

    def dma_k(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[lyr, b, h, pl.ds(i * block_k, block_k), :],
            k_buf.at[slot], sem_k.at[slot])

    def dma_v(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[lyr, b, h, pl.ds(i * block_k, block_k), :],
            v_buf.at[slot], sem_v.at[slot])

    # find the first live block and prefetch it
    first = vf // block_k

    @pl.when(block_live(first))
    def _prefetch_first():
        dma_k(first % 2, first).start()
        dma_v(first % 2, first).start()

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    g = q_ref.shape[2]
    d = q_ref.shape[3]
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale          # [G, D]

    def body(i, _):
        @pl.when(block_live(i))
        def _process():
            slot = i % 2
            nxt = i + 1

            # prefetch the next live block while this one computes
            @pl.when((nxt < n_blocks) & block_live(nxt))
            def _prefetch_next():
                dma_k(nxt % 2, nxt).start()
                dma_v(nxt % 2, nxt).start()

            dma_k(slot, i).wait()
            k = k_buf[slot].astype(jnp.float32)             # [bk, D]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            cols = (jax.lax.broadcasted_iota(jnp.int32, (g, block_k), 1)
                    + i * block_k)
            mask = (cols >= vf) & (cols < vt)
            s = jnp.where(mask, s, MASK_VALUE)

            m_prev, l_prev = m_scr[...], l_scr[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.where(mask, jnp.exp(s - m_next), 0.0)
            l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[...] = m_next

            dma_v(slot, i).wait()
            v = v_buf[slot].astype(jnp.float32)
            acc_scr[...] = (acc_scr[...] * alpha[:, :1]
                            + jax.lax.dot(p, v,
                                          preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)

    l_final = l_scr[...][:, :1]
    l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
    o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     layer_idx: Union[int, jax.Array] = 0,
                     kv_valid_from: Optional[jax.Array] = None,
                     kv_valid_to: Optional[jax.Array] = None,
                     sm_scale: Optional[float] = None,
                     block_k: int = 128,
                     interpret: bool = False) -> jax.Array:
    """q: [B, Nq, 1, D] → [B, Nq, 1, D].

    k/v: either one layer's cache [B, Nkv, S, D] (layer_idx ignored), or the
    full stacked cache [L, B, Nkv, S, D] with ``layer_idx`` selecting the
    layer WITHOUT slicing it out (S must then be a block_k multiple)."""
    b, nq, t, d = q.shape
    assert t == 1, "decode_attention is for single-token queries"
    stacked = k.ndim == 5
    s_len = k.shape[-2]
    nkv = k.shape[-3]
    g = nq // nkv
    if sm_scale is None:
        sm_scale = d ** -0.5

    # The m/l softmax-stat scratches are lane-width (128) rows; an effective
    # block_k below 128 would broadcast [G, block_k] scores against [G, 128]
    # stats at trace time. Clamp to [128, ceil128(s_len)] — short caches pad
    # up to one 128-wide block and the valid-range mask covers the tail.
    block_k = max(128, min(block_k, -(-s_len // 128) * 128))
    s_pad = -(-s_len // block_k) * block_k
    if s_pad != s_len:
        assert not stacked, \
            "stacked cache length must be a block_k multiple (pad the cache)"
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s_len), (0, 0)))
    if not stacked:
        k, v = k[None], v[None]
        layer_idx = 0

    qg = q.reshape(b, nkv, g, d)              # [B, n_kv, G, D]

    if kv_valid_from is None:
        kv_valid_from = jnp.zeros((b,), jnp.int32)
    if kv_valid_to is None:
        kv_valid_to = jnp.full((b,), s_len, jnp.int32)
    kv_valid_to = jnp.minimum(kv_valid_to, s_len)

    kernel = functools.partial(_kernel, block_k=block_k, s_len=s_pad,
                               sm_scale=float(sm_scale))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, g, d),
                             lambda b_, h, *_refs: (b_, h, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, g, d),
                                   lambda b_, h, *_refs: (b_, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, block_k, d), k.dtype),   # k double buffer
                pltpu.VMEM((2, block_k, d), v.dtype),   # v double buffer
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((g, 128), jnp.float32),      # m
                pltpu.VMEM((g, 128), jnp.float32),      # l
                pltpu.VMEM((g, d), jnp.float32),        # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(kv_valid_from.astype(jnp.int32), kv_valid_to.astype(jnp.int32),
      jnp.asarray(layer_idx, jnp.int32).reshape(1),
      qg, k, v)

    return out.reshape(b, nq, 1, d)
