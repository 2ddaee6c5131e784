"""Batch-major cache-streaming decode attention (large-batch serving).

The round-2 decode kernel (ops/decode_attention.py) puts one (batch row,
kv head) pair per grid instance: at serving batch sizes its 32 KB DMAs
serialize and it loses to XLA everywhere (docs/ROADMAP.md round-3 profile).
This kernel inverts the layout decision: the KV-cache read — the dominant
HBM traffic of a decode step at B≥32 (2.8 GB/step of 4.0 GB at B96/S512
fp8) — is streamed in batch-major slabs ``[ROWS, n_kv, BS, D]`` of the
``[L, B, n_kv, S, D]`` cache, one auto-pipelined ~0.5-1 MB copy per grid
step instead of B·n_kv separate 32 KB copies.

The attention math is packed into TWO full-size MXU matmuls per slab via a
cross-product formulation:

    scores_T = Q_slab [ROWS·n_q, D]  ·  K_slab [ROWS·n_kv·BS, D]^T

computes every query row/head against every cached row/head in the slab;
a static iota mask keeps the (row, kv-head)-matched diagonal blocks and the
off-block entries are zeroed, which makes the second matmul exact:

    out = P [ROWS·n_q, ROWS·n_kv·BS] · V_slab [ROWS·n_kv·BS, D]

The ~(ROWS·n_kv)× redundant FLOPs are deliberate: decode GQA attention has
an arithmetic intensity of ~G FLOP/byte, far below the v5e MXU:HBM balance
point (~240 FLOP/byte), so trading redundant MXU work for full-utilization
matmul shapes keeps the MXU overlapped with the KV stream. Softmax and
masking run directly in the packed layout via iota arithmetic — Mosaic
lane<->sublane relayouts are so expensive that a "collapse to the useful
block" formulation measured 59 GB/s. The redundancy floor is structural:
filling the 128-row MXU with G=2 query rows per KV block costs >=64x
redundant FLOPs in ANY packing. Measured verdict (v5e B96/S512 fp8,
tools_perf/attn_phase.py): the bare slab stream reaches 685 GB/s, but
this kernel runs 41-43 ms/step vs XLA's fused einsum at 5.9 ms — the
redundant matmuls plus packed-layout mask evaluation dominate, so the
whole batch-major family LOSES at G=2 and the kernel is explicit opt-in
(ASR_ATTN_BACKEND=bstream). It is kept as the measured end-point of the
design space and as the seam for sub-byte KV formats XLA cannot
dequantize in-flight; the byte-count lever that actually ships is the
int4 KV cache on the XLA path (models/decoder.py).

Per-row ``valid_from``/``valid_to`` masking supports left-padded prompts
and continuous-batching rows at different fill levels. fp8/bf16 caches are
dequantized in VMEM — nothing widened ever touches HBM.

Reference behavior parity: the decode phase of the reference stack's
flash-attn path (reference src/model.py decode loop); same mask semantics
as ops/attention.AttnSpec(valid_from, valid_to).
"""
from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import MASK_VALUE  # shared masked-score sentinel


def _kernel(layer_ref, vf_ref, vt_ref, q_ref, k_ref, v_ref, o_ref,
            m_scr, l_scr, acc_scr, *,
            rows: int, nkv: int, g: int, block_s: int, sm_scale: float):
    """Grid (B//rows, S//block_s); j is the sequential softmax axis.

    q_ref/o_ref: [rows*n_q, D] (n_q = nkv*g);  k_ref/v_ref:
    [1, rows, nkv, block_s, D] slabs of the stacked cache.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    n1 = rows * nkv * g               # query rows in the packed matmul
    m2 = rows * nkv * block_s         # slab length in the packed matmul
    d = q_ref.shape[-1]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Row-group chunking: the full packed scores matrix [n1, m2] in f32
    # would blow the 16 MB scoped-VMEM budget at serving tiles, so each
    # grid step processes the slab in row-group chunks (<= ~2048 packed
    # columns live at a time), each treated as one online-softmax block.
    # Everything stays in the packed [n1, m2_ch] layout — an earlier
    # formulation collapsed scores to [n1, block_s] via a lane-splitting
    # reshape and measured 48 ms/step (59 GB/s): Mosaic lane<->sublane
    # relayouts dwarf everything else. Masks are evaluated with iota
    # arithmetic directly in the packed layout instead.
    n_ch = max(1, m2 // 2048)
    while rows % n_ch:
        n_ch -= 1
    rows_ch = rows // n_ch
    m2_ch = rows_ch * nkv * block_s

    # ---- per-query-row ids and validity bounds (sublane side)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    rq, hq = qrow // (nkv * g), (qrow // g) % nkv
    vf = jnp.zeros((n1, 1), jnp.int32)
    vt = jnp.zeros((n1, 1), jnp.int32)
    for r in range(rows):
        vf = jnp.where(rq == r, vf_ref[i * rows + r], vf)
        vt = jnp.where(rq == r, vt_ref[i * rows + r], vt)

    q = (q_ref[...].astype(jnp.float32) * sm_scale).astype(jnp.bfloat16)
    m_prev = m_scr[...][:, :1]
    l_prev = l_scr[...][:, :1]
    acc = acc_scr[...]

    for c in range(n_ch):
        k_c = k_ref[0, c * rows_ch:(c + 1) * rows_ch].reshape(
            m2_ch, d).astype(jnp.bfloat16)
        s_c = jax.lax.dot_general(
            q, k_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [n1, m2_ch]

        # packed-layout mask: lane index -> (cache row, kv head, position)
        lane = (jax.lax.broadcasted_iota(jnp.int32, (n1, m2_ch), 1)
                + c * m2_ch)
        rc = lane // (nkv * block_s)
        hc = (lane // block_s) % nkv
        s_pos = j * block_s + (lane % block_s)
        ok = ((rc == rq) & (hc == hq)
              & (s_pos >= vf) & (s_pos < vt))
        s_c = jnp.where(ok, s_c, MASK_VALUE)

        m_next = jnp.maximum(m_prev, jnp.max(s_c, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_next)
        # The explicit where guards fully-masked rows: there m_next equals
        # MASK_VALUE and exp(0) would count every dead lane into l.
        p_c = jnp.where(ok, jnp.exp(s_c - m_next), 0.0)
        l_prev = alpha * l_prev + jnp.sum(p_c, axis=-1, keepdims=True)
        v_c = v_ref[0, c * rows_ch:(c + 1) * rows_ch].reshape(
            m2_ch, d).astype(jnp.bfloat16)
        acc = acc * alpha + jax.lax.dot_general(
            p_c.astype(jnp.bfloat16), v_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [n1, D]
        m_prev = m_next

    m_scr[...] = jnp.broadcast_to(m_prev, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_prev, l_scr.shape)
    acc_scr[...] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        l_final = l_scr[...][:, :1]
        l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
        o_ref[...] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def pick_tile(batch: int, n_q: int, nkv: int, s_len: int, kv_bytes: int
              ) -> Optional[tuple]:
    """(rows, block_s) such that the packed matmul M-dim fills the MXU and
    the slab pair + f32 scores fit VMEM; None if the shape doesn't tile."""
    # block_s is pinned to the 128-lane tile: the collapse reshape splits
    # the lane dim and Mosaic requires a lane-aligned minor dim; 128 also
    # keeps the slab DMA chunks at 16 KB+ (vs the round-2 kernel's 32 KB
    # TOTAL per copy).
    block_s = 128
    if s_len % block_s:
        return None
    rows = max(1, 128 // n_q)
    while rows > 1 and batch % rows:
        rows //= 2
    if batch % rows:
        return None
    # Budget (measured on v5e): double-buffered slab pair + ~3 MB of live
    # chunked intermediates must clear the 16 MB scoped-VMEM limit; at
    # 4*slab+3MB <= 8 MB the serving tile (rows=8, fp8) compiles with
    # headroom, the bs=256 variant (16.7 MB actual) does not.
    while rows > 1 and 4 * rows * nkv * block_s * 128 * kv_bytes > 5 * 2 ** 20:
        rows //= 2
    return rows, block_s


def decode_attention_batched(
        q: jax.Array, k: jax.Array, v: jax.Array, *,
        layer_idx: Union[int, jax.Array] = 0,
        kv_valid_from: Optional[jax.Array] = None,
        kv_valid_to: Optional[jax.Array] = None,
        sm_scale: Optional[float] = None,
        rows: Optional[int] = None,
        block_s: Optional[int] = None,
        interpret: bool = False) -> jax.Array:
    """q: [B, n_q, 1, D] → [B, n_q, 1, D].

    k/v: one layer's cache [B, n_kv, S, D] or the full stacked cache
    [L, B, n_kv, S, D] with ``layer_idx`` selecting the layer without a
    dynamic-slice materialization. D must be 128 and S a block multiple.
    """
    b, n_q, t, d = q.shape
    assert t == 1, "decode_attention_batched is for single-token queries"
    assert d == 128, "the packed-matmul layout requires head_dim == 128"
    stacked = k.ndim == 5
    s_len = k.shape[-2]
    nkv = k.shape[-3]
    g = n_q // nkv
    if sm_scale is None:
        sm_scale = d ** -0.5
    if not stacked:
        k, v = k[None], v[None]
        layer_idx = 0

    if rows is None or block_s is None:
        tile = pick_tile(b, n_q, nkv, s_len, jnp.dtype(k.dtype).itemsize)
        assert tile is not None, f"no tile for B={b} S={s_len}"
        rows, block_s = tile
    assert b % rows == 0 and s_len % block_s == 0

    if kv_valid_from is None:
        kv_valid_from = jnp.zeros((b,), jnp.int32)
    if kv_valid_to is None:
        kv_valid_to = jnp.full((b,), s_len, jnp.int32)
    kv_valid_to = jnp.minimum(kv_valid_to, s_len)

    n1 = rows * n_q
    kernel = functools.partial(_kernel, rows=rows, nkv=nkv, g=g,
                               block_s=block_s, sm_scale=float(sm_scale))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b // rows, s_len // block_s),
            in_specs=[
                pl.BlockSpec((n1, d), lambda i, j, *_refs: (i, 0)),
                pl.BlockSpec((1, rows, nkv, block_s, d),
                             lambda i, j, lyr, *_refs: (lyr[0], i, 0, j, 0)),
                pl.BlockSpec((1, rows, nkv, block_s, d),
                             lambda i, j, lyr, *_refs: (lyr[0], i, 0, j, 0)),
            ],
            out_specs=pl.BlockSpec((n1, d), lambda i, j, *_refs: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((n1, 128), jnp.float32),   # m
                pltpu.VMEM((n1, 128), jnp.float32),   # l
                pltpu.VMEM((n1, d), jnp.float32),     # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * n_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      kv_valid_from.astype(jnp.int32), kv_valid_to.astype(jnp.int32),
      q.reshape(b * n_q, d), k, v)

    return out.reshape(b, n_q, 1, d)
