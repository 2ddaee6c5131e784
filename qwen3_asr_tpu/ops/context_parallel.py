"""Context (sequence) parallelism: attention over a KV axis sharded
across chips.

The fourth parallelism mode after dp/tp/pp (parallel/{mesh,pipeline}.py)
and the long-audio scale-out seam promised in docs/SCALING.md: each
device holds a contiguous slice of the key/value sequence, runs the
in-framework Pallas flash kernel (ops/flash_attention.py) over its local
slice with ``return_residuals=True``, and the per-shard outputs are
merged with the exact online-softmax combine:

    m   = pmax_i m_i                  (global row max)
    w_i = l_i · exp(m_i − m)          (shard weight)
    out = Σ_i w_i·o_i / Σ_i w_i       (psum over the ctx axis)

This is numerically identical to single-device attention (same
max-shifted exponentials the kernel itself uses block-to-block), not an
approximation. The collectives are one ``pmax`` and two ``psum`` of
[B, Nq, T(, D)] — tiny next to the O(T·S) FLOPs they unlock.

Masks decompose per shard by coordinate shift: a shard at key offset
``off`` runs the kernel with ``q_offset − off`` (causal: global
``col ≤ row`` becomes local ``col_l ≤ row + q_offset − off``) and
valid_from/to clipped into its local range. Fully-masked shards
contribute w_i = 0 (the kernel zeroes their l), so they vanish from the
combine. Block-diagonal encoder windows (``window_block``) do not shift
this way and are not supported — encoder windows are chunk-local and
never need CP.

Reference parity: the reference stack is single-GPU and caps audio at
30 s (reference src/server.py chunking); this module is the net-new
capability that lifts that cap across chips.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .flash_attention import flash_attention


def _local_attend(q, k_local, v_local, *, axis: str, s_global: int,
                  causal: bool, q_offset, valid_from, valid_to,
                  sm_scale, interpret: bool):
    """Per-shard flash + cross-shard softmax combine (runs inside
    shard_map; differentiable — pmax/psum have transposes, and the flash
    kernel carries a custom VJP over (out, m, l), see
    flash_attention._flash_diff)."""
    idx = jax.lax.axis_index(axis)
    s_local = k_local.shape[-2]
    off = idx * s_local

    b = q.shape[0]
    vf = (jnp.zeros((b,), jnp.int32) if valid_from is None
          else valid_from.astype(jnp.int32))
    vt = (jnp.full((b,), s_global, jnp.int32) if valid_to is None
          else valid_to.astype(jnp.int32))
    # Shift the global window into this shard's coordinates.
    vf_l = jnp.clip(vf - off, 0, s_local)
    vt_l = jnp.clip(vt - off, 0, s_local)
    q_off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,)) - off

    o, m, l = flash_attention(
        q, k_local, v_local, causal=causal, q_offset=q_off,
        kv_valid_from=vf_l, kv_valid_to=vt_l, sm_scale=sm_scale,
        return_residuals=True, interpret=interpret)

    m_g = jax.lax.pmax(m, axis)
    w = l * jnp.exp(m - m_g)                       # [B, Nq, T]
    num = jax.lax.psum(o.astype(jnp.float32) * w[..., None], axis)
    den = jax.lax.psum(w, axis)[..., None]
    return (num / jnp.where(den == 0.0, 1.0, den)).astype(q.dtype)


def context_parallel_attention(
        q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh, *,
        axis: str = "sp", causal: bool = False, q_offset=0,
        kv_valid_from: Optional[jax.Array] = None,
        kv_valid_to: Optional[jax.Array] = None,
        sm_scale: Optional[float] = None,
        interpret: bool = False) -> jax.Array:
    """Flash attention with K/V sequence-sharded over ``mesh[axis]``.

    q: [B, Nq, T, D] (replicated over the ctx axis); k/v: [B, Nkv, S, D]
    with S divisible by the axis size. Returns [B, Nq, T, D], identical
    to single-device ``flash_attention`` on the full K/V.
    """
    s_global = k.shape[-2]
    n = mesh.shape[axis]
    assert s_global % n == 0, f"S={s_global} not divisible by {axis}={n}"

    fn = functools.partial(
        _local_attend, axis=axis, s_global=s_global, causal=causal,
        q_offset=q_offset, valid_from=kv_valid_from, valid_to=kv_valid_to,
        sm_scale=sm_scale, interpret=interpret)

    # check_vma off: pallas_call's out_shapes carry no varying-mesh-axes
    # annotation, which the checker requires inside shard_map.
    shard = jax.shard_map(
        lambda q_, k_, v_: fn(q_, k_, v_),
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P(None, None, axis, None)),
        out_specs=P(), check_vma=False)
    return shard(q, k, v)
