"""Qwen3 text decoder in functional JAX: GQA + QK-norm + RoPE + SwiGLU.

Design notes (TPU-first, not a torch port):

* **Stacked layers + lax.scan** — all per-layer weights live in arrays with
  a leading ``[L, ...]`` axis and the layer loop is a ``lax.scan``. XLA
  compiles ONE layer body instead of L copies: ~L× faster compiles, and the
  weight pytree doubles as the natural pjit sharding target (shard the
  trailing matmul axes, replicate the layer axis).
* **KV cache as scan output** — the cache is ``(k, v)`` arrays shaped
  ``[L, B, n_kv, S_max, head_dim]``; prefill and single-token decode are the
  same code path with different T. The decode step is designed to live
  inside ``lax.while_loop`` (see runtime/generate.py) so the whole
  autoregressive loop runs on-device — this removes the ~50 ms/token host
  overhead that capped the reference at 25% GPU utilization
  (reference src/server.py:322-326).
* **Numerics** — weights in param dtype (bf16 in production), RMSNorm and
  softmax statistics in float32, MXU matmuls with
  ``preferred_element_type=float32``.

Weight layout matches HF ``Qwen2/Qwen3ForCausalLM`` parameter names after the
converter stacks per-layer tensors (runtime/checkpoint.py).
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import AttnSpec, attend_spec
from ..ops.quant import qdot
from .config import DecoderConfig


def _decode_kernel_choice(t: int, b: int, nq: int, nkv: int, s: int, d: int,
                          spec: AttnSpec):
    """Trace-time choice of Pallas kernel for single-token decode attention.

    Returns None (XLA path), or ("legacy"|"bstream", interpret: bool).

    * "bstream" — ops/decode_attention_batch.py, the batch-major
      cache-streaming kernel. EXPLICIT opt-in only: measured v5e
      B96/S512 fp8 it runs 41-43 ms/step vs XLA's 5.9 ms — the packed
      cross-product formulation's >=64x redundant FLOPs plus packed-layout
      mask evaluation dominate, even though its slab DMAs alone stream at
      685 GB/s (see the kernel docstring for why this is structural for
      G=2 GQA). Kept as the measured end-point of the batch-major design
      space and the seam for sub-byte KV formats. Requires head_dim 128
      and a block-aligned cache.
    * "legacy" — ops/decode_attention.py, one (row, kv-head) per grid
      instance. EXPLICIT opt-in only: its 32 KB DMAs serialize at serving
      batches (16.1 vs ~4.6 ms/step at B32/S512) — kept for
      few-instance/long-cache shapes.

    Both need the decode-step mask shape (valid_from/to, no causal/window).
    """
    backend = os.getenv("ASR_ATTN_BACKEND", "auto")
    interpret = backend.endswith("_interpret")
    base = backend[:-10] if interpret else backend
    if not interpret and jax.default_backend() != "tpu":
        return None
    if t != 1 or spec.causal or spec.window_block != 0:
        return None
    if spec.valid_from is None or spec.valid_to is None:
        return None
    if base == "decode":
        if d >= 64 and s % 128 == 0 and s >= 256:
            return "legacy", interpret
        return None
    bstream_ok = (d == 128 and s % 128 == 0 and s >= 128
                  and nq == nkv * (nq // nkv))
    if base == "bstream":
        if bstream_ok:
            from ..ops.decode_attention_batch import pick_tile
            if pick_tile(b, nq, nkv, s, 1) is not None:
                return "bstream", interpret
        return None
    # "auto" stays on the XLA fused einsum: both Pallas decode kernels
    # measured SLOWER at every serving shape (see docstring above and
    # docs/ROADMAP.md round-3 kernel study); the byte-count lever that
    # actually wins is the int4 KV cache, which XLA handles directly.
    return None


def _unroll_decode(t: int) -> bool:
    """Unroll the decode-step layer loop: static layer indices turn the
    per-layer cache access into an offset view XLA fuses into the attention
    reads, instead of the dynamic_slice copy the scanned (traced-index)
    form pays. Default: on for TPU decode steps; ASR_DECODER_UNROLL=
    true/false overrides (prefill always scans — compute-bound, and one
    traced body keeps compiles fast)."""
    mode = os.getenv("ASR_DECODER_UNROLL", "auto").lower()
    if mode == "true":
        return t == 1
    if mode == "false":
        return False
    return t == 1 and jax.default_backend() == "tpu"


class KVCache(NamedTuple):
    """[L, B, n_kv, S, D] stacked cache; k_scale/v_scale are present only
    for sub-byte quantized caches (int4): per-(token, head) dequant scales
    [L, B, n_kv, S, 1] in bf16 (~3% of the nibble payload)."""
    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads,
             max_len, cfg.head_dim)
    if dtype == jnp.int4:
        # int4 KV: halves the dominant decode-step HBM read vs fp8
        # (measured v5e B96/S512: XLA attention phase 5.9 -> 3.8 ms/step).
        # XLA stores int4 packed (2 values/byte) on TPU.
        sshape = shape[:-1] + (1,)
        return KVCache(jnp.zeros(shape, jnp.int4),
                       jnp.zeros(shape, jnp.int4),
                       jnp.zeros(sshape, jnp.bfloat16),
                       jnp.zeros(sshape, jnp.bfloat16))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _kv_quantize(x: jax.Array):
    """[..., D] float -> (int4 values, bf16 scale [..., 1]).

    Symmetric per-(token, head) absmax scaling: K is RMS-normalized per
    head (Qwen3 QK-norm) so its dynamic range per token is tight; V is
    not, which is why the scale granularity is per token rather than per
    channel or per layer."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 7.0,
                        1e-8)
    q = jnp.clip(jnp.round(xf / scale), -8, 7)
    return q.astype(jnp.int4), scale.astype(jnp.bfloat16)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float
                 ) -> Tuple[jax.Array, jax.Array]:
    """positions: [B, T] int32 → cos/sin [B, T, head_dim] (f32)."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B,T,half]
    angles = jnp.concatenate([angles, angles], axis=-1)           # [B,T,D]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, N, T, D]; cos/sin: [B, T, D]."""
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = xf * cos[:, None, :, :] + rotated * sin[:, None, :, :]
    return out.astype(x.dtype)


def init_decoder_params(cfg: DecoderConfig, key: jax.Array,
                        dtype=jnp.float32) -> dict:
    """Random-init params with the stacked-layer layout (for tests/warmup)."""
    l, h, i = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    nq, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(key, 12)
    s = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    params = {
        "embed": rnd(keys[0], (cfg.vocab_size, h)),
        "layers": {
            "ln1": jnp.ones((l, h), dtype),
            "ln2": jnp.ones((l, h), dtype),
            "wq": rnd(keys[1], (l, h, nq * d)),
            "wk": rnd(keys[2], (l, h, nkv * d)),
            "wv": rnd(keys[3], (l, h, nkv * d)),
            "wo": rnd(keys[4], (l, nq * d, h)),
            "q_norm": jnp.ones((l, d), dtype),
            "k_norm": jnp.ones((l, d), dtype),
            "w_gate": rnd(keys[5], (l, h, i)),
            "w_up": rnd(keys[6], (l, h, i)),
            "w_down": rnd(keys[7], (l, i, h)),
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rnd(keys[8], (h, cfg.vocab_size))
    return params


def _layer(cfg: DecoderConfig, hidden: jax.Array, lp: dict,
           cos: jax.Array, sin: jax.Array,
           cache: KVCache, layer_idx: jax.Array,
           write_pos: jax.Array, attn_spec: AttnSpec
           ) -> Tuple[jax.Array, KVCache]:
    """One decoder layer. hidden: [B,T,H]; cache: the FULL stacked
    cache [L,B,n_kv,S,D] (+ scale planes when int4); layer_idx: this
    layer's index into it; write_pos: scalar cache offset for this segment.

    The cache is updated with a token-granular dynamic_update_slice directly
    into the stacked array (it is a lax.scan CARRY, so XLA's while-loop
    in-place aliasing elides any copy — the ~1 GB/step full-cache copy the
    previous xs→ys formulation paid; measured 3.3 ms → ~1.1 ms per decode
    step for the attention phase at B16/S512)."""
    b, t, h = hidden.shape
    nq, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    x = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
    q = qdot(x, lp["wq"]).reshape(b, t, nq, d).transpose(0, 2, 1, 3)
    k = qdot(x, lp["wk"]).reshape(b, t, nkv, d).transpose(0, 2, 1, 3)
    v = qdot(x, lp["wv"]).reshape(b, t, nkv, d).transpose(0, 2, 1, 3)

    # Qwen3 QK-norm: RMSNorm over head_dim before RoPE.
    q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Write this segment into the stacked cache at (layer_idx, write_pos) —
    # only the T new tokens touch HBM. A per-row write_pos ([B]) scatters
    # each row's segment at its own offset — continuous batching (pooled
    # requests at different positions, T=1) and batched speculative verify
    # windows (per-row accept counts, T=γ). int4 caches quantize the new
    # tokens here (per-token-head scales into the sibling scale arrays).
    quantized = cache.k.dtype == jnp.int4
    if quantized:
        k_w, ks_w = _kv_quantize(k)      # [B,nkv,T,D] int4, [B,nkv,T,1]
        v_w, vs_w = _kv_quantize(v)
        writes = [(cache.k, k_w), (cache.v, v_w),
                  (cache.k_scale, ks_w), (cache.v_scale, vs_w)]
    else:
        writes = [(cache.k, k.astype(cache.k.dtype)),
                  (cache.v, v.astype(cache.v.dtype))]

    def _write(dst, val):
        if write_pos.ndim == 1:
            rows = jnp.arange(b)
            if t == 1:
                return dst.at[layer_idx, rows, :, write_pos].set(val[:, :, 0])
            offs = write_pos[:, None] + jnp.arange(t)[None, :]   # [B, T]
            return dst.at[layer_idx, rows[:, None], :, offs].set(
                val.transpose(0, 2, 1, 3))
        return jax.lax.dynamic_update_slice(
            dst, val[None], (layer_idx, 0, 0, write_pos, 0))

    written = [_write(dst, val) for dst, val in writes]
    if quantized:
        cache = KVCache(*written)
    else:
        cache = KVCache(written[0], written[1])
    k_all, v_all = cache.k, cache.v

    s = k_all.shape[3]
    choice = (None if quantized else
              _decode_kernel_choice(t, b, nq, nkv, s, d, attn_spec))
    if choice is not None and choice[0] == "bstream":
        # Decode step on TPU at serving batch: stream the layer's cache in
        # batch-major slabs straight from the STACKED array — large DMAs,
        # packed cross-product MXU matmuls, no dynamic_slice
        # materialization (ops/decode_attention_batch.py).
        from ..ops.decode_attention_batch import decode_attention_batched
        attn = decode_attention_batched(
            q, k_all, v_all, layer_idx=layer_idx,
            kv_valid_from=attn_spec.valid_from,
            kv_valid_to=attn_spec.valid_to, sm_scale=d ** -0.5,
            interpret=choice[1])
    elif choice is not None:
        # Legacy per-(row, kv-head) kernel: explicit opt-in shapes only.
        from ..ops.decode_attention import decode_attention
        attn = decode_attention(
            q, k_all, v_all, layer_idx=layer_idx,
            kv_valid_from=attn_spec.valid_from,
            kv_valid_to=attn_spec.valid_to, sm_scale=d ** -0.5,
            interpret=choice[1])
    else:
        k_layer = jax.lax.dynamic_slice(
            k_all, (layer_idx, 0, 0, 0, 0), (1, b, nkv, s, d))[0]
        v_layer = jax.lax.dynamic_slice(
            v_all, (layer_idx, 0, 0, 0, 0), (1, b, nkv, s, d))[0]
        ks_layer = vs_layer = None
        if quantized:
            # The int4->bf16 convert fuses into the einsum's operand read;
            # the scales ride the scores side (attend_spec docstring) so
            # nothing widened is ever materialized in HBM.
            ks_layer = jax.lax.dynamic_slice(
                cache.k_scale, (layer_idx, 0, 0, 0, 0),
                (1, b, nkv, s, 1))[0]
            vs_layer = jax.lax.dynamic_slice(
                cache.v_scale, (layer_idx, 0, 0, 0, 0),
                (1, b, nkv, s, 1))[0]
        attn = attend_spec(q, k_layer.astype(q.dtype),
                           v_layer.astype(q.dtype), attn_spec,
                           scale=d ** -0.5,
                           k_scale=ks_layer, v_scale=vs_layer)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, nq * d)
    hidden = hidden + qdot(attn, lp["wo"])

    x = rms_norm(hidden, lp["ln2"], cfg.rms_norm_eps)
    gated = jax.nn.silu(qdot(x, lp["w_gate"])) * qdot(x, lp["w_up"])
    hidden = hidden + qdot(gated, lp["w_down"])
    return hidden, cache


def decoder_forward(params: dict, cfg: DecoderConfig,
                    inputs_embeds: jax.Array, positions: jax.Array,
                    cache: KVCache, write_pos: jax.Array,
                    attn_spec: AttnSpec) -> Tuple[jax.Array, KVCache]:
    """Run all layers. inputs_embeds: [B,T,H]; positions: [B,T];
    cache: KVCache [L,B,n_kv,S,D]; write_pos: scalar int32 (segment offset
    in cache) or int32 [B] (per-row offsets: continuous-batching decode
    steps at T=1, AND batched speculative verify windows at T=γ — the
    per-row scatter in _layer._write handles both); attn_spec: structured
    mask descriptor (ops.attention.AttnSpec).

    Returns (final_hidden [B,T,H], updated cache). The cache travels through
    the layer scan as CARRY state (not xs/ys) so updates stay in-place.
    """
    write_pos = jnp.asarray(write_pos)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    n_layers = cfg.num_hidden_layers

    if _unroll_decode(inputs_embeds.shape[1]):
        # Decode step: unroll the layer loop with STATIC layer indices.
        # The per-layer cache slice becomes an offset view XLA fuses into
        # the attention reads — no [B,n_kv,S,D] copy per layer (the scan's
        # traced index forces a dynamic_slice materialization: measured
        # 8.4 → ~4.6 ms/step at B32/S512 int8 on v5e). Compile time grows
        # (one body per layer) — decode-step-only, amortized by the
        # persistent compile cache.
        hidden = inputs_embeds
        for i in range(n_layers):
            lp = jax.tree.map(lambda x: x[i], params["layers"])
            hidden, cache = _layer(cfg, hidden, lp, cos, sin,
                                   cache, i, write_pos, attn_spec)
        hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
        return hidden, cache

    def body(carry, xs):
        hidden, cache = carry
        lp, idx = xs
        hidden, cache = _layer(cfg, hidden, lp, cos, sin,
                               cache, idx, write_pos, attn_spec)
        return (hidden, cache), None

    (hidden, cache), _ = jax.lax.scan(
        body, (inputs_embeds, cache),
        (params["layers"], jnp.arange(n_layers, dtype=jnp.int32)))
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return hidden, cache


def embed_tokens(params: dict, cfg: DecoderConfig, ids: jax.Array) -> jax.Array:
    w = params["embed"]
    if isinstance(w, dict):  # quantized {"q": [V,H] (or packed), "s": [V,1]}
        rows = jnp.take(w["q"], ids, axis=0)
        if rows.dtype == jnp.uint8:  # packed int4: nibbles along H
            from ..ops.quant import unpack_int4
            rows = unpack_int4(rows, axis=-1)
        rows = rows.astype(jnp.float32)
        scales = jnp.take(w["s"], ids, axis=0).astype(jnp.float32)
        # The scale dtype records the model's compute dtype (bf16 in prod,
        # f32 on CPU engines) — don't hardcode bf16 here.
        return (rows * scales).astype(w["s"].dtype)
    return jnp.take(w, ids, axis=0)


def lm_logits(params: dict, cfg: DecoderConfig, hidden: jax.Array) -> jax.Array:
    """hidden: [..., H] → logits [..., V] (float32).

    With a quantized embedding the per-row scale commutes out of the
    contraction — (h @ q.T) * s — so the 151k-vocab read stays int8/fp8
    (halves the largest per-decode-step HBM read)."""
    if cfg.tie_word_embeddings:
        w = params["embed"]
        if isinstance(w, dict):
            q = w["q"]
            if q.dtype == jnp.uint8:  # packed int4: unpack H, then contract
                from ..ops.quant import unpack_int4
                q = unpack_int4(q, axis=-1)
            out = jnp.dot(hidden, q.T.astype(hidden.dtype),
                          preferred_element_type=jnp.float32)
            return out * w["s"][:, 0].astype(jnp.float32)
        return jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
    w = params["lm_head"]
    if isinstance(w, dict):
        if w["q"].dtype == jnp.uint8:  # packed int4, group scales on H
            from ..ops.quant import unpack_int4
            wq = unpack_int4(w["q"], axis=-2)
            gn = w["s"].shape[-2]
            k, v = wq.shape[-2], wq.shape[-1]
            hg = hidden.reshape(*hidden.shape[:-1], gn, k // gn)
            wg = wq.reshape(gn, k // gn, v)
            out = jnp.einsum("...gk,gkv->...gv", hg,
                             wg.astype(hidden.dtype),
                             preferred_element_type=jnp.float32)
            return jnp.sum(out * w["s"].astype(jnp.float32), axis=-2)
        out = jnp.dot(hidden, w["q"].astype(hidden.dtype),
                      preferred_element_type=jnp.float32)
        return out * w["s"].reshape(-1).astype(jnp.float32)
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)
