"""On-device autoregressive generation: prefill + lax.while_loop decode.

This is the TPU answer to the reference's decode-loop bottleneck
(~50 ms/token of Python/HF-generate overhead, GPU util ~25%,
reference src/server.py:322-326): the ENTIRE greedy loop — embedding
lookup, L decoder layers, logits, argmax, EOS check — runs inside one XLA
executable with a persistent KV cache. Host round-trips per request: one
dispatch + one result fetch, regardless of token count. Early exit when all
rows hit EOS via the while_loop condition.

``greedy_generate`` is traceable so the engine can FUSE it with the audio
frontend and encoder into a single executable per length bucket (one device
dispatch per request — essential when the host↔device link has high
latency, and optimal on TPU regardless).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.config import DecoderConfig
from ..models.decoder import (
    KVCache,
    decoder_forward,
    embed_tokens,
    init_kv_cache,
    lm_logits,
)
from ..ops.attention import AttnSpec


class GenerateResult(NamedTuple):
    tokens: jax.Array    # [B, max_new] int32, pad_id beyond end-of-text
    lengths: jax.Array   # [B] int32 tokens generated incl. EOS
    # Path-local progress counter — NOT comparable across decode paths:
    # greedy = emitted-token frontier (1 even when the prefill token ended
    # the row), resume = continuation steps past the accepted prefix,
    # speculative = verifier rounds. Consumers use it only within one path
    # (tools_perf/speculative_eval.py rounds, resume probe tests).
    steps: jax.Array


class _Carry(NamedTuple):
    cache: KVCache
    last: jax.Array
    done: jax.Array
    tokens: jax.Array
    i: jax.Array


def greedy_generate(params, cfg: DecoderConfig, inputs_embeds: jax.Array,
                    valid_from: jax.Array, *, max_new: int, eos_id: int,
                    pad_id: int, cache_dtype=jnp.bfloat16) -> GenerateResult:
    """Traceable greedy generation (call inside jit; static by shapes).

    inputs_embeds: [B, prompt_len, H]; valid_from: [B] int32 — LEFT-padded
    prompts: positions < valid_from are masked out as attention keys, so a
    variable-length prefix (language line, context words) fits a fixed
    prompt budget without recompiling. RoPE is relative, so the constant
    per-row offset is harmless.
    """
    b, prompt_len, _ = inputs_embeds.shape
    # Round the cache up to a 128 multiple: the stacked-cache decode kernel
    # (ops/decode_attention.py) requires block-aligned S, and the attention
    # masks (valid_from/valid_to) make the padding inert on every backend.
    total = -(-(prompt_len + max_new) // 128) * 128
    cache = init_kv_cache(cfg, b, total, dtype=cache_dtype)

    # ---- prefill -------------------------------------------------------------
    positions = jnp.broadcast_to(jnp.arange(prompt_len), (b, prompt_len))
    prefill_spec = AttnSpec(causal=True, q_offset=0, valid_from=valid_from)
    hidden, cache = decoder_forward(params, cfg, inputs_embeds, positions,
                                    cache, jnp.int32(0), prefill_spec)
    first = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                       axis=-1).astype(jnp.int32)

    # pad_id emission also terminates (for real Qwen3 checkpoints pad is
    # <|endoftext|>, an alternate end-of-text): pad_id doubles as the
    # "beyond end" sentinel in `tokens`, so letting decode continue past
    # an emitted pad would make `lengths` (counted as != pad_id) undercount
    # and strip live tokens.
    tokens0 = jnp.full((b, max_new), pad_id, jnp.int32).at[:, 0].set(first)
    done0 = (first == eos_id) | (first == pad_id)

    # ---- decode loop -----------------------------------------------------------
    def cond(c: _Carry):
        return (c.i < max_new) & ~jnp.all(c.done)

    def body(c: _Carry):
        # c.last is generated token index c.i-1 → its absolute position is
        # prompt_len + c.i - 1 (prompt occupies [0, prompt_len)).
        pos = prompt_len + c.i - 1
        hidden = embed_tokens(params, cfg, c.last[:, None])
        positions = jnp.full((b, 1), pos, jnp.int32)
        # Single-row decode: attendable keys are [valid_from, pos].
        spec = AttnSpec(valid_from=valid_from,
                        valid_to=jnp.full((b,), pos + 1, jnp.int32))
        hidden, cache = decoder_forward(params, cfg, hidden, positions,
                                        c.cache, pos.astype(jnp.int32), spec)
        nxt = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                         axis=-1).astype(jnp.int32)
        nxt = jnp.where(c.done, pad_id, nxt)
        tokens = jax.lax.dynamic_update_slice(c.tokens, nxt[:, None], (0, c.i))
        done = c.done | (nxt == eos_id) | (nxt == pad_id)
        return _Carry(cache, nxt, done, tokens, c.i + 1)

    final = jax.lax.while_loop(
        cond, body, _Carry(cache, first, done0, tokens0, jnp.int32(1)))

    lengths = jnp.sum((final.tokens != pad_id).astype(jnp.int32), axis=-1)
    return GenerateResult(final.tokens, lengths, final.i)


def build_greedy_fn(cfg: DecoderConfig, prompt_len: int, max_new: int,
                    eos_id: int, pad_id: int, cache_dtype=jnp.bfloat16):
    """Standalone jitted greedy generator for a static (prompt_len, max_new)."""

    @jax.jit
    def generate(params, inputs_embeds, valid_from):
        assert inputs_embeds.shape[1] == prompt_len
        return greedy_generate(params, cfg, inputs_embeds, valid_from,
                               max_new=max_new, eos_id=eos_id, pad_id=pad_id,
                               cache_dtype=cache_dtype)

    return generate


def strip_generation(tokens, length: int, eos_id: int) -> list:
    """Trim one row of generated ids to the text span (drop EOS/pad)."""
    out = []
    for t in tokens[:length]:
        t = int(t)
        if t == eos_id:
            break
        out.append(t)
    return out
