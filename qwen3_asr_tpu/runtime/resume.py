"""Resume decoding: verify the previous partial's tokens in one pass.

A TPU-native optimization for the sliding-window streaming loop. Every
450 ms the reference (and this build's baseline path) re-decodes the WHOLE
window transcript token by token, even though consecutive partials share
almost all of their text. Here the previous partial's token ids act as a
SELF-DRAFT (speculative decoding where the draft is data, not a model):

1. prefill the new window's prompt;
2. run ONE forward over the previous tokens — the model's argmax at each
   position says exactly how many of them survive the new audio;
3. greedy-decode only from the first divergence.

Output is token-identical to full greedy decode (same argument as
runtime/speculative.py); only the number of sequential steps changes —
typically γ≈(tokens so far) accepted and 1-4 new tokens per 450 ms tick.
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
from .generate import GenerateResult


class _Carry(NamedTuple):
    cache: KVCache
    last: jax.Array     # [1]
    done: jax.Array     # [1]
    tokens: jax.Array   # [1, max_new]
    i: jax.Array        # emitted token count


def resume_generate(params, cfg: DecoderConfig, inputs_embeds: jax.Array,
                    valid_from: jax.Array, prev_tokens: jax.Array,
                    prev_len: jax.Array, *, max_new: int, eos_id: int,
                    pad_id: int, cache_dtype=jnp.bfloat16) -> GenerateResult:
    """inputs_embeds: [1, P, H]; prev_tokens: [1, max_new] int32 (pad-filled
    previous generation); prev_len: [1] count of usable previous tokens.

    Returns exactly what greedy_generate would, in fewer sequential steps.
    """
    b, plen, _ = inputs_embeds.shape
    assert b == 1, "resume decoding is per-stream (batch 1)"
    # 128-aligned like greedy_generate: the stacked-cache decode kernel
    # requires block-aligned S, and the valid-range masks keep padding inert.
    total = -(-(plen + max_new) // 128) * 128
    cache = init_kv_cache(cfg, b, total, dtype=cache_dtype)

    # ---- prefill ---------------------------------------------------------------
    positions = jnp.broadcast_to(jnp.arange(plen), (b, plen))
    hidden, cache = decoder_forward(
        params, cfg, inputs_embeds, positions, cache, jnp.int32(0),
        AttnSpec(causal=True, valid_from=valid_from))
    first = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                       axis=-1).astype(jnp.int32)

    _, result = verify_and_continue(
        params, cfg, cache, plen, first, valid_from, prev_tokens, prev_len,
        max_new=max_new, eos_id=eos_id, pad_id=pad_id)
    return result


class _BatchCarry(NamedTuple):
    cache: KVCache
    last: jax.Array      # [B] frontier token (unprocessed)
    done: jax.Array      # [B]
    tokens: jax.Array    # [B, max_new]
    text_len: jax.Array  # [B] emitted tokens incl. frontier


def resume_generate_batch(params, cfg: DecoderConfig,
                          inputs_embeds: jax.Array, valid_from: jax.Array,
                          prev_tokens: jax.Array, prev_len: jax.Array, *,
                          max_new: int, eos_id: int, pad_id: int,
                          cache_dtype=jnp.bfloat16) -> GenerateResult:
    """Cross-session batched resume: B independent streams' ticks in ONE
    executable. Each row carries its own window prompt and its own
    previous-partial self-draft; rows accept different prefix lengths, so
    the continuation runs speculative-style per-row frontiers (per-row
    cache write offsets + valid_to masks — runtime/speculative.py's
    invariants). Per row the output is token-identical to
    resume_generate / greedy_generate of that row alone.

    This is what lets concurrent WS sessions share one device dispatch per
    tick cadence instead of one dispatch per session (serving/server.py
    tick batching, ASR_WS_TICK_BATCH).
    """
    b, plen, _ = inputs_embeds.shape
    total = -(-(plen + max_new) // 128) * 128
    cache = init_kv_cache(cfg, b, total, dtype=cache_dtype)

    # ---- prefill (batched, identical to greedy_generate) -----------------------
    positions = jnp.broadcast_to(jnp.arange(plen), (b, plen))
    hidden, cache = decoder_forward(
        params, cfg, inputs_embeds, positions, cache, jnp.int32(0),
        AttnSpec(causal=True, valid_from=valid_from))
    first = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                       axis=-1).astype(jnp.int32)                      # [B]

    _, result = verify_and_continue_batch(
        params, cfg, cache, plen, first, valid_from, prev_tokens, prev_len,
        max_new=max_new, eos_id=eos_id, pad_id=pad_id)
    return result


def verify_and_continue_batch(params, cfg: DecoderConfig, cache: KVCache,
                              plen: int, first: jax.Array,
                              valid_from: jax.Array, prev_tokens: jax.Array,
                              prev_len: jax.Array, *, max_new: int,
                              eos_id: int, pad_id: int
                              ) -> tuple[KVCache, GenerateResult]:
    """Batched self-draft verify + per-row-frontier continuation on an
    EXISTING prefilled cache (prompt KV present for positions < plen;
    ``first[r]`` is row r's greedy token after its prompt). The batch
    analogue of :func:`verify_and_continue`, shared by
    resume_generate_batch (fresh per-dispatch cache) and the grouped
    streaming tick (runtime/stream_group.py, persistent pooled cache —
    which is why the updated cache is returned)."""
    b = prev_tokens.shape[0]

    # ---- verify every row's previous tokens in one forward ----------------------
    # All rows' drafts sit at the same positions plen..plen+max_new-1
    # (same bucket ⇒ same prompt budget), so the verify window needs no
    # per-row offsets — only the accept math is per-row.
    hidden = embed_tokens(params, cfg, prev_tokens)
    positions = plen + jnp.broadcast_to(jnp.arange(max_new), (b, max_new))
    hidden, cache = decoder_forward(
        params, cfg, hidden, positions, cache, jnp.int32(plen),
        AttnSpec(causal=True, q_offset=plen, valid_from=valid_from))
    preds = jnp.argmax(lm_logits(params, cfg, hidden),
                       axis=-1).astype(jnp.int32)                      # [B, max_new]

    rows = jnp.arange(b)
    slot = jnp.arange(max_new)[None, :]                                # [1, max_new]
    eq = jnp.where(slot == 0, prev_tokens[:, :1] == first[:, None],
                   prev_tokens == jnp.roll(preds, 1, axis=1))
    eq &= slot < prev_len[:, None]
    eq &= prev_tokens != eos_id
    eq &= prev_tokens != pad_id
    accepted = jnp.cumprod(eq.astype(jnp.int32), axis=1)               # [B, max_new]
    n = jnp.minimum(jnp.sum(accepted, axis=1), max_new - 1)            # [B]

    g_n = jnp.where(n == 0, first,
                    preds[rows, jnp.maximum(n - 1, 0)])                # [B]
    tokens0 = jnp.where((slot < n[:, None]) & (accepted > 0),
                        prev_tokens, pad_id)
    tokens0 = tokens0.at[rows, n].set(g_n)                             # [B, max_new]
    text_len0 = n + 1
    done0 = (g_n == eos_id) | (g_n == pad_id)

    # ---- per-row greedy continuation ---------------------------------------------
    def cond(c: _BatchCarry):
        return ~jnp.all(c.done | (c.text_len >= max_new))

    def body(c: _BatchCarry):
        # Row r's frontier token c.last[r] sits at position plen+text_len-1.
        # Finished/full rows freeze: they re-write identical KV at their
        # frozen position and their (masked-to-pad) logits are discarded.
        pos = plen + c.text_len - 1                                    # [B]
        hidden = embed_tokens(params, cfg, c.last[:, None])
        spec = AttnSpec(valid_from=valid_from, valid_to=pos + 1)
        hidden, cache = decoder_forward(params, cfg, hidden, pos[:, None],
                                        c.cache, pos, spec)
        nxt = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                         axis=-1).astype(jnp.int32)
        live = ~c.done & (c.text_len < max_new)
        nxt = jnp.where(live, nxt, pad_id)
        idx = jnp.minimum(c.text_len, max_new - 1)
        keep = c.tokens[rows, idx]
        tokens = c.tokens.at[rows, idx].set(jnp.where(live, nxt, keep))
        done = c.done | (nxt == eos_id) | (nxt == pad_id)
        last = jnp.where(live, nxt, c.last)
        text_len = jnp.where(live, c.text_len + 1, c.text_len)
        return _BatchCarry(cache, last, done, tokens, text_len)

    final = jax.lax.while_loop(
        cond, body, _BatchCarry(cache, g_n, done0, tokens0, text_len0))

    lengths = jnp.sum((final.tokens != pad_id).astype(jnp.int32), axis=-1)
    return final.cache, GenerateResult(final.tokens, lengths,
                                       final.text_len - text_len0)


def verify_and_continue(params, cfg: DecoderConfig, cache: KVCache,
                        plen: int, first: jax.Array, valid_from: jax.Array,
                        prev_tokens: jax.Array, prev_len: jax.Array, *,
                        max_new: int, eos_id: int,
                        pad_id: int) -> tuple[KVCache, GenerateResult]:
    """Self-draft verify + greedy continuation on an EXISTING prefilled
    cache (prompt KV present for positions < plen; ``first`` is the greedy
    token after the prompt). Shared by resume_generate (fresh per-tick
    cache) and the streaming prefix-cache tick (runtime/stream.py,
    persistent session cache — which is why the updated cache is returned).
    """
    b = prev_tokens.shape[0]
    m = prev_len[0]

    # ---- verify the previous tokens in one forward -------------------------------
    # prev[0..max_new-1] at positions P..P+max_new-1; preds[i] = greedy token
    # following prev_0..prev_i (valid while that prefix is itself greedy).
    hidden = embed_tokens(params, cfg, prev_tokens)
    positions = plen + jnp.broadcast_to(jnp.arange(max_new), (b, max_new))
    hidden, cache = decoder_forward(
        params, cfg, hidden, positions, cache, jnp.int32(plen),
        AttnSpec(causal=True, q_offset=plen, valid_from=valid_from))
    preds = jnp.argmax(lm_logits(params, cfg, hidden), axis=-1
                       ).astype(jnp.int32)[0]                       # [max_new]

    prev = prev_tokens[0]
    slot = jnp.arange(max_new)
    # match_i: prev_0..prev_i all equal the greedy chain (cumulative AND),
    # only meaningful within prev_len and before any EOS.
    eq = jnp.where(slot == 0, prev[0] == first[0],
                   prev == jnp.roll(preds, 1))
    eq &= slot < m
    eq &= prev != eos_id           # stop reuse at an emitted EOS
    eq &= prev != pad_id           # pad = alternate end-of-text (generate.py)
    accepted = jnp.cumprod(eq.astype(jnp.int32))
    n = jnp.sum(accepted)          # accepted previous tokens (0..m)
    n = jnp.minimum(n, max_new - 1)  # saturated window: keep last slot free

    # Emitted so far: g_0..g_n  (g_0..g_{n-1} = accepted prev; g_n = next
    # greedy token after them).
    g_n = jnp.where(n == 0, first[0], preds[jnp.maximum(n - 1, 0)])
    tokens0 = jnp.where((slot < n) & (accepted > 0), prev, pad_id)
    tokens0 = tokens0.at[n].set(g_n)[None, :]                       # [1, max_new]
    emitted = n + 1
    done0 = ((g_n == eos_id) | (g_n == pad_id))[None]

    # ---- continue greedy decode from position plen + n ---------------------------
    def cond(c: _Carry):
        return (c.i < max_new) & ~jnp.all(c.done)

    def body(c: _Carry):
        # c.last is generated token index c.i-1, sitting at position
        # plen + c.i - 1; processing it predicts token c.i.
        hidden = embed_tokens(params, cfg, c.last[:, None])
        positions = jnp.full((b, 1), plen + c.i - 1, jnp.int32)
        spec = AttnSpec(valid_from=valid_from,
                        valid_to=jnp.full((b,), plen + c.i, jnp.int32))
        hidden, cache = decoder_forward(params, cfg, hidden, positions,
                                        c.cache,
                                        (plen + c.i - 1).astype(jnp.int32),
                                        spec)
        nxt = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                         axis=-1).astype(jnp.int32)
        nxt = jnp.where(c.done, pad_id, nxt)
        # cond guarantees c.i < max_new and not done (batch 1), so the slot
        # is always writable.
        tokens = jax.lax.dynamic_update_slice(c.tokens, nxt[:, None],
                                              (0, c.i))
        done = c.done | (nxt == eos_id) | (nxt == pad_id)
        return _Carry(cache, nxt, done, tokens, c.i + 1)

    init = _Carry(cache, jnp.broadcast_to(g_n[None], (b,)), done0, tokens0,
                  emitted)
    final = jax.lax.while_loop(cond, body, init)

    lengths = jnp.sum((final.tokens != pad_id).astype(jnp.int32), axis=-1)
    return final.cache, GenerateResult(final.tokens, lengths,
                                       final.i - emitted)
