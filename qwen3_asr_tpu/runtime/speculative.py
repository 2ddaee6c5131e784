"""Token-level speculative decoding — entirely on-device, any batch size.

Upgrade over the reference's RESULT-level speculative heuristic (draft the
whole clip with 0.6B, re-run 1.7B if the text "looks complex",
src/server.py:823-846): here the draft model proposes γ tokens per round
and the verifier scores them in ONE batched forward, accepting the matching
prefix. Greedy acceptance ⇒ output is IDENTICAL to verifier-only greedy
decoding, with up to γ× fewer verifier steps. The whole loop — both models'
decode steps, acceptance logic, EOS tracking — runs inside one
``lax.while_loop`` executable (single dispatch per request).

Batched rows accept DIFFERENT prefix lengths per round, so their text
frontiers diverge: per-row cache write offsets (models/decoder.py
``write_pos[B]``, including the T=γ verify window) and per-row causal
``q_offset`` keep every row's cache and masks consistent. Rows that
finish (EOS / budget) freeze — their writes land at frozen positions
outside their attendable range.

Cache bookkeeping uses the no-bonus invariant: at each round start, both
models' caches hold K/V through text position ``text_len-2`` and ``last``
is the (unprocessed) token at ``text_len-1``. Rejected draft K/V entries
are never rolled back — causal masking hides them and future writes at the
same positions overwrite them.
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
    cache_d: KVCache
    cache_v: KVCache
    last: jax.Array       # [B] current frontier token (unprocessed)
    text_len: jax.Array   # [B] tokens emitted incl. frontier
    tokens: jax.Array     # [B, buf_len]
    done: jax.Array       # [B]
    rounds: jax.Array     # scalar: verifier forward count (telemetry)


def speculative_generate(draft_params, verify_params,
                         draft_cfg: DecoderConfig, verify_cfg: DecoderConfig,
                         embeds_d: jax.Array, embeds_v: jax.Array,
                         valid_from_d: jax.Array, valid_from_v: jax.Array,
                         *, gamma: int, max_new: int, eos_id: int,
                         pad_id: int, cache_dtype=jnp.bfloat16
                         ) -> GenerateResult:
    """embeds_d/v: [B, prompt_len_*, H_*] — each model's own prompt embeds
    (own encoder output spliced in). Returns the verifier-greedy sequence."""
    b = embeds_d.shape[0]
    assert gamma >= 2, "gamma must be >= 2"
    plen_d, plen_v = embeds_d.shape[1], embeds_v.shape[1]
    buf_len = max_new + gamma  # slack so window writes never clamp-shift
    # 128-aligned like greedy_generate (stacked-cache decode kernel needs
    # block-aligned S; masks keep the padding inert on every backend).
    total_d = -(-(plen_d + max_new + gamma + 2) // 128) * 128
    total_v = -(-(plen_v + max_new + gamma + 2) // 128) * 128

    cache_d = init_kv_cache(draft_cfg, b, total_d, dtype=cache_dtype)
    cache_v = init_kv_cache(verify_cfg, b, total_v, dtype=cache_dtype)

    # ---- prefill both models ---------------------------------------------------
    def prefill(params, cfg, embeds, valid_from, cache, plen):
        positions = jnp.broadcast_to(jnp.arange(plen), (b, plen))
        spec = AttnSpec(causal=True, q_offset=0, valid_from=valid_from)
        hidden, cache = decoder_forward(params, cfg, embeds, positions,
                                        cache, jnp.int32(0), spec)
        logits = lm_logits(params, cfg, hidden[:, -1])
        return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    cache_d, _ = prefill(draft_params, draft_cfg, embeds_d, valid_from_d,
                         cache_d, plen_d)
    cache_v, first = prefill(verify_params, verify_cfg, embeds_v,
                             valid_from_v, cache_v, plen_v)

    tokens0 = jnp.full((b, buf_len), pad_id, jnp.int32).at[:, 0].set(first)
    done0 = (first == eos_id) | (first == pad_id)

    def decode_step(params, cfg, cache, valid_from, token, pos):
        """Single-token step at per-row positions pos [B] → (cache, logits)."""
        hidden = embed_tokens(params, cfg, token[:, None])
        positions = pos[:, None]
        spec = AttnSpec(valid_from=valid_from, valid_to=pos + 1)
        hidden, cache = decoder_forward(params, cfg, hidden, positions,
                                        cache, pos, spec)
        return cache, lm_logits(params, cfg, hidden[:, -1])

    rows = jnp.arange(b)
    slot = jnp.arange(gamma)

    def cond(c: _Carry):
        return ~jnp.all(c.done | (c.text_len >= max_new))

    def body(c: _Carry):
        frontier_d = plen_d + c.text_len - 1       # [B] draft-space pos
        frontier_v = plen_v + c.text_len - 1       # [B]

        # ---- 1) draft γ tokens -------------------------------------------------
        def draft_step(i, st):
            cache_d, x, drafts = st
            cache_d, logits = decode_step(draft_params, draft_cfg, cache_d,
                                          valid_from_d, x, frontier_d + i)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            drafts = drafts.at[:, i].set(nxt)
            return cache_d, nxt, drafts

        drafts0 = jnp.zeros((b, gamma), jnp.int32)
        cache_d, _, drafts = jax.lax.fori_loop(
            0, gamma, draft_step, (c.cache_d, c.last, drafts0))

        # ---- 2) verify in one forward ------------------------------------------
        # inputs: [last, d_0..d_{γ-2}] at per-row positions frontier_v+i
        verify_ids = jnp.concatenate([c.last[:, None], drafts[:, :gamma - 1]],
                                     axis=1)                       # [B, γ]
        hidden = embed_tokens(verify_params, verify_cfg, verify_ids)
        positions = frontier_v[:, None] + slot[None, :]
        spec = AttnSpec(causal=True, q_offset=frontier_v,
                        valid_from=valid_from_v)
        hidden, cache_v = decoder_forward(
            verify_params, verify_cfg, hidden, positions, c.cache_v,
            frontier_v, spec)
        preds = jnp.argmax(lm_logits(verify_params, verify_cfg, hidden),
                           axis=-1).astype(jnp.int32)              # [B, γ]

        # ---- 3) accept matching prefix, per row ---------------------------------
        matches = preds == drafts                                   # [B, γ]
        # n_s[r] = length of row r's matching prefix (0..γ)
        n_s = jnp.argmin(jnp.concatenate(
            [matches, jnp.zeros((b, 1), bool)], axis=1).astype(jnp.int32),
            axis=1)                                                 # [B]
        correction = jnp.take_along_axis(
            preds, jnp.minimum(n_s, gamma - 1)[:, None], axis=1)    # [B, 1]
        # slot i: draft_i for i<n; verifier correction at i==n (when n<γ)
        accepted = jnp.where(slot[None, :] < n_s[:, None], drafts,
                             jnp.where(slot[None, :] == n_s[:, None],
                                       correction, pad_id))         # [B, γ]
        n_accept = jnp.where(n_s == gamma, gamma, n_s + 1)          # [B]

        # end-of-text truncation inside each row's window (pad_id is an
        # alternate end-of-text — see generate.py)
        hit_eos = (((accepted == eos_id) | (accepted == pad_id))
                   & (slot[None, :] < n_accept[:, None]))
        any_eos = jnp.any(hit_eos, axis=1)                          # [B]
        first_eos = jnp.argmax(hit_eos, axis=1)                     # [B]
        n_eff = jnp.where(any_eos, first_eos + 1, n_accept)
        n_eff = jnp.where(c.done, 0, n_eff)                         # [B]

        # per-row window write at per-row offsets (buf_len has γ slack)
        offs = c.text_len[:, None] + slot[None, :]                  # [B, γ]
        old = c.tokens[rows[:, None], offs]
        window = jnp.where(slot[None, :] < n_eff[:, None], accepted, old)
        tokens = c.tokens.at[rows[:, None], offs].set(window)

        done = c.done | any_eos
        last_new = jnp.take_along_axis(
            accepted, jnp.maximum(n_eff - 1, 0)[:, None], axis=1)[:, 0]
        last = jnp.where(n_eff > 0, last_new, c.last)
        text_len = jnp.minimum(c.text_len + n_eff, max_new)
        return _Carry(cache_d, cache_v, last, text_len, tokens, done,
                      c.rounds + 1)

    init = _Carry(cache_d, cache_v, first, jnp.full((b,), 1, jnp.int32),
                  tokens0, done0, jnp.int32(0))
    final = jax.lax.while_loop(cond, body, init)

    tokens = final.tokens[:, :max_new]
    lengths = jnp.sum((tokens != pad_id).astype(jnp.int32), axis=-1)
    return GenerateResult(tokens, lengths, final.rounds)
