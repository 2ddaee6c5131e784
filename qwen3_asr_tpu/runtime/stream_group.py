"""Grouped prefix-cache streaming: batched ticks over a pooled KV cache.

Composes the two WS performance modes that were previously exclusive:

* prefix caching (runtime/stream.py) makes one session's tick device work
  ∝ new audio — but each session dispatches alone;
* cross-session tick batching (runtime/batcher.TickBatcher) makes N
  sessions share one dispatch per cadence — but every row re-encodes and
  re-prefills its whole window.

Here N connections share ONE pooled decoder cache ([slots, ...] rows) and
their partial ticks execute as one batched segment-prefill + batched
verify/continue (runtime/resume.verify_and_continue_batch), while each
member keeps the solo session's cached encoder blocks — so a cadence
costs one dispatch AND each row's recompute is ∝ its new audio.

Correctness rests on one invariant, inherited from runtime/stream.py and
made batch-wide: **re-prefilling an already-valid cache range writes
byte-identical KV** (position p's KV is a deterministic function of the
prompt embeddings at ≤ p, which every dispatch supplies in full). The
group therefore always dispatches ALL slots at ONE segment start — the
deepest any TICKING member needs — and rows that needed less (or were not
ticking at all, or are empty slots) simply recompute identical state and
have their outputs discarded. Per-row segment starts, write masks, and
slot liveness tracking are all unnecessary; parity is structural.

Members joining/leaving, flush resets, per-row languages (padded per-row
prefixes, like mixed-language tick batches), redo-on-clamp-raise, and the
donated-cache failure rebuild all follow the solo session's semantics —
tests/test_stream_group.py holds every tick of every member
token-identical to a solo StreamSession (itself parity-locked to the
fused resume path).

Enable with ASR_WS_PREFIX_CACHE=true AND ASR_WS_TICK_BATCH=true
(serving/server.py routes WS partials here when both are set);
ASR_WS_GROUP_SLOTS sizes the pooled batch (power of two).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import HOP_LENGTH, N_FFT
from ..models.decoder import decoder_forward, embed_tokens, init_kv_cache, lm_logits
from ..ops.attention import AttnSpec
from .generate import strip_generation
from .resume import verify_and_continue_batch
from .stream import FIR_HALO, BucketPlan


class GroupMember:
    """One WS connection's host-side state inside a StreamGroup. Exposes
    the same surface the serving layer uses on a solo StreamSession
    (update / reset / release / engine)."""

    def __init__(self, group: "StreamGroup", row: int,
                 language: Optional[str], context: str):
        self.group = group
        self.row = row
        self.engine = group.engine
        self.model = group.engine.model
        self.prefix, self.valid_from = group.engine.padded_prefix(
            language, context)                       # [1, 64], [1]
        n = len(group.plan.spans)
        self.blocks: List[Optional[jax.Array]] = [None] * n
        self.block_max = np.full(n, -np.inf)
        self.clamp_max: Optional[float] = None
        self.prev_window = np.zeros(0, np.float32)
        self.prev_tokens: List[int] = []
        self._prefix_filled = False
        self._pending_maxes = None
        self.stats = {"ticks": 0, "tail": 0, "full": 0, "redo": 0}

    def update(self, window: np.ndarray):
        """Solo-call convenience (tests, lone-session ticks): a group tick
        with this member as the only participant."""
        return self.group.tick([(self, window)])[0]

    def reset(self) -> None:
        n = len(self.group.plan.spans)
        self.blocks = [None] * n
        self.block_max = np.full(n, -np.inf)
        self.clamp_max = None
        self.prev_window = np.zeros(0, np.float32)
        self.prev_tokens = []
        self._prefix_filled = False

    def release(self) -> None:
        """Detach from the group (frees the slot; the pooled cache is
        freed when the last member leaves) and drop engine refs so the
        serving layer rebinds after an idle unload."""
        if self.group is not None:
            self.group.detach(self)
        self.group = None
        self.engine = None
        self.model = None


class _Req:
    __slots__ = ("member", "window", "guess", "handles", "change_tok")

    def __init__(self, member, window, guess, handles, change_tok):
        self.member = member
        self.window = window
        self.guess = guess
        self.handles = handles      # [(span_idx, raw_max device handle)]
        self.change_tok = change_tok


class StreamGroup:
    """A pooled-cache cohort of streaming sessions sharing one bucket.
    Not thread-safe; the serving layer runs all ticks on the single
    inference executor (like every engine path)."""

    def __init__(self, engine, cap_s: float, slots: int):
        assert slots >= 1 and (slots & (slots - 1)) == 0, \
            f"ASR_WS_GROUP_SLOTS must be a power of two, got {slots}"
        self.engine = engine
        self.plan = BucketPlan(engine, cap_s)
        self.slots = slots
        self.members: List[Optional[GroupMember]] = [None] * slots
        # int4 arrays can't cross jit boundaries on this jax build (same
        # degrade as the solo session / pool).
        self.cache_dtype = (jnp.float8_e4m3fn
                            if engine.cache_dtype == jnp.int4
                            else engine.cache_dtype)
        self._init_cache = engine._stream_fn(
            ("gcache", slots, self.plan.s_pad, self.cache_dtype))
        self.cache = self._init_cache()
        # Device-resident zero encoder blocks for empty/never-ticked rows
        # (host zeros would re-upload ~MBs every dispatch).
        hidden = engine.model.cfg.decoder.hidden_size
        self._zero_blocks = [
            jnp.zeros((1, nb, hidden), engine.dtype)
            for nb in self.plan.block_tokens
        ]
        # Empty rows: fully-padded prefix (valid_from = budget) decodes
        # garbage that is never read.
        self._pad_prefix = np.full((1, self.plan.prefix_budget),
                                   engine.model.pad_id, np.int32)

    # -- membership ------------------------------------------------------------
    def try_attach(self, language: Optional[str],
                   context: str = "") -> Optional[GroupMember]:
        for row, occupant in enumerate(self.members):
            if occupant is None:
                member = GroupMember(self, row, language, context)
                self.members[row] = member
                return member
        return None

    def attach_or_raise(self, language: Optional[str],
                        context: str = "") -> GroupMember:
        member = self.try_attach(language, context)
        if member is None:
            raise RuntimeError("stream group has no free slot")
        return member

    def detach(self, member: GroupMember) -> None:
        if self.members[member.row] is member:
            self.members[member.row] = None
        self.engine._drop_stream_group_if_empty(self)

    @property
    def live_members(self) -> int:
        return sum(m is not None for m in self.members)

    # -- one batched tick --------------------------------------------------------
    def tick(self, requests: List[Tuple[GroupMember, np.ndarray]]):
        """Run the participating members' ticks as ONE dispatch. Every
        request's output is token-identical to a solo StreamSession (and
        therefore to the fused resume path). Returns [(text, ids)] in
        request order."""
        plan = self.plan
        reqs: List[_Req] = []
        for member, window in requests:
            window = np.asarray(window, np.float32)
            if len(window) > plan.pinned_samples:
                window = window[-plan.pinned_samples:]
            member.stats["ticks"] += 1
            changed = self._diff(member, window)
            known = [mx for mx in member.block_max if np.isfinite(mx)]
            guess = max(max(known) if known else -10.0, -10.0)
            if member.clamp_max is None or guess != member.clamp_max:
                changed = list(range(len(plan.spans)))   # clamp change
            handles = self._encode(member, window, changed, guess)
            first_stale = changed[0] if changed else len(plan.spans)
            change_tok = (plan.prefix_budget
                          + sum(plan.block_tokens[:first_stale]))
            if not member._prefix_filled:
                change_tok = 0
            reqs.append(_Req(member, window, guess, handles, change_tok))

        seg_start = max(s for s in plan.seg_starts
                        if s <= min(r.change_tok for r in reqs))
        for r in reqs:
            r.member.stats["full" if seg_start == 0 else "tail"] += 1
        tokens, lengths = self._dispatch(seg_start, reqs)

        # Clamp proof: every participating member's true window max is now
        # known. Members whose optimistic guess was refuted redo with the
        # proven max — all their blocks re-encode and ONE group redo
        # dispatch recomputes every row (identical values for unrefuted
        # rows, corrected values for refuted ones).
        redo = [r for r in reqs
                if self._true_max(r.member) != r.guess]
        if redo:
            for r in redo:
                r.member.stats["redo"] += 1
                r.guess = self._true_max(r.member)
                r.handles = self._encode(r.member, r.window,
                                         list(range(len(plan.spans))),
                                         r.guess)
            # The first dispatch filled every row's prefix KV (a first-tick
            # member forces seg_start 0; otherwise it was already valid),
            # so the redo always starts at the prefix rung — solo parity.
            tokens, lengths = self._dispatch(plan.prefix_budget, reqs)
            for r in redo:
                self._true_max(r.member)   # refresh from redo handles

        results = []
        for r in reqs:
            member = r.member
            member._prefix_filled = True
            member.clamp_max = self._true_max(member)
            member.prev_window = r.window.copy()
            ids = strip_generation(tokens[member.row],
                                   int(lengths[member.row]),
                                   self.engine.model.eos_id)
            member.prev_tokens = ids
            text = self.engine.model.tokenizer.decode(ids).strip()
            results.append((text, ids))
        return results

    # -- internals -------------------------------------------------------------
    def _diff(self, member: GroupMember, window: np.ndarray) -> List[int]:
        """Changed/missing block indices vs the member's previous tick —
        the solo session's diff (stream.StreamSession.update), per member."""
        plan = self.plan
        n, m = len(window), len(member.prev_window)
        lim = min(m, n)
        neq = np.nonzero(window[:lim] != member.prev_window[:lim])[0]
        common = int(neq[0]) if len(neq) else lim
        first_changed = max(0, min(common, m - FIR_HALO))

        frontier_block = plan.block_of_sample(
            min(max(n - 1, 0) + N_FFT // 2, plan.pinned_samples - 1))
        first_block = plan.block_of_sample(
            max(0, first_changed - N_FFT // 2))
        changed = list(range(first_block, frontier_block + 1))
        if m:
            prev_frontier = plan.block_of_sample(
                min(m - 1 + N_FFT // 2, plan.pinned_samples - 1))
            changed += [b for b in range(frontier_block + 1,
                                         prev_frontier + 1)
                        if member.blocks[b] is not None]
        missing = [b for b in range(len(plan.spans))
                   if member.blocks[b] is None and b not in changed]
        return sorted(set(changed) | set(missing))

    def _encode(self, member: GroupMember, window: np.ndarray,
                changed: List[int], clamp: float):
        """Encode the member's changed blocks (shares the solo session's
        per-block executables); returns [(span_idx, raw_max handle)]."""
        plan = self.plan
        padded = np.zeros(plan.pinned_samples, np.float32)
        padded[:len(window)] = window
        halo = np.pad(padded, N_FFT // 2, mode="reflect")

        handles = []
        for b in changed:
            lo, hi = plan.spans[b]
            seg = halo[lo * HOP_LENGTH:
                       (hi - 1) * HOP_LENGTH + N_FFT]
            enc = self.engine._stream_fn(("encode", hi - lo))
            toks, raw_max = enc(self.engine.model.params, jnp.asarray(seg),
                                jnp.float32(clamp))
            member.blocks[b] = toks
            handles.append((b, raw_max))
        member._pending_maxes = handles
        return handles

    def _true_max(self, member: GroupMember) -> float:
        """Fold any pending encode maxes into the member's table and
        return the proven window max."""
        pending = getattr(member, "_pending_maxes", None)
        if pending:
            fetched = jax.device_get([h for _, h in pending])
            for (b, _), mx in zip(pending, fetched):
                member.block_max[b] = float(mx)
            member._pending_maxes = None
        return max(float(np.max(member.block_max)), -10.0)

    def _dispatch(self, seg_start: int, reqs: List[_Req]):
        """One batched tick over ALL slots at one segment start. Ticking
        rows get fresh results; every other row recomputes identical
        state (or garbage, for empty slots) that nothing reads."""
        plan = self.plan
        ticking = {r.member for r in reqs}
        prefixes, valid_from, prevs, prev_lens, blocks_rows = [], [], [], [], []
        live = []
        for slot, member in enumerate(self.members):
            prev = np.full((1, plan.max_new), self.engine.model.pad_id,
                           np.int32)
            # Dead rows (empty slots, attached-but-never-ticked members)
            # hold meaningless state: the executable forces them done
            # after one token so their garbage can't stretch the shared
            # decode loop to max_new.
            live.append(member is not None
                        and (member in ticking or member._prefix_filled))
            if member is None:
                prefixes.append(self._pad_prefix)
                valid_from.append(plan.prefix_budget)
                prevs.append(prev)
                prev_lens.append(0)
                blocks_rows.append(tuple(self._zero_blocks))
            else:
                prefixes.append(member.prefix)
                valid_from.append(int(member.valid_from[0]))
                usable = member.prev_tokens[:plan.max_new]
                prev[0, :len(usable)] = usable
                prevs.append(prev)
                prev_lens.append(len(usable))
                blocks_rows.append(tuple(
                    blk if blk is not None else zero
                    for blk, zero in zip(member.blocks, self._zero_blocks)))

        tick = self.engine._stream_fn(
            ("gtick", seg_start, plan.prompt_len, plan.max_new, self.slots,
             self.cache_dtype))
        try:
            self.cache, out_tokens, out_lengths = tick(
                self.engine.model.params, self.cache, tuple(blocks_rows),
                jnp.asarray(np.concatenate(prefixes, axis=0)),
                jnp.asarray(np.asarray(valid_from, np.int32)),
                jnp.asarray(np.concatenate(prevs, axis=0)),
                jnp.asarray(np.asarray(prev_lens, np.int32)),
                jnp.asarray(np.asarray(live, np.bool_)))
        except Exception:
            # The tick DONATES the pooled cache; a failed execution may
            # have consumed it. Rebuild the group from scratch — every
            # member's next tick is a full rebuild (stream.py's solo
            # recovery, group-wide).
            for member in self.members:
                if member is not None:
                    member.reset()
            self.cache = self._init_cache()
            raise

        # ONE sync: every row's tokens/lengths + the participating
        # members' raw block maxes.
        tokens, lengths, maxes = jax.device_get(
            (out_tokens, out_lengths,
             [[h for _, h in r.handles] for r in reqs]))
        for r, row_maxes in zip(reqs, maxes):
            for (b, _), mx in zip(r.handles, row_maxes):
                r.member.block_max[b] = float(mx)
            r.member._pending_maxes = None
        return tokens, lengths


# ── engine-level executables (extends stream.build_stream_fn's keyspace) ─────

def build_group_fn(engine, key):
    kind = key[0]
    if kind == "gcache":
        _, slots, s_pad, dtype = key
        cfg = engine.model.cfg.decoder
        return jax.jit(functools.partial(init_kv_cache, cfg, slots, s_pad,
                                         dtype=dtype))
    if kind == "gtick":
        _, seg_start, prompt_len, max_new, slots, _ = key
        return _build_group_tick(engine, seg_start, prompt_len, max_new,
                                 slots)
    raise KeyError(key)


def _build_group_tick(engine, seg_start: int, prompt_len: int, max_new: int,
                      slots: int):
    """Batched analogue of stream._build_tick: segment prefill over every
    slot's row on the pooled cache, then the shared batched
    verify/continue. One executable per (bucket, rung, slots)."""
    cfg = engine.model.cfg.decoder
    suffix = jnp.asarray(engine._suffix_ids, jnp.int32)
    dtype = engine.dtype
    eos_id, pad_id = engine.model.eos_id, engine.model.pad_id

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, cache, blocks_rows, prefix_ids, valid_from, prev_tokens,
            prev_len, live):
        pre = embed_tokens(params["decoder"], cfg, prefix_ids)   # [S, 64, H]
        suf = embed_tokens(params["decoder"], cfg, suffix[None, :])
        suf = jnp.broadcast_to(suf, (slots,) + suf.shape[1:])
        nspans = len(blocks_rows[0])
        span_stacks = [
            jnp.concatenate([blocks_rows[r][i] for r in range(slots)],
                            axis=0).astype(dtype)
            for i in range(nspans)
        ]
        prompt = jnp.concatenate(
            [pre.astype(dtype)] + span_stacks + [suf.astype(dtype)], axis=1)
        seg = prompt[:, seg_start:]
        positions = jnp.broadcast_to(
            jnp.arange(seg_start, prompt_len),
            (slots, prompt_len - seg_start))
        hidden, cache = decoder_forward(
            params["decoder"], cfg, seg, positions, cache,
            jnp.int32(seg_start),
            AttnSpec(causal=True, q_offset=seg_start, valid_from=valid_from))
        first = jnp.argmax(lm_logits(params["decoder"], cfg, hidden[:, -1]),
                           axis=-1).astype(jnp.int32)
        # Dead rows (empty slots / never-ticked members) emit EOS at once:
        # done0 becomes True for them, so their garbage state can't hold
        # the shared continuation loop open to max_new.
        first = jnp.where(live, first, jnp.int32(eos_id))
        cache, result = verify_and_continue_batch(
            params["decoder"], cfg, cache, prompt_len, first, valid_from,
            prev_tokens, prev_len, max_new=max_new, eos_id=eos_id,
            pad_id=pad_id)
        return cache, result.tokens, result.lengths

    return run
