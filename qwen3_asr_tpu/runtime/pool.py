"""Continuous batching: a shared decode pool with per-request slots.

The fused per-request executable (runtime/engine.py) is optimal for a
single request, but concurrent sessions each pay a full decode pass. This
pool gives decode the vLLM/JetStream serving shape, TPU-style:

* a persistent KV cache with SLOTS rows (``[L, SLOTS, n_kv, S, D]``),
* per-bucket PREFILL executables that build one request's cache segment
  and first token (one dispatch), inserted into a free slot,
* one shared DECODE-SEGMENT executable advancing ALL active slots K
  tokens per dispatch, with per-row cache write offsets
  (models/decoder.py ``write_pos[B]``) and per-row attention windows
  (AttnSpec valid_from/valid_to) — requests at different positions and
  different phases share every weight read,
* a SLOT WINDOW that autoscales with demand: the cache is allocated at
  ``max_slots`` rows but each segment only advances the leading
  ``window`` rows (one executable per ladder size: base, 2x, 4x, …).
  A burst beyond the base window grows it instead of queueing; when
  stragglers at high slot indices are all that holds a large window
  open, occupants are compacted down into low rows (a per-row cache
  copy — trivial next to one segment's weight reads) and the window
  shrinks back.

Segment-synchronous rather than step-synchronous: new requests join at
K-token boundaries, so the host drives one dispatch per K tokens instead
of per token — essential over high-latency host links and cheap anywhere.
Greedy output is IDENTICAL to the fused path (same argmax recurrence);
only scheduling changes.

Stale cache content needs no zeroing: a slot's key at position p only
becomes attendable once the occupying request's own write reaches p
(valid_to = pos+1, and the write lands before the attend in the same
step), by which point it has been overwritten.

Enable with ASR_CONTINUOUS_BATCHING=true (ASR_POOL_SLOTS /
ASR_POOL_MAX_SLOTS / ASR_POOL_SEGMENT tune shape). Requests that can't
pool (timestamps, >30 s audio, resume ticks, speculative) keep the fused
path.
"""
from __future__ import annotations

import functools
import os
import threading
import time
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import (KVCache, decoder_forward, embed_tokens,
                              init_kv_cache, lm_logits)
from ..ops.attention import AttnSpec
from ..utils.logging import log


class PoolStoppedError(RuntimeError):
    """The decode pool is stopping/stopped; the caller should fall back to
    the fused path (lifecycle.transcribe_pooled does)."""


class _Request(NamedTuple):
    audio: np.ndarray          # f32/s16 mono 16 kHz, <= largest bucket
    language: Optional[str]
    set_result: callable       # called with (text, token_ids) off-thread
    set_error: callable


class DecodePool:
    def __init__(self, engine, slots: int = None, segment: int = None,
                 max_slots: int = None):
        from .engine import AUDIO_BUCKETS_S, HOP_LENGTH, max_new_tokens_for

        self.engine = engine
        self.model = engine.model
        self.base = slots or int(os.getenv("ASR_POOL_SLOTS", "8"))
        # Slot autoscaling headroom. An EXPLICIT slots= without max_slots=
        # pins the pool at that size (tests / measured configs); the
        # env-driven serving default gets 4x burst headroom.
        if max_slots is not None:
            self.max_slots = max(max_slots, self.base)
        elif slots is not None:
            self.max_slots = self.base
        else:
            self.max_slots = (int(os.getenv("ASR_POOL_MAX_SLOTS", "0"))
                              or self.base * 4)
            self.max_slots = max(self.max_slots, self.base)
        # Window ladder: each segment advances only the leading `window`
        # cache rows; sizes double from base up to the allocation.
        self._sizes = []
        w = self.base
        while w < self.max_slots:
            self._sizes.append(w)
            w *= 2
        self._sizes.append(self.max_slots)
        self.segment = segment or int(os.getenv("ASR_POOL_SEGMENT", "16"))
        self._hop = HOP_LENGTH

        cfg = self.model.cfg
        chunk = cfg.encoder.n_window * 2
        self._suffix = list(engine._suffix_ids)

        # Pool cache must hold the largest bucket's prompt + token budget.
        longest = 0
        for sec in AUDIO_BUCKETS_S:
            frames = ((int(sec * 100) + chunk - 1) // chunk) * chunk
            p = self._prompt_len(frames)
            longest = max(longest, p + max_new_tokens_for(frames / 100.0))
        self.s_pool = -(-longest // 128) * 128

        # The pool cache crosses jit boundaries (prefill -> insert ->
        # decode segments); int4 arrays cannot be passed as jit ARGUMENTS
        # on this jax build ("Recursively calling jit" — the same eager
        # int4 bug family), so an int4 engine degrades the POOL cache to
        # fp8. Cheap here: at slot counts (~8 rows) decode is
        # weight-read-dominated, so the nibble win the fused path keeps
        # is marginal for pooled work. The fused path stays int4.
        self.cache_dtype = (jnp.float8_e4m3fn
                            if engine.cache_dtype == jnp.int4
                            else engine.cache_dtype)
        # jit-wrapped creation: one dispatch beats dozens of eager zeros
        # over a remote host link.
        self._alloc_cache = jax.jit(functools.partial(
            init_kv_cache, cfg.decoder, self.max_slots, self.s_pool,
            dtype=self.cache_dtype))
        self._cache = self._alloc_cache()
        self._prefill_fns = {}
        self._insert_fns = {}
        self._decode_fns = {}
        self._join_fn = None
        self._move_fn = None

        # host-side slot state. _active is OPTIMISTIC for freshly admitted
        # slots (the true first-token/EOS state lives in the device-side
        # join until the slot's first segment is drained).
        self._last = np.zeros(self.max_slots, np.int32)
        self._pos = np.zeros(self.max_slots, np.int32)
        self._valid_from = np.zeros(self.max_slots, np.int32)
        self._active = np.zeros(self.max_slots, bool)
        self._limit = np.zeros(self.max_slots, np.int32)
        self._tokens: List[List[int]] = [[] for _ in range(self.max_slots)]
        self._owner: List[Optional[_Request]] = [None] * self.max_slots
        # device handle of a just-admitted slot's first token, resolved
        # (int()) only at that slot's first drain — admission never blocks
        # the host on device work.
        self._pending_first: List[Optional[jax.Array]] = \
            [None] * self.max_slots
        # admission generation per slot: a drain only applies to the
        # occupant the segment was dispatched with (a slot can retire and
        # be re-admitted while an older segment is still in flight).
        self._gen = np.zeros(self.max_slots, np.int64)

        self._pending: List[_Request] = []
        # Requests popped from _pending but not yet slotted (the first
        # request's prefill COMPILE can hold this window open for seconds)
        # — they must still count as in-flight or the idle unload's
        # depth>0 re-check races past them and stops the pool under a
        # live request.
        self._admitting = 0
        self.window = self.base   # current autoscale window (observability)
        self._cv = threading.Condition()
        self._running = True
        self._thread = threading.Thread(target=self._drive, daemon=True,
                                        name="decode-pool")
        self._thread.start()
        log.info("DecodePool: {}..{} slots (window ladder {}) x S={} cache, "
                 "segment {} tokens", self.base, self.max_slots,
                 self._sizes, self.s_pool, self.segment)

    @property
    def slots(self) -> int:
        """Allocated slot rows (the autoscale ceiling)."""
        return self.max_slots

    # -- shapes ---------------------------------------------------------------
    def _prompt_len(self, bucket_frames: int) -> int:
        from .engine import PREFIX_BUDGET
        n_audio = self.model.audio_token_count(bucket_frames)
        return PREFIX_BUDGET + n_audio + len(self._suffix)

    # -- public API -----------------------------------------------------------
    def submit(self, audio: np.ndarray, language: Optional[str],
               set_result, set_error) -> None:
        """Queue one clip; set_result(text, token_ids) fires off-thread."""
        with self._cv:
            # Checked under the cv: stop() flips the flag before the drive
            # thread's final _fail_all drain (also under the cv), so an
            # append either sees False here or is drained by _fail_all —
            # never orphaned.
            if not self._running:
                set_error(PoolStoppedError("decode pool stopped"))
                return
            self._pending.append(_Request(audio, language, set_result,
                                          set_error))
            self._cv.notify()

    def stop(self):
        self._running = False
        with self._cv:
            self._cv.notify()
        self._thread.join(timeout=10)
        if self._thread.is_alive():
            # A segment or compile can hold the drive thread for minutes
            # (remote-tunnel compiles) — slot state is the THREAD's to
            # mutate, so don't race it here: it fails all outstanding
            # work itself on exit (_fail_all in _drive's finally).
            log.warning("DecodePool stop: drive thread still draining; "
                        "outstanding requests fail when it exits")

    @staticmethod
    def _safe_error(req: "_Request", err: Exception) -> None:
        try:
            req.set_error(err)
        except Exception:  # callbacks must never kill pool teardown
            log.exception("decode-pool error callback raised")

    def _fail_all(self, err: Exception) -> None:
        """Fail everything queued or slotted (drive thread only — it is
        the sole mutator of slot state once running)."""
        with self._cv:
            pending, self._pending = self._pending, []
            self._admitting = 0
        for req in pending:
            self._safe_error(req, err)
        for s in range(self.max_slots):
            req, self._owner[s] = self._owner[s], None
            self._active[s] = False
            self._pending_first[s] = None
            if req is not None:
                self._safe_error(req, err)

    @property
    def depth(self) -> int:
        with self._cv:
            return (len(self._pending) + self._admitting
                    + int(self._active.sum()))

    # -- executables ----------------------------------------------------------
    def _prefill_fn(self, bucket_frames: int):
        fn = self._prefill_fns.get(bucket_frames)
        if fn is not None:
            return fn
        cfg = self.model.cfg
        cache_dtype = self.cache_dtype
        prompt_len = self._prompt_len(bucket_frames)
        s_pad = -(-prompt_len // 128) * 128
        # The parity-critical single source for mel clamp semantics, s16
        # convert, and [prefix|audio|suffix] layout (engine._prompt_builder
        # docstring) — pooled prompts must match the fused path exactly.
        build = self.engine._prompt_builder(bucket_frames)

        @jax.jit
        def run(params, audio, prefix_ids, valid_from):
            inputs = build(params, audio, prefix_ids)
            cache = init_kv_cache(cfg.decoder, 1, s_pad, dtype=cache_dtype)
            positions = jnp.broadcast_to(jnp.arange(prompt_len),
                                         (1, prompt_len))
            spec = AttnSpec(causal=True, q_offset=0, valid_from=valid_from)
            hidden, cache = decoder_forward(params["decoder"], cfg.decoder,
                                            inputs, positions, cache,
                                            jnp.int32(0), spec)
            first = jnp.argmax(lm_logits(params["decoder"], cfg.decoder,
                                         hidden[:, -1]), axis=-1)
            return cache, first.astype(jnp.int32)

        self._prefill_fns[bucket_frames] = (run, prompt_len, s_pad)
        return self._prefill_fns[bucket_frames]

    def _insert_fn(self, s_pad: int):
        fn = self._insert_fns.get(s_pad)
        if fn is not None:
            return fn

        # Donated pool buffers: inserts update the cache in place instead of
        # copying the multi-GB pool per admission. Cache pytrees (incl. the
        # int4 scale planes) are inserted leaf-wise — prefill produces its
        # segment in the same cache format, so dtypes already match.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(pool_cache, seg_cache, slot):
            return jax.tree.map(
                lambda pool, seg: jax.lax.dynamic_update_slice(
                    pool, seg.astype(pool.dtype), (0, slot, 0, 0, 0)),
                pool_cache, seg_cache)

        self._insert_fns[s_pad] = run
        return run

    def _decode_segment_fn(self, window: int):
        """Segment executable advancing cache rows [0:window] only. State
        arrays stay full-size ([max_slots]) across every window so the
        device-side state handles survive window changes; sub-max windows
        slice the leading rows in, loop, and write them back (two ~row-count
        copies — noise next to a segment's weight reads)."""
        fn = self._decode_fns.get(window)
        if fn is not None:
            return fn
        cfg = self.model.cfg.decoder
        eos_id = self.model.eos_id
        pad_id = self.model.pad_id
        k_steps = self.segment
        w = window
        full = self.max_slots

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(params, pool_cache, last, pos, valid_from, active, limit):
            if w == full:
                cache_w = pool_cache
            else:
                cache_w = jax.tree.map(lambda c: c[:, :w], pool_cache)
            carry0 = (cache_w, last[:w], pos[:w], active[:w],
                      jnp.full((w, k_steps), pad_id, jnp.int32))
            vf, lim = valid_from[:w], limit[:w]

            def body(i, carry):
                cache, lst, ps, act, tokens = carry
                hidden = embed_tokens(params["decoder"], cfg, lst[:, None])
                positions = ps[:, None]
                spec = AttnSpec(valid_from=vf, valid_to=ps + 1)
                hidden, cache = decoder_forward(
                    params["decoder"], cfg, hidden, positions,
                    cache, ps, spec)
                nxt = jnp.argmax(
                    lm_logits(params["decoder"], cfg, hidden[:, -1]),
                    axis=-1).astype(jnp.int32)
                nxt = jnp.where(act, nxt, pad_id)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, i))
                ps = jnp.where(act, ps + 1, ps)
                # pad_id is an alternate end-of-text on real Qwen3
                # checkpoints — terminal exactly like the fused path
                # (generate.py body: done | eos | pad).
                act = act & (nxt != eos_id) & (nxt != pad_id) & (ps < lim)
                lst = jnp.where(nxt == pad_id, lst, nxt)
                return cache, lst, ps, act, tokens

            cache_w, lst, ps, act, tokens = jax.lax.fori_loop(
                0, k_steps, body, carry0)
            if w == full:
                return cache_w, lst, ps, act, tokens
            cache = jax.tree.map(
                lambda c, part: jax.lax.dynamic_update_slice(
                    c, part, (0,) * c.ndim), pool_cache, cache_w)
            last = jax.lax.dynamic_update_slice(last, lst, (0,))
            pos = jax.lax.dynamic_update_slice(pos, ps, (0,))
            active = jax.lax.dynamic_update_slice(active, act, (0,))
            return cache, last, pos, active, tokens

        self._decode_fns[window] = run
        return run

    def _join_state_fn(self):
        """Device-side state join for overlapped admission: folds a
        prefill's first token into the (last, pos, active) triple feeding
        the next segment without a host round-trip."""
        if self._join_fn is not None:
            return self._join_fn
        eos_id = self.model.eos_id
        pad_id = self.model.pad_id

        @jax.jit
        def run(last, pos, active, slot, first, prompt_len):
            f = first[0]
            return (last.at[slot].set(f),
                    pos.at[slot].set(prompt_len),
                    active.at[slot].set((f != eos_id) & (f != pad_id)))

        self._join_fn = run
        return run

    def _move_row_fn(self):
        """Copy one slot's cache row onto another (compaction). Stale
        content above the occupant's pos copies along harmlessly (same
        argument as admission: it only becomes attendable once
        overwritten)."""
        if self._move_fn is not None:
            return self._move_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(pool_cache, src, dst):
            def one(c):
                row = jax.lax.dynamic_slice(
                    c, (0, src) + (0,) * (c.ndim - 2),
                    (c.shape[0], 1) + c.shape[2:])
                return jax.lax.dynamic_update_slice(
                    c, row, (0, dst) + (0,) * (c.ndim - 2))
            return jax.tree.map(one, pool_cache)

        self._move_fn = run
        return run

    # -- slot-window policy ----------------------------------------------------
    def _window_for(self, demand: int, *, floor: int = 0) -> int:
        """Smallest ladder size covering both the demand (occupied +
        queued, capped at the allocation) and the highest occupied slot
        index + 1 (rows outside the window never advance)."""
        need = max(min(demand, self.max_slots), floor, 1)
        for w in self._sizes:
            if w >= need:
                return w
        return self._sizes[-1]

    def _occupancy(self):
        occ = [s for s in range(self.max_slots)
               if self._owner[s] is not None]
        return occ, (max(occ) + 1 if occ else 0)

    def _compact(self) -> None:
        """Move occupants down into the lowest free slots so the window
        can shrink. Caller must hold no in-flight segment (the moves
        re-home rows that a dispatched segment would still address by
        their old indices); device state is reseeded from host after."""
        move = self._move_row_fn()
        occ, _ = self._occupancy()
        for s in sorted(occ, reverse=True):
            frees = [l for l in range(s) if self._owner[l] is None]
            if not frees:
                break
            l = frees[0]
            self._cache = move(self._cache, jnp.int32(s), jnp.int32(l))
            for arr in (self._last, self._pos, self._valid_from,
                        self._active, self._limit):
                arr[l] = arr[s]
            self._tokens[l] = self._tokens[s]
            self._owner[l], self._owner[s] = self._owner[s], None
            self._pending_first[l] = self._pending_first[s]
            self._pending_first[s] = None
            self._active[s] = False
            # both rows change identity: stale in-flight drains (there
            # should be none) must not apply to either.
            self._gen[l] += 1
            self._gen[s] += 1

    def _seed_state(self):
        """(last, pos, active) device triple from host state, with every
        unresolved-first slot patched from its device handle — host
        ``_last`` is stale for those rows until their first drain."""
        state = (jnp.asarray(self._last), jnp.asarray(self._pos),
                 jnp.asarray(self._active))
        for s in range(self.max_slots):
            if self._pending_first[s] is not None:
                state = self._join_state_fn()(
                    *state, jnp.int32(s), self._pending_first[s],
                    jnp.int32(self._pos[s]))
        return state

    # -- driver ----------------------------------------------------------------
    def _admit(self, req: _Request, slot: int):
        from .engine import PREFIX_BUDGET, max_new_tokens_for

        audio = req.audio
        bucket_frames, bucket_s = self.engine.bucket_frames(len(audio))
        n_samples = bucket_frames * self._hop
        in_dtype = audio.dtype if audio.dtype == np.int16 else np.float32
        buf = np.zeros((1, n_samples), dtype=in_dtype)
        buf[0, :min(len(audio), n_samples)] = audio[:n_samples]

        # Single-sourced with the fused path (engine.padded_prefix) — the
        # pool must stay token-identical to engine.transcribe.
        prefix, valid_from = self.engine.padded_prefix(req.language)

        run, prompt_len, s_pad = self._prefill_fn(bucket_frames)
        seg_cache, first = run(self.model.params, jnp.asarray(buf),
                               jnp.asarray(prefix),
                               jnp.asarray(valid_from))
        insert = self._insert_fn(s_pad)
        # self._cache may be an IN-FLIGHT segment's output handle: the
        # insert is dispatched on it without a host sync and XLA orders it
        # after the segment by the cache data dependency.
        self._cache = insert(self._cache, seg_cache, jnp.int32(slot))

        self._owner[slot] = req
        self._gen[slot] += 1
        self._tokens[slot] = []
        self._pending_first[slot] = first
        self._pos[slot] = prompt_len
        self._valid_from[slot] = int(valid_from[0])
        self._limit[slot] = prompt_len + max_new_tokens_for(bucket_s) - 1
        # Optimistic: if the first token is already EOS the slot decodes
        # masked (device-side join knows) and retires at its first drain.
        self._active[slot] = True
        return first, prompt_len

    def _retire(self, slot: int) -> None:
        req = self._owner[slot]
        self._owner[slot] = None
        self._active[slot] = False
        if req is None:
            return
        ids = []
        for t in self._tokens[slot]:
            if t in (self.model.eos_id, self.model.pad_id):
                break
            ids.append(t)
        text = self.model.tokenizer.decode(ids).strip()
        try:
            req.set_result(text, ids)
        except Exception:  # pragma: no cover - callback errors stay local
            log.exception("decode-pool result callback failed")

    def _drain(self, handles, in_seg) -> None:
        """Fetch one finished segment's results and retire finished rows.

        ``in_seg``: (slot, admission generation) pairs that were OWNED
        when the segment was dispatched — only their fetched state is
        authoritative. A slot admitted (or re-admitted) while this
        segment was in flight keeps its optimistic host state until its
        own first segment drains."""
        last, pos, active, tokens = handles
        # np.array (copy): device arrays view as read-only numpy.
        tokens, last, pos, active = (np.array(tokens), np.array(last),
                                     np.array(pos), np.array(active))
        for s, gen in in_seg:
            if self._owner[s] is None or self._gen[s] != gen:
                continue
            if self._pending_first[s] is not None:
                # Resolved here, never at admit: by drain time the prefill
                # has long completed, so int() does not block.
                self._tokens[s] = [int(np.array(self._pending_first[s])[0])]
                self._pending_first[s] = None
            self._last[s] = last[s]
            self._pos[s] = pos[s]
            self._active[s] = active[s]
            self._tokens[s].extend(
                int(t) for t in tokens[s] if t != self.model.pad_id)
            if not active[s]:
                self._retire(s)

    def _drive(self) -> None:
        """Pipelined segment loop: segment n+1 is DISPATCHED (on segment
        n's output device arrays — no host sync) before segment n's tokens
        are fetched, so the host↔device round-trip overlaps device compute.
        Retirements happen one segment late (a finished row decodes ≤1
        extra segment into its own slot — masked, wasted, and harmless).

        Admission OVERLAPS decode: prefill + cache insert are dispatched
        on the in-flight segment's output handles (XLA orders them by the
        cache data dependency), the first token stays a device handle
        until the slot's first drain, and the (last, pos, active) triple
        is patched device-side (_join_state_fn) — the host never syncs to
        admit, so the device queue stays full through request churn."""
        inflight = None    # ((last,pos,active,tokens) handles, in_seg slots)
        state = None       # device (last, pos, active) feeding the next seg

        try:
            self._drive_loop(inflight, state)
        finally:
            # Sole owner of slot state fails all outstanding work on the
            # way out — stop() never mutates concurrently. Flip _running
            # BEFORE the drain (matters when the loop died on an internal
            # error with stop() never called): submit() checks the flag
            # under the same cv the drain takes, so no request can be
            # appended after the drain yet see _running True.
            self._running = False
            self._fail_all(PoolStoppedError("decode pool stopped"))

    def _drive_loop(self, inflight, state) -> None:
        while self._running:
            with self._cv:
                while (self._running and not self._pending
                       and not self._active.any() and inflight is None):
                    self._cv.wait(timeout=1.0)
                if not self._running:
                    break
                pending, self._pending = self._pending, []
                self._admitting = len(pending)

            try:
                # Slot-window sizing. Shrink first when ONLY straggler
                # indices (not demand) hold a larger window open: pay one
                # pipeline sync, compact occupants down, reseed state.
                occ, floor = self._occupancy()
                demand = len(occ) + len(pending)
                if self._window_for(demand) < self._window_for(demand,
                                                               floor=floor):
                    if inflight is not None:
                        self._drain(*inflight)
                        inflight, state = None, None
                        occ, floor = self._occupancy()
                        demand = len(occ) + len(pending)
                    if (inflight is None and
                            self._window_for(demand) <
                            self._window_for(demand, floor=floor)):
                        self._compact()
                        state = None
                        occ, floor = self._occupancy()
                window = self._window_for(len(occ) + len(pending),
                                          floor=floor)
                if window != self.window:
                    log.info("DecodePool window {} -> {} (occupied {}, "
                             "queued {})", self.window, window, len(occ),
                             len(pending))
                    self.window = window

                while pending:
                    free = [s for s in range(window)
                            if self._owner[s] is None]
                    if not free and inflight is not None:
                        # Pool looks full, but the in-flight segment may
                        # retire rows: sync once and re-check.
                        self._drain(*inflight)
                        inflight, state = None, None
                        free = [s for s in range(window)
                                if self._owner[s] is None]
                    if not free:
                        with self._cv:  # genuinely full — decode first
                            self._pending[:0] = pending
                            self._admitting = 0  # re-queued: counted there
                        pending = []  # theirs to fail/serve via _pending now
                        break
                    # Pop BEFORE admit: `pending` holds exactly the
                    # requests the failure handler still owes an error to.
                    req = pending.pop(0)
                    try:
                        first, prompt_len = self._admit(req, free[0])
                    except Exception as e:
                        log.exception("decode-pool admit failed: {}", e)
                        self._safe_error(req, e)
                        with self._cv:
                            self._admitting -= 1
                        continue
                    with self._cv:
                        # slotted: _active[slot] carries the depth now
                        self._admitting -= 1
                    if state is None:
                        state = self._seed_state()  # joins this slot too
                    else:
                        state = self._join_state_fn()(
                            *state, jnp.int32(free[0]), first,
                            jnp.int32(prompt_len))

                if not self._active.any() and inflight is None:
                    continue

                if state is None:
                    state = self._seed_state()
                run = self._decode_segment_fn(window)
                cache, last, pos, active, tokens = run(
                    self.model.params, self._cache,
                    state[0], state[1], jnp.asarray(self._valid_from),
                    state[2], jnp.asarray(self._limit))
                self._cache = cache
                in_seg = [(s, self._gen[s]) for s in range(self.max_slots)
                          if self._owner[s] is not None]
                prev, inflight = inflight, ((last, pos, active, tokens),
                                            in_seg)
                state = (last, pos, active)
                if prev is not None:
                    self._drain(*prev)   # overlaps the running segment
                if not self._active.any() and not self._pending:
                    # nothing (known to be) active: finish the tail
                    self._drain(*inflight)
                    inflight, state = None, None
                self.engine.last_used = time.time()
            except Exception as e:  # fail in-flight requests, not the thread
                log.exception("decode-pool segment failed: {}", e)
                inflight, state = None, None
                with self._cv:
                    self._admitting = 0
                for s in range(self.max_slots):
                    self._pending_first[s] = None
                    if self._owner[s] is not None:
                        req = self._owner[s]
                        self._owner[s] = None
                        self._active[s] = False
                        self._safe_error(req, e)
                # `pending` now holds only requests neither admitted nor
                # re-queued into _pending — admitted ones were errored via
                # their slot above; re-queued ones decode fresh next loop.
                for req in pending:
                    self._safe_error(req, e)
                # The segment executables DONATE the cache buffer
                # (donate_argnums): a failed run may have consumed it, and
                # a stale handle would raise "Array has been deleted" on
                # every future admit — reallocate unconditionally.
                self._cache = self._alloc_cache()
