"""WS prefix caching: per-session encoder-block + decoder-KV reuse.

The sliding-window streaming loop (reference src/server.py:1053-1292)
re-transcribes the whole window every 450 ms. Resume decoding
(runtime/resume.py) already collapses the DECODE phase to the divergence
suffix; this module collapses the ENCODE + PREFILL phases to the changed
audio, so steady-state per-tick device work is ∝ new audio, not window
length (docs/ROADMAP.md "WS prefix caching").

Design — everything is keyed to what actually makes reuse sound:

* **Pinned bucket.** Every tick uses the bucket covering the window CAP,
  so the prompt layout [prefix 64 | audio tokens | suffix] and every
  position in it are tick-invariant. (The engine's variable-bucket path
  would move the suffix whenever the bucket changed.)
* **Encoder blocks.** The AuT encoder is block-local: convs + positional
  embedding restart per ``n_window*2``-frame chunk and self-attention is
  block-diagonal over ``n_window_infer`` frames (models/encoder.py). A
  block's tokens depend only on its own mel frames — cached until its
  samples change.
* **Mel clamp max.** The log-mel clamp/normalize (audio/frontend.py
  ``global_max - 8``) couples every frame to the WINDOW max. Each cached
  block stores its raw frame max; the session clamps with the max over
  blocks. A tick is dispatched OPTIMISTICALLY with the best known max and
  redone once (full rebuild) iff the fetched maxes disagree — exactness
  is never traded, only the rare redo costs a second pass.
* **Decoder KV.** The session keeps a persistent cache. KV at position p
  depends causally on everything before it, so a tick re-prefills from
  the first stale position through the suffix, using the largest rung of
  a static segment-start ladder (one executable per rung, 64-token
  steps) that precedes it. The prefix (positions < 64) holds constant
  tokens before any audio, so its KV survives trims and clamp changes —
  after the first tick, even a full rebuild starts at position 64.
  Verify+decode then reuse runtime/resume.py's shared core on the same
  cache; stale KV beyond the prompt is overwritten before it is
  attendable (same write-before-attend argument as runtime/pool.py).
* **Self-diffing.** ``update()`` compares the incoming window against the
  previous one (common prefix, minus a bandpass-halo slack: the server
  FIRs the whole window per tick, so the last ~100 samples' filtered
  values drift until more audio arrives). Any server trim policy is
  therefore CORRECT — but only chunk-quantized trimming (serving/server)
  gives cache hits at the cap; sample-exact trimming degenerates to a
  full rebuild per tick, which is exactly today's cost, never worse.

Output parity: token-identical to the engine's fused resume path pinned
at the same bucket (tests/test_stream.py) — the same ops on the same
values, split at block/segment boundaries XLA fusion cannot see across.

Enable with ASR_WS_PREFIX_CACHE=true (serving/server.py wires it into
the WS tick path).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import HOP_LENGTH, N_FFT
from ..models.decoder import embed_tokens, init_kv_cache, lm_logits
from ..models.decoder import decoder_forward
from ..models.encoder import (
    conv_tokens_per_chunk,
    encoder_forward,
)
from ..ops.attention import AttnSpec
from ..utils.logging import log
from .generate import strip_generation
from .resume import verify_and_continue

TAIL_SEG = 64          # decoder positions re-prefilled on a tail tick
FIR_HALO = 128         # samples near the frontier whose bandpassed values
                       # still drift (201-tap FIR: 100, rounded up)


def _block_spans(pinned_frames: int, chunk_frames: int,
                 n_window_infer: int) -> List[tuple]:
    """[(frame_lo, frame_hi), ...] attention-block partition of the bucket
    (must mirror models/encoder.py's position-based window mask)."""
    block_frames = chunk_frames * max(1, n_window_infer // chunk_frames)
    spans = []
    lo = 0
    while lo < pinned_frames:
        spans.append((lo, min(lo + block_frames, pinned_frames)))
        lo += block_frames
    return spans


class BucketPlan:
    """Pinned-bucket geometry shared by the solo StreamSession and the
    grouped streaming tick (runtime/stream_group.py): block partition,
    prompt layout, and the segment-start ladder are all functions of the
    (engine, window cap) pair alone."""

    def __init__(self, engine, cap_s: float):
        from .engine import PREFIX_BUDGET, max_new_tokens_for

        cfg_enc = engine.model.cfg.encoder
        cap_samples = int(cap_s * 16000)
        self.pinned_frames, self.bucket_s = engine.bucket_frames(cap_samples)
        self.pinned_samples = self.pinned_frames * HOP_LENGTH
        self.chunk_frames = cfg_enc.n_window * 2
        self.spans = _block_spans(self.pinned_frames, self.chunk_frames,
                                  cfg_enc.n_window_infer)
        per_chunk = conv_tokens_per_chunk(self.chunk_frames)
        self.block_tokens = [(hi - lo) // self.chunk_frames * per_chunk
                             for lo, hi in self.spans]
        self.max_new = max_new_tokens_for(self.bucket_s)
        self.prefix_budget = PREFIX_BUDGET
        self.prompt_len = (PREFIX_BUDGET + sum(self.block_tokens)
                           + len(engine._suffix_ids))
        # Segment-start ladder: a tick re-prefills [seg_start, P) for the
        # largest ladder start ≤ the first stale position — one compiled
        # executable per rung, shared across sessions. Position 64 (the
        # prefix/audio boundary) is a rung of its own: prefix KV never
        # goes stale after the first tick (constant tokens before any
        # audio), so even trim and clamp-change ticks skip it.
        starts = {0, PREFIX_BUDGET}
        s = self.prompt_len - TAIL_SEG
        while s > PREFIX_BUDGET:
            starts.add(s)
            s -= TAIL_SEG
        self.seg_starts = sorted(starts)
        # 128-aligned cache length (block-aligned S for the decode kernels).
        self.s_pad = -(-(self.prompt_len + self.max_new) // 128) * 128

    def block_of_sample(self, s: int) -> int:
        f = s // HOP_LENGTH
        for b, (lo, hi) in enumerate(self.spans):
            if f < hi:
                return b
        return len(self.spans) - 1


class StreamSession:
    """One WS connection's reusable device state. Not thread-safe; the
    serving layer runs all ticks on the single inference executor."""

    def __init__(self, engine, cap_s: float, language: Optional[str] = None,
                 context: str = ""):
        self.engine = engine
        self.model = engine.model

        plan = BucketPlan(engine, cap_s)
        self.pinned_frames, self.bucket_s = plan.pinned_frames, plan.bucket_s
        self.pinned_samples = plan.pinned_samples
        self.chunk_frames = plan.chunk_frames
        self.spans = plan.spans
        self.block_tokens = plan.block_tokens
        self.max_new = plan.max_new

        # Single-sourced with the fused batch path (engine.padded_prefix):
        # any divergence in truncation/pad policy breaks token parity.
        self.prefix, self.valid_from = engine.padded_prefix(language, context)
        self.prompt_len = plan.prompt_len
        self._prefix_budget = plan.prefix_budget
        self.seg_starts = plan.seg_starts
        self._prefix_filled = False

        # Persistent per-session cache. int4 can't cross jit boundaries
        # (same jax bug the pool hits) — degrade to fp8, keep everything
        # else in the engine's cache dtype.
        self.cache_dtype = (jnp.float8_e4m3fn
                            if engine.cache_dtype == jnp.int4
                            else engine.cache_dtype)
        self._init_cache = engine._stream_fn(
            ("cache", plan.s_pad, self.cache_dtype))
        self.cache = self._init_cache()

        # host state
        self.blocks: List[Optional[jax.Array]] = [None] * len(self.spans)
        self.block_max = np.full(len(self.spans), -np.inf)
        self.clamp_max: Optional[float] = None
        self.prev_window = np.zeros(0, np.float32)
        self.prev_tokens: List[int] = []
        self.stats = {"ticks": 0, "tail": 0, "full": 0, "redo": 0}

    # -- lifecycle -------------------------------------------------------------
    def release(self) -> None:
        """Drop every engine/device reference so an idle unload can
        reclaim HBM while the WS connection stays open; the serving layer
        sees ``engine is None`` and rebinds a fresh session on the next
        tick (runtime/lifecycle._unload_sync calls this)."""
        self.reset()
        self.cache = None
        self.blocks = []
        self.engine = None
        self.model = None

    def reset(self) -> None:
        """Flush/reset: drop all cached state (the device arrays' contents
        are stale, not harmful — the next tick rebuilds from scratch)."""
        self.blocks = [None] * len(self.spans)
        self.block_max[:] = -np.inf
        self.clamp_max = None
        self.prev_window = np.zeros(0, np.float32)
        self.prev_tokens = []
        self._prefix_filled = False

    # -- one tick --------------------------------------------------------------
    def update(self, window: np.ndarray):
        """window: f32 mono 16 kHz (bandpassed by the caller), ≤ the cap.
        Returns (text, token_ids) — token-identical to the fused resume
        path at the pinned bucket."""
        window = np.asarray(window, np.float32)
        n = len(window)
        if n == 0:
            return "", []
        if n > self.pinned_samples:
            window = window[-self.pinned_samples:]
            n = self.pinned_samples
        self.stats["ticks"] += 1

        # ---- diff against the previous tick ---------------------------------
        m = len(self.prev_window)
        lim = min(m, n)
        neq = np.nonzero(window[:lim] != self.prev_window[:lim])[0]
        common = int(neq[0]) if len(neq) else lim
        first_changed = max(0, min(common, m - FIR_HALO))

        # STFT frames overlap (N_FFT=400 > hop): a changed sample reaches
        # frames up to N_FFT/2 samples in BOTH directions — the previous
        # block's last frame and the NEXT block's first frame can read it.
        # Map both ends of the changed range from frame reach, not samples.
        frontier_block = self._block_of_sample(
            min(max(n - 1, 0) + N_FFT // 2, self.pinned_samples - 1))
        first_block = self._block_of_sample(max(0,
                                                first_changed - N_FFT // 2))
        changed = list(range(first_block, frontier_block + 1))
        # A quantized trim can SHRINK the window across a block boundary
        # (e.g. a 2 s encoder-chunk trim against a 0.45 s append at a cap
        # that isn't block-aligned): blocks between the new and the old
        # frontier still encode trimmed-out audio, while the fused path at
        # the pinned bucket sees zeros there. Re-encode them from the
        # (zero-padded) signal; beyond the OLD frontier the invariant
        # "None or zeros-encoding" already holds by induction.
        if m:
            prev_frontier = self._block_of_sample(
                min(m - 1 + N_FFT // 2, self.pinned_samples - 1))
            changed += [b for b in range(frontier_block + 1,
                                         prev_frontier + 1)
                        if self.blocks[b] is not None]
        missing = [b for b in range(len(self.spans))
                   if self.blocks[b] is None and b not in changed]

        # ---- optimistic clamp max -------------------------------------------
        # True window max = max over every block's raw frame max, including
        # the frames this tick adds. Guess from what's known (a changed
        # block's stored max is stale but still the best prior); the
        # fetched maxes prove or refute the guess after dispatch.
        known = [mx for mx in self.block_max if np.isfinite(mx)]
        guess = max(max(known) if known else -10.0, -10.0)

        # First stale decoder position: everything before it has valid
        # cached KV. Prefix KV (positions < 64) survives trims and clamp
        # changes — only a fresh/reset session lacks it.
        if self.clamp_max is None or guess != self.clamp_max:
            changed = list(range(len(self.spans)))  # clamp change: all stale
        else:
            changed = sorted(set(changed) | set(missing))
        first_stale = changed[0] if changed else len(self.spans)
        change_tok = (self._prefix_budget
                      + sum(self.block_tokens[:first_stale]))
        if not self._prefix_filled:
            change_tok = 0
        seg_start = max(s for s in self.seg_starts if s <= change_tok)

        tokens, ids, maxes = self._run(window, changed, guess, seg_start)
        # _run stored the fetched raw maxes; every block's is now current.
        true_max = max(float(np.max(self.block_max)), -10.0)
        if true_max != guess:
            # Rare: a new frame raised the window max (or the max-holding
            # block trimmed out). Redo with the proven max — this is the
            # ONLY path that recomputes, exactness first.
            self.stats["redo"] += 1
            changed = list(range(len(self.spans)))
            tokens, ids, maxes = self._run(window, changed, true_max,
                                           self._prefix_budget)
        self._prefix_filled = True
        self.clamp_max = true_max

        self.prev_window = window.copy()
        self.prev_tokens = ids
        text = self.model.tokenizer.decode(ids).strip()
        return text, ids

    # -- internals -------------------------------------------------------------
    def _block_of_sample(self, s: int) -> int:
        f = s // HOP_LENGTH
        for b, (lo, hi) in enumerate(self.spans):
            if f < hi:
                return b
        return len(self.spans) - 1

    def _run(self, window: np.ndarray, changed: List[int], clamp: float,
             seg_start: int):
        """Encode the changed blocks, run one decoder tick, fetch results."""
        padded = np.zeros(self.pinned_samples, np.float32)
        padded[:len(window)] = window
        halo = np.pad(padded, N_FFT // 2, mode="reflect")

        max_handles = []
        for b in changed:
            lo, hi = self.spans[b]
            seg = halo[lo * HOP_LENGTH:
                       (hi - 1) * HOP_LENGTH + N_FFT]
            enc = self.engine._stream_fn(("encode", hi - lo))
            toks, raw_max = enc(self.model.params, jnp.asarray(seg),
                                jnp.float32(clamp))
            self.blocks[b] = toks
            max_handles.append((b, raw_max))

        tick = self.engine._stream_fn(
            ("tick", seg_start, self.prompt_len, self.max_new,
             self.cache_dtype))
        self.stats["full" if seg_start == 0 else "tail"] += 1

        prev = np.full((1, self.max_new), self.model.pad_id, np.int32)
        usable = self.prev_tokens[:self.max_new]
        prev[0, :len(usable)] = usable
        try:
            self.cache, out_tokens, out_lengths = tick(
                self.model.params, self.cache, tuple(self.blocks),
                jnp.asarray(self.prefix), jnp.asarray(self.valid_from),
                jnp.asarray(prev), jnp.asarray([len(usable)], jnp.int32))
        except Exception:
            # The tick DONATES self.cache; a failed execution (transient
            # tunnel/device error) may have consumed the buffer, leaving a
            # deleted handle that would poison every later tick. Rebuild
            # session state from scratch (the pool handles this same
            # failure mode by reallocating unconditionally).
            self.reset()
            self.cache = self._init_cache()
            raise

        # ONE sync: tokens + lengths + the changed blocks' raw maxes.
        fetched = jax.device_get(
            (out_tokens, out_lengths, [h for _, h in max_handles]))
        tokens, lengths, maxes = fetched
        for (b, _), mx in zip(max_handles, maxes):
            self.block_max[b] = float(mx)
        ids = strip_generation(tokens[0], int(lengths[0]),
                               self.model.eos_id)
        return tokens, ids, np.asarray(maxes, np.float64)


# ── engine-level executables (shared across sessions) ────────────────────────

def build_stream_fn(engine, key):
    """Factory the engine memoizes per key (see engine._stream_fn)."""
    kind = key[0]
    if kind == "cache":
        _, s_pad, dtype = key
        import functools
        cfg = engine.model.cfg.decoder
        return jax.jit(functools.partial(init_kv_cache, cfg, 1, s_pad,
                                         dtype=dtype))
    if kind == "encode":
        return _build_encode_block(engine, block_frames=key[1])
    if kind == "tick":
        _, seg_start, prompt_len, max_new, _ = key
        return _build_tick(engine, seg_start, prompt_len, max_new)
    raise KeyError(key)


def _build_encode_block(engine, block_frames: int):
    """One attention block: haloed samples → (tokens [1, nb, H], raw mel
    frame max). Mel semantics mirror audio/frontend._log_mel_impl with the
    bucket-valid (everything-valid) path and the clamp max passed in."""
    cfg_enc = engine.model.cfg.encoder
    window = engine.frontend.window
    mel_fb = engine.frontend.mel_fb
    dtype = engine.dtype

    @jax.jit
    def run(params, seg, clamp_max):
        t = block_frames
        frame_idx = (jnp.arange(t)[:, None] * HOP_LENGTH
                     + jnp.arange(N_FFT)[None, :])
        frames = seg[frame_idx] * window[None, :]
        spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
        power = spec.real ** 2 + spec.imag ** 2
        mel = power @ mel_fb
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        raw_max = jnp.max(log_spec)
        log_spec = jnp.maximum(log_spec, clamp_max - 8.0)
        log_spec = (log_spec + 4.0) / 4.0
        mel_block = log_spec.T[None].astype(dtype)        # [1, M, t]
        flens = jnp.full((1,), t, jnp.int32)
        toks, _ = encoder_forward(params["encoder"], cfg_enc, mel_block,
                                  flens)
        return toks, raw_max

    return run


def _build_tick(engine, seg_start: int, prompt_len: int, max_new: int):
    """Segment prefill on the persistent cache + shared verify/continue.
    seg_start=0 is the full-rebuild tick; seg_start=P-tail is the steady
    tail tick (positions < seg_start keep their cached KV)."""
    cfg = engine.model.cfg.decoder
    # numpy: closure constants must not be device arrays (lower() would
    # block fetching them back — see audio/frontend.LogMelFrontend and
    # engine.warm_d2h_path_async rationale)
    suffix = np.asarray(engine._suffix_ids, np.int32)
    dtype = engine.dtype
    eos_id, pad_id = engine.model.eos_id, engine.model.pad_id

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, cache, blocks, prefix_ids, valid_from, prev_tokens,
            prev_len):
        pre = embed_tokens(params["decoder"], cfg, prefix_ids)
        suf = embed_tokens(params["decoder"], cfg, suffix[None, :])
        prompt = jnp.concatenate(
            [pre.astype(dtype)] + [b.astype(dtype) for b in blocks]
            + [suf.astype(dtype)], axis=1)                # [1, P, H]
        seg = prompt[:, seg_start:]
        positions = jnp.broadcast_to(
            jnp.arange(seg_start, prompt_len), (1, prompt_len - seg_start))
        hidden, cache = decoder_forward(
            params["decoder"], cfg, seg, positions, cache,
            jnp.int32(seg_start),
            AttnSpec(causal=True, q_offset=seg_start, valid_from=valid_from))
        first = jnp.argmax(lm_logits(params["decoder"], cfg, hidden[:, -1]),
                           axis=-1).astype(jnp.int32)
        cache, result = verify_and_continue(
            params["decoder"], cfg, cache, prompt_len, first, valid_from,
            prev_tokens, prev_len, max_new=max_new, eos_id=eos_id,
            pad_id=pad_id)
        return cache, result.tokens, result.lengths

    return run
