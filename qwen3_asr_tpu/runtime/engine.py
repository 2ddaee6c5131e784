"""TranscriptionEngine: bucketed, jit-cached, batched ASR inference.

The TPU-native engine behind every endpoint. Design (SURVEY.md §7.2-7.3):

* **Length buckets** — audio is zero-padded (silence) to one of
  ``AUDIO_BUCKETS_S`` so every (frontend, encoder, decode) executable is
  compiled once and stays warm; the 450 ms WS re-transcription cadence never
  recompiles. This replaces CUDA-graph warming (reference src/server.py:437-458).
* **Left-padded prompt budget** — language/context lines of any length fit
  a fixed prompt shape (no recompiles when clients switch languages).
* **On-device decode loop** — see runtime/generate.py.
* **Batching** — same-bucket requests can run as one batch (DP-shardable
  over a mesh; see parallel/).
* **Long audio** — clips beyond the largest bucket are split at the
  lowest-energy point inside a search window (silence-boundary chunking,
  the behavior the reference delegates to its SDK per LEARNING_LOG.md:216-218),
  one result per segment with start/end times.
"""
from __future__ import annotations

import dataclasses
import threading
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import HOP_LENGTH, LogMelFrontend, _log_mel_impl
from ..audio.resample import resample
from ..models.asr import AsrModel, normalize_language
from ..models.decoder import (decoder_forward, embed_tokens, init_kv_cache,
                              lm_logits)
from ..models.encoder import encoder_forward
from ..runtime.generate import greedy_generate, strip_generation
from ..utils.logging import log

TARGET_SR = 16000
AUDIO_BUCKETS_S: Tuple[float, ...] = (1, 2, 4, 6, 10, 15, 20, 30)
PREFIX_BUDGET = 64          # left-padded prompt prefix tokens
MAX_SEGMENT_S = 30.0        # beyond this, silence-boundary chunking


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: executables survive restarts, so a
    redeploy never pays the multi-minute 1.7B compile again (the durable
    version of CUDA kernel-cache warming)."""
    import os as _os
    path = path or _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   _os.path.expanduser("~/.cache/qwen3_asr_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # pragma: no cover - older jax
        log.warning("compilation cache unavailable: {}", e)


_d2h_warm_event: Optional[threading.Event] = None
_d2h_warm_lock = threading.Lock()
_d2h_warm_error: Optional[str] = None  # set if the warm fetch failed


def d2h_warm_state() -> str:
    """'pending' | 'warm' | 'failed: <err>' — for /health (lifecycle)."""
    if _d2h_warm_event is None or not _d2h_warm_event.is_set():
        return "pending"
    return f"failed: {_d2h_warm_error}" if _d2h_warm_error else "warm"


def warm_d2h_path_async() -> threading.Event:
    """Absorb the backend's one-time first-fetch cost off the request path.

    Measured on the tunnel-attached chip (2026-08-19, /tmp probes →
    docs/HOST_SERVER.md): the process's FIRST device→host fetch — even a
    4-byte scalar — blocks 52–1416 s observed (one-time transfer-path init in the
    remote-device client; zero CPU, zero sustained traffic while waiting).
    Every later fetch is RTT-bound (~60 ms). Before this was understood,
    the cost surfaced wherever the first fetch happened to land: a
    device-array closure constant fetched at lower() time, or the first
    request's device_get — moving targets that looked like compile-cache
    bugs.

    Fired once per process from engine construction, on a daemon thread,
    so it overlaps model load + bucket warmup instead of serializing in
    front of the first transcription. Returns the event that is set when
    the path is warm (boot tooling joins it to report the cost).
    """
    global _d2h_warm_event
    with _d2h_warm_lock:
        if _d2h_warm_event is not None:
            return _d2h_warm_event
        _d2h_warm_event = threading.Event()
        ev = _d2h_warm_event

    def _fetch():
        global _d2h_warm_error
        t0 = time.time()
        try:
            jax.device_get(jnp.zeros((1,), jnp.int32))
            dt = time.time() - t0
            if dt > 5.0:
                log.info("device→host fetch path warmed in {:.1f}s "
                         "(one-time per process)", dt)
        except Exception as e:  # pragma: no cover - backend-dependent
            # Record the failure: the event still sets (nothing may hang
            # on wait()), but /health reports the path as NOT warm — the
            # one-time init is still pending and will land on the first
            # real fetch (see d2h_warm_state).
            _d2h_warm_error = f"{type(e).__name__}: {e}"
            log.warning("d2h warm fetch failed: {}", _d2h_warm_error)
        finally:
            ev.set()

    threading.Thread(target=_fetch, name="d2h-warm", daemon=True).start()
    return ev


@dataclasses.dataclass
class TranscriptionResult:
    """Mirrors the reference SDK result object (.text/.language/.timestamps
    plus segment times used by subtitle generation)."""
    text: str
    language: str = ""
    start_time: float = 0.0
    end_time: float = 0.0
    timestamps: Optional[List[dict]] = None
    # Generated token ids (pre-detokenize) — feed back as resume_tokens on
    # the next streaming tick for self-draft resume decoding.
    token_ids: Optional[List[int]] = None


def max_new_tokens_for(seconds: float) -> int:
    """Token budget per bucket: generous for dense CJK speech (~8 tok/s)."""
    return int(16 + 8 * seconds)


class TranscriptionEngine:
    def __init__(self, model: AsrModel, dtype=jnp.float32,
                 cache_dtype=None):
        self.model = model
        self.dtype = dtype
        self.cache_dtype = cache_dtype or dtype
        self.frontend = LogMelFrontend(n_mels=model.cfg.encoder.num_mel_bins)
        self._generate_fns = {}   # (prompt_len, max_new) -> fn
        chunk = model.cfg.encoder.n_window * 2
        self._chunk_frames = chunk
        self._suffix_ids = model.tokenizer.encode(model.template.suffix_text())
        self.draft_model: Optional[AsrModel] = None
        self._spec_fns = {}
        self._stream_fns = {}     # WS prefix-cache executables (stream.py)
        self._stream_groups = {}  # bucket key -> [StreamGroup] (stream_group.py)
        self.last_used = time.time()
        # Optional jax.sharding.Mesh: weights pre-sharded by the lifecycle
        # layer; batches are dp-sharded in _run_bucket (SURVEY §2.3).
        self.mesh = None
        # Opt-in AOT executable cache (ASR_AOT_CACHE_DIR): serialized
        # executables boot 4.4x faster than warm-cache recompiles on
        # tunnel-attached chips (runtime/aot_cache.py).
        from .aot_cache import AotCache
        self._aot = AotCache.from_env(self)
        # One-time per process: start absorbing the backend's first-fetch
        # cost now so it overlaps load/warmup (see warm_d2h_path_async).
        self._d2h_warm = warm_d2h_path_async()

    def _aot_wrap(self, fn, label: str):
        """Wrap a fused jit fn in the AOT blob dispatcher when enabled."""
        return self._aot.wrap(fn, label) if self._aot else fn

    @property
    def executable_count(self) -> int:
        """Live fused-executable entries across every per-shape cache.

        Surfaced in /health so the e2e memory gate can see the leak class
        ``device_arrays_mb`` cannot: compiled programs (and their device
        allocations) accumulating across request churn. Steady-state
        serving over a fixed shape set must hold this constant."""
        return (len(self._generate_fns) + len(self._spec_fns)
                + len(self._stream_fns)
                + sum(len(g) for g in self._stream_groups.values()))

    def attach_draft(self, draft_model: AsrModel) -> None:
        """Enable token-level speculative decoding: `draft_model` proposes,
        this engine's model verifies. Output is identical to verifier-greedy
        (see runtime/speculative.py); only latency changes."""
        assert draft_model.cfg.encoder.n_window == \
            self.model.cfg.encoder.n_window, "draft/verify chunking differs"
        # The fused spec fn feeds ONE prefix-id tensor to both models, so
        # their tokenizers must agree on prompt text → ids (true for the
        # Qwen3-ASR family; catch divergence here rather than silently
        # collapsing the acceptance rate).
        probe = self.model.template.prefix_text("English", "probe context")
        if draft_model.tokenizer.encode(probe) != \
                self.model.tokenizer.encode(probe):
            raise ValueError(
                "draft/verify tokenizers produce different prompt ids; "
                "token-level speculative decoding requires shared token ids")
        self.draft_model = draft_model
        self._spec_fns.clear()

    # -- bucketing ---------------------------------------------------------------
    def bucket_frames(self, n_samples: int) -> Tuple[int, float]:
        """Smallest bucket (mel frames, EFFECTIVE seconds) covering
        n_samples. Frames round UP to the encoder chunk multiple, so a
        bucket can physically hold more than its nominal label (at 200-frame
        chunks the 1 s bucket holds 2 s). The returned seconds are the
        rounded coverage (frames/100), NOT the label: the decode token
        budget must match the audio the executable actually holds, or
        near-boundary clips get silently truncated. Buckets whose rounded
        frames coincide dedup naturally through the (frames, max_new)
        executable key."""
        mel_frames = max(1, n_samples // HOP_LENGTH)
        for sec in AUDIO_BUCKETS_S:
            frames = int(sec * 100)
            frames = ((frames + self._chunk_frames - 1)
                      // self._chunk_frames) * self._chunk_frames
            if mel_frames <= frames:
                return frames, frames / 100.0
        frames = int(AUDIO_BUCKETS_S[-1] * 100)
        frames = ((frames + self._chunk_frames - 1)
                  // self._chunk_frames) * self._chunk_frames
        return frames, frames / 100.0

    def _prompt_builder(self, bucket_frames: int, model=None):
        """Traceable audio → [prefix, audio, suffix] inputs_embeds builder
        shared by EVERY fused executable. Parity-critical single source:
        mel clamp semantics, s16 wire-format convert, and the prompt
        layout live here only (CLAUDE.md: WS prefix caching is token-exact
        against this layout — tests/test_stream.py guards it).

        The returned `build` also exposes `.mel_of` and `.assemble` so the
        speculative path can compute the mel once and assemble per-model."""
        model = model or self.model
        cfg = model.cfg
        n_samples = bucket_frames * HOP_LENGTH
        # The frontend must match THIS model's mel config — a speculative
        # draft may use fewer mel bins than the main model (the engine-level
        # self.frontend is the main model's). Reuse the shared instance when
        # the bin counts agree so filterbank constants aren't re-derived.
        frontend = (self.frontend
                    if cfg.encoder.num_mel_bins == self.frontend.n_mels
                    else LogMelFrontend(n_mels=cfg.encoder.num_mel_bins))
        window = frontend.window
        mel_fb = frontend.mel_fb
        n_mels = frontend.n_mels
        # numpy, not device: closure constants must not force a device
        # fetch at lower() time (see audio/frontend.LogMelFrontend and
        # warm_d2h_path_async above)
        suffix = np.asarray(self._suffix_ids, np.int32)
        dtype = self.dtype

        def mel_of(audio):
            """[B, n_samples] f32 OR s16 PCM (converted on device — halves
            the host→device transfer, the wire format is s16 anyway)."""
            if audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)

            def mel_one(a):
                m, _ = _log_mel_impl(a, jnp.int32(n_samples), window, mel_fb,
                                     n_mels)
                return m
            return jax.vmap(mel_one)(audio).astype(dtype)      # [B, M, T]

        def assemble(params, audio_embeds, prefix_ids):
            """prefix_ids: [B, PREFIX_BUDGET] (left-padded with pad_id)."""
            b = audio_embeds.shape[0]
            pre = embed_tokens(params["decoder"], cfg.decoder, prefix_ids)
            suf = embed_tokens(params["decoder"], cfg.decoder,
                               jnp.broadcast_to(suffix[None, :],
                                                (b, suffix.shape[0])))
            return jnp.concatenate(
                [pre.astype(dtype), audio_embeds.astype(dtype),
                 suf.astype(dtype)], axis=1)

        def build(params, audio, prefix_ids):
            mel = mel_of(audio)
            flens = jnp.full((audio.shape[0],), bucket_frames, jnp.int32)
            audio_embeds, _ = encoder_forward(params["encoder"], cfg.encoder,
                                              mel, flens)
            return assemble(params, audio_embeds, prefix_ids)

        build.mel_of = mel_of
        build.assemble = assemble
        return build

    def padded_prefix(self, language: Optional[str], context: str = "",
                      batch: int = 1) -> Tuple[np.ndarray, np.ndarray]:
        """PREFIX_BUDGET-left-padded prompt prefix + valid_from, shared by
        the fused batch path and the WS prefix-cache session
        (runtime/stream.py) — single-sourced so the two stay token-exact."""
        prefix_ids, _, _ = self.model.prompt_ids(0, language, context)
        if len(prefix_ids) > PREFIX_BUDGET:
            prefix_ids = prefix_ids[-PREFIX_BUDGET:]
        pad_count = PREFIX_BUDGET - len(prefix_ids)
        prefix = np.full((batch, PREFIX_BUDGET), self.model.pad_id, np.int32)
        prefix[:, pad_count:] = prefix_ids
        valid_from = np.full((batch,), pad_count, np.int32)
        return prefix, valid_from

    def padded_prefix_rows(self, languages, context: str = ""
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-row prompt prefixes: one language hint per batch row, same
        shapes as :meth:`padded_prefix` (the budget is fixed, so mixed
        languages share the SAME compiled executable — contents differ,
        shapes don't). Lets cross-session tick batches mix languages."""
        rows = [self.padded_prefix(lang, context, 1) for lang in languages]
        return (np.concatenate([p for p, _ in rows], axis=0),
                np.concatenate([v for _, v in rows], axis=0))

    def _fused_fn(self, bucket_frames: int, bucket_s: float):
        """ONE jitted executable per bucket: raw audio samples → generated
        token ids. Fuses log-mel frontend, AuT encoder, prompt embedding,
        prefill, and the while_loop decode — a single device dispatch per
        request (critical when host↔device latency is high; optimal on TPU
        regardless: XLA fuses across the whole graph)."""
        max_new = max_new_tokens_for(bucket_s)
        key = (bucket_frames, max_new)
        fn = self._generate_fns.get(key)
        if fn is not None:
            return fn

        cfg = self.model.cfg
        build = self._prompt_builder(bucket_frames)
        eos_id, pad_id = self.model.eos_id, self.model.pad_id
        cache_dtype = self.cache_dtype

        @jax.jit
        def run(params, audio, prefix_ids, valid_from):
            inputs = build(params, audio, prefix_ids)
            return greedy_generate(params["decoder"], cfg.decoder, inputs,
                                   valid_from, max_new=max_new, eos_id=eos_id,
                                   pad_id=pad_id, cache_dtype=cache_dtype)

        run = self._aot_wrap(run, f"fused-{bucket_frames}-{max_new}")
        self._generate_fns[key] = run
        return run

    def fused_cost_analysis(self, batch: int, bucket_frames: int,
                            bucket_s: float, wire_dtype=np.int16) -> dict:
        """XLA cost analysis (flops, bytes accessed) of the fused bucket
        executable at the given batch shape — the compiler's own count for
        the EXACT program the bench times, not an analytic approximation.
        Abstract args only; with the persistent compile cache warm this is
        a cache hit, not a recompile. Returns {} when the backend doesn't
        expose cost analysis (some remote PJRT clients)."""
        n_samples = bucket_frames * HOP_LENGTH
        fn = self._fused_fn(bucket_frames, bucket_s)
        args = (self.model.params,
                jax.ShapeDtypeStruct((batch, n_samples), wire_dtype),
                jax.ShapeDtypeStruct((batch, PREFIX_BUDGET), np.int32),
                jax.ShapeDtypeStruct((batch,), np.int32))
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            return {k: float(v) for k, v in ca.items()
                    if k in ("flops", "bytes accessed")
                    and isinstance(v, (int, float))}
        except Exception as e:  # pragma: no cover - backend-dependent
            log.warning("cost_analysis unavailable: {}", e)
            return {}

    def decode_step_cost_analysis(self, batch: int, bucket_frames: int,
                                  bucket_s: float) -> dict:
        """XLA cost analysis of ONE decode-loop step at this bucket's
        shapes. Needed because HloCostAnalysis counts a while_loop body
        ONCE regardless of trip count (verified empirically), so the fused
        executable's numbers miss ~(max_new-2) decode steps — the dominant
        cost. The true executable total is
          fused + (steps - 1) * step        (fused already holds one body)
        where steps = max_new - 1 loop trips at the full token budget.
        Returns {"flops", "bytes accessed", "steps"} or {} when the
        backend exposes no cost analysis. Abstract lowering only — safe
        even for int4 caches (no concrete sub-byte array crosses the jit
        boundary; see CLAUDE.md invariant)."""
        from ..ops.attention import AttnSpec
        max_new = max_new_tokens_for(bucket_s)
        cfg = self.model.cfg
        build = self._prompt_builder(bucket_frames)
        n_samples = bucket_frames * HOP_LENGTH
        prompt_len = jax.eval_shape(
            build, self.model.params,
            jax.ShapeDtypeStruct((batch, n_samples), np.int16),
            jax.ShapeDtypeStruct((batch, PREFIX_BUDGET), np.int32)).shape[1]
        total = -(-(prompt_len + max_new) // 128) * 128
        cache_dtype = self.cache_dtype
        # Mid-decode position: attention-read cost grows with pos, so the
        # midpoint step is the per-step average over the budget.
        pos = prompt_len + max_new // 2

        @jax.jit
        def step(params, cache, last, valid_from):
            hidden = embed_tokens(params["decoder"], cfg.decoder,
                                  last[:, None])
            positions = jnp.full((batch, 1), pos, jnp.int32)
            spec = AttnSpec(valid_from=valid_from,
                            valid_to=jnp.full((batch,), pos + 1, jnp.int32))
            hidden, cache = decoder_forward(
                params["decoder"], cfg.decoder, hidden, positions, cache,
                jnp.int32(pos), spec)
            nxt = jnp.argmax(lm_logits(params["decoder"], cfg.decoder,
                                       hidden[:, -1]), axis=-1)
            return nxt.astype(jnp.int32), cache

        cache = jax.eval_shape(
            lambda: init_kv_cache(cfg.decoder, batch, total,
                                  dtype=cache_dtype))
        args = (self.model.params, cache,
                jax.ShapeDtypeStruct((batch,), np.int32),
                jax.ShapeDtypeStruct((batch,), np.int32))
        try:
            ca = step.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            out = {k: float(v) for k, v in ca.items()
                   if k in ("flops", "bytes accessed")
                   and isinstance(v, (int, float))}
            out["steps"] = max_new - 1
            return out
        except Exception as e:  # pragma: no cover - backend-dependent
            log.warning("decode step cost_analysis unavailable: {}", e)
            return {}

    def _fused_spec_fn(self, bucket_frames: int, bucket_s: float):
        """Fused speculative executable (any batch): frontend → BOTH
        encoders → both prompts → on-device draft/verify loop with per-row
        accept frontiers (runtime/speculative.py)."""
        import os as _os
        gamma = int(_os.getenv("ASR_SPEC_GAMMA", "4"))
        if gamma < 2:
            log.warning("ASR_SPEC_GAMMA={} below the minimum; using 2 "
                        "(the verify pass needs >=2 positions)", gamma)
            gamma = 2
        max_new = max_new_tokens_for(bucket_s)
        key = (bucket_frames, max_new, gamma)
        fn = self._spec_fns.get(key)
        if fn is not None:
            return fn

        from .speculative import speculative_generate
        from ..models.encoder import encoder_forward as enc_fwd

        verify, draft = self.model, self.draft_model
        cache_dtype = self.cache_dtype
        # attach_draft guarantees the tokenizers agree on prompt ids — both
        # models consume the same prefix AND suffix ids, so the builders
        # differ only in which model's decoder embeds them.
        build_v = self._prompt_builder(bucket_frames, verify)
        build_d = self._prompt_builder(bucket_frames, draft)

        @jax.jit
        def run(verify_params, draft_params, audio, prefix_ids, valid_from):
            # Each model embeds audio through ITS OWN mel frontend — the
            # two configs may disagree on num_mel_bins (e.g. a small draft
            # beside a 128-bin main). When they match, XLA CSEs the
            # duplicate mel computation away, so this costs nothing in the
            # common same-family pairing.
            flens = jnp.full((audio.shape[0],), bucket_frames, jnp.int32)
            emb_v, _ = enc_fwd(verify_params["encoder"], verify.cfg.encoder,
                               build_v.mel_of(audio), flens)
            emb_d, _ = enc_fwd(draft_params["encoder"], draft.cfg.encoder,
                               build_d.mel_of(audio), flens)
            inputs_v = build_v.assemble(verify_params, emb_v, prefix_ids)
            inputs_d = build_d.assemble(draft_params, emb_d, prefix_ids)
            return speculative_generate(
                draft_params["decoder"], verify_params["decoder"],
                draft.cfg.decoder, verify.cfg.decoder, inputs_d, inputs_v,
                valid_from, valid_from, gamma=gamma, max_new=max_new,
                eos_id=verify.eos_id, pad_id=verify.pad_id,
                cache_dtype=cache_dtype)

        self._spec_fns[key] = run
        return run

    def _fused_resume_fn(self, bucket_frames: int, bucket_s: float):
        """Fused resume executable (batch 1): like _fused_fn plus the
        previous tick's tokens verified in one pass (runtime/resume.py) —
        the sliding-window streaming fast path."""
        from .resume import resume_generate
        max_new = max_new_tokens_for(bucket_s)
        key = ("resume", bucket_frames, max_new)
        fn = self._generate_fns.get(key)
        if fn is not None:
            return fn

        cfg = self.model.cfg
        build = self._prompt_builder(bucket_frames)
        eos_id, pad_id = self.model.eos_id, self.model.pad_id
        cache_dtype = self.cache_dtype

        @jax.jit
        def run(params, audio, prefix_ids, valid_from, prev_tokens, prev_len):
            inputs = build(params, audio, prefix_ids)
            return resume_generate(params["decoder"], cfg.decoder, inputs,
                                   valid_from, prev_tokens, prev_len,
                                   max_new=max_new, eos_id=eos_id,
                                   pad_id=pad_id, cache_dtype=cache_dtype)

        run = self._aot_wrap(run, f"resume-{bucket_frames}-{max_new}")
        self._generate_fns[key] = run
        return run

    def _fused_resume_batch_fn(self, bucket_frames: int, bucket_s: float):
        """Cross-session batched resume executable: B sessions' ticks in
        one dispatch (runtime/resume.resume_generate_batch) — rows carry
        independent windows and self-drafts; per-row frontiers diverge
        on-device. One executable per (bucket, max_new, B) like every
        fused path."""
        from .resume import resume_generate_batch
        max_new = max_new_tokens_for(bucket_s)
        key = ("resume_batch", bucket_frames, max_new)
        fn = self._generate_fns.get(key)
        if fn is not None:
            return fn

        cfg = self.model.cfg
        build = self._prompt_builder(bucket_frames)
        eos_id, pad_id = self.model.eos_id, self.model.pad_id
        cache_dtype = self.cache_dtype

        @jax.jit
        def run(params, audio, prefix_ids, valid_from, prev_tokens, prev_len):
            inputs = build(params, audio, prefix_ids)
            return resume_generate_batch(
                params["decoder"], cfg.decoder, inputs, valid_from,
                prev_tokens, prev_len, max_new=max_new, eos_id=eos_id,
                pad_id=pad_id, cache_dtype=cache_dtype)

        run = self._aot_wrap(run, f"resumeb-{bucket_frames}-{max_new}")
        self._generate_fns[key] = run
        return run

    # -- WS prefix caching (runtime/stream.py) -----------------------------------
    def _stream_fn(self, key):
        """Memoized stream executables, shared by every session/group."""
        fn = self._stream_fns.get(key)
        if fn is None:
            if isinstance(key[0], str) and key[0].startswith("g"):
                from .stream_group import build_group_fn
                fn = build_group_fn(self, key)
            else:
                from .stream import build_stream_fn
                fn = build_stream_fn(self, key)
            self._stream_fns[key] = fn
        return fn

    def stream_session(self, cap_s: float, language: Optional[str] = None,
                       context: str = ""):
        """Per-WS-connection prefix-cache session: encoder blocks and
        decoder KV persist across the 450 ms re-transcriptions, so tick
        device work scales with NEW audio instead of window length."""
        from .stream import StreamSession
        return StreamSession(self, cap_s, language, context)

    def stream_group_member(self, cap_s: float,
                            language: Optional[str] = None,
                            context: str = "", slots: Optional[int] = None):
        """Grouped prefix-cache session (runtime/stream_group.py): joins an
        existing group for this bucket with a free slot, else starts a new
        one. Used when ASR_WS_PREFIX_CACHE and ASR_WS_TICK_BATCH are both
        set — members' ticks share one pooled-cache dispatch per cadence."""
        import os as _os
        from .stream_group import StreamGroup
        slots = slots or int(_os.getenv("ASR_WS_GROUP_SLOTS", "8"))
        key = self.bucket_frames(int(cap_s * 16000))
        groups = self._stream_groups.setdefault(key, [])
        for g in groups:
            member = g.try_attach(language, context)
            if member is not None:
                return member
        group = StreamGroup(self, cap_s, slots)
        groups.append(group)
        return group.attach_or_raise(language, context)

    def _drop_stream_group_if_empty(self, group) -> None:
        """Free an emptied group's pooled cache (HBM) by dropping it from
        the registry — the next member for this bucket starts fresh."""
        if group.live_members == 0:
            for groups in self._stream_groups.values():
                if group in groups:
                    groups.remove(group)
                    break

    def _place_batch(self, arr: np.ndarray):
        """Shard a [B, ...] host array over the mesh's dp axis (replicated
        when B doesn't divide dp, e.g. streaming batch-1)."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape["dp"]
        lead = "dp" if arr.shape[0] % dp == 0 else None
        spec = P(lead, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    # -- core batched path --------------------------------------------------------
    def _run_bucket(self, clips: Sequence[np.ndarray], bucket_frames: int,
                    bucket_s: float, language: Optional[str],
                    context: str = "",
                    resume_tokens: Optional[Sequence[int]] = None,
                    resume_rows: Optional[Sequence[
                        Optional[Sequence[int]]]] = None,
                    language_rows: Optional[Sequence] = None,
                    fetch: bool = True
                    ) -> Tuple[List[str], List[List[int]]]:
        """All clips already ≤ bucket. Returns (texts, token_id_lists).

        fetch=False (warmup only): compile + dispatch + return the raw
        on-device result WITHOUT the device_get — a host fetch would join
        the process's one-time D2H init (warm_d2h_path_async) and
        serialize it ahead of the remaining warmup compiles.

        resume_tokens: one stream's previous tokens (batch-1 resume path).
        resume_rows: per-row previous tokens for a CROSS-SESSION tick batch
        (None entries = no draft); len must equal len(clips).
        language_rows: per-row language hints (overrides ``language``) —
        mixed-language batches share the executable (same prompt budget)."""
        n_samples = bucket_frames * HOP_LENGTH
        batch = len(clips)

        # Keep s16 PCM in its wire format: the fused executable converts on
        # device, and the host→device transfer (the serial-path bottleneck
        # over remote links) halves.
        in_dtype = (np.int16 if all(c.dtype == np.int16 for c in clips)
                    else np.float32)
        audio = np.zeros((batch, n_samples), dtype=in_dtype)
        for i, clip in enumerate(clips):
            c = clip[:n_samples]
            if c.dtype == np.int16 and in_dtype == np.float32:
                c = c.astype(np.float32) / 32768.0  # mixed batch: rescale
            audio[i, :len(c)] = c

        if language_rows is not None:
            assert len(language_rows) == batch, "one language per clip"
            prefix, valid_from = self.padded_prefix_rows(language_rows,
                                                         context)
        else:
            prefix, valid_from = self.padded_prefix(language, context, batch)

        audio = self._place_batch(audio)
        prefix = self._place_batch(prefix)
        valid_from = self._place_batch(valid_from)

        max_new = max_new_tokens_for(bucket_s)
        if resume_rows is not None:
            assert len(resume_rows) == batch, "one resume row per clip"
            prev = np.full((batch, max_new), self.model.pad_id, np.int32)
            prev_lens = np.zeros(batch, np.int32)
            for i, row in enumerate(resume_rows):
                usable = list(row or [])[:max_new]
                prev[i, :len(usable)] = usable
                prev_lens[i] = len(usable)
            fn = self._fused_resume_batch_fn(bucket_frames, bucket_s)
            result = fn(self.model.params, jnp.asarray(audio),
                        jnp.asarray(prefix), jnp.asarray(valid_from),
                        self._place_batch(prev),
                        self._place_batch(prev_lens))
        elif resume_tokens is not None and batch == 1:
            prev = np.full((1, max_new), self.model.pad_id, np.int32)
            usable = list(resume_tokens)[:max_new]
            prev[0, :len(usable)] = usable
            fn = self._fused_resume_fn(bucket_frames, bucket_s)
            result = fn(self.model.params, jnp.asarray(audio),
                        jnp.asarray(prefix), jnp.asarray(valid_from),
                        jnp.asarray(prev),
                        jnp.asarray([len(usable)], jnp.int32))
        elif self.draft_model is not None:
            # Any batch: per-row accept frontiers diverge on-device
            # (per-row cache offsets + per-row causal q_offset).
            fn = self._fused_spec_fn(bucket_frames, bucket_s)
            result = fn(self.model.params, self.draft_model.params,
                        jnp.asarray(audio), jnp.asarray(prefix),
                        jnp.asarray(valid_from))
        else:
            fn = self._fused_fn(bucket_frames, bucket_s)
            result = fn(self.model.params, jnp.asarray(audio),
                        jnp.asarray(prefix), jnp.asarray(valid_from))

        if not fetch:
            return result  # warmup: dispatched, deliberately unfetched
        # ONE host transfer for both arrays (each fetch pays a full RTT on
        # remote-attached devices).
        tokens, lengths = jax.device_get((result.tokens, result.lengths))
        texts, id_lists = [], []
        for i in range(batch):
            ids = strip_generation(tokens[i], int(lengths[i]),
                                   self.model.eos_id)
            texts.append(self.model.tokenizer.decode(ids).strip())
            id_lists.append(ids)
        return texts, id_lists

    # -- segmentation ---------------------------------------------------------------
    @staticmethod
    def _split_long_audio(audio: np.ndarray, max_samples: int,
                          search_s: float = 5.0) -> List[Tuple[int, np.ndarray]]:
        """Split at the lowest-energy 25 ms frame within the last
        ``search_s`` seconds of each max-length window."""
        if len(audio) <= max_samples:
            return [(0, audio)]
        segments = []
        start = 0
        search = int(search_s * TARGET_SR)
        frame = 400
        while len(audio) - start > max_samples:
            hi = start + max_samples
            lo = max(start + 1, hi - search)
            window = audio[lo:hi].astype(np.float32)  # int16² would overflow
            n_frames = max(1, len(window) // frame)
            frames = window[:n_frames * frame].reshape(n_frames, frame)
            energies = np.sqrt(np.mean(frames ** 2, axis=1))
            cut = lo + int(np.argmin(energies)) * frame + frame // 2
            segments.append((start, audio[start:cut]))
            start = cut
        segments.append((start, audio[start:]))
        return segments

    # -- public API -------------------------------------------------------------------
    def transcribe(self, audio: np.ndarray, sr: int,
                   language: Optional[str] = None,
                   return_timestamps: bool = False,
                   context: str = "",
                   resume_tokens: Optional[Sequence[int]] = None
                   ) -> List[TranscriptionResult]:
        """SDK-parity surface (reference src/server.py:866-869).

        resume_tokens: previous streaming tick's token ids — enables
        self-draft resume decoding (single-segment audio only)."""
        self.last_used = time.time()
        audio = _prep_audio(audio, sr)
        if len(audio) == 0:
            return []

        lang_code, _ = normalize_language(language)
        max_samples = int(MAX_SEGMENT_S * TARGET_SR)
        segments = self._split_long_audio(audio, max_samples)
        if len(segments) > 1:
            resume_tokens = None

        if len(segments) == 1:
            seg = segments[0][1]
            bucket_frames, bucket_s = self.bucket_frames(len(seg))
            texts, id_lists = self._run_bucket(
                [seg], bucket_frames, bucket_s, language, context,
                resume_tokens=resume_tokens)
        else:
            texts, id_lists = self._run_segments_batched(segments, language,
                                                         context)

        results: List[TranscriptionResult] = []
        for (seg_start, seg), text, token_ids in zip(segments, texts,
                                                     id_lists):
            start_t = seg_start / TARGET_SR
            end_t = (seg_start + len(seg)) / TARGET_SR
            out_lang = _response_language(text, lang_code)
            res = TranscriptionResult(
                text=text, language=out_lang,
                start_time=start_t, end_time=end_t, token_ids=token_ids)
            if return_timestamps and text:
                res.timestamps = _word_timestamps(seg, text, start_t, end_t,
                                                  out_lang)
            results.append(res)
        # Stamp at the END too: a first-request bucket compile can exceed
        # IDLE_TIMEOUT; the idle clock must restart when the work FINISHES.
        self.last_used = time.time()
        return results

    def _run_segments_batched(self, segments, language, context):
        """Long-form path: same-bucket segments share dispatches.

        Silence-boundary chunking cuts near MAX_SEGMENT_S, so nearly every
        segment of a long clip lands in the largest bucket — running them
        serially at batch 1 (the obvious loop) wastes the chip: each decode
        step re-reads the full weights for one row. Grouping by bucket and
        dispatching up to ASR_LONG_FORM_BATCH (pow2-padded, so only
        {1,2,4,8,...} shapes ever compile — same policy as
        runtime/batcher._pad_pow2) amortizes the weight reads across
        segments; a 10-minute clip becomes ~3 dispatches instead of ~20.
        Rows are independent in the fused executable, so per-segment output
        matches the batch-1 path (tests/test_engine.py long-form parity)."""
        import os as _os
        cap = int(_os.getenv("ASR_LONG_FORM_BATCH", "8"))
        cap = 1 << (max(1, cap).bit_length() - 1)  # pow2 floor
        by_bucket = {}
        for idx, (_, seg) in enumerate(segments):
            bf, bs = self.bucket_frames(len(seg))
            by_bucket.setdefault((bf, bs), []).append(idx)
        texts: List[Optional[str]] = [None] * len(segments)
        id_lists: List[Optional[List[int]]] = [None] * len(segments)
        from .batcher import _pad_pow2
        for (bf, bs), idxs in by_bucket.items():
            for off in range(0, len(idxs), cap):
                chunk = idxs[off:off + cap]
                clips = [segments[i][1] for i in chunk]
                _pad_pow2(clips, dtype=clips[0].dtype)
                t, il = self._run_bucket(clips, bf, bs, language, context)
                for j, i in enumerate(chunk):
                    texts[i], id_lists[i] = t[j], il[j]
        return texts, id_lists

    def transcribe_batch(self, clips: Sequence[Tuple[np.ndarray, int]],
                         language: Optional[str] = None
                         ) -> List[TranscriptionResult]:
        """Batch same-bucket clips into single device dispatches.

        Clips must fit one segment (≤ MAX_SEGMENT_S); `transcribe` handles
        longer audio via silence-boundary splitting. Rejecting here beats
        the old behavior (silent clip[:bucket] truncation with an end_time
        claiming full coverage)."""
        self.last_used = time.time()
        prepped = [_prep_audio(audio, sr) for audio, sr in clips]
        max_samples = int(MAX_SEGMENT_S * TARGET_SR)
        too_long = [i for i, a in enumerate(prepped) if len(a) > max_samples]
        if too_long:
            raise ValueError(
                f"clips {too_long} exceed MAX_SEGMENT_S={MAX_SEGMENT_S}s — "
                "use transcribe() (silence-boundary segmentation) for long "
                "audio")

        lang_code, _ = normalize_language(language)
        by_bucket = {}
        for idx, audio in enumerate(prepped):
            bf, bs = self.bucket_frames(len(audio))
            by_bucket.setdefault((bf, bs), []).append(idx)

        out: List[Optional[TranscriptionResult]] = [None] * len(prepped)
        for (bf, bs), idxs in by_bucket.items():
            texts, _ = self._run_bucket([prepped[i] for i in idxs], bf, bs,
                                        language)
            for i, text in zip(idxs, texts):
                out[i] = TranscriptionResult(
                    text=text, language=_response_language(text, lang_code),
                    start_time=0.0, end_time=len(prepped[i]) / TARGET_SR)
        self.last_used = time.time()  # idle clock restarts at job END
        return out  # type: ignore[return-value]

    # -- warmup --------------------------------------------------------------------
    def warmup(self, buckets: Optional[Sequence[float]] = None,
               language: Optional[str] = "en") -> None:
        """Compile executables for the given buckets (default: smallest two).

        Warms BOTH the plain path and the streaming resume path per bucket
        (the WS engine always decodes with resume), plus optional batch
        shapes for the micro-batcher (ASR_WARMUP_BATCH_SHAPES="2,4,8").
        With USE_CUDA_GRAPHS=true the lifecycle layer sweeps ALL buckets —
        the mapped TPU equivalent of CUDA kernel-cache warming."""
        import os as _os
        buckets = buckets or AUDIO_BUCKETS_S[:2]
        batch_shapes = [int(x) for x in
                        _os.getenv("ASR_WARMUP_BATCH_SHAPES", "").split(",")
                        if x.strip()]
        rng = np.random.default_rng(42)
        # fetch=False throughout: a device_get would join the process's
        # one-time D2H init (52–1416 s observed over a tunnel) and serialize it in
        # FRONT of the remaining compiles; unfetched dispatches let every
        # executable compile + load while the background fetch proceeds,
        # so warmup wall ≈ max(compile sweep, D2H init) instead of sum.
        last = None
        for sec in buckets:
            dummy = (rng.standard_normal(int(TARGET_SR * sec))
                     .astype(np.float32) * 0.01)
            bf, bs = self.bucket_frames(len(dummy))
            t0 = time.time()
            last = self._run_bucket([dummy], bf, bs, language, fetch=False)
            last = self._run_bucket([dummy], bf, bs, language,
                                    resume_tokens=[], fetch=False)
            for bsz in batch_shapes:
                last = self._run_bucket([dummy] * bsz, bf, bs, language,
                                        fetch=False)
            log.info("Warmup bucket {}s compiled in {:.1f}s", sec,
                     time.time() - t0)

        # WS streaming modes: warm the executables for every mode the
        # server-side policy (config.resolve_ws_mode) can pick at this
        # window cap — under auto that can be two (lone-session and
        # at-concurrency branches); explicit/legacy configs warm exactly
        # their one mode.
        from ..config import ws_warmup_profile
        ws_modes = {m.name for m in ws_warmup_profile()}
        if "tick" in ws_modes:
            # Compile the cross-session batched resume executables so the
            # first coalesced tick group doesn't pay a live compile. Ticks
            # only ever see windows ≤ the WS cap, and TickBatcher pads
            # groups to powers of two up to its max batch.
            cap = float(_os.getenv("WS_WINDOW_MAX_S", "6.0"))
            max_b = int(_os.getenv("ASR_WS_TICK_MAX_BATCH", "8"))
            shapes = []
            bsz = 2
            while bsz <= max_b:
                shapes.append(bsz)
                bsz *= 2
            for sec in [s for s in buckets if s <= cap] or buckets[:1]:
                bucket_frames, bucket_s = self.bucket_frames(
                    int(TARGET_SR * sec))
                dummy = (rng.standard_normal(int(TARGET_SR * sec))
                         .astype(np.float32) * 0.01)
                t0 = time.time()
                for bsz in shapes:
                    last = self._run_bucket([dummy] * bsz, bucket_frames,
                                            bucket_s, language,
                                            resume_rows=[None] * bsz,
                                            fetch=False)
                log.info("Warmup tick-batch bucket {}s (shapes {}) "
                         "compiled in {:.1f}s", sec, shapes,
                         time.time() - t0)
            # Concurrent finals coalesce through the micro-batcher
            # (serving/server.py batched flush), which dispatches PLAIN
            # batched executables on the FLUSH bucket (window cap +
            # WS_FLUSH_SILENCE_MS of padding rounds up the ladder) — warm
            # those too or the first flush herd pays a live compile.
            flush_s = cap + int(_os.getenv("WS_FLUSH_SILENCE_MS",
                                           "600")) / 1000.0
            fb, fs = self.bucket_frames(int(TARGET_SR * flush_s))
            dummy = (rng.standard_normal(int(TARGET_SR * flush_s))
                     .astype(np.float32) * 0.01)
            t0 = time.time()
            for bsz in shapes:
                last = self._run_bucket([dummy] * bsz, fb, fs, language,
                                        fetch=False)
            log.info("Warmup batched-flush bucket {}s (shapes {}) "
                     "compiled in {:.1f}s", fs, shapes, time.time() - t0)

        if "grouped" in ws_modes or "prefix" in ws_modes:
            # Pace a throwaway session across the cap so every stream
            # executable (block-encode shapes, segment-ladder rungs)
            # compiles here, not on a live connection's first ticks.
            # Grouped mode paces a 2-member throwaway group, which
            # compiles the same block encoders plus the batched gtick
            # rungs at the configured slot count; auto at long caps warms
            # BOTH (a lone connection binds prefix-solo, concurrency
            # binds grouped).
            t0 = time.time()
            cap = float(_os.getenv("WS_WINDOW_MAX_S", "6.0"))
            cap_n = int(cap * TARGET_SR)
            tick = int(0.45 * TARGET_SR)
            if "grouped" in ws_modes:
                from .stream_group import StreamGroup
                slots = int(_os.getenv("ASR_WS_GROUP_SLOTS", "8"))
                grp = StreamGroup(self, cap, slots)
                m1 = grp.attach_or_raise(language)
                m2 = grp.attach_or_raise(language)
                chunk = grp.plan.chunk_frames * HOP_LENGTH
                audio = (rng.standard_normal(cap_n + 4 * chunk)
                         .astype(np.float32) * 0.01)
                w1 = np.zeros(0, np.float32)
                w2 = np.zeros(0, np.float32)
                for off in range(0, len(audio), tick):
                    w1 = np.concatenate([w1, audio[off:off + tick]])
                    w2 = np.concatenate([w2, 0.8 * audio[off:off + tick]])
                    if len(w1) > cap_n:
                        trim = -(-(len(w1) - cap_n) // chunk) * chunk
                        w1 = w1[trim:]
                        w2 = w2[trim:]
                    grp.tick([(m1, w1), (m2, w2)])
                ticks = m1.stats["ticks"]
                m1.release()
                m2.release()
                log.info("Warmup stream group ({} ticks, {} slots) "
                         "compiled in {:.1f}s", ticks, slots,
                         time.time() - t0)
                t0 = time.time()
            if "prefix" in ws_modes:
                sess = self.stream_session(cap, language)
                chunk = sess.chunk_frames * HOP_LENGTH
                audio = (rng.standard_normal(cap_n + 4 * chunk)
                         .astype(np.float32) * 0.01)
                window = np.zeros(0, np.float32)
                for off in range(0, len(audio), tick):
                    window = np.concatenate([window,
                                             audio[off:off + tick]])
                    if len(window) > cap_n:
                        trim = -(-(len(window) - cap_n) // chunk) * chunk
                        window = window[trim:]
                    sess.update(window)
                log.info("Warmup stream session ({} ticks) compiled in "
                         "{:.1f}s", sess.stats["ticks"], time.time() - t0)

        # Warmup means READY: join the background D2H init and the last
        # unfetched dispatch so the first real request pays neither.
        t0 = time.time()
        self._d2h_warm.wait()
        if last is not None:
            # A real (tiny) fetch, not block_until_ready: on the remote
            # backend readiness events resolve early, but a fetch cannot
            # complete before every prior dispatch on the stream has.
            jax.device_get(last.lengths)
        waited = time.time() - t0
        if waited > 1.0:
            log.info("Warmup drained D2H init + dispatches in {:.1f}s "
                     "(overlapped the compile sweep)", waited)


def _prep_audio(audio, sr: int) -> np.ndarray:
    """Normalize input audio for the bucket path. Mono 16 kHz s16 PCM stays
    int16 (the wire format — the fused executable converts on device, which
    halves the host→device transfer); everything else becomes mono float32
    at TARGET_SR."""
    audio = np.asarray(audio)
    if audio.dtype == np.int16 and audio.ndim == 1 and sr == TARGET_SR:
        return audio
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    else:
        audio = audio.astype(np.float32, copy=False)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sr != TARGET_SR:
        audio = resample(audio, sr, TARGET_SR)
    return audio


def _response_language(text: str, lang_code: Optional[str]) -> str:
    """The ONE language-metadata rule for every path (solo transcribe,
    transcribe_batch, micro-batcher): explicit language echoes back;
    language=auto runs script-based detection on the produced text."""
    if lang_code:
        return lang_code
    if text:
        from ..text.langid import detect_language
        return detect_language(text) or "auto"
    return "auto"


def _word_timestamps(seg_audio: np.ndarray, text: str, start_t: float,
                     end_t: float, language: str) -> List[dict]:
    """Model-quality word timing when the ForcedAligner is loaded (the
    reference returns SDK/model timestamps, src/server.py:866-869); falls
    back to char-proportional estimates otherwise or on aligner failure."""
    from ..sidecars import subtitle
    if subtitle.aligner_loaded():
        try:
            words = subtitle.align_audio(seg_audio, TARGET_SR, text, language)
            if words:
                return [{"word": w.text,
                         "start": round(w.start + start_t, 3),
                         "end": round(w.end + start_t, 3)} for w in words]
        except Exception as e:  # alignment must never fail the request
            log.warning("Aligner timestamps failed ({}); using estimates", e)
    return _estimate_word_timestamps(text, start_t, end_t)


def _estimate_word_timestamps(text: str, start_t: float, end_t: float
                              ) -> List[dict]:
    """Char-proportional word timing (reference subtitle.py fast mode idea)."""
    words = text.split()
    if not words:
        return []
    total_chars = sum(len(w) for w in words) + len(words) - 1
    dur = max(end_t - start_t, 1e-3)
    out = []
    pos = 0
    for w in words:
        w_start = start_t + dur * pos / max(total_chars, 1)
        pos += len(w)
        w_end = start_t + dur * pos / max(total_chars, 1)
        pos += 1
        out.append({"word": w, "start": round(w_start, 3),
                    "end": round(w_end, 3)})
    return out
