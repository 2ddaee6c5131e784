"""Model lifecycle: lazy load, idle auto-unload, warmup, health.

Parity with the reference's lifecycle manager (src/server.py:271-527):
double-checked async lock around load/unload, idle watchdog (30 s poll,
IDLE_TIMEOUT default 120 s), warmup on load, dual-model (fast 0.6B for WS
partials, DUAL_MODEL=true), speculative decoding (USE_SPECULATIVE=true,
draft-accept heuristic), and a /health info dict. CUDA-era knobs map to
TPU equivalents: USE_CUDA_GRAPHS=true → warmup sweep over ALL jit buckets.

MODEL_ID resolution:
* a local directory  → HF-format checkpoint (config.json + safetensors +
  tokenizer.json) via runtime/checkpoint.py
* ``preset:<name>``  → synthetic zero-weight model of that architecture
  (benchmarks, smoke tests)
* anything else      → error: this build has no network egress; weights
  must be mounted (same operational model as the reference's ./models
  volume, compose.yaml:10-11).
"""
from __future__ import annotations

import asyncio
import gc
import os
import time
import weakref
from typing import Optional

from ..models.asr import AsrModel
from ..utils.logging import log
from .queue import PriorityInferQueue, infer_executor


def _warmup_buckets():
    """Buckets the load-time warmup sweep covers.

    Priority: ``USE_CUDA_GRAPHS=true`` (the reference's kernel-cache
    warming flag, mapped — reference src/server.py:437-458) sweeps the
    FULL ladder; ``ASR_WARMUP_BUCKETS="1,2,6"`` names an explicit list;
    the default is the WS-REACHABLE prefix of the ladder — every bucket
    a streaming session at WS_WINDOW_MAX_S can touch, including the
    flush window's (cap + WS_FLUSH_SILENCE_MS of padded silence, which
    rounds UP to the next bucket).  The old default (smallest two) left
    the 4 s/6 s/flush buckets cold at the default 6 s cap: a paced WS
    session's first tick into each paid a live compile-or-load (13–24 s
    measured over the tunnel, 2026-08-21) and the 450 ms cadence never
    recovered — warmup exists precisely so recompile stampedes are
    impossible at runtime."""
    from ..runtime.engine import AUDIO_BUCKETS_S
    if os.getenv("USE_CUDA_GRAPHS", "").lower() == "true":
        return AUDIO_BUCKETS_S
    explicit = os.getenv("ASR_WARMUP_BUCKETS", "").strip()
    if explicit:
        ladder = {float(b) for b in explicit.split(",") if b.strip()}
        return tuple(b for b in AUDIO_BUCKETS_S if b in ladder) \
            or AUDIO_BUCKETS_S[:2]
    cap = float(os.getenv("WS_WINDOW_MAX_S", "6.0") or 6.0)
    flush_s = cap + int(os.getenv("WS_FLUSH_SILENCE_MS", "600")) / 1000.0
    need = [b for b in AUDIO_BUCKETS_S if b <= cap]
    for b in AUDIO_BUCKETS_S:
        if b >= flush_s:
            if b not in need:
                need.append(b)
            break
    return tuple(need) or AUDIO_BUCKETS_S[:2]


def _load_engine_sync(model_id: str):
    import jax
    import jax.numpy as jnp

    from ..runtime.engine import TranscriptionEngine

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    # Optional low-precision KV cache (halves decode-phase cache bandwidth;
    # independent of weight quantization). int4 packs 2 values/byte with
    # per-(token, head) scales — halves it AGAIN vs fp8 (measured v5e
    # B96/S512: attention phase 5.9 -> 3.8 ms/step).
    kv_dtype = {"fp8": jnp.float8_e4m3fn, "bf16": jnp.bfloat16,
                "int4": jnp.int4,
                "": None}.get(os.getenv("ASR_KV_CACHE_DTYPE", "").lower())

    if os.path.isdir(model_id):
        from ..models.asr import PromptTemplate
        from ..runtime.checkpoint import load_asr_checkpoint
        from ..text.tokenizer import BpeTokenizer
        cfg, params = load_asr_checkpoint(model_id, dtype=dtype)
        tok_path = os.path.join(model_id, "tokenizer.json")
        tokenizer = BpeTokenizer.from_file(tok_path)
        # Prompt template is checkpoint-driven when the checkpoint ships one
        # (chat_template.jinja / tokenizer_config.json) — see PromptTemplate.
        template = PromptTemplate.from_checkpoint(model_id)
        if template.chat_template:
            log.info("Using checkpoint chat template ({} chars)",
                     len(template.chat_template))
        model = AsrModel(cfg, params, tokenizer, template=template)
    elif model_id.startswith("preset:"):
        from ..models.config import preset
        from ..models.decoder import init_decoder_params
        from ..models.encoder import init_encoder_params
        from ..text.tokenizer import BpeTokenizer, bytes_to_unicode
        cfg = preset(model_id.split(":", 1)[1])
        key = jax.random.PRNGKey(0)
        shapes = {
            "encoder": jax.eval_shape(
                lambda: init_encoder_params(cfg.encoder, key, dtype)),
            "decoder": jax.eval_shape(
                lambda: init_decoder_params(cfg.decoder, key, dtype)),
        }
        # Single dispatch for the whole zero tree (tunnel-friendly).
        params = jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
        byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
        # Special ids must live INSIDE the preset's vocab: small presets
        # (tiny, vocab 512) would otherwise get an eos_id the model can
        # never emit (argmax over 512 logits vs id 151642 → every request
        # runs its full token budget) and prompt ids that jnp.take clamps
        # to the last row. Big presets keep the real Qwen id block.
        vocab = cfg.decoder.vocab_size
        base = 151640 if vocab > 151646 else vocab - 6
        specials = {t: base + i for i, t in enumerate(
            ["<|endoftext|>", "<|im_start|>", "<|im_end|>", "<|AUDIO|>",
             "<|audio_bos|>", "<|audio_eos|>"])}
        tokenizer = BpeTokenizer(byte_vocab, [], specials)
        model = AsrModel(cfg, params, tokenizer)
    else:
        raise FileNotFoundError(
            f"MODEL_ID '{model_id}' is not a local checkpoint directory. "
            "This deployment has no network egress — mount the HF checkpoint "
            "(config.json + *.safetensors + tokenizer.json) and point "
            "MODEL_ID at it, or use 'preset:<name>' for synthetic weights.")

    # Native quantization (replaces bitsandbytes/torchao,
    # reference src/server.py:311-318, 358-390). Same QUANTIZE env contract.
    quantize_mode = os.getenv("QUANTIZE", "").lower()
    if quantize_mode in ("int8", "fp8", "int4"):
        from ..ops.quant import param_bytes, quantize_params
        before = param_bytes(model.params) / 1024 ** 2
        model.params = quantize_params(model.params, quantize_mode)
        after = param_bytes(model.params) / 1024 ** 2
        log.info("{} quantization applied — {}MB → {}MB (saved {}MB)",
                 quantize_mode.upper(), round(before), round(after),
                 round(before - after))

    # Mesh sharding (SURVEY §2.3): ASR_MESH_DP/ASR_MESH_TP pin the layout;
    # ASR_MESH_AUTO=true derives one from jax.device_count(). Weights are
    # placed once at load; the engine dp-shards each batch. Single-device
    # meshes are skipped (nothing to shard).
    mesh = None
    dp_env, tp_env = os.getenv("ASR_MESH_DP"), os.getenv("ASR_MESH_TP")
    auto = os.getenv("ASR_MESH_AUTO", "").lower() == "true"
    if dp_env or tp_env or auto:
        if jax.device_count() > 1:
            from ..parallel.mesh import make_mesh, shard_params
            mesh = make_mesh(dp=int(dp_env) if dp_env else None,
                             tp=int(tp_env) if tp_env else None)
            model.params = shard_params(model.params, mesh)
            log.info("Mesh sharding enabled: dp={} tp={} over {} devices",
                     mesh.shape["dp"], mesh.shape["tp"], jax.device_count())
        else:
            log.info("Mesh requested but only 1 device present; "
                     "serving unsharded")

    engine = TranscriptionEngine(model, dtype=dtype, cache_dtype=kv_dtype)
    engine.mesh = mesh
    return engine


class ModelManager:
    """Owns the engine(s) + scheduler; one per serving process."""

    def __init__(self):
        self.engine = None
        self.fast_engine = None
        self.pool = None  # continuous-batching decode pool (opt-in)
        self._last_stream_ref = None  # weakref: newest WS prefix-cache session
        self._stream_sessions = weakref.WeakSet()  # all live sessions
        # registrations happen on the event loop, release on the infer
        # thread — guard the WeakSet against mutation-during-iteration
        import threading as _threading
        self._sessions_lock = _threading.Lock()
        self.loaded_model_id: Optional[str] = None
        self.queue = PriorityInferQueue()
        from .batcher import GroupTickBatcher, MicroBatcher, TickBatcher
        self.batcher = MicroBatcher(self)
        self.tick_batcher = TickBatcher(self)
        self.group_tick_batcher = GroupTickBatcher(self)
        # Live WS session count (kept by the serving layer): the tick
        # batcher skips its collection window when there is nothing to
        # coalesce with.
        self.ws_sessions = 0
        self._lock = asyncio.Lock()
        self._last_used = 0.0
        self.idle_timeout = int(os.getenv("IDLE_TIMEOUT", "120"))
        self.request_timeout = int(os.getenv("REQUEST_TIMEOUT", "300"))
        self._watchdog_task: Optional[asyncio.Task] = None

    # -- lifecycle -------------------------------------------------------------
    def start(self):
        self.queue.start()
        self._watchdog_task = asyncio.create_task(self._idle_watchdog())

    def stop(self):
        self.queue.stop()
        if self.pool is not None:
            self.pool.stop()
            self.pool = None
        if self._watchdog_task:
            self._watchdog_task.cancel()
            self._watchdog_task = None

    @staticmethod
    def _set_cpu_affinity():
        """Pin to the accelerator-collocated NUMA node's CPUs
        (reference src/server.py:254-268; first-half-of-CPUs heuristic)."""
        numa_node = os.getenv("NUMA_NODE")
        if numa_node is None:
            return
        try:
            cpus = sorted(os.sched_getaffinity(0))
            half = max(1, len(cpus) // 2)
            node_cpus = cpus[:half] if int(numa_node) == 0 else cpus[half:]
            if node_cpus:
                os.sched_setaffinity(0, node_cpus)
                log.info("CPU affinity set to NUMA node {}: {}", numa_node,
                         node_cpus)
        except (OSError, ValueError) as e:
            log.error("CPU affinity setting failed (non-critical): {}", e)

    def _load_sync(self):
        if self.engine is not None:
            return
        self._set_cpu_affinity()
        model_id = os.getenv("MODEL_ID", "Qwen/Qwen3-ASR-1.7B")
        t0 = time.time()
        log.info("Loading {}...", model_id)
        self.engine = _load_engine_sync(model_id)
        self.loaded_model_id = model_id

        use_spec = os.getenv("USE_SPECULATIVE", "").lower() == "true"
        dual = os.getenv("DUAL_MODEL", "").lower() == "true"
        if use_spec or dual:
            fast_id = os.getenv("FAST_MODEL_ID", "Qwen/Qwen3-ASR-0.6B")
            if fast_id != model_id:
                try:
                    log.info("Loading fast model {} ({})...", fast_id,
                             "speculative" if use_spec else "dual-model")
                    self.fast_engine = _load_engine_sync(fast_id)
                except Exception as e:
                    log.error("Fast model load failed: {}, using single model", e)
            else:
                log.info("Fast and main model identical; skipping dual load")

        # Token-level speculative (default; ASR_SPECULATIVE_MODE=result keeps
        # the reference's result-level accept heuristic).
        spec_mode = os.getenv("ASR_SPECULATIVE_MODE", "token").lower()
        if (use_spec and spec_mode == "token"
                and self.fast_engine is not None):
            try:
                self.engine.attach_draft(self.fast_engine.model)
                log.info("Token-level speculative decoding enabled (gamma={})",
                         os.getenv("ASR_SPEC_GAMMA", "4"))
            except AssertionError as e:
                log.error("Token-level speculative unavailable ({}); "
                          "falling back to result-level", e)

        # Warmup: the WS-reachable ladder by default, everything with
        # USE_CUDA_GRAPHS=true, an explicit ASR_WARMUP_BUCKETS list
        # otherwise (_warmup_buckets above).
        if os.getenv("SKIP_WARMUP", "").lower() != "true":
            buckets = _warmup_buckets()
            self.engine.warmup(buckets)
            if self.fast_engine is not None:
                self.fast_engine.warmup(buckets)

        # Continuous batching (docs/ROADMAP.md): pooled decode slots share
        # every weight read across concurrent requests; opt-in because the
        # fused per-request path has better single-stream latency.
        if os.getenv("ASR_CONTINUOUS_BATCHING", "").lower() == "true":
            from .pool import DecodePool
            self.pool = DecodePool(self.engine)

        self._last_used = time.time()
        log.info("Model loaded in {:.1f}s", time.time() - t0)

    def register_stream_session(self, sess) -> None:
        """Track a WS prefix-cache session so idle unload can release its
        engine/device references (weak: sessions die with connections)."""
        with self._sessions_lock:
            self._stream_sessions.add(sess)
        self._last_stream_ref = weakref.ref(sess)

    @property
    def last_stream_session(self):
        """Newest WS prefix-cache session (observability/tests). WEAK:
        a strong reference here would pin the session's device KV and
        encoder blocks in HBM after its connection closed."""
        return self._last_stream_ref() if self._last_stream_ref else None

    def _last_activity(self) -> float:
        """Most recent use across every inference path: manager-stamped
        requests AND direct engine dispatches (the micro-batcher calls
        engine.transcribe_batch without passing through transcribe_sync)."""
        stamps = [self._last_used]
        for eng in (self.engine, self.fast_engine):
            if eng is not None:
                stamps.append(getattr(eng, "last_used", 0.0))
        return max(stamps)

    def _unload_sync(self):
        if self.engine is None:
            return
        # Re-check idleness HERE, on the inference thread: the watchdog's
        # check ran before this call was queued, and a long job (e.g. a
        # first-request bucket compile) may have occupied the executor past
        # IDLE_TIMEOUT — unloading now would rip the engine out from under a
        # request already past ensure_loaded().
        if (time.time() - self._last_activity() <= self.idle_timeout
                or self.queue.depth > 0
                or (self.pool is not None and self.pool.depth > 0)):
            log.info("Skipping idle unload: engine used or work in flight")
            return
        log.info("Unloading model (idle timeout)...")
        from ..sidecars import subtitle
        subtitle.unload_aligner()
        if self.pool is not None:
            self.pool.stop()
            self.pool = None
        # Clear the id BEFORE the engine: /health reads these from another
        # thread and must never see model_loaded=false with a model_id.
        self.loaded_model_id = None
        self.engine = None
        self.fast_engine = None
        # Release every live WS prefix-cache session: each references the
        # engine (params + device caches) and would keep the HBM alive
        # past this unload; open connections rebind on their next tick.
        with self._sessions_lock:
            sessions = list(self._stream_sessions)
        for sess in sessions:
            try:
                sess.release()
            except Exception:  # pragma: no cover - release must not block
                pass
        self._last_stream_ref = None
        gc.collect()
        log.info("Model unloaded")

    async def ensure_loaded(self):
        self._last_used = time.time()
        if self.engine is not None:
            return
        async with self._lock:
            if self.engine is not None:
                return
            await asyncio.get_event_loop().run_in_executor(
                infer_executor(), self._load_sync)
            self._last_used = time.time()

    async def _idle_watchdog(self):
        interval = float(os.getenv("ASR_WATCHDOG_INTERVAL", "30"))
        while True:
            await asyncio.sleep(interval)
            if self.idle_timeout <= 0 or self.engine is None:
                continue
            if time.time() - self._last_activity() > self.idle_timeout:
                try:
                    async with self._lock:
                        if (self.engine is not None
                                and time.time() - self._last_activity()
                                > self.idle_timeout):
                            await asyncio.get_event_loop().run_in_executor(
                                infer_executor(), self._unload_sync)
                except Exception:  # noqa: BLE001 — one failed unload must
                    # not silently kill the watchdog for the process's life
                    log.exception("idle unload failed; watchdog continues")

    # -- inference entry -----------------------------------------------------------
    def transcribe_sync(self, audio, sr, lang_code, return_timestamps,
                        use_fast: bool = False, context: str = "",
                        resume_tokens=None):
        """Runs ON the inference thread. Mirrors _do_transcribe
        (reference src/server.py:849-923) incl. speculative + dual-model;
        resume_tokens enables the streaming self-draft fast path."""
        self._last_used = time.time()
        if self.engine is None:
            # Lost a race with an idle unload: this job was admitted
            # (ensure_loaded's lock-free fast path) before the unload's
            # idleness re-check saw its activity stamp, and the single
            # infer thread ran the unload first. We ARE that thread, so
            # reloading here is serialized with every load/unload.
            log.info("Reloading model: request admitted during idle unload")
            self._load_sync()
        try:
            # Result-level speculation serves batch FINALS only: a streaming
            # tick (resume_tokens) or an explicit fast-engine request
            # (use_fast, WS partials) must keep its own fast path — routing
            # those through draft+verify would silently discard the resume
            # self-draft and re-decode the whole window every 450 ms.
            use_spec = (os.getenv("USE_SPECULATIVE", "").lower() == "true"
                        and self.fast_engine is not None
                        and resume_tokens is None and not use_fast
                        and os.getenv("ASR_SPECULATIVE_MODE",
                                      "token").lower() == "result")
            if use_spec:
                draft = self.fast_engine.transcribe(
                    audio, sr, lang_code, return_timestamps, context)
                draft_text = draft[0].text if draft else ""
                # Result-level accept heuristic (reference src/server.py:837-840).
                if len(draft_text) < 100 and "[" not in draft_text:
                    return draft
                return self.engine.transcribe(audio, sr, lang_code,
                                              return_timestamps, context)
            eng = (self.fast_engine
                   if use_fast and self.fast_engine is not None
                   else self.engine)
            return eng.transcribe(audio, sr, lang_code, return_timestamps,
                                  context, resume_tokens=resume_tokens)
        finally:
            # Stamp at the END too: a long job (first-bucket compile can take
            # minutes) must reset the idle clock when it FINISHES, or the
            # watchdog unloads an engine that was busy the whole time.
            self._last_used = time.time()

    def pool_eligible(self, audio, sr: int, return_timestamps: bool) -> bool:
        """Requests the decode pool can serve: plain mono transcription up
        to one segment; everything else keeps the fused path."""
        from ..runtime.engine import MAX_SEGMENT_S, TARGET_SR
        import numpy as np
        return (self.pool is not None and not return_timestamps
                and sr == TARGET_SR
                and np.asarray(audio).ndim == 1
                and len(audio) <= MAX_SEGMENT_S * TARGET_SR)

    async def transcribe_pooled(self, audio, sr: int,
                                language) -> list:
        """Continuous-batching route: the request shares decode dispatches
        with every other in-flight request (runtime/pool.py). Output is
        greedy-identical to the fused path."""
        import asyncio as _aio

        from ..models.asr import normalize_language
        from ..runtime.engine import (TARGET_SR, TranscriptionResult,
                                      _prep_audio, _response_language)
        from .pool import PoolStoppedError

        self._last_used = time.time()
        audio = _prep_audio(audio, sr)
        if len(audio) == 0:
            return []
        # Snapshot: _unload_sync nulls self.pool from the infer thread.
        pool = self.pool
        if pool is None:
            return await self._pooled_fallback(audio, language)
        loop = _aio.get_event_loop()
        fut = loop.create_future()
        lang_code, _ = normalize_language(language)
        end_t = len(audio) / TARGET_SR

        def ok(text, ids):
            res = [TranscriptionResult(
                text=text, language=_response_language(text, lang_code),
                start_time=0.0, end_time=end_t, token_ids=ids)]
            loop.call_soon_threadsafe(
                lambda: fut.done() or fut.set_result(res))

        def err(e):
            loop.call_soon_threadsafe(
                lambda: fut.done() or fut.set_exception(e))

        pool.submit(audio, language, ok, err)
        try:
            return await _aio.wait_for(fut, timeout=self.request_timeout)
        except PoolStoppedError:
            # Pool torn down (idle unload / reconfigure) after eligibility:
            # the fused path serves the request instead of surfacing a 500.
            return await self._pooled_fallback(audio, language)
        finally:
            self._last_used = time.time()

    async def _pooled_fallback(self, audio, language) -> list:
        """Fused-path service for a request that raced the pool teardown."""
        import asyncio as _aio
        from ..models.asr import normalize_language
        from ..runtime.engine import TARGET_SR
        lang_code, _ = normalize_language(language)
        return await _aio.wait_for(
            self.queue.submit(
                lambda: self.transcribe_sync(audio, TARGET_SR, lang_code,
                                             False)),
            timeout=self.request_timeout)

    # -- health ---------------------------------------------------------------------
    def health_info(self) -> dict:
        info = {
            "status": "ok",
            "model_loaded": self.engine is not None,
            "model_id": self.loaded_model_id,
        }
        if self.pool is not None:
            info["continuous_batching"] = {"slots": self.pool.max_slots,
                                           "window": self.pool.window,
                                           "depth": self.pool.depth}
        if self.engine is not None:
            try:
                import jax as _jax
                info["model_params_m"] = round(sum(
                    x.size for x in _jax.tree.leaves(self.engine.model.params)
                ) / 1e6, 1)
            except Exception:
                pass
            # False while the one-time device→host fetch init is still in
            # flight OR if the background warm fetch failed (remote-attached
            # backends pay 52–1416 s observed once per process; the first
            # request's device_get blocks until the init really completes —
            # see engine.warm_d2h_path_async / d2h_warm_state).
            if getattr(self.engine, "_d2h_warm", None) is not None:
                from .engine import d2h_warm_state
                state = d2h_warm_state()
                info["d2h_warm"] = state == "warm"
                if state.startswith("failed"):
                    info["d2h_warm_error"] = state
        try:
            import jax
            devices = jax.devices()
            info["device"] = str(devices[0].device_kind) if devices else None
            info["num_devices"] = len(devices)
            mesh = getattr(self.engine, "mesh", None)
            if mesh is not None:
                info["mesh"] = {"dp": mesh.shape["dp"],
                                "tp": mesh.shape["tp"]}
            if self.engine is not None:
                stats = getattr(devices[0], "memory_stats", lambda: None)()
                if stats:
                    info["hbm_used_mb"] = round(
                        stats.get("bytes_in_use", 0) / 1024 ** 2)
                    info["hbm_limit_mb"] = round(
                        stats.get("bytes_limit", 0) / 1024 ** 2)
                # Framework-level accounting that works on EVERY backend
                # (some remote PJRT clients expose no memory_stats): total
                # bytes of live jax arrays. This is exactly the leak class
                # serving can create — per-session stream caches, pool
                # slots, batcher buffers that miss a release — so the e2e
                # memory gate can execute even where device stats don't
                # (reference E2Etest/test_performance.py:183-204).
                info["device_arrays_mb"] = round(sum(
                    a.nbytes for a in jax.live_arrays()) / 1024 ** 2)
                # Executable churn is the leak class live-array accounting
                # can't see (compiled programs hold device memory too):
                # steady-state serving over a fixed shape set must hold
                # this constant. Counts both engines' per-shape caches.
                info["executable_count"] = sum(
                    e.executable_count
                    for e in (self.engine, self.fast_engine)
                    if e is not None)
        except Exception:
            pass
        return info


manager = ModelManager()
