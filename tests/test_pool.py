"""Continuous-batching decode pool: identical output to the fused path.

The pool only changes SCHEDULING (shared decode dispatches, per-row cache
offsets); the greedy recurrence is the same, so texts must match
engine.transcribe exactly for any mix of buckets/languages, including
requests that join while others are mid-decode.
"""
import threading
import time

import numpy as np
import pytest

from tests.fixtures import write_tiny_checkpoint, load_tiny_model
from tests.util_audio import speech_like, tone


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import jax.numpy as jnp
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny")
    write_tiny_checkpoint(path)
    return TranscriptionEngine(load_tiny_model(path), dtype=jnp.float32)


def _collect(pool, clips):
    done = threading.Event()
    results = {}

    def make_cb(i):
        def ok(text, ids):
            results[i] = ("ok", text, ids)
            if len(results) == len(clips):
                done.set()

        def err(e):
            results[i] = ("err", e, None)
            if len(results) == len(clips):
                done.set()
        return ok, err

    for i, (audio, lang) in enumerate(clips):
        ok, err = make_cb(i)
        pool.submit(audio, lang, ok, err)
    assert done.wait(timeout=300), f"pool timed out: {results.keys()}"
    for i, r in results.items():
        assert r[0] == "ok", f"request {i}: {r[1]}"
    return results


def test_pool_matches_fused_engine(engine):
    from qwen3_asr_tpu.runtime.pool import DecodePool
    clips = [
        (speech_like(0.8, seed=1), "en"),
        (speech_like(2.5, seed=2), "en"),
        (speech_like(1.2, seed=3), "zh"),
        ((np.clip(speech_like(0.9, seed=4) * 32767, -32768, 32767)
          .astype(np.int16)), "en"),        # wire-format s16 clip
        (tone(1.5, 440.0), None),            # language auto
    ]
    expected = []
    for audio, lang in clips:
        res = engine.transcribe(audio, 16000, language=lang)
        expected.append((res[0].text, res[0].token_ids))

    pool = DecodePool(engine, slots=4, segment=6)
    try:
        results = _collect(pool, clips)
    finally:
        pool.stop()
    for i, (text, ids) in enumerate(expected):
        assert results[i][1] == text, (
            f"clip {i}: pool={results[i][1]!r} fused={text!r}")
        assert results[i][2] == ids


def test_pool_mid_flight_join(engine):
    """A request arriving while another decodes joins at the next segment
    boundary and both finish correctly (slots > requests, no eviction)."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    a = speech_like(3.0, seed=7)
    b = speech_like(0.7, seed=8)
    exp_a = engine.transcribe(a, 16000, language="en")[0].text
    exp_b = engine.transcribe(b, 16000, language="en")[0].text

    pool = DecodePool(engine, slots=2, segment=4)
    out = {}
    done = threading.Event()

    def cb(name):
        def ok(text, ids):
            out[name] = text
            if len(out) == 2:
                done.set()
        return ok, lambda e: (out.setdefault(name, e), done.set())

    try:
        ok_a, err_a = cb("a")
        pool.submit(a, "en", ok_a, err_a)
        time.sleep(0.3)  # a is (likely) mid-decode now
        ok_b, err_b = cb("b")
        pool.submit(b, "en", ok_b, err_b)
        assert done.wait(timeout=300)
    finally:
        pool.stop()
    assert out["a"] == exp_a
    assert out["b"] == exp_b


def test_pool_more_requests_than_slots(engine):
    """Requests beyond the slot count queue and run as slots free."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    clips = [(speech_like(0.6 + 0.2 * i, seed=10 + i), "en")
             for i in range(5)]
    expected = [engine.transcribe(a, 16000, language=l)[0].text
                for a, l in clips]
    pool = DecodePool(engine, slots=2, segment=5)
    try:
        results = _collect(pool, clips)
    finally:
        pool.stop()
    for i, text in enumerate(expected):
        assert results[i][1] == text


def test_pool_single_slot_reuse(engine):
    """slots=1 forces every request through the retire -> re-admit cycle
    while the pipelined extra segment of the previous occupant is still in
    flight — the admission-generation guard must keep each occupant's
    state separate (texts identical to the fused path)."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    clips = [(speech_like(0.5 + 0.3 * i, seed=30 + i), "en")
             for i in range(4)]
    expected = [engine.transcribe(a, 16000, language=l)[0].text
                for a, l in clips]
    pool = DecodePool(engine, slots=1, segment=4)
    try:
        results = _collect(pool, clips)
    finally:
        pool.stop()
    for i, text in enumerate(expected):
        assert results[i][1] == text, (
            f"clip {i}: pool={results[i][1]!r} fused={text!r}")


def test_pool_staggered_submissions(engine):
    """Requests trickling in one at a time while segments are in flight
    exercise the overlapped-admission path (device-side state join, first
    token resolved at drain) on every admission."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    clips = [(speech_like(1.1 + 0.4 * i, seed=40 + i), "en")
             for i in range(3)]
    expected = [engine.transcribe(a, 16000, language=l)[0].text
                for a, l in clips]
    pool = DecodePool(engine, slots=4, segment=3)
    done = threading.Event()
    results = {}

    def cb(i):
        def ok(text, ids):
            results[i] = text
            if len(results) == len(clips):
                done.set()
        return ok, lambda e: (results.setdefault(i, e), done.set())

    try:
        for i, (audio, lang) in enumerate(clips):
            ok, err = cb(i)
            pool.submit(audio, lang, ok, err)
            time.sleep(0.4)  # land mid-decode of the previous request
        assert done.wait(timeout=300)
    finally:
        pool.stop()
    for i, text in enumerate(expected):
        assert results[i] == text


def test_pool_int4_engine_degrades_cache_to_fp8(engine):
    """int4 arrays can't cross jit boundaries (jax bug), so an int4
    engine's pool cache falls back to fp8 — construction must not trip
    the eager-int4 recursion and the pool dtype must be fp8."""
    import jax.numpy as jnp
    from qwen3_asr_tpu.runtime.pool import DecodePool
    old = engine.cache_dtype
    engine.cache_dtype = jnp.int4
    try:
        pool = DecodePool(engine, slots=2, segment=4)
        try:
            assert pool.cache_dtype == jnp.float8_e4m3fn
            assert pool._cache.k.dtype == jnp.float8_e4m3fn
            assert pool._cache.k_scale is None
        finally:
            pool.stop()
    finally:
        engine.cache_dtype = old


def test_pool_serving_integration(tmp_path, monkeypatch):
    """Full app with ASR_CONTINUOUS_BATCHING=true: concurrent HTTP uploads
    and a WS flush all route through the pool and produce the same text
    the fused path gives."""
    import asyncio
    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer
    from qwen3_asr_tpu.audio.codec import encode_wav

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("MODEL_ID", ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")
    monkeypatch.setenv("ASR_CONTINUOUS_BATCHING", "true")
    monkeypatch.setenv("ASR_POOL_SLOTS", "4")
    monkeypatch.setenv("ASR_POOL_WS", "true")  # WS defaults to resume path
    from qwen3_asr_tpu.serving.server import build_app

    async def go():
        client = TestClient(TestServer(build_app()))
        await client.start_server()
        try:
            async def post(seed):
                form = aiohttp.FormData()
                form.add_field("file",
                               encode_wav(speech_like(1.0, seed=seed), 16000),
                               filename="a.wav", content_type="audio/wav")
                form.add_field("language", "en")
                resp = await client.post("/v1/audio/transcriptions",
                                         data=form)
                assert resp.status == 200, await resp.text()
                return await resp.json()

            bodies = await asyncio.gather(*[post(s) for s in range(3)])
            for b in bodies:
                assert set(b) >= {"text", "language"}

            mgr = client.app["manager"]
            assert mgr.pool is not None
            # fused-path reference for one clip (the endpoint applies the
            # repetition collapse on top of the raw engine text)
            from qwen3_asr_tpu.text.repetition import detect_and_fix_repetitions
            expected = detect_and_fix_repetitions(mgr.engine.transcribe(
                speech_like(1.0, seed=0), 16000, language="en")[0].text)
            assert bodies[0]["text"] == expected

            # health advertises the pool: env slots=4 is the autoscale
            # BASE; the allocation gets the default 4x burst headroom
            health = await (await client.get("/health")).json()
            assert health["continuous_batching"]["slots"] == 16
            assert health["continuous_batching"]["window"] == 4

            # WS session: partial + flush through the pool
            ws = await client.ws_connect("/ws/transcribe?use_server_vad=false")
            await ws.receive_json()
            pcm = (np.clip(speech_like(0.9, seed=5) * 32767, -32768, 32767)
                   .astype("<i2").tobytes())
            await ws.send_bytes(pcm)
            partial = await asyncio.wait_for(ws.receive_json(), timeout=120)
            assert partial.get("is_partial")
            await ws.send_json({"action": "flush"})
            final = await asyncio.wait_for(ws.receive_json(), timeout=120)
            while not final.get("is_final"):
                final = await asyncio.wait_for(ws.receive_json(), timeout=120)
            assert "text" in final
            await ws.close()
        finally:
            await client.close()
    asyncio.new_event_loop().run_until_complete(go())


def test_pool_churn_stress(engine):
    """Heavy oversubscription with mixed sizes: 12 requests through 3
    slots at a tiny segment — constant admission/retirement churn through
    the pipelined driver must stay exact."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    rng = np.random.default_rng(0)
    clips = [(speech_like(float(rng.uniform(0.4, 2.5)), seed=20 + i),
              "en" if i % 2 else "zh") for i in range(12)]
    expected = [engine.transcribe(a, 16000, language=l)[0].text
                for a, l in clips]
    pool = DecodePool(engine, slots=3, segment=3)
    try:
        results = _collect(pool, clips)
    finally:
        pool.stop()
    for i, text in enumerate(expected):
        assert results[i][1] == text, f"clip {i}"


def test_pool_autoscale_grows_window(engine):
    """A burst beyond the base window grows it (instead of queueing):
    larger-window segment executables run and every text still matches
    the fused path exactly."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    clips = [(speech_like(0.5 + 0.15 * i, seed=60 + i), "en")
             for i in range(6)]
    expected = [engine.transcribe(a, 16000, language=l)[0].text
                for a, l in clips]
    pool = DecodePool(engine, slots=2, segment=4, max_slots=8)
    assert pool._sizes == [2, 4, 8]
    try:
        results = _collect(pool, clips)
        grown = set(pool._decode_fns)
    finally:
        pool.stop()
    assert any(w > 2 for w in grown), f"window never grew: {grown}"
    for i, text in enumerate(expected):
        assert results[i][1] == text, f"clip {i}"


def test_pool_autoscale_shrinks_and_compacts(engine):
    """Short requests retire while one long straggler (admitted at a high
    slot index) keeps decoding: the pool compacts it down into a low row
    and shrinks the window back to base — the straggler's text must
    survive the row move bit-exact, and follow-up requests still work."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    shorts = [(speech_like(0.5, seed=70 + i), "en") for i in range(5)]
    long_clip = (speech_like(22.0, seed=80), "en")
    clips = shorts + [long_clip]
    expected = [engine.transcribe(a, 16000, language=l)[0].text
                for a, l in clips]
    pool = DecodePool(engine, slots=2, segment=4, max_slots=8)
    try:
        results = _collect(pool, clips)
        # the straggler outlives the shorts by ~an order of magnitude of
        # decode steps, so the shrink path must have engaged by its end
        assert pool._move_fn is not None, "compaction never ran"
        assert pool.window < 8, f"window stuck at {pool.window}"
        # follow-up request through the shrunk window
        done = threading.Event()
        out = {}
        pool.submit(shorts[0][0], "en",
                    lambda t, ids: (out.setdefault("t", t), done.set()),
                    lambda e: (out.setdefault("t", e), done.set()))
        assert done.wait(timeout=300)
        assert out["t"] == expected[0]
    finally:
        pool.stop()
    for i, text in enumerate(expected):
        assert results[i][1] == text, f"clip {i}"


def test_pool_explicit_slots_stays_fixed(engine):
    """slots= without max_slots= pins the pool (measured configs must not
    silently grow); env-driven construction gets 4x headroom."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    pool = DecodePool(engine, slots=3, segment=4)
    try:
        assert pool.max_slots == 3 and pool._sizes == [3]
    finally:
        pool.stop()


def test_pool_under_mesh(tmp_path, monkeypatch):
    """ASR_CONTINUOUS_BATCHING composes with ASR_MESH_DP/TP: the pool's
    executables run against dp/tp-sharded params on a virtual 8-device
    mesh and still match the unsharded fused engine."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from qwen3_asr_tpu.runtime.lifecycle import _load_engine_sync
    from qwen3_asr_tpu.runtime.pool import DecodePool

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")
    plain = _load_engine_sync(ckpt)
    clips = [(speech_like(0.8, seed=31), "en"),
             (speech_like(1.4, seed=32), "en")]
    expected = [plain.transcribe(a, 16000, language=l)[0].text
                for a, l in clips]

    monkeypatch.setenv("ASR_MESH_DP", "4")
    monkeypatch.setenv("ASR_MESH_TP", "2")
    sharded = _load_engine_sync(ckpt)
    assert sharded.mesh is not None
    pool = DecodePool(sharded, slots=2, segment=4)
    try:
        results = _collect(pool, clips)
    finally:
        pool.stop()
    for i, text in enumerate(expected):
        assert results[i][1] == text


def test_pool_depth_covers_admission(engine):
    """depth must count a request from submit() until it is slotted —
    the first request's prefill COMPILE holds the admission window open
    for seconds, and the idle unload's depth>0 re-check races past a
    depth that momentarily reads 0 (regression: 'decode pool stopped'
    on the first pooled request under a short IDLE_TIMEOUT)."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    pool = DecodePool(engine, slots=2, segment=4)
    orig = pool._prefill_fn

    def slow_prefill(bucket_frames):
        time.sleep(1.5)    # simulate the first-request compile
        return orig(bucket_frames)

    pool._prefill_fn = slow_prefill
    done = threading.Event()
    out = {}
    try:
        pool.submit(speech_like(0.5, seed=90), "en",
                    lambda t, ids: (out.setdefault("t", t), done.set()),
                    lambda e: (out.setdefault("e", e), done.set()))
        # sample only while the slowed admission is guaranteed in
        # progress (the 1.5 s sleep), so a legitimate retire at the end
        # can't race the assertion
        t0 = time.time()
        while time.time() - t0 < 1.2:
            assert pool.depth >= 1, "in-flight request invisible to depth"
            time.sleep(0.05)
        assert done.wait(timeout=120)
        assert "t" in out, out.get("e")
    finally:
        pool.stop()


def test_pool_recovers_after_segment_failure(engine):
    """A failed decode segment must (a) error each in-flight request
    exactly once, (b) reallocate the donated KV cache, and (c) leave the
    pool serving follow-up requests normally."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    pool = DecodePool(engine, slots=2)
    try:
        real = pool._decode_segment_fn
        blew = threading.Event()

        def exploding(window):
            fn = real(window)

            def run(*args, **kw):
                if not blew.is_set():
                    blew.set()
                    raise RuntimeError("injected segment failure")
                return fn(*args, **kw)
            return run

        pool._decode_segment_fn = exploding
        errors = []
        done = threading.Event()
        pool.submit(speech_like(0.6, seed=70), "en",
                    lambda t, ids: (errors.append(("ok", t)), done.set()),
                    lambda e: (errors.append(("err", str(e))), done.set()))
        assert done.wait(timeout=120)
        time.sleep(0.5)  # would catch a straggling double callback
        assert errors == [("err", "injected segment failure")]

        # the pool must still work: cache reallocated, slots clean
        pool._decode_segment_fn = real
        out = {}
        ok = threading.Event()
        pool.submit(speech_like(0.6, seed=70), "en",
                    lambda t, ids: (out.setdefault("t", t), ok.set()),
                    lambda e: (out.setdefault("e", e), ok.set()))
        assert ok.wait(timeout=120)
        assert "t" in out, out.get("e")
        exp = engine.transcribe(speech_like(0.6, seed=70), 16000,
                                language="en")[0].text
        assert out["t"] == exp
    finally:
        pool.stop()


def test_pool_submit_after_stop_errors_immediately(engine):
    from qwen3_asr_tpu.runtime.pool import DecodePool
    pool = DecodePool(engine, slots=2)
    pool.stop()
    got = []
    pool.submit(speech_like(0.5, seed=71), "en",
                lambda t, ids: got.append(("ok", t)),
                lambda e: got.append(("err", str(e))))
    assert got == [("err", "decode pool stopped")]


def test_pool_retire_stops_at_pad_and_eos(engine):
    """pad_id is an alternate end-of-text on real Qwen3 checkpoints: the
    fused path (generate.py) terminates on eos OR pad, so the pool's
    host-side retire must truncate at whichever comes first — a pad first
    token (or mid-stream pad) must never reach detokenize."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    pool = DecodePool(engine, slots=1, segment=2)
    try:
        got = {}

        def claim(tag):
            from qwen3_asr_tpu.runtime.pool import _Request
            pool._owner[0] = _Request(
                np.zeros(1, np.float32), None,
                lambda text, ids: got.__setitem__(tag, (text, ids)),
                lambda e: got.__setitem__(tag, ("err", e)))

        pad, eos = pool.model.pad_id, pool.model.eos_id
        some = [t for t in range(32) if t not in (pad, eos)][:3]
        claim("mid_pad")
        pool._tokens[0] = [some[0], pad, some[1]]
        pool._retire(0)
        claim("first_pad")
        pool._tokens[0] = [pad, some[2]]
        pool._retire(0)
        claim("eos")
        pool._tokens[0] = [some[0], eos, some[1]]
        pool._retire(0)
        assert got["mid_pad"][1] == [some[0]]
        assert got["first_pad"][1] == []
        assert got["eos"][1] == [some[0]]
    finally:
        pool.stop()


def test_pool_submit_after_stop_fails_fast(engine):
    """A submit that loses the race with stop() must still resolve (the
    drive thread's final drain or the under-lock flag check), never hang."""
    from qwen3_asr_tpu.runtime.pool import DecodePool
    pool = DecodePool(engine, slots=1, segment=2)
    pool.stop()
    out = {}
    pool.submit(np.zeros(160, np.float32), None,
                lambda text, ids: out.setdefault("r", text),
                lambda e: out.setdefault("r", e))
    assert isinstance(out.get("r"), RuntimeError)
