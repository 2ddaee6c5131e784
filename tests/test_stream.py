"""WS prefix caching (runtime/stream.py): token parity with the fused path.

The session only changes WHAT IS RECOMPUTED per tick (cached encoder
blocks, persistent decoder KV, tail-segment prefill); the math is the
fused resume path pinned at the cap bucket, so outputs must be
token-identical across every tick pattern: growth, chunk-quantized trims,
clamp-max jumps (loud late audio), reset, and the degenerate
sample-exact-trim case (full rebuild per tick, never wrong).
"""
import numpy as np
import pytest

from tests.fixtures import write_tiny_checkpoint, load_tiny_model
from tests.util_audio import speech_like

CAP_S = 6.0
TICK_S = 0.45
SR = 16000


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import jax.numpy as jnp
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny")
    write_tiny_checkpoint(path)
    return TranscriptionEngine(load_tiny_model(path), dtype=jnp.float32)


def fused_reference(engine, window, language, prev, cap_s=CAP_S):
    """The parity target: fused resume decoding at the PINNED cap bucket."""
    frames, bucket_s = engine.bucket_frames(int(cap_s * SR))
    texts, id_lists = engine._run_bucket(
        [window.astype(np.float32)], frames, bucket_s, language,
        resume_tokens=list(prev))
    return texts[0], id_lists[0]


def run_paced(engine, session, audio, language, trim_quantum, cap_s=CAP_S):
    """Feed audio in 450 ms ticks with trim-quantized sliding windows and
    assert per-tick token parity against the fused path."""
    cap = int(cap_s * SR)
    tick = int(TICK_S * SR)
    window = np.zeros(0, np.float32)
    prev = []
    for off in range(0, len(audio), tick):
        window = np.concatenate([window, audio[off:off + tick]])
        if len(window) > cap:
            trim = len(window) - cap
            if trim_quantum > 1:
                trim = -(-trim // trim_quantum) * trim_quantum
            window = window[trim:]
        text, ids = session.update(window)
        exp_text, exp_ids = fused_reference(engine, window, language, prev,
                                            cap_s)
        assert ids == exp_ids, (
            f"tick@{off}: stream={ids} fused={exp_ids} "
            f"(stats={session.stats})")
        assert text == exp_text
        prev = exp_ids
    return session.stats


def test_stream_matches_fused_chunk_trim(engine):
    """The intended serving shape: chunk-quantized trims -> tail ticks
    dominate at the cap and every tick is token-identical."""
    session = engine.stream_session(CAP_S, "en")
    chunk_samples = session.chunk_frames * 160
    audio = speech_like(10.0, seed=7).astype(np.float32)
    stats = run_paced(engine, session, audio, "en", chunk_samples)
    assert stats["tail"] > 0, f"no tail ticks: {stats}"
    assert stats["full"] > 0   # growth + trim ticks


def test_stream_shrinking_window_trim_across_block_boundary(engine):
    """A chunk-quantized trim larger than the tick's append SHRINKS the
    window; when the shrink crosses an encoder-block boundary, the block
    beyond the new frontier must be re-encoded as (zero-padded) silence —
    not left holding tokens for trimmed-out audio. Cap 8.5 s pins the
    10 s bucket (5×2 s blocks on the tiny config); tick 1 puts loud audio
    in block 4 (8–8.4 s), tick 2's front-trim shrink moves the frontier
    back into block 3."""
    import jax.numpy as jnp
    cap_s = 8.5
    session = engine.stream_session(cap_s, "en")
    # Loud burst at stream 7.9–8.3 s: fully inside BOTH windows (so the
    # window max — hence the clamp — is identical across ticks and the
    # redo path stays quiet; the trim is hop-aligned so mel frames shift
    # without changing values). In w1 the burst reaches into block 4
    # (frames 800+); in w2 it sits in block 3 and block 4 is pure padding.
    stream = 0.1 * speech_like(9.0, seed=13).astype(np.float32)
    stream[int(7.9 * SR):int(8.3 * SR)] = \
        3.0 * speech_like(0.4, seed=14).astype(np.float32)
    w1 = stream[:int(8.4 * SR)]                       # ends in block 4
    _, ids1 = session.update(w1)
    w2 = stream[int(1.45 * SR):int(8.85 * SR)]        # 7.4 s: shrink past
    text, ids = session.update(w2)                    # the 8 s boundary
    assert session.stats["redo"] <= 1, session.stats  # tick 2 must not redo
    # paced-tick token parity with the fused path
    exp_text, exp_ids = fused_reference(engine, w2, "en", ids1, cap_s)
    assert ids == exp_ids, f"stream={ids} fused={exp_ids} ({session.stats})"
    # and the invariant directly: block 4 now encodes zero-padded silence
    lo, hi = session.spans[4]
    from qwen3_asr_tpu.audio.frontend import HOP_LENGTH, N_FFT
    padded = np.zeros(session.pinned_samples, np.float32)
    padded[:len(w2)] = w2
    halo = np.pad(padded, N_FFT // 2, mode="reflect")
    seg = halo[lo * HOP_LENGTH:(hi - 1) * HOP_LENGTH + N_FFT]
    enc = engine._stream_fn(("encode", hi - lo))
    want, _ = enc(engine.model.params, jnp.asarray(seg),
                  jnp.float32(session.clamp_max))
    assert session.blocks[4] is not None
    np.testing.assert_allclose(np.asarray(session.blocks[4]),
                               np.asarray(want), rtol=0, atol=0)


def test_stream_matches_fused_sample_exact_trim(engine):
    """Reference-style sample-exact trimming: every at-cap tick rebuilds
    (common prefix 0) — the degenerate case must stay correct."""
    session = engine.stream_session(CAP_S, "en")
    audio = speech_like(8.0, seed=8).astype(np.float32)
    run_paced(engine, session, audio, "en", trim_quantum=1)


def test_stream_clamp_max_jump(engine):
    """Quiet speech then a loud burst: the optimistic clamp guess fails,
    the tick redoes with the proven max, output parity holds."""
    session = engine.stream_session(CAP_S, "en")
    quiet = 0.05 * speech_like(3.0, seed=9).astype(np.float32)
    loud = 5.0 * speech_like(2.0, seed=10).astype(np.float32)
    audio = np.concatenate([quiet, loud])
    chunk_samples = session.chunk_frames * 160
    stats = run_paced(engine, session, audio, "en", chunk_samples)
    assert stats["redo"] > 0, f"clamp jump never redone: {stats}"


def test_stream_reset_and_empty(engine):
    session = engine.stream_session(CAP_S, "en")
    assert session.update(np.zeros(0, np.float32)) == ("", [])
    audio = speech_like(1.5, seed=11).astype(np.float32)
    text1, ids1 = session.update(audio)
    session.reset()
    text2, ids2 = session.update(audio)
    assert ids1 == ids2 and text1 == text2
    exp_text, exp_ids = fused_reference(engine, audio, "en", [])
    # post-reset ticks carry no prev tokens, like a fresh connection
    assert ids2 == exp_ids


def test_ws_prefix_cache_server_path(tmp_path, monkeypatch):
    """Full app with ASR_WS_PREFIX_CACHE=true: partials route through the
    per-connection session (tail ticks at the cap), flush/reset clear it,
    and the protocol shapes are unchanged."""
    import asyncio
    from aiohttp.test_utils import TestClient, TestServer

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("MODEL_ID", ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")
    monkeypatch.setenv("ASR_WS_PREFIX_CACHE", "true")
    from qwen3_asr_tpu.serving.server import build_app

    async def go():
        client = TestClient(TestServer(build_app()))
        await client.start_server()
        try:
            ws = await client.ws_connect(
                "/ws/transcribe?use_server_vad=false")
            hello = await ws.receive_json()
            assert hello["status"] == "connected"

            audio = speech_like(8.0, seed=21)   # > cap: forces trims
            pcm = (np.clip(audio * 32767, -32768, 32767)
                   .astype("<i2").tobytes())
            partials = 0
            for i in range(0, len(pcm), 14400):
                await ws.send_bytes(pcm[i:i + 14400])
                try:
                    msg = await asyncio.wait_for(ws.receive_json(),
                                                 timeout=120)
                    if msg.get("is_partial"):
                        partials += 1
                except asyncio.TimeoutError:
                    pass

            mgr = client.app["manager"]
            sess = getattr(mgr, "last_stream_session", None)
            assert sess is not None, "session never created"
            assert sess.stats["ticks"] > 0
            assert sess.stats["tail"] > 0, (
                f"no tail ticks at the cap: {sess.stats}")

            await ws.send_json({"action": "flush"})
            final = await asyncio.wait_for(ws.receive_json(), timeout=120)
            while not final.get("is_final"):
                final = await asyncio.wait_for(ws.receive_json(),
                                               timeout=120)
            assert "text" in final
            # flush cleared the session
            assert sess.prev_tokens == [] and sess.clamp_max is None

            # language change rebinds the session on the next tick
            await ws.send_json({"action": "config", "language": "zh"})
            ack = await asyncio.wait_for(ws.receive_json(), timeout=30)
            assert ack["status"] == "configured"
            for i in range(0, 2 * 14400, 14400):
                await ws.send_bytes(pcm[i:i + 14400])
                try:
                    await asyncio.wait_for(ws.receive_json(), timeout=120)
                except asyncio.TimeoutError:
                    pass
            sess2 = getattr(mgr, "last_stream_session", None)
            assert sess2 is not sess, "config(language) must rebuild"
            await ws.close()
        finally:
            await client.close()
    asyncio.new_event_loop().run_until_complete(go())


def test_stream_int4_engine_degrades_cache_to_fp8(engine):
    """Session caches cross jit boundaries, so an int4 engine degrades the
    SESSION cache to fp8 (same jax bug + fix as the decode pool)."""
    import jax.numpy as jnp
    old = engine.cache_dtype
    engine.cache_dtype = jnp.int4
    try:
        session = engine.stream_session(CAP_S, "en")
        assert session.cache_dtype == jnp.float8_e4m3fn
        assert session.cache.k.dtype == jnp.float8_e4m3fn
        assert session.cache.k_scale is None
    finally:
        engine.cache_dtype = old


def test_stream_session_binds_fast_engine(tmp_path, monkeypatch):
    """Under DUAL_MODEL, WS partials run on the fast engine — the prefix
    cache session must bind to IT, not the main engine."""
    import asyncio
    from aiohttp.test_utils import TestClient, TestServer

    main_ckpt = str(tmp_path / "main")
    fast_ckpt = str(tmp_path / "fast")
    write_tiny_checkpoint(main_ckpt)
    write_tiny_checkpoint(fast_ckpt, seed=5)
    monkeypatch.setenv("MODEL_ID", main_ckpt)
    monkeypatch.setenv("FAST_MODEL_ID", fast_ckpt)
    monkeypatch.setenv("DUAL_MODEL", "true")
    monkeypatch.setenv("SKIP_WARMUP", "true")
    monkeypatch.setenv("ASR_WS_PREFIX_CACHE", "true")
    from qwen3_asr_tpu.serving.server import build_app

    async def go():
        client = TestClient(TestServer(build_app()))
        await client.start_server()
        try:
            ws = await client.ws_connect(
                "/ws/transcribe?use_server_vad=false")
            await ws.receive_json()
            pcm = (np.clip(speech_like(1.0, seed=30) * 32767, -32768, 32767)
                   .astype("<i2").tobytes())
            await ws.send_bytes(pcm)
            try:
                await asyncio.wait_for(ws.receive_json(), timeout=120)
            except asyncio.TimeoutError:
                pass
            mgr = client.app["manager"]
            sess = getattr(mgr, "last_stream_session", None)
            assert sess is not None
            assert mgr.fast_engine is not None
            assert sess.engine is mgr.fast_engine
            await ws.close()
        finally:
            await client.close()
    asyncio.new_event_loop().run_until_complete(go())


def test_stream_under_mesh(tmp_path, monkeypatch):
    """ASR_WS_PREFIX_CACHE composes with ASR_MESH_DP/TP: session ticks
    against dp/tp-sharded params on the virtual 8-device mesh match the
    unsharded fused path."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from qwen3_asr_tpu.runtime.lifecycle import _load_engine_sync

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")
    plain = _load_engine_sync(ckpt)
    audio = speech_like(2.0, seed=50).astype(np.float32)
    frames, bucket_s = plain.bucket_frames(int(CAP_S * SR))
    exp_texts, exp_ids = plain._run_bucket([audio], frames, bucket_s, "en",
                                           resume_tokens=[])

    monkeypatch.setenv("ASR_MESH_DP", "4")
    monkeypatch.setenv("ASR_MESH_TP", "2")
    sharded = _load_engine_sync(ckpt)
    assert sharded.mesh is not None
    session = sharded.stream_session(CAP_S, "en")
    text, ids = session.update(audio)
    assert ids == exp_ids[0] and text == exp_texts[0]
    # a second (tail-path) tick still matches
    audio2 = np.concatenate([audio, speech_like(0.45, seed=51)
                             .astype(np.float32)])
    text2, ids2 = session.update(audio2)
    exp2_texts, exp2_ids = plain._run_bucket([audio2], frames, bucket_s,
                                             "en", resume_tokens=exp_ids[0])
    assert ids2 == exp2_ids[0] and text2 == exp2_texts[0]


def test_stream_block_boundary_halo(engine):
    """Windows whose frontier lands within N_FFT/2 samples of a block
    boundary: STFT frames of the NEXT block read the new audio through
    their left halo, and frames of the PREVIOUS block read it through
    their right halo — both must be recomputed (regression: asymmetric
    halo handling left the next block's first frame stale)."""
    session = engine.stream_session(CAP_S, "en")
    block_samples = (session.spans[0][1] - session.spans[0][0]) * 160
    audio = speech_like(6.0, seed=61).astype(np.float32)
    prev = []
    # land the frontier just below, exactly at, and just above the first
    # block boundary (and straddle the second too)
    lengths = [block_samples - 150, block_samples - 20, block_samples,
               block_samples + 90, block_samples + 7000,
               2 * block_samples - 60, 2 * block_samples + 30]
    for n in lengths:
        window = audio[:n]
        text, ids = session.update(window)
        exp_text, exp_ids = fused_reference(engine, window, "en", prev)
        assert ids == exp_ids, (
            f"frontier at {n} (boundary {block_samples}): "
            f"stream={ids} fused={exp_ids} stats={session.stats}")
        prev = exp_ids
