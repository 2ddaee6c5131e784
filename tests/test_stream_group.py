"""Grouped prefix-cache streaming (runtime/stream_group.py): token parity.

Members of a StreamGroup share one pooled KV cache and one batched tick
dispatch per cadence, but every member's output must stay token-identical
to a solo StreamSession — which tests/test_stream.py holds identical to
the fused resume path. These tests therefore assert directly against the
fused reference, across concurrent members, staggered joins/leaves, slot
reuse, clamp-max redo, and mixed languages.
"""
import numpy as np
import pytest

from tests.fixtures import write_tiny_checkpoint, load_tiny_model
from tests.util_audio import speech_like

CAP_S = 6.0
TICK_S = 0.45
SR = 16000
SLOTS = 4


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import jax.numpy as jnp
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny")
    write_tiny_checkpoint(path)
    return TranscriptionEngine(load_tiny_model(path), dtype=jnp.float32)


def fused_reference(engine, window, language, prev, cap_s=CAP_S):
    frames, bucket_s = engine.bucket_frames(int(cap_s * SR))
    texts, id_lists = engine._run_bucket(
        [window.astype(np.float32)], frames, bucket_s, language,
        resume_tokens=list(prev))
    return texts[0], id_lists[0]


class PacedStream:
    """One member's client-side window state under chunk-quantized trims."""

    def __init__(self, audio, language="en"):
        self.audio = audio
        self.language = language
        self.window = np.zeros(0, np.float32)
        self.off = 0
        self.prev = []

    def advance(self, tick_samples, cap_samples, trim_quantum):
        if self.off >= len(self.audio):
            return None
        self.window = np.concatenate(
            [self.window, self.audio[self.off:self.off + tick_samples]])
        self.off += tick_samples
        if len(self.window) > cap_samples:
            trim = len(self.window) - cap_samples
            if trim_quantum > 1:
                trim = -(-trim // trim_quantum) * trim_quantum
            self.window = self.window[trim:]
        return self.window


def pace_group(engine, group, pairs, cap_s=CAP_S, assert_parity=True):
    """Run interleaved ticks: every cadence, all (member, stream) pairs
    with remaining audio tick TOGETHER in one group.tick call, and each
    result is checked against the fused reference."""
    cap = int(cap_s * SR)
    tick = int(TICK_S * SR)
    quantum = group.plan.chunk_frames * 160
    while True:
        requests, live_pairs = [], []
        for member, stream in pairs:
            w = stream.advance(tick, cap, quantum)
            if w is not None:
                requests.append((member, w))
                live_pairs.append((member, stream))
        if not requests:
            break
        results = group.tick(requests)
        if not assert_parity:
            for (member, stream), (text, ids) in zip(live_pairs, results):
                stream.prev = ids
            continue
        for (member, stream), (text, ids) in zip(live_pairs, results):
            exp_text, exp_ids = fused_reference(
                engine, stream.window, stream.language, stream.prev, cap_s)
            assert ids == exp_ids, (
                f"member row {member.row}: group={ids} fused={exp_ids} "
                f"(stats={member.stats})")
            assert text == exp_text
            stream.prev = exp_ids


def test_group_two_members_paced_parity(engine):
    """Two concurrent members, one batched dispatch per cadence, every
    tick token-identical to the fused path; tail ticks dominate at cap."""
    from qwen3_asr_tpu.runtime.stream_group import StreamGroup
    group = StreamGroup(engine, CAP_S, SLOTS)
    m1 = group.attach_or_raise("en")
    m2 = group.attach_or_raise("en")
    s1 = PacedStream(speech_like(9.0, seed=31).astype(np.float32))
    s2 = PacedStream(0.7 * speech_like(8.0, seed=32).astype(np.float32))
    pace_group(engine, group, [(m1, s1), (m2, s2)])
    assert m1.stats["tail"] > 0, m1.stats
    assert m2.stats["ticks"] > 0


def test_group_staggered_join_and_leave(engine):
    """A member joining mid-stream forces one full-prefill group tick and
    then parity holds for both; a leaver frees its slot for reuse."""
    from qwen3_asr_tpu.runtime.stream_group import StreamGroup
    group = StreamGroup(engine, CAP_S, SLOTS)
    m1 = group.attach_or_raise("en")
    s1 = PacedStream(speech_like(8.0, seed=33).astype(np.float32))

    cap, tick = int(CAP_S * SR), int(TICK_S * SR)
    quantum = group.plan.chunk_frames * 160
    # m1 streams alone for 5 cadences
    for _ in range(5):
        w = s1.advance(tick, cap, quantum)
        (text, ids), = group.tick([(m1, w)])
        exp_text, exp_ids = fused_reference(engine, s1.window, "en", s1.prev)
        assert ids == exp_ids
        s1.prev = exp_ids

    # m2 joins; both tick together to the end of their audio
    m2 = group.attach_or_raise("en")
    row2 = m2.row
    s2 = PacedStream(speech_like(4.0, seed=34).astype(np.float32))
    pace_group(engine, group, [(m1, s1), (m2, s2)])

    # m2 leaves; its slot is reusable and m1 keeps ticking with parity
    m2.release()
    assert group.members[row2] is None
    m3 = group.attach_or_raise("en")
    assert m3.row == row2
    s1b = PacedStream(speech_like(2.0, seed=35).astype(np.float32))
    s3 = PacedStream(speech_like(2.0, seed=36).astype(np.float32))
    s1b.prev = s1.prev
    s1b.window = s1.window
    pace_group(engine, group, [(m1, s1b), (m3, s3)])


def test_group_lone_member_update(engine):
    """The update() convenience (lone session, tests) runs a 1-request
    group tick with full parity."""
    from qwen3_asr_tpu.runtime.stream_group import StreamGroup
    group = StreamGroup(engine, CAP_S, SLOTS)
    m = group.attach_or_raise("en")
    audio = speech_like(7.0, seed=37).astype(np.float32)
    cap, tick = int(CAP_S * SR), int(TICK_S * SR)
    quantum = group.plan.chunk_frames * 160
    s = PacedStream(audio)
    while True:
        w = s.advance(tick, cap, quantum)
        if w is None:
            break
        text, ids = m.update(w)
        exp_text, exp_ids = fused_reference(engine, s.window, "en", s.prev)
        assert ids == exp_ids and text == exp_text
        s.prev = exp_ids
    assert m.stats["tail"] > 0, m.stats


def test_group_clamp_jump_redo(engine):
    """A quiet member hit by a loud burst refutes its optimistic clamp:
    the group redo keeps BOTH members token-exact."""
    from qwen3_asr_tpu.runtime.stream_group import StreamGroup
    group = StreamGroup(engine, CAP_S, SLOTS)
    m1 = group.attach_or_raise("en")
    m2 = group.attach_or_raise("en")
    quiet = 0.05 * speech_like(3.0, seed=38).astype(np.float32)
    loud = 5.0 * speech_like(2.0, seed=39).astype(np.float32)
    s1 = PacedStream(np.concatenate([quiet, loud]))
    s2 = PacedStream(0.5 * speech_like(5.0, seed=40).astype(np.float32))
    pace_group(engine, group, [(m1, s1), (m2, s2)])
    assert m1.stats["redo"] > 0, f"clamp jump never redone: {m1.stats}"


def test_group_mixed_languages(engine):
    """Per-row prompt prefixes: members with different language hints
    share one dispatch and each keeps its own fused-path parity."""
    from qwen3_asr_tpu.runtime.stream_group import StreamGroup
    group = StreamGroup(engine, CAP_S, SLOTS)
    m_en = group.attach_or_raise("en")
    m_zh = group.attach_or_raise("zh")
    m_auto = group.attach_or_raise(None)
    pairs = [
        (m_en, PacedStream(speech_like(3.0, seed=41).astype(np.float32),
                           "en")),
        (m_zh, PacedStream(speech_like(3.0, seed=42).astype(np.float32),
                           "zh")),
        (m_auto, PacedStream(speech_like(3.0, seed=43).astype(np.float32),
                             None)),
    ]
    pace_group(engine, group, pairs)


def test_group_reset_matches_fresh(engine):
    """reset() behaves like a fresh connection: no prev tokens, full
    rebuild, same output as a never-used member."""
    from qwen3_asr_tpu.runtime.stream_group import StreamGroup
    group = StreamGroup(engine, CAP_S, SLOTS)
    m = group.attach_or_raise("en")
    audio = speech_like(1.5, seed=44).astype(np.float32)
    _, ids1 = m.update(audio)
    m.reset()
    text2, ids2 = m.update(audio)
    assert ids1 == ids2
    _, exp_ids = fused_reference(engine, audio, "en", [])
    assert ids2 == exp_ids


def test_grouped_ws_server_path(tmp_path, monkeypatch):
    """Full app with BOTH flags: two concurrent WS connections join one
    pooled-cache group, their partials coalesce through GroupTickBatcher,
    and protocol shapes/finals are unchanged."""
    import asyncio
    from aiohttp.test_utils import TestClient, TestServer

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("MODEL_ID", ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")
    monkeypatch.setenv("ASR_WS_PREFIX_CACHE", "true")
    monkeypatch.setenv("ASR_WS_TICK_BATCH", "true")
    monkeypatch.setenv("ASR_WS_GROUP_SLOTS", "4")
    from qwen3_asr_tpu.serving.server import build_app

    def pcm(audio):
        return (np.clip(audio * 32767, -32768, 32767)
                .astype("<i2").tobytes())

    async def go():
        client = TestClient(TestServer(build_app()))
        await client.start_server()
        try:
            ws1 = await client.ws_connect(
                "/ws/transcribe?use_server_vad=false")
            ws2 = await client.ws_connect(
                "/ws/transcribe?use_server_vad=false")
            for ws in (ws1, ws2):
                hello = await ws.receive_json()
                assert hello["status"] == "connected"

            p1 = pcm(speech_like(4.0, seed=51))
            p2 = pcm(0.7 * speech_like(4.0, seed=52))

            async def feed(ws, payload):
                partials = 0
                for i in range(0, len(payload), 14400):
                    await ws.send_bytes(payload[i:i + 14400])
                    try:
                        msg = await asyncio.wait_for(ws.receive_json(),
                                                     timeout=120)
                        if msg.get("is_partial"):
                            partials += 1
                    except asyncio.TimeoutError:
                        pass
                return partials

            got1, got2 = await asyncio.gather(feed(ws1, p1), feed(ws2, p2))
            assert got1 > 0 and got2 > 0

            # both connections share ONE pooled-cache group
            mgr = client.app["manager"]
            eng = mgr.fast_engine or mgr.engine
            groups = [g for gs in eng._stream_groups.values() for g in gs]
            assert len(groups) == 1, groups
            assert groups[0].live_members == 2
            member = mgr.last_stream_session
            assert getattr(member, "group", None) is groups[0]
            assert member.stats["ticks"] > 0

            for ws in (ws1, ws2):
                await ws.send_json({"action": "flush"})
                final = await asyncio.wait_for(ws.receive_json(),
                                               timeout=120)
                while not final.get("is_final"):
                    final = await asyncio.wait_for(ws.receive_json(),
                                                   timeout=120)
                assert "text" in final
                await ws.close()
            # closed connections detached; the emptied group was dropped
            await asyncio.sleep(0.1)
            groups = [g for gs in eng._stream_groups.values() for g in gs]
            assert groups == [] or groups[0].live_members == 0
        finally:
            await client.close()

    asyncio.run(go())


def test_engine_group_registry(engine):
    """stream_group_member fills slots, opens a second group when full,
    and drops emptied groups (frees the pooled cache)."""
    members = [engine.stream_group_member(CAP_S, "en", slots=2)
               for _ in range(3)]
    key = engine.bucket_frames(int(CAP_S * SR))
    groups = engine._stream_groups[key]
    assert len(groups) == 2
    assert members[0].group is members[1].group
    assert members[2].group is not members[0].group

    members[2].release()
    assert len(engine._stream_groups[key]) == 1
    members[0].release()
    members[1].release()
    assert engine._stream_groups[key] == []
    # releases also sever engine refs (serving rebind contract)
    assert members[0].engine is None
