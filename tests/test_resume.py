"""Resume decoding: must reproduce plain greedy exactly, in fewer steps."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.models.config import DecoderConfig
from qwen3_asr_tpu.models.decoder import init_decoder_params
from qwen3_asr_tpu.runtime.generate import greedy_generate
from qwen3_asr_tpu.runtime.resume import resume_generate

CFG = DecoderConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=8, tie_word_embeddings=True)
EOS, PAD = 100, 101
MAX_NEW = 12


@pytest.fixture(scope="module")
def params():
    return init_decoder_params(CFG, jax.random.PRNGKey(0))


def _embeds(seed, t=10):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (1, t, CFG.hidden_size), jnp.float32)


def _greedy(params, embeds):
    vf = jnp.zeros((1,), jnp.int32)
    return greedy_generate(params, CFG, embeds, vf, max_new=MAX_NEW,
                           eos_id=EOS, pad_id=PAD, cache_dtype=jnp.float32)


def _resume(params, embeds, prev_tokens, prev_len):
    vf = jnp.zeros((1,), jnp.int32)
    return resume_generate(params, CFG, embeds, vf,
                           jnp.asarray(prev_tokens, jnp.int32)[None, :],
                           jnp.asarray([prev_len], jnp.int32),
                           max_new=MAX_NEW, eos_id=EOS, pad_id=PAD,
                           cache_dtype=jnp.float32)


def _strip(tokens):
    return [t for t in np.asarray(tokens)[0].tolist() if t != PAD]


def test_resume_with_own_output_minimal_steps(params):
    """prev = own greedy output ⇒ same tokens, near-zero new decode steps."""
    embeds = _embeds(1)
    ref = _greedy(params, embeds)
    prev = np.asarray(ref.tokens)[0]
    res = _resume(params, embeds, prev, int(ref.lengths[0]))
    assert _strip(res.tokens) == _strip(ref.tokens)
    assert int(res.steps) <= 2  # only the continuation probe


def test_resume_with_empty_prev_equals_greedy(params):
    embeds = _embeds(2)
    ref = _greedy(params, embeds)
    prev = np.full(MAX_NEW, PAD, np.int32)
    res = _resume(params, embeds, prev, 0)
    assert _strip(res.tokens) == _strip(ref.tokens)


def test_resume_with_garbage_prev_equals_greedy(params):
    embeds = _embeds(3)
    ref = _greedy(params, embeds)
    rng = np.random.default_rng(0)
    prev = rng.integers(0, 99, MAX_NEW).astype(np.int32)
    res = _resume(params, embeds, prev, MAX_NEW)
    assert _strip(res.tokens) == _strip(ref.tokens)


def test_resume_with_partially_matching_prev(params):
    """prev from DIFFERENT audio: accepted prefix + correct divergent tail."""
    embeds_a, embeds_b = _embeds(4), _embeds(5)
    prev = np.asarray(_greedy(params, embeds_a).tokens)[0]
    ref_b = _greedy(params, embeds_b)
    res = _resume(params, embeds_b, prev, int(_greedy(params, embeds_a).lengths[0]))
    assert _strip(res.tokens) == _strip(ref_b.tokens)


def test_resume_streaming_scenario(params):
    """Simulated 3-tick stream: each tick reuses the last tick's tokens and
    must equal from-scratch greedy at every tick."""
    prev = np.full(MAX_NEW, PAD, np.int32)
    prev_len = 0
    for seed in (10, 11, 12):
        embeds = _embeds(seed, t=8 + seed % 3)
        ref = _greedy(params, embeds)
        res = _resume(params, embeds, prev, prev_len)
        assert _strip(res.tokens) == _strip(ref.tokens), seed
        prev = np.asarray(res.tokens)[0]
        prev_len = int(res.lengths[0])


def test_resume_batch_rows_match_per_row_greedy(params):
    """Batched cross-session resume: 4 rows with different windows and
    different self-drafts (own output / empty / garbage / other-stream
    tokens) in ONE call — every row must equal ITS OWN greedy decode."""
    from qwen3_asr_tpu.runtime.resume import resume_generate_batch

    seeds = (21, 22, 23, 24)
    embeds_rows = [_embeds(s) for s in seeds]
    refs = [_greedy(params, e) for e in embeds_rows]

    prev = np.full((4, MAX_NEW), PAD, np.int32)
    prev_len = np.zeros(4, np.int32)
    # row 0: its own previous output (steady-state tick)
    prev[0] = np.asarray(refs[0].tokens)[0]
    prev_len[0] = int(refs[0].lengths[0])
    # row 1: empty draft (first tick)
    # row 2: garbage draft
    prev[2] = np.random.default_rng(7).integers(0, 99, MAX_NEW)
    prev_len[2] = MAX_NEW
    # row 3: another stream's output (partial/no match)
    prev[3] = np.asarray(refs[0].tokens)[0]
    prev_len[3] = int(refs[0].lengths[0])

    batch = resume_generate_batch(
        params, CFG, jnp.concatenate(embeds_rows, axis=0),
        jnp.zeros((4,), jnp.int32), jnp.asarray(prev),
        jnp.asarray(prev_len), max_new=MAX_NEW, eos_id=EOS, pad_id=PAD,
        cache_dtype=jnp.float32)

    for r in range(4):
        got = [t for t in np.asarray(batch.tokens)[r].tolist() if t != PAD]
        assert got == _strip(refs[r].tokens), f"row {r}"
        assert int(batch.lengths[r]) == int(refs[r].lengths[0]), f"row {r}"


def test_resume_batch_accepted_rows_take_few_steps(params):
    """Rows resuming their own output keep the few-step property in batch:
    steps counts continuation probes past the accepted prefix, so an
    all-steady-state batch stays ≤2 even though rows share the loop."""
    from qwen3_asr_tpu.runtime.resume import resume_generate_batch

    embeds_rows = [_embeds(s) for s in (31, 32)]
    refs = [_greedy(params, e) for e in embeds_rows]
    prev = np.stack([np.asarray(r.tokens)[0] for r in refs])
    prev_len = np.asarray([int(r.lengths[0]) for r in refs], np.int32)
    batch = resume_generate_batch(
        params, CFG, jnp.concatenate(embeds_rows, axis=0),
        jnp.zeros((2,), jnp.int32), jnp.asarray(prev),
        jnp.asarray(prev_len), max_new=MAX_NEW, eos_id=EOS, pad_id=PAD,
        cache_dtype=jnp.float32)
    for r in range(2):
        got = [t for t in np.asarray(batch.tokens)[r].tolist() if t != PAD]
        assert got == _strip(refs[r].tokens)
        assert int(batch.steps[r]) <= 2


def test_resume_batch_matches_batch1_resume(params):
    """The batched kernel at B=1 agrees with the shipping batch-1 resume."""
    from qwen3_asr_tpu.runtime.resume import resume_generate_batch

    embeds = _embeds(41)
    prev = np.asarray(_greedy(params, _embeds(42)).tokens)[0]
    a = _resume(params, embeds, prev, MAX_NEW)
    b = resume_generate_batch(
        params, CFG, embeds, jnp.zeros((1,), jnp.int32),
        jnp.asarray(prev, jnp.int32)[None, :],
        jnp.asarray([MAX_NEW], jnp.int32), max_new=MAX_NEW, eos_id=EOS,
        pad_id=PAD, cache_dtype=jnp.float32)
    assert _strip(a.tokens) == _strip(b.tokens)
    assert int(a.lengths[0]) == int(b.lengths[0])


def test_engine_batched_ticks_match_solo(tmp_path):
    """Engine cross-session tick batch (_run_bucket resume_rows=...): every
    row — steady-state draft, no draft, garbage draft — must produce the
    same text and token ids as that clip's solo transcribe()."""
    import sys
    sys.path.insert(0, "tests")
    from tests.fixtures import load_tiny_model, write_tiny_checkpoint
    from tests.util_audio import speech_like
    from qwen3_asr_tpu.models.asr import normalize_language
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    engine = TranscriptionEngine(load_tiny_model(ckpt))
    clips = [speech_like(1.0, seed=s) for s in (1, 2, 3, 4)]
    refs = [engine.transcribe(c, 16000, language="en") for c in clips]

    lang, _ = normalize_language("en")
    bucket_frames, bucket_s = engine.bucket_frames(len(clips[0]))
    resume_rows = [refs[0][0].token_ids,          # own previous output
                   None,                          # first tick, no draft
                   [5, 9, 2, 7],                  # garbage draft
                   refs[0][0].token_ids]          # other stream's tokens
    texts, id_lists = engine._run_bucket(clips, bucket_frames, bucket_s,
                                         lang, resume_rows=resume_rows)
    assert texts == [r[0].text for r in refs]
    assert id_lists == [r[0].token_ids for r in refs]


def test_engine_resume_equals_plain(tmp_path):
    """Engine path: resume_tokens (even garbage) never changes the output."""
    import sys
    sys.path.insert(0, "tests")
    from tests.fixtures import load_tiny_model, write_tiny_checkpoint
    from tests.util_audio import speech_like
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    engine = TranscriptionEngine(load_tiny_model(ckpt))
    clip = speech_like(1.0, seed=3)
    ref = engine.transcribe(clip, 16000, language="en")

    out = engine.transcribe(clip, 16000, language="en",
                            resume_tokens=[5, 9, 2, 7])
    assert [r.text for r in out] == [r.text for r in ref]

    # and with its own previous output (the streaming steady state)
    out2 = engine.transcribe(clip, 16000, language="en",
                             resume_tokens=ref[0].token_ids)
    assert [r.text for r in out2] == [r.text for r in ref]
