"""Training-path tests: loss decreases, grads flow through both towers."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tests.fixtures import load_tiny_model, write_tiny_checkpoint
from tests.util_audio import speech_like
from qwen3_asr_tpu.runtime.train import (
    asr_loss,
    init_train_state,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny")
    write_tiny_checkpoint(path)
    model = load_tiny_model(path)
    rng = np.random.default_rng(0)
    b, mel_frames = 2, 100
    batch = {
        "mel": rng.standard_normal((b, 32, mel_frames)).astype(np.float32),
        "feature_lens": np.full((b,), mel_frames, np.int32),
        "prompt_ids": np.ones((b, 4), np.int32),
        "target_ids": rng.integers(1, 400, (b, 6)).astype(np.int32),
        "target_mask": np.ones((b, 6), np.int32),
    }
    return model, {k: jnp.asarray(v) for k, v in batch.items()}


def test_loss_finite(setup):
    model, batch = setup
    loss = asr_loss(model.params, model.cfg, batch["mel"],
                    batch["feature_lens"], batch["prompt_ids"],
                    batch["target_ids"], batch["target_mask"])
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_training_reduces_loss(setup):
    """20 steps on one batch must overfit it (loss drops substantially)."""
    model, batch = setup
    optimizer = optax.adamw(3e-3)
    state = init_train_state(model.params, optimizer)
    step = jax.jit(make_train_step(model.cfg, optimizer))

    losses = []
    for _ in range(20):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_microbatch_step_matches_full_batch(setup):
    """Gradient-accumulation chunks must reproduce the FULL-batch update
    exactly (chunk numerators/denominators summed before the one
    normalization) — including when the batch needs pad rows. This is the
    memory lever that fits the ~350M proof tier on one chip; exactness is
    what lets its results stand in for full-batch training."""
    model, batch = setup
    # SGD: the update is linear in the gradient, so param agreement IS
    # gradient agreement (adam's g/(sqrt(v)+eps) amplifies float-order
    # noise near zero into sign flips and would test the optimizer, not
    # the accumulation).
    optimizer = optax.sgd(1e-2)
    state0 = init_train_state(model.params, optimizer)
    full = jax.jit(make_train_step(model.cfg, optimizer))
    for micro in (1, 2):  # 2 rows: micro=1 -> 2 chunks; micro=2 -> 1 chunk
        acc = jax.jit(make_train_step(model.cfg, optimizer,
                                      microbatch=micro))
        sf, lf = full(state0, batch)
        sa, la = acc(state0, batch)
        assert np.allclose(float(lf), float(la), rtol=1e-5), (micro, lf, la)
        for pf, pa in zip(jax.tree.leaves(sf.params),
                          jax.tree.leaves(sa.params)):
            np.testing.assert_allclose(np.asarray(pf), np.asarray(pa),
                                       rtol=2e-4, atol=2e-6)


def test_microbatch_pad_rows_are_inert(setup):
    """A batch whose rows don't divide the chunk size gets zero-mask pad
    rows — the update must equal the unpadded full-batch update."""
    model, batch = setup  # b=2; micro=3 pads one row
    optimizer = optax.sgd(1e-2)
    state0 = init_train_state(model.params, optimizer)
    full = jax.jit(make_train_step(model.cfg, optimizer))
    acc = jax.jit(make_train_step(model.cfg, optimizer, microbatch=3))
    sf, lf = full(state0, batch)
    sa, la = acc(state0, batch)
    assert np.allclose(float(lf), float(la), rtol=1e-5)
    for pf, pa in zip(jax.tree.leaves(sf.params), jax.tree.leaves(sa.params)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pa),
                                   rtol=2e-4, atol=2e-6)


def test_grads_reach_both_towers(setup):
    model, batch = setup
    grads = jax.grad(asr_loss)(model.params, model.cfg, batch["mel"],
                               batch["feature_lens"], batch["prompt_ids"],
                               batch["target_ids"], batch["target_mask"])
    enc_norm = sum(float(jnp.sum(jnp.abs(g)))
                   for g in jax.tree.leaves(grads["encoder"]))
    dec_norm = sum(float(jnp.sum(jnp.abs(g)))
                   for g in jax.tree.leaves(grads["decoder"]))
    assert enc_norm > 0, "no gradient reached the audio encoder"
    assert dec_norm > 0, "no gradient reached the decoder"


def test_finetune_make_batch(tmp_path):
    """The CLI's batch builder produces consistent shapes from a manifest."""
    from qwen3_asr_tpu.audio.codec import encode_wav
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine
    from qwen3_asr_tpu.tools.finetune import make_batch

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    engine = TranscriptionEngine(load_tiny_model(ckpt))

    wav = tmp_path / "a.wav"
    wav.write_bytes(encode_wav(speech_like(1.0, seed=0), 16000))
    items = [{"wav": str(wav), "text": "hello world"},
             {"wav": str(wav), "text": "a longer transcript here"}]
    batch = make_batch(engine, items, bucket_s=1.0)
    assert batch["mel"].shape[0] == 2
    assert batch["target_ids"].shape == batch["target_mask"].shape
    assert batch["target_mask"][0].sum() < batch["target_mask"][1].sum()
