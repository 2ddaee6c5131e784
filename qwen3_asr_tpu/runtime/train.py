"""Training step: LM cross-entropy fine-tuning of the ASR stack under pjit.

The reference is inference-only; this adds the standard fine-tune objective
(next-token CE on the transcript conditioned on audio) so the framework
covers training-scale deployment: the step jits over a DP×TP mesh with the
same param shardings serving uses — XLA emits the ICI collectives
(psum for grads over dp, all-reduce for tp partials) automatically.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.config import AsrConfig
from ..models.decoder import decoder_forward, embed_tokens, init_kv_cache, lm_logits
from ..models.encoder import encoder_forward
from ..ops.attention import AttnSpec


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def asr_loss(params: dict, cfg: AsrConfig, mel: jax.Array,
             feature_lens: jax.Array, prompt_ids: jax.Array,
             target_ids: jax.Array, target_mask: jax.Array,
             valid_from: jax.Array = None) -> jax.Array:
    """CE loss of target transcript tokens given audio.

    mel: [B, M, T_mel]; prompt_ids: [B, T_pre] text prefix (audio span is
    appended after it); target_ids/mask: [B, T_tgt] — include the prompt
    SUFFIX tokens (mask 0) ahead of the transcript so training conditions
    on the same [prefix, audio, suffix] layout inference decodes from;
    valid_from: [B] first real prompt index for left-padded prefixes
    (matches inference-time masking; None = attend everything).
    """
    dec = cfg.decoder
    audio_embeds, _ = encoder_forward(params["encoder"], cfg.encoder, mel,
                                      feature_lens)
    pre = embed_tokens(params["decoder"], dec, prompt_ids)
    tgt = embed_tokens(params["decoder"], dec, target_ids)
    inputs = jnp.concatenate([pre, audio_embeds.astype(pre.dtype), tgt],
                             axis=1)
    b, t, _ = inputs.shape
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    cache = init_kv_cache(dec, b, t, dtype=inputs.dtype)
    hidden, _ = decoder_forward(params["decoder"], dec, inputs, positions,
                                cache, jnp.int32(0),
                                AttnSpec(causal=True, valid_from=valid_from))

    # Predict target token i from position (prefix+audio+i-1).
    tgt_start = t - target_ids.shape[1]
    pred_hidden = hidden[:, tgt_start - 1:-1]
    logits = lm_logits(params["decoder"], dec, pred_hidden)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_logp = jnp.take_along_axis(logp, target_ids[..., None],
                                     axis=-1)[..., 0]
    mask_f = target_mask.astype(jnp.float32)
    return -(token_logp * mask_f).sum() / jnp.maximum(mask_f.sum(), 1.0)


def _unnormalized_loss(params, cfg, mel, feature_lens, prompt_ids,
                       target_ids, target_mask, valid_from):
    """(negative weighted logp sum, weight sum) — the pre-normalization
    pieces of asr_loss, so microbatch chunks can be accumulated exactly:
    grad(sum num_c / sum den_c) = sum grad(num_c) / sum den_c since the
    denominator (mask weight) is constant w.r.t. params."""
    den = jnp.maximum(target_mask.astype(jnp.float32).sum(), 0.0)
    num = asr_loss(params, cfg, mel, feature_lens, prompt_ids,
                   target_ids, target_mask, valid_from
                   ) * jnp.maximum(den, 1.0)
    return num, den


def make_train_step(cfg: AsrConfig, optimizer: optax.GradientTransformation,
                    microbatch: int = 0) -> Callable:
    """Build a jittable (state, batch) → (state, loss) step.

    microbatch > 0 splits the batch rows into chunks of that size and
    accumulates gradients over a fori_loop — peak activation memory drops
    by B/microbatch while the update stays EXACTLY the full-batch update
    (chunk numerators and mask weights are summed before the one
    normalization; zero-mask pad rows contribute zero to both). This is
    what lets the ~350M proof tier train on one 16 GB chip: the full-batch
    backward's activations alone exceed HBM there.
    """

    def step(state: TrainState, batch: dict) -> Tuple[TrainState, jax.Array]:
        if not microbatch:
            loss, grads = jax.value_and_grad(asr_loss)(
                state.params, cfg, batch["mel"], batch["feature_lens"],
                batch["prompt_ids"], batch["target_ids"],
                batch["target_mask"], batch.get("valid_from"))
        else:
            b = batch["mel"].shape[0]
            n_chunks = -(-b // microbatch)
            pad = n_chunks * microbatch - b

            def pad_rows(x):
                if pad == 0:
                    return x
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return jnp.pad(x, widths)

            mel = pad_rows(batch["mel"])
            flens = pad_rows(batch["feature_lens"])
            pids = pad_rows(batch["prompt_ids"])
            tids = pad_rows(batch["target_ids"])
            # pad rows carry zero mask -> zero contribution, exact.
            tmask = pad_rows(batch["target_mask"])
            vfrom = batch.get("valid_from")
            vfrom = pad_rows(vfrom) if vfrom is not None else None

            grad_fn = jax.value_and_grad(_unnormalized_loss, has_aux=True)
            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)

            def body(i, carry):
                acc, num, den = carry
                s = i * microbatch
                take = lambda x: jax.lax.dynamic_slice_in_dim(
                    x, s, microbatch, axis=0)
                (n, d), g = grad_fn(
                    state.params, cfg, take(mel), take(flens), take(pids),
                    take(tids), take(tmask),
                    take(vfrom) if vfrom is not None else None)
                acc = jax.tree.map(
                    lambda a, gi: a + gi.astype(jnp.float32), acc, g)
                return acc, num + n, den + d

            acc, num, den = jax.lax.fori_loop(
                0, n_chunks, body,
                (zero_grads, jnp.float32(0.0), jnp.float32(0.0)))
            scale = 1.0 / jnp.maximum(den, 1.0)
            grads = jax.tree.map(
                lambda a, p: (a * scale).astype(p.dtype),
                acc, state.params)
            loss = num * scale
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def init_train_state(params: dict, optimizer: optax.GradientTransformation
                     ) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.int32(0))
