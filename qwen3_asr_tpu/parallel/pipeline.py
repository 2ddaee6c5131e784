"""Pipeline parallelism over the stacked decoder-layer axis (DP × PP).

Net-new capability vs the reference (strictly single-GPU, SURVEY.md §2.3)
and the third mesh axis after dp/tp (parallel/mesh.py): the decoder's
stacked ``[L, ...]`` parameter layout (models/decoder.py) makes the layer
axis a natural shard axis — each pipeline stage holds ``L/pp`` contiguous
layers, and a GPipe microbatch schedule keeps every stage busy.

TPU-idiomatic mechanics (scaling-book recipe):

* ``shard_map`` over a ``("dp", "pp")`` mesh — per-device code sees its
  local ``[L/pp, ...]`` layer shard and its dp-local batch rows.
* Activations hop stage→stage with ``jax.lax.ppermute`` (a point-to-point
  ICI neighbor exchange, the cheapest collective on a TPU torus).
* The schedule is a ``lax.scan`` over ``n_micro + pp - 1`` ticks; at tick
  ``t`` stage ``s`` processes microbatch ``t - s`` (bubble fraction
  ``(pp-1)/(n_micro+pp-1)``). Per-row attention bounds (``valid_from``)
  travel WITH each microbatch through the ppermute, since different
  stages hold different microbatches at the same tick.
* Everything is differentiable (scan/ppermute/psum have transposes), so
  the same pipeline serves the training step: gradients for each layer
  shard land on its own stage, already placed for the optimizer update.

Training composes dp×pp here; tp composes with dp in the serving path
(parallel/mesh.py). The final hidden states are psum-broadcast from the
last stage (cheap at ASR activation sizes; a production pipeline would
keep them stage-local and run the loss on the last stage only).

Reference parity anchor: the layer math is the reference decoder's
(Qwen3: RMSNorm → QKV + QK-norm + RoPE → GQA attention → RMSNorm →
SwiGLU MLP), tested token-identical against models/decoder.decoder_forward.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import AsrConfig, DecoderConfig
from ..models.decoder import (apply_rope, embed_tokens, lm_logits, rms_norm,
                              rope_cos_sin)
from ..models.encoder import encoder_forward
from ..ops.attention import AttnSpec, attend_spec
from ..ops.quant import qdot


def make_mesh_pp(devices=None, dp: Optional[int] = None,
                 pp: Optional[int] = None) -> Mesh:
    """("dp", "pp") mesh: batch rides dp, the decoder layer stack rides pp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if pp is None and dp is None:
        pp = min(4, n)
        while n % pp:
            pp //= 2
        dp = n // pp
    elif pp is None:
        pp = n // dp
    elif dp is None:
        dp = n // pp
    assert dp * pp == n, f"dp({dp})×pp({pp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, pp)
    return Mesh(arr, axis_names=("dp", "pp"))


def decoder_param_specs_pp() -> dict:
    """Layer-stack leaves shard axis 0 (the L axis) on pp; everything else
    is replicated (embed/lm_head live on every stage — at ASR vocab sizes
    they are a small fraction of the stack)."""
    layer = {k: P("pp") for k in
             ("ln1", "ln2", "wq", "wk", "wv", "wo", "q_norm", "k_norm",
              "w_gate", "w_up", "w_down")}
    return {"embed": P(), "layers": layer, "final_norm": P(), "lm_head": P()}


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    """Place an {"encoder","decoder"} tree on a dp×pp mesh: decoder layer
    stacks sharded over pp (L must divide by pp), everything else
    replicated."""
    specs = decoder_param_specs_pp()
    rep = NamedSharding(mesh, P())
    pp = mesh.shape["pp"]

    def put(x, sharding):
        # Quantized leaves are {"q","s"} dicts (ops/quant.py storage): both
        # the values tensor and its scales keep the leading L axis, so both
        # take the layer-stack placement.
        if isinstance(x, dict) and set(x.keys()) == {"q", "s"}:
            return {"q": jax.device_put(x["q"], sharding),
                    "s": jax.device_put(x["s"], sharding)}
        return jax.device_put(x, sharding)

    def lead_dim(x) -> int:
        return (x["q"] if isinstance(x, dict) else x).shape[0]

    dec = {}
    for k, v in params["decoder"].items():
        if k == "layers":
            n_layers = {lead_dim(x) for x in v.values()}
            assert all(n % pp == 0 for n in n_layers), (
                f"decoder layer count {sorted(n_layers)} not divisible by "
                f"pp={pp} — pipeline stages must hold equal layer slices")
            dec[k] = {
                name: put(x, NamedSharding(mesh, specs["layers"][name]))
                for name, x in v.items()}
        else:
            dec[k] = put(v, rep)
    out = dict(params)
    out["decoder"] = dec
    if "encoder" in params:
        out["encoder"] = jax.tree.map(lambda x: jax.device_put(x, rep),
                                      params["encoder"])
    return out


def _pp_layer(cfg: DecoderConfig, hidden: jax.Array, lp: dict,
              cos: jax.Array, sin: jax.Array, valid_from: jax.Array
              ) -> jax.Array:
    """One decoder layer, cache-free (full-sequence causal attention) —
    the training-forward twin of models/decoder._layer."""
    b, t, _ = hidden.shape
    nq, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    x = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
    q = qdot(x, lp["wq"]).reshape(b, t, nq, d).transpose(0, 2, 1, 3)
    k = qdot(x, lp["wk"]).reshape(b, t, nkv, d).transpose(0, 2, 1, 3)
    v = qdot(x, lp["wv"]).reshape(b, t, nkv, d).transpose(0, 2, 1, 3)
    q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    spec = AttnSpec(causal=True, q_offset=0, valid_from=valid_from)
    attn = attend_spec(q, k.astype(q.dtype), v.astype(q.dtype), spec,
                       scale=d ** -0.5)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, nq * d)
    hidden = hidden + qdot(attn, lp["wo"])
    x = rms_norm(hidden, lp["ln2"], cfg.rms_norm_eps)
    gated = jax.nn.silu(qdot(x, lp["w_gate"])) * qdot(x, lp["w_up"])
    return hidden + qdot(gated, lp["w_down"])


def pipelined_decoder_hidden(cfg: DecoderConfig, layers: dict,
                             inputs_embeds: jax.Array,
                             valid_from: jax.Array, mesh: Mesh,
                             n_micro: int) -> jax.Array:
    """Run the decoder layer stack as a GPipe pipeline over the pp axis.

    inputs_embeds: [B, T, H] (positions are 0..T-1 for every row — the
    training layout); valid_from: [B]. Returns the pre-final-norm hidden
    states [B, T, H], identical to decoder_forward's layer stack.
    B must divide by n_micro, and B//n_micro by mesh dp.
    """
    b, t, _ = inputs_embeds.shape
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro {n_micro}"
    mb = b // n_micro
    # Training positions are 0..T-1 for EVERY row, so rope tables are
    # batch-invariant: [1, T, D], replicated (broadcast inside the layer).
    cos, sin = rope_cos_sin(jnp.arange(t)[None], cfg.head_dim,
                            cfg.rope_theta)

    mbs = inputs_embeds.reshape(n_micro, mb, t, -1)
    vfs = valid_from.reshape(n_micro, mb)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pp"), layers),
                  P(None, "dp"), P(None, "dp"), P(), P()),
        out_specs=P(None, "dp"))
    def run(layers_local, mbs_l, vfs_l, cos_l, sin_l):
        pp = jax.lax.axis_size("pp")
        idx = jax.lax.axis_index("pp")
        fwd = [(i, (i + 1) % pp) for i in range(pp)]

        def stage(x, vf):
            def body(h, lp):
                return _pp_layer(cfg, h, lp, cos_l, sin_l, vf), None
            h, _ = jax.lax.scan(body, x, layers_local)
            return h

        # The carries become pp-varying through the schedule; mark the
        # zero-initialized values accordingly for the vma type checker.
        pvary = lambda x: jax.lax.pcast(x, ("pp",), to="varying")  # noqa: E731
        buf0 = pvary(jnp.zeros_like(mbs_l[0]))
        vbuf0 = pvary(jnp.zeros_like(vfs_l[0]))
        outs0 = pvary(jnp.zeros_like(mbs_l))

        def tick(carry, s):
            buf, vbuf, outs = carry
            m_in = jnp.clip(s, 0, n_micro - 1)
            x = jnp.where(idx == 0, mbs_l[m_in], buf)
            vf = jnp.where(idx == 0, vfs_l[m_in], vbuf)
            y = stage(x, vf)
            o = jnp.clip(s - (pp - 1), 0, n_micro - 1)
            take = (idx == pp - 1) & (s >= pp - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, o, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, y, prev), o, 0)
            buf = jax.lax.ppermute(y, "pp", fwd)
            vbuf = jax.lax.ppermute(vf, "pp", fwd)
            return (buf, vbuf, outs), None

        (_, _, outs), _ = jax.lax.scan(
            tick, (buf0, vbuf0, outs0), jnp.arange(n_micro + pp - 1))
        # broadcast the last stage's collected outputs to every pp rank so
        # the (replicated-over-pp) loss head can consume them.
        return jax.lax.psum(
            jnp.where(idx == jnp.int32(pp - 1), outs, 0), "pp")

    outs = run(layers, mbs, vfs, cos, sin)
    return outs.reshape(b, t, -1)


def asr_loss_pp(params: dict, cfg: AsrConfig, mel, feature_lens, prompt_ids,
                target_ids, target_mask, mesh: Mesh, n_micro: int
                ) -> jax.Array:
    """runtime/train.asr_loss with the decoder layer stack pipelined.

    Positions are the standard training layout (0..T-1 per row); prompts
    are right-aligned (valid_from=0)."""
    dec = cfg.decoder
    audio_embeds, _ = encoder_forward(params["encoder"], cfg.encoder, mel,
                                      feature_lens)
    pre = embed_tokens(params["decoder"], dec, prompt_ids)
    tgt = embed_tokens(params["decoder"], dec, target_ids)
    inputs = jnp.concatenate([pre, audio_embeds.astype(pre.dtype), tgt],
                             axis=1)
    b = inputs.shape[0]
    hidden = pipelined_decoder_hidden(
        dec, params["decoder"]["layers"], inputs,
        jnp.zeros((b,), jnp.int32), mesh, n_micro)
    hidden = rms_norm(hidden, params["decoder"]["final_norm"],
                      dec.rms_norm_eps)
    tgt_start = inputs.shape[1] - target_ids.shape[1]
    logits = lm_logits(params["decoder"], dec, hidden[:, tgt_start - 1:-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_logp = jnp.take_along_axis(logp, target_ids[..., None],
                                     axis=-1)[..., 0]
    mask_f = target_mask.astype(jnp.float32)
    return -(token_logp * mask_f).sum() / jnp.maximum(mask_f.sum(), 1.0)


def make_pp_train_step(cfg: AsrConfig,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh, n_micro: int):
    """(state, batch) → (state, loss), decoder layers pipeline-parallel.

    Gradients flow back through the scan/ppermute schedule, so each
    stage's layer-shard grads are produced on that stage — the optimizer
    update runs sharded with zero re-placement."""
    from ..runtime.train import TrainState

    def step(state, batch):
        loss, grads = jax.value_and_grad(asr_loss_pp)(
            state.params, cfg, batch["mel"], batch["feature_lens"],
            batch["prompt_ids"], batch["target_ids"], batch["target_mask"],
            mesh, n_micro)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step
