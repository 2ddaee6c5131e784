"""Pipeline parallelism (dp×pp mesh): the GPipe layer-stack schedule must
be numerically identical to the sequential decoder, and the pp training
step must match the single-device training step (8 virtual CPU devices
from conftest)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.models.config import preset
from qwen3_asr_tpu.models.decoder import (
    decoder_forward, init_decoder_params, init_kv_cache)
from qwen3_asr_tpu.ops.attention import AttnSpec
from qwen3_asr_tpu.parallel.pipeline import (
    make_mesh_pp, make_pp_train_step, pipelined_decoder_hidden,
    shard_params_pp)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs


def _tiny_cfg():
    cfg = preset("tiny")
    cfg.decoder.num_hidden_layers = 4   # divisible by pp=4 and pp=2
    return cfg


def test_make_mesh_pp_shapes(devices):
    mesh = make_mesh_pp(devices)
    assert mesh.shape["dp"] * mesh.shape["pp"] == 8
    assert make_mesh_pp(devices, pp=4).shape == {"dp": 2, "pp": 4}
    assert make_mesh_pp(devices, dp=4).shape == {"dp": 4, "pp": 2}


@pytest.mark.parametrize("pp,n_micro", [(4, 2), (2, 2)])
def test_pipeline_matches_sequential_decoder(devices, pp, n_micro):
    """Pipelined hidden states == decoder_forward's layer stack (same
    params, same inputs, per-row left-padding bounds)."""
    cfg = _tiny_cfg().decoder
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    b, t = 8, 12
    embeds = jax.random.normal(jax.random.PRNGKey(1),
                               (b, t, cfg.hidden_size)) * 0.3
    vf = jnp.asarray([0, 2, 5, 0, 1, 0, 3, 0], jnp.int32)

    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    cache = init_kv_cache(cfg, b, 128, dtype=jnp.float32)
    spec = AttnSpec(causal=True, q_offset=0, valid_from=vf)
    # decoder_forward applies the final norm; compare pre-norm hiddens by
    # replicating only the layer stack semantics: run it and undo nothing —
    # instead compare THROUGH the final norm on both sides.
    ref_hidden, _ = decoder_forward(params, cfg, embeds, positions, cache,
                                    jnp.int32(0), spec)

    mesh = make_mesh_pp(devices, pp=pp)
    sharded = shard_params_pp({"decoder": params}, mesh)["decoder"]
    from qwen3_asr_tpu.models.decoder import rms_norm
    got = pipelined_decoder_hidden(cfg, sharded["layers"], embeds, vf,
                                   mesh, n_micro)
    got = rms_norm(got, sharded["final_norm"], cfg.rms_norm_eps)

    # Positions < valid_from are fully-masked queries: their output is
    # unspecified garbage on every path (the loss masks them, decode reads
    # hidden[:, -1]); compare the defined region only.
    valid = (np.arange(t)[None, :] >= np.asarray(vf)[:, None])[..., None]
    np.testing.assert_allclose(np.asarray(got) * valid,
                               np.asarray(ref_hidden) * valid,
                               atol=2e-5, rtol=2e-5)


def test_pp_train_step_matches_single_device(devices):
    """One optimizer step through the pipeline == one step of the plain
    dp×tp training path (loss and updated params)."""
    import optax
    from qwen3_asr_tpu.models.encoder import init_encoder_params
    from qwen3_asr_tpu.runtime.train import (
        init_train_state, make_train_step)

    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(2)
    params = {
        "encoder": init_encoder_params(cfg.encoder, key),
        "decoder": init_decoder_params(cfg.decoder, key),
    }
    chunk = cfg.encoder.n_window * 2
    b = 8
    batch = {
        "mel": jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, cfg.encoder.num_mel_bins, chunk)), jnp.float32),
        "feature_lens": jnp.full((b,), chunk, jnp.int32),
        "prompt_ids": jnp.ones((b, 4), jnp.int32),
        "target_ids": jnp.ones((b, 6), jnp.int32),
        "target_mask": jnp.ones((b, 6), jnp.int32),
    }
    optimizer = optax.adamw(1e-3)

    ref_state = init_train_state(jax.tree.map(jnp.copy, params), optimizer)
    ref_step = jax.jit(make_train_step(cfg, optimizer))
    ref_state, ref_loss = ref_step(ref_state, batch)

    mesh = make_mesh_pp(devices, pp=4)
    pp_params = shard_params_pp(params, mesh)
    pp_state = init_train_state(pp_params, optimizer)
    pp_step = jax.jit(make_pp_train_step(cfg, optimizer, mesh, n_micro=2))
    pp_state, pp_loss = pp_step(pp_state, batch)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss),
                               atol=1e-5, rtol=1e-5)
    ref_w = np.asarray(ref_state.params["decoder"]["layers"]["wq"])
    pp_w = np.asarray(pp_state.params["decoder"]["layers"]["wq"])
    # f32 reduction-order noise through adamw's rsqrt: ~1e-5 worst-case
    np.testing.assert_allclose(pp_w, ref_w, atol=1e-4, rtol=1e-4)


def test_pp_second_step_decreases_loss(devices):
    """The pipeline is trainable end to end: loss drops over a few steps
    on a fixed batch (gradients flow through scan/ppermute)."""
    import optax
    from qwen3_asr_tpu.models.encoder import init_encoder_params
    from qwen3_asr_tpu.runtime.train import init_train_state

    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(5)
    params = {
        "encoder": init_encoder_params(cfg.encoder, key),
        "decoder": init_decoder_params(cfg.decoder, key),
    }
    chunk = cfg.encoder.n_window * 2
    b = 4
    batch = {
        "mel": jnp.asarray(np.random.default_rng(1).standard_normal(
            (b, cfg.encoder.num_mel_bins, chunk)), jnp.float32),
        "feature_lens": jnp.full((b,), chunk, jnp.int32),
        "prompt_ids": jnp.ones((b, 4), jnp.int32),
        "target_ids": jnp.asarray([[5, 6, 7, 2, 0, 0]] * b, jnp.int32),
        "target_mask": jnp.ones((b, 6), jnp.int32),
    }
    optimizer = optax.adamw(3e-3)
    mesh = make_mesh_pp(devices, dp=2)
    state = init_train_state(shard_params_pp(params, mesh), optimizer)
    step = jax.jit(make_pp_train_step(cfg, optimizer, mesh, n_micro=2))

    state, first = step(state, batch)
    for _ in range(4):
        state, loss = step(state, batch)
    assert float(loss) < float(first)


def test_shard_params_pp_quantized_leaves(devices):
    """Quantized {'q','s'} dict leaves must place on the pp axis like the
    dp-tp path does (parallel/mesh._tree_shard), not AttributeError."""
    from qwen3_asr_tpu.ops.quant import quantize_params
    cfg = _tiny_cfg().decoder
    params = init_decoder_params(cfg, jax.random.PRNGKey(2))
    qparams = quantize_params({"decoder": params}, "int8")
    mesh = make_mesh_pp(devices, pp=4)
    sharded = shard_params_pp(qparams, mesh)["decoder"]
    wq = sharded["layers"]["wq"]
    assert set(wq.keys()) == {"q", "s"}
    # layer-stack axis sharded over pp on both values and scales
    assert "pp" in str(wq["q"].sharding.spec)
    # pipelined forward consumes the quantized leaves through qdot
    b, t = 8, 12
    embeds = jax.random.normal(jax.random.PRNGKey(3),
                               (b, t, cfg.hidden_size)) * 0.3
    vf = jnp.zeros((b,), jnp.int32)
    got = pipelined_decoder_hidden(cfg, sharded["layers"], embeds, vf,
                                   mesh, 2)
    assert np.isfinite(np.asarray(got)).all()
