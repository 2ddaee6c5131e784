"""Quantization-fidelity bound at production scale, without released weights.

The released Qwen3-ASR weights are unobtainable here (no egress), so the
serving default (int8 weights + int4 KV + W8A8 prefill) cannot be WER-gated
at 1.7B directly. This tool bounds the risk with measurement instead
(round-3 verdict "next #4"): on the REAL 1.7B graph with matched
realistic-init random weights — and on any trained checkpoint dir — it
measures, per audio bucket:

  * greedy token agreement vs the bf16 engine at increasing decode depths
    (the metric that actually determines WER deltas), and
  * prefill logit drift at the first generated position (mean/max |Δ|,
    top-1 match, top-5 overlap) — the precision loss BEFORE any
    autoregressive error compounding.

Caveat, stated up front: random realistic-init logits carry near-zero
argmax margins (no trained structure), so token agreement there is a
STRESS bound — real checkpoints (e.g. the 113M trained proof checkpoint,
--model e2e/data/trained_medium) sit above it because trained logits
separate. Run both; quote the pair.

    python tools_perf/quant_agreement.py --model preset:1.7b
    python tools_perf/quant_agreement.py --model e2e/data/trained_medium

Audio is the vendored real-speech fixtures (real mel statistics, not
white noise). Output: one JSON line per (config, bucket).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def realistic_init_engine(preset_name: str):
    """1.7B-graph engine with REAL init distributions (not zeros): the
    per-layer weight scales match trained-network magnitudes, so int8
    rounding error is exercised at realistic amplitude."""
    import jax
    import jax.numpy as jnp
    from qwen3_asr_tpu.models.config import preset
    from qwen3_asr_tpu.models.decoder import init_decoder_params
    from qwen3_asr_tpu.models.encoder import init_encoder_params
    from qwen3_asr_tpu.runtime.lifecycle import _load_engine_sync

    engine = _load_engine_sync(f"preset:{preset_name}")
    cfg = preset(preset_name)
    k_enc, k_dec = jax.random.split(jax.random.PRNGKey(7))
    engine.model.params = jax.jit(lambda: {
        "encoder": init_encoder_params(cfg.encoder, k_enc, jnp.bfloat16),
        "decoder": init_decoder_params(cfg.decoder, k_dec, jnp.bfloat16),
    })()
    return engine


def load_clips(data_dir: str, clip_s: float, batch: int):
    """Real speech rows tiled/trimmed to clip_s seconds (f32 @ 16 kHz)."""
    import numpy as np
    from pathlib import Path
    from qwen3_asr_tpu.audio.codec import decode_audio
    from qwen3_asr_tpu.audio.resample import resample

    n = int(16000 * clip_s)
    rows = []
    for p in sorted(Path(data_dir).glob("*.wav")):
        audio, sr = decode_audio(p.read_bytes())
        if sr != 16000:
            audio = resample(audio, sr, 16000)
        audio = np.asarray(audio, np.float32)
        reps = -(-n // max(1, len(audio)))
        rows.append(np.tile(audio, reps)[:n])
        if len(rows) == batch:
            break
    while len(rows) < batch:
        rows.append(rows[len(rows) % max(1, len(rows))])
    return rows


def prefill_logits_fn(engine, bucket_frames):
    """Jitted: audio + prompt → f32 logits at the first decode position.
    Same assembly as the fused executable (engine._prompt_builder), so the
    drift measured here is the drift serving actually sees."""
    import jax
    import jax.numpy as jnp
    from qwen3_asr_tpu.models.decoder import (decoder_forward, init_kv_cache,
                                              lm_logits)
    from qwen3_asr_tpu.ops.attention import AttnSpec

    cfg = engine.model.cfg
    build = engine._prompt_builder(bucket_frames)
    cache_dtype = engine.cache_dtype

    @jax.jit
    def run(params, audio, prefix_ids, valid_from):
        inputs = build(params, audio, prefix_ids)
        b, t, _ = inputs.shape
        total = -(-(t + 8) // 128) * 128
        cache = init_kv_cache(cfg.decoder, b, total, dtype=cache_dtype)
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        spec = AttnSpec(causal=True, q_offset=0, valid_from=valid_from)
        hidden, _ = decoder_forward(params["decoder"], cfg.decoder, inputs,
                                    positions, cache, jnp.int32(0), spec)
        return lm_logits(params["decoder"], cfg.decoder,
                         hidden[:, -1]).astype(jnp.float32)

    return run


def greedy_margin_fn(engine, bucket_frames, depth):
    """Jitted: audio + prompt → (tokens [B,depth], margins [B,depth],
    alive [B,depth]) along the bf16 reference's own greedy path.

    margin[i] = top1 − top2 logit at decode step i — the separation the
    quantization drift must stay inside for the argmax (and therefore the
    text) to survive. alive masks steps after the row's EOS: margins past
    EOS are not on any served path (round-4 verdict #4: connect the
    random-init drift bound to TRAINED margins instead of leaving 'small
    against trained margins' as an unquantified claim)."""
    import jax
    import jax.numpy as jnp
    from qwen3_asr_tpu.models.decoder import (decoder_forward, embed_tokens,
                                              init_kv_cache, lm_logits)
    from qwen3_asr_tpu.ops.attention import AttnSpec

    cfg = engine.model.cfg
    build = engine._prompt_builder(bucket_frames)
    cache_dtype = engine.cache_dtype
    eos = cfg.eos_token_id

    def margin_of(logits):
        m1 = jnp.max(logits, axis=-1)
        hot = jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1],
                             dtype=logits.dtype)
        m2 = jnp.max(logits - hot * jnp.float32(1e30), axis=-1)
        return m1 - m2

    @jax.jit
    def run(params, audio, prefix_ids, valid_from):
        inputs = build(params, audio, prefix_ids)
        b, t, _ = inputs.shape
        total = -(-(t + depth + 8) // 128) * 128
        cache = init_kv_cache(cfg.decoder, b, total, dtype=cache_dtype)
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        spec = AttnSpec(causal=True, q_offset=0, valid_from=valid_from)
        hidden, cache = decoder_forward(params["decoder"], cfg.decoder,
                                        inputs, positions, cache,
                                        jnp.int32(0), spec)
        logits = lm_logits(params["decoder"], cfg.decoder,
                           hidden[:, -1]).astype(jnp.float32)

        toks0 = jnp.zeros((b, depth), jnp.int32)
        margs0 = jnp.zeros((b, depth), jnp.float32)
        alive0 = jnp.zeros((b, depth), jnp.bool_)

        def body(i, carry):
            logits, cache, toks, margs, alive, live = carry
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            toks = toks.at[:, i].set(tok)
            margs = margs.at[:, i].set(margin_of(logits))
            alive = alive.at[:, i].set(live)
            live = live & (tok != eos)
            pos = t + i
            hidden = embed_tokens(params["decoder"], cfg, tok[:, None])
            positions = jnp.full((b, 1), pos, jnp.int32)
            step_spec = AttnSpec(valid_from=valid_from,
                                 valid_to=jnp.full((b,), pos + 1, jnp.int32))
            hidden, cache = decoder_forward(params["decoder"], cfg.decoder,
                                            hidden, positions, cache, pos,
                                            step_spec)
            logits = lm_logits(params["decoder"], cfg.decoder,
                               hidden[:, -1]).astype(jnp.float32)
            return logits, cache, toks, margs, alive, live

        live0 = jnp.ones((b,), jnp.bool_)
        _, _, toks, margs, alive, _ = jax.lax.fori_loop(
            0, depth, body, (logits, cache, toks0, margs0, alive0, live0))
        return toks, margs, alive

    return run


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="preset:1.7b")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--clips-s", default="6,20")
    parser.add_argument("--depths", default="16,64,128,176")
    parser.add_argument("--data-dir", default="e2e/data/real")
    parser.add_argument("--margins", action="store_true",
                        help="measure bf16 greedy-path argmax margins and "
                             "report them against each config's drift")
    parser.add_argument("--margin-depth", type=int, default=64)
    parser.add_argument("--out", default=None,
                        help="write all result rows as JSON to this path "
                             "(committed artifact, e.g. "
                             "tools_perf/results/quant_agreement_17b.json)")
    args = parser.parse_args()

    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from qwen3_asr_tpu.ops.quant import quantize_params
    from qwen3_asr_tpu.runtime.engine import (TranscriptionEngine,
                                              enable_compilation_cache)
    from qwen3_asr_tpu.runtime.lifecycle import _load_engine_sync

    enable_compilation_cache()
    # Float reference engine. QUANTIZE must not leak in from the shell —
    # the whole point is one float source tree quantized explicitly below.
    os.environ.pop("QUANTIZE", None)
    os.environ.pop("ASR_INT8_ACT", None)
    if args.model.startswith("preset:"):
        base = realistic_init_engine(args.model.split(":", 1)[1])
    else:
        base = _load_engine_sync(os.path.abspath(args.model))
    model = base.model
    dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
             else jnp.float32)
    qparams = jax.jit(lambda p: quantize_params(p, "int8"))(model.params)

    def make_engine(params, cache_dtype, int8_act=False):
        import copy
        m = copy.copy(model)
        m.params = params
        if int8_act:
            os.environ["ASR_INT8_ACT"] = "true"
        else:
            os.environ.pop("ASR_INT8_ACT", None)
        return TranscriptionEngine(m, dtype=dtype, cache_dtype=cache_dtype)

    depths = [int(d) for d in args.depths.split(",")]
    results = []
    for clip_s in [float(s) for s in args.clips_s.split(",")]:
        rows = load_clips(args.data_dir, clip_s, args.batch)
        bf, bs = base.bucket_frames(len(rows[0]))

        # ASR_INT8_ACT is read at TRACE time, so each engine's executables
        # must be built (first call) while its flag state is active; engines
        # cache executables per-instance, making the toggle safe.
        configs = [
            ("bf16", model.params, dtype, False),
            ("int8", qparams, dtype, False),
            # The documented accuracy-paranoid middle config (int8 weights
            # + fp8 KV, 553.6x measured) — quantified here so the
            # recommendation carries drift numbers, not just throughput.
            ("int8_fp8kv", qparams, jnp.float8_e4m3fn, False),
            ("int8_int4kv", qparams, jnp.int4, False),
            ("int8_int4kv_w8a8", qparams, jnp.int4, True),
        ]
        token_rows, logit_rows = {}, {}
        margin_stats = None
        for name, params, cache_dtype, act in configs:
            if cache_dtype == jnp.int4 and jax.default_backend() == "cpu":
                cache_dtype = dtype  # int4 cache is a TPU lever
            eng = make_engine(params, cache_dtype, act)
            _, ids = eng._run_bucket(rows, bf, bs, "en")
            token_rows[name] = ids
            lf = prefill_logits_fn(eng, bf)
            audio = np.stack(rows)
            prefix, valid_from = eng.padded_prefix("en", "", len(rows))
            logit_rows[name] = np.asarray(
                lf(params, jnp.asarray(audio), jnp.asarray(prefix),
                   jnp.asarray(valid_from)))
            if args.margins and name == "bf16":
                mf = greedy_margin_fn(eng, bf, args.margin_depth)
                _, margs, alive = mf(params, jnp.asarray(audio),
                                     jnp.asarray(prefix),
                                     jnp.asarray(valid_from))
                m = np.asarray(margs)[np.asarray(alive)]
                margin_stats = {
                    "depth": args.margin_depth,
                    "on_path_steps": int(m.size),
                    "percentiles": {p: round(float(np.percentile(m, p)), 3)
                                    for p in (1, 5, 10, 25, 50)},
                    "min": round(float(m.min()), 4),
                }
                margin_stats["_samples"] = m  # for the drift comparison
            os.environ.pop("ASR_INT8_ACT", None)

        ref_t, ref_l = token_rows["bf16"], logit_rows["bf16"]
        ref_top1 = ref_l.argmax(-1)
        ref_top5 = np.argsort(-ref_l, axis=-1)[:, :5]
        for name, _, _, _ in configs[1:]:
            ids, lg = token_rows[name], logit_rows[name]
            agree = {}
            for d in depths:
                ok = sum(
                    1 for r, q in zip(ref_t, ids)
                    if r[:min(d, len(r))] == q[:min(d, len(r))]
                    and (len(r) >= d) == (len(q) >= d))
                agree[str(d)] = round(ok / len(ref_t), 3)
            first_div = []
            for r, q in zip(ref_t, ids):
                n = min(len(r), len(q))
                div = next((i for i in range(n) if r[i] != q[i]), None)
                first_div.append(div if div is not None
                                 else (n if len(r) != len(q) else -1))
            diffs = np.abs(lg - ref_l)
            top5 = np.argsort(-lg, axis=-1)[:, :5]
            overlap = np.mean([len(set(a) & set(b)) / 5.0
                               for a, b in zip(ref_top5, top5)])
            row = {
                "model": args.model, "config": name, "bucket_s": bs,
                "batch": len(rows),
                "token_agreement_at_depth": agree,
                "first_divergence": sorted(
                    d for d in first_div if d >= 0) or "none",
                "rows_fully_identical": sum(1 for d in first_div if d < 0),
                "prefill_logit_mean_abs_drift": round(float(diffs.mean()), 5),
                "prefill_logit_max_abs_drift": round(float(diffs.max()), 4),
                "prefill_top1_match": round(float(
                    (lg.argmax(-1) == ref_top1).mean()), 3),
                "prefill_top5_overlap": round(float(overlap), 3),
            }
            if margin_stats is not None:
                # The bracket-connecting number (round-4 verdict #4): what
                # fraction of this model's ON-PATH trained margins would a
                # given drift flip? Evaluated at THIS config's measured
                # drift and at the 1.7B stress bound's. A flip needs the
                # top-2 gap to close, i.e. adversarially aligned drift on
                # both logits: threshold 2x the per-logit drift.
                m = margin_stats["_samples"]
                row["margin_vs_drift"] = {
                    "at_own_mean_drift": round(float(
                        (m < 2 * diffs.mean()).mean()), 5),
                    "at_own_max_drift": round(float(
                        (m < 2 * diffs.max()).mean()), 5),
                    "at_17b_stress_mean_0.23": round(float(
                        (m < 2 * 0.23).mean()), 5),
                    "at_17b_stress_max_1.39": round(float(
                        (m < 2 * 1.39).mean()), 5),
                    "margin_p50_over_17b_mean_drift": round(float(
                        np.percentile(m, 50) / 0.23), 1),
                }
            results.append(row)
            print(json.dumps(row))
        if margin_stats is not None:
            margin_stats.pop("_samples", None)
            results.append({"model": args.model, "config": "bf16-margins",
                            "bucket_s": bs, **margin_stats})
            print(json.dumps(results[-1]))

    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
