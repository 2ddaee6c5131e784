"""Fine-tuning CLI: audio-conditioned LM training over a DP×TP mesh.

Minimal trainer around runtime/train.py for adapting checkpoints
(domain audio, new vocab conditioning). Data format: a manifest of
``{"wav": path, "text": transcript}`` JSON lines.

    python -m qwen3_asr_tpu.tools.finetune \
        --model-id /ckpt --manifest data.jsonl --steps 100 --lr 1e-5
"""
from __future__ import annotations

import argparse
import json
import os
import time


def make_batch(engine, items, bucket_s: float = 6.0):
    """Manifest rows → padded training batch dict (mel, prompt, targets)."""
    import numpy as np
    from ..audio.codec import decode_audio
    from ..audio.resample import resample
    from ..runtime.engine import HOP_LENGTH, PREFIX_BUDGET

    model = engine.model
    chunk = model.cfg.encoder.n_window * 2
    frames = int(bucket_s * 100)
    frames = ((frames + chunk - 1) // chunk) * chunk
    n_samples = frames * HOP_LENGTH

    from ..runtime.engine import max_new_tokens_for

    mels, prompts, targets, n_ctx = [], [], [], []
    # Targets start with the prompt SUFFIX (mask 0): inference decodes
    # after [prefix, audio, suffix], so training must condition the
    # transcript on the same layout — a model tuned without the suffix
    # would never see it until serving.
    _, suffix_ids, _ = model.prompt_ids(0, None)
    # STATIC shapes (CLAUDE.md invariant): prompts pad to PREFIX_BUDGET,
    # targets to suffix + the bucket's decode budget — per-batch max
    # lengths would recompile the jitted step almost every iteration.
    tgt_budget = len(suffix_ids) + max_new_tokens_for(frames / 100.0)
    for item in items:
        with open(item["wav"], "rb") as f:
            audio, sr = decode_audio(f.read())
        if sr != 16000:
            audio = resample(audio, sr, 16000)
        padded = np.zeros(n_samples, dtype=np.float32)
        padded[:min(len(audio), n_samples)] = audio[:n_samples]
        mel, _ = engine.frontend(padded)
        mels.append(np.asarray(mel))

        prefix, _, _ = model.prompt_ids(0, item.get("language"))
        prefix = prefix[-PREFIX_BUDGET:]
        prompts.append(prefix)
        text_ids = model.tokenizer.encode(item["text"]) + [model.eos_id]
        tgt = (list(suffix_ids) + text_ids)[:tgt_budget]
        targets.append(tgt)
        n_ctx.append(min(len(suffix_ids), len(tgt)))

    b = len(items)
    batch = {
        "mel": np.stack(mels).astype(np.float32),
        "feature_lens": np.full((b,), frames, np.int32),
        "prompt_ids": np.full((b, PREFIX_BUDGET), model.pad_id, np.int32),
        "target_ids": np.full((b, tgt_budget), model.pad_id, np.int32),
        "target_mask": np.zeros((b, tgt_budget), np.int32),
        "valid_from": np.zeros((b,), np.int32),
    }
    for i, (p, t) in enumerate(zip(prompts, targets)):
        batch["prompt_ids"][i, -len(p):] = p
        batch["valid_from"][i] = PREFIX_BUDGET - len(p)
        batch["target_ids"][i, :len(t)] = t
        batch["target_mask"][i, n_ctx[i]:len(t)] = 1  # suffix is context
    return batch


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-id", default=os.getenv("MODEL_ID"))
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--bucket-s", type=float, default=6.0)
    parser.add_argument("--output", default="finetuned")
    parser.add_argument("--dp", type=int, default=None)
    args = parser.parse_args()

    import jax
    import optax
    from ..parallel.mesh import make_mesh, shard_params
    from ..runtime.lifecycle import _load_engine_sync
    from ..runtime.train import init_train_state, make_train_step
    from ..utils.logging import log
    from ..utils.platform import honor_platform_env

    honor_platform_env()
    if os.getenv("QUANTIZE"):
        # The serving QUANTIZE env would make _load_engine_sync replace
        # weights with {'q','s'} integer leaves: grad fails on int8, and
        # fp8 would silently train rounded weights. Training requires
        # float weights — drop the flag for this process.
        log.warning("QUANTIZE={} ignored for fine-tuning (float weights "
                    "required)", os.environ.pop("QUANTIZE"))
    engine = _load_engine_sync(args.model_id)
    model = engine.model

    with open(args.manifest) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    log.info("Fine-tuning on {} clips for {} steps", len(rows), args.steps)

    mesh = make_mesh(jax.devices(), dp=args.dp)
    params = shard_params(model.params, mesh)
    optimizer = optax.adamw(args.lr)
    state = init_train_state(params, optimizer)
    step_fn = jax.jit(make_train_step(model.cfg, optimizer),
                      donate_argnums=(0,))

    for step in range(args.steps):
        items = [rows[(step * args.batch_size + i) % len(rows)]
                 for i in range(args.batch_size)]
        batch = make_batch(engine, items, args.bucket_s)
        t0 = time.time()
        state, loss = step_fn(state, batch)
        log.info("step {} | loss {:.4f} | {:.2f}s", step, float(loss),
                 time.time() - t0)

    # HF-layout save (config.json + model.safetensors) so MODEL_ID can
    # point straight at the output — the train→serve loop
    # (runtime/checkpoint.save_asr_checkpoint), not a raw orbax pytree.
    import shutil
    from ..runtime.checkpoint import save_asr_checkpoint
    save_asr_checkpoint(args.output, model.cfg, state.params)
    if os.path.isdir(args.model_id):
        # save_asr_checkpoint writes config+weights; the tokenizer (and
        # chat template, when present) come from the source checkpoint.
        for name in ("tokenizer.json", "tokenizer_config.json",
                     "chat_template.jinja"):
            src = os.path.join(args.model_id, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.output, name))
    log.info("Saved servable fine-tuned checkpoint to {}", args.output)


if __name__ == "__main__":
    main()
