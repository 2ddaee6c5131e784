"""Export the compiled audio encoder as StableHLO.

The TPU equivalent of the reference's encoder-export tooling
(src/export_onnx.py: ONNX opset-17 encoder dump; src/build_trt.py: TRT
engine build). On TPU the jitted XLA encoder IS the compiled engine, so no
separate runtime is needed for serving — this tool exists for
interoperability: the StableHLO module can be consumed by IREE, TF via
jax2tf-style bridges, or inspected for optimization work.

Usage:
    python -m qwen3_asr_tpu.tools.export_stablehlo \
        --model-id /path/to/ckpt --bucket-s 6 --output encoder.stablehlo
"""
from __future__ import annotations

import argparse
import os


def export_encoder_stablehlo(model_id: str, bucket_s: float = 6.0,
                             output: str = "encoder.stablehlo",
                             batch: int = 1) -> str:
    import jax
    import jax.numpy as jnp

    from ..runtime.lifecycle import _load_engine_sync
    from ..models.encoder import encoder_forward

    engine = _load_engine_sync(model_id)
    model = engine.model
    cfg = model.cfg.encoder
    chunk = cfg.n_window * 2
    frames = int(bucket_s * 100)
    frames = ((frames + chunk - 1) // chunk) * chunk

    def encoder_fn(enc_params, mel, feature_lens):
        return encoder_forward(enc_params, cfg, mel, feature_lens)

    # Params are a lowering ARGUMENT: closing over them would bake every
    # weight into the module as dense constants — a multi-GB text dump for
    # the 1.7B encoder. As arguments they lower to module parameters.
    params_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        model.params["encoder"])
    mel_spec = jax.ShapeDtypeStruct((batch, cfg.num_mel_bins, frames),
                                    jnp.float32)
    lens_spec = jax.ShapeDtypeStruct((batch,), jnp.int32)
    lowered = jax.jit(encoder_fn).lower(params_spec, mel_spec, lens_spec)
    stablehlo = lowered.compiler_ir(dialect="stablehlo")

    with open(output, "w") as f:
        f.write(str(stablehlo))
    return output


def main():
    from ..utils.platform import honor_platform_env
    honor_platform_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-id",
                        default=os.getenv("MODEL_ID", "preset:1.7b"))
    parser.add_argument("--bucket-s", type=float, default=6.0)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--output", default="encoder.stablehlo")
    args = parser.parse_args()
    path = export_encoder_stablehlo(args.model_id, args.bucket_s,
                                    args.output, args.batch)
    print(f"StableHLO encoder module written to {path}")


if __name__ == "__main__":
    main()
