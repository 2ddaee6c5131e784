"""Host-side overhead of transcribe_batch at bench shapes.

Times: (a) device_put of the float32 audio batch, (b) device_put as int16,
(c) token fetch + detokenize, (d) full transcribe_batch wall vs device time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("QUANTIZE", "int8")
os.environ.setdefault("ASR_KV_CACHE_DTYPE", "fp8")

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
enable_compilation_cache()

from bench import build_engine  # noqa: E402

B = int(os.getenv("MB_B", "32"))
CLIP_S = float(os.getenv("MB_CLIP_S", "20"))

dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
cache_dtype = jnp.float8_e4m3fn if jax.default_backend() == "tpu" else dtype
engine = build_engine("1.7b" if jax.default_backend() == "tpu" else "tiny",
                      dtype, cache_dtype)

rng = np.random.default_rng(0)
audio_f32 = rng.standard_normal((B, int(16000 * CLIP_S))).astype(np.float32) * 0.05
audio_i16 = (audio_f32 * 32767).astype(np.int16)
clips = [(audio_f32[i], 16000) for i in range(B)]


def timed(fn, n=3):
    fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


t_put32 = timed(lambda: jax.block_until_ready(jax.device_put(audio_f32)))
t_put16 = timed(lambda: jax.block_until_ready(jax.device_put(audio_i16)))
print(f"device_put f32 ({audio_f32.nbytes/2**20:.0f} MB): {t_put32*1e3:8.1f} ms")
print(f"device_put i16 ({audio_i16.nbytes/2**20:.0f} MB): {t_put16*1e3:8.1f} ms")

# warm the bucket then time the full call
engine.transcribe_batch(clips, language="en")
t_full = timed(lambda: engine.transcribe_batch(clips, language="en"))
print(f"transcribe_batch wall:   {t_full*1e3:8.1f} ms")

# device-only time of the same executable
bucket_frames, bucket_s = engine.bucket_frames(len(audio_f32[0]))
fn = engine._fused_fn(bucket_frames, bucket_s)
from qwen3_asr_tpu.runtime.engine import PREFIX_BUDGET  # noqa: E402
prefix = jnp.full((B, PREFIX_BUDGET), engine.model.pad_id, jnp.int32)
vf = jnp.full((B,), PREFIX_BUDGET - 8, jnp.int32)
dev_audio = jax.device_put(jnp.asarray(audio_f32))
jax.block_until_ready(dev_audio)
t_dev = timed(lambda: jax.block_until_ready(
    fn(engine.model.params, dev_audio, prefix, vf).tokens))
print(f"device-only executable:  {t_dev*1e3:8.1f} ms")
print(f"host overhead:           {(t_full-t_dev)*1e3:8.1f} ms")
