"""One train step on the REAL chip with head_dim=128 (flash auto-dispatch):
proves jax.grad flows through the Pallas kernel via the custom VJP."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/qwen3_asr_tpu_xla"))
import jax, jax.numpy as jnp, numpy as np, optax
from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
enable_compilation_cache()
from qwen3_asr_tpu.models.config import (AsrConfig, DecoderConfig,
                                         AudioEncoderConfig)
from qwen3_asr_tpu.models.decoder import init_decoder_params
from qwen3_asr_tpu.models.encoder import init_encoder_params
from qwen3_asr_tpu.runtime.train import init_train_state, make_train_step

print("backend:", jax.default_backend())
assert jax.default_backend() == "tpu"

enc = AudioEncoderConfig(num_mel_bins=32, d_model=256, encoder_layers=2,
                         encoder_attention_heads=2, encoder_ffn_dim=512,
                         output_dim=256, downsample_hidden_size=64)
dec = DecoderConfig(vocab_size=1024, hidden_size=256, intermediate_size=512,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=1, head_dim=128)
cfg = AsrConfig(encoder=enc, decoder=dec, audio_token_id=1000,
                bos_token_id=1, eos_token_id=2, pad_token_id=0)
key = jax.random.PRNGKey(0)
params = {"encoder": init_encoder_params(enc, key, jnp.bfloat16),
          "decoder": init_decoder_params(dec, key, jnp.bfloat16)}
opt = optax.sgd(1e-3)
state = init_train_state(params, opt)
step = jax.jit(make_train_step(cfg, opt))
rng = np.random.default_rng(0)
batch = {"mel": jnp.asarray(rng.standard_normal((2, 32, 200)), jnp.float32),
         "feature_lens": jnp.full((2,), 200, jnp.int32),
         "prompt_ids": jnp.ones((2, 4), jnp.int32),
         "target_ids": jnp.asarray(rng.integers(1, 1000, (2, 8)), jnp.int32),
         "target_mask": jnp.ones((2, 8), jnp.int32)}
state2, loss = step(state, batch)
print("loss:", float(loss))
delta = jax.tree.reduce(lambda a, x: a + float(jnp.sum(jnp.abs(x))),
                        jax.tree.map(lambda a, b: (a - b).astype(jnp.float32),
                                     state2.params, state.params), 0.0)
print("param delta:", delta)
assert np.isfinite(float(loss)) and delta > 0
print("TPU FLASH-VJP TRAIN STEP OK (head_dim=128, auto backend)")
