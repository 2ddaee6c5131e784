import jax
from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
enable_compilation_cache()
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry warmed:", out.shape)
