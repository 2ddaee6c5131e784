"""qwen3_asr_tpu — a TPU-native (JAX/XLA/Pallas) speech-recognition serving framework.

A from-scratch rebuild of the capabilities of the jaaacki/qwen3-asr GPU stack
(reference layout documented in SURVEY.md): OpenAI-compatible HTTP transcription,
SSE streaming, real-time WebSocket transcription with sliding window + VAD,
SRT subtitles (fast + forced-aligner), LLM translation, priority scheduling,
and a gateway/worker process split — with the compute path designed for TPU:
fused JAX audio frontend, Pallas flash attention, on-device autoregressive
decode with persistent KV cache, length-bucketed jit compilation, and
pjit/shard_map parallelism over a device mesh.
"""

__version__ = "0.1.0"
