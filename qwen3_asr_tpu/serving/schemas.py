"""OpenAPI response schemas + tag metadata.

Response shapes are contract-parity with the reference API (same field
names and semantics — clients interoperate unchanged); accelerator-state
fields describe TPU/HBM instead of CUDA/VRAM.
"""
from typing import Optional

from pydantic import BaseModel, Field


def _example(**kw):
    return {"json_schema_extra": {"examples": [kw]}}


class ErrorResponse(BaseModel):
    """Standardized error payload ({code, message, statusCode, context})."""
    code: str = Field(description="Machine-readable error identifier, e.g. AUDIO_DECODE_FAILED")
    message: str = Field(description="Human-readable error description")
    context: Optional[dict] = Field(None, description="Debug data: requestId, input params")
    statusCode: int = Field(description="HTTP status code")

    model_config = _example(code="AUDIO_DECODE_FAILED",
                            message="Could not decode audio: unknown format",
                            context={"fileSize": 1024}, statusCode=422)


class HealthResponse(BaseModel):
    """Service liveness + model/accelerator state."""
    status: str = Field(description="Service status", examples=["ok"])
    mode: Optional[str] = Field(None, description="'gateway' (proxied), 'worker', or absent for standalone")
    model_loaded: bool = Field(description="Whether the ASR model is resident on the accelerator")
    model_id: Optional[str] = Field(None, description="Loaded model identifier")
    device: Optional[str] = Field(None, description="Accelerator kind", examples=["TPU v5 lite"])
    num_devices: Optional[int] = Field(None, description="Visible accelerator chips")
    hbm_used_mb: Optional[int] = Field(None, description="Accelerator memory in use (MB)")
    hbm_limit_mb: Optional[int] = Field(None, description="Accelerator memory capacity (MB)")
    device_arrays_mb: Optional[int] = Field(
        None, description="Total bytes of live framework arrays (MB) — "
        "leak accounting on backends without memory_stats")
    aligner: Optional[str] = Field(
        None, description="ForcedAligner state: loaded | not_loaded | "
        "unavailable_retrying (failed loads retry with backoff)")
    worker_alive: Optional[bool] = Field(None, description="Worker process responsive (gateway mode)")


class TranscriptionResponse(BaseModel):
    """Result of POST /v1/audio/transcriptions."""
    text: str = Field(description="Transcribed text")
    language: str = Field(description="Detected or requested language code")

    model_config = _example(text="Hello, how are you today?", language="en")


class TranslationResponse(BaseModel):
    """Result of POST /v1/audio/translations (json format)."""
    text: str = Field(description="Translated text")
    language: str = Field(description="Target language code used")

    model_config = _example(text="Hello, how are you?", language="en")


class SSEChunkEvent(BaseModel):
    """One `data:` event of the SSE streaming transcription."""
    text: str = Field(description="Transcribed text for this chunk")
    chunk_index: int = Field(description="Zero-based chunk index")
    is_final: bool = Field(description="True on the last chunk")
    language: str = Field(description="Detected language code")

    model_config = _example(text="This is the first part", chunk_index=0,
                            is_final=False, language="en")


class WebSocketHandshake(BaseModel):
    """First message the server sends after a WS connection is accepted."""
    status: str = Field(description="Connection status", examples=["connected"])
    sample_rate: int = Field(description="Expected PCM input rate (Hz)")
    buffer_size: int = Field(description="Bytes buffered before each partial transcription")
    window_max_s: float = Field(description="Sliding-window cap (seconds)")
    use_server_vad: bool = Field(description="Server-side VAD active for this connection")

    model_config = _example(status="connected", sample_rate=16000,
                            buffer_size=14400, window_max_s=6.0,
                            use_server_vad=True)


class WebSocketPartial(BaseModel):
    """Streaming partial: cumulative transcript of the current window."""
    partial: str = Field(description="Cumulative transcript — replace, don't append")
    language: str = Field(description="Detected language code")

    model_config = _example(partial="Hello how are you", language="en")


API_TAGS = [
    {"name": "Transcription",
     "description": "Speech-to-text endpoints. Upload audio (WAV, FLAC, MP3, OGG, AIFF, CAF, AU) and get text back."},
    {"name": "Streaming",
     "description": "Real-time WebSocket and SSE transcription for low-latency use."},
    {"name": "Subtitles",
     "description": "SRT generation — 'fast' heuristic timing or 'accurate' forced alignment."},
    {"name": "Translation",
     "description": "Transcribe then translate to English or Chinese via an external LLM."},
    {"name": "System",
     "description": "Health, model state, diagnostics, profiler traces."},
]

API_DESCRIPTION = """\
TPU-accelerated speech-to-text API powered by [Qwen3-ASR](https://huggingface.co/Qwen/Qwen3-ASR-1.7B),
rebuilt on JAX/XLA/Pallas.

## Features
- **OpenAI-compatible** `/v1/audio/transcriptions` endpoint
- **Multilingual**: English, Chinese, Japanese, Cantonese, Hindi, Thai, and more
- **Real-time WebSocket** streaming with sliding window and VAD
- **SSE streaming** for chunked transcription of long files
- **SRT subtitle** generation (fast and accurate modes)
- **Translation** via external LLM API

## Audio formats
WAV (PCM/float), AIFF/AIFC, AU, RF64, FLAC (native decoder), MP3 and
Ogg Vorbis/Opus (SDL_mixer backend, stream-native sample rate). M4A/AAC
is not supported.

## WebSocket protocol
Connect to `/ws/transcribe`, stream raw PCM (s16le, mono, 16 kHz), and use
JSON actions `flush` / `reset` / `config`. See docs/WEBSOCKET_USAGE.md.
"""
