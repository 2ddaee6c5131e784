#!/usr/bin/env bash
# Run the E2E suite against a live server.
#
#   ./e2e/run_e2e.sh                       # against ASR_E2E_URL (default :8100)
#   ./e2e/run_e2e.sh --with-server         # boot a disposable CPU server first
#   ./e2e/run_e2e.sh --with-trained-server # serve the overfit-trained ckpt:
#                                          # the WER/CER accuracy gate EXECUTES
#   ./e2e/run_e2e.sh --with-gateway        # full gateway/worker process split
#   ./e2e/run_e2e.sh --with-trained-gateway # accuracy gates through the split
#   ./e2e/run_e2e.sh --with-grouped-server # trained server with BOTH WS flags
#                                          # (prefix-cache + tick-batch =
#                                          # grouped streaming) — gates the
#                                          # composed runtime/stream_group path
#
# --with-server uses a tiny random checkpoint (generated on the fly) so the
# full serving stack E2Es on any machine — the reference's fake-backend tier
# (SURVEY.md §4.3). --with-trained-server swaps in e2e/data/trained_ckpt
# (tools/overfit.py, real text on the vendored FLEURS clips).
set -euo pipefail
cd "$(dirname "$0")/.."

PORT="${ASR_E2E_PORT:-8100}"
SERVER_PID=""

cleanup() {
  if [ -n "$SERVER_PID" ]; then
    kill "$SERVER_PID" 2>/dev/null || true
  fi
}
trap cleanup EXIT

# Translation tier: the suite starts a local OpenAI-compatible fake LLM on
# this port; the server reads OPENAI_BASE_URL per request, so exporting it
# here (before server boot) wires /v1/audio/translations end-to-end.
export OPENAI_BASE_URL="${OPENAI_BASE_URL:-http://localhost:18999/v1}"
export ASR_E2E_FAKE_LLM_PORT="${ASR_E2E_FAKE_LLM_PORT:-18999}"

MODE="server"
if [ "${1:-}" = "--with-gateway" ]; then
  MODE="gateway"; set -- "--with-server" "${@:2}"
fi
if [ "${1:-}" = "--with-trained-gateway" ]; then
  # Accuracy gates through the FULL gateway/worker process split.
  MODE="gateway"; set -- "--with-trained-server" "${@:2}"
fi
if [ "${1:-}" = "--with-grouped-server" ]; then
  # Grouped prefix-cache streaming: the composed both-flags WS path
  # (one pooled-cache batched dispatch per cadence, per-row work ∝ new
  # audio) must stay behavior-identical to the solo paths.
  export ASR_WS_PREFIX_CACHE=true ASR_WS_TICK_BATCH=true
  set -- "--with-trained-server" "${@:2}"
fi
if [ "${1:-}" = "--with-trained-server" ]; then
  # Serve the overfit-trained checkpoint (real text) and point the
  # accuracy tiers at the vendored real-speech fixtures, so the WER gate
  # EXECUTES (tools/overfit.py trains it if absent; ~minutes on CPU).
  TRAINED_CKPT="e2e/data/trained_ckpt"
  if [ ! -f "$TRAINED_CKPT/overfit_manifest.json" ]; then
    echo "training e2e checkpoint (first run only)..."
    JAX_PLATFORMS=cpu python -m qwen3_asr_tpu.tools.overfit \
      --data-dir e2e/data/real --output "$TRAINED_CKPT"
  fi
  export ASR_E2E_DATA="$(pwd)/e2e/data/real"
  # Accurate-subtitle tier: the trained checkpoint doubles as the aligner
  # (encoder-similarity alignment works on any ASR-format checkpoint).
  export FORCED_ALIGNER_ID="$(pwd)/e2e/data/trained_ckpt"
  # The trained model's full-bucket warmup sweep takes many minutes on CPU
  # and would hold the request queue past the suite's 300 s timeouts —
  # warm only the small buckets and let the persistent compile cache make
  # on-demand bucket compiles cheap across runs.
  export USE_CUDA_GRAPHS=false
  # ...and pin the minimal pair explicitly: the production default warms
  # the full WS-reachable ladder (1/2/4/6/10 s at the 6 s cap), which on
  # a CPU-run 113M checkpoint would add minutes to every suite boot.
  export ASR_WARMUP_BUCKETS="${ASR_WARMUP_BUCKETS:-1,2}"
  export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/qwen3_asr_tpu_xla}"
  set -- "--with-server" "${@:2}"
  CKPT_OVERRIDE="$TRAINED_CKPT"
fi
if [ "${1:-}" = "--with-server" ]; then
  shift
  if [ -n "${CKPT_OVERRIDE:-}" ]; then
    CKPT_DIR="$CKPT_OVERRIDE"
  else
  CKPT_DIR="$(mktemp -d)/ckpt"
  PYTHONPATH=".:tests" python -c "
from fixtures import write_tiny_checkpoint
write_tiny_checkpoint('$CKPT_DIR')
print('checkpoint at $CKPT_DIR')"
  fi
  if [ "$MODE" = "gateway" ]; then
    # Gateway on :PORT spawning a real worker on :WORKER_PORT — the full
    # process split (reference compose default GATEWAY_MODE=true). The
    # worker's /translate?format=srt uses ACCURATE subtitles (reference
    # worker.py:229 delta), so it needs an aligner checkpoint.
    JAX_PLATFORMS=cpu MODEL_ID="$CKPT_DIR" GATEWAY_MODE=true \
      FORCED_ALIGNER_ID="${FORCED_ALIGNER_ID:-$CKPT_DIR}" \
      WORKER_PORT="${WORKER_PORT:-18801}" USE_CUDA_GRAPHS="${USE_CUDA_GRAPHS:-true}" \
      IDLE_TIMEOUT=0 \
      python -m qwen3_asr_tpu.serving.gateway --port "$PORT" &
  else
    JAX_PLATFORMS=cpu MODEL_ID="$CKPT_DIR" USE_CUDA_GRAPHS="${USE_CUDA_GRAPHS:-true}" \
      python -m qwen3_asr_tpu.serving.server --port "$PORT" &
  fi
  SERVER_PID=$!
  echo "$MODE pid $SERVER_PID on :$PORT"
fi

export ASR_E2E_URL="${ASR_E2E_URL:-http://localhost:$PORT}"
export ASR_E2E_WAIT_S="${ASR_E2E_WAIT_S:-120}"
python -m pytest e2e/ -v --no-header "$@"
