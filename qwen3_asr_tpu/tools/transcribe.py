"""Offline batch transcription CLI — files in, text/JSON/SRT out.

The serverless counterpart of `POST /v1/audio/transcriptions`: drives the
TranscriptionEngine directly (no HTTP), batching same-bucket clips into
single fused device dispatches (`engine.transcribe_batch`) so bulk jobs
run at the measured batch throughput (bench.py: hundreds of times real
time per chip) instead of one clip at a time. Long files route through
`engine.transcribe`'s silence-boundary segmentation, exactly like the
server path.

The reference stack has no offline runner — its closest tool is
src/debug_audio.py (decode inspection only); bulk work must loop over
HTTP uploads. Here:

    python -m qwen3_asr_tpu.tools.transcribe clips/*.wav --language english
    python -m qwen3_asr_tpu.tools.transcribe talk.flac --srt --timestamps
    MODEL_ID=/ckpt python -m qwen3_asr_tpu.tools.transcribe a.wav --json

Honors the same env surface as the server (MODEL_ID, QUANTIZE,
ASR_KV_CACHE_DTYPE, ASR_MESH_DP/TP, FORCED_ALIGNER_ID for --srt
accurate mode), so a tuned serving config is a tuned CLI config.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_args(argv):
    p = argparse.ArgumentParser(
        prog="python -m qwen3_asr_tpu.tools.transcribe",
        description="Batch-transcribe audio files with the TPU engine.")
    p.add_argument("files", nargs="+", help="audio files (wav/flac/mp3/ogg/"
                   "aiff/au; anything audio.codec decodes)")
    p.add_argument("--model", default=os.getenv("MODEL_ID"),
                   help="checkpoint dir or preset:<name> (default $MODEL_ID)")
    p.add_argument("--language", default=None,
                   help="full language name or code (e.g. english, zh); "
                   "omit for auto-detect")
    p.add_argument("--json", action="store_true", dest="as_json",
                   help="one JSON object per file on stdout")
    p.add_argument("--timestamps", action="store_true",
                   help="include word timestamps (JSON output)")
    p.add_argument("--srt", action="store_true",
                   help="write a .srt next to each file (or --output-dir)")
    p.add_argument("--srt-mode", default="fast", choices=("fast", "accurate"),
                   help="subtitle timing: fast=char-proportional, accurate="
                   "forced aligner (needs FORCED_ALIGNER_ID)")
    p.add_argument("--output-dir", default=None,
                   help="write .txt/.srt artifacts here instead of beside "
                   "the inputs")
    p.add_argument("--batch-size", type=int,
                   default=int(os.getenv("ASR_CLI_BATCH", "16")),
                   help="max clips per fused dispatch (default 16)")
    return p.parse_args(argv)


def _out_path(audio_path: str, ext: str, output_dir):
    base = os.path.splitext(os.path.basename(audio_path))[0] + ext
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        return os.path.join(output_dir, base)
    return os.path.join(os.path.dirname(audio_path) or ".", base)


def main(argv=None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])
    if not args.model:
        print("error: no model — pass --model or set MODEL_ID",
              file=sys.stderr)
        return 2

    from ..utils.platform import honor_platform_env
    honor_platform_env()

    from ..audio.codec import AudioDecodeError, decode_audio
    from ..runtime.engine import MAX_SEGMENT_S, TARGET_SR
    from ..runtime.lifecycle import _load_engine_sync
    from ..text.repetition import detect_and_fix_repetitions

    t0 = time.time()
    engine = _load_engine_sync(args.model)
    load_s = time.time() - t0

    if args.srt and args.srt_mode == "accurate":
        from ..sidecars.subtitle import load_aligner
        load_aligner()

    # Decode everything up front so batchable clips are known before the
    # first dispatch. Failures are reported per file, not fatal.
    clips, failures = {}, {}
    for path in args.files:
        try:
            with open(path, "rb") as fh:
                clips[path] = decode_audio(fh.read())
        except (OSError, AudioDecodeError) as e:
            failures[path] = str(e)

    from ..runtime.engine import _prep_audio
    # Word timestamps aren't batchable (per-clip aligner pass), so
    # --timestamps routes every clip through the single-clip path.
    short, long_ = [], []
    for path, (audio, sr) in clips.items():
        n16 = len(_prep_audio(audio, sr))
        batchable = n16 <= MAX_SEGMENT_S * TARGET_SR and not args.timestamps
        (short if batchable else long_).append(path)

    results = {}
    t1 = time.time()
    for i in range(0, len(short), max(1, args.batch_size)):
        batch = short[i:i + args.batch_size]
        out = engine.transcribe_batch([clips[p] for p in batch],
                                      language=args.language)
        for path, res in zip(batch, out):
            results[path] = [res]
    for path in long_:
        audio, sr = clips[path]
        results[path] = engine.transcribe(audio, sr, language=args.language,
                                          return_timestamps=args.timestamps)
    infer_s = time.time() - t1

    audio_s = sum(len(_prep_audio(a, sr)) / TARGET_SR
                  for a, sr in clips.values())
    exit_code = 0
    for path in args.files:
        if path in failures:
            print(json.dumps({"file": path, "error": failures[path]})
                  if args.as_json else f"{path}: ERROR {failures[path]}",
                  file=sys.stderr)
            exit_code = 1
            continue
        res = results[path]
        text = detect_and_fix_repetitions(
            " ".join(r.text for r in res if r.text).strip())
        record = {"file": path, "text": text,
                  "language": res[0].language if res else None}
        if args.timestamps:
            record["words"] = [w for r in res
                               for w in (getattr(r, "timestamps", None)
                                         or [])]
        if args.srt:
            from ..sidecars.subtitle import generate_srt_from_results
            audio, sr = clips[path]
            srt = generate_srt_from_results(res, audio, sr,
                                            mode=args.srt_mode)
            srt_path = _out_path(path, ".srt", args.output_dir)
            with open(srt_path, "w") as fh:
                fh.write(srt)
            record["srt"] = srt_path
        if args.output_dir:
            txt_path = _out_path(path, ".txt", args.output_dir)
            with open(txt_path, "w") as fh:
                fh.write(text + "\n")
            record["txt"] = txt_path
        print(json.dumps(record, ensure_ascii=False)
              if args.as_json else f"{path}\t{text}")

    print(f"[{len(results)}/{len(args.files)} files | {audio_s:.1f}s audio "
          f"in {infer_s:.2f}s ({audio_s / max(infer_s, 1e-9):.1f}x RT) | "
          f"model load {load_s:.1f}s]", file=sys.stderr)
    return exit_code


if __name__ == "__main__":
    raise SystemExit(main())
