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


def _out_paths(audio_paths, ext: str, output_dir):
    """Artifact path per input. Inside --output-dir, same-named inputs from
    different directories get disambiguated stems (clip.txt, clip_2.txt, ...)
    instead of silently overwriting each other."""
    out, used = {}, set()
    for path in audio_paths:
        if path in out:
            # Duplicate CLI arg: one artifact per input file — a second
            # pass would reserve the plain stem and write only the
            # disambiguated name.
            continue
        stem = os.path.splitext(os.path.basename(path))[0]
        if output_dir:
            candidate, n = stem, 1
            while candidate in used:
                n += 1
                candidate = f"{stem}_{n}"
            used.add(candidate)
            os.makedirs(output_dir, exist_ok=True)
            out[path] = os.path.join(output_dir, candidate + ext)
        else:
            out[path] = os.path.join(
                os.path.dirname(path) or ".", stem + ext)
    return out


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
    from ..serving.server import merge_results
    from ..text.repetition import detect_and_fix_repetitions

    # Fail fast on a missing aligner checkpoint BEFORE the (slow) engine
    # load — the server degrades gracefully mid-request; a CLI should just
    # exit with a clean message.
    if args.srt and args.srt_mode == "accurate":
        from ..sidecars.subtitle import FORCED_ALIGNER_ID, load_aligner
        try:
            load_aligner()
        except (OSError, ValueError) as e:
            print(f"error: --srt-mode accurate needs a loadable aligner "
                  f"checkpoint (FORCED_ALIGNER_ID={FORCED_ALIGNER_ID}): {e}",
                  file=sys.stderr)
            return 2

    t0 = time.time()
    engine = _load_engine_sync(args.model)
    load_s = time.time() - t0

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
    # Prep once here (resample/mono/float); the engine's own _prep_audio is
    # a no-op on already-16 kHz mono arrays, so nothing is converted twice.
    clips = {path: (_prep_audio(audio, sr), TARGET_SR)
             for path, (audio, sr) in clips.items()}
    # Word timestamps aren't batchable (per-clip aligner pass), so
    # --timestamps routes every clip through the single-clip path.
    short, long_ = [], []
    for path, (audio, _) in clips.items():
        batchable = (len(audio) <= MAX_SEGMENT_S * TARGET_SR
                     and not args.timestamps)
        (short if batchable else long_).append(path)

    results = {}
    t1 = time.time()
    bs = max(1, args.batch_size)
    for i in range(0, len(short), bs):
        batch = short[i:i + bs]
        out = engine.transcribe_batch([clips[p] for p in batch],
                                      language=args.language)
        for path, res in zip(batch, out):
            results[path] = [res]
    for path in long_:
        audio, sr = clips[path]
        results[path] = engine.transcribe(audio, sr, language=args.language,
                                          return_timestamps=args.timestamps)
    infer_s = time.time() - t1

    audio_s = sum(len(a) / TARGET_SR for a, _ in clips.values())
    ok_files = [p for p in args.files if p not in failures]
    srt_paths = _out_paths(ok_files, ".srt", args.output_dir)
    txt_paths = _out_paths(ok_files, ".txt", args.output_dir)
    exit_code = 0
    for path in args.files:
        if path in failures:
            print(json.dumps({"file": path, "error": failures[path]})
                  if args.as_json else f"{path}: ERROR {failures[path]}",
                  file=sys.stderr)
            exit_code = 1
            continue
        res = results[path]
        # Clean each segment in place BEFORE any use, exactly like the
        # server's SRT path (serving/server.py), so .srt and .txt agree.
        for r in res:
            r.text = detect_and_fix_repetitions(r.text)
        text, language, stamps = merge_results(res)
        record = {"file": path, "text": text, "language": language or None}
        if args.timestamps:
            record["words"] = stamps or []
        if args.srt:
            from ..sidecars.subtitle import generate_srt_from_results
            audio, sr = clips[path]
            srt = generate_srt_from_results(res, audio, sr,
                                            mode=args.srt_mode)
            with open(srt_paths[path], "w") as fh:
                fh.write(srt)
            record["srt"] = srt_paths[path]
        if args.output_dir:
            with open(txt_paths[path], "w") as fh:
                fh.write(text + "\n")
            record["txt"] = txt_paths[path]
        print(json.dumps(record, ensure_ascii=False)
              if args.as_json else f"{path}\t{text}")

    print(f"[{len(results)}/{len(args.files)} files | {audio_s:.1f}s audio "
          f"in {infer_s:.2f}s ({audio_s / max(infer_s, 1e-9):.1f}x RT) | "
          f"model load {load_s:.1f}s]", file=sys.stderr)
    return exit_code


if __name__ == "__main__":
    raise SystemExit(main())
