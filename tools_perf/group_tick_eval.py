"""Grouped prefix-cache streaming: per-cadence device cost of the three WS paths.

N concurrent streaming sessions each re-transcribe their sliding window
every 450 ms. The three server configurations under measurement:

  * batched  (ASR_WS_TICK_BATCH only): ONE batched resume dispatch per
    cadence, but every row re-encodes + re-prefills its whole window;
  * sessions (ASR_WS_PREFIX_CACHE only): each session's device work is
    proportional to its NEW audio, but N solo dispatches per cadence;
  * grouped  (both flags): one pooled-cache batched dispatch per cadence
    AND per-row recompute proportional to new audio
    (runtime/stream_group.StreamGroup).

Every tick verifies token equality across all three paths (each is
parity-locked to the fused resume path already; this checks them against
each other on identical windows). Caveat for tiny/overfit checkpoints:
first-tick (0.45 s) windows can decode DEGENERATE repetition loops whose
argmax sits on a numerical tie, and different executable shapes (batch-1
vs batch-N, full vs segment prefill) round those logits differently — a
mismatch that exists only inside degenerate outputs. Production-size
models on the real chip measure 0 mismatches (as do the solo-vs-fused and
serial-vs-batched evals); treat isolated cadence-0 mismatches on the
trained test checkpoint as tie noise, sustained mismatches as bugs. The headline is per-cadence device time
(wall minus the no-op host<->device round trips each path pays: N for solo
sessions, 1 for the batched paths) and the implied device-bound session
capacity at the 450 ms cadence.

Medians exclude a warm region covering the FULL window-growth sweep
(default ceil(cap/tick)+2 cadences), so seg_start-rung and encoder-block
compiles never land inside the timed region; mismatches are reported
warm vs sustained separately (warm ties on tiny checkpoints are noise,
sustained ones are bugs).

    python tools_perf/group_tick_eval.py                     # real chip
    JAX_PLATFORMS=cpu python tools_perf/group_tick_eval.py   # CPU check
    [--model e2e/data/trained_ckpt | preset:1.7b] [--sessions 8] [--cap 6.0]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="e2e/data/trained_ckpt")
    parser.add_argument("--sessions", type=int, default=8)
    parser.add_argument("--cap", type=float, default=6.0)
    parser.add_argument("--tick", type=float, default=0.45)
    parser.add_argument("--data-dir", default="e2e/data/real")
    parser.add_argument("--cadences", type=int, default=20)
    parser.add_argument("--warm", type=int, default=None,
                        help="warm cadences excluded from medians; default "
                             "covers the FULL window-growth sweep (ceil(cap/"
                             "tick)+2) so every seg_start rung and encoder-"
                             "block shape compiles before timing starts")
    parser.add_argument("--skip-solo", action="store_true",
                        help="skip the N-solo-sessions arm (faster)")
    args = parser.parse_args()

    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import numpy as np
    from pathlib import Path

    from qwen3_asr_tpu.audio.codec import decode_audio
    from qwen3_asr_tpu.audio.frontend import fir_bandpass_kernel
    from qwen3_asr_tpu.audio import native
    from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
    from qwen3_asr_tpu.runtime.lifecycle import _load_engine_sync

    enable_compilation_cache()
    engine = _load_engine_sync(os.path.abspath(args.model)
                               if os.path.isdir(args.model) else args.model)

    clips = []
    for p in sorted(Path(args.data_dir).glob("*.wav")):
        audio, sr = decode_audio(p.read_bytes())
        clips.append(np.asarray(audio, np.float32))
    if not clips:
        print(json.dumps({"error": f"no fixtures in {args.data_dir}"}))
        return

    n = args.sessions
    slots = 1 << (n - 1).bit_length()          # group sized to hold all N
    kernel = fir_bandpass_kernel()
    cap = int(args.cap * 16000)
    tick_n = int(args.tick * 16000)
    frames, bucket_s = engine.bucket_frames(cap)
    lang = "en"

    members = [engine.stream_group_member(args.cap, lang, slots=slots)
               for _ in range(n)]
    solos = ([engine.stream_session(args.cap, lang) for _ in range(n)]
             if not args.skip_solo else [])
    chunk_samples = members[0].group.plan.chunk_frames * 160

    # Sync-overhead baseline (see stream_tick_eval.py). Per cadence the
    # batched paths pay ~1 round trip, N solo sessions pay ~N.
    import jax
    import jax.numpy as jnp
    noop = jax.jit(lambda x: x + 1)
    jax.block_until_ready(noop(jnp.zeros(8, jnp.int32)))
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.device_get(noop(jnp.zeros(8, jnp.int32)))
        rtts.append(time.perf_counter() - t0)
    rtt = statistics.median(rtts)

    srcs = [clips[i % len(clips)] for i in range(n)]
    offsets = [int(i * 0.8 * 16000) for i in range(n)]
    windows = [np.zeros(0, np.float32) for _ in range(n)]
    prev_batch = [[] for _ in range(n)]

    t_group, t_batched, t_solo = [], [], []
    # Warm cadences cover the FULL window-growth region (windows keep
    # growing until they hit the cap, compiling new shapes along the way)
    # — timing them would fold tunnel compiles into the medians.
    warm = (args.warm if args.warm is not None
            else -(-cap // tick_n) + 2)
    # Mismatches split by phase: cadence-0/warm ticks on tiny checkpoints
    # can argmax-tie inside DEGENERATE outputs (see module docstring) and a
    # tick-batch-arm tie cascades through its self-seeded resume chain —
    # only SUSTAINED (post-warm) mismatches indicate real divergence.
    mismatches_warm = mismatches = 0
    mismatch_cadences = []

    for cad in range(args.cadences + warm):
        filts = []
        for i in range(n):
            src, off = srcs[i], offsets[i] + cad * tick_n
            chunk = src[off % len(src):(off % len(src)) + tick_n]
            if len(chunk) < tick_n:  # wrap around the clip
                chunk = np.concatenate([chunk, src[:tick_n - len(chunk)]])
            w = np.concatenate([windows[i], chunk.astype(np.float32)])
            if len(w) > cap:
                # chunk-quantized trim, like the server's sliding window
                trim = -(-(len(w) - cap) // chunk_samples) * chunk_samples
                w = w[trim:]
            windows[i] = w
            filts.append(native.fir_same(w, kernel))

        # grouped: one pooled-cache dispatch for all N members
        t0 = time.perf_counter()
        group_out = members[0].group.tick(list(zip(members, filts)))
        t_grp = time.perf_counter() - t0

        # tick-batch only: one batched resume, full re-encode per row.
        # Same filtered windows as the other arms (the engine pads to the
        # bucket internally) so token parity is meaningful.
        t0 = time.perf_counter()
        _, batch_ids = engine._run_bucket(
            filts, frames, bucket_s, lang, resume_rows=prev_batch)
        t_bat = time.perf_counter() - t0

        # prefix-cache only: N solo session dispatches
        t_sol = None
        if solos:
            t0 = time.perf_counter()
            solo_out = [solos[i].update(filts[i]) for i in range(n)]
            t_sol = time.perf_counter() - t0

        for i in range(n):
            diverged = False
            if group_out[i][1] != batch_ids[i]:
                diverged = True
                print(json.dumps({"mismatch": "grouped_vs_tickbatch",
                                  "cadence": cad, "session": i,
                                  "grouped": group_out[i][1],
                                  "tickbatch": batch_ids[i]}))
            if solos and solo_out[i][1] != group_out[i][1]:
                diverged = True
                print(json.dumps({"mismatch": "solo_vs_grouped",
                                  "cadence": cad, "session": i,
                                  "solo": solo_out[i][1],
                                  "grouped": group_out[i][1]}))
            if diverged:
                mismatch_cadences.append(cad)
                if cad < warm:
                    mismatches_warm += 1
                else:
                    mismatches += 1
            prev_batch[i] = batch_ids[i]
        if cad >= warm:
            t_group.append(t_grp)
            t_batched.append(t_bat)
            if t_sol is not None:
                t_solo.append(t_sol)

    grp_p50 = statistics.median(t_group)
    bat_p50 = statistics.median(t_batched)
    grp_dev = max(grp_p50 - rtt, 1e-6)
    bat_dev = max(bat_p50 - rtt, 1e-6)
    out = {
        "sessions": n,
        "slots": slots,
        "cadences": args.cadences,
        "bucket_s": bucket_s,
        "sync_rtt_ms": round(rtt * 1000, 2),
        "grouped_ms_p50": round(grp_p50 * 1000, 2),
        "tickbatch_ms_p50": round(bat_p50 * 1000, 2),
        "grouped_device_ms_p50": round(grp_dev * 1000, 2),
        "tickbatch_device_ms_p50": round(bat_dev * 1000, 2),
        "grouped_vs_tickbatch_device": round(bat_dev / grp_dev, 2),
        "capacity_tickbatch": round(n * args.tick / bat_dev, 1),
        "capacity_grouped": round(n * args.tick / grp_dev, 1),
        "warm_cadences": warm,
        "mismatches_sustained": mismatches,
        "mismatches_warm": mismatches_warm,
        "mismatch_cadences": sorted(set(mismatch_cadences)),
    }
    if t_solo:
        sol_p50 = statistics.median(t_solo)
        sol_dev = max(sol_p50 - n * rtt, 1e-6)
        out.update({
            "solo_sessions_ms_p50": round(sol_p50 * 1000, 2),
            "solo_sessions_device_ms_p50": round(sol_dev * 1000, 2),
            "grouped_vs_solo_device": round(sol_dev / grp_dev, 2),
            "capacity_solo_sessions": round(n * args.tick / sol_dev, 1),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
