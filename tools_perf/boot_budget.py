"""Boot-to-first-token budget: where does server startup time go, and can
AOT-serialized executables beat the persistent compile cache?

The reference stack boots by deserializing TensorRT engines from disk
(/root/reference/src/model.py engine-load path); our equivalent boot cost
is XLA compile-or-cache-load per bucket executable. Round-3 measured the
full 12-executable warmup sweep at ~213 s on a WARM disk cache over the
tunnel (serial remote program loads) and threaded warmup at 384 s
(negative — the tunnel serializes cache loads). This tool breaks the boot
path down and tests the remaining idea from the round-3 verdict (#9):
pre-serialized executables via jax.experimental.serialize_executable,
which skip BOTH tracing and compilation — if the tunnel's program-load
step dominates even that, the AOT route is dead on this link and the
negative gets recorded.

Phases (each runs in its own subprocess so in-memory jit caches can't
flatter later phases):

  warm       import → engine build → per-bucket batch-1 lower+compile on
             the warm disk cache → first transcription (boot-to-first-token)
  sweep      serving-boot sweep through transcribe() per bucket; --aot-dir
             routes it through the AOT blob cache (run twice: build, boot)
  aot-save   compile one bucket executable, serialize (blob + arg trees)
             to --blob
  aot-load   fresh process: deserialize_and_load(blob) + first execution,
             timed — the AOT boot path
  recompile  fresh process: lower+compile the SAME executable against the
             warm disk cache + first execution, timed — the head-to-head
  cold       fresh process, EMPTY temp compile-cache dir, one small-bucket
             compile, timed — the true cold-boot bound (one bucket only;
             a full cold sweep costs tens of minutes over the tunnel)

  --all      drive every phase via subprocess and print one JSON summary

Usage:
    JAX_COMPILATION_CACHE_DIR=~/.cache/qwen3_asr_tpu_xla \
        python tools_perf/boot_budget.py --all [--preset 1.7b] [--bucket 6]
"""
import argparse
import json
import os
import pickle
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _engine(preset):
    """Zero-init engine in the serving default config (bench.build_engine:
    same quantization env contract as the scoreboard)."""
    import jax.numpy as jnp
    import bench
    dtype = jnp.bfloat16
    return bench.build_engine(preset, dtype)


def _abstract_args(engine, bf, batch=1):
    import jax
    import numpy as np
    from qwen3_asr_tpu.runtime.engine import HOP_LENGTH, PREFIX_BUDGET
    return (engine.model.params,
            jax.ShapeDtypeStruct((batch, bf * HOP_LENGTH), np.int16),
            jax.ShapeDtypeStruct((batch, PREFIX_BUDGET), np.int32),
            jax.ShapeDtypeStruct((batch,), np.int32))


def _boot_fn(engine, bf, bs):
    """Plain-tuple-output wrapper around the fused executable so the arg
    trees pickle (the raw fused fn's output tree may hold NamedTuples the
    serializer can't round-trip across processes)."""
    import jax
    fn = engine._fused_fn(bf, bs)

    @jax.jit
    def boot(params, audio, prefix_ids, valid_from):
        return tuple(jax.tree.leaves(fn(params, audio, prefix_ids,
                                        valid_from)))
    return boot


def _concrete_args(engine, bf, batch=1):
    import jax.numpy as jnp
    import numpy as np
    from qwen3_asr_tpu.runtime.engine import HOP_LENGTH, PREFIX_BUDGET
    prefix, valid_from = engine.padded_prefix("en", "", batch)
    return (engine.model.params,
            jnp.zeros((batch, bf * HOP_LENGTH), jnp.int16),
            jnp.asarray(np.asarray(prefix)),
            jnp.asarray(np.asarray(valid_from)))


def phase_warm(args):
    t0 = time.time()
    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    from qwen3_asr_tpu.runtime.engine import (AUDIO_BUCKETS_S,
                                              enable_compilation_cache)
    enable_compilation_cache()
    t_import = time.time() - t0

    t0 = time.time()
    engine = _engine(args.preset)
    jax.block_until_ready(engine.model.params)
    t_engine = time.time() - t0

    per_bucket = {}
    for bs in AUDIO_BUCKETS_S:
        bf, bs_eff = engine.bucket_frames(int(bs * 16000))
        fn = engine._fused_fn(bf, bs_eff)
        t0 = time.time()
        fn.lower(*_abstract_args(engine, bf)).compile()
        per_bucket[str(bs)] = round(time.time() - t0, 2)

    # boot-to-first-token: one real 6 s request through transcribe()
    import numpy as np
    t0 = time.time()
    engine.transcribe(np.zeros(16000 * 6, np.float32), 16000, language="en")
    t_first = time.time() - t0
    print(json.dumps({
        "phase": "warm", "backend": jax.default_backend(),
        "import_s": round(t_import, 2), "engine_build_s": round(t_engine, 2),
        "per_bucket_compile_s": per_bucket,
        "bucket_sweep_total_s": round(sum(per_bucket.values()), 2),
        "first_token_s": round(t_first, 2),
    }))


def phase_sweep(args):
    """Serving-boot sweep through the PUBLIC path: first transcribe() per
    bucket (batch 1), which is exactly what server warmup pays. With
    --aot-dir set the engine routes through the AOT blob cache
    (runtime/aot_cache.py): run once to build blobs, again to measure the
    blob-boot sweep. Without it, the warm XLA disk cache is the boot path."""
    if args.aot_dir:
        os.environ["ASR_AOT_CACHE_DIR"] = args.aot_dir
    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    import numpy as np
    from qwen3_asr_tpu.runtime.engine import (AUDIO_BUCKETS_S,
                                              enable_compilation_cache)
    enable_compilation_cache()
    t0 = time.time()
    engine = _engine(args.preset)
    jax.block_until_ready(engine.model.params)
    t_engine = time.time() - t0
    # The one-time first-fetch cost (engine.warm_d2h_path_async fires at
    # engine build) is a PROCESS cost, not a bucket cost: join it here
    # and report it on its own line so per-bucket numbers stay honest.
    t0 = time.time()
    engine._d2h_warm.wait()
    t_d2h = time.time() - t0
    per_bucket = {}
    t_sweep = time.time()
    for bs in AUDIO_BUCKETS_S:
        t0 = time.time()
        engine.transcribe(np.zeros(int(16000 * bs), np.float32), 16000,
                          language="en")
        per_bucket[str(bs)] = round(time.time() - t0, 2)
    print(json.dumps({
        "phase": "sweep", "backend": jax.default_backend(),
        "aot": bool(args.aot_dir), "engine_build_s": round(t_engine, 2),
        "d2h_warm_s": round(t_d2h, 2),
        "per_bucket_first_transcribe_s": per_bucket,
        "sweep_total_s": round(time.time() - t_sweep, 2),
    }))


def phase_aot_save(args):
    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    from jax.experimental import serialize_executable as se
    from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
    enable_compilation_cache()
    engine = _engine(args.preset)
    bf, bs = engine.bucket_frames(int(args.bucket * 16000))
    boot = _boot_fn(engine, bf, bs)
    t0 = time.time()
    compiled = boot.lower(*_abstract_args(engine, bf)).compile()
    t_compile = time.time() - t0
    t0 = time.time()
    blob, in_tree, out_tree = se.serialize(compiled)
    payload = pickle.dumps((blob, in_tree, out_tree))
    t_ser = time.time() - t0
    with open(args.blob, "wb") as f:
        f.write(payload)
    print(json.dumps({
        "phase": "aot-save", "backend": jax.default_backend(),
        "bucket_s": bs, "compile_s": round(t_compile, 2),
        "serialize_s": round(t_ser, 2),
        "blob_mb": round(len(payload) / 1e6, 1),
    }))


def _load_common(args):
    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
    enable_compilation_cache()
    engine = _engine(args.preset)
    jax.block_until_ready(engine.model.params)
    bf, bs = engine.bucket_frames(int(args.bucket * 16000))
    return jax, engine, bf, bs


def phase_aot_load(args):
    jax, engine, bf, bs = _load_common(args)
    from jax.experimental import serialize_executable as se
    with open(args.blob, "rb") as f:
        blob, in_tree, out_tree = pickle.loads(f.read())
    t0 = time.time()
    compiled = se.deserialize_and_load(blob, in_tree, out_tree)
    t_load = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(compiled(*_concrete_args(engine, bf)))
    t_exec = time.time() - t0
    print(json.dumps({
        "phase": "aot-load", "backend": jax.default_backend(),
        "bucket_s": bs, "deserialize_load_s": round(t_load, 2),
        "first_exec_s": round(t_exec, 2),
        "boot_total_s": round(t_load + t_exec, 2),
    }))


def phase_recompile(args):
    jax, engine, bf, bs = _load_common(args)
    boot = _boot_fn(engine, bf, bs)
    t0 = time.time()
    compiled = boot.lower(*_abstract_args(engine, bf)).compile()
    t_compile = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(compiled(*_concrete_args(engine, bf)))
    t_exec = time.time() - t0
    print(json.dumps({
        "phase": "recompile", "backend": jax.default_backend(),
        "bucket_s": bs, "warm_cache_compile_s": round(t_compile, 2),
        "first_exec_s": round(t_exec, 2),
        "boot_total_s": round(t_compile + t_exec, 2),
    }))


def phase_cold(args):
    import tempfile
    os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
        prefix="xla_cold_")
    jax, engine, bf, bs = _load_common(args)
    fn = engine._fused_fn(bf, bs)
    t0 = time.time()
    fn.lower(*_abstract_args(engine, bf)).compile()
    t_compile = time.time() - t0
    print(json.dumps({
        "phase": "cold", "backend": jax.default_backend(),
        "bucket_s": bs, "cold_compile_s": round(t_compile, 2),
    }))


def phase_server(args):
    """Boot the REAL worker process (eager load + FULL bucket warmup, the
    production gateway-mode boot) to READY, then first token over HTTP.

    --aot-dir routes every fused executable through the AOT blob cache
    (runtime/aot_cache.py). Run it twice at the same dir: the first boot
    compiles + serializes blobs (build), the second is the AOT boot the
    reference's TRT-engine deserialization story maps to
    (reference src/server.py engine-load path)."""
    import urllib.request
    port = int(os.getenv("BOOT_BUDGET_PORT", "18310"))
    env = dict(os.environ)
    env["MODEL_ID"] = f"preset:{args.preset}"
    env["IDLE_TIMEOUT"] = "0"
    env.pop("SKIP_WARMUP", None)          # warmup IS the boot being measured
    if args.aot_dir:
        env["ASR_AOT_CACHE_DIR"] = args.aot_dir
    else:
        env.pop("ASR_AOT_CACHE_DIR", None)
    logpath = f"/tmp/boot_budget_server_{port}.log"
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "qwen3_asr_tpu.serving.worker",
         "--port", str(port)],
        env=env, cwd=REPO, stdout=open(logpath, "wb"),
        stderr=subprocess.STDOUT)
    ready_s = None
    try:
        while time.time() - t0 < 3000:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"worker died rc={proc.returncode}; log tail: "
                    + open(logpath, errors="replace").read()[-800:])
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/health", timeout=2) as r:
                    if r.status == 200:
                        ready_s = time.time() - t0
                        break
            except Exception:
                time.sleep(1.0)
        if ready_s is None:
            raise RuntimeError("worker never became ready")

        import numpy as np
        from qwen3_asr_tpu.audio.codec import encode_wav
        rng = np.random.default_rng(0)
        wav = encode_wav(
            (rng.standard_normal(16000 * 6) * 0.02).astype(np.float32), 16000)
        boundary = b"bb-boot-budget"
        body = (b"--" + boundary + b"\r\n"
                b'Content-Disposition: form-data; name="file"; '
                b'filename="a.wav"\r\nContent-Type: audio/wav\r\n\r\n'
                + wav + b"\r\n--" + boundary + b"--\r\n")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary.decode()}"})
        t1 = time.time()
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200, r.status
            r.read()
        first_s = time.time() - t1
    finally:
        proc.terminate()
        proc.wait(timeout=30)
    print(json.dumps({
        "phase": "server", "aot": bool(args.aot_dir),
        "boot_to_ready_s": round(ready_s, 2),
        "first_request_after_ready_s": round(first_s, 2),
        "boot_to_first_token_s": round(ready_s + first_s, 2),
    }))


def drive_server(args):
    """Three full-server boots: warm XLA cache, AOT build, AOT boot."""
    import shutil
    import tempfile
    aot_dir = tempfile.mkdtemp(prefix="boot_budget_aot_")
    plan = [("warm_cache", []),
            ("aot_build", ["--aot-dir", aot_dir]),
            ("aot_boot", ["--aot-dir", aot_dir])]
    results = {}
    try:
        for name, extra in plan:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--phase", "server", "--preset", args.preset] + extra
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=3600, cwd=REPO)
            line = ([ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")] or [None])[-1]
            results[name] = (json.loads(line) if line and p.returncode == 0
                             else {"error": (p.stderr or p.stdout)[-800:]})
        blobs = [f for f in os.listdir(aot_dir)] if os.path.isdir(aot_dir) \
            else []
        results["aot_blobs"] = {
            "count": len(blobs),
            "total_mb": round(sum(os.path.getsize(os.path.join(aot_dir, f))
                                  for f in blobs) / 1e6, 1)}
        wc = results.get("warm_cache", {})
        ab = results.get("aot_boot", {})
        if "boot_to_ready_s" in wc and "boot_to_ready_s" in ab:
            results["aot_vs_warm_cache_boot"] = round(
                wc["boot_to_ready_s"] / max(ab["boot_to_ready_s"], 1e-9), 2)
    finally:
        shutil.rmtree(aot_dir, ignore_errors=True)
    print(json.dumps(results, indent=1))


def drive_all(args):
    results = {}
    blob = args.blob
    plan = [("warm", []),
            ("aot-save", ["--bucket", str(args.bucket), "--blob", blob]),
            ("aot-load", ["--bucket", str(args.bucket), "--blob", blob]),
            ("recompile", ["--bucket", str(args.bucket)]),
            ("cold", ["--bucket", str(args.cold_bucket)])]
    for phase, extra in plan:
        cmd = [sys.executable, os.path.abspath(__file__), "--phase", phase,
               "--preset", args.preset] + extra
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=3600, cwd=REPO)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1] if "{" in p.stdout else None
        if p.returncode != 0 or line is None:
            results[phase] = {"error": (p.stderr or p.stdout)[-800:]}
        else:
            results[phase] = json.loads(line)
    if os.path.exists(blob):
        os.unlink(blob)
    al, rc = results.get("aot-load", {}), results.get("recompile", {})
    if "boot_total_s" in al and "boot_total_s" in rc:
        results["aot_vs_warm_cache"] = round(
            rc["boot_total_s"] / max(al["boot_total_s"], 1e-9), 2)
    print(json.dumps(results, indent=1))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--phase", default=None,
                        choices=["warm", "sweep", "aot-save", "aot-load",
                                 "recompile", "cold", "server"])
    parser.add_argument("--server-boot", action="store_true",
                        help="three FULL worker boots: warm cache / AOT "
                             "build / AOT boot (boot-to-ready + first token)")
    parser.add_argument("--aot-dir", default="",
                        help="ASR_AOT_CACHE_DIR for --phase sweep")
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--preset", default="1.7b")
    parser.add_argument("--bucket", type=float, default=6.0)
    parser.add_argument("--cold-bucket", type=float, default=1.0)
    parser.add_argument("--blob", default="/tmp/boot_budget_aot.bin")
    args = parser.parse_args()
    if args.all:
        drive_all(args)
    elif args.server_boot:
        drive_server(args)
    else:
        {"warm": phase_warm, "sweep": phase_sweep,
         "aot-save": phase_aot_save, "aot-load": phase_aot_load,
         "recompile": phase_recompile, "cold": phase_cold,
         "server": phase_server}[
             args.phase or "warm"](args)


if __name__ == "__main__":
    main()
