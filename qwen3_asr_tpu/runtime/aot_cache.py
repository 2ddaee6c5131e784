"""AOT executable cache: serialized XLA executables for instant boot.

The reference boots by deserializing pre-built TensorRT engines from disk
(reference ``src/model.py`` engine-load path; its docs/TENSORRT.md sells
this as the zero-compile boot). The TPU-native analogue is
``jax.experimental.serialize_executable``: a compiled executable
round-trips through a blob, skipping tracing, compile-cache lookup, AND
the remote compile RPC on tunnel-attached chips. Measured head-to-head
(``tools_perf/boot_budget.py``, 2026-08-19, 1.7B quantized default):
1.41 s blob boot vs 6.21 s warm-disk-cache recompile per executable —
4.4×. Opt-in via ``ASR_AOT_CACHE_DIR``.

Dispatch design: the engine's fused fns are ``jax.jit`` callables invoked
at several batch shapes. :class:`AotCache.wrap` returns a callable facade
that keys on the non-param argument shapes per call — blob hit → run the
deserialized executable; miss → compile through the jitted path once,
serialize, and use the compiled object directly (no double work). Any
serialization failure falls back to the plain jit fn with a warning:
the cache can only ever ADD boot speed, never correctness risk beyond
the staleness contract below.

Staleness contract: blobs are fingerprinted by model config, engine
dtypes, the program-shaping env knobs, argument avals, jax version,
device fingerprint, the package version, AND a content hash of the
package source itself (every ``qwen3_asr_tpu/**/*.py`` +
``native/*.cpp`` file's bytes — cheap: ~1 ms of hashing, no tracing).
Any source edit therefore invalidates all blobs automatically; the
previous contract ("clear the dir on upgrades", relying on a
``__version__`` bump) is closed. Hashing the traced program itself would
require tracing, which is the cost being skipped — the source hash is
the no-tracing proxy that is conservative in the safe direction (it can
only over-invalidate, never serve a stale program). The reference's TRT
engine caches are weaker still (engines are rebuilt only when their
filename-versioning says so).
"""
from __future__ import annotations

import hashlib
import json
import os
import pickle
import tempfile
import time
from typing import Optional

import jax

from ..utils.logging import log

# Env knobs that change the TRACED program for the same config + shapes.
_PROGRAM_ENV = ("QUANTIZE", "ASR_KV_CACHE_DTYPE", "ASR_INT8_ACT",
                "ASR_INT8_ACT_MIN_TOKENS", "ASR_INT4_GROUP",
                "ASR_QUANTIZE_EMBED", "ASR_ATTN_BACKEND",
                "ASR_DECODER_UNROLL")

_FALLBACK = object()   # sentinel: this shape permanently uses the jit fn

_source_hash_cache: dict[str, str] = {}


def package_source_hash(pkg_root: Optional[str] = None) -> str:
    """Content hash of the package's program-defining source.

    Covers every ``.py`` under the installed ``qwen3_asr_tpu`` tree plus
    any ``native/*.cpp``/``*.h`` (the C++ DSP feeds preprocessing that the
    traced programs consume). Order-stable (sorted relative paths), bytes
    not mtimes, so it is deterministic across machines and rebuilds.
    Cached per-process for the installed tree (it cannot change under a
    running server without a restart); an explicit ``pkg_root`` bypasses
    the cache so tests can hash mutating trees.
    """
    default_root = pkg_root is None
    if default_root:
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
        cached = _source_hash_cache.get(pkg_root)
        if cached is not None:
            return cached
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in sorted(filenames):
            if not (fn.endswith(".py") or fn.endswith(".cpp")
                    or fn.endswith(".h")):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, pkg_root)
            h.update(rel.encode())
            with open(full, "rb") as f:
                h.update(f.read())
    digest = h.hexdigest()[:16]
    if default_root:
        _source_hash_cache[pkg_root] = digest
    return digest


class AotCache:
    """Directory of serialized executables for one engine configuration."""

    @classmethod
    def from_env(cls, engine) -> Optional["AotCache"]:
        path = os.getenv("ASR_AOT_CACHE_DIR")
        if not path:
            return None
        # Sharded executables serialize too, but their blobs bake in a
        # specific device assignment; multi-chip boot cost is dominated by
        # weight placement anyway. Keep the cache for unsharded engines
        # until a multi-chip boot budget motivates more. (Lifecycle shards
        # params BEFORE engine construction, so this check is load-order
        # safe; a multi-device host with single-device serving still
        # benefits.)
        leaf = next(iter(jax.tree.leaves(engine.model.params)), None)
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None and len(sharding.device_set) > 1:
            log.warning("ASR_AOT_CACHE_DIR ignored: params sharded over "
                        "{} devices (single-device only)",
                        len(sharding.device_set))
            return None
        return cls(path, engine)

    def __init__(self, path: str, engine):
        from .checkpoint import config_to_dict
        from .. import __version__
        self.path = os.path.abspath(os.path.expanduser(path))
        os.makedirs(self.path, exist_ok=True)
        dev = jax.devices()[0]
        static = {
            "pkg": __version__,
            "src": package_source_hash(),
            "jax": jax.__version__,
            "device": f"{dev.platform}/{getattr(dev, 'device_kind', '?')}",
            "config": config_to_dict(engine.model.cfg),
            "dtype": str(engine.dtype), "cache_dtype": str(engine.cache_dtype),
            "env": {k: os.getenv(k, "") for k in _PROGRAM_ENV},
        }
        self._static_fp = hashlib.sha256(
            json.dumps(static, sort_keys=True).encode()).hexdigest()[:16]
        # Params avals fingerprint (quantization changes leaf dtypes/shapes,
        # so this catches a params/blob mismatch the static env might miss).
        leaves = jax.tree_util.tree_leaves_with_path(engine.model.params)
        self._params_fp = hashlib.sha256(repr(
            [(jax.tree_util.keystr(p), tuple(x.shape), str(x.dtype))
             for p, x in leaves]).encode()).hexdigest()[:16]

    def wrap(self, jit_fn, label: str):
        return _AotFn(self, jit_fn, label)

    def blob_path(self, label: str, arg_key) -> str:
        digest = hashlib.sha256(
            f"{self._static_fp}:{self._params_fp}:{label}:{arg_key!r}"
            .encode()).hexdigest()[:20]
        return os.path.join(self.path, f"{label}-{digest}.aotx")


class _AotFn:
    """Shape-dispatching facade over one jitted fused fn.

    ``__call__(params, *rest)`` keys on the shapes/dtypes of ``rest`` (the
    params tree is fixed per engine). ``lower`` passes through to the jit
    fn so cost-analysis callers keep working.
    """

    def __init__(self, cache: AotCache, jit_fn, label: str):
        self._cache = cache
        self._jit_fn = jit_fn
        self._label = label
        self._entries = {}

    def lower(self, *args, **kw):
        return self._jit_fn.lower(*args, **kw)

    def __call__(self, params, *rest):
        key = tuple((tuple(a.shape), str(a.dtype)) for a in rest)
        entry = self._entries.get(key)
        if entry is not None:
            if entry is _FALLBACK:
                return self._jit_fn(params, *rest)
            return entry(params, *rest)
        entry, result = self._load_or_build(params, rest, key)
        self._entries[key] = entry
        return result

    def _load_or_build(self, params, rest, key):
        """First call at this shape: load-or-build the blob AND produce the
        call's result (the trial run proves a loaded blob actually executes
        on this topology before it is trusted; a stale-topology blob falls
        through to recompile-and-overwrite instead of crashing serving)."""
        from jax.experimental import serialize_executable as se
        fname = self._cache.blob_path(self._label, key)
        # Pin execution to the device the params live on:
        # deserialize_and_load defaults to ALL backend devices, which
        # mismatches single-device executables on multi-device hosts.
        leaf = next(iter(jax.tree.leaves(params)), None)
        try:
            devs = sorted(leaf.devices(), key=lambda d: d.id)
        except Exception:
            devs = [jax.devices()[0]]
        if os.path.exists(fname):
            try:
                t0 = time.time()
                with open(fname, "rb") as f:
                    loaded = se.deserialize_and_load(
                        *pickle.loads(f.read()), execution_devices=devs)
                # Dispatch is async: a broken deserialized executable
                # raises when the result is CONSUMED, which without this
                # block happens outside the guard and 500s the request
                # (seen on XLA:CPU after an unload/reload cycle:
                # "Buffer Definition Event: Function ... not found").
                # Block here so the trial truly proves execution.
                result = jax.block_until_ready(loaded(params, *rest))
                log.info("AOT blob loaded: {} in {:.2f}s",
                         os.path.basename(fname), time.time() - t0)
                return loaded, result
            except Exception as e:
                log.warning("AOT blob {} unusable ({}); recompiling",
                            os.path.basename(fname), e)
        try:
            avals = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                (params, *rest))
            t0 = time.time()
            compiled = self._jit_fn.lower(*avals).compile()
            payload = pickle.dumps(se.serialize(compiled))
            # Atomic publish: a crashed writer must never leave a torn
            # blob that a later boot trusts.
            fd, tmp = tempfile.mkstemp(dir=self._cache.path, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            os.replace(tmp, fname)
            log.info("AOT blob saved: {} ({:.1f} MB, compile {:.2f}s)",
                     os.path.basename(fname), len(payload) / 1e6,
                     time.time() - t0)
            return compiled, compiled(params, *rest)
        except Exception as e:  # pragma: no cover - backend-dependent
            log.warning("AOT serialization unavailable for {} ({}); "
                        "falling back to jit", self._label, e)
            return _FALLBACK, self._jit_fn(params, *rest)
