"""Device mesh + parameter shardings (DP × TP over ICI).

Net-new capability vs the reference (which is strictly single-GPU,
SURVEY.md §2.3): the same functional model runs on 1 chip or a pod slice.
Sharding recipe (scaling-book style):

* mesh axes ``("dp", "tp")`` — batch rides ``dp``; weight matmul axes ride
  ``tp`` so XLA inserts all-reduce/all-gathers on ICI.
* decoder: q/k/v/gate/up projections shard their OUTPUT features on tp
  (head-parallel attention — GQA co-locates each KV head with its query
  group, zero communication inside attention); o/down projections shard
  their INPUT features, producing partial sums that XLA all-reduces.
* KV cache shards its head axis on tp and batch on dp automatically via
  propagation from the Q/K/V shardings.
* encoder: same pattern on the MHA/FFN projections.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        # Default: favor TP up to the KV-head count (8), rest DP.
        tp = min(8, n)
        while n % tp:
            tp //= 2
        dp = n // tp
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp})×tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def decoder_param_specs() -> dict:
    """PartitionSpecs matching models.decoder's stacked-layer pytree."""
    return {
        "embed": P("tp", None),             # vocab-sharded embedding
        "layers": {
            "ln1": P(None, None),
            "ln2": P(None, None),
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "w_gate": P(None, None, "tp"),
            "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        },
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
    }


def encoder_param_specs() -> dict:
    return {
        "conv1_w": P(), "conv1_b": P(), "conv2_w": P(), "conv2_b": P(),
        "conv3_w": P(), "conv3_b": P(),
        "conv_out_w": P(None, "tp"),
        "layers": {
            "ln1_w": P(None, None), "ln1_b": P(None, None),
            "wq": P(None, None, "tp"), "bq": P(None, "tp"),
            "wk": P(None, None, "tp"), "bk": P(None, "tp"),
            "wv": P(None, None, "tp"), "bv": P(None, "tp"),
            "wo": P(None, "tp", None), "bo": P(None, None),
            "ln2_w": P(None, None), "ln2_b": P(None, None),
            "fc1_w": P(None, None, "tp"), "fc1_b": P(None, "tp"),
            "fc2_w": P(None, "tp", None), "fc2_b": P(None, None),
        },
        "ln_post_w": P(None), "ln_post_b": P(None),
        "proj1_w": P(None, "tp"), "proj1_b": P("tp"),
        "proj2_w": P("tp", None), "proj2_b": P(None),
    }


def _tree_shard(tree, specs, mesh: Mesh):
    def place(x, spec):
        # Drop specs that don't divide the actual dims (tiny test models,
        # and the size-1 axes of quantization scale tensors).
        clean = []
        for dim, axis in zip(x.shape, tuple(spec) + (None,) * x.ndim):
            if axis is None:
                clean.append(None)
            else:
                size = mesh.shape[axis] if isinstance(axis, str) else \
                    int(np.prod([mesh.shape[a] for a in axis]))
                clean.append(axis if dim % size == 0 else None)
        return jax.device_put(x, NamedSharding(mesh, P(*clean)))

    def place_leaf(x, spec):
        # Quantized leaves are {"q","s"} dicts: the values tensor takes the
        # weight's spec; the per-output-channel scale reuses it too (its
        # size-1 reduced axes are dropped by the divisibility cleanup).
        if isinstance(x, dict) and set(x.keys()) == {"q", "s"}:
            return {"q": place(x["q"], spec), "s": place(x["s"], spec)}
        return place(x, spec)

    return jax.tree.map(place_leaf, tree, specs,
                        is_leaf=lambda x: isinstance(x, dict)
                        and set(x.keys()) == {"q", "s"})


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place an {"encoder","decoder"} param pytree onto the mesh."""
    out = {}
    if "decoder" in params:
        specs = decoder_param_specs()
        if "lm_head" not in params["decoder"]:
            specs.pop("lm_head")
        out["decoder"] = _tree_shard(params["decoder"], specs, mesh)
    if "encoder" in params:
        out["encoder"] = _tree_shard(params["encoder"], encoder_param_specs(),
                                     mesh)
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))
