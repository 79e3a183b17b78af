"""Param checkpoint format (the ndarray-cache analog).

The reference persists quantized params as a tvmjs ndarray-cache
(shards + JSON manifest with param_<i> keys,
/root/reference/mlc_llm/utils.py:113-139). Here: one .npy per pytree
leaf + manifest.json carrying the tree structure, QuantSpec metadata,
and model info. Loading can place leaves directly onto a sharded mesh
(device_put with NamedSharding) without materializing fp weights.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.groupwise import QuantizedTensor
from ..quant.spec import QuantSpec

MANIFEST = "manifest.json"


def _leaf_entries(params):
    """Flatten with paths; returns [(key, leaf)] with '/'-joined keys."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(getattr(p, "idx", p)))
        out.append(("/".join(parts), leaf))
    return out


def save_params(params, out_dir: str, meta: Optional[Dict[str, Any]] = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    entries = {}
    total = 0
    for key, leaf in _leaf_entries(params):
        # raw bytes + manifest dtype/shape: np.save cannot represent
        # ml_dtypes (bfloat16 reloads as void), raw bins can
        fname = key.replace("/", ".") + ".bin"
        arr = np.asarray(leaf)
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(arr.tobytes())
        entries[key] = {"file": fname, "dtype": str(arr.dtype), "shape": list(arr.shape)}
        total += arr.nbytes

    # record QuantizedTensor static metadata by subtree prefix
    qt_meta = {}

    def record_qt(path, node):
        if isinstance(node, QuantizedTensor):
            qt_meta[path] = {
                "spec": dataclasses.asdict(node.spec),
                "shape": list(node.shape),
                "has_zero": node.zero is not None,
            }
            return
        if isinstance(node, dict):
            for k, v in node.items():
                record_qt(f"{path}/{k}" if path else k, v)

    record_qt("", params)
    manifest = {
        "format": "mlc-llm-tpu-params-v1",
        "total_bytes": total,
        "leaves": entries,
        "quantized": qt_meta,
        "meta": meta or {},
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)


def load_params(
    in_dir: str, shardings=None
) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint. `shardings` (optional) is a pytree-path ->
    jax.sharding.Sharding mapping applied at device_put time."""
    with open(os.path.join(in_dir, MANIFEST)) as f:
        manifest = json.load(f)
    items = list(manifest["leaves"].items())
    leaves = {}
    try:
        from ..native import available, load_files_parallel

        use_native = available()
    except Exception:
        use_native = False
    if use_native:
        # C++ multithreaded shard reader (native analog of
        # vm.builtin.ndarray_cache.load)
        bufs = [
            np.empty(e["shape"], dtype=jnp.dtype(e["dtype"])) for _, e in items
        ]
        load_files_parallel(
            [os.path.join(in_dir, e["file"]) for _, e in items], bufs
        )
        leaves = {key: buf for (key, _), buf in zip(items, bufs)}
    else:
        for key, e in items:
            with open(os.path.join(in_dir, e["file"]), "rb") as f:
                raw = f.read()
            leaves[key] = np.frombuffer(raw, dtype=jnp.dtype(e["dtype"])).reshape(
                e["shape"]
            )

    # rebuild nested dict from '/'-joined keys
    tree: Dict[str, Any] = {}
    for key, arr in leaves.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)

    # re-wrap QuantizedTensors
    for path, info in manifest["quantized"].items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node[p]
        sub = node[parts[-1]]
        # manifests written before the layout field existed hold
        # pair-packed data; default explicitly so a future change of
        # QuantSpec's default can never silently re-tag old checkpoints
        info["spec"].setdefault("layout", "pair")
        node[parts[-1]] = QuantizedTensor(
            data=sub["data"],
            scale=sub["scale"],
            zero=sub.get("zero"),
            spec=QuantSpec(**info["spec"]),
            shape=tuple(info["shape"]),
        )
    if shardings is not None:
        tree = jax.device_put(tree, shardings)
    return tree, manifest.get("meta", {})
