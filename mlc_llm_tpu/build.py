"""Offline build driver: HF checkpoint -> quantized param cache.

The analog of the reference's `python3 build.py` compiler CLI
(/root/reference/build.py): where the reference traces a Relax module,
runs GroupQuantize, and executes a param-transform VM on CPU to emit an
ndarray-cache (build.py:104-132, utils.py:98-128), this driver loads the
HF checkpoint, group-quantizes every matmul weight into the TPU packed
layout, and writes the manifest checkpoint that the engine/CLI load.
There is no .so to export — XLA compiles the jitted engine functions at
load time (and caches them persistently).

Usage:
  python -m mlc_llm_tpu.build --model dolly-v2-3b \
      --hf-path /path/to/dolly-v2-3b --quantization q4bf16 -o dist/dolly-q4
  python -m mlc_llm_tpu.build --model tiny-llama --random -o /tmp/ck  # tests
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser("mlc_llm_tpu.build")
    ap.add_argument("--model", required=True, help="model name from the registry")
    ap.add_argument("--hf-path", default=None, help="HF checkpoint directory")
    ap.add_argument("--random", action="store_true", help="random weights (testing)")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--max-seq-len", type=int, default=None)
    ap.add_argument("-o", "--out", required=True, help="output checkpoint dir")
    ap.add_argument("--platform", default="cpu", help="jax platform for quantization")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        # quantization is an offline transform; default to host CPU like
        # the reference's llvm param-transform run (utils.py:98-110)
        try:
            jax.config.update("jax_platforms", args.platform)
        except RuntimeError:
            pass

    from .models import get_config, init_random_params
    from .quant import resolve_spec
    from .utils.checkpoint import save_params

    cfg = get_config(args.model)
    if args.max_seq_len:
        cfg = cfg.replace(max_seq_len=args.max_seq_len)
    spec = resolve_spec(args.quantization)

    t0 = time.time()
    if args.random:
        params = init_random_params(cfg, spec, seed=0)
    else:
        if not args.hf_path:
            raise SystemExit("need --hf-path (or --random)")
        import transformers

        from .models.hf_loader import params_from_hf

        auto = {
            "llama": transformers.LlamaForCausalLM,
            "gpt_neox": transformers.GPTNeoXForCausalLM,
            "moss": transformers.AutoModelForCausalLM,
        }[cfg.family]
        print(f"loading HF weights from {args.hf_path} ...")
        hf = auto.from_pretrained(args.hf_path, trust_remote_code=True)
        print(f"group-quantizing to {args.quantization} ...")
        params = params_from_hf(hf, cfg, spec)

    meta = {
        "model": cfg.name,
        "quantization": args.quantization,
        "max_seq_len": cfg.max_seq_len,
        "built_with": "mlc_llm_tpu.build",
    }
    save_params(params, args.out, meta=meta)
    with open(os.path.join(args.out, "build_config.json"), "w") as f:
        json.dump(meta, f, indent=1)
    dt = time.time() - t0
    total = sum(
        getattr(l, "nbytes", lambda: 0)() if callable(getattr(l, "nbytes", None))
        else getattr(l, "nbytes", 0)
        for l in jax.tree_util.tree_leaves(params)
    )
    print(f"wrote {args.out} ({total/1e6:.1f} MB) in {dt:.1f}s")


if __name__ == "__main__":
    main()
