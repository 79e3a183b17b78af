"""Streaming chat CLI (the mlc_chat_cli analog).

Mirrors /root/reference/cpp/cli_main.cc: REPL with /help, /exit,
/stats, /reset commands and streamed token output. Model weights come
from a checkpoint directory (utils/checkpoint.py format) or
--random-weights for smoke runs.

Usage:
  python -m mlc_llm_tpu.cli --model tiny-llama --random-weights
  python -m mlc_llm_tpu.cli --model vicuna-v1-7b --weights dist/vicuna-q4 \
      --tokenizer /path/to/hf_tokenizer
"""

from __future__ import annotations

import argparse
import sys


def find_artifacts(model: str, quantization: str):
    """Search conventional checkpoint locations for a built model —
    the reference CLI's artifact search (cli_main.cc:259-338 probes
    dist/<model>* candidates). A candidate whose manifest records a
    DIFFERENT quantization than requested is skipped (with a warning),
    not silently loaded. Returns a directory or None."""
    import json
    import os

    for cand in (
        f"dist/{model}-{quantization}",
        f"dist/{model}/{quantization}",
        f"dist/{model}",
    ):
        mf = os.path.join(cand, "manifest.json")
        if not os.path.isfile(mf):
            continue
        try:
            with open(mf) as f:
                meta = json.load(f).get("meta", {})
        except (OSError, ValueError):
            continue
        built_quant = meta.get("quantization")
        if built_quant and built_quant != quantization:
            print(f"skipping {cand}: built as {built_quant}, "
                  f"requested {quantization}", file=sys.stderr)
            continue
        return cand
    return None


def build_session(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .engine import InferenceEngine
    from .engine.session import ChatConfig, ChatSession
    from .models import get_config, init_random_params
    from .tokenizer import load_tokenizer

    cfg = get_config(args.model)
    if not args.random_weights and not args.weights:
        found = find_artifacts(args.model, args.quantization)
        if found:
            print(f"using checkpoint {found}", file=sys.stderr)
            args.weights = found
    if args.random_weights:
        params = init_random_params(cfg, args.quantization, seed=0, fabricate=args.fabricate)
    elif args.weights:
        from .utils.checkpoint import load_params

        params, meta = load_params(args.weights)
        if meta.get("model") and meta["model"] != cfg.name:
            print(
                f"warning: checkpoint was built for {meta['model']}, "
                f"requested {cfg.name}",
                file=sys.stderr,
            )
    else:
        raise SystemExit(
            "need --weights DIR or --random-weights (searched "
            f"dist/{args.model}* — build one with `python -m "
            "mlc_llm_tpu.build`)"
        )

    engine = InferenceEngine(
        cfg,
        params,
        max_batch=1,
        max_seq_len=min(cfg.max_seq_len, args.max_window_size * 2),
    )
    tok = load_tokenizer(args.tokenizer, add_prefix_space=cfg.family == "moss")
    chat = ChatConfig(
        temperature=args.temperature,
        top_p=args.top_p,
        max_gen_len=args.max_gen_len,
        max_window_size=args.max_window_size,
        seed=args.seed,
    )
    return ChatSession(engine, tok, cfg, chat,
                       conv_template=args.conv_template,
                       speculative_k=getattr(args, "speculative", None))


HELP = """Commands:
  /help    print this message
  /exit    quit
  /stats   print encode/decode tok/s of the last round
  /reset   restart a fresh chat
"""


def main(argv=None):
    ap = argparse.ArgumentParser("mlc_llm_tpu.cli")
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--weights", default=None, help="checkpoint directory")
    ap.add_argument("--tokenizer", default=None, help="HF tokenizer path (default: byte tokenizer)")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--fabricate", action="store_true", help="fabricated packed random weights (fast init)")
    ap.add_argument("--conv-template", default=None)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--max-gen-len", type=int, default=512)
    ap.add_argument("--max-window-size", type=int, default=768)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--platform", default=None, help="jax platform override (e.g. cpu)")
    ap.add_argument(
        "--speculative", type=int, default=None, metavar="K",
        help="prompt-lookup speculative decoding with K-token verify "
             "blocks on greedy turns (temperature 0); output stream is "
             "identical to plain greedy, just fewer forward passes",
    )
    ap.add_argument("--prompt", default=None, help="one-shot prompt (no REPL)")
    ap.add_argument(
        "--evaluate", action="store_true",
        help="built-in smoke benchmark (the reference's `mlc_chat_cli "
             "--evaluate` / llm_chat.cc:768-809 analog)",
    )
    ap.add_argument(
        "--try-tokenizer", action="store_true",
        help="tokenizer encode/decode round-trip smoke "
             "(llm_chat.cc:752-765 analog)",
    )
    ap.add_argument(
        "--debug-dump-dir", default=None,
        help="dump each engine program's jaxpr / StableHLO / optimized "
             "HLO to this directory and exit (the reference's "
             "--debug-dump-script/--debug-dump-shader analog, "
             "build.py:68-101)",
    )
    ap.add_argument(
        "--debug-load-stablehlo", default=None, metavar="NAME=PATH",
        help="re-inject a hand-edited StableHLO dump: compile PATH and "
             "execute it as engine program NAME (prefill / decode_w<N> / "
             "prefill_slot) on the same example args the dump used, "
             "print output summaries, and exit (the reference's "
             "--debug-load-script analog, build.py:78-82)",
    )
    args = ap.parse_args(argv)

    session = build_session(args)

    if args.debug_dump_dir:
        from .debug.dump import dump_engine_programs

        written = dump_engine_programs(session.engine, args.debug_dump_dir)
        for w in written:
            print(f"wrote {args.debug_dump_dir}/{w}")
        return

    if args.debug_load_stablehlo:
        import numpy as _np

        from .debug.dump import reinject_engine_program

        name, _, path = args.debug_load_stablehlo.partition("=")
        if not path:
            raise SystemExit("--debug-load-stablehlo wants NAME=PATH")
        outs = reinject_engine_program(session.engine, name, path)
        for i, o in enumerate(outs):
            a = _np.asarray(o)
            print(f"out[{i}]: shape={a.shape} dtype={a.dtype} "
                  f"mean={a.astype(_np.float64).mean():.6g}")
        return

    if args.try_tokenizer:
        for text in ("Hello world!", "你好 123", "<s>[INST]"):
            ids = session.tokenizer.encode(text)
            back = session.tokenizer.decode(ids)
            print(f"{text!r} -> {len(ids)} tokens -> {back!r}")
        return

    if args.evaluate:
        import time as _time

        tokens = session.tokenizer.encode("The capital of Canada is")
        eng = session.engine
        from .engine import GenerationConfig

        t0 = _time.perf_counter()
        logits = eng.prefill([tokens])
        import numpy as _np

        first10 = _np.asarray(logits)[0, :10]
        t1 = _time.perf_counter()
        out = eng.generate([tokens], GenerationConfig(max_new_tokens=16,
                                                      temperature=0.0))
        t2 = _time.perf_counter()
        print(f"logits[:10] = {first10}")
        print(f"prefill[{len(tokens)} tok]: {(t1-t0)*1e3:.1f} ms; "
              f"decode[{len(out[0])} tok]: {(t2-t1)*1e3:.1f} ms")
        print(f"[{session.stats_text}]")
        return

    if args.prompt is not None:
        for chunk in session.chat_stream(args.prompt):
            print(chunk, end="", flush=True)
        print()
        print(f"[{session.stats_text}]", file=sys.stderr)
        return

    roles = session.conv.roles
    print(f"Chatting with {args.model} ({session.conv.name} template).")
    print("Type /help for commands.")
    while True:
        try:
            line = input(f"{roles[0]}: ")
        except (EOFError, KeyboardInterrupt):
            print()
            break
        cmd = line.strip()
        if cmd == "/exit":
            break
        if cmd == "/help":
            print(HELP)
            continue
        if cmd == "/stats":
            print(session.stats_text)
            continue
        if cmd == "/reset":
            session.reset()
            print("chat restarted")
            continue
        if not cmd:
            continue
        print(f"{roles[1]}: ", end="", flush=True)
        for chunk in session.chat_stream(cmd):
            print(chunk, end="", flush=True)
        print()


if __name__ == "__main__":
    main()
