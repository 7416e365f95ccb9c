"""Pre-compile the serving program set into the persistent XLA cache.

Cold start is the one product axis where this rebuild is worse than the
reference (model load + optional warm_up seconds there vs 20 s - 5 min
PER compiled program through the axon relay; BENCH_r04 measured 1612 s
for the bench program alone).  This command walks the reachable
(program, shape) census (ttasr.core.census — the same enumeration
tools/compile_census.py reports) and executes each program once with
minimal inputs, so the compiles land in:

- the persistent compilation cache (JAX_COMPILATION_CACHE_DIR,
  default /tmp/ttasr-jax-cache) — ship that directory as a deploy
  artifact next to the weights and a process restart costs seconds;
- any backend-side compile cache, which absorbs recompiles of
  identical programs from OTHER processes (tools/compile_breakdown.py
  measured 805 s -> 15 s for an identical encoder program re-trace).

Usage:

    python -m ttasr.cli.warmup --model large-v3 --slots 8
    python -m ttasr.cli.warmup --dry-run          # list, no compiles

Run it once per deploy image (or after any model/kernel change) before
routing traffic.  The API servers' FASTAPI_WARMUP covers only the
streaming buckets at startup; this covers the full surface.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def cache_entries() -> int:
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    try:
        return len(os.listdir(d))
    except OSError:
        return 0


def main() -> None:
    parser = argparse.ArgumentParser(
        description="pre-compile the reachable serving programs")
    parser.add_argument("--model", default="large-v3")
    parser.add_argument("--compute", default="int8")
    parser.add_argument("--slots", type=int, default=8,
                        help="BatchServer batch size (every group pads "
                             "to this)")
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--streams", choices=("on", "off"), default="on")
    parser.add_argument("--file-api", choices=("on", "off"), default="on")
    parser.add_argument("--cli", choices=("on", "off"), default="off",
                        help="also warm the sequential batch-1 "
                             "engine.transcribe programs")
    parser.add_argument("--dry-run", action="store_true",
                        help="list the programs without compiling")
    parser.add_argument("--cpu", action="store_true",
                        help="CPU backend smoke (micro models; the axon "
                             "sitecustomize pins the TPU otherwise)")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ttasr.core.census import census

    programs = census(args.slots, beam_size=args.beam,
                      streaming=args.streams == "on",
                      file_api=args.file_api == "on",
                      sequential_cli=args.cli == "on")
    print(f"warming {len(programs)} reachable programs "
          f"(cache dir {os.environ['JAX_COMPILATION_CACHE_DIR']}, "
          f"{cache_entries()} entries before)", flush=True)
    if args.dry_run:
        for fam, key, why in programs:
            print(json.dumps({"family": fam, "key": list(key), "why": why}))
        return

    import jax

    from ttasr.engine.transcriber import WhisperEngine
    from ttasr.models.whisper.decode import DecodingOptions, pad_prompts

    t0 = time.perf_counter()
    engine = WhisperEngine(args.model, compute_type=args.compute)
    print(json.dumps({"stage": "engine_init",
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)

    # BatchServer-identical DecodingOptions (ttasr/engine/serving.py):
    # warming a near-miss variant would compile a 15th program instead
    # of the 14 the server dispatches
    kv_int8 = engine.kv_cache_int8
    base_opts = DecodingOptions(
        beam_size=args.beam, sample_len=224, without_timestamps=False,
        kv_int8=kv_int8,
        cross_kv_int8=kv_int8 and engine.compute_type == "int8",
        cross_kv_int4=kv_int8 and engine.cross_kv_int4,
        kv_int4=kv_int8 and engine.kv_int4,
    )

    enc_cache = {}

    def enc_for(b, win):
        if (b, win) not in enc_cache:
            enc_cache[(b, win)] = engine.encode_windows(
                np.zeros((b, win), np.int16), window_samples=win)
        return enc_cache[(b, win)]

    def prompt_rows(b, width):
        sot = engine.tokenizer.sot_sequence("zh", "transcribe",
                                            predict_timestamps=True)
        row = (list(sot) + [engine.ti.eot] * width)[:width]
        return pad_prompts([row] * b, engine.ti.eot)

    total = 0.0
    for fam, key, why in programs:
        t0 = time.perf_counter()
        if fam == "encoder":
            b, win, _dtype = key
            enc_for(b, win)
        elif fam in ("beam_decode", "greedy_decode"):
            if len(key) == 5:            # streaming: (b, p, win, budget, bm)
                b, p, win, budget = key[:4]
            else:                        # file/task: (b, p, budget[, bm])
                b, p, budget = key[:3]
                win = 480000
            enc_out = enc_for(b, win)
            prompt, pad = prompt_rows(b, p)
            opts = dataclasses.replace(base_opts, sample_len=budget)
            rng = jax.random.PRNGKey(0)
            if fam == "beam_decode":
                out = engine.run_beam_decode(enc_out, prompt, pad, rng,
                                             opts=opts)
            else:
                temps = np.full((b,), 0.2, np.float32)
                out = engine.run_greedy_decode(enc_out, prompt, pad, rng,
                                               temps, opts=opts)
            np.asarray(out["tokens"])    # force execution through the relay
        elif fam == "lang_logits":
            engine.detect_language(np.zeros((16000,), np.float32))
        else:                            # unknown family: census grew —
            print(json.dumps({"family": fam, "key": list(key),
                              "skipped": "no warmup driver"}), flush=True)
            continue
        dt = time.perf_counter() - t0
        total += dt
        print(json.dumps({"family": fam, "key": list(key),
                          "s": round(dt, 1)}), flush=True)

    print(json.dumps({"warmup_total_s": round(total, 1),
                      "programs": len(programs),
                      "cache_entries_after": cache_entries()}), flush=True)


if __name__ == "__main__":
    main()
