"""Shape/compile census for the serving stack (VERDICT r3 #8).

Every distinct (program, static shape) the serving paths can hit costs a
remote TPU compile (20 s – 5 min on the axon relay; BENCH_r03 measured
351 s for ONE bench config).  This tool enumerates the reachable compiled
-program space from the REAL bucketing functions — prompt-width buckets
(``decode.pad_prompts``), streaming token budgets
(``jax_whisper_asr._token_budget``), growth buckets (internal to one
program, NOT separate compiles), batch groups — and reports the count
and estimated cold-start cost per serving configuration.

Use it to budget warm-up (``FASTAPI_WARMUP`` pre-compiles the streaming
buckets) and to spot unreachable combos before they cost a compile.

    python tools/compile_census.py --slots 8 --streams on

Costs are estimates parameterized on measured per-program compile times
(large-v3 via the relay: beam decode ~90-180 s, greedy ~60-120 s,
encoder ~30-60 s); pass --per-compile-s to recalibrate.
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttasr.core.census import (  # noqa: E402
    PROMPT_BUCKETS,
    STREAM_BUDGETS,
    STREAM_WINDOW_BUDGETS,
    WINDOW_BUDGET,
    census,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=4)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--streams", choices=("on", "off"), default="on")
    parser.add_argument("--file-api", choices=("on", "off"), default="on")
    parser.add_argument("--cli", choices=("on", "off"), default="off",
                        help="sequential engine.transcribe path (batch-1 "
                             "programs)")
    parser.add_argument("--per-compile-s", type=float, default=90.0,
                        help="mean remote compile seconds per program "
                             "(relay-measured range 20-350)")
    args = parser.parse_args()

    progs = census(args.slots, beam_size=args.beam,
                   streaming=args.streams == "on",
                   file_api=args.file_api == "on",
                   sequential_cli=args.cli == "on")
    by_family: dict = {}
    for fam, key, why in progs:
        by_family.setdefault(fam, []).append((key, why))
    total = len(progs)
    print(f"reachable compiled programs: {total} "
          f"(~{total * args.per_compile_s / 60:.0f} min cold start at "
          f"{args.per_compile_s:.0f} s/compile)\n")
    for fam, items in sorted(by_family.items()):
        print(f"{fam} ({len(items)}):")
        for key, why in items:
            print(f"  {str(key):28s} {why}")
    print("\nnotes:")
    print("- growth buckets (32/64/128/... new tokens) live INSIDE one "
          "compiled decode program (lax.while_loop segments), not as "
          "separate compiles")
    print("- the temperature ladder shares ONE greedy compile per shape "
          "(temperature is traced)")
    print("- prompt bucket 256 is reachable only via prefix= prompts "
          "(>144 tokens); unreachable in the shipped API surface -> "
          "excluded unless --cli with prefix usage")
    print("- FASTAPI_WARMUP pre-compiles the streaming buckets through "
          "the real chunk path at startup")


if __name__ == "__main__":
    main()
