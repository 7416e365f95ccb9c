"""Local repro for the round-5 e2e sweep fragmentation (22 vs 11 sweeps).

Simulates bench_e2e's concurrent prompt-carry steady state with a fake
decode: N_FILES client tasks each run a WINDOWS-deep seek loop (window
i+1's prompt depends on window i's result, so each client has at most
one request outstanding), all through one BatchServer.  The fake
_decode_batch sleeps DECODE_S in the executor (standing in for the
fixed-shape device program); clients burn POSTPROC_S of *blocking* host
time between windows (tokenize/parse on the one-core host).

Perfect wave synchronization = WINDOWS sweeps of N_FILES rows each.
Fragmentation shows up as more, smaller sweeps.

Usage: python tools/repro_sweep_frag.py [--pipeline-groups N] [--postproc MS]
"""
from __future__ import annotations

import argparse
import asyncio
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from ttasr.engine.serving import BatchServer, WindowResult


class _TI:
    eot = 50257


class FakeEngine:
    ti = _TI()
    kv_cache_int8 = False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--windows", type=int, default=11)
    ap.add_argument("--decode-ms", type=float, default=300.0)
    ap.add_argument("--postproc-ms", type=float, default=3.0)
    ap.add_argument("--pipeline-groups", type=int, default=2)
    ap.add_argument("--stagger-ms", type=float, default=0.0,
                    help="per-file start stagger (serialized VAD)")
    ap.add_argument("--jitter-ms", type=float, default=0.0,
                    help="postproc jitter amplitude (file index scaled)")
    args = ap.parse_args()

    sweeps: list[int] = []

    async def run() -> None:
        server = BatchServer(FakeEngine(), slots=args.files, beam_size=5,
                             pipeline_groups=args.pipeline_groups)

        def fake_decode(batch):
            sweeps.append(len(batch))
            time.sleep(args.decode_ms / 1000.0)
            return [WindowResult(tokens=[1, 2], sum_logprob=-0.2,
                                 avg_logprob=-0.1, no_speech_prob=0.0,
                                 temperature=0.0)
                    for _ in batch]

        server._decode_batch = fake_decode
        await server.start()

        async def client(i: int) -> None:
            await asyncio.sleep(i * args.stagger_ms / 1000.0)
            prompt = [50258]
            with server.session():
                for w in range(args.windows):
                    res = await server.transcribe_window(
                        np.zeros(16000, np.float32), prompt)
                    # blocking host postproc (prompt-carry tokenize/parse)
                    time.sleep((args.postproc_ms
                                + (i % 3) * args.jitter_ms) / 1000.0)
                    prompt = list(res.tokens)

        t0 = time.time()
        await asyncio.gather(*[client(i) for i in range(args.files)])
        wall = time.time() - t0
        await server.stop()
        ideal = args.windows
        print(f"sweeps={len(sweeps)} (ideal {ideal}) sizes={sweeps}")
        print(f"wall={wall:.2f}s ideal={ideal * args.decode_ms / 1000:.2f}s")

    asyncio.run(run())


if __name__ == "__main__":
    main()
