"""Time one streaming-chunk decode through the BatchServer, phase by
phase, on the real TPU.  Identifies where the partial-latency budget
goes (mel/encode/prefill/decode/fetch + RPC overheads).

Usage: python tools/profile_chunk.py [--repeats 5]
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np  # noqa: E402


async def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--sample-len", type=int, default=48)
    args = p.parse_args()

    from ttasr.engine.serving import BatchServer
    from ttasr.engine.transcriber import WhisperEngine
    from ttasr.models.whisper.decode import build_prompt

    engine = WhisperEngine("large-v3", compute_type="int8")
    server = BatchServer(engine, slots=4)
    await server.start()

    tok = engine.tokenizer
    prompt = build_prompt(tok, language="zh", task="transcribe",
                          initial_prompt_tokens=tok.encode(" 繁體中文"))
    print("prompt tokens:", len(prompt))
    audio = (np.random.default_rng(0).standard_normal(24000) * 0.1
             ).astype(np.float32)

    for i in range(args.repeats):
        t0 = time.perf_counter()
        res = await server.transcribe_window(audio, prompt,
                                             sample_len=args.sample_len)
        dt = time.perf_counter() - t0
        print(f"chunk {i}: {dt*1e3:.0f} ms, tokens={len(res.tokens)}")

    print("server stats:", server.stats)
    await server.stop()


if __name__ == "__main__":
    asyncio.run(main())
