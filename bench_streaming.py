"""Streaming partial-latency benchmark (BASELINE.json tracked metric).

Drives the REAL WebSocket stack end-to-end: N concurrent clients stream
16-bit PCM at real-time cadence into ``/ws/v1/transcript`` (the full
aiohttp app: Client session state -> SilenceAtEndOfChunk buffering ->
JaxWhisperASR -> BatchServer continuous batching), and measures the
latency from each buffering-chunk boundary (1.5 s cadence,
client.py:40-42 in the reference) to the corresponding code-200 partial.

Prints ONE JSON line:
  {"metric": "streaming_p50_partial_latency", "value": s, "unit": "s",
   "vs_baseline": chunk_budget / p50, ...extras}

``vs_baseline`` compares against the real-time budget: a partial must
arrive within one chunk interval (1.5 s) or the stream falls behind;
values > 1 mean faster than real time.

Usage:
  python bench_streaming.py                     # large-v3 on the TPU
  python bench_streaming.py --model micro-test --cpu   # smoke on CPU
"""

import argparse
import asyncio
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

SR = 16000
SEND_INTERVAL_S = 0.1          # 100 ms sends, test_realtime.html cadence
CHUNK_S = 1.5                  # buffering strategy chunk (client.py:40-42)


def _speechy_pcm(seconds: float, seed: int) -> bytes:
    """Formant-synthesized speech (the VAD trainer's generator): the
    learned VAD must ACCEPT the bench audio, or every chunk takes the
    empty-result retry path (two decodes) and gates only on the 2 s
    force — which is what a pure-tone signal measures."""
    from tools.train_vad import synth_speech

    rng = np.random.default_rng(seed)
    sig, _labels = synth_speech(rng, seconds=seconds)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16).tobytes()


async def _stream_one(client, url: str, seed: int, seconds: float,
                      latencies: list, firsts: list,
                      trailing_s: float = 3.0) -> int:
    pcm = _speechy_pcm(seconds, seed)
    bytes_per_chunk = int(SR * CHUNK_S) * 2
    send_bytes = int(SR * SEND_INTERVAL_S) * 2
    served = 0
    async with client.ws_connect(f"{url}?token=bench{seed}") as ws:
        # wait for code 180 (service ready)
        while True:
            msg = json.loads((await ws.receive()).data)
            if msg.get("code") == 180:
                break

        boundary_times = []          # wall time each 1.5 s boundary crossed
        recv_done = asyncio.Event()

        async def recv():
            nonlocal served
            first = True
            while True:
                try:
                    raw = await asyncio.wait_for(ws.receive(), timeout=30)
                except asyncio.TimeoutError:
                    break
                if raw.type != 1:   # not TEXT
                    break
                msg = json.loads(raw.data)
                if msg.get("code") == 200 and msg.get("result"):
                    now = time.perf_counter()
                    # partial latency = arrival - wall time at which the
                    # partial's last audio sample was LIVE (endTime is in
                    # the session audio timeline; sends are real-time
                    # paced from t0).  Matching partial k to chunk
                    # boundary k instead overstates whenever the gating
                    # cadence (silence / 2 s force) emits fewer partials
                    # than chunk boundaries.
                    end_t = msg["result"][-1].get("endTime")
                    if end_t is not None and boundary_times:
                        live_at = t0 + float(end_t)
                        latencies.append((float(end_t), now - live_at))
                        if first:
                            firsts.append(now - boundary_times[0])
                            first = False
                    served += 1
                if recv_done.is_set():
                    break
            return served

        sent = 0
        next_boundary = bytes_per_chunk
        t0 = time.perf_counter()
        recv_task = asyncio.create_task(recv())
        while sent < len(pcm):
            chunk = pcm[sent : sent + send_bytes]
            await ws.send_bytes(chunk)
            sent += len(chunk)
            if sent >= next_boundary:
                boundary_times.append(time.perf_counter())
                next_boundary += bytes_per_chunk
            # real-time pacing
            target = t0 + (sent / 2 / SR)
            delay = target - time.perf_counter()
            if delay > 0:
                await asyncio.sleep(delay)
        # allow trailing partials to arrive (long for the warm pass: the
        # first decode compile can take minutes on a cold cache)
        waited = 0.0
        while waited < trailing_s:
            await asyncio.sleep(0.5)
            waited += 0.5
            if served > 0 and waited >= 3.0:
                break
        recv_done.set()
        try:
            await asyncio.wait_for(recv_task, timeout=5)
        except asyncio.TimeoutError:
            recv_task.cancel()
    return served


async def run(args) -> dict:
    from aiohttp.test_utils import TestClient, TestServer

    from ttasr.api.streaming_ws import StreamingService, make_streaming_app

    os.environ["FASTAPI_ASR_MODEL_SIZE"] = args.model
    os.environ["TTASR_BATCH_SLOTS"] = str(args.slots)
    os.environ["TTASR_MODEL_COMPUTE_TYPE"] = args.compute
    os.environ.pop("FASTAPI_SKIP_INIT", None)
    os.environ["FASTAPI_WARMUP"] = "1"   # service warms both budget buckets

    service = StreamingService()
    app, _ = make_streaming_app(service)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        # warm the compiled decode path with the SAME concurrency as the
        # measurement: concurrent streams pack into different BatchServer
        # batch shapes than a solo stream, and every fresh shape is a
        # 20 s-5 min remote compile that would otherwise pollute p50
        warm_lat, warm_first = [], []
        await _stream_one(client, "/ws/stt", 99, 4.0, warm_lat, warm_first,
                          trailing_s=600.0)
        await asyncio.gather(*[
            _stream_one(client, "/ws/stt", 90 + i, 6.0, warm_lat,
                        warm_first, trailing_s=600.0)
            for i in range(args.streams)
        ])

        latencies, firsts = [], []

        async def paced(i):
            # --stagger-s spreads stream starts (organic connects); 0 =
            # worst-case thundering herd, where the first sweep batches
            # every stream's first chunk and decodes to the max row's
            # token count (the p95 driver at simultaneous starts)
            await asyncio.sleep(i * args.stagger_s)
            return await _stream_one(client, "/ws/stt", i, args.seconds,
                                     latencies, firsts)

        t0 = time.perf_counter()
        counts = await asyncio.gather(*[paced(i)
                                        for i in range(args.streams)])
        elapsed = time.perf_counter() - t0
    finally:
        await client.close()

    if len(latencies) == 0:
        raise RuntimeError("no partials received")
    lat = np.asarray(sorted(l for _, l in latencies))
    p50 = float(np.percentile(lat, 50))
    p95 = float(np.percentile(lat, 95))
    raw = [round(float(l), 3) for _, l in latencies[:16]]

    # per-window-bucket latency (VERDICT r4 #9): a partial whose scratch
    # end crosses 5.12 s / 15.36 s encodes the next window bucket
    # (serving.WINDOW_BUCKETS) — a latency CLIFF between buckets would
    # show here as a p50 jump
    def bucket_stats(lo, hi):
        xs = [l for t, l in latencies if lo < t <= hi]
        if not xs:
            return None
        return {"n": len(xs),
                "p50": round(float(np.percentile(xs, 50)), 4),
                "p95": round(float(np.percentile(xs, 95)), 4)}

    by_bucket = {
        "win_5.12s": bucket_stats(0.0, 5.12),
        "win_15.36s": bucket_stats(5.12, 15.36),
        "win_30s": bucket_stats(15.36, 1e9),
    }
    return {
        "metric": "streaming_p50_partial_latency",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(CHUNK_S / max(p50, 1e-3), 2),
        "p95_s": round(p95, 4),
        "streams": args.streams,
        "partials": int(sum(counts)),
        "stream_seconds": args.seconds,
        "model": args.model,
        "slots": args.slots,
        "wall_s": round(elapsed, 2),
        "stagger_s": args.stagger_s,
        "by_window_bucket": by_bucket,
        "raw_first16": raw,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--compute", default="bfloat16")
    ap.add_argument("--stagger-s", type=float, default=0.0,
                    help="per-stream start offset (0 = thundering herd)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    result = asyncio.run(run(args))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
