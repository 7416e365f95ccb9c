"""Batch-48 encoder decomposition on the real TPU (VERDICT r4 #4).

bench.py's ``encoder_s`` (1.918 s at batch 48, BENCH_r04) covers the
whole audio->states path: the int16 PCM upload through the axon relay,
the fused log-mel frontend, the conv stem, and the 32 transformer
blocks (s8 x s8 projections + merged Pallas attention).  This tool
times each term separately so the fused-encoder-block work attacks the
real bottleneck instead of the aggregate.

Stage loops use the profile_decode.py pattern: the stage OUTPUT feeds
the next iteration's INPUT, so XLA cannot hoist the body out of the
fori_loop (a loop-invariant body measures one ~25 ms relay RPC).

Usage: python tools/profile_encoder48.py [--batch 48] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--stages", default="",
                   help="comma list to restrict (e.g. attn,qkv)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.model import (
        _ln, _mlp_act8, _self_attn_act8, encode, init_params,
    )
    from ttasr.ops.encoder_attention_pallas import (
        TQ_MERGED, encoder_attention_merged,
    )
    from ttasr.ops.mel import N_SAMPLES, log_mel_spectrogram
    from ttasr.ops.quant import fuse_qkv, quant_matmul_act8, quantize_act, \
        quantize_params

    only = {s for s in args.stages.split(",") if s}

    def want(name):
        return not only or name in only

    cfg = get_config("large-v3")
    params = fuse_qkv(quantize_params(
        init_params(cfg, seed=0, dtype=jnp.bfloat16)))
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    b, t, d = args.batch, 1500, cfg.d_model
    t_pad = -(-t // TQ_MERGED) * TQ_MERGED
    n_layers = cfg.encoder_layers
    audio_np = (rng.standard_normal((b, N_SAMPLES)) * 0.1 * 32767.0
                ).clip(-32768, 32767).astype(np.int16)
    x = jnp.asarray(rng.standard_normal(
        (b, t_pad, d)).astype(np.float32)).astype(jnp.bfloat16)

    def blk0(name):
        w = enc["blocks"][name]
        if isinstance(w, dict):
            return {"q": w["q"][0], "s": w["s"][0]}
        return w[0]

    results = {}

    def report(name, seconds, per_layer=None):
        rec = {"stage": name, "s": round(seconds, 4)}
        if per_layer is not None:
            rec["ms_per_layer"] = round(per_layer * 1e3, 3)
        results[name] = rec
        print(json.dumps(rec), flush=True)

    # ---- upload: host int16 -> device, synchronized via scalar fetch
    if want("upload"):
        @jax.jit
        def touch(a):
            return jnp.sum(a.astype(jnp.int32))

        np.asarray(touch(audio_np))
        times = []
        for _ in range(args.repeats + 2):
            t0 = time.perf_counter()
            np.asarray(touch(audio_np))
            times.append(time.perf_counter() - t0)
        report("upload+touch (int16 PCM, per encoder call)", min(times))

    # ---- mel frontend from device-resident audio
    audio_dev = jax.device_put(audio_np)
    if want("mel"):
        @jax.jit
        def mel_only(a):
            return jnp.sum(log_mel_spectrogram(
                a, n_mels=cfg.num_mel_bins).astype(jnp.float32))

        np.asarray(mel_only(audio_dev))
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(mel_only(audio_dev))
            times.append(time.perf_counter() - t0)
        report("mel frontend (device audio)", min(times))

    # ---- full encode from device-resident mel (stem + 32 blocks + LNs)
    mel_dev = jax.jit(lambda a: log_mel_spectrogram(
        a, n_mels=cfg.num_mel_bins))(audio_dev)
    mel_dev.block_until_ready()
    def _time_encode(label, fused_quant):
        @jax.jit
        def enc_from_mel(params, m):
            return jnp.sum(encode(params, cfg, m,
                                  fused_quant=fused_quant
                                  ).astype(jnp.float32))

        t0 = time.perf_counter()
        np.asarray(enc_from_mel(params, mel_dev))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(enc_from_mel(params, mel_dev))
            times.append(time.perf_counter() - t0)
        rec = {"stage": label, "s": round(min(times), 4),
               "compile_s": round(compile_s, 1)}
        results[label] = rec
        print(json.dumps(rec), flush=True)

    if want("encode"):
        _time_encode("encode (stem + blocks, device mel, fused-quant)", None)
    if want("encode_nofq"):
        _time_encode("encode (stem + blocks, device mel, XLA quant)", False)

    # ---- bench parity: upload + mel + encode (should match encoder_s)
    if want("bench"):
        @jax.jit
        def enc_bench(params, a):
            m = log_mel_spectrogram(a, n_mels=cfg.num_mel_bins)
            return jnp.sum(encode(params, cfg, m).astype(jnp.float32))

        np.asarray(enc_bench(params, audio_np))
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(enc_bench(params, audio_np))
            times.append(time.perf_counter() - t0)
        report("bench encoder_s (upload + mel + encode)", min(times))

    # ---- per-stage loops (one layer's weights, iters*32 passes)
    def timed(name, fn, x0, *weights):
        d_in = x0.shape[-1]

        @jax.jit
        def run(x, *ws):
            def body(i, x):
                out = fn(x, *ws)
                return out[..., :d_in].astype(x.dtype)

            final = jax.lax.fori_loop(0, args.iters * n_layers, body, x)
            return jnp.sum(final.astype(jnp.float32))

        np.asarray(run(x0, *weights))
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(run(x0, *weights))
            times.append(time.perf_counter() - t0)
        per_pass = min(times) / args.iters
        report(name, per_pass, per_pass / n_layers)

    if want("attn"):
        timed("merged attention kernel x32",
              lambda q: encoder_attention_merged(q, q, q, t), x)

    if want("attn_full"):
        timed("self_attn_act8 (quant+qkv+attn+quant+out) x32",
              lambda x, wqkv, bqkv, wo, bo: _self_attn_act8(
                  x, {"wqkv": wqkv, "bqkv": bqkv, "wo": wo, "bo": bo},
                  cfg.encoder_heads, t),
              x, blk0("wqkv"), blk0("bqkv"), blk0("wo"), blk0("bo"))

    if want("qkv"):
        def qkv_fn(x, wqkv, bqkv):
            xq, xs = quantize_act(x)
            return quant_matmul_act8(xq, xs, wqkv, bqkv,
                                     out_dtype=jnp.float32)

        timed("quant + fused qkv s8 dot x32", qkv_fn,
              x, blk0("wqkv"), blk0("bqkv"))

    if want("quant"):
        def quant_fn(x):
            xq, xs = quantize_act(x)
            return (xq.astype(jnp.float32) * xs)

        timed("quantize_act roundtrip x32 (D=1280)", quant_fn, x)

    if want("mlp"):
        timed("mlp_act8 (quant+w1+gelu+quant+w2) x32",
              lambda x, w1, b1, w2, b2: _mlp_act8(
                  x, {"w1": w1, "b1": b1, "w2": w2, "b2": b2}),
              x, blk0("w1"), blk0("b1"), blk0("w2"), blk0("b2"))

    if want("ln"):
        timed("ln x32", lambda x, s, b: _ln(x, s, b),
              x, blk0("ln1_s"), blk0("ln1_b"))

    print(json.dumps({"summary": results, "batch": b}))


if __name__ == "__main__":
    main()
