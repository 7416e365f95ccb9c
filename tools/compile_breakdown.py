"""Cold-compile breakdown for the headline bench program set.

BENCH_r04.json recorded compile_s = 1612 s (27 min) on the driver's
fresh box — 4.6x round 3 on the same config.  This tool attributes that
budget: it compiles each program variant against a FRESH persistent
cache dir (so every stage is a true cold compile through the axon
relay) and times both the compile and the steady-state run, letting us
trade growth-bucket count (each bucket is its own fully-inlined
while_loop body = its own Mosaic kernel set) against runtime.

Stages (select with --stages, comma-separated):
  enc      encoder-only program (mel + encode, s8xs8 act quant)
  b1       full pipeline, growth_min_cap=128  (1 decode bucket)
  b2       full pipeline, growth_min_cap=64   (2 buckets)
  b3       full pipeline, growth_min_cap=32   (3 buckets — r4 default)
  b3i8     b3 with int8 cross-KV (no int4) — isolates the int4-kernel
           compile cost (the r3->r4 default flip)

Usage (real TPU; each full-pipeline stage is a multi-minute compile):
  python tools/compile_breakdown.py --stages enc,b1,b2
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fresh_cache() -> None:
    import jax

    d = tempfile.mkdtemp(prefix="ttasr-coldcache-")
    jax.config.update("jax_compilation_cache_dir", d)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stages", default="enc,b1,b2,b3")
    parser.add_argument("--batch", type=int, default=48)
    parser.add_argument("--decode-tokens", type=int, default=128)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()
    stages = args.stages.split(",")

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.decode import (
        DecodingOptions,
        TokenizerInfo,
        beam_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.mel import N_SAMPLES, log_mel_spectrogram
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    cfg = get_config("large-v3")
    params = fuse_qkv(quantize_params(init_params(cfg, seed=0,
                                                  dtype=jnp.bfloat16)))
    tok = build_byte_fallback_tokenizer()
    base = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    ti = TokenizerInfo(
        eot=base.eot, sot=base.sot, no_timestamps=base.no_timestamps,
        timestamp_begin=base.timestamp_begin, no_speech=base.no_speech,
        blank=base.blank,
        suppress=tuple(sorted(set(base.suppress) | {base.eot})),
        n_vocab=base.n_vocab, pad_vocab_begin=base.pad_vocab_begin,
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((args.batch, N_SAMPLES)) * 0.1 * 32767.0
             ).clip(-32768, 32767).astype(np.int16)
    prompt_ids = tok.sot_sequence("zh", "transcribe", predict_timestamps=True)
    prompt, pad = pad_prompts([prompt_ids] * args.batch, tok.eot)
    key = jax.random.PRNGKey(0)

    results = {}

    def report(name, compile_s, run_s):
        results[name] = {"compile_s": round(compile_s, 1),
                         "run_s": round(run_s, 4)}
        print(json.dumps({"stage": name, **results[name]}), flush=True)

    def enc_stage(name, act8):
        fresh_cache()

        def enc_only(params, audio):
            mel = log_mel_spectrogram(audio, n_mels=cfg.num_mel_bins)
            return jnp.sum(encode(params, cfg, mel,
                                  act_int8=act8).astype(jnp.float32))

        f = jax.jit(enc_only)
        t0 = time.perf_counter()
        np.asarray(f(params, audio))
        c = time.perf_counter() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(f(params, audio))
            ts.append(time.perf_counter() - t0)
        report(name, c, min(ts))

    if "enc" in stages:
        enc_stage("enc", None)
    if "enc_noact8" in stages:
        # encoder without s8xs8 activation quant (the round-4 addition
        # that coincides with the compile_s 352 -> 1612 regression)
        enc_stage("enc_noact8", False)
    if "enc_again" in stages:
        # identical program as "enc" in a new trace: measures how much
        # of the cold cost a warmed (server-side) compile cache absorbs
        enc_stage("enc_again", None)

    def pipeline_stage(name, min_cap, cross_int4):
        fresh_cache()
        opts = DecodingOptions(
            beam_size=args.beam, sample_len=args.decode_tokens,
            without_timestamps=False, kv_int8=True, cross_kv_int8=True,
            cross_kv_int4=cross_int4, growth_min_cap=min_cap)

        def full(params, audio, prompt, pad, key):
            mel = log_mel_spectrogram(audio, n_mels=cfg.num_mel_bins)
            enc_out = encode(params, cfg, mel)
            return beam_decode(params, cfg, enc_out, prompt, pad, key,
                               opts=opts, ti=ti)

        f = jax.jit(full)
        t0 = time.perf_counter()
        out = f(params, audio, prompt, pad, key)
        np.asarray(out["tokens"])
        c = time.perf_counter() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = f(params, audio, prompt, pad, key)
            np.asarray(out["tokens"])
            ts.append(time.perf_counter() - t0)
        report(name, c, min(ts))

    if "b1" in stages:
        pipeline_stage("b1", 128, True)
    if "b2" in stages:
        pipeline_stage("b2", 64, True)
    if "b3" in stages:
        pipeline_stage("b3", 32, True)
    if "b3i8" in stages:
        pipeline_stage("b3i8", 32, False)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
