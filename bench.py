"""Headline benchmark: whisper-large-v3 real-time factor per TPU chip.

Measures the full inference path — fused log-mel frontend, encoder, and
beam-5 KV-cache decode forced to a fixed token budget (128 tokens per
30 s window ≈ dense zh speech) on a batch of windows, which is exactly
what the continuous-batching server executes per step.  RTF =
wall-clock / audio-seconds (lower is better).

Baseline: the reference's GPU sizing table gives RTF ≈ 0.1 on an RTX
3080-class GPU (reference README.md:106; /root/repo/BASELINE.md).
``vs_baseline`` reports baseline_rtf / our_rtf (speedup factor, >1 is
faster than the reference).

Prints ONE JSON line.
"""

import argparse
import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: repeated bench runs skip the multi-
# minute remote TPU compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def run_bench(model_name: str, batch: int, decode_tokens: int, beam: int,
              compute: str, repeats: int = 3, kv_int8: bool = True,
              cross_kv_int8: bool = False, cross_kv_int4: bool = False,
              kv_int4: bool = True, encoder_act_int8: bool = True,
              encoder_fused_quant: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.decode import (
        DecodingOptions,
        TokenizerInfo,
        beam_decode,
        greedy_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.mel import N_SAMPLES, log_mel_spectrogram
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "int8": jnp.bfloat16}[compute]
    cfg = get_config(model_name)
    params = init_params(cfg, seed=0, dtype=dtype)
    if compute == "int8":
        from ttasr.ops.quant import fuse_qkv, quantize_params

        params = fuse_qkv(quantize_params(params))
    tok = build_byte_fallback_tokenizer()

    # Force full-length decode: report throughput at a fixed token budget.
    # eot is added to the suppress set so random weights can't end early.
    base = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    ti = TokenizerInfo(
        eot=base.eot, sot=base.sot, no_timestamps=base.no_timestamps,
        timestamp_begin=base.timestamp_begin, no_speech=base.no_speech,
        blank=base.blank, suppress=tuple(sorted(set(base.suppress) | {base.eot})),
        n_vocab=base.n_vocab, pad_vocab_begin=base.pad_vocab_begin,
    )
    opts = DecodingOptions(beam_size=beam, sample_len=decode_tokens,
                           without_timestamps=False, kv_int8=kv_int8,
                           cross_kv_int8=cross_kv_int8,
                           cross_kv_int4=cross_kv_int4,
                           kv_int4=kv_int4 and kv_int8)

    # persistent-cache state: compile_s on an EMPTY cache is the cold-
    # start number (BENCH_r04: 1612 s cold); a warmed cache (ttasr.cli.
    # warmup, or any prior run of this config) collapses it to seconds.
    # The cache dir is a deploy artifact — ship it with the weights.
    try:
        cache_entries_start = len(os.listdir(
            os.environ["JAX_COMPILATION_CACHE_DIR"]))
    except OSError:
        cache_entries_start = 0

    rng = np.random.default_rng(0)
    # int16 PCM end-to-end: audio is natively int16, and uploading f32
    # through the axon relay measured 0.52 s at batch 16 vs 0.37 s for
    # int16 (mel converts on device, exactly).
    audio = (rng.standard_normal((batch, N_SAMPLES)) * 0.1 * 32767.0
             ).clip(-32768, 32767).astype(np.int16)
    prompt_ids = tok.sot_sequence("zh", "transcribe", predict_timestamps=True)
    prompt, pad = pad_prompts([prompt_ids] * batch, tok.eot)
    key = jax.random.PRNGKey(0)

    decode_fn = beam_decode if beam > 1 else greedy_decode

    act8 = None if encoder_act_int8 else False
    fq = None if encoder_fused_quant else False

    def full_pipeline(params, audio, prompt, pad, key):
        mel = log_mel_spectrogram(audio, n_mels=cfg.num_mel_bins)
        enc_out = encode(params, cfg, mel, act_int8=act8, fused_quant=fq)
        return decode_fn(params, cfg, enc_out, prompt, pad, key,
                         opts=opts, ti=ti)

    jitted = jax.jit(full_pipeline)

    # compile (host fetch forces full execution; block_until_ready alone
    # does not synchronize through the axon remote-execution relay)
    t0 = time.perf_counter()
    out = jitted(params, audio, prompt, pad, key)
    np.asarray(out["tokens"])
    compile_time = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jitted(params, audio, prompt, pad, key)
        np.asarray(out["tokens"])
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    # steady-state: dispatch N batches back-to-back (distinct audio
    # buffers) and sync once — the host->device PCM upload of batch
    # i+1 overlaps batch i's compute, which is the serving regime
    # (BatchServer's depth-2 pipelined dispatch).  The per-call number
    # above remains the headline; this isolates how much of it is
    # relay upload that production hides.
    audios = [np.asarray((rng.standard_normal((batch, N_SAMPLES)) * 0.1
                          * 32767.0).clip(-32768, 32767), np.int16)
              for _ in range(repeats)]
    outs = [jitted(params, a, prompt, pad, key) for a in audios[:1]]
    np.asarray(outs[0]["tokens"])  # absorb any lingering warmup
    t0 = time.perf_counter()
    outs = [jitted(params, a, prompt, pad, key) for a in audios]
    for o in outs:
        np.asarray(o["tokens"])
    pipelined = (time.perf_counter() - t0) / len(audios)

    # Encoder stage alone (scalar reduce: fetching the (B,1500,d) states
    # through the axon relay would dominate the measurement)
    def enc_only(params, audio):
        mel = log_mel_spectrogram(audio, n_mels=cfg.num_mel_bins)
        return jnp.sum(encode(params, cfg, mel, act_int8=act8,
                              fused_quant=fq).astype(jnp.float32))

    enc_jitted = jax.jit(enc_only)
    np.asarray(enc_jitted(params, audio))  # compile
    enc_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(enc_jitted(params, audio))
        enc_times.append(time.perf_counter() - t0)
    enc_elapsed = min(enc_times)
    dec_elapsed = max(elapsed - enc_elapsed, 1e-9)

    # MFU: analytic model FLOPs / (time × peak chip rate) — VERDICT
    # round-2 weak #4 ("is this actually fast for the silicon")
    from ttasr.core.flops import decode_flops, encoder_flops, peak_tflops

    peak = peak_tflops() * 1e12
    enc_fl = encoder_flops(cfg, batch)
    dec_fl = decode_flops(cfg, batch, beam if beam > 1 else 1,
                          prompt.shape[1], decode_tokens)

    audio_seconds = batch * 30.0
    rtf = elapsed / audio_seconds
    rtf_pipelined = pipelined / audio_seconds
    lengths = np.asarray(out["lengths"])
    return {
        "rtf": rtf,
        "rtf_pipelined": rtf_pipelined,
        "elapsed_s": elapsed,
        "compile_s": compile_time,
        "cache_entries_start": cache_entries_start,
        "audio_s": audio_seconds,
        "decoded_tokens": int(lengths.sum()) or batch * decode_tokens,
        "tokens_per_s": batch * decode_tokens / elapsed,
        "encoder_s": enc_elapsed,
        "mfu": (enc_fl + dec_fl) / (elapsed * peak),
        "mfu_encoder": enc_fl / (enc_elapsed * peak),
        "mfu_decode": dec_fl / (dec_elapsed * peak),
        "peak_tflops": peak / 1e12,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="large-v3")
    # Per-layer cross-KV quantization removed the two ~5.6 GB bf16
    # prefill temps that OOM'd batch 48; sweet spot moved 32 -> 48
    # (0.00472 / 0.00456 / 0.00466 at 32 / 48 / 64)
    parser.add_argument("--batch", type=int, default=48)
    parser.add_argument("--decode-tokens", type=int, default=128)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--compute", default="int8")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--no-kv-int8", action="store_true",
                        help="disable the int8 self-KV cache")
    parser.add_argument("--cross-kv-int8", action="store_true", default=None,
                        help="int8 cross-KV via the fused kernels (default: "
                             "on for --compute int8)")
    parser.add_argument("--no-cross-kv-int8", dest="cross_kv_int8",
                        action="store_false",
                        help="bf16 cross-KV cache: also disables the int4 "
                             "sub-mode (decode._use_cross_int4 requires "
                             "cross_kv_int8)")
    parser.add_argument("--cross-kv-int4", dest="cross_kv_int4",
                        action="store_true", default=True,
                        help="int4 nibble-packed cross-KV (default on; "
                             "fused-kernel path only — divergence vs the "
                             "unfused int8 path measured exact, see "
                             "PERF_NOTES.md)")
    parser.add_argument("--no-cross-kv-int4", dest="cross_kv_int4",
                        action="store_false")
    parser.add_argument("--self-kv-int4", dest="kv_int4",
                        action="store_true", default=True,
                        help="int4 lane-packed self-KV cache (default on; "
                             "fused flat-kernel path only — VERDICT r4 #2, "
                             "A/B in PERF_NOTES round 5)")
    parser.add_argument("--no-self-kv-int4", dest="kv_int4",
                        action="store_false")
    parser.add_argument("--no-encoder-act-int8", dest="encoder_act_int8",
                        action="store_false", default=True,
                        help="disable s8xs8 encoder block matmuls "
                             "(dynamic activation quantization; default "
                             "on for --compute int8)")
    parser.add_argument("--no-encoder-fused-quant", dest="encoder_fused_quant",
                        action="store_false", default=True,
                        help="disable the one-pass Pallas producer+quantize "
                             "encoder kernels (ln/add_ln/gelu + int8 "
                             "quantize fused; default on with act-int8)")
    args = parser.parse_args()

    cross = args.cross_kv_int8
    if cross is None:
        cross = args.compute == "int8"
    stats = run_bench(args.model, args.batch, args.decode_tokens, args.beam,
                      args.compute, args.repeats, kv_int8=not args.no_kv_int8,
                      cross_kv_int8=cross, cross_kv_int4=args.cross_kv_int4,
                      kv_int4=args.kv_int4,
                      encoder_act_int8=args.encoder_act_int8,
                      encoder_fused_quant=args.encoder_fused_quant)
    baseline_rtf = 0.1  # reference GPU RTF (README.md:106)
    print(json.dumps({
        "metric": f"whisper-{args.model}_rtf_per_chip",
        "value": round(stats["rtf"], 5),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / stats["rtf"], 2),
        "detail": {
            "batch_windows": args.batch,
            "beam_size": args.beam,
            "decode_tokens_per_window": args.decode_tokens,
            "elapsed_s": round(stats["elapsed_s"], 3),
            "rtf_pipelined": round(stats["rtf_pipelined"], 5),
            "compile_s": round(stats["compile_s"], 1),
            "cold_start": stats["cache_entries_start"] == 0,
            "tokens_per_s": round(stats["tokens_per_s"], 1),
            "encoder_s": round(stats["encoder_s"], 3),
            "mfu": round(stats["mfu"], 4),
            "mfu_encoder": round(stats["mfu_encoder"], 4),
            "mfu_decode": round(stats["mfu_decode"], 4),
            "peak_tflops": stats["peak_tflops"],
            "baseline": "reference GPU RTF≈0.1 (README.md:106)",
        },
    }))


if __name__ == "__main__":
    main()
