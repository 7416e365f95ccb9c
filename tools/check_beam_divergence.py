"""Quantify fused-vs-unfused beam divergence on the real TPU (VERDICT r2 #8).

tools/check_step_parity.py bounds the STEP-LOGIT error of the fused
kernels (1.4 % rel, 100 % forced-argmax agreement).  This tool measures
what that means for free-running BEAM SEARCH: N speech-like 30 s windows
decode through both int8 paths (fused flat-cache kernels vs unfused XLA)
with beam 5, and the report gives
- exact token-sequence agreement rate across windows,
- mean first-divergence step among diverging windows,
- token edit distance between the paths, and
- the CER of one path's text against the other's (the recognition-level
  delta a near-tie argmax flip can cause).

Divergence here is NOT a bug: Mosaic and XLA accumulate bf16 matmuls in
different orders, so near-tie beam picks legitimately differ (the
kernel-logic paths are pinned token-identical in interpret mode,
tests/test_decoder_kernels.py).  This records how often it matters.

Usage: python tools/check_beam_divergence.py [--windows 8] [--sample-len 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import difflib
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np  # noqa: E402


def _edit_distance(a, b):
    sm = difflib.SequenceMatcher(a=a, b=b, autojunk=False)
    same = sum(block.size for block in sm.get_matching_blocks())
    return max(len(a), len(b)) - same


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3")
    p.add_argument("--windows", type=int, default=8)
    p.add_argument("--sample-len", type=int, default=64)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--cross-int4", action="store_true",
                   help="fused path uses int4 nibble-packed cross-KV: "
                        "bounds the int4 quantization error at the "
                        "recognition level, not just kernel numerics")
    p.add_argument("--ab", default="kernels",
                   choices=["kernels", "encoder-act8", "encoder-fused-quant"],
                   help="kernels: fused-vs-unfused decode kernels "
                        "(encoder act-int8 off in both). encoder-act8: "
                        "same unfused decode, encoder s8xs8 on vs off — "
                        "bounds the activation-quantization error at the "
                        "recognition level. encoder-fused-quant: act8 on "
                        "in both, one-pass Pallas producer+quantize "
                        "kernels + qkv-direct attention on vs the XLA "
                        "quantize chains (VERDICT r4 #4)")
    p.add_argument("--out-json", default=None)
    args = p.parse_args()
    if args.cross_int4 and args.ab != "kernels":
        # opts_fused is only consumed by the "kernels" legs; silently
        # ignoring the flag would mislabel the archived bound
        p.error("--cross-int4 only applies to --ab kernels "
                "(the encoder-act8 A/B runs both legs with int8 cross-KV)")

    import jax
    import jax.numpy as jnp

    from train_vad import synth_speech

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.decode import (
        DecodingOptions, TokenizerInfo, beam_decode, pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.mel import N_SAMPLES, log_mel_spectrogram
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.cer import cer_metric
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    cfg = get_config(args.model)
    tok = build_byte_fallback_tokenizer()
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    qparams = quantize_params(params)   # unfused int8 XLA path
    fparams = fuse_qkv(qparams)         # fused flat-cache kernels

    rng = np.random.default_rng(0)
    audio = np.zeros((args.windows, N_SAMPLES), np.float32)
    for i in range(args.windows):
        clip, _ = synth_speech(rng, seconds=float(rng.uniform(8.0, 25.0)))
        audio[i, : len(clip)] = clip[:N_SAMPLES]

    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    opts = DecodingOptions(beam_size=args.beam, sample_len=args.sample_len,
                           kv_int8=True, cross_kv_int8=True)
    opts_fused = (dataclasses.replace(opts, cross_kv_int4=True)
                  if args.cross_int4 else opts)
    prompt_ids = tok.sot_sequence("zh", "transcribe", predict_timestamps=True)
    prompt, pad = pad_prompts([prompt_ids] * args.windows, tok.eot)
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("o", "act8", "fq"))
    def pipeline(prms, audio, prompt, pad, key, o, act8, fq=None):
        mel = log_mel_spectrogram(audio, n_mels=cfg.num_mel_bins)
        enc_out = encode(prms, cfg, mel, act_int8=act8, fused_quant=fq)
        return beam_decode(prms, cfg, enc_out, prompt, pad, key,
                           opts=o, ti=ti)

    if args.ab == "kernels":
        legs = (("unfused", qparams, opts, False, None),
                ("fused", fparams, opts_fused, False, None))
    elif args.ab == "encoder-act8":
        # identical unfused decode, encoder s8xs8 A/B (XLA quant chains
        # in both legs so the bound isolates activation quantization)
        legs = (("unfused", qparams, opts, False, None),
                ("fused", qparams, opts, True, False))
    else:  # encoder-fused-quant: act8 both legs, fused glue on vs off
        legs = (("unfused", fparams, opts, True, False),
                ("fused", fparams, opts, True, True))
    results = {}
    for name, prms, o, act8, fq in legs:
        out = pipeline(prms, audio, prompt, pad, key, o, act8, fq)
        results[name] = {
            "tokens": np.asarray(out["tokens"]),
            "lengths": np.asarray(out["lengths"]),
        }

    agree = 0
    first_div = []
    edits = []
    texts_u, texts_f = [], []
    for i in range(args.windows):
        nu = int(results["unfused"]["lengths"][i])
        nf = int(results["fused"]["lengths"][i])
        tu = results["unfused"]["tokens"][i, :nu].tolist()
        tf = results["fused"]["tokens"][i, :nf].tolist()
        texts_u.append(tok.decode([t for t in tu if t < ti.timestamp_begin]))
        texts_f.append(tok.decode([t for t in tf if t < ti.timestamp_begin]))
        if tu == tf:
            agree += 1
        else:
            k = next((j for j, (a, b) in enumerate(zip(tu, tf)) if a != b),
                     min(nu, nf))
            first_div.append(k)
            edits.append(_edit_distance(tu, tf))
    cer_delta = cer_metric(texts_u, texts_f)  # fraction
    report = {
        "ab": args.ab,
        "cross_int4": bool(args.cross_int4),
        "windows": args.windows,
        "beam": args.beam,
        "sample_len": args.sample_len,
        "exact_agreement_rate": round(agree / args.windows, 3),
        "diverging_windows": args.windows - agree,
        "mean_first_divergence_step": (round(float(np.mean(first_div)), 1)
                                       if first_div else None),
        "mean_token_edit_distance": (round(float(np.mean(edits)), 1)
                                     if edits else 0.0),
        "cer_between_paths": round(cer_delta, 4),
    }
    print(json.dumps(report))
    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
