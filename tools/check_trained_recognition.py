"""End-to-end trained-recognition check (VERDICT round-2 #5).

Every decode test in this repo runs random weights, so recognition-level
wiring (VAD interaction with real signal structure, prompt carry, seek,
timestamp parsing, normalize) had never produced a *correct* transcript.
This check closes that: overfit a micro Whisper on a tiny speech-like
corpus through the real ``Trainer`` (timestamp labels on), then run the
FULL ``WhisperEngine.transcribe`` path — learned conv VAD on, beam 5,
timestamp rules, text normalize — and require CER ~ 0 on the training
clips.

The clips come from the VAD training synthesizer (glottal pulses +
formants + syllabic gating), so the default VAD detects them as speech —
the sample_corpus tone-hash audio is a VAD *negative* by design.

Usage: python tools/check_trained_recognition.py [--steps 300] [--clips 6]
Exit code 0 iff CER <= --max-cer (default 0.05).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import wave

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SENTENCES = [
    "今天天氣真好",
    "請問現在幾點",
    "我想要一杯咖啡",
    "台北的捷運很方便",
    "這個週末要去爬山",
    "會議改到下午三點",
    "火車快要進站了",
    "晚餐吃什麼好呢",
]


def _write_wav(path, audio, sr=16000):
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())


def run_check(steps=800, n_clips=6, lr=2e-3, seed=0, max_cer=0.05,
              out_json=None, model="micro-test", compute="float32",
              batched=False, int4_ab=False):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from train_vad import synth_speech  # speech-like: the VAD detects it

    from ttasr.engine.transcriber import WhisperEngine
    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.model import init_params
    from ttasr.text.cer import cer_metric
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer
    from ttasr.train.data import CorpusExample
    from ttasr.train.trainer import Trainer, TrainerConfig

    tok = build_byte_fallback_tokenizer()
    cfg = get_config(model)
    rng = np.random.default_rng(seed)

    tmp = tempfile.mkdtemp(prefix="ttasr-e2e-")
    examples = []
    for i in range(n_clips):
        audio, _ = synth_speech(rng, seconds=float(rng.uniform(2.0, 3.0)))
        path = os.path.join(tmp, f"clip{i}.wav")
        _write_wav(path, audio)
        examples.append(CorpusExample(audio_path=path,
                                      sentence=SENTENCES[i % len(SENTENCES)]))

    tc = TrainerConfig(
        output_dir=os.path.join(tmp, "out"), max_steps=steps,
        per_device_train_batch_size=min(n_clips, 8), learning_rate=lr,
        warmup_steps=20, logging_steps=50, eval_steps=10 ** 9,
        save_steps=10 ** 9, label_pad_to=64, gradient_checkpointing=False,
        predict_timestamps=True,
    )
    trainer = Trainer(init_params(cfg, seed=seed), cfg, tok, tc)
    train_metrics = trainer.train(examples)

    params = jax.tree.map(lambda x: x, trainer.state.params)

    def make_engine(**kw):
        return WhisperEngine(model, params=params, config=cfg,
                             tokenizer=tok, compute_type=compute, **kw)

    engine = make_engine()
    refs, per_clip = [], []
    hyps = {1: [], 5: []}
    for ex in examples:
        refs.append(ex.sentence.lower())
        row = {"ref": ex.sentence}
        for beam in (1, 5):
            segments, info = engine.transcribe(
                ex.audio_path, language="zh", beam_size=beam,
                vad_filter=True, condition_on_previous_text=True,
                initial_prompt="", max_new_tokens=48,
            )
            text = "".join(s.text for s in segments)
            hyps[beam].append(text)
            row[f"hyp_beam{beam}"] = text
            if beam == 1:
                row.update({
                    "segments": [[round(s.start, 2), round(s.end, 2)]
                                 for s in segments],
                    "vad_kept_s": round(info.duration_after_vad, 2),
                    "duration_s": round(info.duration, 2),
                })
        per_clip.append(row)
    # The gated metric is the greedy path: it exercises VAD, seek,
    # timestamp rules and normalize end-to-end.  Beam-5 CER is recorded,
    # not gated: a 389k-param toy decoder has uncalibrated eot
    # probability on junk prefixes, so low-score eot candidates flood the
    # openai finished-set (k finishers end the search) before the true
    # beam completes — a toy-scale artifact that vanishes with a real
    # model, where mid-speech eot is strongly suppressed by training.
    # This check already caught one real bug this way: the byte-fallback
    # suppress list banned the tail byte of ♩ (0xA9), which is also the
    # last UTF-8 byte of 天 (ttasr/text/tokenizer.py::non_speech_tokens).
    cer = cer_metric(refs, hyps[1])  # fraction (edits / ref chars)

    extra = {}
    if batched:
        # VERDICT r4 #3: the VAD-chunked batched path's quality had
        # never been checked on trained recognition — run every clip
        # through BatchedInferencePipeline (the real BatchServer path)
        from ttasr.engine.batched import BatchedInferencePipeline

        pipe = BatchedInferencePipeline(engine, batch_size=4)
        hyps_b = []
        for ex in examples:
            segs_b, _ = pipe.transcribe(
                ex.audio_path, language="zh", beam_size=5,
                vad_filter=True, initial_prompt="", max_new_tokens=48)
            hyps_b.append("".join(s.text for s in segs_b))
        extra["e2e_trained_cer_batched_beam5"] = round(
            cer_metric(refs, hyps_b), 4)
        extra["batched_hyps"] = hyps_b
    if int4_ab and compute == "int8":
        # int4 self-KV recognition bound (VERDICT r4 #2): same trained
        # params, engine with kv_int4 OFF vs the default ON above
        eng_off = make_engine(kv_int4=False)
        hyps_off = []
        for ex in examples:
            segs_o, _ = eng_off.transcribe(
                ex.audio_path, language="zh", beam_size=5,
                vad_filter=True, condition_on_previous_text=True,
                initial_prompt="", max_new_tokens=48)
            hyps_off.append("".join(s.text for s in segs_o))
        extra["e2e_trained_cer_beam5_kv_int8"] = round(
            cer_metric(refs, hyps_off), 4)

    result = {
        "model": model, "compute": compute,
        "e2e_trained_cer_greedy": round(cer, 4),
        "e2e_trained_cer_beam5": round(cer_metric(refs, hyps[5]), 4),
        **extra,
        "train_loss": round(train_metrics["train_loss"], 4),
        "steps": steps, "clips": n_clips,
        "vad_all_detected": all(c["vad_kept_s"] > 0.5 for c in per_clip),
        "timestamps_sane": all(
            all(0.0 <= s0 <= s1 <= c["duration_s"] + 0.5
                for s0, s1 in c["segments"]) and c["segments"]
            for c in per_clip),
        "per_clip": per_clip,
    }
    print(json.dumps(result, ensure_ascii=False))
    if out_json:
        with open(out_json, "w", encoding="utf-8") as fh:
            json.dump(result, fh, ensure_ascii=False, indent=1)
    return result, cer <= max_cer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--clips", type=int, default=6)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-cer", type=float, default=0.05)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--model", default="micro-test",
                    help="micro64-test engages the fused dh-64 path")
    ap.add_argument("--compute", default="float32",
                    help="int8 runs the fused kernels (interpret on CPU)")
    ap.add_argument("--batched", action="store_true",
                    help="also score BatchedInferencePipeline (VERDICT r4 #3)")
    ap.add_argument("--int4-ab", action="store_true",
                    help="also score kv_int4 OFF for the int4 self-KV "
                         "recognition bound (needs --compute int8)")
    args = ap.parse_args()
    _, ok = run_check(args.steps, args.clips, args.lr, args.seed,
                      args.max_cer, args.out_json, model=args.model,
                      compute=args.compute, batched=args.batched,
                      int4_ab=args.int4_ab)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
