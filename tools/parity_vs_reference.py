"""CER-parity harness: ttasr (JAX/TPU) vs faster-whisper/CTranslate2.

Executes the protocol in PARITY_PLAN.md: run BOTH engines on identical
audio with the reference CLI's options (reference asr_core.py:159-167),
score both against reference transcripts with the same golden-tested
scorer (ttasr.text.cer), and report per-language CER deltas.

Requires artifacts unavailable in the zero-egress build env (real
weights + a CT2 conversion + eval corpora); degrades with a clear
message when they're missing.  ``--check`` runs a self-test of the
harness plumbing with fake engines on a synthetic corpus so the script
stays green in CI (tests/test_misc_surface.py).

Usage:
  python tools/parity_vs_reference.py \
      --hf-model /path/whisper-large-v3 --ct2-model /path/ct2-large-v3 \
      --corpus zh=/data/cv-zh-test nan=/data/suisiann hak=/data/hat \
      [--compute int8] [--beam 5] [--no-vad] [--limit 200]
  python tools/parity_vs_reference.py --check
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttasr.cli.asr import find_original_transcript, list_audio_files  # noqa: E402
from ttasr.text.cer import compare_texts  # noqa: E402
from ttasr.text.normalize import postprocess_transcript  # noqa: E402


def _collect(corpus_dir: str, limit: int):
    """(audio_path, reference_text) pairs using the reference's 5
    transcript filename patterns (reference asr_core.py:87-106)."""
    pairs = []
    for audio in list_audio_files(corpus_dir):
        ref_file = find_original_transcript(audio)
        if not ref_file:
            continue
        with open(ref_file, encoding="utf-8") as f:
            ref = f.read().strip()
        if ref:
            pairs.append((audio, ref))
        if limit and len(pairs) >= limit:
            break
    return pairs


def _ours_transcribe_fn(args):
    from ttasr.engine.transcriber import WhisperEngine

    engine = WhisperEngine(args.hf_model, compute_type=args.compute)

    def run(path: str) -> str:
        segments, _info = engine.transcribe(
            path, language=args.language, beam_size=args.beam,
            vad_filter=not args.no_vad, condition_on_previous_text=True,
            initial_prompt="",
        )
        return "".join(s.text for s in segments)

    return run


def _ct2_transcribe_fn(args):
    try:
        from faster_whisper import WhisperModel
    except ImportError:
        sys.exit("faster-whisper is not installed; install it (plus a CT2 "
                 "model dir) to run the reference side — see PARITY_PLAN.md")
    model = WhisperModel(args.ct2_model, device=args.ct2_device,
                         compute_type="int8" if args.compute == "int8"
                         else "float16")

    def run(path: str) -> str:
        segments, _info = model.transcribe(
            path, language=args.language, beam_size=args.beam,
            vad_filter=not args.no_vad, condition_on_previous_text=True,
            initial_prompt="",
        )
        return "".join(s.text for s in segments)

    return run


def evaluate(pairs, ours_fn, ct2_fn):
    """Score both engines over (audio, ref) pairs with the same scorer."""
    rows = []
    for audio, ref in pairs:
        hyp_ours = postprocess_transcript(ours_fn(audio))
        hyp_ct2 = postprocess_transcript(ct2_fn(audio))
        r_ours = compare_texts(ref, hyp_ours)
        r_ct2 = compare_texts(ref, hyp_ct2)
        if r_ours is None or r_ct2 is None:
            continue
        rows.append({
            "audio": os.path.basename(audio),
            "cer_ours": r_ours.cer_rate,
            "cer_ct2": r_ct2.cer_rate,
        })
    if not rows:
        return {"n": 0}
    n = len(rows)
    cer_ours = sum(r["cer_ours"] for r in rows) / n
    cer_ct2 = sum(r["cer_ct2"] for r in rows) / n
    wins = sum(r["cer_ours"] < r["cer_ct2"] - 1e-9 for r in rows)
    losses = sum(r["cer_ours"] > r["cer_ct2"] + 1e-9 for r in rows)
    within = sum(abs(r["cer_ours"] - r["cer_ct2"]) <= 0.02 for r in rows)
    return {
        "n": n,
        "cer_ours": round(cer_ours, 4),
        "cer_ct2": round(cer_ct2, 4),
        "delta_cer": round(cer_ours - cer_ct2, 4),
        "utt_wins": wins,
        "utt_losses": losses,
        "utt_within_2pt": within,
        "pass_primary": (cer_ours - cer_ct2) <= 0.005,
        "pass_secondary": within >= 0.9 * n,
    }


def _self_check() -> int:
    """Plumbing self-test: synthetic corpus + fake engines."""
    import tempfile
    import wave

    import numpy as np

    with tempfile.TemporaryDirectory() as d:
        for i, text in enumerate(["今天天氣很好", "我們去台北"]):
            wav = os.path.join(d, f"utt{i}.wav")
            with wave.open(wav, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(np.zeros(1600, np.int16).tobytes())
            with open(os.path.join(d, f"utt{i}.txt"), "w",
                      encoding="utf-8") as f:
                f.write(text)
        pairs = _collect(d, limit=0)
        assert len(pairs) == 2, pairs
        truth = {os.path.basename(a): r for a, r in pairs}
        ours = lambda p: truth[os.path.basename(p)]          # noqa: E731
        ct2 = lambda p: truth[os.path.basename(p)][:-1] + "壞"  # noqa: E731
        report = evaluate(pairs, ours, ct2)
        assert report["n"] == 2
        assert report["cer_ours"] == 0.0
        assert report["cer_ct2"] > 0.0
        assert report["pass_primary"], report
    print(json.dumps({"check": "ok", **report}, ensure_ascii=False))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--hf-model", help="HF checkpoint dir for the ttasr side")
    p.add_argument("--ct2-model", help="CT2 conversion of the SAME checkpoint")
    p.add_argument("--ct2-device", default="cpu")
    p.add_argument("--corpus", nargs="+", default=[],
                   help="lang=dir pairs, e.g. zh=/data/cv-zh-test")
    p.add_argument("--compute", default="int8",
                   choices=["int8", "bfloat16", "float32"])
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--no-vad", action="store_true",
                   help="ablation: remove the VAD-gating divergence axis")
    p.add_argument("--limit", type=int, default=200,
                   help="max utterances per language (0 = all)")
    p.add_argument("--check", action="store_true",
                   help="self-test the harness plumbing (no weights needed)")
    args = p.parse_args(argv)

    if args.check:
        return _self_check()
    if not (args.hf_model and args.ct2_model and args.corpus):
        p.error("--hf-model, --ct2-model and --corpus are required "
                "(or use --check); see PARITY_PLAN.md for the artifacts")

    report = {}
    for spec in args.corpus:
        lang, _, corpus_dir = spec.partition("=")
        args.language = lang
        pairs = _collect(corpus_dir, args.limit)
        if not pairs:
            report[lang] = {"n": 0, "error": f"no (audio, transcript) pairs in {corpus_dir}"}
            continue
        report[lang] = evaluate(pairs, _ours_transcribe_fn(args),
                                _ct2_transcribe_fn(args))
    overall_pass = all(r.get("pass_primary") for r in report.values() if r["n"])
    print(json.dumps({"languages": report, "pass": overall_pass,
                      "criteria": "PARITY_PLAN.md"}, ensure_ascii=False))
    return 0 if overall_pass else 1


if __name__ == "__main__":
    raise SystemExit(main())
