"""Generate a synthetic sample corpus matching the reference layout.

Reference layout (reference sample_corpus/, README.md:62):
- ``train_ds_01/`` with flat ``clips/*.wav``
- ``train_ds_02/`` with nested ``clips/a1/*.wav``
- each with ``train.tsv`` / ``test.tsv`` / ``validated.tsv`` having a
  ``path<TAB>sentence`` header.

Audio is synthetic (tone patterns derived from the sentence hash) — the
reference corpus itself is not copied.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTENCES = [
    "今天天氣很好",
    "我們去公園散步",
    "請問現在幾點",
    "高鐵往台南的班次",
    "明天會下雨嗎",
    "這是測試音檔",
    "歡迎使用語音辨識",
    "台灣的夜市很熱鬧",
]


def synth_audio(sentence: str, seconds: float = 1.2, sr: int = 16000) -> np.ndarray:
    """Deterministic tone sequence derived from the sentence."""
    digest = hashlib.sha256(sentence.encode()).digest()
    n = int(sr * seconds)
    t = np.arange(n) / sr
    audio = np.zeros(n, np.float32)
    for i, b in enumerate(digest[:4]):
        f = 150 + (b / 255) * 500
        seg = slice(i * n // 4, (i + 1) * n // 4)
        audio[seg] = 0.25 * np.sin(2 * np.pi * f * t[seg]) * (
            1 + 0.4 * np.sin(2 * np.pi * 3.0 * t[seg])
        )
    rng = np.random.default_rng(digest[0])
    audio += 0.01 * rng.standard_normal(n).astype(np.float32)
    return audio


def write_dataset(root: str, name: str, nested: bool, offset: int) -> None:
    from ttasr.audio.io import write_wav

    ds_dir = os.path.join(root, name)
    clips_rel = os.path.join("a1") if nested else ""
    clips_dir = os.path.join(ds_dir, "clips", clips_rel) if nested else os.path.join(ds_dir, "clips")
    os.makedirs(clips_dir, exist_ok=True)
    splits = {"train": SENTENCES[:4], "test": SENTENCES[4:6], "validated": SENTENCES[6:8]}
    for split, sentences in splits.items():
        rows = ["path\tsentence"]
        for i, sentence in enumerate(sentences):
            fname = f"audio_{name[-2:]}_{split}_{i + offset}.wav"
            rel = os.path.join("a1", fname) if nested else fname
            write_wav(os.path.join(clips_dir, fname), synth_audio(sentence))
            rows.append(f"{rel}\t{sentence}")
        with open(os.path.join(ds_dir, f"{split}.tsv"), "w", encoding="utf-8") as fh:
            fh.write("\n".join(rows) + "\n")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="sample_corpus")
    args = parser.parse_args()
    write_dataset(args.out, "train_ds_01", nested=False, offset=0)
    write_dataset(args.out, "train_ds_02", nested=True, offset=10)
    print(f"sample corpus written to {args.out}")


if __name__ == "__main__":
    main()
