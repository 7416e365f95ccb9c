"""Training pipeline tests: TSV loading, collation, loss descent,
checkpoint resume, CLI wiring — micro model on the synthetic corpus."""

import os

import numpy as np
import pytest

from ttasr.models.whisper.config import WhisperConfig
from ttasr.models.whisper.model import init_params
from ttasr.text.tokenizer import build_byte_fallback_tokenizer
from ttasr.train.data import (
    LABEL_PAD,
    batch_iterator,
    collate_batch,
    load_tsv_corpus,
    prepare_example,
)
from ttasr.train.train_step import (
    cross_entropy_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
)

TOK = build_byte_fallback_tokenizer()
CORPUS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "sample_corpus")


def _micro_cfg():
    return WhisperConfig(
        name="micro", vocab_size=TOK.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
    )


def test_load_tsv_corpus_plus_joins():
    ex1 = load_tsv_corpus(CORPUS, "train_ds_01", "train")
    assert len(ex1) == 4
    both = load_tsv_corpus(CORPUS, "train_ds_01+train_ds_02", "train+validated")
    assert len(both) == 12  # (4 train + 2 validated) x 2 datasets
    # nested clips path resolves
    nested = [e for e in both if "a1" in e.audio_path]
    assert nested and all(os.path.exists(e.audio_path) for e in both)
    with pytest.raises(FileNotFoundError):
        load_tsv_corpus(CORPUS, "missing_ds", "train")


def test_prepare_example_and_duration_filter():
    ex = load_tsv_corpus(CORPUS, "train_ds_01", "train")[0]
    p = prepare_example(ex, TOK, language="zh")
    assert p is not None
    assert p["labels"][0] == TOK.sot
    assert p["labels"][-1] == TOK.eot
    assert prepare_example(ex, TOK, min_duration_s=10.0) is None
    assert prepare_example(ex, TOK, max_duration_s=0.5) is None


def test_collate_batch_shapes_and_masking():
    exs = load_tsv_corpus(CORPUS, "train_ds_01", "train")[:2]
    prepared = [prepare_example(e, TOK) for e in exs]
    batch = collate_batch(prepared, n_mels=80, eot=TOK.eot)
    assert batch["mel"].shape[0] == 2 and batch["mel"].shape[1] == 80
    assert batch["decoder_input_ids"].shape == batch["labels"].shape
    # teacher-forcing shift: input[t+1] == label[t] within real tokens
    lab = prepared[0]["labels"]
    np.testing.assert_array_equal(
        batch["decoder_input_ids"][0, : len(lab) - 1], lab[:-1]
    )
    np.testing.assert_array_equal(batch["labels"][0, : len(lab) - 1], lab[1:])
    # padding masked with -100
    longest = max(len(p["labels"]) for p in prepared)
    shortest = min(len(p["labels"]) for p in prepared)
    if longest > shortest:
        short_row = [len(p["labels"]) for p in prepared].index(shortest)
        assert batch["labels"][short_row, -1] == LABEL_PAD


def test_cross_entropy_ignores_pad():
    logits = np.zeros((1, 3, 5), np.float32)
    targets = np.array([[1, 2, LABEL_PAD]], np.int32)
    loss = float(cross_entropy_loss(logits, targets))
    assert loss == pytest.approx(np.log(5), rel=1e-5)


def test_train_step_reduces_loss():
    cfg = _micro_cfg()
    params = init_params(cfg, seed=0)
    optimizer = make_optimizer(learning_rate=3e-3, warmup_steps=1, total_steps=30)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)

    examples = load_tsv_corpus(CORPUS, "train_ds_01", "train")
    it = batch_iterator(examples, TOK, batch_size=2, n_mels=80, seed=0,
                        label_pad_to=32)
    batch = next(it)
    losses = []
    for _ in range(12):
        state, loss = step_fn(state, batch)  # overfit one batch
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(np.asarray(state.step)) == 12


def test_checkpoint_save_restore(tmp_path):
    import jax

    from ttasr.core.checkpoint import (
        get_last_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = _micro_cfg()
    params = init_params(cfg, seed=0)
    optimizer = make_optimizer()
    state = init_train_state(params, optimizer)
    assert get_last_checkpoint(str(tmp_path)) is None
    save_checkpoint(str(tmp_path), 5, state)
    save_checkpoint(str(tmp_path), 10, state)
    last = get_last_checkpoint(str(tmp_path))
    assert last.endswith("checkpoint-10")
    restored = restore_checkpoint(last, state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )


def test_train_cli_end_to_end(tmp_path):
    from ttasr.cli.train import main

    out = str(tmp_path / "out")
    metrics = main([
        "--model_name_or_path", "micro-test",
        "--corpus_data_dir", CORPUS,
        "--dataset_config_name", "train_ds_01",
        "--train_split_name", "train",
        "--eval_split_name", "test",
        "--language", "zh",
        "--output_dir", out,
        "--max_steps", "3",
        "--per_device_train_batch_size", "2",
        "--per_device_eval_batch_size", "2",
        "--logging_steps", "1",
        "--eval_steps", "1000",
        "--save_steps", "1000",
        "--warmup_steps", "1",
        "--generation_max_length", "8",
        "--do_train", "--do_eval",
        "--max_duration_in_seconds", "30",
    ])
    assert "train_loss" in metrics and np.isfinite(metrics["train_loss"])
    assert "eval_cer" in metrics
    assert os.path.isdir(os.path.join(out, "checkpoint-3"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))


def test_preprocessing_only_mode(tmp_path):
    from ttasr.cli.train import main

    metrics = main([
        "--model_name_or_path", "micro-test",
        "--corpus_data_dir", CORPUS,
        "--dataset_config_name", "train_ds_01+train_ds_02",
        "--train_split_name", "train",
        "--output_dir", str(tmp_path),
        "--preprocessing_only",
    ])
    assert metrics["preprocessed"] == 8


def test_gradient_accumulation(tmp_path):
    from ttasr.train.trainer import Trainer, TrainerConfig

    cfg = _micro_cfg()
    params = init_params(cfg, seed=0)
    tc = TrainerConfig(
        output_dir=str(tmp_path), max_steps=4,
        per_device_train_batch_size=2, gradient_accumulation_steps=2,
        warmup_steps=1, logging_steps=2, eval_steps=100, save_steps=100,
        gradient_checkpointing=False,
    )
    trainer = Trainer(params, cfg, TOK, tc)
    examples = load_tsv_corpus(CORPUS, "train_ds_01", "train")
    metrics = trainer.train(examples)
    assert np.isfinite(metrics["train_loss"])
