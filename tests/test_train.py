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


def test_spec_augment_masks_within_valid_frames():
    import jax

    from ttasr.train.spec_augment import SpecAugmentConfig, spec_augment

    rng = jax.random.PRNGKey(0)
    mel = np.ones((2, 80, 300), np.float32)
    num_frames = np.array([200, 300], np.int32)
    cfg = SpecAugmentConfig(mask_time_prob=0.2, mask_time_length=10,
                            mask_time_min_masks=2,
                            mask_feature_prob=0.1, mask_feature_length=8,
                            mask_feature_min_masks=1)
    out = np.asarray(jax.jit(
        lambda r, m, n: spec_augment(r, m, n, cfg)
    )(rng, mel, num_frames))
    assert out.shape == mel.shape
    # some spans zeroed
    assert (out == 0.0).sum() > 0
    # row 0: no time mask beyond its 200 valid frames (columns fully
    # zeroed past 200 would mean a time mask escaped the valid region;
    # feature masks zero whole rows, not whole columns)
    tail_cols_fully_zero = np.all(out[0, :, 210:] == 0.0, axis=0)
    assert not tail_cols_fully_zero.any()
    # statistical sanity: masked fraction in the right ballpark (< 60%)
    assert (out == 0.0).mean() < 0.6


def test_spec_augment_min_masks():
    import jax

    from ttasr.train.spec_augment import SpecAugmentConfig, spec_augment

    # HF gate (_mask_input_features): prob == 0 disables the axis even
    # with min_masks > 0
    cfg = SpecAugmentConfig(mask_time_prob=0.0, mask_time_length=5,
                            mask_time_min_masks=2, mask_feature_prob=0.0,
                            mask_feature_min_masks=0)
    mel = np.ones((1, 4, 100), np.float32)
    out = np.asarray(spec_augment(jax.random.PRNGKey(1), mel,
                                  np.array([100], np.int32), cfg))
    assert np.all(out == 1.0)

    # prob > 0 with min_masks 2 -> at least 2 spans of 5 per row
    cfg2 = SpecAugmentConfig(mask_time_prob=0.05, mask_time_length=5,
                             mask_time_min_masks=2, mask_feature_prob=0.0,
                             mask_feature_min_masks=0)
    out2 = np.asarray(spec_augment(jax.random.PRNGKey(1), mel,
                                   np.array([100], np.int32), cfg2))
    zero_cols = np.all(out2[0] == 0.0, axis=0).sum()
    assert zero_cols >= 5  # >= 2 spans of 5, possibly overlapping


def test_train_step_with_spec_augment_and_bf16():
    import jax
    import jax.numpy as jnp

    from ttasr.train.spec_augment import SpecAugmentConfig

    cfg = _micro_cfg()
    params = init_params(cfg, seed=0)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer,
                              spec_augment_cfg=SpecAugmentConfig(),
                              compute_dtype=jnp.bfloat16)
    examples = load_tsv_corpus(CORPUS, "train_ds_01", "train")
    it = batch_iterator(examples, TOK, batch_size=2, n_mels=80, label_pad_to=32)
    batch = next(it)
    assert "num_frames" in batch
    state, loss = step_fn(state, batch)
    assert np.isfinite(float(loss))
    # master params stay f32 under mixed precision
    leaf = next(iter(jax.tree_util.tree_leaves(state.params)))
    assert leaf.dtype == jnp.float32


def test_group_by_length_ordering():
    import random as pyrandom

    from ttasr.train.data import length_grouped_order

    lengths = list(range(1, 101))
    order = length_grouped_order(lengths, batch_size=4, rng=pyrandom.Random(0),
                                 mega_factor=5)
    assert sorted(order) == list(range(100))
    # longest element overall comes first (HF LengthGroupedSampler swap)
    assert lengths[order[0]] == 100
    # within each megabatch of 20, lengths descend
    for i in range(0, 100, 20):
        mb = [lengths[j] for j in order[i : i + 20]]
        assert mb == sorted(mb, reverse=True)


def test_group_by_length_batches_similar_durations():
    examples = load_tsv_corpus(CORPUS, "train_ds_01+train_ds_02",
                               "train+validated")
    it = batch_iterator(examples, TOK, batch_size=2, n_mels=80,
                        group_by_length=True, label_pad_to=32, epochs=1)
    batches = list(it)
    assert batches and all(b["mel"].shape[0] == 2 for b in batches)


def test_streaming_iterator_matches_eager():
    from ttasr.train.data import iter_tsv_corpus

    eager = load_tsv_corpus(CORPUS, "train_ds_01+train_ds_02", "train")
    streamed = list(iter_tsv_corpus(CORPUS, "train_ds_01+train_ds_02", "train"))
    assert [e.audio_path for e in eager] == [e.audio_path for e in streamed]


def test_streaming_batch_iterator_never_materializes():
    """A generator-backed corpus trains without a materialized dataset."""
    from ttasr.train.data import iter_tsv_corpus

    def factory():
        return iter_tsv_corpus(CORPUS, "train_ds_01", "train")

    it = batch_iterator(factory, TOK, batch_size=2, n_mels=80,
                        label_pad_to=32, epochs=2)
    batches = list(it)
    assert len(batches) == 4  # 4 examples -> 2 batches/epoch x 2 epochs
    with pytest.raises(ValueError):
        next(batch_iterator(factory, TOK, batch_size=2, n_mels=80,
                            group_by_length=True))


def test_streaming_cli_flag(tmp_path):
    from ttasr.cli.train import main

    metrics = main([
        "--model_name_or_path", "micro-test",
        "--corpus_data_dir", CORPUS,
        "--dataset_config_name", "train_ds_01",
        "--train_split_name", "train",
        "--output_dir", str(tmp_path),
        "--max_steps", "2",
        "--per_device_train_batch_size", "2",
        "--logging_steps", "1", "--warmup_steps", "1",
        "--eval_steps", "1000", "--save_steps", "1000",
        "--do_train", "--streaming",
    ])
    assert np.isfinite(metrics["train_loss"])


def test_forced_decoder_ids_and_suppress_tokens(tmp_path):
    from ttasr.train.trainer import Trainer, TrainerConfig

    cfg = _micro_cfg()
    params = init_params(cfg, seed=0)
    forced = [[1, TOK.encode("a")[0]], [2, TOK.encode("b")[0]]]
    tc = TrainerConfig(
        output_dir=str(tmp_path), max_steps=1,
        per_device_train_batch_size=2, warmup_steps=1,
        generation_max_length=8, gradient_checkpointing=False,
        forced_decoder_ids=forced, suppress_tokens=[TOK.encode("c")[0]],
    )
    trainer = Trainer(params, cfg, TOK, tc)
    examples = load_tsv_corpus(CORPUS, "train_ds_01", "train")
    metrics = trainer.evaluate(examples)
    assert "eval_cer" in metrics and metrics["eval_samples"] == 4


def test_generation_num_beams_eval(tmp_path):
    """VERDICT r4 #8: the eval path honors generation_num_beams
    (reference train_asr.py:739 evaluates with
    num_beams=training_args.generation_num_beams).  beam-1 must equal
    the greedy eval exactly; beam-k runs the beam program."""
    from unittest import mock

    from ttasr.models.whisper import decode as decode_mod
    from ttasr.train.trainer import Trainer, TrainerConfig

    cfg = _micro_cfg()
    params = init_params(cfg, seed=0)
    examples = load_tsv_corpus(CORPUS, "train_ds_01", "train")

    def make(beams):
        tc = TrainerConfig(
            output_dir=str(tmp_path), max_steps=1,
            per_device_train_batch_size=2, warmup_steps=1,
            generation_max_length=8, gradient_checkpointing=False,
            generation_num_beams=beams,
        )
        return Trainer(params, cfg, TOK, tc)

    greedy = make(1).evaluate(examples)
    beam1 = make(1).evaluate(examples, num_beams=1)
    assert beam1 == greedy

    with mock.patch.object(decode_mod, "_beam_decode",
                           wraps=decode_mod._beam_decode) as spy:
        beam2 = make(2).evaluate(examples)
    assert spy.called, "beam eval must route through beam_decode"
    assert "eval_cer" in beam2 and beam2["eval_samples"] == 4

    # the config default flows through evaluate() with no explicit arg,
    # and an explicit override wins over the config
    with mock.patch.object(decode_mod, "_beam_decode",
                           wraps=decode_mod._beam_decode) as spy:
        over = make(1).evaluate(examples, num_beams=2)
    assert spy.called
    assert over == beam2
