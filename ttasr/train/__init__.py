"""Fine-tuning pipeline: TSV corpus loading, jitted DP train step,
orbax checkpointing, CER evaluation.

Replaces the reference's PyTorch/HF Seq2SeqTrainer stack (train_asr.py +
run.sh) with a pjit-compiled JAX loop on a device mesh.
"""

from ttasr.train.data import load_tsv_corpus, CorpusExample, batch_iterator
from ttasr.train.train_step import (
    make_train_step,
    make_optimizer,
    cross_entropy_loss,
    TrainState,
)

__all__ = [
    "load_tsv_corpus", "CorpusExample", "batch_iterator",
    "make_train_step", "make_optimizer", "cross_entropy_loss", "TrainState",
]
