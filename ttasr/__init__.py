"""ttasr — a TPU-native ASR framework for Taiwanese languages.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
adi-gov-tw/Taiwan-Tongues-ASR-CE (reference mounted at /root/reference):

- Whisper encoder-decoder inference compiled with XLA (MXU matmuls,
  bf16/int8 weights, KV-cache decode in ``lax.while_loop``), replacing
  faster-whisper/CTranslate2 (reference ``asr_core.py:3``).
- A fused Pallas log-mel frontend replacing CT2's C++ feature extractor.
- pjit/shard_map parallelism over a ``Mesh(("data","model"))`` replacing
  latent torch.distributed/NCCL (reference ``train_asr.py:358-365``).
- Host-side product surface (batch CLI, task HTTP API, streaming WS,
  CER evaluation, fine-tuning) with payload/output compatibility.
"""

__version__ = "0.1.0"
