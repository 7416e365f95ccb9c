"""ASR system configuration (parity with reference api/config.py).

Only two knobs are consumed by the streaming ASR loader:
- ``MODEL_DEVICE``: "tpu" (the only real target here; "cpu" works for tests)
- ``MODEL_COMPUTE_TYPE``: "bfloat16" / "float32" / "int8"
"""

import os

MODEL_DEVICE = os.getenv("TTASR_MODEL_DEVICE", "tpu")
# int8 = the fused-kernel fast path AND the task API's default, so both
# servers resolve to ONE shared engine (ttasr.engine.registry)
MODEL_COMPUTE_TYPE = os.getenv("TTASR_MODEL_COMPUTE_TYPE", "int8")
