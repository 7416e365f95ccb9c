"""VAD factory (reference vad/vad_factory.py:13-44, extended with the
"energy" type that the TPU build actually gates on)."""

import logging

from ttasr.streaming.vad.energy_vad import EnergyVAD
from ttasr.streaming.vad.simple_vad import SimpleVAD

logger = logging.getLogger("ttasr.streaming.vad")


class VADFactory:
    @staticmethod
    def create_vad_pipeline(type, **kwargs):
        logger.info("creating VAD pipeline: %s %s", type, kwargs)
        if type == "simple":
            return SimpleVAD(**kwargs)
        if type == "energy":
            return EnergyVAD(**kwargs)
        raise ValueError(f"不支援的 VAD 管道類型: {type}。支援 'simple'、'energy'")
