"""VAD factory (reference vad/vad_factory.py:13-44).

Extends the reference's factory (which only knew "simple"; its
PyannoteVAD plugin existed but was unreachable) with the neural types:
"energy"/"learned"/"pyannote" all resolve to :class:`EnergyVAD`, whose
frame probabilities come from the in-repo learned conv VAD
(ttasr.audio.vad_model) — the same neural-segmentation role the
reference intended pyannote to fill.
"""

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
        if type in ("energy", "learned", "pyannote"):
            # pyannote-role plugin: learned neural segmentation
            # (auth_token accepted and ignored for drop-in compatibility
            # with the reference's PyannoteVAD signature)
            kwargs.pop("auth_token", None)
            return EnergyVAD(**kwargs)
        raise ValueError(
            f"不支援的 VAD 管道類型: {type}。支援 'simple'、'energy'、"
            "'learned'（別名 'pyannote'）"
        )
