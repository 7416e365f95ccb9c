from ttasr.streaming.vad.vad_factory import VADFactory
from ttasr.streaming.vad.simple_vad import SimpleVAD
from ttasr.streaming.vad.energy_vad import EnergyVAD

__all__ = ["VADFactory", "SimpleVAD", "EnergyVAD"]
