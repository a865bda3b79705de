"""Benchmark-harness simulation: shoebox image-source rooms, layouts, sources."""

from .layouts import circular_mic_array, grid_layout, random_layout, semi_circle_layout
from .room import ShoeBox, inverse_sabine, shoebox_rir
from .sources import load_wav_sources, mix_premix, scale_to_snr, speech_like

__all__ = [
    "ShoeBox",
    "circular_mic_array",
    "grid_layout",
    "inverse_sabine",
    "mix_premix",
    "random_layout",
    "scale_to_snr",
    "semi_circle_layout",
    "shoebox_rir",
    "load_wav_sources",
    "speech_like",
]
