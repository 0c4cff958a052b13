from . import absorption, basic, biquad, filterbanks, geq, prony, sph, stft, unitary

__all__ = [
    "absorption",
    "basic",
    "biquad",
    "filterbanks",
    "geq",
    "prony",
    "sph",
    "stft",
    "unitary",
]
