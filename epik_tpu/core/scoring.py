"""Score-threshold math shared by the engine and the database loader.

reference surface: ``i2l::score_threshold(db.omega(), db.kmer_size())``
(reference: epik/src/epik/place.cpp:87-88 builds ``_threshold`` and
``_log_threshold = log10(_threshold)``).

[inference: the i2l submodule is empty in the reference checkout.  From the
RAPPAS/EPIK papers (README.md:9,144; arXiv:2209.09242) the stored-probability
floor is eps = (omega / sigma) ** k with sigma the alphabet size (4 nucl / 20
amino) and omega the user threshold parameter, default 1.5
(reference: main.cpp:215).]
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["score_threshold", "log10_score_threshold"]


def score_threshold(omega: float, k: int, sigma: int) -> float:
    """Minimal stored probability eps = (omega/sigma)**k."""
    return (omega / sigma) ** k


def log10_score_threshold(omega: float, k: int, sigma: int) -> float:
    """log10(eps); the reference computes it as std::log10 of the float32
    threshold (place.cpp:88), reproduced here in float32 then widened."""
    eps32 = np.float32(score_threshold(omega, k, sigma))
    return float(np.float32(math.log10(float(eps32))))
