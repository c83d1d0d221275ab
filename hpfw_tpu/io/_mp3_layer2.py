"""MPEG-1 Layer II frame decoding (ISO/IEC 11172-3 2.4.3.3)."""

from __future__ import annotations

import numpy as np


def _decode_layer2(h, br):
    raise NotImplementedError("Layer II decode lands next")
