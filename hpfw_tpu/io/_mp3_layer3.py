"""MPEG-1 Layer III frame decoding (ISO/IEC 11172-3 2.4.3.4)."""

from __future__ import annotations

import numpy as np


class Layer3State:
    def __init__(self, nch: int):
        self.nch = nch


def _decode_layer3(h, frame, br, state):
    raise NotImplementedError("Layer III decode lands next")
