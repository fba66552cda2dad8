"""screenpressor_tpu — TPU-native lossless screen-video codec framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of ScreenPressor 4
(reference: thedeemon/screenpressor; see SURVEY.md / DESIGN.md / FORMAT.md).
"""

from screenpressor_tpu.config import (
    PROB_BITS,
    PROB_SCALE,
    RANS_L,
    STEP,
    CodecConfig,
    lane_count,
    lane_ranges,
)
from screenpressor_tpu.api import Encoder, Decoder, PixelFormat

__version__ = "0.1.0"

__all__ = [
    "PROB_BITS",
    "PROB_SCALE",
    "RANS_L",
    "STEP",
    "CodecConfig",
    "lane_count",
    "lane_ranges",
    "Encoder",
    "Decoder",
    "PixelFormat",
]
