from .distortion import sad, satd, sse
from .intra import (
    fill_reference_samples, filter_reference_samples, mode_params,
    predict_block, wide_angle,
)
from .quant import dequantize, quantize
from .transforms import (
    DCT2, DCT8, DST7, forward_transform, inverse_transform,
)

__all__ = [
    "sad", "satd", "sse", "quantize", "dequantize",
    "forward_transform", "inverse_transform", "DCT2", "DCT8", "DST7",
    "predict_block", "fill_reference_samples", "filter_reference_samples",
    "mode_params", "wide_angle",
]
