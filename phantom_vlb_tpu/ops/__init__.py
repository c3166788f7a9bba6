from phantom_vlb_tpu.ops.flash_attention import attention, xla_attention
from phantom_vlb_tpu.ops.preprocess import DevicePreprocessor, device_preprocess
from phantom_vlb_tpu.ops.quant import int8_matmul, quantize_int8, quantize_tree
from phantom_vlb_tpu.ops.weight_mask import build_weight_mask

__all__ = [
    "attention", "xla_attention",
    "DevicePreprocessor", "device_preprocess",
    "int8_matmul", "quantize_int8", "quantize_tree",
    "build_weight_mask",
]
