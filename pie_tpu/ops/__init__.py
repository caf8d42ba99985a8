"""TPU compute ops: quantization, fused kernels, attention, RoPE, sampling."""

from pie_tpu.ops.quant import (
    QuantizedTensor,
    quantize,
    dequantize,
    quantized_matmul,
)
