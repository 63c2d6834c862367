"""Pallas TPU kernels — the native compute layer.

These kernels replace the reference's single native component, the CUDA
nearest-grid fake-quant extension (`quant/quant_kernel.cu:11-39`,
`quant/quant.cpp:17-29`), with *real* packed-low-bit compute: codes are
decoded in-register on the way into the MXU instead of materializing
dequantized tensors in HBM.
"""
