"""Pallas TPU kernels for the hot inner loops (BASELINE.json:5):
FFT butterfly stages, four-step matmul FFT, FIR/polyphase MAC."""
