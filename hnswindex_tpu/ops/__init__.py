"""Kernel-level ops: distance metrics (MXU) and, later, Pallas fused
search-step kernels."""
