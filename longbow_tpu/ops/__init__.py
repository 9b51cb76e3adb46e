"""Compute kernels: distance, top-k, quantization, filtering.

Replaces the reference's runtime-ISA SIMD dispatch layer
(reference: internal/simd/dispatch.go:30-77) with trace-time
specialization: a single XLA/Pallas kernel family specialized by dtype
and metric when jitted, instead of cpuid-selected function pointers.
"""
