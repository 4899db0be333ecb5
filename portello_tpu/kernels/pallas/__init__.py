"""Pallas TPU kernels.

Hand-scheduled implementations of the sequence-window stages: the read and
reference windows are staged in VMEM once per read and the per-cluster compare
loops run against them with explicit dynamic slices — immune by construction to
the XLA gather-into-scan fusion pathology documented in
``portello_tpu/kernels/shift_kernel.py``.  Enabled with PTPU_USE_PALLAS=1
(the pure-XLA path is the default and the conformance reference).
"""
