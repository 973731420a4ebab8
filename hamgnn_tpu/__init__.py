"""hamgnn_tpu: TPU-native E(3)-equivariant framework for predicting ab-initio
tight-binding Hamiltonians (OpenMX / SIESTA / ABACUS), built on JAX/XLA/Pallas.

Capability-equivalent redesign of QuantumLab-ZY/HamGNN for TPU hardware."""

from .version import __version__
