"""TPU-native Groth16 prover for the MNT4753/MNT6753 curve cycle.

A from-scratch JAX/XLA/Pallas framework with the capabilities and file
contracts of the CUDA SNARK-challenge prover (reference mounted at
/root/reference): trusted setup + parameter generation, CPU oracle prover,
preprocessed-table builder, and a TPU prover whose proof files are
sha256-identical to the oracle's.
"""

__version__ = "0.1.0"
