"""jolt_atlas_tpu: a TPU-native zkML proving framework.

A brand-new JAX/XLA/Pallas implementation of a Jolt-style lookup-based zkML
SNARK with the capabilities of the reference (ICME-Lab/jolt-atlas): it proves
that an ONNX neural-network inference was executed correctly, using sumcheck
IOPs + Twist/Shout lookup arguments over BN254 with a single batched HyperKZG
opening.

Layer map (mirrors reference layers L0-L4, see SURVEY.md):
  - field/        BN254 scalar-field arithmetic (Python-int scalars and a
                  JAX 16-bit-limb vectorized Montgomery backend for TPU)
  - transcripts/  Blake2b Fiat-Shamir transcript (bit-compatible state machine
                  with reference joltworks/src/transcripts/blake2b.rs)
  - curve/        BN254 G1/G2, pairing, Pippenger MSM
  - poly/         multilinear polynomials (dense/compact/one-hot), eq polys,
                  univariate polys, opening accumulator
  - subprotocols/ sumcheck engine, Shout lookups, prefix-suffix sumchecks,
                  one-hot validity checks, evaluation reduction
  - commitment/   HyperKZG / KZG / Pedersen commitment schemes
  - frontend/     ONNX loader + fixed-point (i32) quantized graph interpreter
                  (reference: atlas-onnx-tracer)
  - zkops/        per-operator proof layer (reference: jolt-atlas-core ops)
  - parallel/     jax.sharding mesh utilities for multi-chip proving
"""

__version__ = "0.1.0"
