"""Layer K — order-sensitive per-entity kernels.

Two implementations of the same math, cross-checked in tests:

* ``reference_impl`` — transparent per-entity Python loop; the oracle.
* ``batched``        — lockstep-vectorized NumPy over a (B docs, T steps)
  padded matrix; the production kernel used inside Arrow pandas UDFs.
"""
