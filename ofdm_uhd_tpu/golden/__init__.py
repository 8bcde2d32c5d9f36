"""Float64 NumPy golden oracle chain.

The reference mount is empty (SURVEY.md §0), so this chain is the accuracy
oracle for the whole build — BASELINE.json config C1 blesses a "single-stream
CPU reference" as the comparison target. It is validated from first
principles (analytic BER curves, Parseval, known-answer DFTs) in
tests/property/, and every JAX/Pallas block is tested against its twin here.
"""

from .chain import GoldenModem

__all__ = ["GoldenModem"]
