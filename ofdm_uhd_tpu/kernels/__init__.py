"""TPU compute kernels (layer T2): Pallas implementations + XLA fallbacks.

Every kernel ships two backends selected by `WaveformSpec.kernel_backend`:
  'xla'    — jnp/XLA formulation (always available, CPU-testable)
  'pallas' — hand-written Pallas TPU kernel (the reference-class system's
             native FFTW / liquid-dsp / correlator tier re-done for the MXU
             and VMEM; SURVEY.md §2.2)

Both backends are equality-tested against each other and against the golden
NumPy chain (tests/kernels/).
"""

from . import fft, fir, sync  # noqa: F401
