"""Pure-JAX PHY blocks (SURVEY.md layer T3).

Each block is a pure function on jnp arrays, parameterized by a frozen
WaveformSpec (static under jit). Host-side constants (permutations, LUTs,
LFSR sequences, preambles, trellis tables) are precomputed once per spec in
`tables.py` from the golden oracle's definitions, guaranteeing TX/RX and
golden/JAX consistency by construction.
"""
